"""Mergeable summary store: incremental corpus statistics from
KB-sized sketches (Apache DataSketches via Spark's built-in
``hll_*`` / ``kll_*`` aggregates).

The 100 TB problem this solves: "distinct users per (lang, source)" or
"p95 document length" over a growing corpus normally re-scans
everything per report. Sketches are MERGEABLE: each ingest batch
aggregates to one sketch row per group (~1.5 KB HLL / ~3 KB KLL
regardless of batch size), the store appends them, and any later read
union-merges per group — no base-data re-read, ever. This is the
summary-store twin of the signature store (dedup) and the IVF/IVFPQ
stores (similarity): state proportional to |groups|, not |rows|.

Exactness contract: HLL register updates are per-bucket MAXes —
commutative and associative — so union(sketch(A), sketch(B)) has
exactly the registers of sketch(A ∪ B): batch-split estimates equal
single-shot estimates EXACTLY (pytest-pinned). KLL compaction is
randomized, so quantile merges agree only within the sketch's error
bound — the tests pin rank-error tolerance, not equality. No DuckDB
oracle: estimates are DataSketches-implementation-defined and DuckDB's
approx functions use different sketches; the tests compare against
EXACT Spark aggregations with the library's published error bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    group_cols: "list[str]",
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per group over the value column: (group...,
    hll binary, n_rows). Map-side partial aggregation applies — the
    shuffle carries one partially-merged sketch per group per task."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll"),
        F.count("*").cast("long").alias("n_rows"),
    )


def quantile_sketches(
    df: DataFrame,
    group_cols: "list[str]",
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """One KLL(double) sketch per group: (group..., kll binary)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias("kll"),
    )


def write_sketch_store(
    df: DataFrame,
    path: str,
    group_cols: "list[str]",
    distinct_col: str,
    quantile_col: str,
) -> None:
    """Initialize the store with the first batch's per-group sketches."""
    _batch_sketches(df, group_cols, distinct_col, quantile_col).write.mode(
        "overwrite"
    ).parquet(path)


def append_sketch_batch(
    df: DataFrame,
    path: str,
    group_cols: "list[str]",
    distinct_col: str,
    quantile_col: str,
) -> None:
    """Fold an ingest batch in: aggregate the BATCH to sketch rows and
    append. No read of existing store data — merging is deferred to
    read time, so appends from concurrent batches never conflict
    (parquet append of disjoint files).

    Maintenance note (r14): the LedgerVacuumCadence the
    postings/IVF/zonemap/bloom/binary writers ride does NOT apply here
    — this store mints no per-commit versions (no ``_versions/``
    ledger, no as-of surface to retain), and its on-disk state is
    |groups| KB-sized sketch rows per batch, mergeable at read time.
    The growth dimension is batch-file count, bounded by re-sketching
    (read_summary the store, write_sketch_store the merged rows to a
    fresh path) during any scheduled maintenance window."""
    _batch_sketches(df, group_cols, distinct_col, quantile_col).write.mode(
        "append"
    ).parquet(path)


def _batch_sketches(
    df: DataFrame,
    group_cols: "list[str]",
    distinct_col: str,
    quantile_col: str,
) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(distinct_col)).alias("hll"),
        F.kll_sketch_agg_double(F.col(quantile_col).cast("double")).alias(
            "kll"
        ),
        F.count("*").cast("long").alias("n_rows"),
    )


def read_summary(
    spark,
    path: str,
    group_cols: "list[str]",
    quantiles: "tuple[float, ...]" = (0.5, 0.95),
) -> DataFrame:
    """Union-merge the store's sketch rows per group and report:
    (group..., n_rows, distinct_est, q50, q95, ...). The scan reads
    |groups|×|batches| KB-sized rows — independent of corpus size."""
    sk = spark.read.parquet(path)
    # no KLL union AGGREGATE exists (kll_sketch_merge_double is a binary
    # scalar) — fold the per-batch sketches with it; the list is
    # |batches| KB-sized blobs per group, driver-bounded by design
    kll_merge = F.expr(
        "aggregate(slice(klls, 2, greatest(size(klls) - 1, 0)),"
        " element_at(klls, 1),"
        " (acc, x) -> kll_sketch_merge_double(acc, x))"
    )
    merged = (
        sk.groupBy(*group_cols)
        .agg(
            F.hll_union_agg("hll").alias("hll"),
            F.collect_list("kll").alias("klls"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
        .select(*group_cols, "hll", kll_merge.alias("kll"), "n_rows")
    )
    qcols = [
        F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(float(q)))
        .alias(f"q{int(q * 100)}")
        for q in quantiles
    ]
    return merged.select(
        *group_cols,
        "n_rows",
        F.hll_sketch_estimate("hll").cast("double").alias("distinct_est"),
        *qcols,
    )


def overlap_estimate(
    spark,
    path_a: str,
    path_b: str,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Estimated distinct-overlap between two sketch stores by
    inclusion-exclusion: |A∩B| ≈ |A| + |B| − |A∪B|, with the union
    computed by exact HLL register merge. The at-scale form of "how
    many documents do these two corpora share?" — the inputs are two
    KB-sized sketch stores, never the corpora (the exact form is a
    corpus×corpus join). Error compounds three estimates (~3×rsd);
    for decisions near zero overlap prefer the exact
    ``contamination_check`` on the suspect slice.

    With ``group_cols`` the overlap is per matching group (inner join —
    groups present in only one store have no overlap row); without, one
    global row."""
    a = spark.read.parquet(path_a)
    b = spark.read.parquet(path_b)
    gc = group_cols or []

    def merged(df, name):
        agg = df.groupBy(*gc).agg(F.hll_union_agg("hll").alias(name))
        return agg

    ma, mb = merged(a, "hll_a"), merged(b, "hll_b")
    j = ma.join(mb, on=gc) if gc else ma.crossJoin(mb)
    est_a = F.hll_sketch_estimate("hll_a").cast("double")
    est_b = F.hll_sketch_estimate("hll_b").cast("double")
    est_u = F.hll_sketch_estimate(
        F.hll_union(F.col("hll_a"), F.col("hll_b"))
    ).cast("double")
    return j.select(
        *gc,
        est_a.alias("distinct_a"),
        est_b.alias("distinct_b"),
        est_u.alias("distinct_union"),
        F.greatest(est_a + est_b - est_u, F.lit(0.0)).alias("overlap_est"),
    )


class StreamingSketchStore:
    """foreachBatch ingest into a sketch store: each micro-batch
    appends its per-group sketch rows (KB-sized, no read of existing
    state, no merge until read time — concurrent appends never
    conflict). The streaming twin of :func:`append_sketch_batch`, same
    pattern as streaming.dedup's signature-store ingest."""

    def __init__(
        self,
        path: str,
        group_cols: "list[str]",
        distinct_col: str,
        quantile_col: str,
    ):
        self.path = path
        self.group_cols = group_cols
        self.distinct_col = distinct_col
        self.quantile_col = quantile_col

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        append_sketch_batch(
            batch_df,
            self.path,
            self.group_cols,
            self.distinct_col,
            self.quantile_col,
        )

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        return (
            stream_df.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.foreach_batch)
            .trigger(**trigger_kwargs)
            .start()
        )


# ------------------------------------------------------------------ #
# Heavy hitters: mergeable per-batch top-m summaries with deterministic
# undercount bounds — the top-k member of the summary-store family
# (HLL = distinct, KLL = quantiles, this = frequent items). Spark 4.1
# ships count_min_sketch but no query function for it, and its point
# estimates would anyway OVERcount; the top-m summary gives the
# opposite, auditable guarantee: stored counts are exact partial sums,
# and an item's true count exceeds its reported count by at most the
# sum of the thresholds of the batches that dropped it.
# ------------------------------------------------------------------ #


def _batch_topk(
    df: DataFrame,
    group_cols: "list[str]",
    item_col: str,
    m: int,
) -> "tuple[DataFrame, DataFrame]":
    """(items, meta) for ONE batch: per group, the exact counts of its
    top-m items (ties broken by item value — deterministic), and a
    per-group meta row carrying the batch's drop threshold.

    threshold = the m-th item's count when the group has more than m
    distinct items (anything dropped had count <= threshold), else 0
    (nothing was dropped — the summary is EXACT for that group/batch).
    The per-group top-m filter compiles to WindowGroupLimit: each map
    partition forwards at most m rows per group into the exchange."""
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, item_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("cnt"), F.asc(item_col)
    )
    ranked = counts.withColumn("rn", F.row_number().over(w))
    meta = (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.max(F.when(F.col("rn") == m, F.col("cnt"))).alias("mth_cnt"),
            F.sum("cnt").cast("long").alias("n_rows"),
        )
        .select(
            *group_cols,
            F.when(F.col("n_distinct") > m, F.col("mth_cnt"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("threshold"),
            "n_rows",
        )
    )
    # the batch threshold rides ON each item row so the read-time merge
    # can compute per-item "thresholds of the batches that kept me"
    # with a plain aggregate — no batch-id bookkeeping in the store
    items = (
        ranked.where(F.col("rn") <= m)
        .drop("rn")
        .join(F.broadcast(meta.select(*group_cols, "threshold")), group_cols)
    )
    return items, meta


def write_topk_store(
    df: DataFrame,
    path: str,
    group_cols: "list[str]",
    item_col: str,
    m: int = 100,
) -> None:
    """Initialize the heavy-hitters store with the first batch: item
    rows at ``path/items``, per-batch group meta at ``path/meta``.
    State per batch: <= m item rows + 1 meta row per group — like the
    HLL/KLL store, proportional to |groups|, never |rows|."""
    items, meta = _batch_topk(df, group_cols, item_col, m)
    items.write.mode("overwrite").parquet(path + "/items")
    meta.write.mode("overwrite").parquet(path + "/meta")


def append_topk_batch(
    df: DataFrame,
    path: str,
    group_cols: "list[str]",
    item_col: str,
    m: int = 100,
) -> None:
    """Fold an ingest batch in: append the batch's item/meta rows. No
    read of existing state, no merge until read time — concurrent
    appends never conflict (same contract as append_sketch_batch)."""
    items, meta = _batch_topk(df, group_cols, item_col, m)
    items.write.mode("append").parquet(path + "/items")
    meta.write.mode("append").parquet(path + "/meta")


def read_topk(
    spark,
    path: str,
    group_cols: "list[str]",
    item_col: str,
    k: int = 10,
) -> DataFrame:
    """Merge the store and report each group's top-k items:
    (group..., item, cnt_lower, cnt_upper, rank).

    - ``cnt_lower`` = the summed stored counts — exact occurrences the
      summaries witnessed; a strict lower bound on the true count.
    - ``cnt_upper`` = cnt_lower + Σ thresholds of the batches whose
      summary DROPPED the item (it can have occurred at most
      threshold_b times in such a batch). When every batch kept the
      item (or dropped nothing: threshold 0), lower == upper and the
      count is EXACT — pytest pins both regimes.

    Ranking uses cnt_lower (deterministic, item tie-break). The scan
    reads |groups| × m × |batches| item rows — summary-sized, never the
    corpus."""
    items = spark.read.parquet(path + "/items")
    meta = spark.read.parquet(path + "/meta")
    thr_total = meta.groupBy(*group_cols).agg(
        F.sum("threshold").cast("long").alias("thr_all"),
    )
    per_item = items.groupBy(*group_cols, item_col).agg(
        F.sum("cnt").cast("long").alias("cnt_lower"),
        F.sum("threshold").cast("long").alias("kept_thr"),
        F.count(F.lit(1)).alias("n_batches_seen"),
    )
    from pyspark.sql import Window

    # Σ thresholds of batches that DROPPED the item
    #   = thr_all − Σ thresholds of the batches that kept it
    # (each stored item row carries its own batch's threshold).
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("cnt_lower"), F.asc(item_col)
    )
    return (
        per_item.join(F.broadcast(thr_total), group_cols, "left")
        .select(
            *group_cols,
            item_col,
            "cnt_lower",
            (
                F.col("cnt_lower")
                + F.col("thr_all")
                - F.col("kept_thr")
            ).alias("cnt_upper"),
            "n_batches_seen",
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


class StreamingTopkStore:
    """foreachBatch ingest for the heavy-hitters store: each micro-batch
    appends its top-m item/meta rows (same no-read/no-merge append
    contract as StreamingSketchStore; replays tolerated statistically —
    for strict idempotency mirror the monitor's batch_id-keyed
    overwrite). Like the sketch store, it mints no per-commit versions,
    so the ledger-backed writers' LedgerVacuumCadence does not apply
    (see append_sketch_batch's maintenance note)."""

    def __init__(self, path: str, group_cols: "list[str]", item_col: str, m: int = 100):
        import os

        self.path = path
        self.group_cols = group_cols
        self.item_col = item_col
        self.m = m
        # a RESUMED stream must append to the existing store, never
        # re-initialize over it
        self._initialized = os.path.exists(os.path.join(path, "items"))

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        fn = write_topk_store if not self._initialized else append_topk_batch
        fn(batch_df, self.path, self.group_cols, self.item_col, self.m)
        self._initialized = True

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        return (
            stream_df.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.foreach_batch)
            .trigger(**trigger_kwargs)
            .start()
        )


def quantile_drift(
    spark,
    path_a: str,
    path_b: str,
    group_cols: "list[str] | None" = None,
    probe_ranks: "tuple[float, ...]" = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Distribution-drift monitor between two sketch stores: a
    Kolmogorov-Smirnov-style statistic from KLL sketches alone — the
    max |rank_A(v) − rank_B(v)| over a common probe grid of values.
    The grid is store A's GLOBAL quantiles at ``probe_ranks`` (one
    KB-sized collect): ``kll_sketch_get_rank_double`` requires a
    FOLDABLE value argument, so per-group probe values cannot ride a
    column — a shared literal grid keeps the whole comparison one
    vectorized select per store and is the standard fixed-grid KS
    variant. Identical distributions give ~0 (within sketch rank error
    ~1.7% at k=200); a shifted metric (this crawl's doc lengths vs
    last month's) lights up without touching either corpus.

    Output: (group..., ks_stat, drift columns d10/d25/... per probe)."""
    gc = group_cols or []
    fold = F.expr(
        "aggregate(slice(ks, 2, greatest(size(ks) - 1, 0)),"
        " element_at(ks, 1),"
        " (acc, x) -> kll_sketch_merge_double(acc, x))"
    )

    def kll_of(path, name, groups):
        sk = spark.read.parquet(path).select(*groups, F.col("kll").alias("k"))
        return (
            sk.groupBy(*groups)
            .agg(F.collect_list("k").alias("ks"))
            .select(*groups, fold.alias(name))
        )

    # a store built from zero rows holds a zero-item KLL buffer, which
    # get_quantile/get_rank reject deep in the JVM — surface a clear
    # error for EITHER side instead (n_rows is the store's own exact
    # count column)
    for p in (path_a, path_b):
        if (spark.read.parquet(p).agg(F.sum("n_rows")).first()[0] or 0) == 0:
            raise ValueError(f"sketch store at {p} holds no sketches")
    grid_row = (
        kll_of(path_a, "g", [])
        .select(
            *[
                F.kll_sketch_get_quantile_double(F.col("g"), F.lit(float(p)))
                .alias(f"v{i}")
                for i, p in enumerate(probe_ranks)
            ]
        )
        .collect()[0]
    )
    grid = [float(grid_row[i]) for i in range(len(probe_ranks))]

    a = kll_of(path_a, "kll_a", gc)
    b = kll_of(path_b, "kll_b", gc)
    j = a.join(b, on=gc) if gc else a.crossJoin(b)
    drifts = []
    for p, v in zip(probe_ranks, grid):
        ra = F.kll_sketch_get_rank_double(F.col("kll_a"), F.lit(v))
        rb = F.kll_sketch_get_rank_double(F.col("kll_b"), F.lit(v))
        drifts.append(F.abs(ra - rb).alias(f"d{int(p * 100)}"))
    out = j.select(*gc, *drifts)
    return out.select(
        *gc,
        F.greatest(*[F.col(f"d{int(p * 100)}") for p in probe_ranks]).alias(
            "ks_stat"
        ),
        *[F.col(f"d{int(p * 100)}") for p in probe_ranks],
    )
