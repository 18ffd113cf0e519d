"""Per-file bloom sidecar: point-lookup file skipping on a column the
table is NOT clustered by.

The companion to sources/zonemap.py, completing the at-rest index
family: a zone map prunes RANGE scans but only pays off on the one
column the files are clustered by; a multiget on any other column
still lists and schedules every file. This sidecar is the
Parquet-bloom-filter / Delta bloom-index design, self-contained on
plain parquet: per file, a bloom filter over the lookup column,
consulted BEFORE the scan is scheduled — the at-rest analog of the
reference's targeted-partition multiget (IndexedRDD.scala:50-62, the
motivating operation of the whole library), where the "partition to
probe" becomes "file to schedule".

Mechanics:

- the writer persists the data UNCHANGED in layout (no reclustering —
  the table keeps whatever order serves its range workload) and makes
  one column-pruned pass recording, per file, the bloom BIT POSITIONS
  of the keys it contains: ``pmod(xxhash64(key, seed_i), m)`` for k
  seeds, deduplicated and sorted — at most min(k·|distinct keys|, m)
  ints per file, KBs at the default m=8192;
- a lookup hashes its keys with the same k seeds (a tiny frame — point
  batches are bounded by contract, like every multiget path here),
  joins them against the exploded sidecar positions, and keeps a file
  iff some key finds ALL its positions set — the standard bloom
  "no false negatives" guarantee, so pruning can only skip files that
  definitely contain none of the keys;
- the real scan reads only surviving files and re-applies
  ``key IN (...)`` as the residual predicate, so a bloom false
  positive costs one extra task, never a wrong row — value-identical
  to the full-scan filter, which is what the DuckDB oracle checks.

At 100 TB / 1M files a 1k-key multiget on a non-clustered column
schedules ~|files actually holding the keys| tasks instead of 1M; the
serve-side join runs ON the cluster (exploded sidecar ≤ m rows/file),
and only surviving file NAMES reach the driver. False-positive math is
the usual bloom bound ((1-e^{-k·n_f/m})^k per file, n_f = distinct
keys per file) — m is the store-build knob, recorded in meta.

Commit protocol (functions/store_commit): retract → data + sidecar →
meta-last; readers refuse an uncommitted store. Single-writer, like
every meta-rewriting store. The sidecar stores file BASENAMES so the
store stays relocatable (copy/rsync between clusters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _positions(col, m: int, k: int):
    """Array of the k bloom bit positions for ``col`` — pure JVM
    expressions, identical at build and lookup time by construction."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)).cast("int") for i in range(k)]
    )


def _file_positions(spark: SparkSession, files: "list[str]", key_col: str,
                    m: int, k: int):
    """Per-file sorted distinct bloom positions over exactly ``files``
    (one data column read via the hidden ``_metadata`` file path;
    basenames keep the store relocatable)."""
    return (
        spark.read.parquet(*files)
        .select(
            F.col("_metadata.file_path").alias("file"),
            F.col(key_col).alias("key"),
        )
        .where(F.col("key").isNotNull())
        .select("file", F.explode(_positions(F.col("key"), m, k)).alias("pos"))
        .groupBy("file")
        .agg(F.sort_array(F.collect_set("pos")).alias("positions"))
        .select(
            F.element_at(F.split(F.col("file"), "/"), -1).alias("file"),
            "positions",
        )
    )


def write_bloom_table(
    df: DataFrame,
    path: str,
    key_col: str,
    n_files: int | None = None,
    m: int = 8192,
    k: int = 4,
    applied_tags=(),
) -> None:
    """Persist ``df`` with a per-file bloom sidecar on ``key_col``.

    ``n_files`` round-robins the data into that many files (a layout
    knob for tests/benchmarks); default keeps the incoming layout —
    the point of a bloom index is that it works on whatever layout the
    range workload already chose. Null keys never match a multiget, so
    they contribute no positions.

    Sizing rule: ``m`` should be ~10x the DISTINCT keys per file
    (k·n_f/m ≈ 0.4 → ~2% fp at k=4); a saturated bloom prunes nothing
    while still costing the sidecar join. Sidecar size is
    min(k·n_f, m) ints per file either way."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = df.sparkSession
    key_ddl = df.schema[key_col].dataType.simpleString()
    SC.retract_meta(path)
    out = df.repartition(n_files) if n_files else df
    out.write.mode("overwrite").parquet(path + "/data")
    data_files = [
        os.path.join(path, "data", f)
        for f in SC.list_parquet_files(path + "/data")
    ]
    _file_positions(spark, data_files, key_col, m, k).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/bloom")
    SC.write_manifest(path, "base", SC.list_parquet_files(path + "/bloom"))
    SC.commit_meta(
        path,
        {
            "key_col": key_col,
            "key_ddl": key_ddl,
            "m": m,
            "k": k,
            "manifests": ["base"],
            "applied": [str(t) for t in applied_tags],
        },
    )


def _resolve_bloom(spark: SparkSession, path: str, meta: dict):
    """The committed sidecar rows under ONE meta snapshot (manifest
    union; directory fallback for a pre-manifest store)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    rel = SC.resolve_manifest_files(path, meta)
    if rel is None:
        return spark.read.parquet(path + "/bloom")
    return spark.read.parquet(*[os.path.join(path, "bloom", f) for f in rel])


def append_bloom_batch(
    df: DataFrame,
    path: str,
    batch_tag: "str | None" = None,
    n_files: int | None = None,
) -> bool:
    """Fold an ingest batch into the bloom-indexed table: publish the
    batch's files and commit their bloom rows behind the manifest
    pointer, under the store's pinned (m, k). Returns False (replay
    no-op) when ``batch_tag`` was already applied.

    Crash/replay, legacy backfill, and visibility semantics live in
    ONE place — ``store_commit.append_flat_store_batch`` (same state
    machine as the zonemap append). The batch's key column is cast to
    the store's pinned ``key_ddl`` BEFORE hashing and writing: Spark's
    xxhash64 hashes int and bigint differently, so a type-skewed batch
    would otherwise write sidecar positions that never match a lookup
    — silent bloom false negatives, the one thing the store must never
    produce. Single-writer."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = df.sparkSession
    meta0 = SC.read_meta(path)
    key_col = meta0["key_col"]
    m, k = int(meta0["m"]), int(meta0["k"])
    df = df.withColumn(key_col, F.col(key_col).cast(meta0["key_ddl"]))
    out = df.repartition(n_files) if n_files else df
    return SC.append_flat_store_batch(
        path,
        batch_tag,
        write_batch=lambda dest, mode: out.write.mode(mode).parquet(dest),
        build_sidecar=lambda files: _file_positions(
            spark, files, key_col, m, k
        ),
        sidecar_sub="bloom",
    )


from spark_indexedrdd_spark.functions.store_commit import (  # noqa: E402
    StreamTagMixin as _StreamTagMixin,
)


class StreamingBloomIngest(_StreamTagMixin):
    """foreachBatch ingest for the bloom-indexed table — the
    store-family streaming twin (postings convention): first non-empty
    batch initializes with its batch_id committed in the replay
    ledger; later batches append with the batch_id as the replay tag,
    so at-least-once re-delivery of a committed batch is a no-op.
    Tags are checkpoint-namespaced via ``attach`` (StreamTagMixin,
    r14), so a fresh checkpoint's reset batch ids never collide with
    another run's committed tags."""

    def __init__(
        self,
        path: str,
        key_col: str,
        n_files: int | None = None,
        m: int = 8192,
        k: int = 4,
        optimize_every: int | None = None,
        vacuum_every: int | None = None,
        keep_versions: int = 8,
        pin_tag_dir: str | None = None,
    ):
        self.path = path
        self.key_col = key_col
        self.n_files = n_files
        self.m = m
        self.k = k
        # the postings cadence: fold the manifest list with the
        # snapshot-preserving re-merge once it reaches N entries
        self.optimize_every = optimize_every
        # vacuum_every (r14): the shared self-maintenance cadence
        # (snapshots.LedgerVacuumCadence — full-interval re-arm, pin
        # routing, threshold refusal). Bloom is a flat sidecar store,
        # so the data GC needs the batch's session.
        if vacuum_every is not None:
            from spark_indexedrdd_spark.functions.snapshots import (
                LedgerVacuumCadence,
            )

            self._vacuum = LedgerVacuumCadence(
                path, vacuum_every, keep_versions, pin_tag_dir
            )
        else:
            self._vacuum = None
        self._initialized = os.path.exists(os.path.join(path, "meta.json"))

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        tag = self._stream_tag(str(batch_id))
        if self._legacy_applied(self.path, str(batch_id)):
            return
        if not self._initialized:
            write_bloom_table(
                batch_df,
                self.path,
                self.key_col,
                n_files=self.n_files,
                m=self.m,
                k=self.k,
                applied_tags=(tag,),
            )
            self._initialized = True
        else:
            append_bloom_batch(
                batch_df, self.path, batch_tag=tag,
                n_files=self.n_files,
            )
            if self.optimize_every:
                from spark_indexedrdd_spark.functions import (
                    store_commit as _SC,
                )

                n = len(_SC.read_meta(self.path).get("manifests") or [])
                if n >= int(self.optimize_every):
                    optimize_bloom_store(
                        batch_df.sparkSession, self.path, self.n_files
                    )
        if self._vacuum is not None:
            self._vacuum.maybe_vacuum(spark=batch_df.sparkSession)

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        """Start a streaming query feeding this ingest (postings-twin
        convention): checkpointed batch_ids + the replay-tag ledger
        give exactly-once store effects over at-least-once delivery."""
        return self._start_stream(
            stream_df, checkpoint_dir, "update", **trigger_kwargs
        )


def optimize_bloom_store(
    spark: SparkSession, path: str, n_files: int | None = None
) -> int:
    """Snapshot-PRESERVING re-merge of the bloom-indexed table: read
    the committed rows through the sidecar, re-pack into ``n_files``
    (default: let the plan pick), rebuild per-file blooms under the
    store's pinned (m, k), and publish through the sidecar-manifest
    commit (store_commit.optimize_flat_store — the zonemap optimize's
    twin). Fewer, fuller files mean fewer sidecar rows per lookup and
    per-file blooms re-sized to their actual key counts; old snapshots
    keep serving until vacuum (``vacuum_store(path, spark=...)`` — the
    ``data/`` GC needs a session to read the sidecars; a bare
    ``vacuum_store(path)`` skips it and says so in its report's
    ``data_gc`` note). Returns the live data-file count."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    if meta.get("manifests") is None:
        raise ValueError(
            "optimize_bloom_store requires a manifest-pointer store; "
            "one append backfills it, or rebuild"
        )
    key_col = meta["key_col"]
    m, k = int(meta["m"]), int(meta["k"])
    side = _resolve_bloom(spark, path, meta)
    files = sorted(
        os.path.join(path, "data", r.file)
        for r in side.select("file").distinct().collect()
    )
    if not files:
        # empty committed store: no-op, matching optimize_zonemap_store
        # (spark.read.parquet() with zero paths raises opaquely)
        return 0
    live = spark.read.parquet(*files)
    out = live.repartition(n_files) if n_files else live
    SC.optimize_flat_store(
        path,
        meta,
        write_data=lambda dest: out.write.mode("overwrite").parquet(dest),
        build_sidecar=lambda fs: _file_positions(spark, fs, key_col, m, k),
        sidecar_sub="bloom",
    )
    return _resolve_bloom(spark, path, meta).select("file").distinct().count()


def bloom_prune_files(
    spark: SparkSession,
    path: str,
    keys,
) -> "tuple[list[str], int]":
    """(surviving absolute file paths, total file count) for a point
    lookup of ``keys``. A file survives iff SOME key finds all of its
    k positions in the file's bloom — no false negatives, so a skipped
    file provably contains none of the keys."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    side = _resolve_bloom(spark, path, meta)
    # the total is diagnostic; only this tuple form pays for the count
    return _surviving_files(spark, path, meta, side, keys), side.count()


def _surviving_files(spark, path: str, meta: dict, side, keys) -> "list[str]":
    m, k = int(meta["m"]), int(meta["k"])
    keys = [kk for kk in keys if kk is not None]
    if not keys:
        return []
    kf = (
        spark.createDataFrame([(kk,) for kk in keys], ["key"])
        .select(F.col("key").cast(meta["key_ddl"]).alias("key"))
        .dropna()
        .distinct()
        # distinct positions per key: two seeds may collide on one
        # position, and the match test below counts distinct hits
        .select(
            "key",
            F.array_distinct(_positions(F.col("key"), m, k)).alias("kpos"),
        )
        .select("key", F.size("kpos").alias("need"), F.explode("kpos").alias("pos"))
    )
    hits = (
        side.select("file", F.explode("positions").alias("pos"))
        .join(F.broadcast(kf), "pos")
        .groupBy("file", "key", "need")
        .agg(F.count("*").alias("got"))
        .where(F.col("got") == F.col("need"))
        .select("file")
        .distinct()
    )
    files = [os.path.join(path, "data", r.file) for r in hits.collect()]
    return sorted(files)


def bloom_multiget(
    spark: SparkSession,
    path: str,
    keys,
    version: "int | None" = None,
) -> DataFrame:
    """The store's rows with ``key_col`` in ``keys``, scanning only
    bloom-surviving files. Value-identical to
    ``read.parquet(data).where(key IN keys)`` — the sidecar changes
    which tasks run, never the answer (the residual IN-filter and the
    parquet row-group stats still apply inside each file).

    ``version`` reads the store AS OF an earlier committed meta
    (store_commit's version ledger): the snapshot's sidecar manifests
    name only the batches committed by then, and data files are
    reached solely through those sidecar rows — so later appends are
    invisible (zonemap_read docstring, same shape)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.resolve_serve_meta(path, version)
    key_col = meta["key_col"]
    keys = [kk for kk in keys if kk is not None]
    side = _resolve_bloom(spark, path, meta)
    files = _surviving_files(spark, path, meta, side, keys)
    if not files:
        return spark.read.parquet(path + "/data").where(F.lit(False))
    return (
        spark.read.parquet(*files)
        .where(F.col(key_col).cast(meta["key_ddl"]).isin(keys))
    )
