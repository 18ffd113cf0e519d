"""Symmetric per-vector int8 embedding quantization.

The storage/bandwidth lever for 100 TB embedding tables: float32 →
int8 + one float64 scale per vector is a 4× reduction on the column that
dominates ANN scan cost, with reconstruction error bounded by scale/2
per component. Quantize once at ingest, ship int8 over the wire, and
dequantize (or score directly in int8) inside the scan.

All arithmetic is cross-engine exact by construction, so the error-stats
query carries a DuckDB oracle:

- ``scale = max(|x|) / 127`` — array_max is order-free comparisons;
  the division is one IEEE op.
- ``q_i = round(x_i / scale)`` — both engines round half away from zero
  for doubles (Spark HALF_UP, DuckDB round()); |x_i/scale| ≤ 127 by
  construction, so int8 never clips.
- ``err_i = |x_i - q_i * scale|``, reported as the order-free array_max.

The reference has no similarity/storage surface (SURVEY.md §2.5) —
extension operator.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame

from spark_indexedrdd_spark.localframe import local_rows_df
from pyspark.sql import functions as F
from spark_indexedrdd_spark.checkpoint import truncate_lineage

INT8_MAX = 127.0


def _scale(vec: Column) -> Column:
    return (
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
        / F.lit(INT8_MAX)
    )


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, scale double, qvec array<tinyint>): symmetric per-vector
    int8. Zero vectors get scale 0 and all-zero codes (guarded division).
    Narrow map — no shuffle; at scale this runs inside the ingest scan.

    The per-vector scale is materialized behind a projection fence
    (same device as text._tokenized): HOF lambdas are interpreted with
    NO common-subexpression elimination, so an inlined ``scale``
    re-runs its array_max aggregate once per ELEMENT reference —
    O(dims²) interpreted work per row. CollapseProject keeps the fence
    (a non-cheap alias referenced more than once is not merged);
    values are bit-identical."""
    pre = emb.select(
        F.col(id_col),
        F.col(vec_col),
        _scale(F.col(vec_col)).alias("__scale"),
    )
    safe = F.when(F.col("__scale") > 0, F.col("__scale")).otherwise(F.lit(1.0))
    qvec = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") / safe).cast("tinyint"),
    )
    return pre.select(
        F.col(id_col),
        F.col("__scale").alias("scale"),
        qvec.alias("qvec"),
    )


def dequantize_int8(
    qdf: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(id, embedding array<double>) reconstructed as ``q_i * scale`` —
    the exact arithmetic the error stats account for."""
    return qdf.select(
        F.col(id_col),
        F.transform(
            F.col("qvec"), lambda q: q.cast("double") * F.col("scale")
        ).alias("embedding"),
    )


def quantize_error_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector reconstruction report: (id, scale, max_abs_err).
    ``max_abs_err ≤ scale/2`` always (round-to-nearest); the query is the
    ingest-time acceptance check for the quantized table. Oracle:
    :func:`sql_quantize_error_stats` — every step is order-free or a
    single IEEE op, so the doubles hash-match exactly.

    ``scale`` is materialized behind a projection fence (see
    :func:`quantize_int8`): inlined, the interpreted error lambda
    re-ran the array_max aggregate TWICE per element (O(dims²) per
    row) — measured 1.64 s → 0.29 s warm min-of-3 at sf0.1 (2k × 64
    dims; quantize_int8 0.99 → 0.24 s), values bit-identical."""
    pre = emb.select(
        F.col(id_col),
        F.col(vec_col),
        _scale(F.col(vec_col)).alias("__scale"),
    )
    safe = F.when(F.col("__scale") > 0, F.col("__scale")).otherwise(F.lit(1.0))
    err = F.transform(
        F.col(vec_col),
        lambda x: F.abs(
            x.cast("double")
            - F.round(x.cast("double") / safe) * safe
        ),
    )
    return pre.select(
        F.col(id_col),
        F.col("__scale").alias("scale"),
        F.array_max(err).alias("max_abs_err"),
    )


# ------------------------------------------------------------------ #
# Binary (sign-bit) quantization + Hamming-prefiltered ANN — the most
# aggressive tier of the compression family (int8 4x, PQ ~16-64x,
# binary 32x *and* integer-only prefilter arithmetic).
# ------------------------------------------------------------------ #

# 32 sign bits per packed word: folding 32 bits tops out at 2^32-1,
# which a BIGINT word holds without ever touching the sign bit — the
# same fold with 64 bits per word would overflow (ANSI mode would
# throw, and DuckDB would disagree on the wrap).
BINARY_WORD_BITS = 32


def binary_sketch(vec: Column, dims: int) -> Column:
    """array<bigint> of ceil(dims/32) words; bit = 1 iff component > 0,
    MSB-first within each word. A sequential integer fold per word
    (F.aggregate) — narrow projection, JVM codegen, no shuffle; the
    DuckDB twin folds the identical sequence (:func:`_sql_sketch`)."""
    words = []
    for w in range(0, dims, BINARY_WORD_BITS):
        width = min(BINARY_WORD_BITS, dims - w)
        words.append(
            F.aggregate(
                F.slice(vec, w + 1, width),
                F.lit(0).cast("long"),
                lambda acc, x: acc * 2
                + F.when(x.cast("double") > 0, 1).otherwise(0),
            )
        )
    return F.array(*words)


def _hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two packed sketches: popcount of the
    per-word XOR, summed. Pure integer ops — exact on any engine."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, c: acc + c,
    ).cast("int")


def binary_sketches(
    emb: DataFrame,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """(id, sketch array<bigint>[, keep_cols...]): the persisted form —
    32× smaller than float32, computed inside the ingest scan (narrow).
    ``keep_cols`` rides metadata beside each sketch so a filtered serve
    can predicate STAGE 1 (binary_store_ann docstring)."""
    return emb.select(
        F.col(id_col),
        binary_sketch(F.col(vec_col), dims).alias("sketch"),
        *[F.col(c) for c in keep_cols],
    )


def binary_ann(
    emb: DataFrame,
    query_ids: "Iterable[int]",
    k: int = 5,
    n_candidates: int = 96,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: Hamming prefilter on sign sketches, exact cosine
    re-rank. Returns (q_id, cand_id, hamming int, cosine_sim, rank).

    Stage 1 scores every candidate against every (broadcast) query —
    but the score is a couple of XOR+popcounts on packed words, ~100×
    cheaper than the 64-dim double fold, and the per-query top-M filter
    (``rank <= n_candidates``) compiles to WindowGroupLimit: each map
    partition forwards at most M rows per query into the exchange, so
    the shuffle carries O(|q| * M * partitions), never O(|q| * N).
    Stage 2 runs the exact sequential-fold cosine on the ≤ |q|·M
    survivors only. Recall is pinned in tests (clustered data); both
    stages break ties on cand_id, so :func:`sql_binary_ann` is an exact
    DuckDB twin (integer Hamming + bit-identical fold arithmetic).

    This is the intended-BNLJ family (cf. cosine_topk): the query side
    is broadcast; the corpus is scanned once and never shuffled."""
    from spark_indexedrdd_spark.functions.vectors import dot, norm
    from pyspark.sql import Window

    q = F.broadcast(
        emb.where(F.col(id_col).isin(list(query_ids))).select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_norm"),
            binary_sketch(F.col(vec_col), dims).alias("q_sketch"),
        )
    )
    cand = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        binary_sketch(F.col(vec_col), dims).alias("c_sketch"),
    )
    pre_w = Window.partitionBy("q_id").orderBy(
        F.asc("hamming"), F.asc("cand_id")
    )
    survivors = (
        q.crossJoin(cand)
        .where(F.col("q_id") != F.col("cand_id"))
        .select(
            "q_id", "cand_id", "q_vec", "q_norm", "c_vec",
            _hamming(F.col("q_sketch"), F.col("c_sketch")).alias("hamming"),
        )
        .withColumn("pre_rank", F.row_number().over(pre_w))
        .where(F.col("pre_rank") <= n_candidates)
    )
    scored = survivors.select(
        "q_id",
        "cand_id",
        "hamming",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * norm(F.col("c_vec")))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine_sim"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id", "cand_id", "hamming", "cosine_sim",
            F.col("rank").cast("int"),
        )
    )


# ------------------------------------------------------------------ #
# Persisted binary index: the serving layout for the sign-sketch tier
# (the binary analog of the IVF/IVFPQ stores).
# ------------------------------------------------------------------ #


def write_binary_store(
    emb: DataFrame,
    path: str,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: "tuple[str, ...]" = (),
    applied_tags: "tuple[str, ...]" = (),
) -> None:
    """Materialize the two-file serving layout:

    - ``path/sketches`` — (id, sketch array<bigint>): 16 B + id per
      vector, the column EVERY query scans in full. 32× smaller than
      float32 vectors, so the stage-1 Hamming pass reads ~3% of the
      corpus bytes.
    - ``path/vectors`` — the full vectors, range-partitioned and SORTED
      by id (write_sorted layout): stage 2 fetches only the ≤ |q|·M
      surviving ids, and the id predicate prunes to the few files/row
      groups that hold them — a point read, not a scan.

    One narrow pass over the corpus at build time; no shuffle for the
    sketches (fused into the scan projection).

    Commit protocol (store_commit docstring): retract the old meta
    marker, land both files, commit meta atomically LAST — a crashed
    rebuild cannot leave new sketches pointing stage 2 at the OLD
    vector file (ids that no longer exist, or stale vectors re-ranked
    as current)."""
    import os as _os

    from spark_indexedrdd_spark.core import IndexedDataFrame
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.sources.bucketed import write_sorted

    SC.validate_keep_cols(emb, keep_cols, reserved=(id_col, vec_col))
    SC.retract_meta(path)
    binary_sketches(emb, dims, id_col, vec_col, keep_cols).write.mode(
        "overwrite"
    ).parquet(path + "/sketches")
    idf = IndexedDataFrame.from_unique(
        emb.select(id_col, vec_col), id_col, cache=False
    )
    write_sorted(idf, path + "/vectors")
    # manifest-pointer commit (r11): BOTH parts' file lists are named
    # by the committed meta (sk_manifests / vec_manifests — the
    # postings manifests/dl_manifests twin-list shape), so appends are
    # snapshot-isolated and versioned away, and a crashed append's
    # stray files are invisible rather than dead-but-scanned
    SC.write_manifest(
        path, "base", SC.list_parquet_files(path + "/sketches")
    )
    SC.write_manifest(
        path, "vec-base", SC.list_parquet_files(path + "/vectors")
    )
    SC.commit_meta(
        path,
        {
            "dims": int(dims),
            "keep_cols": list(keep_cols),
            "id_col": id_col,
            "vec_col": vec_col,
            "sk_manifests": ["base"],
            "vec_manifests": ["vec-base"],
            # the streaming twin passes its first batch_id here so a
            # crash between build and checkpoint can never double-apply
            # batch 0 (StreamingPostingsStore convention)
            "applied": [str(t) for t in applied_tags],
            # identity of THIS build: store_changes refuses an
            # interval that crosses a rebuild (ledgers reset)
            "build_token": _os.urandom(8).hex(),
        },
    )


def _sketches_for_meta(spark, path: str, meta: dict) -> DataFrame:
    """The sketch frame under ONE committed meta snapshot — shared
    protocol (store_commit.read_store_files), legacy fallback."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    return SC.read_store_files(spark, path, meta, "sk_manifests", "sketches")


def _bin_vectors_for_meta(spark, path: str, meta: dict) -> DataFrame:
    """The stage-2 vector frame under the same committed snapshot —
    shared protocol (store_commit.read_store_files). The flat file
    list keeps the sorted layout's min/max pruning: each published
    file is still internally id-sorted, so the survivors' isin
    predicate prunes files/row groups exactly as before."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    return SC.read_store_files(
        spark, path, meta, "vec_manifests", "vectors"
    )


def append_binary_batch(
    new_emb: DataFrame,
    path: str,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_tag: "str | None" = None,
) -> bool:
    """Fold an ingest batch in: append its vectors, THEN its sketches.
    Sketch computation is stateless, so appends need no read of
    existing store data.

    Commit protocol (r11): both parts' file lists land in twin
    manifests (``<tag>`` for sketches, ``vec-<tag>`` for vectors —
    the postings manifests/dl_manifests shape) and ONE atomic meta
    commit makes them visible, so a crash ANYWHERE before it leaves
    stray files no committed manifest names — invisible to
    manifest-resolved readers — and the version ledger's as-of surface
    covers appends. With a ``batch_tag`` the append is staged and
    crash-replayable exactly-once (returns False on a committed tag's
    replay); without one it is a direct append under anonymous
    manifests.

    The vectors-before-sketches write ORDER is kept for the legacy
    (pre-manifest) window, where readers list directories: a crash
    between the writes leaves extra vectors no sketch references
    (invisible, harmless) rather than sketch rows whose stage-2
    vectors are missing (stage 2's join would silently DROP those
    candidates — recall loss with no error). Redelivering the SAME
    batch after a crash is serve-exact on both shapes: manifest
    readers never see the crashed files, and the legacy
    ``binary_store_ann`` keeps one vector copy per id
    (pytest-pinned)."""
    import os

    from spark_indexedrdd_spark.core import IndexedDataFrame
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.sources.bucketed import write_sorted

    meta = SC.read_meta(path)
    applied = meta.setdefault("applied", [])
    if batch_tag is not None:
        SC.validate_batch_tag(batch_tag)
        if SC.tag_is_applied(meta, batch_tag):
            SC.cleanup_flat_staging(path, batch_tag)
            return False
        SC.refuse_manifest_collision(
            meta, batch_tag,
            reserved=("vec-",) + SC.COMMON_RESERVED_PREFIXES,
        )
    # names AND types vs the persisted sketch rows (store_commit
    # helper); the schema read is skipped when the store keeps none
    keep_cols = SC.enforce_store_keep_cols(
        meta,
        new_emb,
        store_df=(
            _sketches_for_meta(new_emb.sparkSession, path, meta)
            if meta.get("keep_cols") else None
        ),
    )
    # delete-wins until compaction (ivf.append_ivf_batch convention,
    # r11 review finding): a re-ingested tombstoned id would land in
    # committed manifests while stage 1's anti-join hides it, and the
    # CDC's added∧deleted netting would drop the delete event
    if meta.get("deletes"):
        _spark = new_emb.sparkSession
        tomb = SC.committed_tombstones(
            _spark, path, meta, id_col,
            _sketches_for_meta(_spark, path, meta)
            .schema[id_col].dataType,
        )
        if tomb is not None:
            new_emb = new_emb.join(F.broadcast(tomb), id_col, "left_anti")
    sk_dir = os.path.join(path, "sketches")
    vec_dir = os.path.join(path, "vectors")
    if meta.get("sk_manifests") is None:
        # legacy backfill: the pre-append directory listings ARE the
        # committed base (single-writer); sweep THIS tag's crashed
        # strays first so they can't be counted twice after the
        # deterministic republish (append_flat_store_batch docstring)
        if batch_tag is not None:
            SC.sweep_tagged_files(sk_dir, batch_tag)
            SC.sweep_tagged_files(vec_dir, batch_tag)
        SC.write_manifest(path, "base", SC.list_parquet_files(sk_dir))
        SC.write_manifest(
            path, "vec-base", SC.list_parquet_files(vec_dir)
        )
        meta["sk_manifests"] = ["base"]
        meta["vec_manifests"] = ["vec-base"]
        # re-run the refusal now that the backfilled names exist: on a
        # legacy store the tag 'base' passed the early check (empty
        # lists) and the write_manifest below would OVERWRITE the
        # backfill with only the batch's files — silently erasing the
        # whole pre-batch corpus from the committed view (r11 review
        # finding). Raising here costs nothing: nothing staged yet.
        if batch_tag is not None:
            SC.refuse_manifest_collision(
                meta, batch_tag,
                reserved=("vec-",) + SC.COMMON_RESERVED_PREFIXES,
            )
    idf = IndexedDataFrame.from_unique(
        new_emb.select(id_col, vec_col), id_col, cache=False
    )
    if batch_tag is None:
        pre_v = set(SC.list_parquet_files(vec_dir))
        write_sorted(idf, vec_dir, mode="append")
        new_v = sorted(set(SC.list_parquet_files(vec_dir)) - pre_v)
        pre_s = set(SC.list_parquet_files(sk_dir))
        binary_sketches(
            new_emb, dims, id_col, vec_col, keep_cols
        ).write.mode("append").parquet(sk_dir)
        new_s = sorted(set(SC.list_parquet_files(sk_dir)) - pre_s)
        mname = f"anon-{len(meta['sk_manifests']):05d}"
        taken = SC._taken_manifest_names(meta)
        while mname in taken or ("vec-" + mname) in taken:
            mname += "x"
    else:
        stage = os.path.join(path, "_staging", batch_tag)
        write_sorted(idf, os.path.join(stage, "vectors"))
        binary_sketches(
            new_emb, dims, id_col, vec_col, keep_cols
        ).write.mode("overwrite").parquet(os.path.join(stage, "sketches"))
        SC.sweep_tagged_files(vec_dir, batch_tag)
        SC.sweep_tagged_files(sk_dir, batch_tag)
        new_v = SC.publish_staged_flat(
            os.path.join(stage, "vectors"), vec_dir, batch_tag
        )
        new_s = SC.publish_staged_flat(
            os.path.join(stage, "sketches"), sk_dir, batch_tag
        )
        mname = batch_tag
    if mname in SC._taken_manifest_names(meta) or (
        "vec-" + mname
    ) in SC._taken_manifest_names(meta):
        # belt-and-braces re-check of the refusals above
        raise ValueError(f"batch_tag {mname!r} collides with a manifest")
    SC.write_manifest(path, mname, new_s)
    SC.write_manifest(path, "vec-" + mname, new_v)
    meta["sk_manifests"].append(mname)
    meta["vec_manifests"].append("vec-" + mname)
    if batch_tag is not None:
        applied.append(batch_tag)
    SC.commit_meta(path, meta)  # <-- commit point
    if batch_tag is not None:
        SC.cleanup_flat_staging(path, batch_tag)
    return True


def binary_store_ann(
    spark,
    path: str,
    query_vecs: "list[tuple[int, list[float]]]",
    k: int = 5,
    n_candidates: int = 96,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: "int | None" = None,
    filter_pred: "str | None" = None,
) -> DataFrame:
    """Serve ANN queries from the persisted store: stage 1 scans ONLY
    the sketch file (Hamming against driver-computed query sketches,
    WindowGroupLimit top-M); stage 2 joins the ≤ |q|·M survivors back
    to the sorted vector file — a broadcast join whose id predicate
    prunes files/row groups — and re-ranks with the exact fold cosine.
    Query vectors arrive as driver-side (id, vector) pairs (the serving
    interface — queries are not usually corpus rows).

    Same output contract as :func:`binary_ann`: (q_id, cand_id,
    hamming, cosine_sim, rank); equality with the in-plan operator is
    pytest-pinned (store ≡ in-plan on the same corpus).
    FileNotFoundError on an uncommitted (crashed-rebuild) store."""
    import math

    from pyspark.sql import Window

    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.functions.vectors import dot, norm

    # commit-marker check + the snapshot: ONE meta read pins the
    # tombstone set AND both parts' file sets (sk_manifests /
    # vec_manifests, r11) — committed deletes (delete_binary_ids) are
    # excluded in STAGE 1 below, and ``version`` serves AS OF an
    # earlier commit with appends after it invisible. Legacy
    # pre-manifest stores fall back to directory listings
    # (delete-history-only as-of; one tagged append backfills).
    meta = SC.resolve_serve_meta(path, version)

    def py_sketch(vec):
        words = []
        for w in range(0, len(vec), BINARY_WORD_BITS):
            acc = 0
            for x in vec[w : w + BINARY_WORD_BITS]:
                acc = acc * 2 + (1 if float(x) > 0 else 0)
            words.append(acc)
        return words

    def py_norm(vec):
        acc = 0.0
        for x in vec:
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    q = F.broadcast(
        local_rows_df(
            spark,
            [
                (int(i), [float(x) for x in v], py_sketch(v), py_norm(v))
                for i, v in query_vecs
            ],
            f"q_id long, q_vec array<double>, q_sketch array<bigint>, "
            f"q_norm double",
        )
    )
    sk = _sketches_for_meta(spark, path, meta)
    tomb = SC.committed_tombstones(
        spark, path, meta, id_col, sk.schema[id_col].dataType
    )
    if tomb is not None:
        # takedown-batch sized — broadcast anti-join ON the sketch
        # scan, so a deleted id can't displace live Hamming candidates
        sk = sk.join(F.broadcast(tomb), id_col, "left_anti")
    if filter_pred:
        # FILTERED ANN: the predicate (over keep_cols persisted at
        # build) lands in STAGE 1 for the same reason tombstones do —
        # a non-matching id must not displace matching Hamming
        # candidates. Pushed into the sketch scan by Catalyst.
        sk = sk.where(filter_pred)
    pre_w = Window.partitionBy("q_id").orderBy(
        F.asc("hamming"), F.asc("cand_id")
    )
    survivors = (
        q.crossJoin(sk.select(F.col(id_col).alias("cand_id"), "sketch"))
        .where(F.col("q_id") != F.col("cand_id"))
        .select(
            "q_id", "q_vec", "q_norm", "cand_id",
            _hamming(F.col("q_sketch"), F.col("sketch")).alias("hamming"),
        )
        .withColumn("pre_rank", F.row_number().over(pre_w))
        .where(F.col("pre_rank") <= n_candidates)
    )
    # Materialize the (|q|·M)-sized survivor set and turn its ids into
    # a literal isin predicate: a plain join would NOT push the ids
    # into the parquet scan, but the literal predicate reaches it as
    # PushedFilters and prunes to the files/row groups that hold the
    # survivors (plan-asserted in tests). Driver-sized by construction.
    survivors = survivors.cache()
    cand_ids = [
        r.cand_id for r in survivors.select("cand_id").distinct().collect()
    ]
    # dropDuplicates: on a LEGACY (pre-manifest) store a
    # crashed-then-redelivered append leaves the batch's vectors in
    # the file twice (vectors land before sketches —
    # append_binary_batch docstring); the copies are bit-identical, so
    # keeping one per id restores exact serve output instead of the
    # duplicate join rows perturbing row_number ranks. Manifest-
    # resolved reads never see crashed copies, but the dedup stays for
    # the fallback (survivor-sized input ≤ |q|·M rows — trivial).
    vecs = (
        _bin_vectors_for_meta(spark, path, meta)
        .where(F.col(id_col).isin(cand_ids))
        .select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
        .dropDuplicates(["cand_id"])
    )
    scored = F.broadcast(survivors).join(vecs, "cand_id").select(
        "q_id",
        "cand_id",
        "hamming",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * norm(F.col("c_vec")))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine_sim"), F.asc("cand_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id", "cand_id", "hamming", "cosine_sim",
            F.col("rank").cast("int"),
        )
        # serving result is top-k-sized; eager checkpoint lets the
        # survivor cache be released immediately (no lingering plans)
        .transform(truncate_lineage)
    )
    survivors.unpersist()
    return out


def _sql_sketch(vec: str, dims: int) -> str:
    """DuckDB twin of :func:`binary_sketch`: the same MSB-first integer
    fold per 32-bit word. list_reduce's first-element seed equals the
    0-seeded fold because acc0*2+b == b when acc0 would be 0 and the
    first transformed element IS b (0/1)."""
    words = []
    for w in range(0, dims, BINARY_WORD_BITS):
        hi = min(w + BINARY_WORD_BITS, dims)
        bits = (
            f"list_transform({vec}[{w + 1}:{hi}],"
            f" x -> CASE WHEN CAST(x AS DOUBLE) > 0"
            f" THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
        words.append(f"list_reduce({bits}, (acc, b) -> acc * 2 + b)")
    return "[" + ", ".join(words) + "]"


def sql_binary_ann(
    table: str = "embeddings",
    query_ids: "Iterable[int]" = (),
    k: int = 5,
    n_candidates: int = 96,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_pred: "str | None" = None,
) -> str:
    """Exact DuckDB twin of :func:`binary_ann`: integer Hamming on the
    identically-folded sketches, ROW_NUMBER with the same (hamming,
    cand_id) and (cosine DESC, cand_id) tie-breaks, sequential-fold
    cosine (vectors.sql_cosine) on the survivors.

    ``filter_pred`` restricts the CANDIDATE side only (stage-1
    placement, mirroring the Spark serve) — the filtered-ANN twin for
    ``binary_store_ann(filter_pred=)`` on a keep_cols store."""
    from spark_indexedrdd_spark.functions.vectors import sql_cosine

    ids = ", ".join(str(i) for i in query_ids)
    cand_where = f" WHERE ({filter_pred})" if filter_pred else ""
    n_words = (dims + BINARY_WORD_BITS - 1) // BINARY_WORD_BITS
    ham = " + ".join(
        f"CAST(bit_count(xor(q.q_sketch[{i + 1}], c.c_sketch[{i + 1}])) AS BIGINT)"
        for i in range(n_words)
    )
    return f"""
        WITH q AS (
            SELECT {id_col} AS q_id, {vec_col} AS q_vec,
                   {_sql_sketch(vec_col, dims)} AS q_sketch
            FROM {table} WHERE {id_col} IN ({ids})
        ),
        c AS (
            SELECT {id_col} AS cand_id, {vec_col} AS c_vec,
                   {_sql_sketch(vec_col, dims)} AS c_sketch
            FROM {table}{cand_where}
        ),
        pre AS (
            SELECT q.q_id, c.cand_id, q.q_vec, c.c_vec,
                   CAST({ham} AS INTEGER) AS hamming,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.q_id ORDER BY {ham} ASC, c.cand_id ASC
                   ) AS pre_rank
            FROM q CROSS JOIN c
            WHERE q.q_id <> c.cand_id
        ),
        scored AS (
            SELECT q_id, cand_id, hamming,
                   {sql_cosine('q_vec', 'c_vec')} AS cosine_sim
            FROM pre WHERE pre_rank <= {n_candidates}
        )
        SELECT q_id, cand_id, hamming, cosine_sim, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY cosine_sim DESC, cand_id ASC
            ) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def sql_quantize_error_stats(
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB twin of :func:`quantize_error_stats` (same guarded-zero
    branch, same rounding mode — both engines round doubles half away
    from zero)."""
    scale = (
        f"list_max(list_transform({vec_col},"
        f" x -> abs(CAST(x AS DOUBLE)))) / {INT8_MAX}"
    )
    return f"""
        WITH s AS (
            SELECT {id_col}, {vec_col}, {scale} AS scale,
                   CASE WHEN {scale} > 0 THEN {scale} ELSE 1.0 END AS safe
            FROM {table}
        )
        SELECT {id_col}, scale,
               list_max(list_transform({vec_col},
                   x -> abs(CAST(x AS DOUBLE)
                            - round(CAST(x AS DOUBLE) / safe) * safe)
               )) AS max_abs_err
        FROM s
    """


def delete_binary_ids(
    spark,
    path: str,
    ids,
    batch_tag: str,
    id_col: str = "vec_id",
) -> bool:
    """Tombstone-delete stored vectors by id — the takedown path for
    the binary sketch store (reference delete(ks), IndexedRDD.scala:
    120-123, at rest; same protocol as ivf.delete_ivf_ids /
    pq.delete_ivfpq_ids). Returns False (replay no-op) when
    ``batch_tag`` was already applied. Serves anti-join the committed
    set in STAGE 1 (the sketch scan), so a deleted id can neither
    surface nor displace a live candidate from the Hamming top-M.
    Uncastable ids refuse loudly (try_cast + null check)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    # LAZY id_type: a replayed tag returns before the schema scan
    return SC.tombstone_delete(
        spark, path, ids, batch_tag, id_col,
        lambda: spark.read.parquet(path + "/sketches")
        .select(id_col).schema[0].dataType,
    )


def binary_changes(spark, path: str, v_from: int, v_to: int):
    """Version-to-version CDC on the binary sketch store: (vec_id,
    added|deleted), O(delta), resolved from the SKETCH-part manifests
    (one row per id — the vector part's twin lists move in lockstep
    under the same commits). Shared protocol (store_commit
    .store_changes); refuses across OPTIMIZE/compaction/rebuild."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    return SC.store_changes(
        spark, path, v_from, v_to, "sk_manifests", "sketches",
        base_path=False,
    )


def optimize_binary_store(spark, path: str, id_col: "str | None" = None) -> int:
    """Snapshot-PRESERVING compaction of the binary sketch store — the
    two-part twin of :func:`ivf.optimize_ivf_store`: physically fold
    the tombstones and re-merge append-accumulated small files in BOTH
    parts (sketches re-packed; vectors re-sorted through the build's
    own ``write_sorted`` layout, restoring the point-read file/row-group
    pruning appends dilute), published through the twin-manifest
    commit. Old versions' files are untouched — every earlier snapshot
    keeps serving byte-identically, the servability floor does not
    move, and ``store_commit.vacuum_store`` (whose roots include
    ``sketches/`` and ``vectors/``) reclaims them later. Returns the
    live vector count. Refuses on a legacy pre-manifest store (one
    tagged append backfills the pointer)."""
    import os

    from spark_indexedrdd_spark.core import IndexedDataFrame
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.sources.bucketed import write_sorted

    meta = SC.read_meta(path)
    if meta.get("sk_manifests") is None:
        raise ValueError(
            "optimize_binary_store requires a manifest-pointer store; "
            "this store predates the pointer — one append backfills "
            "it, or rebuild"
        )
    id_col = id_col or meta.get("id_col", "vec_id")
    vec_col = meta.get("vec_col", "embedding")
    sk = _sketches_for_meta(spark, path, meta)
    vec = _bin_vectors_for_meta(spark, path, meta)
    tomb = SC.committed_tombstones(
        spark, path, meta, id_col, sk.schema[id_col].dataType
    )
    if tomb is not None:
        sk = sk.join(F.broadcast(tomb), id_col, "left_anti")
        vec = vec.join(F.broadcast(tomb), id_col, "left_anti")
    tag = SC.derive_optimize_tag(meta)
    stage = os.path.join(path, "_staging", tag)
    SC.cleanup_flat_staging(path, tag)
    # legacy-crash debris (pre-manifest redelivery) can hold duplicate
    # copies in BOTH parts; the compacted layout keeps exactly one per
    # id — a surviving duplicate sketch row would occupy two Hamming
    # top-M slots forever, silently displacing a distinct candidate
    # (r11 review finding). Copies are bit-identical, so any-one-kept
    # is exact.
    idf = IndexedDataFrame.from_unique(
        vec.select(id_col, vec_col).dropDuplicates([id_col]),
        id_col,
        cache=False,
    )
    write_sorted(idf, os.path.join(stage, "vectors"))
    sk.dropDuplicates([id_col]).repartition(
        idf.num_partitions
    ).write.mode("overwrite").parquet(os.path.join(stage, "sketches"))
    sk_dir = os.path.join(path, "sketches")
    vec_dir = os.path.join(path, "vectors")
    # publish (invisible until the meta commit); sweep this tag's own
    # names first so a crashed prior attempt's strays can't survive
    SC.sweep_tagged_files(vec_dir, tag)
    SC.sweep_tagged_files(sk_dir, tag)
    new_v = SC.publish_staged_flat(
        os.path.join(stage, "vectors"), vec_dir, tag
    )
    new_s = SC.publish_staged_flat(
        os.path.join(stage, "sketches"), sk_dir, tag
    )
    SC.write_manifest(path, tag, new_s)
    SC.write_manifest(path, "vec-" + tag, new_v)
    meta["retired_manifests"] = sorted(
        set(meta.get("retired_manifests", []))
        | set(meta.get("sk_manifests", []))
        | set(meta.get("vec_manifests", []))
    )
    meta["sk_manifests"] = [tag]
    meta["vec_manifests"] = ["vec-" + tag]
    meta["deletes"] = []
    meta["compactions"] = int(meta.get("compactions", 0)) + 1
    SC.commit_meta(path, meta)  # <-- commit point; floor does NOT move
    SC.cleanup_flat_staging(path, tag)
    return _bin_vectors_for_meta(spark, path, meta).count()


from spark_indexedrdd_spark.functions.store_commit import (  # noqa: E402
    StreamTagMixin as _StreamTagMixin,
)


class StreamingBinaryStore(_StreamTagMixin):
    """foreachBatch ingest for the binary sketch index — the
    store-family streaming twin (postings, IVF, signatures, sketches,
    counts, SCD2). First non-empty batch initializes: its batch_id goes
    into meta.json's replay ledger in the SAME atomic write that
    commits the store, so a crash mid-init re-runs the (idempotent,
    overwrite-mode) build rather than double-applying batch 0; later
    batches fold in through the tagged twin-manifest append
    (:func:`append_binary_batch`), so at-least-once re-delivery of a
    committed batch is a true no-op. ``optimize_every=N`` folds the
    manifest list with the snapshot-preserving
    :func:`optimize_binary_store` whenever it reaches N entries —
    bounded file counts AND a vector part re-sorted back into the
    point-read layout, without breaking the as-of surface."""

    def __init__(
        self,
        path: str,
        dims: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        optimize_every: "int | None" = None,
        vacuum_every: "int | None" = None,
        keep_versions: int = 8,
        pin_tag_dir: "str | None" = None,
    ):
        import os

        self.path = path
        self.dims = dims
        self.id_col = id_col
        self.vec_col = vec_col
        self.optimize_every = optimize_every
        # vacuum_every (r14): the shared self-maintenance cadence every
        # ledger-backed streaming writer rides
        # (snapshots.LedgerVacuumCadence — full-interval re-arm, pin
        # routing, threshold refusal), completing the binary tier's
        # postings/IVF parity: bounded data files (optimize_every) AND
        # bounded ledger + retention (vacuum_every), pin-safe.
        if vacuum_every is not None:
            from spark_indexedrdd_spark.functions.snapshots import (
                LedgerVacuumCadence,
            )

            self._vacuum = LedgerVacuumCadence(
                path, vacuum_every, keep_versions, pin_tag_dir
            )
        else:
            self._vacuum = None
        self._initialized = os.path.exists(
            os.path.join(path, "meta.json")
        )

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        tag = self._stream_tag(f"b{batch_id}")
        if self._legacy_applied(self.path, f"b{batch_id}"):
            return
        if not self._initialized:
            write_binary_store(
                batch_df, self.path, self.dims, self.id_col,
                self.vec_col, applied_tags=(tag,),
            )
            self._initialized = True
            # the twins' convention: the cadence never fires on the
            # fresh single-batch build it would pointlessly rewrite
            return
        append_binary_batch(
            batch_df, self.path, self.dims, self.id_col,
            self.vec_col, batch_tag=tag,
        )
        if self.optimize_every:
            from spark_indexedrdd_spark.functions import (
                store_commit as _SC,
            )

            n = len(_SC.read_meta(self.path).get("sk_manifests") or [])
            if n >= int(self.optimize_every):
                optimize_binary_store(
                    batch_df.sparkSession, self.path, self.id_col
                )
        if self._vacuum is not None:
            self._vacuum.maybe_vacuum()

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        return self._start_stream(
            stream_df, checkpoint_dir, "update", **trigger_kwargs
        )
