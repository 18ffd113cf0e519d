"""Deduplication operators for training-data pipelines.

Five families, each Spark-first (built-in expressions; shuffles only where
set semantics require them) with a DuckDB-SQL twin generated from the same
constants:

- exact: hash-groupBy on normalized text (one shuffle on the digest).
- MinHash + LSH: shingle → k minhashes → b bands → bucket self-join.
  Candidate generation never compares all pairs: the self-join key is
  (band_id, band_hash), so at 100 TB the shuffle is by band bucket and
  skew is bounded by bucket size (salt/boost bands if a bucket explodes).
- SimHash: 64-bit sign-aggregated token-hash fingerprint (two 32-bit
  halves to stay inside portable BIGINT math).
- n-gram Jaccard: exact set overlap for candidate pairs within a
  blocking key (defaults to ``source`` — never all-pairs).
- embedding cosine: see functions/similarity.py (near_duplicates).

Cross-engine determinism: all hashing derives from md5-hex (identical in
Spark and DuckDB); minhash = integer universal hashing
((a_i*x + b_i) mod 2^31-1) over one md5-derived base hash per shingle —
exact int64 arithmetic in both engines.

Reference parity note: the reference has no dedup operators at all
(SURVEY.md §2.5) — this is the extension surface for LLM-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions.text import sql_tokens, tokens
from spark_indexedrdd_spark.localframe import local_rows_df
from spark_indexedrdd_spark.checkpoint import truncate_lineage

# MinHash configuration (shared by Spark + SQL sides).
NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
SHINGLE_SIZE = 3
# Stop-shingle guard for ngram_jaccard_pairs: a shingle appearing in
# more than this many documents is boilerplate, not signal, and its join
# key would expand quadratically. Shared by the Spark and SQL sides.
STOP_SHINGLE_DF = 1000


# --------------------------------------------------------------------- #
# Exact dedup
# --------------------------------------------------------------------- #


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per exact (normalized) text: returns
    (doc_id, fp_md5, group_size). One hash-aggregate; at scale this is a
    single shuffle on the digest with map-side partial aggregation."""
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    return (
        df.select(F.col(id_col), F.md5(norm).alias("fp_md5"))
        .groupBy("fp_md5")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").cast("long").alias("group_size"),
        )
        .select(id_col, "fp_md5", "group_size")
    )


def sql_exact_dedup(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    t = sql_tokens(text_col)
    return f"""
        SELECT MIN({id_col}) AS {id_col}, fp_md5,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM (SELECT {id_col}, md5(array_to_string({t}, ' ')) AS fp_md5 FROM {table})
        GROUP BY fp_md5
    """


# --------------------------------------------------------------------- #
# Shingles (shared by MinHash + Jaccard)
# --------------------------------------------------------------------- #


def shingle_array(toks: "F.Column") -> "F.Column":
    """Distinct word n-gram shingles as a per-row array — a pure array
    transform (no explode, no window, no shuffle): the 100 TB-friendly
    construction. Guarded for docs shorter than the shingle size
    (F.sequence(1, 0) would generate a DESCENDING sequence).

    ``toks`` MUST be a materialized column reference, not the tokens()
    expression tree: Spark does no common-subexpression elimination
    inside higher-order-function lambdas, so an embedded tokenizer would
    re-split the text once per element_at — measured 20x slower."""
    n = F.size(toks)
    starts = F.sequence(F.lit(1), n - (SHINGLE_SIZE - 1))
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(SHINGLE_SIZE)]
    )
    return F.when(
        n >= SHINGLE_SIZE, F.array_distinct(F.transform(starts, mk))
    ).otherwise(F.array().cast("array<string>"))


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toked = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    return toked.select(
        F.col(id_col), F.explode(shingle_array(F.col("__toks"))).alias("shingle")
    )


def sql_shingle_list() -> str:
    """DuckDB list expression over an ``__toks`` column (see sql_shingles).
    range(1, L-1) = starts [1..L-2] (1-based, inclusive slice indexing)."""
    join_parts = " || ' ' || ".join(
        f"__toks[i + {j}]" for j in range(SHINGLE_SIZE)
    )
    return (
        f"CASE WHEN len(__toks) >= {SHINGLE_SIZE} THEN "
        f"list_distinct(list_transform(range(1, len(__toks) - {SHINGLE_SIZE - 2}), "
        f"i -> {join_parts})) ELSE [] END"
    )


def sql_shingles(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    t = sql_tokens(text_col)
    return f"""
        SELECT {id_col}, UNNEST({sql_shingle_list()}) AS shingle
        FROM (SELECT {id_col}, {t} AS __toks FROM {table})
    """


# --------------------------------------------------------------------- #
# MinHash signatures + LSH candidate pairs
# --------------------------------------------------------------------- #


# Universal-hash family for minhash: h_i(x) = (a_i*x + b_i) mod P over a
# single 32-bit base hash x per shingle. ONE md5 per shingle instead of k
# (k md5s was the 17s hotspot at sf0.1); integer arithmetic is exact and
# identical in both engines. a_i odd < 2^29, b_i < 2^31, so a*x+b < 2^62
# never overflows int64.
MINHASH_P = 2147483647  # 2^31 - 1 (prime)
_MH_A = [(2 * i + 1) * 40503 % (1 << 29) for i in range(1, NUM_HASHES + 1)]
_MH_B = [(i * 1566083941 + 12345) % (1 << 31) for i in range(NUM_HASHES)]


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """k=16 minhashes per doc: h_i = MIN((a_i*x + b_i) mod P) over shingle
    base hashes x = first-8-hex-chars(md5(shingle)). One aggregate over
    the shingle explosion — all 16 mins in a single hash-agg pass with
    map-side partials; one md5 per shingle."""
    sh = shingles(df, text_col, id_col)
    x = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    sh = sh.select(F.col(id_col), x.alias("x"))
    # pre-project the 16 universal hashes so the aggregate's generated
    # code is 16 plain MINs — 4× less cold-start codegen/JIT latency
    # than hash-arithmetic-inside-min, identical values
    proj = sh.select(
        F.col(id_col),
        *[
            ((F.col("x") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(
                f"__hx{i}"
            )
            for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
        ],
    )
    return proj.groupBy(id_col).agg(
        *[F.min(f"__hx{i}").alias(f"h{i}") for i in range(len(_MH_A))]
    )


def sql_minhash_signatures(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    mins = ",\n               ".join(
        f"MIN((x * {a} + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
    )
    return f"""
        SELECT {id_col},
               {mins}
        FROM (
            SELECT {id_col},
                   ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS x
            FROM ({sql_shingles(table, text_col, id_col)})
        )
        GROUP BY {id_col}
    """


def _band_cols() -> list[tuple[int, list[str]]]:
    return [
        (b, [f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)])
        for b in range(NUM_BANDS)
    ]


def _sig_bands(sig: DataFrame, id_col: str) -> DataFrame:
    """(id, band_id, band_hash) rows from a signature frame. Pre-projects
    the band digests as flat columns, then assembles the explode array
    from the already-computed columns (codegen-latency lever: keeps the
    md5/concat out of the array constructor)."""
    digests = sig.select(
        F.col(id_col),
        *[
            F.md5(
                F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
            ).alias(f"__bh{b}")
            for b, cols in _band_cols()
        ],
    )
    return digests.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.col(f"__bh{b}").alias("band_hash"),
                    )
                    for b, _ in _band_cols()
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")


def lsh_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """MinHash-LSH near-duplicate candidates.

    Signature → b band digests → explode to (band_id, band_hash) →
    self-join on the band bucket → distinct (a < b) pairs, with the
    estimated Jaccard = matching minhash positions / k.

    Scale: the only shuffles are the band-bucket exchange and the final
    distinct; no all-pairs comparison ever happens. Output:
    (doc_a, doc_b, est_jaccard).
    """
    sig = minhash_signatures(df, text_col, id_col).cache()
    bands = _sig_bands(sig, id_col)

    left = bands.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_hash"
    )
    right = bands.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_hash"
    )
    pairs = (
        left.join(right, on=["band_id", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sa = sig.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    sb = sig.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / F.lit(float(NUM_HASHES))).alias("est_jaccard"),
        )
    )


def sql_lsh_candidates(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    sep = " || '|' || "
    band_rows = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band_id, "
        f"md5({sep.join(f'CAST({c} AS VARCHAR)' for c in cols)}) AS band_hash FROM sig"
        for b, cols in _band_cols()
    )
    match_sum = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
    )
    return f"""
        WITH sig AS ({sql_minhash_signatures(table, text_col, id_col)}),
        bands AS ({band_rows}),
        pairs AS (
            SELECT DISTINCT l.{id_col} AS doc_a, r.{id_col} AS doc_b
            FROM bands l JOIN bands r
              ON l.band_id = r.band_id AND l.band_hash = r.band_hash
            WHERE l.{id_col} < r.{id_col}
        )
        SELECT p.doc_a, p.doc_b,
               CAST(({match_sum}) AS DOUBLE) / {float(NUM_HASHES)} AS est_jaccard
        FROM pairs p
        JOIN sig sa ON sa.{id_col} = p.doc_a
        JOIN sig sb ON sb.{id_col} = p.doc_b
    """


def incremental_lsh_candidates(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates for INCREMENTAL ingest: only pairs that touch a
    new document — new×corpus plus new×new (a<b) — the corpus is NEVER
    self-joined. Ids must be disjoint across the two frames.

    This is the shape that keeps continuous dedup affordable at 100 TB:
    per ingest batch the join work is |new bands| × bucket occupancy,
    not corpus². This query-form re-derives the corpus signatures
    in-plan every batch — the production path is the signature store
    (:func:`write_signature_store` / :func:`append_signature_batch` /
    :func:`incremental_lsh_candidates_from_store`), which reads the
    corpus side's signatures from parquet instead.
    Output: (doc_a=new id, doc_b, est_jaccard).

    Cache ownership: the new-side signature frame is cached (it feeds
    three plan branches) and stays in the CacheManager until
    ``spark.catalog.clearCache()`` — one small (~136 B/doc) entry per
    call. Loops issuing MANY batches must use the streaming form
    (``streaming.dedup.streaming_incremental_lsh``), which computes the
    signatures once and unpersists per batch."""
    sig_new = minhash_signatures(new_df, text_col, id_col).cache()
    sig_old = minhash_signatures(corpus_df, text_col, id_col)
    return _incremental_candidates_from_sigs(sig_new, sig_old, id_col)


def _incremental_candidates_from_sigs(
    sig_new: DataFrame, sig_old: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pairs touching a new document, given SIGNATURE frames
    for both sides (schema = :func:`minhash_signatures` output): new ×
    corpus plus new × new (a<b); the corpus is never self-joined."""
    bn = _sig_bands(sig_new, id_col)
    bo = _sig_bands(sig_old, id_col)
    a = bn.select(F.col(id_col).alias("doc_a"), "band_id", "band_hash")
    # doc_a != doc_b: ids are CONTRACTUALLY disjoint, but under
    # at-least-once replay (signature append succeeded, checkpoint
    # commit lost) a replayed batch sees its own docs in the store and
    # would emit (X, X, 1.0) self-pairs — new set members that no
    # downstream (doc_a, doc_b) dedupe absorbs. The guard is free.
    nc = (
        a.join(
            bo.select(F.col(id_col).alias("doc_b"), "band_id", "band_hash"),
            on=["band_id", "band_hash"],
        )
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    nn = (
        a.join(
            bn.select(F.col(id_col).alias("doc_b"), "band_id", "band_hash"),
            on=["band_id", "band_hash"],
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    pairs = nc.unionByName(nn).distinct()
    sigs = sig_new.unionByName(sig_old)
    sa = sigs.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    sb = sigs.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / F.lit(float(NUM_HASHES))).alias("est_jaccard"),
        )
    )


# --------------------------------------------------------------------- #
# Signature store: the persisted-corpus path for continuous dedup
# --------------------------------------------------------------------- #


def write_signature_store(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> None:
    """Materialize the corpus minhash signatures as a parquet table —
    the one-time (per corpus) cost that makes per-batch incremental
    dedup read k+1 small columns instead of re-hashing 100 TB of text.

    Signatures are ~136 B/doc (16 longs + id) ≈ 0.1% of typical document
    text — the store for a 100 TB corpus is ~100 GB of parquet. Pass
    ``num_buckets`` to additionally bucket by ``id_col`` (hive-style
    ``bucketBy`` via saveAsTable semantics is avoided — plain parquet
    keeps the store engine-portable)."""
    sig = minhash_signatures(df, text_col, id_col)
    if num_buckets:
        sig = sig.repartition(num_buckets, id_col)
    sig.write.mode("overwrite").parquet(path)


def read_signature_store(spark, path: str, live: bool = True) -> DataFrame:
    """The stored signatures; with ``live`` (default), rows tombstoned
    by :func:`delete_signature_docs` are excluded — a removed document
    must not claim new arrivals as its near-duplicates. ``live=False``
    is the raw view (maintenance/debug)."""
    sig = spark.read.parquet(path)
    if live:
        tomb = signature_tombstones(spark, path)
        if tomb is not None:
            id_col = tomb.columns[0]
            sig = sig.join(F.broadcast(tomb), id_col, "left_anti")
    return sig


def delete_signature_docs(
    spark,
    path: str,
    ids,
    batch_tag: str,
    id_col: str = "doc_id",
) -> None:
    """Tombstone-delete stored signatures by doc id — the takedown path
    for the near-dup store (reference delete(ks),
    IndexedRDD.scala:120-123, on the at-rest signature table).

    This store is an append LEDGER by contract (store_commit module
    docstring: no marker, concurrent batches never conflict), so its
    tombstones are too: each batch is a parquet dir under
    ``_tombstones/<tag>`` — the underscore prefix hides it from the
    store's own parquet scans — written coalesce(1) so the publish is
    a single task commit, and overwrite-mode so a replayed tag is
    exact. Distinct concurrent tags never conflict; readers union
    whatever tombstone batches exist at scan time, the same
    read-merges-the-ledger semantics as the signatures themselves.
    Unknown ids are harmless (tombstones anti-join, never assert)."""
    from spark_indexedrdd_spark.functions import store_commit as _SC

    _SC.validate_batch_tag(batch_tag)
    id_type = spark.read.parquet(path).schema[id_col].dataType
    # shared typed-id normalization (store_commit): empty batches land
    # an empty replay-exact tombstone dir, uncastable ids refuse loudly
    tomb = _SC.normalize_tombstone_ids(spark, ids, id_col, id_type)
    tomb.distinct().coalesce(1).write.mode("overwrite").parquet(
        path + "/_tombstones/" + batch_tag
    )


def signature_tombstones(spark, path: str) -> "DataFrame | None":
    """Union of the store's tombstone batches (distinct ids), or None
    when none exist. Tiny relative to the corpus — callers broadcast
    it into an anti-join."""
    import os

    tdir = os.path.join(path, "_tombstones")
    if not os.path.isdir(tdir):
        return None
    tags = sorted(
        d for d in os.listdir(tdir) if os.path.isdir(os.path.join(tdir, d))
    )
    if not tags:
        return None
    return (
        spark.read.parquet(*[os.path.join(tdir, t) for t in tags]).distinct()
    )


def _tombstone_tags(path: str) -> "list[str]":
    import os

    tdir = os.path.join(path, "_tombstones")
    if not os.path.isdir(tdir):
        return []
    return sorted(
        d for d in os.listdir(tdir) if os.path.isdir(os.path.join(tdir, d))
    )


def compact_signature_store(
    spark,
    path: str,
    num_partitions: int = 8,
) -> None:
    """Rewrite the signature store without its tombstoned rows and drop
    the folded tombstone batches — :func:`compact_store` is WRONG for a
    store with deletes (it would rewrite every row including the dead
    ones, then lose the ``_tombstones`` dir in the swap, resurrecting
    them).

    This store's contract allows CONCURRENT deletes (ledger semantics),
    so the fold is pinned to the tombstone tags present when the
    rewrite starts, and any tombstone batch committed DURING the
    rewrite is carried forward into the compacted store's ledger
    instead of being dropped with the swap — readers keep anti-joining
    it, so a takedown racing the compaction is preserved, not undone.
    (Carrying a tag whose rows were also folded would be a harmless
    no-op anti-join; only genuinely-new tags are carried.) A tombstone
    committed in the instant between the carry-forward listing and the
    rename can still be lost — quiesce deletes around the swap or
    re-issue them; the swap itself is two renames, and a crash between
    them leaves the full store recoverable at ``<path>__old_*``."""
    import os
    import shutil
    import uuid

    t0 = _tombstone_tags(path)
    sig = spark.read.parquet(path)
    if t0:
        tomb0 = (
            spark.read.parquet(
                *[os.path.join(path, "_tombstones", t) for t in t0]
            ).distinct()
        )
        sig = sig.join(F.broadcast(tomb0), tomb0.columns[0], "left_anti")
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    sig.repartition(num_partitions).write.mode("overwrite").parquet(tmp)
    # carry forward tombstone batches committed during the rewrite
    for tag in _tombstone_tags(path):
        if tag not in t0:
            shutil.copytree(
                os.path.join(path, "_tombstones", tag),
                os.path.join(tmp, "_tombstones", tag),
            )
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def incremental_lsh_candidates_from_store(
    new_df: DataFrame,
    sig_store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-batch incremental LSH candidates with the corpus side read
    from :func:`write_signature_store` output. Identical result to
    :func:`incremental_lsh_candidates` (pytest-pinned equivalence), but
    the per-batch cost is hash(new batch) + a columnar scan of the
    signature table — the corpus text is never touched. Ids must be
    disjoint (new vs stored).

    Materialization ownership: the new-side signature frame feeds three
    plan branches, so it is materialized ONCE via an eager
    ``localCheckpoint`` — unlike ``.cache()`` this leaves no
    CacheManager entry behind for a one-shot caller to leak (r10
    VERDICT: the takedown contract query used to clear the ENTIRE
    catalog cache to release it, evicting sibling queries' caches in a
    shared session). The checkpointed blocks are batch-sized and are
    released with the DataFrame by the ContextCleaner; the lineage
    truncation is the usual localCheckpoint trade — the blocks live
    unreplicated on executors, so losing one makes them UNRECOVERABLE
    and a downstream action FAILS (Spark does not recompute truncated
    lineage); the caller re-runs the batch-sized call. Avoid under
    aggressive dynamic allocation. Per-micro-batch loops still use the
    streaming form, which persists and unpersists each batch
    explicitly."""
    sig_new = minhash_signatures(new_df, text_col, id_col).transform(truncate_lineage)
    sig_old = read_signature_store(new_df.sparkSession, sig_store_path)
    return _incremental_candidates_from_sigs(sig_new, sig_old, id_col)


def append_signature_batch(
    new_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fold an ACCEPTED ingest batch into the signature store (append —
    parquet is immutable-file, so this adds files rather than rewriting
    the corpus). Call after the batch's near-dups were resolved; the
    next batch's candidates then see this batch as corpus.

    Delete-wins until compaction: a re-ingested id that is currently
    tombstoned stays excluded by every live read's anti-join (its new
    signature rows are shadowed, and compaction physically drops them
    with the tombstone). To genuinely re-add a deleted id, compact
    first, then append."""
    minhash_signatures(new_df, text_col, id_col).write.mode("append").parquet(path)


def compact_store(
    spark,
    path: str,
    num_partitions: int = 8,
    partition_cols: "list[str] | None" = None,
) -> None:
    """Compact an append-grown parquet store (signature store, IVF
    store's ``vectors``): every micro-batch append adds at least one
    file, and a year of small batches turns the store scan into a
    file-listing problem long before a data-size problem. Reads the
    store, coalesces to ``num_partitions`` per partition directory, and
    atomically swaps via write-to-temp + rename.

    At 100 TB run this as periodic maintenance (e.g. when file count
    exceeds ~10× the partition target); on object stores replace the
    rename with the committer's atomic publish. Readers racing the swap
    see the old store until the rename (POSIX) — acceptable for the
    dedup stores whose readers re-list per micro-batch."""
    import os
    import shutil
    import uuid

    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df = spark.read.parquet(path)
    writer = df.repartition(num_partitions).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def sql_incremental_lsh_candidates(
    new_pred: str = "doc_id % 20 = 0",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    exclude_pred: "str | None" = None,
) -> str:
    """Oracle twin where new/corpus is a predicate split of ``table``
    (``new_pred`` must reference only ``id_col``). ``exclude_pred``
    models corpus-side tombstones (delete_signature_docs): matching
    docs vanish from the table entirely — keep it disjoint from
    ``new_pred`` (a tombstoned doc cannot also be a new arrival)."""
    if exclude_pred:
        table = f"(SELECT * FROM {table} WHERE NOT ({exclude_pred}))"
    sep = " || '|' || "
    band_rows = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band_id, "
        f"md5({sep.join(f'CAST({c} AS VARCHAR)' for c in cols)}) AS band_hash FROM sig"
        for b, cols in _band_cols()
    )
    match_sum = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
    )
    return f"""
        WITH sig AS ({sql_minhash_signatures(table, text_col, id_col)}),
        bands AS ({band_rows}),
        nb AS (SELECT * FROM bands WHERE {new_pred}),
        ob AS (SELECT * FROM bands WHERE NOT ({new_pred})),
        pairs AS (
            SELECT DISTINCT doc_a, doc_b FROM (
                SELECT n.{id_col} AS doc_a, o.{id_col} AS doc_b
                FROM nb n JOIN ob o
                  ON n.band_id = o.band_id AND n.band_hash = o.band_hash
                UNION ALL
                SELECT n1.{id_col}, n2.{id_col}
                FROM nb n1 JOIN nb n2
                  ON n1.band_id = n2.band_id AND n1.band_hash = n2.band_hash
                 AND n1.{id_col} < n2.{id_col}
            )
        )
        SELECT p.doc_a, p.doc_b,
               CAST(({match_sum}) AS DOUBLE) / {float(NUM_HASHES)} AS est_jaccard
        FROM pairs p
        JOIN sig sa ON sa.{id_col} = p.doc_a
        JOIN sig sb ON sb.{id_col} = p.doc_b
    """


# --------------------------------------------------------------------- #
# SimHash (64-bit, as two 32-bit halves)
# --------------------------------------------------------------------- #


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document SimHash: token md5 → two 32-bit halves → per-bit
    weighted sign sum over tokens (with multiplicity) → 64 bits packed
    as (simhash_hi, simhash_lo) BIGINTs. Hamming-close docs are near-dups.

    Single explode + hash-agg: at scale one shuffle on doc_id (or none if
    the doc table is already partitioned by doc_id)."""
    toks = tokens(F.col(text_col))
    ex = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    digest = F.md5(F.col("tok"))
    hi = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    ex = ex.select(id_col, hi.alias("h_hi"), lo.alias("h_lo"))

    # Packed bit-count aggregation: 3 bit-counters per 20-bit field in
    # one 64-bit accumulator → 22 SUMs + 1 COUNT instead of 64 SUMs.
    # Equivalent sign rule: old sum(±1) > 0 ⟺ 2·cnt(bit) > n_tokens.
    # Measured trade (sf0.1, local[32]): cold 4.8s→2.2s (smaller
    # generated aggregate), warm 1.6s→1.9s (+20% per-row packing
    # arithmetic), partial-agg shuffle payload 64→23 longs per doc
    # (512→184 B — the 100 TB lever: map-side combine fully collapses
    # per doc, so shuffle bytes scale with doc count × buffer width).
    # 20-bit fields keep each bit-counter exact for up to 2^20-1 (~1M)
    # tokens per document; the guard below turns the overflow case into a
    # loud error (never a silently corrupted fingerprint).
    FIELD, PER = 20, 3
    n_packs = (64 + PER - 1) // PER  # 22
    bits = [("hi", i) for i in range(32)] + [("lo", i) for i in range(32)]
    packs = []
    for g in range(n_packs):
        expr = F.lit(0).cast("long")
        for j, (half, i) in enumerate(bits[g * PER : g * PER + PER]):
            b = F.shiftright(F.col(f"h_{half}"), i).bitwiseAND(F.lit(1))
            expr = expr + b.cast("long") * F.lit(1 << (FIELD * j)).cast("long")
        packs.append(expr.alias(f"__p{g}"))
    sig = ex.select(F.col(id_col), *packs)
    agg = sig.groupBy(id_col).agg(
        *[F.sum(f"__p{g}").alias(f"s{g}") for g in range(n_packs)],
        F.count("*").alias("__n"),
    )
    # Token-count guard: a per-bit counter is bounded by __n, so
    # __n <= 2^FIELD - 1 guarantees no field ever carries into its
    # neighbor. Beyond that the packed representation CANNOT be exact,
    # so fail loudly (CASE branches evaluate lazily — the error fires
    # only for an oversized doc, and costs one comparison per document,
    # not per token). Pre-chunk or pre-truncate pathological docs
    # upstream if they are expected.
    cap = (1 << FIELD) - 1
    agg = agg.withColumn(
        "__n",
        F.when(
            F.col("__n") > F.lit(cap),
            F.raise_error(
                F.concat(
                    F.lit("simhash: document "),
                    # coalesce: a NULL id must not null out the whole
                    # diagnostic message
                    F.coalesce(F.col(id_col).cast("string"), F.lit("<null>")),
                    F.lit(
                        f" has more than {cap} tokens; the packed bit-count"
                        " aggregation would overflow its 20-bit fields —"
                        " pre-chunk oversized documents before simhash()"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.col("__n")),
    )

    def bit_set(b: int):
        cnt = F.shiftright(
            F.col(f"s{b // PER}"), FIELD * (b % PER)
        ).bitwiseAND(F.lit((1 << FIELD) - 1))
        return cnt * 2 > F.col("__n")

    def pack_half(offset: int):
        out = F.lit(0).cast("long")
        for i in range(32):
            out = out + F.when(
                bit_set(offset + i), F.lit(2**i).cast("long")
            ).otherwise(0)
        return out

    return agg.select(
        F.col(id_col),
        pack_half(0).alias("simhash_hi"),
        pack_half(32).alias("simhash_lo"),
    )


def sql_simhash(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    t = sql_tokens(text_col)
    sums = ",\n           ".join(
        [
            f"SUM(((h_hi >> {i}) & 1) * 2 - 1) AS s_hi_{i}" for i in range(32)
        ]
        + [f"SUM(((h_lo >> {i}) & 1) * 2 - 1) AS s_lo_{i}" for i in range(32)]
    )
    pack_hi = " + ".join(
        f"CASE WHEN s_hi_{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END" for i in range(32)
    )
    pack_lo = " + ".join(
        f"CASE WHEN s_lo_{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END" for i in range(32)
    )
    return f"""
        WITH ex AS (
            SELECT {id_col},
                   ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h_hi,
                   ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h_lo
            FROM (SELECT {id_col}, UNNEST({t}) AS tok FROM {table})
        ), agg AS (
            SELECT {id_col},
           {sums}
            FROM ex GROUP BY {id_col}
        )
        SELECT {id_col},
               CAST({pack_hi} AS BIGINT) AS simhash_hi,
               CAST({pack_lo} AS BIGINT) AS simhash_lo
        FROM agg
    """


def _chunk_ranges(k: int) -> list[tuple[str, int, int]]:
    """Split the 64 fingerprint bits into ``k`` disjoint contiguous
    chunks that never cross the hi/lo half boundary: (half, start, width).
    DISJOINTNESS is what the pigeonhole claim needs (≤ d differing bits
    dirty ≤ d of d+1 disjoint chunks, so one stays clean); full coverage
    is not required — for k=1 only the hi half is used, which merely
    coarsens buckets, never loses a pair. Single shift+mask per chunk."""
    if not 1 <= k <= 64:
        raise ValueError(f"need 1..64 chunks, got {k}")
    k_hi = min((k + 1) // 2, 32)
    k_lo = k - k_hi
    out: list[tuple[str, int, int]] = []
    for half, kn in (("hi", k_hi), ("lo", k_lo)):
        if kn == 0:
            continue
        base, rem = divmod(32, kn)
        start = 0
        for i in range(kn):
            width = base + (1 if i < rem else 0)
            out.append((half, start, width))
            start += width
    return out


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming — EXACT
    (set-identical to the all-pairs result, verified by the all-pairs SQL
    oracle :func:`sql_simhash_near_pairs`).

    Blocking: two fingerprints within hamming d of each other agree
    exactly on at least one of (d+1) disjoint chunks (pigeonhole), so
    blocking on (d+1) chunk buckets loses nothing. Self-join per chunk
    bucket, then exact popcount filter. No all-pairs pass; same shape as
    the LSH band join, so it scales the same way. Larger d ⇒ narrower
    chunks ⇒ bigger buckets — inherent to simhash blocking, not a plan
    defect."""
    sh = simhash(df, text_col, id_col).cache()
    chunks = [
        (
            cid,
            F.shiftright(f"simhash_{half}", start).bitwiseAND(
                F.lit((1 << width) - 1)
            ),
        )
        for cid, (half, start, width) in enumerate(_chunk_ranges(max_hamming + 1))
    ]
    blocked = sh.select(
        F.col(id_col),
        "simhash_hi",
        "simhash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(cid).alias("chunk_id"), c.alias("chunk_val"))
                    for cid, c in chunks
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash_hi", "simhash_lo", "c.chunk_id", "c.chunk_val")

    a = blocked.select(
        F.col(id_col).alias("doc_a"),
        F.col("simhash_hi").alias("hi_a"),
        F.col("simhash_lo").alias("lo_a"),
        "chunk_id",
        "chunk_val",
    )
    b = blocked.select(
        F.col(id_col).alias("doc_b"),
        F.col("simhash_hi").alias("hi_b"),
        F.col("simhash_lo").alias("lo_b"),
        "chunk_id",
        "chunk_val",
    )
    cand = (
        a.join(b, on=["chunk_id", "chunk_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    )
    return cand.select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def sql_simhash_near_pairs(
    table: str = "documents",
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Exact oracle for :func:`simhash_near_pairs`. The pigeonhole
    blocking is LOSSLESS for ``max_hamming`` ≤ 3 (two fingerprints within
    hamming 3 must agree exactly on one of the 4 disjoint 16-bit chunks),
    so the blocked Spark result is set-identical to the all-pairs result
    — which is what the oracle computes directly: a self-join on
    ``id < id`` with an xor-popcount filter. All-pairs is fine at oracle
    scale (sf0.01 ≈ 500 docs); the Spark side never does it."""
    ham = (
        f"bit_count(xor(a.simhash_hi, b.simhash_hi)) "
        f"+ bit_count(xor(a.simhash_lo, b.simhash_lo))"
    )
    return f"""
        WITH sh AS ({sql_simhash(table, text_col, id_col)})
        SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
               CAST({ham} AS INTEGER) AS hamming
        FROM sh a JOIN sh b ON a.{id_col} < b.{id_col}
        WHERE {ham} <= {int(max_hamming)}
    """


# --------------------------------------------------------------------- #
# Duplicate-cluster resolution (connected components over candidate pairs)
# --------------------------------------------------------------------- #


def resolve_duplicate_clusters(
    pairs: DataFrame,
    max_iterations: int = 10,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    driver_max_edges: "int | None" = None,
) -> DataFrame:
    """Turn near-duplicate candidate PAIRS into duplicate CLUSTERS:
    connected components by iterative min-label propagation, the step
    that decides which documents to actually drop.

    Output: (doc_id, cluster_id) where cluster_id = min doc_id in the
    component; keep one representative per cluster (e.g. cluster_id).

    Scale: each iteration is one join + one aggregate on the edge list —
    the standard large-graph CC pattern (HashToMin). Converges in
    O(log(diameter)) iterations; near-dup components are tiny (pairs of
    chains), so ``max_iterations=10`` is generous. Verified against a
    Python union-find in tests AND against the recursive-CTE oracle
    :func:`sql_duplicate_clusters` (transitive closure + MIN-reachable
    label — same fixpoint, different evaluation strategy).

    Small edge lists resolve on the DRIVER: the distributed loop costs
    4+ sequential blocking jobs (labels init, per-iteration checkpoint +
    fixpoint probe) that are pure scheduling overhead when the edge
    list — already reduced to candidate PAIRS, never corpus rows — is
    tiny. Below ``driver_max_edges`` directed edges (default env
    ``SPARK_GRAFT_CC_DRIVER_MAX_EDGES`` = 500000 ≈ 8 MB of ids;
    union-find is O(E α(E)) ≈ ms there) the checkpointed edges are
    collected and resolved by union-find — min-label connected
    components are engine-independent, so the result is bit-identical
    (pytest-pinned against the distributed loop on the same pairs; the
    same driver-side-small-state pattern as the kmeans/codebook fits in
    ivf.py/pq.py). A 100 TB candidate graph past the cap takes the
    distributed loop unchanged; pass ``driver_max_edges=0`` to force it.
    """
    import os as _os

    if driver_max_edges is None:
        driver_max_edges = int(
            _os.environ.get("SPARK_GRAFT_CC_DRIVER_MAX_EDGES", "500000")
        )
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionByName(pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .distinct()
        .transform(truncate_lineage)
    )
    # count() over the eager checkpoint prices the already-materialized
    # blocks, not the LSH lineage
    if driver_max_edges and edges.count() <= driver_max_edges:
        rows = edges.collect()
        # NULL endpoints would follow the joins' null-drop semantics in
        # the distributed loop — keep that path authoritative for them
        if not any(r[0] is None or r[1] is None for r in rows):
            parent: dict = {}

            def _find(x):
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]  # path halving
                    x = parent[x]
                return x

            for a, b in rows:
                ra, rb = _find(a), _find(b)
                if ra != rb:
                    # attach max under min: every root stays the MIN of
                    # its component, so find() IS the min-label fixpoint
                    parent[max(ra, rb)] = min(ra, rb)
            dtype = edges.schema[0].dataType.simpleString()
            return local_rows_df(
                pairs.sparkSession,
                sorted((n, _find(n)) for n in parent),
                f"doc_id {dtype}, cluster_id {dtype}",
            )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .transform(truncate_lineage)
    )
    for _ in range(max_iterations):
        # step 1: pull the minimum label from neighbors
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # step 2: pointer jumping — adopt the label OF my label, turning
        # O(diameter) propagation into O(log n) (path halving)
        lab2 = stepped.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        jumped = (
            stepped.join(lab2, stepped.label == lab2.l_node, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("l_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # localCheckpoint: truncate lineage so iteration depth can't
        # overflow the planner (32 chained joins did)
        new_labels = jumped.transform(truncate_lineage)
        # fixpoint: no edge still connects two different labels
        changed = (
            new_labels.alias("l")
            .join(edges.alias("e"), F.col("l.node") == F.col("e.a"))
            .join(new_labels.alias("r"), F.col("e.b") == F.col("r.node"))
            .where(F.col("l.label") > F.col("r.label"))
            .take(1)
        )
        labels = new_labels
        if not changed:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def sql_duplicate_clusters(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """Exact oracle for :func:`resolve_duplicate_clusters` over
    :func:`lsh_candidates` pairs: a recursive CTE computes the transitive
    closure of the (undirected) candidate-pair graph, then each node's
    cluster_id is its MIN reachable node — the same fixpoint the Spark
    side's pointer-jumping label propagation converges to. All-pairs
    reachability is fine at oracle scale; the Spark side never
    materializes it."""
    return f"""
        WITH RECURSIVE cand AS ({sql_lsh_candidates(table, text_col, id_col)}),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM cand
            UNION
            SELECT doc_b, doc_a FROM cand
        ),
        reach(node, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
        )
        SELECT node AS {id_col}, MIN(r) AS cluster_id
        FROM reach GROUP BY node
    """


# --------------------------------------------------------------------- #
# End-to-end corpus dedup: exact groups first, then near-dup clusters
# over the representatives
# --------------------------------------------------------------------- #


def dedup_pipeline(
    df: DataFrame,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed flow a real corpus dedup runs, as one operator:
    (doc_id, status, canonical_id) with status ∈ {'kept', 'exact_dup',
    'near_dup'} and ``canonical_id`` the document that survives in the
    output corpus.

    1. EXACT pass: group by normalized-text digest; the min id per
       group represents it. Running this FIRST is the 100 TB skew
       defense for stage 2 — a million-copy boilerplate template is one
       representative, not a million LSH band rows that would meet in
       one bucket and explode into 10^12 candidate pairs.
    2. NEAR pass over representatives only: LSH candidates filtered to
       ``est_jaccard >= jaccard_threshold``, resolved to connected
       components; the min rep per component is canonical.
    3. Verdict join: an exact dup inherits its representative's cluster
       (canonical chains collapse — never a dangling canonical_id).

    Every step is min-based and deterministic; the oracle
    (:func:`sql_dedup_pipeline`) recomputes the same fixpoint with a
    recursive CTE."""
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    # materialize the fingerprint once: it feeds BOTH the group table
    # and the doc->rep map, and without the checkpoint each branch
    # re-tokenizes the full corpus — tokenization is stage 1's dominant
    # cost at scale, and the pipeline already runs internal actions
    # (the CC loop), so the eager cut adds no new materialization
    # regime. State is (id, md5) — ~50 B/doc.
    fp = df.select(F.col(id_col), F.md5(norm).alias("fp_md5")).transform(truncate_lineage)
    g = fp.groupBy("fp_md5").agg(F.min(id_col).alias("rep"))
    m = fp.join(g, "fp_md5").select(id_col, "rep")
    reps = df.join(
        g.select(F.col("rep").alias(id_col)), id_col
    )
    pairs = lsh_candidates(reps, text_col, id_col).where(
        F.col("est_jaccard") >= jaccard_threshold
    )
    cc = resolve_duplicate_clusters(pairs).select(
        F.col("doc_id").alias("__cc_rep"), "cluster_id"
    )
    out = m.join(cc, m.rep == F.col("__cc_rep"), "left")
    return out.select(
        F.col(id_col),
        F.when(F.col(id_col) != F.col("rep"), F.lit("exact_dup"))
        .when(
            F.col("cluster_id").isNotNull()
            & (F.col("cluster_id") != F.col("rep")),
            F.lit("near_dup"),
        )
        .otherwise(F.lit("kept"))
        .alias("status"),
        F.coalesce(F.col("cluster_id"), F.col("rep")).alias("canonical_id"),
    )


def sql_dedup_pipeline(
    jaccard_threshold: float = 0.5,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle twin of :func:`dedup_pipeline`: same exact-group digest,
    same LSH candidates over the representative subquery, transitive
    closure + MIN-reachable label for the clusters."""
    t = sql_tokens(text_col)
    reps_subquery = (
        f"(SELECT d.* FROM {table} d JOIN g ON d.{id_col} = g.rep)"
    )
    return f"""
        WITH RECURSIVE fp AS (
            SELECT {id_col}, md5(array_to_string({t}, ' ')) AS fp_md5
            FROM {table}
        ),
        g AS (SELECT fp_md5, MIN({id_col}) AS rep FROM fp GROUP BY fp_md5),
        m AS (SELECT fp.{id_col}, g.rep FROM fp JOIN g USING (fp_md5)),
        cand AS ({sql_lsh_candidates(reps_subquery, text_col, id_col)}),
        strong AS (
            SELECT doc_a, doc_b FROM cand
            WHERE est_jaccard >= {float(jaccard_threshold)}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM strong
            UNION
            SELECT doc_b, doc_a FROM strong
        ),
        reach(node, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
        ),
        cc AS (SELECT node AS rep, MIN(r) AS cluster_id FROM reach GROUP BY node)
        SELECT m.{id_col},
               CASE WHEN m.{id_col} <> m.rep THEN 'exact_dup'
                    WHEN cc.cluster_id IS NOT NULL AND cc.cluster_id <> m.rep
                        THEN 'near_dup'
                    ELSE 'kept' END AS status,
               COALESCE(cc.cluster_id, m.rep) AS canonical_id
        FROM m LEFT JOIN cc ON m.rep = cc.rep
    """


# --------------------------------------------------------------------- #
# Exact n-gram Jaccard within a blocking key
# --------------------------------------------------------------------- #


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    stop_shingle_df: int = STOP_SHINGLE_DF,
) -> DataFrame:
    """Exact Jaccard similarity of shingle sets for every candidate pair
    sharing ``block_col`` (blocked — never all-pairs). Output:
    (doc_a, doc_b, inter, size_a, size_b, jaccard).

    Scale: the heavy join is on the shingle value *within* a block, so
    the shuffle key is (shingle) and hot shingles are the skew risk.
    Guard: shingles whose document frequency exceeds ``stop_shingle_df``
    (boilerplate — license headers, nav chrome) are dropped from the
    shingle SETS before the join, bounding any one join key's row count
    to ``stop_shingle_df`` per side (≤ cap² pair expansions). Sizes and
    Jaccard are computed over the capped sets on both engines, so the
    semantics stay exact and cross-engine identical. A shingle shared by
    more than ``stop_shingle_df`` documents carries ~zero similarity
    signal but would otherwise dominate the shuffle."""
    sh = shingles(df, text_col, id_col)
    # stop-shingle skew guard: document frequency = row count, because
    # shingles() emits distinct shingles per doc. The freq join shuffles
    # on `shingle` — the same key as the pair join below.
    freq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    sh = sh.join(
        freq.where(F.col("__df") <= F.lit(int(stop_shingle_df))).select("shingle"),
        "shingle",
    )
    blocks = df.select(F.col(id_col), F.col(block_col).alias("_blk"))
    sh = sh.join(blocks, id_col)

    sizes = sh.groupBy(id_col).agg(F.count("*").cast("long").alias("sz"))

    a = sh.select(F.col(id_col).alias("doc_a"), F.col("_blk"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("_blk"), "shingle")
    inter = (
        a.join(b, on=["_blk", "shingle"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "size_a",
            "size_b",
            (
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def sql_ngram_jaccard_pairs(
    table: str = "documents",
    block_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    stop_shingle_df: int = STOP_SHINGLE_DF,
) -> str:
    return f"""
        WITH sh0 AS ({sql_shingles(table, text_col, id_col)}),
        freq AS (
            SELECT shingle, COUNT(*) AS df FROM sh0 GROUP BY shingle
        ),
        sh AS (
            SELECT s.{id_col}, s.shingle, d.{block_col} AS blk
            FROM sh0 s
            JOIN freq f USING (shingle)
            JOIN {table} d USING ({id_col})
            WHERE f.df <= {int(stop_shingle_df)}
        ),
        sizes AS (SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY {id_col}),
        inter AS (
            SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS inter
            FROM sh a JOIN sh b ON a.blk = b.blk AND a.shingle = b.shingle
            WHERE a.{id_col} < b.{id_col}
            GROUP BY a.{id_col}, b.{id_col}
        )
        SELECT i.doc_a, i.doc_b, i.inter,
               sa.sz AS size_a, sb.sz AS size_b,
               CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.{id_col} = i.doc_a
        JOIN sizes sb ON sb.{id_col} = i.doc_b
    """


def windowed_event_dedup(events: DataFrame, window_minutes: int = 60) -> DataFrame:
    """Batch windowed dedup: within each (user, event_type, time bucket),
    keep only the earliest event — the feed-processing rule "one event of
    a kind per user per hour". Integer-microsecond bucket arithmetic so
    the bucket edges are bit-identical cross-engine; deterministic
    event_id tiebreak. One shuffle on the dedup key; row_number stops at
    1 per group (no full sort materialization beyond each group).

    The streaming twin with watermark-bounded state is
    `streaming.dedup.streaming_dedup` (keys=(user_id, event_type,
    bucket))."""
    from pyspark.sql import Window

    us = window_minutes * 60 * 1_000_000
    bucket = (F.col("ts_us") - (F.col("ts_us") % F.lit(us))).alias("bucket_us")
    w = Window.partitionBy("user_id", "event_type", "bucket_us").orderBy(
        "ts_us", "event_id"
    )
    return (
        events.select("event_id", "user_id", "event_type", "value", "ts_us", bucket)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "bucket_us", "ts_us", "value")
    )


def sql_windowed_event_dedup(window_minutes: int = 60) -> str:
    us = window_minutes * 60 * 1_000_000
    return f"""
        SELECT event_id, user_id, event_type, bucket_us, ts_us, value FROM (
            SELECT event_id, user_id, event_type, value,
                   epoch_us(ts) AS ts_us,
                   epoch_us(ts) - (epoch_us(ts) % {us}) AS bucket_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type,
                                    epoch_us(ts) - (epoch_us(ts) % {us})
                       ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """
