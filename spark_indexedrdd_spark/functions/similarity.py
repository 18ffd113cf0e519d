"""Similarity search over embedding columns (array<float>).

Three tiers:

- ``cosine_topk`` — brute-force top-k, pure DataFrame ops (broadcast the
  query set, score every candidate, window top-k). Oracle-checkable:
  the dot product folds in array order in both engines (vectors.py).
- ``cosine_topk_fast`` — the throughput path: Arrow-batched numpy matmul
  per partition (mapInPandas) with per-batch top-k, then a tiny global
  re-rank. At 100 TB this is a single scan of the candidate side with
  only q x k x partitions rows shuffled at the end.
- ``hyperplane_lsh_ann`` — the scale path for huge query sets: random
  hyperplane signatures bucket both sides; only bucket-colliding pairs
  are scored. Approximate (recall checked in tests, not oracle-exact).

Near-duplicate detection over embeddings (``near_duplicates``) reuses the
brute-force scorer within a blocking column.

The reference has no similarity surface (SURVEY.md §2.5) — extension ops.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions.vectors import cosine, sql_cosine

DEFAULT_QUERY_IDS = [0, 50, 100, 150, 200, 250, 300, 350, 400, 450]

# Candidate-count ceiling before cosine_topk warns: its final window
# shuffles q × N scored rows into |q| partitions — one task per query
# id, skewed BY CONSTRUCTION at large N. The fast/ANN tiers don't.
BRUTE_FORCE_CAND_WARN = 2_000_000


def cosine_topk(
    emb: DataFrame,
    query_ids: Iterable[int] = tuple(DEFAULT_QUERY_IDS),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (q_id, cand_id, cosine_sim, rank).

    This is the small-corpus ORACLE TWIN, not the scale path: the only
    shuffle is the window partitioned by q_id over q × N scored rows —
    |q| partitions, one task per query, skewed by construction at large
    N. Above ``BRUTE_FORCE_CAND_WARN`` candidates it warns (checked with
    a short-circuiting bounded probe, never a full count) and steers to
    :func:`cosine_topk_fast` (per-batch top-k, candidates never
    shuffled) or the LSH/IVF ANN tiers. It stays a warning rather than
    an auto-switch because the fast path ranks on ROUNDed scores — a
    documented, slightly different contract.

    Plan shape otherwise: the query set is a broadcast inner join (no
    shuffle of the candidate side) and scoring is a narrow map. Ties
    break on cand_id so results are deterministic."""
    import warnings

    from spark_indexedrdd_spark.functions.vectors import dot, norm

    n_bounded = emb.select(id_col).limit(BRUTE_FORCE_CAND_WARN + 1).count()
    if n_bounded > BRUTE_FORCE_CAND_WARN:
        warnings.warn(
            f"cosine_topk is scoring >{BRUTE_FORCE_CAND_WARN:,} candidates "
            "through a per-query-id window (skewed by construction); use "
            "cosine_topk_fast or the hyperplane_lsh_ann / ivf_ann tiers "
            "at this scale",
            stacklevel=2,
        )

    # norms computed ONCE per vector before the join (cosine() inline
    # would recompute both norms for every (q, cand) pair — a 3x saving
    # at N x q pairs). Same arithmetic, so still oracle-exact.
    q = F.broadcast(
        emb.where(F.col(id_col).isin(list(query_ids))).select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_norm"),
        )
    )
    cand = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = q.crossJoin(cand).where(F.col("q_id") != F.col("cand_id")).select(
        "q_id",
        "cand_id",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "cand_id", "cosine_sim", F.col("rank").cast("int"))
    )


def sql_cosine_topk(
    table: str = "embeddings",
    query_ids: Iterable[int] = tuple(DEFAULT_QUERY_IDS),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> str:
    """``round_digits=None`` ranks and emits the raw fold-exact double
    (the oracle for :func:`cosine_topk`). With ``round_digits=d`` the
    score is ROUNDed to d decimals BEFORE ranking (cand_id tie-break) —
    the oracle for :func:`cosine_topk_fast`, whose BLAS accumulation
    differs from the sequential fold by ~1 ulp: rounding collapses that
    difference, and ranking on the rounded value keeps rank assignment
    identical on both engines."""
    from spark_indexedrdd_spark.functions.vectors import sql_dot, sql_norm

    ids = ", ".join(str(i) for i in query_ids)
    raw = f"{sql_dot(f'q.{vec_col}', f'c.{vec_col}')} / (q.nrm * c.nrm)"
    score = raw if round_digits is None else f"ROUND({raw}, {int(round_digits)})"
    return f"""
        WITH n AS (
            SELECT {id_col}, {vec_col}, {sql_norm(vec_col)} AS nrm FROM {table}
        ),
        q AS (SELECT * FROM n WHERE {id_col} IN ({ids})),
        scored AS (
            SELECT q.{id_col} AS q_id, c.{id_col} AS cand_id,
                   {score} AS cosine_sim
            FROM q, n c
            WHERE q.{id_col} <> c.{id_col}
        ),
        ranked AS (
            SELECT q_id, cand_id, cosine_sim,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine_sim DESC, cand_id) AS INTEGER) AS rank
            FROM scored
        )
        SELECT q_id, cand_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
    """


def near_duplicates(
    emb: DataFrame,
    threshold: float = 0.9,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking column
    (never all-pairs): (vec_a, vec_b, cosine_sim) with sim >= threshold.
    At scale the block column is a cluster/LSH bucket id; here the
    testdata's label plays that role."""
    from spark_indexedrdd_spark.functions.vectors import dot, norm

    normed = emb.select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),  # once per vector, not per pair
    )
    a = normed.select(
        F.col(id_col).alias("vec_a"), "_blk",
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = normed.select(
        F.col(id_col).alias("vec_b"), "_blk",
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, "_blk")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine_sim"
            ),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def sql_near_duplicates(
    table: str = "embeddings",
    threshold: float = 0.9,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    from spark_indexedrdd_spark.functions.vectors import sql_dot, sql_norm

    cos = f"{sql_dot(f'a.{vec_col}', f'b.{vec_col}')} / (a.nrm * b.nrm)"
    return f"""
        WITH n AS (
            SELECT {id_col}, {block_col}, {vec_col}, {sql_norm(vec_col)} AS nrm
            FROM {table}
        )
        SELECT a.{id_col} AS vec_a, b.{id_col} AS vec_b, {cos} AS cosine_sim
        FROM n a JOIN n b
          ON a.{block_col} = b.{block_col} AND a.{id_col} < b.{id_col}
        WHERE {cos} >= {threshold}
    """


# --------------------------------------------------------------------- #
# Throughput path: Arrow-batched numpy matmul (mapInPandas)
# --------------------------------------------------------------------- #


MAX_FAST_QUERIES = 10_000


def cosine_topk_fast(
    emb: DataFrame,
    query_ids: Iterable[int] = tuple(DEFAULT_QUERY_IDS),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
) -> DataFrame:
    """Same result as :func:`cosine_topk` (modulo float ulps from BLAS
    accumulation), computed as a vectorized matmul per Arrow batch with
    per-batch top-k, then a global re-rank of the tiny union.

    Oracle contract: BLAS sums in a different order than the sequential
    fold, so raw scores differ from SQL by ~1 ulp. The emitted
    ``cosine_sim`` is therefore ROUNDed to ``round_digits`` decimals and
    the final rank is computed ON the rounded value (cand_id tie-break),
    which makes the result hash-comparable to
    ``sql_cosine_topk(round_digits=...)``. Per-batch candidate selection
    uses the same (rounded desc, cand_id asc) ordering as the final
    rank — a global top-k candidate is therefore always inside its
    batch's top-(k+1) under that ordering, even when more than k+1
    batch candidates tie at rounded precision (duplicate-heavy
    corpora), where raw-score selection could drop the tie-break
    winner.

    Scale: candidate side is scanned once, never shuffled; the query
    matrix is shipped to executors ONCE per node via ``sc.broadcast``
    (torrent protocol), not serialized into every task closure. The
    query count is capped at ``MAX_FAST_QUERIES`` (the q×dim matrix must
    fit beside each Arrow batch in executor memory; 10k × 512 float64 ≈
    40 MB) — beyond the cap, use the LSH/IVF ANN tiers, which never
    materialize a dense query matrix. The final window sees only
    q × k × n_batches rows.

    Broadcast lifetime: the query-matrix broadcast is pinned to the
    returned DataFrame (``._sgraft_broadcast``), so it stays fetchable
    for as long as the plan is alive and becomes eligible for Spark's
    ContextCleaner as soon as the caller drops the DataFrame — repeated
    calls in a long session don't accumulate broadcasts."""
    import numpy as np

    query_ids = list(query_ids)
    if len(query_ids) > MAX_FAST_QUERIES:
        raise ValueError(
            f"cosine_topk_fast got {len(query_ids)} query ids; the dense "
            f"broadcast path is capped at {MAX_FAST_QUERIES} — use "
            "hyperplane_lsh_ann / ivf_ann for large query sets"
        )
    q_rows = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    bc = emb.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def score_batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        q_ids, q_mat, q_norm = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            sims = (q_mat @ c_mat.T) / (q_norm[:, None] * c_norm[None, :])
            out = []
            kk = min(k + 1, sims.shape[1])  # +1: self may be in batch
            # Per-batch selection must use the FINAL ordering (rounded
            # score desc, cand_id asc), not raw scores: with >kk
            # candidates tied at rounded precision (duplicate-heavy
            # corpora), raw argpartition could drop the candidate the
            # cand_id tie-break would rank first, silently diverging
            # from the pinned oracle. Threshold on the kk-th largest
            # rounded value, then lexsort the (usually kk-sized) pool.
            rounded = np.round(sims, round_digits)
            thr = -np.partition(-rounded, kk - 1, axis=1)[:, kk - 1]
            for qi in range(sims.shape[0]):
                row = sims[qi]
                pool = np.nonzero(rounded[qi] >= thr[qi])[0]
                sel = pool[np.lexsort((c_ids[pool], -rounded[qi][pool]))][:kk]
                for ci in sel:
                    if c_ids[ci] != q_ids[qi]:
                        out.append((q_ids[qi], c_ids[ci], float(row[ci])))
            yield pd.DataFrame(out, columns=["q_id", "cand_id", "cosine_sim"])

    partial = emb.select(id_col, vec_col).mapInPandas(
        score_batches, schema="q_id long, cand_id long, cosine_sim double"
    )
    rounded = partial.withColumn(
        "cosine_sim", F.round("cosine_sim", round_digits)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("cand_id"))
    out = (
        rounded.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "cand_id", "cosine_sim", F.col("rank").cast("int"))
    )
    out._sgraft_broadcast = bc  # ties broadcast lifetime to the plan
    return out


# --------------------------------------------------------------------- #
# Scale path: random-hyperplane LSH bucketing
# --------------------------------------------------------------------- #


def hyperplane_signature(
    vec: "F.Column", planes: "list[list[float]]"
) -> "F.Column":
    """Sign-bit signature of ``vec`` against fixed hyperplanes, as a
    bit-packed long — pure column expressions (JVM-side). One HOF fold
    per plane; fine for a handful of planes. For the all-tables LSH path
    use :func:`_signature_udf` — the Arrow-vectorized form with the same
    bit-exact arithmetic and a constant-size plan."""
    from spark_indexedrdd_spark.functions.vectors import dot_literal

    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot_literal(vec, plane)
        sig = sig + F.when(d >= 0, F.lit(2**i).cast("long")).otherwise(0)
    return sig


def _signature_udf(tables: "list[list[list[float]]]"):
    """Pandas UDF computing EVERY table's bucket in one pass:
    ``array<long>`` of length n_tables per row.

    Bit-exactness (the property the SQL oracle depends on): each plane
    dot is accumulated dimension-by-dimension in float64 —
    ``acc += v[:, i] * p[i]`` — sequential over dimensions, vectorized
    over ROWS. Per row that is exactly the left fold
    ``0.0 + v[0]*p[0] + v[1]*p[1] + …`` the oracle's ``list_reduce``
    computes (numpy never reorders the i-loop; elementwise float64 ops
    are IEEE), so sign bits are identical — unlike ``np.dot``, whose
    blocked summation reorders additions. The plan stays constant-size
    (one UDF node), where unrolled column expressions put ~65k nodes
    through the optimizer (measured: 45 s of driver-side compile) and
    HOF folds pay interpreted per-element dispatch (measured: 5.8 s at
    sf0.1)."""
    import numpy as np
    import pandas as pd

    plane_mats = [np.asarray(t, dtype=np.float64) for t in tables]

    def sig_all(emb):
        v = np.array(emb.tolist(), dtype=np.float64)  # (n, dim) — f32→f64 exact
        n = v.shape[0]
        out = np.zeros((n, len(plane_mats)), dtype=np.int64)
        for t, planes in enumerate(plane_mats):
            bucket = np.zeros(n, dtype=np.int64)
            for b, p in enumerate(planes):
                acc = np.zeros(n, dtype=np.float64)
                for i in range(p.shape[0]):
                    acc += v[:, i] * p[i]
                bucket += (acc >= 0).astype(np.int64) << b
            out[:, t] = bucket
        return pd.Series(list(out))

    # real-object annotations: `from __future__ import annotations` would
    # stringify inline hints, which pandas_udf's inference can't resolve
    sig_all.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf(sig_all, "array<long>")


def _lsh_planes(
    n_planes: int, n_tables: int, seed: int, dim: int
) -> list[list[list[float]]]:
    """Deterministic hyperplanes shared by the Spark operator and its SQL
    oracle — same seed → identical float64 values on both sides (Python
    float repr round-trips exactly through both engines' literals)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n_planes, dim)).tolist() for _ in range(n_tables)]


def hyperplane_lsh_ann(
    emb: DataFrame,
    query_ids: Iterable[int] = tuple(DEFAULT_QUERY_IDS),
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent 2^n_planes-bucket LSH
    tables; candidates = union of bucket collisions; exact cosine re-rank
    of the (small) candidate set. Deterministic planes from a seeded RNG.

    Oracle-exact despite being an ANN: signatures are sign bits of
    sequential-fold double dot products against literal planes, and the
    re-rank is the fold-exact cosine — every arithmetic step is
    bit-identical in :func:`sql_hyperplane_lsh_ann`, so the DuckDB twin
    reproduces bucket collisions AND scores exactly.

    Scale: each table is an equi-join on (table_id, bucket) — shuffle
    keys are buckets, so cost ~ collisions, never all-pairs. Recall is
    tested against brute force in tests/test_similarity.py."""
    tables = _lsh_planes(n_planes, n_tables, seed, dim)
    sig_all = _signature_udf(tables)

    def bucketed(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(f"{out_id}_vec"),
            sig_all(F.col(vec_col)).alias("__sigs"),
        ).select(
            out_id,
            f"{out_id}_vec",
            F.posexplode("__sigs").alias("table_id", "bucket"),
        )

    q = bucketed(
        emb.where(F.col(id_col).isin(list(query_ids))), "q_id"
    )
    c = bucketed(emb, "cand_id")
    cand = (
        q.join(c, on=["table_id", "bucket"])
        .where(F.col("q_id") != F.col("cand_id"))
        .select("q_id", "q_id_vec", "cand_id", "cand_id_vec")
        .distinct()
    )
    scored = cand.select(
        "q_id",
        "cand_id",
        # HOF fold cosine: the candidate set is small (bucket collisions
        # only), so interpreted per-element cost is negligible — and the
        # unrolled form's ~400-node tree × plan reuse isn't worth it here
        cosine(F.col("q_id_vec"), F.col("cand_id_vec")).alias("cosine_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "cand_id", "cosine_sim", F.col("rank").cast("int"))
    )


def ann_recall(
    emb: DataFrame,
    ann_result: DataFrame,
    query_ids: Iterable[int] = tuple(DEFAULT_QUERY_IDS),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query recall@k of an ANN result against in-plan brute force:
    (q_id, n_hits, recall) with recall = |ann ∩ true top-k| / k.

    The monitoring instrument a production ANN tier needs: run it on a
    sampled query set each ingest cycle and alert when recall drifts
    (e.g. the IVF centroids went stale as the corpus distribution
    moved). ``ann_result`` is any frame with (q_id, cand_id) — the
    output shape of ``cosine_topk_fast`` / ``hyperplane_lsh_ann`` /
    ``ivf.ivf_ann``. Deterministic for deterministic inputs: ties in the
    brute-force ranking break on cand_id, same as every tier.

    Scale: brute force over a SAMPLED query set is q × corpus — one
    corpus scan (the same cost profile as ``cosine_topk``); the ANN side
    is tiny (q × k rows). Never run it over the full query log."""
    truth = cosine_topk(emb, query_ids, k, id_col, vec_col).select(
        "q_id", "cand_id"
    )
    hits = (
        truth.join(
            ann_result.select("q_id", "cand_id"), ["q_id", "cand_id"], "left_semi"
        )
        .groupBy("q_id")
        .agg(F.count("*").alias("n_hits"))
    )
    base = truth.select("q_id").distinct()
    return base.join(hits, "q_id", "left").select(
        "q_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k))).alias("recall"),
    )


def sql_ann_recall(
    table: str = "embeddings",
    query_ids: Iterable[int] = tuple(DEFAULT_QUERY_IDS),
    k: int = 5,
) -> str:
    """DuckDB twin of ``ann_recall(emb, hyperplane_lsh_ann(emb))`` —
    recall of the LSH tier against brute force is plain SQL over the two
    tiers' own exact oracles: truth = raw-fold top-k, ann = the LSH
    twin; recall = |intersection| / k per query. Exact because both
    subqueries are exact (bit-identical folds) and the arithmetic here
    is integer-count / small-literal division."""
    truth = sql_cosine_topk(table, query_ids, k)
    ann = sql_hyperplane_lsh_ann(table, query_ids, k)
    return f"""
        WITH truth AS (SELECT q_id, cand_id FROM ({truth})),
        ann AS (SELECT q_id, cand_id FROM ({ann})),
        hits AS (
            SELECT t.q_id, COUNT(*) AS n_hits
            FROM truth t JOIN ann a ON t.q_id = a.q_id AND t.cand_id = a.cand_id
            GROUP BY t.q_id
        ),
        base AS (SELECT DISTINCT q_id FROM truth)
        SELECT b.q_id,
               CAST(COALESCE(h.n_hits, 0) AS INTEGER) AS n_hits,
               COALESCE(h.n_hits, 0) / CAST({float(k)} AS DOUBLE) AS recall
        FROM base b LEFT JOIN hits h ON b.q_id = h.q_id
    """


def sql_hyperplane_lsh_ann(
    table: str = "embeddings",
    query_ids: Iterable[int] = tuple(DEFAULT_QUERY_IDS),
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> str:
    """Exact DuckDB twin of :func:`hyperplane_lsh_ann` (same parameters).

    Bit-exactness argument: the Spark side computes each signature bit as
    ``sign(fold_left(v[i] * plane[i]))`` in double precision with literal
    plane values; this SQL computes the identical sequential fold
    (``sql_dot``) against the same literals (``CAST('<repr>' AS DOUBLE)``
    — Python float repr round-trips exactly through strtod), so the sign
    bits, bucket collisions, and the fold-exact cosine re-rank are all
    bit-identical. The plan shape differs (OR-of-bucket-equalities
    instead of explode+equi-join) but the produced pair set is the same:
    pairs sharing at least one table's bucket."""
    from spark_indexedrdd_spark.functions.vectors import sql_cosine, sql_dot

    tables = _lsh_planes(n_planes, n_tables, seed, dim)
    sig_exprs = []
    for t, planes in enumerate(tables):
        terms = []
        for i, plane in enumerate(planes):
            lit = (
                "["
                + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in plane)
                + "]"
            )
            d = sql_dot(vec_col, lit)
            terms.append(f"CASE WHEN ({d}) >= 0 THEN {2 ** i} ELSE 0 END")
        sig_exprs.append(f"CAST(({' + '.join(terms)}) AS BIGINT) AS b{t}")
    ids = ", ".join(str(i) for i in query_ids)
    bucket_or = " OR ".join(f"q.b{t} = c.b{t}" for t in range(n_tables))
    return f"""
        WITH s AS (
            SELECT {id_col}, {vec_col}, {", ".join(sig_exprs)} FROM {table}
        ),
        q AS (SELECT * FROM s WHERE {id_col} IN ({ids})),
        cand AS (
            SELECT DISTINCT q.{id_col} AS q_id, q.{vec_col} AS qv,
                   c.{id_col} AS cand_id, c.{vec_col} AS cv
            FROM q JOIN s c ON q.{id_col} <> c.{id_col} AND ({bucket_or})
        ),
        scored AS (
            SELECT q_id, cand_id, {sql_cosine("qv", "cv")} AS cosine_sim
            FROM cand
        ),
        ranked AS (
            SELECT q_id, cand_id, cosine_sim,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine_sim DESC, cand_id) AS INTEGER) AS rank
            FROM scored
        )
        SELECT q_id, cand_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
    """
