"""Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical BM25
branch and a dense cosine branch over the same document id space.

The modern RAG-serving shape (Cormack et al. 2009 RRF; every production
hybrid-search engine ships it): each query carries BOTH a keyword string
and an embedding; the lexical and dense branches each produce their own
top-k_branch ranking, and the fused score of a document is

    rrf(d) = sum over branches containing d of 1 / (rrf_k + rank_branch(d))

Rank fusion deliberately ignores the branches' incomparable raw scores —
only the integer ranks enter — which is exactly what makes it
oracle-exact here: both branches are already hash-pinned cross-engine
(``bm25_topk`` fixed-point sums, ``cosine_topk`` fold-exact doubles), so
their ranks match, and the fused score is computed in fixed point
(``floor(1e9 / (rrf_k + rank))`` summed as BIGINT — floor, not round, so
there is no half-way-tie rounding-mode dependence between engines).

Plan shape / 100 TB story: the corpus-sized work is entirely inside the
branches, whose scale arguments are documented where they live
(``retrieval.bm25_topk`` one pruned scan + WindowGroupLimit top-k;
``similarity.cosine_topk`` brute twin vs the ``ivf_ann`` /
``cosine_topk_fast`` scale tiers). Fusion itself only ever touches the
branch RESULTS — at most ``q x k_branch`` rows per branch — via a
union + map-side-combined groupBy and a final per-qid window over
<= 2 x q x k_branch rows. Fusion cost is independent of corpus size by
construction. The at-rest twin :func:`hybrid_rrf_from_stores` runs both
branches from their persisted indexes (postings buckets pruned to the
query terms, IVF clusters pruned to the probed lists), so a hybrid serve
reads ~(matched postings + probed clusters), never the corpus.

The reference has no retrieval surface (SURVEY.md §2.5) — extension ops
in the LLM-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_indexedrdd_spark.localframe import local_rows_df

# (qid, lexical query text, dense query vec_id): the hybrid workload
# pairs each qid with a keyword string (BM25 branch, documents table)
# and a query-by-example embedding id (cosine branch, embeddings
# table). doc_id and vec_id share one id space in the testdata.
HYBRID_QUERIES: tuple = (
    (1, "spark hash join", 0),
    (2, "fast vector scan", 100),
    (3, "window query order", 200),
)

RRF_K = 60  # the canonical damping constant from the RRF paper

_SCALE = 1_000_000_000.0  # fixed-point: 9 decimal digits


def _rrf9(denom):
    """floor(1e9 / denom) as BIGINT, denom = rrf_k + rank — see module
    docstring for why floor (exact IEEE division of small integers,
    floor identical across engines; round would hinge on half-way
    rounding modes)."""
    return F.floor(F.lit(_SCALE) / denom).cast("long")


def fuse_rrf(
    lex: DataFrame,
    den: DataFrame,
    k: int = 10,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Fuse two (qid, doc_id, rank) branch rankings into RRF top-k:
    (qid, doc_id, rrf_score, lex_rank, dense_rank, rank).

    Input frames are branch RESULTS (<= q x k_branch rows each), so
    every op here is tiny: a union + one map-side-combined groupBy on
    (qid, doc_id), then a per-qid window. A document missing from one
    branch simply contributes nothing for it (its branch rank is NULL
    in the output). Ties break on doc_id."""
    contrib = lex.select(
        F.col("qid").cast("int").alias("qid"),
        F.col("doc_id").cast("long").alias("doc_id"),
        _rrf9(F.lit(rrf_k) + F.col("rank")).alias("rrf9"),
        F.col("rank").cast("int").alias("lex_rank"),
        F.lit(None).cast("int").alias("dense_rank"),
    ).unionByName(
        den.select(
            F.col("qid").cast("int").alias("qid"),
            F.col("doc_id").cast("long").alias("doc_id"),
            _rrf9(F.lit(rrf_k) + F.col("rank")).alias("rrf9"),
            F.lit(None).cast("int").alias("lex_rank"),
            F.col("rank").cast("int").alias("dense_rank"),
        )
    )
    fused = contrib.groupBy("qid", "doc_id").agg(
        F.sum("rrf9").cast("long").alias("rrf9"),
        F.max("lex_rank").alias("lex_rank"),
        F.max("dense_rank").alias("dense_rank"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf9"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            "doc_id",
            F.round(F.col("rrf9") / F.lit(_SCALE), 9).alias("rrf_score"),
            "lex_rank",
            "dense_rank",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _dense_to_qids(spark: SparkSession, den: DataFrame, queries) -> DataFrame:
    """Map the dense branch's (q_id = query vec_id) rows back to the
    hybrid workload's qids via a broadcast literal map."""
    qmap = F.broadcast(
        local_rows_df(
            spark, [(int(q), int(v)) for q, _t, v in queries],
            "qid int, vid long",
        )
    )
    return den.join(qmap, den["q_id"] == qmap["vid"]).select(
        "qid", F.col("cand_id").alias("doc_id"), "rank"
    )


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    queries: tuple = HYBRID_QUERIES,
    k: int = 10,
    k_branch: int = 20,
    rrf_k: int = RRF_K,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """In-plan hybrid retrieval: BM25 over ``docs`` + brute cosine over
    ``emb`` (the oracle twin; the at-rest serve path is
    :func:`hybrid_rrf_from_stores`), fused with RRF.

    Returns (qid, doc_id, rrf_score, lex_rank, dense_rank, rank),
    rank 1..k per qid. Exact DuckDB twin: :func:`sql_hybrid_rrf`."""
    from spark_indexedrdd_spark.functions.retrieval import bm25_topk
    from spark_indexedrdd_spark.functions.similarity import cosine_topk

    spark = docs.sparkSession
    lex = bm25_topk(
        docs,
        queries=tuple((q, t) for q, t, _v in queries),
        k=k_branch,
        text_col=text_col,
        id_col=doc_id_col,
    ).select("qid", F.col(doc_id_col).alias("doc_id"), "rank")
    den = cosine_topk(
        emb,
        query_ids=[v for _q, _t, v in queries],
        k=k_branch,
        id_col=vec_id_col,
        vec_col=vec_col,
    )
    return fuse_rrf(
        lex, _dense_to_qids(spark, den, queries), k=k, rrf_k=rrf_k
    )


def hybrid_rrf_from_stores(
    spark: SparkSession,
    postings_path: str,
    ivf_path: str,
    queries: tuple = HYBRID_QUERIES,
    k: int = 10,
    k_branch: int = 20,
    rrf_k: int = RRF_K,
    n_probe: int = 4,
    postings_version: "int | None" = None,
    ivf_version: "int | None" = None,
    dense_filter_pred: "str | None" = None,
) -> DataFrame:
    """Hybrid serve FROM the persisted indexes: the lexical branch is
    :func:`retrieval.bm25_from_store` (reads only the query terms'
    postings buckets — PartitionFilters-asserted there), the dense
    branch :func:`ivf.ivf_ann_from_store` (reads only the probed
    clusters' vector directories). Serve cost ∝ matched postings +
    probed clusters, independent of corpus size; both branches honour
    their stores' committed tombstones and ``version=`` as-of reads.

    Parity (pytest-pinned): with ``n_probe = n_clusters`` this equals
    fusing the same branches in-plan (``bm25_topk`` + ``ivf_ann``) —
    the store≡in-plan contract each branch already carries, composed.

    ``dense_filter_pred`` is filtered hybrid search (RAG with a
    metadata filter): the dense branch serves only candidates matching
    the predicate over the IVF store's keep_cols
    (``ivf.ivf_ann_from_store(filter_pred=)`` — prefilter semantics,
    predicate pushed into the pruned scan). The lexical branch is
    unfiltered (the postings store carries no metadata); a
    doc admitted only lexically therefore fuses on its lexical rank
    alone — callers needing a hard filter across both branches apply
    it to the fused frame (the branch flags make that a one-line
    where)."""
    from spark_indexedrdd_spark.functions.ivf import ivf_ann_from_store
    from spark_indexedrdd_spark.functions.retrieval import bm25_from_store

    lex = bm25_from_store(
        spark,
        postings_path,
        queries=tuple((q, t) for q, t, _v in queries),
        k=k_branch,
        version=postings_version,
    ).select("qid", "doc_id", "rank")
    den = ivf_ann_from_store(
        spark,
        ivf_path,
        query_ids=[v for _q, _t, v in queries],
        k=k_branch,
        n_probe=n_probe,
        version=ivf_version,
        filter_pred=dense_filter_pred,
    )
    return fuse_rrf(
        lex, _dense_to_qids(spark, den, queries), k=k, rrf_k=rrf_k
    )


def sql_hybrid_rrf(
    doc_table: str = "documents",
    emb_table: str = "embeddings",
    queries: tuple = HYBRID_QUERIES,
    k: int = 10,
    k_branch: int = 20,
    rrf_k: int = RRF_K,
    prefix_ctes: str = "",
) -> str:
    """Exact DuckDB twin of :func:`hybrid_rrf`: the branch CTEs are the
    branches' own exact oracles (``sql_bm25_topk``,
    ``sql_cosine_topk``), fused with the same fixed-point arithmetic
    (floor(1e9/(rrf_k+rank)) summed as BIGINT).

    ``prefix_ctes`` prepends caller CTEs to the WITH list (e.g.
    ``"documents_base AS (SELECT ...), "``) so a base-subset oracle
    (the snapshot-pinned serve's twin) composes structurally —
    callers must NOT splice text into the returned SQL."""
    from spark_indexedrdd_spark.functions.retrieval import sql_bm25_topk
    from spark_indexedrdd_spark.functions.similarity import sql_cosine_topk

    lex_sql = sql_bm25_topk(
        table=doc_table,
        queries=tuple((q, t) for q, t, _v in queries),
        k=k_branch,
    )
    den_sql = sql_cosine_topk(
        table=emb_table,
        query_ids=[v for _q, _t, v in queries],
        k=k_branch,
    )
    qmap_vals = ", ".join(f"({int(q)}, {int(v)})" for q, _t, v in queries)
    return f"""
        WITH {prefix_ctes}lex_raw AS ({lex_sql}),
        den_raw AS ({den_sql}),
        qmap(qid, vid) AS (VALUES {qmap_vals}),
        lex_q AS (SELECT qid, doc_id, rank FROM lex_raw),
        den_q AS (
            SELECT m.qid, d.cand_id AS doc_id, d.rank
            FROM den_raw d JOIN qmap m ON d.q_id = m.vid
        ),
        contrib AS (
            SELECT qid, doc_id,
                   CAST(FLOOR(1000000000.0 / ({rrf_k} + rank)) AS BIGINT)
                       AS rrf9,
                   CAST(rank AS INTEGER) AS lex_rank,
                   CAST(NULL AS INTEGER) AS dense_rank
            FROM lex_q
            UNION ALL
            SELECT qid, doc_id,
                   CAST(FLOOR(1000000000.0 / ({rrf_k} + rank)) AS BIGINT),
                   CAST(NULL AS INTEGER),
                   CAST(rank AS INTEGER)
            FROM den_q
        ),
        fused AS (
            SELECT qid, doc_id,
                   CAST(SUM(rrf9) AS BIGINT) AS rrf9,
                   MAX(lex_rank) AS lex_rank,
                   MAX(dense_rank) AS dense_rank
            FROM contrib GROUP BY qid, doc_id
        ),
        ranked AS (
            SELECT CAST(qid AS INTEGER) AS qid,
                   CAST(doc_id AS BIGINT) AS doc_id,
                   ROUND(rrf9 / 1000000000.0, 9) AS rrf_score,
                   lex_rank, dense_rank,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY qid ORDER BY rrf9 DESC, doc_id
                   ) AS INTEGER) AS rank
            FROM fused
        )
        SELECT qid, doc_id, rrf_score, lex_rank, dense_rank, rank
        FROM ranked WHERE rank <= {k}
    """
