"""Text retrieval over the document corpus: BM25 ranking, TF-IDF
keyword extraction, a partition-pruned inverted-index (postings) store,
and an exactly-stratified train/val/test split.

These extend the reference's indexed-lookup surface (point reads over a
keyed index, amplab/spark-indexedrdd IndexedRDD.scala:76-94) to the
retrieval shape an LLM-data pipeline needs: the postings store IS a
persisted index keyed by term — `bm25_from_store` is `multiget` over
terms followed by a rank, reading only the matching partitions the way
the reference's multiget routes to partitionsRDD blocks
(IndexedRDD.scala:79-94).

Determinism contract (the repo-wide oracle playbook): every
transcendental (ln) is ROUND(9)-pinned per term; per-document scores
are fixed-point BIGINTs (score * 1e9) summed with integer arithmetic —
order-free on both engines — and divided back to double only for
display. No grouped float sums anywhere.
"""

from __future__ import annotations

import json
import os
from math import floor as math_floor

from pyspark.sql import Column, DataFrame, SparkSession, Window

from spark_indexedrdd_spark.localframe import local_rows_df
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions.text import sql_tokens, tokens
from spark_indexedrdd_spark.checkpoint import truncate_lineage

# Default query workload: three fixed queries over the synthetic corpus
# vocabulary (TESTDATA.md documents.text) — literal so every run and
# both engines score the identical workload.
DEFAULT_BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark hash join"),
    (2, "fast vector scan"),
    (3, "window query order"),
)

_SCALE = 1_000_000_000.0  # fixed-point: 9 decimal digits


def _query_terms(
    queries: "tuple[tuple[int, str], ...]",
) -> "list[tuple[int, str]]":
    """(qid, term) pairs, lowercased, de-duplicated, sorted."""
    return sorted({(q, t) for q, s in queries for t in s.lower().split()})


def _doc_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One narrow pass: (id, dl, term) — document length rides along
    with the exploded term so downstream scoring never joins a separate
    lengths table (at 100 TB that join is a full-corpus shuffle on id;
    this is free)."""
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    return toked.select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("dl"),
        F.explode("__toks").alias("term"),
    )


def _sql_doc_terms(table: str, text_col: str, id_col: str) -> str:
    toks = sql_tokens(text_col)
    return f"""
        SELECT {id_col}, CAST(len(__toks) AS BIGINT) AS dl,
               unnest(__toks) AS term
        FROM (SELECT {id_col}, {toks} AS __toks FROM {table})
    """


def _df_t(tf: DataFrame) -> DataFrame:
    """Per-term document frequency from an aggregated ``(…, term, tf)``
    frame, phrased so BOTH consumers of ``tf`` (the scorer join and
    this df_t aggregate) share ONE physical subtree. The obvious
    ``COUNT(*)`` lets RemoveRedundantAggregates rewrite THIS branch's
    copy of the shared tf aggregate into its distinct form
    (``functions=[]``) — the subtrees stop being canonically identical,
    ReusedExchange no longer fires, and the corpus tokenize+explode
    silently runs once per branch. ``COUNT(CASE WHEN tf > 0 ...)``
    references the tf column in a form the optimizer cannot reduce
    (exactly equivalent: tf >= 1 on every row by construction), keeping
    the branches identical — plan-asserted in tests/test_plans.py
    (bm25_topk/tfidf: 2 scans + 2 explodes → 1)."""
    return tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, F.lit(1)))
        .cast("long")
        .alias("df_t")
    )


def _avgdl9(spark, total_dl: int, n_docs: int) -> "float | None":
    """ROUND(total_dl / n_docs, 9) evaluated by Spark's OWN Round
    (HALF_UP over the JVM double of a double/double division — the
    exact op sequence the in-plan broadcast-stats frame performs), but
    through a OneRowRelation select that constant-folds in the
    optimizer: no shuffle, no scan, one trivial task — replaces the
    spark.range(1) job the serve path used to run per call. Returns
    None on an empty corpus (mirrors the NULL the in-plan agg yields)."""
    if not n_docs or total_dl is None:
        return None
    row = spark.sql(
        f"SELECT round(CAST({int(total_dl)} AS DOUBLE) / "
        f"CAST({int(n_docs)} AS DOUBLE), 9) AS a"
    ).collect()[0]
    return float(row["a"])


def _attach_stats(scored: DataFrame, spark, stats_lit) -> DataFrame:
    """Attach (n_docs, avgdl) as LITERAL columns from exact driver-side
    longs — the shared-stats path for flows that score the same corpus
    twice (RM3's feedback pass + expanded re-score): the corpus-stats
    tokenize runs once per flow instead of once per pass. Values are
    bit-identical to the 1-row broadcast-stats join (same JVM division
    and Round — see _avgdl9)."""
    n_docs, total_dl = stats_lit
    return scored.withColumn(
        "n_docs", F.lit(int(n_docs)).cast("long")
    ).withColumn(
        "avgdl", F.lit(_avgdl9(spark, total_dl, n_docs)).cast("double")
    )


def _bm25_score9(k1: float, b: float) -> Column:
    """Per-(doc, term) BM25 contribution as a fixed-point BIGINT.

    idf and the tf-saturation factor are each ROUND(9)-pinned before
    the product so the two engines' ln/div agree bit-for-bit; the
    product is then snapped to an integer that sums associatively."""
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
            + 1.0
        ),
        9,
    )
    tfpart = F.round(
        (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * ((1.0 - b) + b * (F.col("dl") / F.col("avgdl")))
        ),
        9,
    )
    return F.round(idf * tfpart * F.lit(_SCALE), 0).cast("long")


def _sql_bm25_score9(k1: float, b: float) -> str:
    k1p1 = repr(k1 + 1.0)
    omb = repr(1.0 - b)
    return (
        f"CAST(ROUND("
        f"ROUND(ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0), 9)"
        f" * ROUND((tf * {k1p1}) / (tf + {repr(k1)} *"
        f" ({omb} + {repr(b)} * (dl / avgdl))), 9)"
        f" * 1000000000.0, 0) AS BIGINT)"
    )


def bm25_topk(
    df: DataFrame,
    queries: "tuple[tuple[int, str], ...]" = DEFAULT_BM25_QUERIES,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    _stats: "tuple[int, int | None] | None" = None,
) -> DataFrame:
    """Okapi BM25 top-k retrieval for a literal query workload:
    (qid, doc_id, score, rank), rank 1..k per query, ties broken by id.

    Scale: the corpus is scanned once (explode + an ``isin`` filter on
    the tiny literal term set, pushed below the aggregation); tf rows
    exist only for (matching doc × query term). Corpus stats, per-term
    document frequencies, and the (qid, term) map are all
    driver/broadcast sized. The only wide ops are the map-side-combined
    tf aggregation and the per-qid top-k window, whose rank<=k cutoff
    pushes below the exchange (WindowGroupLimit) — so the final shuffle
    carries at most k rows per query per map task.

    ``_stats`` (exact driver-side ``(n_docs, total_dl)`` longs) is the
    shared-stats hook for flows that score the same corpus more than
    once (RM3): when given, the corpus-stats aggregate — a full
    tokenize pass of its own — is skipped and the identical values
    attach as literals (:func:`_attach_stats`)."""
    spark = df.sparkSession
    qt = _query_terms(queries)
    terms = sorted({t for _, t in qt})
    q = local_rows_df(spark, qt, "qid int, term string")

    tok = _doc_terms(df, text_col, id_col).where(F.col("term").isin(terms))
    tf = tok.groupBy(id_col, "dl", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dft = _df_t(tf)

    scored = tf.join(F.broadcast(dft), "term")
    if _stats is None:
        stats = df.select(
            F.size(tokens(F.col(text_col))).cast("long").alias("dl")
        ).agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("total_dl"),
        ).select(
            "n_docs",
            F.round(F.col("total_dl") / F.col("n_docs"), 9).alias("avgdl"),
        )
        scored = scored.join(F.broadcast(stats))
    else:
        scored = _attach_stats(scored, spark, _stats)
    scored = (
        scored.join(F.broadcast(q), "term")
        .select("qid", id_col, _bm25_score9(k1, b).alias("s9"))
    )
    agg = scored.groupBy("qid", id_col).agg(
        F.sum("s9").cast("long").alias("score9")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score9"), F.asc(id_col))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").cast("int"),
            F.col(id_col),
            F.round(F.col("score9") / F.lit(_SCALE), 9).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def rm3_expansion_terms(
    df: DataFrame,
    queries: "tuple[tuple[int, str], ...]" = DEFAULT_BM25_QUERIES,
    k_fb: int = 5,
    m_expand: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    _stats: "tuple[int, int | None] | None" = None,
) -> DataFrame:
    """RM3-style pseudo-relevance feedback terms (Lavrenko & Croft
    2001 relevance models, the Anserini/Indri default expansion):
    (qid, term, rm9, rank) — the top-``m_expand`` terms of each
    query's top-``k_fb`` BM25 feedback documents, weighted by the
    fixed-point relevance-model mass

        rm9(t | q) = sum over feedback docs d of floor(1e9 * tf(t,d)/dl(d))

    (per-doc floor BEFORE the sum, so the BIGINT total is
    order-insensitive and engine-exact — the bm25 score9 discipline).
    Original query terms are excluded; ties break on the term.

    Plan shape: the feedback result is collected (q x k_fb rows — the
    serve's own bound) so its ids reach the expansion pass as an
    ``isin`` literal the parquet scan prunes on: only the feedback
    documents are read and tokenized. (As a lazy broadcast join the
    filter sat ABOVE the explode — Catalyst does not reorder a join
    below a generate — so the expansion pass used to tokenize the
    ENTIRE corpus to keep ~q x k_fb documents: a second full corpus
    pass, removed r14.) Then one map-side-combined (qid, term)
    aggregation over feedback-doc-sized input and a per-qid
    WindowGroupLimit top-m."""
    from pyspark.sql import types as T

    fb_frame = bm25_topk(
        df, queries=queries, k=k_fb, k1=k1, b=b,
        text_col=text_col, id_col=id_col, _stats=_stats,
    ).select("qid", id_col)
    fb_rows = fb_frame.collect()
    fb = local_rows_df(
        df.sparkSession,
        fb_rows,
        T.StructType([fb_frame.schema["qid"], fb_frame.schema[id_col]]),
    )
    return _rm3_terms_for_feedback(
        df, fb, queries, m_expand, text_col, id_col,
        fb_ids=sorted({r[1] for r in fb_rows}),
    )


def _rm3_terms_for_feedback(
    df: DataFrame,
    fb: DataFrame,
    queries: "tuple[tuple[int, str], ...]",
    m_expand: int,
    text_col: str,
    id_col: str,
    fb_ids=None,
) -> DataFrame:
    """Expansion-term selection given a (qid, id) feedback frame —
    shared by the in-plan and store-served RM3 (the feedback frame's
    provenance is the only difference between them).

    ``fb_ids`` (the distinct feedback doc ids, driver-side — both
    callers hold them already) prunes the corpus scan to the feedback
    documents BEFORE tokenization: the isin literal pushes into the
    parquet source, so only ~q × k_fb documents are read and exploded.
    A broadcast join alone cannot do this — Catalyst does not reorder
    a join below the explode, so without the literal the whole corpus
    was tokenized to keep a handful of rows. Joining fb afterwards
    (unchanged) attaches qids; results are identical because the join
    keeps exactly the fb_ids rows either way."""
    qt = _query_terms(queries)
    orig = {q: {t for qq, t in qt if qq == q} for q, _ in qt}
    spark = df.sparkSession
    orig_df = F.broadcast(
        local_rows_df(
            spark,
            [(q, t) for q, ts in orig.items() for t in ts],
            "qid int, term string",
        )
    )
    src = df
    if fb_ids is not None:
        ids = list(fb_ids)
        src = df.where(
            F.col(id_col).isin(ids) if ids else F.lit(False)
        )
    dt = _doc_terms(src, text_col, id_col)
    fb_terms = dt.join(F.broadcast(fb), id_col)
    tf = fb_terms.groupBy("qid", id_col, "dl", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    contrib = tf.select(
        "qid",
        "term",
        F.floor(F.lit(_SCALE) * (F.col("tf") / F.col("dl")))
        .cast("long")
        .alias("c9"),
    )
    rm = (
        contrib.groupBy("qid", "term")
        .agg(F.sum("c9").cast("long").alias("rm9"))
        .join(orig_df, ["qid", "term"], "left_anti")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rm9"), F.asc("term"))
    return (
        rm.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m_expand)
        .select(
            F.col("qid").cast("int"), "term", "rm9",
            F.col("rank").cast("int"),
        )
    )


def bm25_rm3_topk(
    df: DataFrame,
    queries: "tuple[tuple[int, str], ...]" = DEFAULT_BM25_QUERIES,
    k: int = 10,
    k_fb: int = 5,
    m_expand: int = 5,
    alpha: float = 0.6,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 + RM3 query expansion, end to end: feedback retrieval →
    expansion-term selection (:func:`rm3_expansion_terms`) → re-score
    with the interpolated query. Final fixed-point score, all-BIGINT:

        final15(d) = alpha6 * s9_orig(d)
                   + (1e6 - alpha6) * ((sum_t w6_t * s9_t(d)) DIV 1e6)

    where alpha6 = floor(alpha * 1e6), w6_t = floor(1e6 * rm9_t /
    sum rm9 over the query's expansion terms) (both products stay
    under 2^53 BEFORE the floor, so the doubles are exact on both
    engines), s9 is bm25's per-term fixed-point contribution, and DIV
    is BIGINT integer division (the intermediate exceeds 2^53, so a
    double-typed floor-div would lose exactness — this is why the
    rescale is integral). Ranking is on the integer final15; the
    emitted ``score`` is final15/1e15 ROUND(9).

    Scale: three corpus passes — ONE shared stats tokenize (collected
    as exact longs, attached to both scoring passes as literals via
    :func:`_attach_stats`; each pass used to run its own), feedback
    retrieval, and the re-score with the expanded literal term set
    (still an ``isin`` pushed below the tf aggregation) — plus
    driver-side collects of q x k_fb feedback ids and q x m_expand
    expansion rows (the IVF probe-selection pattern: query-batch
    bounded). Exact DuckDB twin: :func:`sql_bm25_rm3_topk`."""
    spark = df.sparkSession
    alpha6 = int(math_floor(float(alpha) * 1_000_000.0))
    beta6 = 1_000_000 - alpha6

    # corpus stats ONCE for both scoring passes: the feedback pass and
    # the expanded re-score each used to run their own full-corpus
    # stats tokenize — identical values by construction, so collect the
    # exact longs here and attach them as literals (_attach_stats) in
    # both passes: 2 corpus-stats passes -> 1 per RM3 call
    strow = df.select(
        F.size(tokens(F.col(text_col))).cast("long").alias("dl")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ).collect()[0]
    stats_lit = (
        int(strow["n_docs"]),
        None if strow["total_dl"] is None else int(strow["total_dl"]),
    )

    exp_rows = rm3_expansion_terms(
        df, queries=queries, k_fb=k_fb, m_expand=m_expand,
        k1=k1, b=b, text_col=text_col, id_col=id_col, _stats=stats_lit,
    ).collect()
    tot = {}
    for r in exp_rows:
        tot[r.qid] = tot.get(r.qid, 0) + r.rm9
    exp_w = [
        # cross-engine exactness of w6 rests on IDENTICAL IEEE double
        # op ORDER on both engines — one multiply, one divide, one
        # floor over the same BIGINT-exact inputs (DuckDB's exp_w CTE
        # performs the same three ops) — NOT on the product staying
        # below 2^53: rm9 can reach ~k_fb * 1e9, so a large k_fb
        # pushes 1e6 * rm9 past 2^53, where both engines round the
        # product identically before the identical divide
        (r.qid, r.term, int(math_floor(1_000_000.0 * r.rm9 / tot[r.qid])))
        for r in exp_rows
    ]
    qt = _query_terms(queries)
    qmap = local_rows_df(
        spark,
        [(q, t, None) for q, t in qt]
        + [(q, t, w6) for q, t, w6 in exp_w],
        "qid int, term string, w6 long",
    )
    terms = sorted({t for _q, t, _w in exp_w} | {t for _q, t in qt})

    tok = _doc_terms(df, text_col, id_col).where(F.col("term").isin(terms))
    tf = tok.groupBy(id_col, "dl", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dft = _df_t(tf)
    scored = (
        _attach_stats(tf.join(F.broadcast(dft), "term"), spark, stats_lit)
        .join(F.broadcast(qmap), "term")
        .select("qid", id_col, "w6", _bm25_score9(k1, b).alias("s9"))
    )
    agg = scored.groupBy("qid", id_col).agg(
        F.sum(F.when(F.col("w6").isNull(), F.col("s9")).otherwise(0))
        .cast("long")
        .alias("s9_orig"),
        F.sum(
            F.when(F.col("w6").isNotNull(), F.col("w6") * F.col("s9"))
            .otherwise(0)
        )
        .cast("long")
        .alias("exp_raw"),
    )
    final = agg.select(
        "qid",
        id_col,
        (
            F.lit(alpha6) * F.col("s9_orig")
            + F.lit(beta6) * F.expr("exp_raw DIV 1000000")
        ).alias("final15"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("final15"), F.asc(id_col))
    return (
        final.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").cast("int"),
            F.col(id_col),
            F.round(F.col("final15") / F.lit(1e15), 9).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _sql_rm3_core(
    table: str,
    queries: "tuple[tuple[int, str], ...]",
    k_fb: int,
    m_expand: int,
    k1: float,
    b: float,
    text_col: str,
    id_col: str,
) -> str:
    """Shared CTE prefix (WITH q … expansion) for the two RM3 oracle
    builders: feedback retrieval (= sql_bm25_topk verbatim), feedback
    term frequencies, per-doc-floored relevance mass, original-term
    exclusion, top-m selection."""
    qt = _query_terms(queries)
    esc = {t: t.replace("'", "''") for _, t in qt}
    vals = ", ".join(f"({q}, '{esc[t]}')" for q, t in qt)
    fb_sql = sql_bm25_topk(
        table=table, queries=queries, k=k_fb, k1=k1, b=b,
        text_col=text_col, id_col=id_col,
    )
    return f"""
        WITH q(qid, term) AS (VALUES {vals}),
        fb AS (SELECT qid, {id_col} FROM ({fb_sql})),
        dt_all AS ({_sql_doc_terms(table, text_col, id_col)}),
        fb_tf AS (
            SELECT fb.qid, dt.{id_col}, dt.dl, dt.term,
                   CAST(COUNT(*) AS BIGINT) AS tf
            FROM dt_all dt JOIN fb ON dt.{id_col} = fb.{id_col}
            GROUP BY fb.qid, dt.{id_col}, dt.dl, dt.term
        ),
        rm AS (
            SELECT qid, term,
                   CAST(SUM(CAST(FLOOR(1000000000.0 * (tf / dl))
                                 AS BIGINT)) AS BIGINT) AS rm9
            FROM fb_tf
            GROUP BY qid, term
        ),
        rm_new AS (
            SELECT r.* FROM rm r
            WHERE NOT EXISTS (
                SELECT 1 FROM q WHERE q.qid = r.qid AND q.term = r.term
            )
        ),
        expansion AS (
            SELECT qid, term, rm9, CAST(rn AS INTEGER) AS rank FROM (
                SELECT qid, term, rm9,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid ORDER BY rm9 DESC, term
                       ) AS rn
                FROM rm_new
            ) WHERE rn <= {m_expand}
        )"""


def sql_rm3_expansion_terms(
    table: str = "documents",
    queries: "tuple[tuple[int, str], ...]" = DEFAULT_BM25_QUERIES,
    k_fb: int = 5,
    m_expand: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Exact DuckDB twin of :func:`rm3_expansion_terms`."""
    core = _sql_rm3_core(
        table, queries, k_fb, m_expand, k1, b, text_col, id_col
    )
    return f"""
        {core}
        SELECT CAST(qid AS INTEGER) AS qid, term, rm9, rank
        FROM expansion
    """


def sql_bm25_rm3_topk(
    table: str = "documents",
    queries: "tuple[tuple[int, str], ...]" = DEFAULT_BM25_QUERIES,
    k: int = 10,
    k_fb: int = 5,
    m_expand: int = 5,
    alpha: float = 0.6,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Exact DuckDB twin of :func:`bm25_rm3_topk`: the feedback CTE is
    ``sql_bm25_topk`` itself, expansion mass the same per-doc-floored
    BIGINT sums, the weight quotient the same multiply→divide→floor
    IEEE double sequence (identical op order on both engines — see the
    exp_w op-order note in :func:`bm25_rm3_topk`), and the final
    interpolation the same all-BIGINT arithmetic with ``//`` (BIGINT
    integer division) for the 1e6 rescale."""
    alpha6 = int(math_floor(float(alpha) * 1_000_000.0))
    beta6 = 1_000_000 - alpha6
    score9 = _sql_bm25_score9(k1, b)
    core = _sql_rm3_core(
        table, queries, k_fb, m_expand, k1, b, text_col, id_col
    )
    return f"""
        {core},
        exp_w AS (
            SELECT qid, term,
                   CAST(FLOOR(1000000.0 * rm9 /
                        (SUM(rm9) OVER (PARTITION BY qid))) AS BIGINT)
                       AS w6
            FROM expansion
        ),
        qmap AS (
            SELECT qid, term, CAST(NULL AS BIGINT) AS w6 FROM q
            UNION ALL
            SELECT qid, term, w6 FROM exp_w
        ),
        dt AS (
            SELECT * FROM dt_all
            WHERE term IN (SELECT DISTINCT term FROM qmap)
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   ROUND(CAST(SUM(len({sql_tokens(text_col)})) AS BIGINT)
                         / CAST(COUNT(*) AS BIGINT), 9) AS avgdl
            FROM {table}
        ),
        tf AS (
            SELECT {id_col}, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM dt GROUP BY {id_col}, dl, term
        ),
        dft AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t
            FROM tf GROUP BY term
        ),
        scored AS (
            SELECT m.qid, tf.{id_col}, m.w6, {score9} AS s9
            FROM tf JOIN dft USING (term)
                    CROSS JOIN stats
                    JOIN qmap m ON m.term = tf.term
        ),
        agg AS (
            SELECT qid, {id_col},
                   CAST(SUM(CASE WHEN w6 IS NULL THEN s9 ELSE 0 END)
                        AS BIGINT) AS s9_orig,
                   CAST(SUM(CASE WHEN w6 IS NOT NULL THEN w6 * s9
                            ELSE 0 END) AS BIGINT) AS exp_raw
            FROM scored GROUP BY qid, {id_col}
        ),
        final AS (
            SELECT qid, {id_col},
                   {alpha6} * s9_orig + {beta6} * (exp_raw // 1000000)
                       AS final15
            FROM agg
        )
        SELECT CAST(qid AS INTEGER) AS qid, {id_col},
               ROUND(final15 / 1000000000000000.0, 9) AS score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY final15 DESC, {id_col}
               ) AS INTEGER) AS rank
        FROM final
        QUALIFY rank <= {k}
    """


def sql_bm25_topk(
    table: str = "documents",
    queries: "tuple[tuple[int, str], ...]" = DEFAULT_BM25_QUERIES,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    exclude_pred: "str | None" = None,
) -> str:
    """``exclude_pred`` (e.g. ``"doc_id % 5 = 0"``) models a takedown
    applied to the corpus: every stat (n_docs, avgdl, df) and every
    candidate comes from the survivors only — the oracle for
    :func:`bm25_from_store` after :func:`delete_postings_docs`."""
    qt = _query_terms(queries)
    # terms are caller-supplied: escape single quotes so a term can
    # never break (or inject into) the generated oracle SQL
    esc = {t: t.replace("'", "''") for _, t in qt}
    vals = ", ".join(f"({q}, '{esc[t]}')" for q, t in qt)
    in_list = ", ".join(
        f"'{esc[t]}'" for t in sorted({t for _, t in qt})
    )
    if exclude_pred:
        table = f"(SELECT * FROM {table} WHERE NOT ({exclude_pred}))"
    return f"""
        WITH q(qid, term) AS (VALUES {vals}),
        dt AS ({_sql_doc_terms(table, text_col, id_col)}),
        stats AS (
            -- from the table, not dt: a token-less document has no dt
            -- row but still counts toward n_docs/avgdl on the Spark side
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   ROUND(CAST(SUM(len(__toks)) AS BIGINT) / CAST(COUNT(*) AS BIGINT), 9) AS avgdl
            FROM (SELECT {sql_tokens(text_col)} AS __toks FROM {table})
        ),
        tf AS (
            SELECT {id_col}, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM dt WHERE term IN ({in_list})
            GROUP BY {id_col}, dl, term
        ),
        dft AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY term
        ),
        per AS (
            SELECT q.qid, tf.{id_col},
                   {_sql_bm25_score9(k1, b)} AS s9
            FROM tf
            JOIN dft USING (term)
            CROSS JOIN stats
            JOIN q USING (term)
        ),
        agg AS (
            SELECT qid, {id_col}, CAST(SUM(s9) AS BIGINT) AS score9
            FROM per GROUP BY qid, {id_col}
        ),
        ranked AS (
            SELECT CAST(qid AS INTEGER) AS qid, {id_col},
                   ROUND(score9 / 1000000000.0, 9) AS score,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY qid ORDER BY score9 DESC, {id_col}
                   ) AS INTEGER) AS rank
            FROM agg
        )
        SELECT qid, {id_col}, score, rank FROM ranked WHERE rank <= {k}
    """


def tfidf_keywords(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: the k terms with the highest
    tf·idf, idf = ln(n_docs / df(term)). Output (doc_id, term, tfidf,
    rank), ties broken by term — the standard "what is this document
    about" summarizer run per ingest batch.

    Determinism: idf is a ROUND(9)-pinned ln snapped to fixed-point
    BIGINT once per term; the per-(doc, term) score is then the pure
    integer product tf × idf9 — no float accumulation at all.

    Scale: explode → map-side-combined (doc, term) count; the idf join
    keys on term (vocabulary-sized — Catalyst broadcasts when small,
    shuffle-hash beyond); the per-doc top-k window's rank<=k cutoff
    pushes below the exchange (WindowGroupLimit)."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dft = _df_t(tf)
    n_docs = df.agg(F.count("*").cast("long").alias("n_docs"))
    idf9 = F.round(
        F.log(F.col("n_docs") / F.col("df_t")) * F.lit(_SCALE), 0
    ).cast("long")
    scored = (
        tf.join(dft, "term")
        .join(F.broadcast(n_docs))
        .select(
            id_col, "term", (F.col("tf") * idf9).cast("long").alias("score9")
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score9"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.round(F.col("score9") / F.lit(_SCALE), 9).alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def sql_tfidf_keywords(
    table: str = "documents",
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    toks = sql_tokens(text_col)
    return f"""
        WITH t AS (
            SELECT {id_col}, unnest({toks}) AS term FROM {table}
        ),
        tf AS (
            SELECT {id_col}, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM t GROUP BY {id_col}, term
        ),
        dft AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY term
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}),
        scored AS (
            SELECT tf.{id_col}, tf.term,
                   CAST(tf.tf * CAST(ROUND(ln(n.n_docs / dft.df_t)
                        * 1000000000.0, 0) AS BIGINT) AS BIGINT) AS score9
            FROM tf JOIN dft USING (term) CROSS JOIN n
        ),
        ranked AS (
            SELECT {id_col}, term,
                   ROUND(score9 / 1000000000.0, 9) AS tfidf,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY {id_col} ORDER BY score9 DESC, term
                   ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT {id_col}, term, tfidf, rank FROM ranked WHERE rank <= {k}
    """


# --------------------------------------------------------------------- #
# Exactly-stratified split
# --------------------------------------------------------------------- #


def stratified_split(
    df: DataFrame,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    seed: int = 42,
) -> DataFrame:
    """Exact stratified train/val/test assignment: within every stratum,
    documents are ranked by a deterministic seeded hash and the first
    floor(n·train_frac) become 'train', the next slice 'val', the rest
    'test' — exact per-stratum proportions (unlike the expectation-only
    hash-threshold split of ``hash_split``), still fully deterministic
    under re-runs and repartitioning. Output (doc_id, stratum, split).

    Scale: a naive PARTITION BY stratum ranking puts a whole stratum in
    one task — a 40 TB 'en' stratum is one partition. Instead the hash
    is pre-bucketed: rank = prefix-offset(stratum, bucket) +
    row_number within (stratum, bucket), where the offsets come from a
    (|strata| × n_buckets)-row count table — KB-sized, broadcast — and
    the heavy window partitions by (stratum, bucket), giving n_buckets-way
    parallelism per stratum. The resulting rank equals a single-window
    ranking ordered by (bucket, hash, id), which is exactly what the
    oracle SQL computes.

    NULL strata form their own stratum (matching SQL PARTITION BY
    semantics): grouping and the offsets join run on a null-safe
    two-column key (is-null flag + coalesced value), so no document is
    ever dropped and no sentinel value can collide with real data."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    base = df.select(
        F.col(id_col),
        F.col(strat_col).alias("stratum"),
        F.col(strat_col).isNull().alias("__snull"),
        F.coalesce(F.col(strat_col).cast("string"), F.lit("")).alias("__sk"),
        h.alias("__h"),
        (h % n_buckets).alias("__b"),
    )
    skey = ["__snull", "__sk"]
    cnts = base.groupBy(*skey, "__b").agg(F.count("*").alias("__c"))
    w_off = (
        Window.partitionBy(*skey)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*skey)
    offs = cnts.select(
        *skey,
        "__b",
        (F.sum("__c").over(w_off) - F.col("__c")).alias("__off"),
        F.sum("__c").over(w_tot).cast("long").alias("__n"),
    )
    w_in = Window.partitionBy(*skey, "__b").orderBy(
        F.asc("__h"), F.asc(id_col)
    )
    t1 = F.floor(F.col("__n") * F.lit(float(train_frac)))
    t2 = F.floor(F.col("__n") * F.lit(float(train_frac + val_frac)))
    ranked = base.join(F.broadcast(offs), [*skey, "__b"]).select(
        id_col,
        "stratum",
        (F.col("__off") + F.row_number().over(w_in)).alias("__rn"),
        t1.alias("__t1"),
        t2.alias("__t2"),
    )
    return ranked.select(
        id_col,
        "stratum",
        F.when(F.col("__rn") <= F.col("__t1"), F.lit("train"))
        .when(F.col("__rn") <= F.col("__t2"), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def sql_stratified_split(
    table: str = "documents",
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    seed: int = 42,
) -> str:
    f1 = repr(float(train_frac))
    f2 = repr(float(train_frac + val_frac))
    return f"""
        WITH h AS (
            SELECT {id_col}, {strat_col} AS stratum,
                   ('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT AS h
            FROM {table}
        ),
        r AS (
            SELECT {id_col}, stratum,
                   ROW_NUMBER() OVER (
                       PARTITION BY stratum
                       ORDER BY h % {n_buckets}, h, {id_col}
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY stratum) AS n_s
            FROM h
        )
        SELECT {id_col}, stratum,
               CASE WHEN rn <= FLOOR(n_s * CAST({f1} AS DOUBLE)) THEN 'train'
                    WHEN rn <= FLOOR(n_s * CAST({f2} AS DOUBLE)) THEN 'val'
                    ELSE 'test' END AS split
        FROM r
    """


# --------------------------------------------------------------------- #
# Inverted-index (postings) store: write once, serve queries by reading
# only the term-bucket partitions the query touches.
# --------------------------------------------------------------------- #


def write_postings_store(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    applied_tags: "tuple[str, ...]" = (),
) -> None:
    """Build the persisted inverted index: one parquet row per
    (term, doc, tf) with the doc length inlined, hive-partitioned by
    term-hash bucket so a query's scan prunes to |query terms| buckets
    (the multiget-routes-to-partitions pattern, reference
    IndexedRDD.scala:79-94, with directories standing in for the
    partitionsRDD). ``meta.json`` pins corpus stats and the bucket
    count (mixing bucketizations would silently mis-prune); it is
    written LAST, atomically, so its existence is the store's commit
    marker. ``applied_tags`` seeds the replay ledger in that same
    atomic write — the streaming twin passes its first batch_id here
    so a crash between data and ledger can never double-apply.

    Beside the postings the build writes a ``doclen/`` sidecar — one
    (doc_id, dl) row per document. Postings rows can't stand in for
    it: a doc's rows scatter across every term bucket (finding one
    doc's dl would scan the index) and a token-less doc has NO
    postings row yet counts toward n_docs/avgdl. The sidecar is what
    lets :func:`delete_postings_docs` compute exact corpus-stat deltas
    per takedown batch by reading ~2 narrow columns instead of
    rescanning text, and it is manifest-tracked (``dl_manifests``)
    under the same atomic meta commit so a crashed append's stray
    doclen files can never leak into a later delete's delta
    arithmetic. Layout: FLAT parquet, shuffled + sorted by an id-hash
    ``dbucket`` column — row-group min/max stats then prune targeted
    deletes, without paying the per-directory commit ceremony a
    hive-partitioned layout costs on every build (measured 5x the
    whole build time at 256 dirs); file count follows
    spark.sql.shuffle.partitions, so it scales with cluster config."""
    dt = _doc_terms(df, text_col, id_col)
    tf = dt.groupBy(id_col, "dl", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    postings = tf.withColumn("bucket", F.pmod(F.xxhash64("term"), n_buckets))
    doclen = (
        df.select(
            F.col(id_col),
            F.size(tokens(F.col(text_col))).cast("long").alias("dl"),
        )
        .withColumn("dbucket", F.pmod(F.xxhash64(id_col), n_buckets))
        .cache()  # one tokenize pass feeds both the stats and the write
    )
    stats = doclen.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    # retract (rebuild case) -> data -> atomic meta commit: a crash at
    # any point leaves the store clearly uncommitted, never the OLD
    # meta standing over half-overwritten postings; the re-run's
    # overwrite-mode build is idempotent (store_commit docstring)
    from spark_indexedrdd_spark.functions import store_commit as SC

    SC.retract_meta(path)
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        path + "/postings"
    )
    doclen.repartition("dbucket").sortWithinPartitions("dbucket").write.mode(
        "overwrite"
    ).parquet(path + "/doclen")
    doclen.unpersist()
    SC.write_manifest(
        path, "base", SC.list_parquet_files(path + "/postings")
    )
    SC.write_manifest(
        path, "dl-base", SC.list_parquet_files(path + "/doclen")
    )
    SC.commit_meta(
        path,
        {
            "n_docs": int(stats["n"] or 0),
            "total_dl": int(stats["s"] or 0),
            "n_buckets": int(n_buckets),
            "id_col": id_col,
            "applied": [str(t) for t in applied_tags],
            "manifests": ["base"],
            "dl_manifests": ["dl-base"],
            # identity of THIS build: postings_changes refuses an
            # interval that crosses a rebuild (ledgers reset)
            "build_token": os.urandom(8).hex(),
        },
    )


def append_postings_batch(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_tag: "str | None" = None,
) -> bool:
    """Fold an ingest batch into the postings store: append the batch's
    (term, doc, tf, dl) rows under the store's pinned bucketization and
    fold the batch's doc count / token total into ``meta.json``.
    Returns False (no-op) when ``batch_tag`` was already applied — the
    replay guard the streaming twin rides (postings rows are NOT
    additive like the n-gram count store's: a replayed batch would
    double every df(term) the serve path derives). Single-writer, like
    the versioned store's manifest. Batches must be doc-disjoint — the
    store keys postings by (term, doc) uniqueness, same contract as
    the signature store.

    Crash safety (with a ``batch_tag``): the batch is staged into
    ``_staging/<tag>`` first, its files are then moved into the bucket
    directories under deterministic ``batch-<tag>-*`` names, and ONLY
    then does the atomic meta rewrite record the tag — the meta
    rewrite is the commit point. A crash anywhere before it leaves the
    tag unrecorded, and the replay first deletes any half-moved
    ``batch-<tag>-*`` files before re-applying, so re-delivery of an
    uncommitted batch is exact, not just at-least-once. Without a tag
    the append is direct (non-replayable; callers own dedup).

    The commit point fences readers too (manifest-pointer commit):
    each batch's file list is recorded in ``_manifests/<tag>.json``
    and the atomic meta rewrite is what makes that manifest visible —
    ``bm25_from_store`` resolves the file list AND the corpus stats
    from one meta read, so a concurrent reader in the
    publish-to-commit window still serves exactly the pre-batch store
    (files no committed manifest names are invisible; snapshot
    isolation pinned in tests/test_retrieval.py)."""
    from spark_indexedrdd_spark.functions import store_commit as _SC

    if batch_tag is not None:
        _SC.validate_batch_tag(batch_tag)
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    applied = meta.setdefault("applied", [])
    if _SC.tag_is_applied(meta, batch_tag):
        # committed already (exact entry or its checkpoint namespace's
        # folded watermark); clear any staging left by a crash after
        # the commit point but before cleanup
        _cleanup_staging(path, batch_tag)
        return False
    if batch_tag is not None:
        # Collision/namespace refusal BEFORE the tag's replay sweep
        # runs: sweeping first would delete live batch-<tag>-* files
        # when the tag names a COMMITTED manifest (e.g. a user tag
        # 'optimize-1' after an optimize). Reserved prefixes keep the
        # internal namespaces (doclen manifests, anon appends, the
        # optimizer's deterministic tags) un-collidable; the retired
        # ledger covers names an optimize removed from the live lists
        # while older servable snapshots still reference their
        # manifest files (vacuum prunes it as those files go).
        _SC.refuse_manifest_collision(
            meta, batch_tag,
            reserved=("dl-",) + _SC.COMMON_RESERVED_PREFIXES,
        )
    # Delete-wins until compaction: ids currently tombstoned are
    # EXCLUDED from the batch before stats are computed. Without this
    # a re-ingested deleted doc would add to n_docs/total_dl while the
    # serve path's tombstone anti-join hides its postings — every BM25
    # score would drift from a survivor rebuild (the exactness
    # contract). To genuinely re-add a deleted id, compact first.
    prior_tomb = _postings_tombstones(df.sparkSession, path, meta)
    if prior_tomb is not None:
        df = df.join(F.broadcast(prior_tomb), id_col, "left_anti")
    dt = _doc_terms(df, text_col, id_col)
    tf = dt.groupBy(id_col, "dl", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    batch = tf.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), meta["n_buckets"])
    )
    doclen = (
        df.select(
            F.col(id_col),
            F.size(tokens(F.col(text_col))).cast("long").alias("dl"),
        )
        .withColumn("dbucket", F.pmod(F.xxhash64(id_col), meta["n_buckets"]))
        .cache()  # one tokenize pass feeds both the stats and the write
    )
    stats = doclen.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    from spark_indexedrdd_spark.functions import store_commit as SC

    manifests = meta.get("manifests")
    if manifests is None:
        # store written before the manifest-pointer commit existed:
        # backfill 'base' from the pre-append listing (single-writer,
        # so everything on disk right now IS the committed store).
        # Sweep THIS tag's published files first: a tagged append that
        # crashed between publish and commit left batch-<tag>-* files
        # on disk, and listing them into 'base' would count them twice
        # once the deterministic republish puts the same names into
        # the tag's own manifest — doubled tf rows and df(term), wrong
        # scores (committed files never match the swept names: other
        # tags' files carry their own tag, base-build files carry
        # Spark part-* names).
        if batch_tag is not None:
            _sweep_batch_files(path, batch_tag)
        SC.write_manifest(
            path, "base", SC.list_parquet_files(path + "/postings")
        )
        manifests = meta["manifests"] = ["base"]
        # re-run the refusal now that the backfilled name exists: a
        # tag like 'base' passed the early check on the empty legacy
        # lists and would otherwise reach the late belt-and-braces
        # only AFTER its files were published into live bucket dirs —
        # visible to legacy directory-listing readers and swept into
        # the NEXT append's backfill (r11 review finding)
        if batch_tag is not None:
            _SC.refuse_manifest_collision(
                meta, batch_tag,
                reserved=("dl-",) + _SC.COMMON_RESERVED_PREFIXES,
            )
    if batch_tag is None:
        pre = set(SC.list_parquet_files(path + "/postings"))
        batch.write.mode("append").partitionBy("bucket").parquet(
            path + "/postings"
        )
        new_files = sorted(
            set(SC.list_parquet_files(path + "/postings")) - pre
        )
        mname = f"anon-{len(manifests):05d}"
        while mname in manifests or mname in set(
            meta.get("retired_manifests", [])
        ):
            mname += "x"
    else:
        stage = os.path.join(path, "_staging", batch_tag)
        batch.write.mode("overwrite").partitionBy("bucket").parquet(stage)
        _sweep_batch_files(path, batch_tag)  # undo any half-moved replay
        new_files = _publish_staged(path, stage, batch_tag)
        mname = batch_tag
    if (
        mname in manifests
        or mname in set(meta.get("retired_manifests", []))
        or mname.startswith("dl-")
        or ("dl-" + mname) in meta.get("dl_manifests", [])
    ):
        # belt-and-braces re-check of the early refusal above: a tag
        # colliding with a committed or retired manifest name would
        # silently overwrite that manifest's file list
        raise ValueError(f"batch_tag {mname!r} collides with a manifest")
    SC.write_manifest(path, mname, new_files)
    dl_manifests = meta.get("dl_manifests")
    if dl_manifests is not None:
        # doclen sidecar append: append-mode files under random names
        # are fine here — the dl manifest (committed in the same meta
        # write below) is what a delete's delta scan resolves, so a
        # crashed append's stray doclen files are dead bytes, never
        # phantom documents in later stat arithmetic (compaction
        # rewrites the sidecar and clears them)
        pre_dl = set(SC.list_parquet_files(path + "/doclen"))
        # no shuffle for a batch-sized sidecar append: the delta scan
        # reads the sidecar flat, and compaction restores the sorted
        # layout when file count warrants it
        doclen.write.mode("append").parquet(path + "/doclen")
        doclen.unpersist()
        new_dl = sorted(
            set(SC.list_parquet_files(path + "/doclen")) - pre_dl
        )
        SC.write_manifest(path, "dl-" + mname, new_dl)
        dl_manifests.append("dl-" + mname)
    else:
        doclen.unpersist()  # legacy store: stats only, no sidecar
    meta["n_docs"] = int(meta["n_docs"]) + int(stats["n"] or 0)
    meta["total_dl"] = int(meta["total_dl"]) + int(stats["s"] or 0)
    manifests.append(mname)
    if batch_tag is not None:
        applied.append(batch_tag)
    SC.commit_meta(path, meta)  # <-- commit point
    if batch_tag is not None:
        _cleanup_staging(path, batch_tag)
    return True


def _resolve_committed_files(path: str, meta: dict) -> "list[str] | None":
    """Committed postings files (relative), or None ONLY for a legacy
    store with no manifest pointer (reader then lists the directory and
    accepts the legacy publish-to-commit window). A committed EMPTY
    list stays ``[]`` — coercing it to None would silently hand an
    empty store's readers the directory listing, where a concurrent
    append's published-but-uncommitted files are visible (snapshot
    isolation lost exactly when the store is empty)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    return SC.resolve_manifest_files(path, meta)


def _empty_bm25_result(spark, path: str, meta: dict, id_col: str) -> DataFrame:
    """The typed zero-row frame ``bm25_from_store`` serves when the
    store has no live documents (committed-empty, or every doc
    tombstoned). The id type comes from the store's own files where
    any are readable; a store with no data files at all defaults to
    long (the build default)."""
    from pyspark.sql import types as T

    id_type: "T.DataType" = T.LongType()
    for sub in ("doclen", "postings"):
        try:
            id_type = (
                spark.read.parquet(os.path.join(path, sub))
                .schema[id_col]
                .dataType
            )
            break
        except Exception:
            continue
    schema = T.StructType(
        [
            T.StructField("qid", T.IntegerType()),
            T.StructField(id_col, id_type),
            T.StructField("score", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    return spark.createDataFrame([], schema)


def _bucket_of(rel_path: str) -> int:
    """bucket id from a manifest-relative path 'bucket=N/file.parquet'."""
    head = rel_path.split("/", 1)[0]
    return int(head.split("=", 1)[1])


def _sweep_batch_files(path: str, batch_tag: str) -> None:
    """Delete exactly this tag's ``batch-<tag>-NNNNN.parquet`` files
    under postings/ — the undo step that makes re-publishing a crashed
    (uncommitted) batch exact (shared partitioned-layout protocol,
    store_commit.sweep_tagged_partitioned)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    SC.sweep_tagged_partitioned(os.path.join(path, "postings"), batch_tag)


def _publish_staged(path: str, stage: str, batch_tag: str) -> "list[str]":
    """Move staged parquet files into the live bucket directories under
    deterministic names; returns the published paths (relative to
    postings/) for the batch's manifest (shared partitioned-layout
    protocol, store_commit.publish_staged_partitioned — the moves alone
    publish NOTHING to readers; only the subsequent meta commit naming
    the manifest does)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    return SC.publish_staged_partitioned(
        stage, os.path.join(path, "postings"), batch_tag
    )


def _cleanup_staging(path: str, batch_tag: str) -> None:
    import shutil

    stage = os.path.join(path, "_staging", batch_tag)
    if os.path.isdir(stage):
        shutil.rmtree(stage, ignore_errors=True)


# --------------------------------------------------------------------- #
# Takedown deletes on the postings store — the reference's `delete(ks)`
# (IndexedRDD.scala:120-123) carried onto the inverted index, the shape
# a GDPR/copyright removal needs at 100 TB: a delete must not rewrite
# the index (a doc's postings scatter across every term bucket), so it
# is a tombstone append + atomic meta commit, with BM25 staying EXACT
# over the survivors — df(term) is recomputed from tombstone-filtered
# postings at serve time, and n_docs/avgdl carry per-batch deltas
# computed from the doclen sidecar. Contrast Lucene, whose docFreq
# stays stale until segment merge; the sidecar is what buys exactness
# here without a rescan.
# --------------------------------------------------------------------- #


def _resolve_doclen(spark, path: str, meta: dict) -> "DataFrame | None":
    """The committed doclen sidecar under ONE meta snapshot, or None
    for a store built before the sidecar existed."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    names = meta.get("dl_manifests")
    if names is None:
        return None
    rel = SC.resolve_manifest_files(path, {"manifests": names})
    return spark.read.option("basePath", path + "/doclen").parquet(
        *[os.path.join(path, "doclen", f) for f in rel]
    )


def _postings_tombstones(spark, path: str, meta: dict) -> "DataFrame | None":
    """Union of the committed tombstone batches (distinct doc ids), or
    None when the store has no applied deletes."""
    tags = meta.get("deletes", [])
    if not tags:
        return None
    return (
        spark.read.parquet(
            *[os.path.join(path, "tombstones", t) for t in tags]
        )
        .select(meta["id_col"])
        .distinct()
    )


def delete_postings_docs(
    spark: SparkSession,
    path: str,
    ids,
    batch_tag: str,
) -> bool:
    """Tombstone-delete documents from the postings store by id.
    Returns False (replay no-op) when ``batch_tag`` was already
    applied.

    Exactness: the commit records, under the SAME atomic meta rewrite
    that publishes the tombstone batch, the deleted docs' exact count
    and token total — computed by joining the ids against the doclen
    sidecar (pruned, narrow; never the text or the index). Ids already
    tombstoned by an earlier batch are excluded from the deltas
    (double-delete never double-subtracts) and ids absent from the
    store are dropped entirely (delete-then-append of a fresh doc id
    is an append — a tombstone only ever names a doc that was IN the
    store when the delete committed). ``bm25_from_store`` then serves
    scores bit-identical to an index rebuilt over the survivors.

    Crash/replay: tombstone parquet lands first (invisible — readers
    resolve tombstones from the tags a committed meta names), the meta
    rewrite is the commit point, and a replay recomputes the same
    batch against the same committed state and overwrites the same
    dir, so re-delivery is exact. Single-writer, like every
    meta-rewriting path on this store."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    SC.validate_batch_tag(batch_tag)
    meta = SC.read_meta(path)
    if batch_tag in meta.get("deletes", []):
        return False
    id_col = meta["id_col"]
    dl = _resolve_doclen(spark, path, meta)
    if dl is None:
        raise ValueError(
            f"store at {path!r} predates the doclen sidecar; rebuild "
            "with write_postings_store to enable deletes"
        )
    # shared typed-id normalization (store_commit): empty batches are
    # typed no-ops (the tag still commits — deltas zero), uncastable
    # ids refuse loudly before the semi-join could silently miss
    doomed = SC.normalize_tombstone_ids(
        spark, ids, id_col, dl.schema[id_col].dataType
    ).distinct()
    # deltas over docs that are (a) actually in the store and (b) not
    # already dead — the doclen semi-join supplies both dl and (a);
    # the anti-join against committed tombstones supplies (b)
    doomed_live = dl.select(id_col, "dl").join(doomed, id_col, "left_semi")
    prior = _postings_tombstones(spark, path, meta)
    if prior is not None:
        doomed_live = doomed_live.join(prior, id_col, "left_anti")
    doomed_live = doomed_live.transform(truncate_lineage)
    delta = doomed_live.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    doomed_live.select(id_col).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "tombstones", batch_tag)
    )
    meta.setdefault("deletes", []).append(batch_tag)
    meta["n_docs_deleted"] = int(meta.get("n_docs_deleted", 0)) + int(
        delta["n"] or 0
    )
    meta["total_dl_deleted"] = int(meta.get("total_dl_deleted", 0)) + int(
        delta["s"] or 0
    )
    SC.commit_meta(path, meta)  # <-- commit point
    return True


def postings_changes(
    spark: SparkSession, path: str, v_from: int, v_to: int
) -> DataFrame:
    """Doc-level CDC between two committed versions of the postings
    store: (id_col, change) with change ∈ {'added', 'deleted'} — the
    reference's ``diff`` changed-rows detector (IndexedRDD.scala:
    218-227) generalized across the at-rest version ledger, the same
    contract as ``VersionedKVStore.changes``.

    O(delta), never O(store): the added set comes from the doclen
    sidecar batches committed in the interval (narrow id+dl rows), the
    deleted set from the tombstone tags committed in the interval —
    the postings themselves are never read. A doc added AND deleted
    inside the interval nets out (it was live at neither endpoint);
    delete-wins appends + prior-tombstone anti-joins guarantee the
    delta sets are otherwise disjoint from both endpoints' live sets.
    Raises when a compaction/rebuild crossed the interval (it resets
    both ledgers, so deltas are no longer comparable).

    ONE copy of the delta state machine: this delegates to
    ``store_commit.store_changes`` (the r11 vector-tier CDC) over the
    doclen sidecar's manifest list — a protocol fix lands on every
    family at once. A version predating the sidecar refuses with the
    same predates-the-pointer message the other tiers use."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    m_to = SC.read_meta_version(path, max(int(v_from), int(v_to)))
    return SC.store_changes(
        spark,
        path,
        v_from,
        v_to,
        "dl_manifests",
        "doclen",
        id_col=m_to.get("id_col", "doc_id"),
    )


def optimize_postings_store(spark: SparkSession, path: str) -> int:
    """Snapshot-PRESERVING compaction (the Delta OPTIMIZE half of the
    OPTIMIZE/VACUUM pair; :func:`compact_postings_store` is the
    destructive rebuild, ``store_commit.vacuum_store`` the retention
    reclaim): physically fold the tombstones and re-merge the
    append-accumulated small files into ONE fresh file set, published
    through the ordinary manifest-pointer commit — the old versions'
    files are NOT touched, so every earlier snapshot keeps serving
    byte-identically and the servability floor does not move. Returns
    the live doc count.

    Mechanics: survivors (committed files, tombstone-anti-joined,
    pinned bucketization — never re-hashed) stage under the store's
    own staging protocol, publish under deterministic
    ``batch-<tag>-*`` names (a crashed re-run sweeps its own names
    first, the append discipline), and ONE atomic meta commit swings
    ``manifests``/``dl_manifests`` to the compacted set, zeroes the
    delete ledger and folds the stat deltas. Crash anywhere before
    the commit leaves published-but-unreferenced files — invisible to
    every reader, reclaimed by ``vacuum_store``, and the re-run is
    exact. A concurrent writer's commit between the read and this
    commit raises ``ConcurrentWriteConflict`` BEFORE anything is
    referenced (nothing was destroyed — re-run against the winner).

    The space cost is the point: old file sets stay on disk for the
    as-of surface until a later ``vacuum_store(keep_versions=N)``
    advances the floor past the pre-OPTIMIZE versions and reclaims
    them (files, manifests AND the tombstone dirs the retained metas
    no longer name). ``postings_changes`` across the boundary refuses
    by design (the delete/manifest ledgers reset even though the LIVE
    set is unchanged — the compactions counter makes that loud).

    Requires a manifested store (every post-r9 build); refuses loudly
    on a legacy directory-listing store, where "unreferenced" is not
    well-defined."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    id_col = meta["id_col"]
    tomb = _postings_tombstones(spark, path, meta)
    n_live = int(meta["n_docs"]) - int(meta.get("n_docs_deleted", 0))
    rel = _resolve_committed_files(path, meta)
    if rel is None or meta.get("dl_manifests") is None:
        # a manifest-backfilled legacy store can carry postings
        # manifests while the doclen sidecar predates manifests —
        # refuse loudly either way rather than dying on a None
        # sidecar mid-rewrite
        raise ValueError(
            "optimize_postings_store requires a manifest-pointer store "
            "(postings AND doclen sidecar manifests); this store "
            "predates them — rebuild it first"
        )
    # deterministic, collision-free tag (shared protocol helper): a
    # crashed attempt's re-run reuses the SAME tag (sweep-exact)
    tag = SC.derive_optimize_tag(meta)
    post = spark.read.option("basePath", path + "/postings").parquet(
        *[os.path.join(path, "postings", f) for f in rel]
    )
    dl = _resolve_doclen(spark, path, meta)
    if tomb is not None:
        post = post.join(F.broadcast(tomb), id_col, "left_anti")
        dl = dl.join(F.broadcast(tomb), id_col, "left_anti")
    stage = os.path.join(path, "_staging", tag)
    _cleanup_staging(path, tag)
    post.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(stage, "postings"))
    dl.repartition("dbucket").sortWithinPartitions("dbucket").write.mode(
        "overwrite"
    ).parquet(os.path.join(stage, "doclen"))
    # publish (invisible until the meta commit) — sweep this tag's
    # names first so a crashed prior attempt's strays can't survive a
    # re-run that produces fewer files
    _sweep_batch_files(path, tag)
    SC.sweep_tagged_files(os.path.join(path, "doclen"), tag)
    new_post = _publish_staged(path, os.path.join(stage, "postings"), tag)
    new_dl = SC.publish_staged_flat(
        os.path.join(stage, "doclen"), os.path.join(path, "doclen"), tag
    )
    SC.write_manifest(path, tag, new_post)
    SC.write_manifest(path, "dl-" + tag, new_dl)
    # the replaced names leave the live lists but their manifest FILES
    # stay (older snapshots resolve them) — record them so no future
    # append tag can reuse a name a servable version still references
    # (vacuum prunes this ledger as it reclaims the files)
    meta["retired_manifests"] = sorted(
        set(meta.get("retired_manifests", []))
        | set(meta.get("manifests", []))
        | set(meta.get("dl_manifests", []))
    )
    meta["manifests"] = [tag]
    meta["dl_manifests"] = ["dl-" + tag]
    meta["n_docs"] = n_live
    meta["total_dl"] = int(meta["total_dl"]) - int(
        meta.get("total_dl_deleted", 0)
    )
    meta.pop("n_docs_deleted", None)
    meta.pop("total_dl_deleted", None)
    meta["deletes"] = []
    meta["compactions"] = int(meta.get("compactions", 0)) + 1
    SC.commit_meta(path, meta)  # <-- commit point; floor does NOT move
    _cleanup_staging(path, tag)
    return n_live


def compact_postings_store(spark: SparkSession, path: str) -> int:
    """Physically drop tombstoned docs' postings and doclen rows and
    clear the tombstone list; returns the live doc count.

    Rebuild-class by design (delete_postings_docs docstring — the
    Delta VACUUM/OPTIMIZE economics; prefer
    :func:`optimize_postings_store` when the as-of surface must
    survive): survivors keep their pinned
    bucketization (never re-hashed) and the append-accumulated small
    files re-merge. The rewrite lands in a SIBLING directory read from
    the old committed files — never a checkpoint of data whose
    directory is about to be overwritten, so the old store stays fully
    durable until the swap, and partitionOverwriteMode=dynamic can
    never leave an all-dead bucket's stale files behind (the sibling
    starts empty; with in-place overwrite those files would even be
    re-listed into the new base manifest while n_docs excluded them).
    The swap is retract → dir renames → commit: a crash before it
    leaves the old store committed and untouched; inside it, loudly
    uncommitted with the compacted copy recoverable on disk."""
    import shutil

    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    id_col = meta["id_col"]
    tomb = _postings_tombstones(spark, path, meta)
    n_live = int(meta["n_docs"]) - int(meta.get("n_docs_deleted", 0))
    if tomb is None:
        return n_live
    rel = _resolve_committed_files(path, meta)
    if rel is None:
        # pre-manifest store: deletes require the doclen sidecar, which
        # every manifested build writes, so this arm is belt-and-braces
        post = spark.read.parquet(path + "/postings")
    else:
        post = spark.read.option("basePath", path + "/postings").parquet(
            *[os.path.join(path, "postings", f) for f in rel]
        )
    dl = _resolve_doclen(spark, path, meta)
    tmp = path + "__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    post.join(F.broadcast(tomb), id_col, "left_anti").repartition(
        "bucket"
    ).write.mode("overwrite").partitionBy("bucket").parquet(tmp + "/postings")
    dl.join(F.broadcast(tomb), id_col, "left_anti").repartition(
        "dbucket"
    ).sortWithinPartitions("dbucket").write.mode("overwrite").parquet(
        tmp + "/doclen"
    )
    SC.recheck_version(path, meta)  # abort BEFORE the destructive swap
    SC.retract_meta(path)  # <-- old store now loudly uncommitted
    for sub in ("postings", "doclen", "_manifests"):
        shutil.rmtree(os.path.join(path, sub), ignore_errors=True)
    for sub in ("postings", "doclen"):
        os.replace(os.path.join(tmp, sub), os.path.join(path, sub))
    shutil.rmtree(os.path.join(path, "tombstones"), ignore_errors=True)
    SC.write_manifest(path, "base", SC.list_parquet_files(path + "/postings"))
    SC.write_manifest(path, "dl-base", SC.list_parquet_files(path + "/doclen"))
    meta["n_docs"] = n_live
    meta["total_dl"] = int(meta["total_dl"]) - int(
        meta.get("total_dl_deleted", 0)
    )
    meta.pop("n_docs_deleted", None)
    meta.pop("total_dl_deleted", None)
    meta["deletes"] = []
    meta["manifests"] = ["base"]
    meta["dl_manifests"] = ["dl-base"]
    # the destructive swap removed every old manifest FILE, so the
    # retired-name collision ledger has nothing left to protect
    meta.pop("retired_manifests", None)
    meta["compactions"] = int(meta.get("compactions", 0)) + 1
    SC.commit_meta(path, meta, rewrite=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return n_live


from spark_indexedrdd_spark.functions.store_commit import (  # noqa: E402
    StreamTagMixin as _StreamTagMixin,
)


class StreamingPostingsStore(_StreamTagMixin):
    """foreachBatch ingest for the inverted index — the store-family
    streaming twin (signatures, IVF, sketches, top-m, counts, SCD2,
    postings). First non-empty batch initializes — its batch_id goes
    into meta.json's replay ledger in the SAME atomic write that
    commits the store, so a crash mid-init re-runs the (idempotent,
    overwrite-mode) build rather than double-applying batch 0; later
    batches append with the batch_id as the replay tag via the staged
    commit protocol, so at-least-once re-delivery of a committed batch
    is a true no-op (exactness pinned in tests/test_retrieval.py).
    ``optimize_every=N`` folds the manifest list with the
    snapshot-preserving OPTIMIZE whenever it reaches N entries —
    bounded file counts under continuous ingest without breaking the
    as-of surface. ``vacuum_every=M`` (r12) closes the remaining
    unbounded axis: once the per-commit ledger reaches M files, the
    writer runs retention + ledger checkpoint in its own foreachBatch
    turn (single-writer contract preserved — the ingest IS the
    maintenance writer), keeping ``keep_versions`` servable snapshots
    and folding everything older into the checkpoint pair. With
    ``pin_tag_dir`` the pass routes through
    ``snapshots.vacuum_respecting_pins``, so scheduled retention under
    live ingest can never reclaim a training run's pinned snapshot. A
    store configured with both cadences is fully self-maintaining:
    bounded data files, bounded ledger, pin-safe — no operator job."""

    def __init__(
        self,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_buckets: int = 256,
        optimize_every: "int | None" = None,
        vacuum_every: "int | None" = None,
        keep_versions: int = 8,
        pin_tag_dir: "str | None" = None,
    ):
        self.path = path
        self.text_col = text_col
        self.id_col = id_col
        self.n_buckets = n_buckets
        # optimize_every: run the snapshot-preserving OPTIMIZE once the
        # manifest list reaches this many entries (the VersionedKVStore
        # compact_every cadence, at-rest) — a year of micro-batches
        # otherwise turns every serve's file resolution into a
        # listing problem long before a data problem. Snapshot-
        # preserving, so as-of reads of earlier batches keep working
        # until a vacuum passes them.
        self.optimize_every = optimize_every
        # vacuum cadence semantics (threshold validation, the
        # full-interval re-arm that keeps a held pin from turning
        # ingest into a scan-per-batch loop, pin routing) live in ONE
        # place shared by every streaming store tier:
        # snapshots.LedgerVacuumCadence.
        self.vacuum_every = vacuum_every
        self.keep_versions = keep_versions
        self.pin_tag_dir = pin_tag_dir
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
        # replay tags namespaced by the checkpoint's query id (r14 —
        # StreamTagMixin): a FRESH checkpoint's batch 0 must land, not
        # no-op against another run's committed "0"; a PRE-namespace
        # run's redelivered id stays a no-op via the legacy guard
        tag = self._stream_tag(str(batch_id))
        if self._legacy_applied(self.path, str(batch_id)):
            return
        if not self._initialized:
            write_postings_store(
                batch_df, self.path, self.text_col, self.id_col,
                self.n_buckets, applied_tags=(tag,),
            )
            self._initialized = True
        else:
            append_postings_batch(
                batch_df, self.path, self.text_col, self.id_col,
                batch_tag=tag,
            )
        if self.optimize_every:
            from spark_indexedrdd_spark.functions import store_commit as _SC

            n_manifests = len(_SC.read_meta(self.path).get("manifests", []))
            if n_manifests >= int(self.optimize_every):
                optimize_postings_store(batch_df.sparkSession, self.path)
        if self._vacuum is not None:
            self._vacuum.maybe_vacuum()

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        return self._start_stream(
            stream_df, checkpoint_dir, "update", **trigger_kwargs
        )


def bm25_from_store(
    spark: SparkSession,
    path: str,
    queries: "tuple[tuple[int, str], ...]" = DEFAULT_BM25_QUERIES,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    version: "int | None" = None,
) -> DataFrame:
    """Serve BM25 from the persisted postings store: identical scores to
    in-plan :func:`bm25_topk` over the same corpus (pytest-pinned), but
    the scan reads only the query terms' bucket directories — serve
    cost ∝ matched postings, independent of corpus size. df(term) is
    recovered exactly as the pruned postings' per-term row count (the
    store holds every (term, doc) pair).

    ``version`` serves the store AS OF an earlier committed meta
    (store_commit's monotonic version ledger): the snapshot's
    manifests, corpus stats AND tombstone set all come from that one
    frozen meta, so the scores equal what the latest-version serve
    returned the moment that version was the frontier — appends and
    takedowns committed later are invisible. Snapshots stay readable
    until compaction/rebuild rewrites the data directories
    (read_meta_version docstring)."""
    qt = _query_terms(queries)
    scored, id_col, _meta, empty = _bm25_store_scored(
        spark, path, [(q, t, None) for q, t in qt], k1, b, version
    )
    if empty is not None:
        return empty
    agg = scored.groupBy("qid", id_col).agg(
        F.sum("s9").cast("long").alias("score9")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score9"), F.asc(id_col))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").cast("int"),
            F.col(id_col),
            F.round(F.col("score9") / F.lit(_SCALE), 9).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _bm25_store_scored(
    spark: SparkSession,
    path: str,
    qrows: "list[tuple[int, str, int | None]]",
    k1: float,
    b: float,
    version: "int | None",
):
    """Per-(query-term, doc) fixed-point BM25 contributions from the
    PRUNED store scan: (scored_df with columns qid/<id_col>/w6/s9,
    id_col, meta, empty_result_or_None). Shared by the plain serve and
    the RM3-expanded serve — ``qrows`` is (qid, term, w6) where w6 is
    NULL for original (unweighted) terms. All snapshot/tombstone/
    bucket-pruning semantics documented on :func:`bm25_from_store`
    live here."""
    from spark_indexedrdd_spark.functions import store_commit as _SC

    meta = _SC.resolve_serve_meta(path, version)
    id_col = meta["id_col"]
    terms = sorted({t for _, t, _w in qrows})
    q = local_rows_df(spark, qrows, "qid int, term string, w6 long")
    # bucket ids for the literal terms — computed through the same
    # xxhash64 expression the writer used, collected (≤ |terms| rows)
    # so the scan filter is literal and partition-pruning applies
    bkts = sorted(
        {
            r["b"]
            for r in local_rows_df(spark, [(t,) for t in terms], "term string")
            .select(F.pmod(F.xxhash64("term"), meta["n_buckets"]).alias("b"))
            .collect()
        }
    )
    # manifest-pointer snapshot: the file list comes from the SAME meta
    # read as n_docs/total_dl, so a concurrent append's published-but-
    # uncommitted files are invisible and scores are never computed
    # from mixed-commit state. Driver-side bucket pruning on the
    # manifest paths replaces (and subsumes) directory PartitionFilters
    # pruning; the bucket/term filters below stay for row-group skip.
    rel = _resolve_committed_files(path, meta)
    if rel is None:
        src = spark.read.parquet(path + "/postings")  # pre-manifest store
    elif not rel:
        # committed-empty store (zero documents ever written): nothing
        # can score — serve the typed empty result rather than falling
        # back to a directory listing (snapshot isolation) or handing
        # the reader an empty path list (scan error)
        return None, id_col, meta, _empty_bm25_result(
            spark, path, meta, id_col
        )
    else:
        bktset = set(int(b) for b in bkts)
        sel = [f for f in rel if _bucket_of(f) in bktset]
        # no selected bucket: read one committed file for its schema —
        # the bucket filter below still excludes every row of it
        files = sel or rel[:1]
        src = spark.read.option("basePath", path + "/postings").parquet(
            *[os.path.join(path, "postings", f) for f in files]
        )
    postings = src.where(
        F.col("bucket").isin(bkts) & F.col("term").isin(terms)
    )
    tf = postings.select(id_col, "dl", "term", "tf")
    # tombstoned docs (delete_postings_docs) drop out BEFORE df(term)
    # is counted, and the corpus stats carry the committed deltas from
    # the same meta snapshot — scores are bit-identical to an index
    # rebuilt over the survivors
    tomb = _postings_tombstones(spark, path, meta)
    if tomb is not None:
        # tombstone set is takedown-batch sized — broadcast, never a
        # shuffle of the matched postings (serve-latency path)
        tf = tf.join(F.broadcast(tomb), id_col, "left_anti")
    n_docs = int(meta["n_docs"]) - int(meta.get("n_docs_deleted", 0))
    total_dl = int(meta["total_dl"]) - int(meta.get("total_dl_deleted", 0))
    if n_docs <= 0:
        # a takedown deleted every document: avgdl is 0/0 (NULL — the
        # float() below would raise) and the tombstone anti-join hides
        # every candidate anyway — serve the typed empty result
        return None, id_col, meta, _empty_bm25_result(
            spark, path, meta, id_col
        )
    # plain COUNT(*) here, NOT _df_t: this tf is the pruned store SCAN
    # (not a shared aggregate subtree), so there is no exchange to
    # reuse — the two consumers each re-read the tiny bucket-pruned
    # parquet, which is the store's whole point
    dft = tf.groupBy("term").agg(F.count("*").cast("long").alias("df_t"))
    # rounded through Spark's ROUND (HALF_UP), not Python's round()
    # (HALF_EVEN) — in-plan bm25_topk pins avgdl with F.round, and a
    # .5-boundary 9th digit would silently shift every score otherwise;
    # _avgdl9 constant-folds instead of running the old range(1) job
    avgdl = _avgdl9(spark, total_dl, n_docs)
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(F.broadcast(q), "term")
        .withColumn("n_docs", F.lit(n_docs))
        .withColumn("avgdl", F.lit(float(avgdl)))
        .select("qid", id_col, "w6", _bm25_score9(k1, b).alias("s9"))
    )
    return scored, id_col, meta, None


def bm25_rm3_from_store(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    queries: "tuple[tuple[int, str], ...]" = DEFAULT_BM25_QUERIES,
    k: int = 10,
    k_fb: int = 5,
    m_expand: int = 5,
    alpha: float = 0.6,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    version: "int | None" = None,
) -> DataFrame:
    """RM3 served FROM the postings store: feedback retrieval AND the
    expanded re-score both read only the query/expansion terms' bucket
    directories (:func:`bm25_from_store` semantics — tombstones and
    ``version=`` as-of snapshots included); only the expansion-term
    selection touches text, and only for the q x k_fb feedback
    documents of ``docs`` (broadcast semi-join — the store is an
    inverted index, doc→terms needs the forward/text side).

    Contract: ``docs`` (the forward/text frame) must COVER the store's
    feedback documents — every id the feedback serve returns must
    resolve in ``docs``. An id that didn't would silently vanish in
    the expansion join, degrading RM3 toward plain BM25 with no
    signal, so the check below refuses loudly instead (r10 ADVICE).
    Cost: the feedback ids are collected once (q × k_fb rows — the
    serve's own bound) and probed with an ``isin`` literal filter the
    parquet scan prunes on; the serve itself is not re-executed.

    Parity (pytest-pinned): on a store built over ``docs`` this equals
    in-plan :func:`bm25_rm3_topk` — feedback, expansion and re-score
    each carry their own store≡in-plan contract, composed."""
    from pyspark.sql import types as T

    fb_served = bm25_from_store(
        spark, path, queries=queries, k=k_fb, k1=k1, b=b, version=version
    ).select("qid", id_col)
    fb_rows = fb_served.collect()
    fb = local_rows_df(
        spark,
        fb_rows,
        T.StructType(
            [fb_served.schema["qid"], fb_served.schema[id_col]]
        ),
    )
    fb_ids = sorted({r[1] for r in fb_rows})
    if fb_ids:
        resolved = {
            r[0]
            for r in docs.select(id_col)
            .where(F.col(id_col).isin(fb_ids))
            .distinct()
            .collect()
        }
        unresolved = [i for i in fb_ids if i not in resolved]
        if unresolved:
            raise ValueError(
                f"docs does not cover the store's feedback documents: "
                f"{len(unresolved)} of {len(fb_ids)} feedback ids missing "
                f"(first few: {unresolved[:5]}) — the forward frame must "
                "contain every document the store can serve as feedback"
            )
    exp_rows = _rm3_terms_for_feedback(
        docs, fb, queries, m_expand, text_col, id_col, fb_ids=fb_ids
    ).collect()
    tot: dict = {}
    for r in exp_rows:
        tot[r.qid] = tot.get(r.qid, 0) + r.rm9
    qt = _query_terms(queries)
    qrows = [(q, t, None) for q, t in qt] + [
        # same three-op IEEE sequence (multiply, divide, floor) as
        # bm25_rm3_topk's exp_w — see the op-order exactness note there
        (r.qid, r.term,
         int(math_floor(1_000_000.0 * r.rm9 / tot[r.qid])))
        for r in exp_rows
    ]
    alpha6 = int(math_floor(float(alpha) * 1_000_000.0))
    beta6 = 1_000_000 - alpha6
    scored, sid, _meta, empty = _bm25_store_scored(
        spark, path, qrows, k1, b, version
    )
    if empty is not None:
        return empty
    agg = scored.groupBy("qid", sid).agg(
        F.sum(F.when(F.col("w6").isNull(), F.col("s9")).otherwise(0))
        .cast("long")
        .alias("s9_orig"),
        F.sum(
            F.when(F.col("w6").isNotNull(), F.col("w6") * F.col("s9"))
            .otherwise(0)
        )
        .cast("long")
        .alias("exp_raw"),
    )
    final = agg.select(
        "qid",
        sid,
        (
            F.lit(alpha6) * F.col("s9_orig")
            + F.lit(beta6) * F.expr("exp_raw DIV 1000000")
        ).alias("final15"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("final15"), F.asc(sid))
    return (
        final.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").cast("int"),
            F.col(sid),
            F.round(F.col("final15") / F.lit(1e15), 9).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
