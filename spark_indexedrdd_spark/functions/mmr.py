"""MMR diversified re-rank (Carbonell & Goldstein 1998): greedy maximal
marginal relevance over an ANN candidate pool.

    mmr(d) = lambda * sim(q, d) - (1 - lambda) * max_{s in S} sim(d, s)

picked greedily k times (S = already-picked set, max over the empty set
defined as 0.0; ties break on cand_id). The standard diversification
pass between retrieval and consumption — dedups near-identical
neighbors out of a top-k, for RAG context packing or training-batch
variety.

Exactness: every similarity (query-candidate AND candidate-candidate)
is computed JVM-side with the repo's fold-exact ``cosine()`` — the same
sequential-fold arithmetic as ``vectors.sql_cosine`` — so the greedy
selection sees bit-identical doubles on both engines; the selection
arithmetic itself is ``lam*rel - (1-lam)*maxsim`` (two IEEE multiplies
and a subtract) plus MAX and comparisons, all exact. The DuckDB twin
:func:`sql_mmr_rerank` unrolls the k greedy steps as chained CTEs (the
repo's PageRank/GD oracle pattern — SURVEY.md determinism playbook).

Scale: the corpus-sized work is the candidate generation (any ANN tier;
the default here is the brute oracle tier, swap in ``ivf_ann``/stores at
scale). MMR itself touches q x n_candidates relevance rows and
q x n_candidates^2 pairwise rows — the RERANK WINDOW, never the corpus —
and runs one Arrow task per query group (cogrouped applyInPandas, pure
sequential selection inside). Diversification cost is independent of
corpus size by construction.

The reference has no similarity surface (SURVEY.md §2.5) — extension op.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LAMBDA = 0.5


def mmr_rerank(
    emb: DataFrame,
    query_ids: Iterable[int],
    k: int = 5,
    n_candidates: int = 20,
    lam: float = DEFAULT_LAMBDA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, cand_id, mmr_score, rank): rank = greedy pick order 1..k.

    Candidate pool = brute cosine top-``n_candidates`` (the oracle
    tier; at scale generate the pool with an ANN store serve and call
    :func:`mmr_over_candidates` — same selection, pool provenance
    swapped). See module docstring for arithmetic and scale notes."""
    from spark_indexedrdd_spark.functions.similarity import cosine_topk

    rel = cosine_topk(
        emb, query_ids, k=n_candidates, id_col=id_col, vec_col=vec_col
    ).select("q_id", "cand_id", F.col("cosine_sim").alias("rel_sim"))
    return mmr_over_candidates(
        rel, emb, k=k, lam=lam, id_col=id_col, vec_col=vec_col
    )


def mmr_over_candidates(
    rel: DataFrame,
    emb: DataFrame,
    k: int = 5,
    lam: float = DEFAULT_LAMBDA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR selection over an EXTERNAL candidate pool ``rel``
    (q_id, cand_id, rel_sim) — compose with any ANN tier (brute, IVF,
    store serves). Candidate-candidate sims are computed here with the
    fold-exact JVM cosine; the greedy pick runs in one Arrow task per
    query (cogrouped applyInPandas over driver-bounded rerank-window
    state, q x n_cand^2 pair rows)."""
    import pandas as pd

    from spark_indexedrdd_spark.functions.vectors import dot, norm

    # norm once per candidate row, not per pair (cosine() would re-run
    # both norm folds for each of the q x n_cand^2 pairs; dot/(na*nb)
    # is the identical IEEE sequence)
    candv = rel.join(
        emb.select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).alias("v"),
            norm(F.col(vec_col)).alias("__n"),
        ),
        "cand_id",
    ).select("q_id", "cand_id", "rel_sim", "v", "__n")
    a = candv.select(
        F.col("q_id").alias("qa"),
        F.col("cand_id").alias("a_id"),
        F.col("v").alias("va"),
        F.col("__n").alias("na"),
    )
    b = candv.select(
        F.col("q_id").alias("qb"),
        F.col("cand_id").alias("b_id"),
        F.col("v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    # a_id < b_id: each unordered pair scored ONCE (the dot is exactly
    # symmetric — per-element multiplies commute, fold order is the
    # array order on both operand orders), pick() mirrors both keys
    pairs = (
        a.join(b, F.col("qa") == F.col("qb"))
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            F.col("qa").alias("q_id"), "a_id", "b_id",
            (dot(F.col("va"), F.col("vb"))
             / (F.col("na") * F.col("nb"))).alias("sim_ab"),
        )
    )

    kk, ll = int(k), float(lam)

    def pick(rel_pdf: pd.DataFrame, pair_pdf: pd.DataFrame) -> pd.DataFrame:
        if rel_pdf.empty:
            return pd.DataFrame(
                {"q_id": [], "cand_id": [], "mmr_score": [], "rank": []}
            )
        qid = rel_pdf["q_id"].iloc[0]
        # cand_id-sorted iteration + strict > makes ties resolve to the
        # smallest cand_id — the oracle's (mmr DESC, cand_id) rn=1
        cands = sorted(
            zip(rel_pdf["cand_id"].tolist(), rel_pdf["rel_sim"].tolist())
        )
        # loud contract checks: an external pool that drifted from the
        # emb frame would otherwise die as an opaque KeyError mid-pick
        if len({c for c, _ in cands}) != len(cands):
            raise ValueError(
                f"duplicate (q_id, cand_id) rows in the candidate pool"
                f" for q_id={qid}"
            )
        sim = {}
        for aa, bb, s in zip(
            pair_pdf["a_id"].tolist(),
            pair_pdf["b_id"].tolist(),
            pair_pdf["sim_ab"].tolist(),
        ):
            sim[(aa, bb)] = s
            sim[(bb, aa)] = s
        n_c = len(cands)
        if n_c > 1 and len(sim) != n_c * (n_c - 1):
            raise ValueError(
                f"candidate pool for q_id={qid} has ids missing from the"
                f" emb frame (pool {n_c} ids, {len(sim)} pair sims) —"
                f" mmr_over_candidates requires every pool cand_id to"
                f" resolve in emb"
            )
        picked: list = []
        out_id, out_sc, out_rk = [], [], []
        remaining = dict(cands)
        for step in range(1, min(kk, len(cands)) + 1):
            best_id, best_sc = None, None
            for cid, rs in cands:
                if cid not in remaining:
                    continue
                # max over picked, 0.0 over the empty set (docstring)
                if picked:
                    maxsim = max(sim[(cid, s_id)] for s_id in picked)
                else:
                    maxsim = 0.0
                sc = ll * rs - (1.0 - ll) * maxsim
                if best_sc is None or sc > best_sc:
                    best_id, best_sc = cid, sc
            picked.append(best_id)
            del remaining[best_id]
            out_id.append(best_id)
            out_sc.append(best_sc)
            out_rk.append(step)
        return pd.DataFrame(
            {
                "q_id": [qid] * len(out_id),
                "cand_id": out_id,
                "mmr_score": out_sc,
                "rank": out_rk,
            }
        )

    id_t = rel.schema["cand_id"].dataType.simpleString()
    q_t = rel.schema["q_id"].dataType.simpleString()
    return (
        rel.groupBy("q_id")
        .cogroup(pairs.groupBy("q_id"))
        .applyInPandas(
            lambda l, r: pick(l, r),
            schema=(
                f"q_id {q_t}, cand_id {id_t}, mmr_score double, rank int"
            ),
        )
    )


def sql_mmr_rerank(
    table: str = "embeddings",
    query_ids: Iterable[int] = (),
    k: int = 5,
    n_candidates: int = 20,
    lam: float = DEFAULT_LAMBDA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cand_sql: "str | None" = None,
) -> str:
    """Exact DuckDB twin of :func:`mmr_rerank`: the candidate CTE is
    ``sql_cosine_topk`` (fold-exact), pairwise sims the same
    ``sql_cosine``, and the k greedy steps are UNROLLED as chained CTEs
    (sel_i = sel_{i-1} + argmax of lam*rel - (1-lam)*COALESCE(max sim
    to sel_{i-1}, 0.0), ties to the smallest cand_id) — the PageRank
    unrolled-recurrence oracle pattern.

    ``cand_sql`` swaps the candidate pool's provenance — any SELECT
    producing (q_id, cand_id, cosine_sim), e.g. ``sql_ivf_ann`` with a
    metadata ``filter_pred`` — making this the twin of
    :func:`mmr_over_candidates` composed over a store serve. Every pool
    cand_id must resolve in ``table`` (the pairwise-sim joins), the same
    contract the Spark side enforces loudly."""
    from spark_indexedrdd_spark.functions.similarity import sql_cosine_topk
    from spark_indexedrdd_spark.functions.vectors import sql_cosine

    if cand_sql is None:
        cand_sql = sql_cosine_topk(
            table=table,
            query_ids=query_ids,
            k=n_candidates,
            id_col=id_col,
            vec_col=vec_col,
        )
    lam_s = repr(float(lam))
    one_m = repr(1.0 - float(lam))
    parts = [
        f"cand AS (SELECT q_id, cand_id, cosine_sim AS rel_sim"
        f" FROM ({cand_sql}))",
        f"""pairs AS (
            SELECT a.q_id, a.cand_id AS a_id, b.cand_id AS b_id,
                   {sql_cosine('av.' + vec_col, 'bv.' + vec_col)} AS sim_ab
            FROM cand a
            JOIN cand b ON a.q_id = b.q_id AND a.cand_id <> b.cand_id
            JOIN {table} av ON av.{id_col} = a.cand_id
            JOIN {table} bv ON bv.{id_col} = b.cand_id
        )""",
    ]
    prev = None
    for i in range(1, int(k) + 1):
        if prev is None:
            maxsim_join = "SELECT q_id, a_id, NULL AS maxsim FROM pairs WHERE 1=0"
            not_in = ""
        else:
            maxsim_join = f"""
                SELECT p.q_id, p.a_id, MAX(p.sim_ab) AS maxsim
                FROM pairs p JOIN {prev} s
                  ON s.q_id = p.q_id AND s.cand_id = p.b_id
                GROUP BY p.q_id, p.a_id
            """
            not_in = (
                f"WHERE NOT EXISTS (SELECT 1 FROM {prev} s WHERE"
                f" s.q_id = c.q_id AND s.cand_id = c.cand_id)"
            )
        parts.append(f"""pick{i} AS (
            SELECT q_id, cand_id, mmr_score, {i} AS rank FROM (
                SELECT c.q_id, c.cand_id,
                       {lam_s} * c.rel_sim
                           - {one_m} * COALESCE(m.maxsim, 0.0) AS mmr_score,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.q_id
                           ORDER BY {lam_s} * c.rel_sim
                               - {one_m} * COALESCE(m.maxsim, 0.0) DESC,
                               c.cand_id
                       ) AS rn
                FROM cand c
                LEFT JOIN ({maxsim_join}) m
                  ON m.q_id = c.q_id AND m.a_id = c.cand_id
                {not_in}
            ) WHERE rn = 1
        )""")
        sel_terms = " UNION ALL ".join(
            f"SELECT q_id, cand_id FROM pick{j}" for j in range(1, i + 1)
        )
        parts.append(f"sel{i} AS ({sel_terms})")
        prev = f"sel{i}"
    union = " UNION ALL ".join(
        f"SELECT * FROM pick{j}" for j in range(1, int(k) + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT q_id, cand_id, mmr_score, CAST(rank AS INTEGER) AS rank"
        f" FROM ({union})"
    )
