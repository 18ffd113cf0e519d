"""Similarity-search tests: oracle parity for the brute-force scorer,
fast-path equivalence, and LSH recall on clustered data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import similarity as SM
from spark_indexedrdd_spark.sources.tables import load_table
from tests.oracle_utils import compare, duck_con


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


def test_cosine_topk_oracle(emb, con):
    report = compare(SM.cosine_topk(emb), SM.sql_cosine_topk(), con)
    assert report["ok"], report


def test_near_duplicates_oracle(emb, con):
    report = compare(
        SM.near_duplicates(emb, 0.3), SM.sql_near_duplicates(threshold=0.3), con
    )
    assert report["ok"], report


def test_fast_path_matches_bruteforce_ids(emb):
    """Since the r12 consolidation this test IS the brute tier's pin:
    the `similarity_topk` contract entry folded into
    `similarity_topk_fast` (both ranked the same DuckDB oracle), so
    the sequential-fold path's evidence is this ids + round-9-score
    equivalence to the hash-checked fast path (BLAS vs fold differ
    by ~1 ulp — both contract oracles rank on ROUND(score, 9), the
    same tolerance pinned here)."""
    bf = {
        (r.q_id, r.rank): (r.cand_id, round(r.cosine_sim, 9))
        for r in SM.cosine_topk(emb).collect()
    }
    fast = {
        (r.q_id, r.rank): (r.cand_id, round(r.cosine_sim, 9))
        for r in SM.cosine_topk_fast(emb).collect()
    }
    assert bf == fast and len(bf) == 50


def test_fast_path_rejects_unbounded_query_sets(emb):
    """The dense broadcast path is capped: beyond MAX_FAST_QUERIES the
    q×dim matrix stops fitting beside Arrow batches — callers must move
    to the LSH/IVF tiers, not silently melt executors."""
    too_many = range(SM.MAX_FAST_QUERIES + 1)
    with pytest.raises(ValueError, match="capped"):
        SM.cosine_topk_fast(emb, query_ids=too_many)


@pytest.fixture(scope="module")
def clustered(spark):
    """Synthetic clustered embeddings where ANN recall is meaningful:
    10 tight clusters of 30 vectors in 16-d."""
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(10):
        center = rng.standard_normal(16) * 3
        for _ in range(30):
            v = center + rng.standard_normal(16) * 0.1
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_lsh_ann_recall_on_clusters(clustered):
    qids = [0, 30, 60, 90, 120]
    bf = {
        (r.q_id, r.cand_id)
        for r in SM.cosine_topk(clustered, query_ids=qids, k=5).collect()
    }
    ann = {
        (r.q_id, r.cand_id)
        for r in SM.hyperplane_lsh_ann(
            clustered, query_ids=qids, k=5, dim=16
        ).collect()
    }
    recall = len(ann & bf) / len(bf)
    assert recall >= 0.9, f"LSH recall {recall} too low on clustered data"


def test_int8_quantization_roundtrip_and_bound(spark, sf_dir):
    """Symmetric int8: reconstruction error is bounded by scale/2 per
    component; codes fit int8 exactly; dequantize(quantize(x)) scores
    nearly-identical cosine neighbors."""
    from spark_indexedrdd_spark.functions import quant as Q
    from spark_indexedrdd_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    stats = Q.quantize_error_stats(emb).collect()
    assert len(stats) > 0
    assert all(r.max_abs_err <= r.scale / 2 + 1e-12 for r in stats)

    qd = Q.quantize_int8(emb)
    row = qd.limit(5).collect()
    assert all(-127 <= q <= 127 for r in row for q in r.qvec)

    # neighbor preservation: top-1 of a query over dequantized vectors
    # matches the float32 top-1 (int8 error is ~0.4% of range)
    rec = Q.dequantize_int8(qd).withColumnRenamed("embedding", "emb_q")
    joined = emb.select("vec_id", "embedding").join(rec, "vec_id")
    import math

    rows = joined.limit(200).collect()
    base = {r.vec_id: r.embedding for r in rows}
    recs = {r.vec_id: r.emb_q for r in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb)

    q0 = min(base)
    top_f = max((k for k in base if k != q0), key=lambda k: cos(base[q0], base[k]))
    top_q = max((k for k in recs if k != q0), key=lambda k: cos(recs[q0], recs[k]))
    assert top_f == top_q


def test_ann_recall_operator(clustered):
    """ann_recall: 1.0 for brute-force-vs-itself; >= the suite's floor
    for the LSH tier; 0.0 rows (not missing rows) for an empty ANN."""
    qids = [0, 30, 60, 90, 120]
    bf = SM.cosine_topk(clustered, query_ids=qids, k=5)
    perfect = SM.ann_recall(clustered, bf, query_ids=qids, k=5)
    assert {r.recall for r in perfect.collect()} == {1.0}

    ann = SM.hyperplane_lsh_ann(clustered, query_ids=qids, k=5, dim=16)
    rows = SM.ann_recall(clustered, ann, query_ids=qids, k=5).collect()
    assert len(rows) == len(qids)
    mean_recall = sum(r.recall for r in rows) / len(rows)
    assert mean_recall >= 0.9

    empty = bf.where("q_id IS NULL")
    zeros = SM.ann_recall(clustered, empty, query_ids=qids, k=5).collect()
    assert len(zeros) == len(qids) and all(r.recall == 0.0 for r in zeros)


def test_lsh_ann_prunes_candidates(clustered):
    """The point of LSH: the scored candidate set must be much smaller
    than all-pairs on clusterable data."""
    qids = [0, 30, 60]
    ann = SM.hyperplane_lsh_ann(clustered, query_ids=qids, k=5, dim=16)
    assert ann.count() <= len(qids) * 5


def test_brute_force_warns_above_candidate_ceiling(emb, monkeypatch):
    """cosine_topk is the small-q oracle twin; above the candidate
    ceiling its per-query-id window is skewed by construction, so it
    must warn and steer to the fast/ANN tiers (threshold monkeypatched
    down — the real 2M ceiling needs no 2M-row fixture)."""
    import warnings

    monkeypatch.setattr(SM, "BRUTE_FORCE_CAND_WARN", 10)
    with pytest.warns(UserWarning, match="cosine_topk_fast"):
        SM.cosine_topk(emb, query_ids=[0, 50], k=2)

    monkeypatch.setattr(SM, "BRUTE_FORCE_CAND_WARN", 2_000_000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        SM.cosine_topk(emb, query_ids=[0, 50], k=2).collect()


def test_fast_path_rounded_tie_break_survives_batching(spark):
    """Duplicate-heavy corpus: many candidates tie at rounded precision
    inside ONE Arrow batch. Per-batch selection must use the final
    (rounded desc, cand_id asc) ordering — raw-score argpartition could
    keep an arbitrary member of the tie and drop the cand_id winner."""
    base = [1.0, 0.5, 0.25, 0.125]
    rows = [(0, base)]
    # 40 exact duplicates of a near-miss vector, ids descending so the
    # raw-selection order disagrees with the cand_id tie-break
    near = [1.0, 0.5, 0.25, 0.124999]
    for i in range(40):
        rows.append((1000 - i, near))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(1)
    out = SM.cosine_topk_fast(df, query_ids=[0], k=3).collect()
    got = [(r.rank, r.cand_id) for r in sorted(out, key=lambda r: r.rank)]
    # ties at rounded precision resolve to the SMALLEST cand_ids
    assert got == [(1, 961), (2, 962), (3, 963)], got


def test_semantic_dedup_verdicts_planted(spark):
    """SemDeDup on a planted corpus: exact copies of a vector collapse
    onto the smallest id; near-orthogonal vectors all survive; verdict
    invariants hold (dup_of < vec_id, dup_of in the same cluster,
    exactly one keep per duplicate group)."""
    from spark_indexedrdd_spark.functions.ivf import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 16)).astype("float32")
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):  # three exact copies of each base vector
            rows.append((vid, [float(x) for x in b]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(
        df, threshold=0.999, n_clusters=4, method="det"
    ).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(out) == 24
    clusters = {r.vec_id: r.cluster_id for r in out}
    for r in out:
        if r.dup_of is not None:
            assert r.dup_of < r.vec_id
            assert clusters[r.dup_of] == r.cluster_id
            assert not r.keep
    # copies land in the same cluster (identical vectors, identical
    # argmax) and collapse to the group's smallest id
    for g in range(8):
        ids = [3 * g, 3 * g + 1, 3 * g + 2]
        assert by_id[ids[1]].dup_of == ids[0]
        assert by_id[ids[2]].dup_of == ids[0]
        assert by_id[ids[0]].keep


def test_semantic_dedup_orthogonal_all_kept(spark):
    """Orthonormal basis vectors: no pair exceeds any positive
    threshold, so every vector is kept."""
    from spark_indexedrdd_spark.functions.ivf import semantic_dedup

    rows = [
        (i, [1.0 if j == i else 0.0 for j in range(8)]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, threshold=0.5, n_clusters=3, method="det").collect()
    assert all(r.keep and r.dup_of is None for r in out)
