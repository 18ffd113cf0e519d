"""Product quantization: encode determinism, ADC recall on clustered
data, reconstruction stats, and the Python-model pin of the det path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import pq as PQ
from spark_indexedrdd_spark.functions import similarity as SM


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(23)
    rows = []
    vid = 0
    for c in range(8):
        center = rng.standard_normal(16) * 3
        for _ in range(25):
            v = center + rng.standard_normal(16) * 0.1
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_sub_bounds_requires_divisibility():
    assert PQ._sub_bounds(16, 4) == [(0, 4), (4, 8), (8, 12), (12, 16)]
    with pytest.raises(ValueError):
        PQ._sub_bounds(10, 4)


def test_encode_matches_python_model(spark, clustered):
    """The Arrow encoder's codes equal a per-row pure-Python argmin over
    the same codebooks — pins the fold semantics independently of the
    DuckDB oracle."""
    cbs = PQ.train_pq(clustered, m=4, ksub=8, method="det")
    got = {
        r.vec_id: list(r.codes)
        for r in PQ.pq_encode(clustered, cbs).collect()
    }
    data = {r.vec_id: [float(x) for x in r.embedding]
            for r in clustered.collect()}
    bounds = PQ._sub_bounds(16, 4)
    for vid, vec in data.items():
        want = []
        for (lo, hi), cb in zip(bounds, cbs):
            dists = [PQ._py_sub_dist(vec[lo:hi], w) for w in cb]
            want.append(dists.index(min(dists)))
        assert got[vid] == want, vid


def test_encode_deterministic_across_runs(spark, clustered):
    cbs = PQ.train_pq(clustered, m=4, ksub=8, method="kmeans", seed=7)
    a = sorted(
        (r.vec_id, tuple(r.codes))
        for r in PQ.pq_encode(clustered, cbs).collect()
    )
    cbs2 = PQ.train_pq(clustered, m=4, ksub=8, method="kmeans", seed=7)
    b = sorted(
        (r.vec_id, tuple(r.codes))
        for r in PQ.pq_encode(clustered, cbs2).collect()
    )
    assert a == b


def test_pq_ann_finds_the_right_cluster(clustered):
    """PQ's metric is squared L2 with per-cell quantization error on the
    order of the codebook cell size. On 8 tight blobs (σ=0.1 noise vs
    inter-center distances ~10) that error is far below the
    inter-cluster margin but COMPARABLE to intra-blob distances — so
    the honest quality contract here is cluster-level: every retrieved
    neighbor comes from the query's blob (exact within-blob ordering is
    what IVFPQ residual encoding exists for; measured: exact-top-5
    recall on this data is ~0.35-0.7 across m/ksub settings while
    same-cluster precision is 1.0)."""
    qids = [0, 25, 50, 75]
    labels = {r.vec_id: r.label for r in clustered.collect()}
    rows = PQ.pq_ann(
        clustered, qids, k=5, m=4, ksub=16, method="kmeans"
    ).collect()
    assert len(rows) == len(qids) * 5
    same = sum(labels[r.q_id] == labels[r.cand_id] for r in rows)
    assert same / len(rows) >= 0.95, f"cluster precision {same/len(rows)}"


def test_pq_adc_orders_clusters_by_distance(clustered):
    """Across-cluster resolution: for a query, candidates from its own
    blob ADC-rank strictly ahead of any candidate from other blobs when
    k exceeds the blob size (the 26th neighbor must jump blobs)."""
    labels = {r.vec_id: r.label for r in clustered.collect()}
    rows = PQ.pq_ann(
        clustered, [0], k=26, m=4, ksub=16, method="kmeans"
    ).collect()
    own = [r.rank for r in rows if labels[r.cand_id] == labels[0]]
    other = [r.rank for r in rows if labels[r.cand_id] != labels[0]]
    assert len(own) == 24 and max(own) == 24  # all 24 blob-mates first
    assert min(other) == 25


def test_pq_ann_shapes_and_ranks(clustered):
    out = PQ.pq_ann(clustered, [0, 25], k=3, m=4, ksub=8, method="det")
    rows = out.collect()
    assert {r.q_id for r in rows} == {0, 25}
    for q in (0, 25):
        ranks = sorted(r.rank for r in rows if r.q_id == q)
        assert ranks == [1, 2, 3]
        dists = [r.adc_dist for r in sorted(
            (r for r in rows if r.q_id == q), key=lambda r: r.rank)]
        assert dists == sorted(dists)
    assert all(r.q_id != r.cand_id for r in rows)


def test_error_stats_kmeans_beats_det_on_clusters(clustered):
    """Lloyd's codebooks reconstruct clustered data better than
    first-k-slice codewords — the quality/exactness tradeoff the two
    methods exist for. Also pins the compression ratio arithmetic."""
    det = PQ.pq_error_stats(clustered, m=4, ksub=8, method="det").collect()[0]
    km = PQ.pq_error_stats(clustered, m=4, ksub=8, method="kmeans").collect()[0]
    assert det.n_vectors == km.n_vectors == 200
    assert km.mean_sq_err <= det.mean_sq_err
    assert km.compression_ratio == 16 * 4 / 4.0
    assert 0.0 <= km.mean_sq_err <= km.max_sq_err


def test_pq_scoring_plan_is_jvm_side(clustered):
    """The ADC scan must stay in the JVM: the only Python stage allowed
    in the plan is the Arrow encoder projection — scoring itself is a
    broadcast join + HOF fold."""
    df = PQ.pq_ann(clustered, [0, 25], k=3, m=4, ksub=8, method="det")
    from spark_indexedrdd_spark.plans import explain as X

    plan = X.physical_plan(df)
    # tree lines read "ArrowEvalPython (n)"; the formatted detail section
    # repeats each node as "(n) ArrowEvalPython" — count tree lines only
    assert plan.count("ArrowEvalPython (") <= 1, plan[:3000]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ivfpq_equals_pq_restricted_to_probed_lists(clustered):
    """Composition consistency: IVFPQ's result for a query equals plain
    PQ ADC ranking restricted to candidates whose IVF cluster is in the
    query's probe set (same codebooks, same seed)."""
    import itertools

    from spark_indexedrdd_spark.functions.ivf import build_ivf

    qids = [0, 75]
    ivfpq = {
        (r.q_id, r.rank): r.cand_id
        for r in PQ.ivfpq_ann(
            clustered, qids, k=5, n_clusters=8, n_probe=2,
            m=4, ksub=8, method="det",
        ).collect()
    }
    assigned, cents = build_ivf(
        clustered, 8, 42, "vec_id", "embedding", "det",
        repartition_lists=False,
    )
    cluster = {r.vec_id: r.cluster_id for r in assigned.collect()}
    # probe sets recomputed the slow way: top-2 centroid cosine per query
    data = {r.vec_id: [float(x) for x in r.embedding]
            for r in clustered.collect()}
    import math
    probe = {}
    for q in qids:
        sims = []
        for cid, (c, cn) in enumerate(cents):
            acc = 0.0
            for x, ci in zip(data[q], c):
                acc += x * ci
            sims.append((-(acc / cn), cid))
        probe[q] = {cid for _, cid in sorted(sims)[:2]}
    full = PQ.pq_ann(
        clustered, qids, k=len(data), m=4, ksub=8, method="det"
    ).collect()
    for q in qids:
        allowed = [r for r in sorted(
            (r for r in full if r.q_id == q), key=lambda r: r.rank
        ) if cluster[r.cand_id] in probe[q]][:5]
        got = [ivfpq[(q, rk)] for rk in range(1, 6)]
        assert got == [r.cand_id for r in allowed], q


def test_ivfpq_scan_fraction(clustered):
    """The probe join must actually prune: with n_probe=2 of 8 equal
    blobs, each query's scored candidate pool is ~2/8 of the corpus."""
    qids = [0]
    out = PQ.ivfpq_ann(
        clustered, qids, k=10_000, n_clusters=8, n_probe=2,
        m=4, ksub=8, method="kmeans",
    )
    n_scored = out.count()
    assert n_scored <= 2 * 200 / 8 + 5, n_scored


def test_residual_ivfpq_beats_flat_within_cluster(clustered):
    """The point of residual encoding: codes spend their precision on
    the cluster-radius ball, restoring the within-blob ranking flat
    codes blur. Exact-L2-top-5 recall must be strictly better than the
    flat variant's on the 8-blob fixture (flat measured ~0.35-0.7
    there)."""
    qids = [0, 25, 50, 75]
    data = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in clustered.collect()}
    bf = set()
    for q in qids:
        d = sorted(
            (float(np.sum((v - data[q]) ** 2)), vid)
            for vid, v in data.items() if vid != q
        )[:5]
        bf |= {(q, vid) for _, vid in d}

    def recall(df):
        got = {(r.q_id, r.cand_id) for r in df.collect()}
        return len(got & bf) / len(bf)

    flat = recall(PQ.ivfpq_ann(
        clustered, qids, k=5, n_clusters=8, n_probe=3,
        m=4, ksub=16, method="kmeans",
    ))
    res = recall(PQ.ivfpq_residual_ann(
        clustered, qids, k=5, n_clusters=8, n_probe=3,
        m=4, ksub=16, method="kmeans",
    ))
    # measured on this fixture/seed: flat 0.3, residual 0.7 — exact
    # within-blob ordering at sigma=0.1 spacing is beyond ksub=16
    # codes either way, but residual more than doubles it
    assert res >= 0.6, f"residual recall {res}"
    assert res > flat + 0.2, (res, flat)


def test_residual_ivfpq_single_arrow_stage(clustered):
    """Assignment + residual + encoding must fuse into ONE Arrow
    projection over the corpus scan."""
    df = PQ.ivfpq_residual_ann(
        clustered, [0, 25], k=3, n_clusters=8, n_probe=2,
        m=4, ksub=8, method="det",
    )
    from spark_indexedrdd_spark.plans import explain as X

    plan = X.physical_plan(df)
    n_python = plan.count("ArrowEvalPython (") + plan.count("MapInPandas (")
    assert n_python <= 1, plan[:3000]


def test_ivfpq_store_roundtrip_and_pruning(spark, clustered, tmp_path):
    """Store-served ANN equals the in-plan residual IVFPQ (same det
    quantizer), the codes read prunes to the probed partitions, and an
    appended batch is encoded with the STORED quantizer."""
    store = str(tmp_path / "ivfpq_store")
    base = clustered.where("vec_id < 175")
    batch = clustered.where("vec_id >= 175")
    PQ.write_ivfpq_store(
        base, store, n_clusters=8, m=4, ksub=8, method="det"
    )
    qvecs = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in clustered.where("vec_id in (0, 25)").collect()
    ]
    served = PQ.ivfpq_store_ann(spark, store, qvecs, k=5, n_probe=2)
    inplan = PQ.ivfpq_residual_ann(
        base, [0, 25], k=5, n_clusters=8, n_probe=2,
        m=4, ksub=8, method="det",
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inplan.collect())
    )
    # partition pruning: the scan must carry a cluster_id partition filter
    from spark_indexedrdd_spark.plans import explain as X

    plan = X.physical_plan(served)
    assert "PartitionFilters" in plan and "cluster_id" in plan.split(
        "PartitionFilters"
    )[1][:200], plan[:3000]

    # append: batch rows coded with the stored quantizer land in the
    # same cluster/codes a full rebuild with that quantizer gives
    PQ.append_ivfpq_batch(batch, store)
    codes, cents, cbs = PQ.read_ivfpq_store(spark, store)
    assert codes.count() == 200
    direct = PQ._assign_res_encode(batch, cents, cbs, "vec_id", "embedding")
    stored_batch = codes.where("vec_id >= 175")
    assert sorted(
        (r.vec_id, r.cluster_id, tuple(r.codes))
        for r in stored_batch.collect()
    ) == sorted(
        (r.vec_id, r.cluster_id, tuple(r.codes)) for r in direct.collect()
    )
