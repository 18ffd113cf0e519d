"""IVF ANN recall + duplicate-cluster resolution correctness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import similarity as SM
from spark_indexedrdd_spark.functions.dedup import resolve_duplicate_clusters
from spark_indexedrdd_spark.functions.ivf import ivf_ann


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for c in range(8):
        center = rng.standard_normal(16) * 3
        for _ in range(25):
            v = center + rng.standard_normal(16) * 0.1
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_ivf_recall_on_clusters(clustered):
    qids = [0, 25, 50, 75]
    bf = {
        (r.q_id, r.cand_id)
        for r in SM.cosine_topk(clustered, query_ids=qids, k=5).collect()
    }
    ivf = {
        (r.q_id, r.cand_id)
        for r in ivf_ann(
            clustered, qids, k=5, n_clusters=8, n_probe=3
        ).collect()
    }
    recall = len(ivf & bf) / len(bf)
    assert recall >= 0.9, f"IVF recall {recall}"


def _python_union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (4, 5)],                      # chain + pair
        [(1, 2), (3, 4), (2, 3), (10, 11)],            # merge two chains
        [(i, i + 1) for i in range(20)],                # long chain
        [(1, 5), (5, 9), (2, 9), (7, 8), (100, 1)],     # tangled
    ],
)
def test_resolve_clusters_matches_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in resolve_duplicate_clusters(df, max_iterations=32).collect()
    }
    want = _python_union_find(pairs)
    assert got == want


def test_quality_filter_reasons(spark):
    rows = [
        (1, "one two three"),                                 # too few tokens
        (2, " ".join(["spark"] * 50)),                        # too repetitive
        (3, " ".join(f"word{i}" for i in range(40))),          # ok
        (4, " ".join(["supercalifragilistic"] * 30)),          # avg token too long
    ]
    from spark_indexedrdd_spark.functions.text import quality_filter

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.keep, r.reason) for r in quality_filter(df).collect()}
    assert out[1] == (False, "too_few_tokens")
    assert out[2] == (False, "too_repetitive")
    assert out[3] == (True, "ok")
    assert out[4] == (False, "avg_token_too_long")


def test_semantic_dedup_kmeans_quality_on_clusters(clustered):
    """The kmeans quality tier of semantic_dedup on well-separated
    clusters with planted near-duplicates: every planted near-pair is
    collapsed (the clustering must put near-identical vectors in the
    same cluster), distinct clusters' members all survive, and the
    verdict is deterministic across runs (fixed seed)."""
    from spark_indexedrdd_spark.functions.ivf import semantic_dedup

    # plant exact duplicates of the first member of each label cluster
    dups = clustered.where("vec_id % 25 = 0").select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    corpus = clustered.select("vec_id", "embedding").unionAll(dups)
    out = semantic_dedup(
        corpus, threshold=0.99999, n_clusters=8, method="kmeans"
    ).collect()
    by_id = {r.vec_id: r for r in out}
    for g in range(8):
        orig, copy = 25 * g, 25 * g + 10_000
        assert by_id[copy].dup_of == orig, (g, by_id[copy])
        assert by_id[orig].keep
    # exact copies score ~1.0; same-cluster neighbors top out near
    # 1 - noise^2/|center|^2 ~ 0.9989, so 0.99999 separates them cleanly
    assert sum(1 for r in out if not r.keep) == 8
    out2 = semantic_dedup(
        corpus, threshold=0.99999, n_clusters=8, method="kmeans"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_incremental_semantic_dedup_equals_batch(spark, sf_dir, tmp_path):
    """Store-backed incremental verdicts must equal the batch
    semantic_dedup over (corpus ∪ batch) restricted to the batch ids —
    same centroids (det over the corpus, which holds the smallest ids,
    so the union's first-k set is identical), same threshold."""
    from spark_indexedrdd_spark.functions.ivf import (
        incremental_semantic_dedup_from_store,
        semantic_dedup,
        write_ivf_store,
    )
    from spark_indexedrdd_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where("vec_id < 300").select("vec_id", "embedding")
    batch = emb.where("vec_id >= 300").select("vec_id", "embedding")
    store = str(tmp_path / "ivf_store")
    write_ivf_store(corpus, store, n_clusters=8, method="det")

    inc = {
        r.vec_id: (r.cluster_id, r.keep, r.dup_of)
        for r in incremental_semantic_dedup_from_store(
            batch, store, threshold=0.3
        ).collect()
    }
    full = {
        r.vec_id: (r.cluster_id, r.keep, r.dup_of)
        for r in semantic_dedup(
            corpus.unionAll(batch), threshold=0.3, n_clusters=8, method="det"
        ).collect()
        if r.vec_id >= 300
    }
    assert inc == full and len(inc) > 0


def test_ivf_store_append_and_pruning(spark, tmp_path):
    """Appended batches join the store under the SAME centroids; a
    cluster-scoped read touches only that cluster's files (partition
    pruning — the property the per-cluster layout exists for)."""
    import numpy as np

    from spark_indexedrdd_spark.functions.ivf import (
        append_ivf_batch,
        incremental_semantic_dedup_from_store,
        read_ivf_store,
        write_ivf_store,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(4, 8)).astype("float64") * 3
    def mk(ids, centers):
        rows = [
            (int(i), [float(x) for x in centers[j % 4] + rng.normal(size=8) * 0.05])
            for j, i in enumerate(ids)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    corpus = mk(range(40), base)
    store = str(tmp_path / "store")
    write_ivf_store(corpus, store, n_clusters=4, method="det")

    # batch 1: an exact copy of vec 0's embedding → flagged against store
    v0 = corpus.where("vec_id = 0").collect()[0].embedding
    b1 = spark.createDataFrame([(100, v0)], "vec_id long, embedding array<float>")
    r1 = incremental_semantic_dedup_from_store(b1, store, threshold=0.999).collect()
    assert len(r1) == 1 and not r1[0].keep and r1[0].dup_of == 0
    append_ivf_batch(b1, store)

    # batch 2: copy of 100 → must now see batch 1 in the store
    b2 = spark.createDataFrame([(200, v0)], "vec_id long, embedding array<float>")
    r2 = incremental_semantic_dedup_from_store(b2, store, threshold=0.999).collect()
    assert not r2[0].keep and r2[0].dup_of == 0  # min-id neighbor, not 100

    vecs, cents = read_ivf_store(spark, store)
    assert len(cents) == 4
    # cluster filters must prune at the PARTITION level (directory
    # pruning), not as a post-scan data filter
    one = vecs.where(F.col("cluster_id") == r2[0].cluster_id)
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("cluster_id" in l for l in pf), plan


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (4, 5)],
        [(1, 5), (5, 9), (2, 9), (7, 8), (100, 1)],
    ],
)
def test_resolve_clusters_driver_and_distributed_paths_identical(
    spark, pairs
):
    """The size-gated driver-side union-find must reproduce the
    distributed min-label loop row-for-row (min-label connected
    components are engine-independent)."""
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    driver = sorted(
        map(tuple, resolve_duplicate_clusters(df, driver_max_edges=10**6).collect())
    )
    distributed = sorted(
        map(tuple, resolve_duplicate_clusters(df, driver_max_edges=0).collect())
    )
    assert driver == distributed
    # schema parity between the two construction paths
    a = resolve_duplicate_clusters(df, driver_max_edges=10**6).schema
    b = resolve_duplicate_clusters(df, driver_max_edges=0).schema
    assert [f.name for f in a] == [f.name for f in b]
    assert [f.dataType for f in a] == [f.dataType for f in b]
