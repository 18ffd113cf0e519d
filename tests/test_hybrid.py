"""Hybrid RRF retrieval: oracle parity, store≡in-plan composition,
fusion properties."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import hybrid as H
from tests.oracle_utils import compare, duck_con


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_hybrid_rrf_oracle_exact(spark, sf_dir, docs, emb):
    res = H.hybrid_rrf(docs, emb)
    con = duck_con(sf_dir)
    out = compare(res, H.sql_hybrid_rrf(), con)
    assert out["ok"], out


def test_hybrid_rrf_membership_and_shape(docs, emb):
    """Every fused doc came from at least one branch top-k_branch; at
    most k rows per qid; ranks are 1..n dense per qid."""
    rows = H.hybrid_rrf(docs, emb, k=10, k_branch=20).collect()
    by_q = {}
    for r in rows:
        assert r.lex_rank is not None or r.dense_rank is not None
        assert r.lex_rank is None or 1 <= r.lex_rank <= 20
        assert r.dense_rank is None or 1 <= r.dense_rank <= 20
        by_q.setdefault(r.qid, []).append(r)
    for qid, grp in by_q.items():
        assert len(grp) <= 10
        ranks = sorted(r.rank for r in grp)
        assert ranks == list(range(1, len(grp) + 1))
        # fused order follows the fixed-point score, doc_id tie-break
        grp = sorted(grp, key=lambda r: r.rank)
        for a, b in zip(grp, grp[1:]):
            assert (a.rrf_score, -a.doc_id) >= (b.rrf_score, -b.doc_id)


def test_hybrid_both_branches_beat_single(docs, emb):
    """A doc ranked #1 in BOTH branches must fuse to rank 1 (its rrf9
    is the max achievable)."""
    lex = [(1, 10, 1), (1, 11, 2)]
    den = [(1, 10, 1), (1, 12, 1)]  # doc 10 tops both branches
    sp = docs.sparkSession
    lexdf = sp.createDataFrame(lex, "qid int, doc_id long, rank int")
    dendf = sp.createDataFrame(den, "qid int, doc_id long, rank int")
    fused = {r.doc_id: r.rank for r in H.fuse_rrf(lexdf, dendf, k=3).collect()}
    assert fused[10] == 1


def test_hybrid_from_stores_matches_in_plan(spark, sf_dir, docs, emb):
    """Store-served hybrid (postings buckets + IVF clusters) with
    n_probe = n_clusters equals fusing the SAME branch algorithms
    in-plan — the store≡in-plan contract each branch carries, composed
    through the fusion."""
    from spark_indexedrdd_spark.functions import ivf as _ivf
    from spark_indexedrdd_spark.functions import retrieval as _r

    emb2 = emb.select("vec_id", "embedding")
    ppath = os.path.join("spark-warehouse", "test_hybrid_postings")
    ipath = os.path.join("spark-warehouse", "test_hybrid_ivf")
    shutil.rmtree(ppath, ignore_errors=True)
    shutil.rmtree(ipath, ignore_errors=True)
    _r.write_postings_store(docs, ppath, n_buckets=16)
    _ivf.write_ivf_store(emb2, ipath, n_clusters=8, method="det")

    served = H.hybrid_rrf_from_stores(
        spark, ppath, ipath, k=10, k_branch=20, n_probe=8
    )

    lex = _r.bm25_topk(
        docs,
        queries=tuple((q, t) for q, t, _v in H.HYBRID_QUERIES),
        k=20,
    ).select("qid", "doc_id", "rank")
    den = _ivf.ivf_ann(
        emb2,
        query_ids=[v for _q, _t, v in H.HYBRID_QUERIES],
        k=20,
        n_clusters=8,
        n_probe=8,
        method="det",
    )
    inplan = H.fuse_rrf(
        lex,
        H._dense_to_qids(spark, den, H.HYBRID_QUERIES),
        k=10,
    )

    key = lambda r: (r.qid, r.rank)  # noqa: E731
    a = sorted(served.collect(), key=key)
    b = sorted(inplan.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_hybrid_from_stores_dense_filter(spark, docs, emb):
    """Filtered hybrid: the dense branch honours a keep_cols metadata
    predicate — equals fusing bm25 with the FILTERED in-plan IVF."""
    from spark_indexedrdd_spark.functions import ivf as _ivf
    from spark_indexedrdd_spark.functions import retrieval as _r

    emb3 = emb.select("vec_id", "embedding", "label")
    ppath = os.path.join("spark-warehouse", "test_hybrid_postings_f")
    ipath = os.path.join("spark-warehouse", "test_hybrid_ivf_f")
    shutil.rmtree(ppath, ignore_errors=True)
    shutil.rmtree(ipath, ignore_errors=True)
    _r.write_postings_store(docs, ppath, n_buckets=16)
    _ivf.write_ivf_store(
        emb3, ipath, n_clusters=8, method="det", keep_cols=("label",)
    )
    served = H.hybrid_rrf_from_stores(
        spark, ppath, ipath, k=10, k_branch=20, n_probe=8,
        dense_filter_pred="label % 2 = 0",
    )
    lex = _r.bm25_topk(
        docs,
        queries=tuple((q, t) for q, t, _v in H.HYBRID_QUERIES),
        k=20,
    ).select("qid", "doc_id", "rank")
    den = _ivf.ivf_ann(
        emb3,
        query_ids=[v for _q, _t, v in H.HYBRID_QUERIES],
        k=20,
        n_clusters=8,
        n_probe=8,
        method="det",
        filter_pred="label % 2 = 0",
    )
    inplan = H.fuse_rrf(
        lex, H._dense_to_qids(spark, den, H.HYBRID_QUERIES), k=10
    )
    key = lambda r: (r.qid, r.rank)  # noqa: E731
    assert sorted(map(tuple, served.collect()), key=lambda t: t[:2]) == \
        sorted(map(tuple, inplan.collect()), key=lambda t: t[:2])
    # every dense-admitted doc satisfies the predicate
    labs = {r.vec_id: r.label for r in emb3.select("vec_id", "label").collect()}
    for r in served.collect():
        if r.dense_rank is not None:
            assert labs[r.doc_id] % 2 == 0


def test_hybrid_then_mmr_pipeline(spark, docs, emb):
    """The composed retrieval pipeline a RAG deployment runs: hybrid
    RRF fuses the lexical and dense branches, then MMR diversifies the
    fused top-k against the embedding space. The fused rrf_score plays
    the relevance role (MMR only needs a relevance ordering); picks
    must come from the fused pool and carry the greedy rank order."""
    from spark_indexedrdd_spark.functions import mmr as M

    fused = H.hybrid_rrf(docs, emb, k=10, k_branch=20)
    pool = fused.select(
        "q_id" if "q_id" in fused.columns else F.col("qid").alias("q_id"),
        F.col("doc_id").alias("cand_id"),
        F.col("rrf_score").alias("rel_sim"),
    )
    picks = M.mmr_over_candidates(pool, emb, k=5).collect()
    assert len(picks) == 3 * 5
    pool_sets = {}
    for r in pool.collect():
        pool_sets.setdefault(r.q_id, set()).add(r.cand_id)
    by_q = {}
    for r in picks:
        assert r.cand_id in pool_sets[r.q_id]
        by_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())


def test_hybrid_from_stores_asof_postings_version(spark, docs, emb):
    """Snapshot hybrid: serving with postings_version frozen at the
    half-corpus build equals fusing bm25 over the PRE-APPEND half with
    the same dense branch — the postings ledger's as-of surface
    composes through the fusion."""
    from spark_indexedrdd_spark.functions import ivf as _ivf
    from spark_indexedrdd_spark.functions import retrieval as _r
    from spark_indexedrdd_spark.functions import store_commit as _sc

    emb2 = emb.select("vec_id", "embedding")
    ppath = os.path.join("spark-warehouse", "test_hybrid_postings_v")
    ipath = os.path.join("spark-warehouse", "test_hybrid_ivf_v")
    shutil.rmtree(ppath, ignore_errors=True)
    shutil.rmtree(ipath, ignore_errors=True)
    half = docs.where("doc_id % 2 = 0")
    _r.write_postings_store(half, ppath, n_buckets=16)
    v1 = _sc.read_meta(ppath)["version"]
    _r.append_postings_batch(
        docs.where("doc_id % 2 = 1"), ppath, batch_tag="v-b1"
    )
    _ivf.write_ivf_store(emb2, ipath, n_clusters=8, method="det")

    snap = H.hybrid_rrf_from_stores(
        spark, ppath, ipath, k=10, k_branch=20, n_probe=8,
        postings_version=v1,
    )
    lex = _r.bm25_topk(
        half,
        queries=tuple((q, t) for q, t, _v in H.HYBRID_QUERIES),
        k=20,
    ).select("qid", "doc_id", "rank")
    den = _ivf.ivf_ann(
        emb2,
        query_ids=[v for _q, _t, v in H.HYBRID_QUERIES],
        k=20,
        n_clusters=8,
        n_probe=8,
        method="det",
    )
    want = H.fuse_rrf(
        lex, H._dense_to_qids(spark, den, H.HYBRID_QUERIES), k=10
    )
    key = lambda t: t[:2]  # noqa: E731
    assert sorted(map(tuple, snap.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )
    # and the LIVE serve differs (the appended half is visible)
    live = H.hybrid_rrf_from_stores(
        spark, ppath, ipath, k=10, k_branch=20, n_probe=8
    )
    assert sorted(map(tuple, live.collect()), key=key) != sorted(
        map(tuple, snap.collect()), key=key
    )


def test_hybrid_streaming_ingest_then_serve(spark, docs, emb, tmp_path):
    """Streaming hybrid ingest (r10 VERDICT item 7): documents arrive
    as micro-batches that fold into BOTH persisted indexes — postings
    via StreamingPostingsStore (init + tagged appends) and vectors via
    write_ivf_store/append_ivf_batch under the stored centroids — and
    the store-served hybrid afterwards equals the in-plan hybrid over
    the UNION corpus. n_probe = n_clusters makes the dense serve
    centroid-invariant (every list scanned), so parity is exact even
    though the stream's first batch, not the union, fit the
    centroids."""
    from spark_indexedrdd_spark.functions import ivf as _ivf
    from spark_indexedrdd_spark.functions import retrieval as _r

    emb2 = emb.select("vec_id", "embedding")
    src = str(tmp_path / "stream_docs")
    docs.where("doc_id % 2 = 0").coalesce(1).write.parquet(
        src + "/half0"
    )
    docs.where("doc_id % 2 = 1").coalesce(1).write.parquet(
        src + "/half1"
    )
    ppath = os.path.join("spark-warehouse", "test_hybrid_stream_postings")
    ipath = os.path.join("spark-warehouse", "test_hybrid_stream_ivf")
    shutil.rmtree(ppath, ignore_errors=True)
    shutil.rmtree(ipath, ignore_errors=True)

    pstore = _r.StreamingPostingsStore(ppath, n_buckets=16)
    ivf_init = {"done": False}

    def _fb(batch_df, batch_id):
        if not batch_df.take(1):
            return
        pstore.foreach_batch(batch_df, batch_id)
        bemb = emb2.join(
            F.broadcast(batch_df.select(F.col("doc_id").alias("vec_id"))),
            "vec_id",
            "left_semi",
        )
        if not ivf_init["done"]:
            _ivf.write_ivf_store(bemb, ipath, n_clusters=8, method="det")
            ivf_init["done"] = True
        else:
            _ivf.append_ivf_batch(bemb, ipath)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_fb)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    served = H.hybrid_rrf_from_stores(
        spark, ppath, ipath, k=10, k_branch=20, n_probe=8
    )
    inplan = H.hybrid_rrf(docs, emb, k=10, k_branch=20)
    key = lambda r: (r.qid, r.rank)  # noqa: E731
    a = [tuple(r) for r in sorted(served.collect(), key=key)]
    b = [tuple(r) for r in sorted(inplan.collect(), key=key)]
    assert a == b
