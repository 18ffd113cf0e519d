"""RM3 pseudo-relevance feedback: exact oracle parity for the
expansion terms and the full expanded retrieval, plus the alpha
degeneration and effect properties."""

import os

import pytest

from spark_indexedrdd_spark.functions import retrieval as R
from tests.oracle_utils import compare, duck_con


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_rm3_expansion_terms_oracle_exact(spark, sf_dir, docs):
    out = compare(
        R.rm3_expansion_terms(docs),
        R.sql_rm3_expansion_terms(),
        duck_con(sf_dir),
    )
    assert out["ok"], out


def test_bm25_rm3_oracle_exact(spark, sf_dir, docs):
    out = compare(
        R.bm25_rm3_topk(docs), R.sql_bm25_rm3_topk(), duck_con(sf_dir)
    )
    assert out["ok"], out


def test_expansion_excludes_original_terms(docs):
    from spark_indexedrdd_spark.functions.retrieval import (
        DEFAULT_BM25_QUERIES,
        _query_terms,
    )

    orig = {}
    for q, t in _query_terms(DEFAULT_BM25_QUERIES):
        orig.setdefault(q, set()).add(t)
    rows = R.rm3_expansion_terms(docs, m_expand=5).collect()
    by_q = {}
    for r in rows:
        assert r.term not in orig[r.qid]
        assert r.rm9 > 0
        by_q.setdefault(r.qid, []).append((r.rank, r.rm9))
    for q, grp in by_q.items():
        grp = sorted(grp)
        assert [rk for rk, _ in grp] == list(range(1, len(grp) + 1))
        masses = [m for _, m in grp]
        assert masses == sorted(masses, reverse=True)


def test_alpha_one_degenerates_to_bm25_on_positive_prefix(docs):
    """alpha=1.0 zeroes the expansion side: every doc with a positive
    interpolated score ranks exactly as plain BM25 ranks it (docs
    matching ONLY expansion terms score 0 and can only trail)."""
    base = {}
    for r in R.bm25_topk(docs, k=10).collect():
        base.setdefault(r.qid, []).append((r.rank, r.doc_id))
    got = {}
    for r in R.bm25_rm3_topk(docs, k=10, alpha=1.0).collect():
        if r.score > 0:
            got.setdefault(r.qid, []).append((r.rank, r.doc_id))
    for q, rows in got.items():
        want = [d for _, d in sorted(base[q])][: len(rows)]
        assert [d for _, d in sorted(rows)] == want


def test_expansion_changes_ranking(docs):
    """At alpha=0.6 the feedback terms must actually move the ranking
    for at least one query (otherwise the operator is a no-op)."""
    base = {
        (r.qid, r.rank): r.doc_id for r in R.bm25_topk(docs, k=10).collect()
    }
    rm3 = {
        (r.qid, r.rank): r.doc_id
        for r in R.bm25_rm3_topk(docs, k=10, alpha=0.6).collect()
    }
    assert base != rm3


def test_rm3_from_store_matches_inplan(spark, docs):
    """Store-served RM3 == in-plan RM3 when the store holds the same
    corpus: feedback, expansion selection and the weighted re-score
    each carry their own store≡in-plan contract, composed."""
    import shutil

    p = "spark-warehouse/test_rm3_store"
    shutil.rmtree(p, ignore_errors=True)
    R.write_postings_store(docs, p, n_buckets=16)
    served = R.bm25_rm3_from_store(spark, p, docs)
    inplan = R.bm25_rm3_topk(docs)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inplan.collect())
    )


def test_rm3_from_store_respects_takedown(spark, docs):
    """After a takedown, the store-served RM3 equals in-plan RM3 over
    the SURVIVOR corpus: feedback docs, expansion mass, df/stats and
    candidates all exclude the tombstoned docs."""
    import shutil

    p = "spark-warehouse/test_rm3_store_del"
    shutil.rmtree(p, ignore_errors=True)
    R.write_postings_store(docs, p, n_buckets=16)
    R.delete_postings_docs(
        spark, p, docs.where("doc_id % 5 = 0").select("doc_id"),
        batch_tag="rm3-del",
    )
    survivors = docs.where("doc_id % 5 != 0")
    served = R.bm25_rm3_from_store(spark, p, survivors)
    inplan = R.bm25_rm3_topk(survivors)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inplan.collect())
    )


def test_rm3_from_store_refuses_uncovered_feedback_docs(spark, docs):
    """A forward frame that lacks store-servable feedback docs must
    refuse loudly (r10 ADVICE): silently losing them in the expansion
    join would degrade RM3 toward plain BM25 with no signal. The
    store holds the full corpus; the forward frame drops every even
    doc — at least one feedback id lands on an even doc, so the
    coverage check must fire."""
    import shutil

    p = "spark-warehouse/test_rm3_store_uncov"
    shutil.rmtree(p, ignore_errors=True)
    R.write_postings_store(docs, p, n_buckets=16)
    fb_ids = {
        r.doc_id for r in R.bm25_from_store(spark, p, k=5).collect()
    }
    dropped = {i for i in fb_ids if i % 2 == 0}
    assert dropped, "fixture assumption: some feedback doc id is even"
    with pytest.raises(ValueError, match="does not cover"):
        R.bm25_rm3_from_store(spark, p, docs.where("doc_id % 2 = 1"))
