"""Filtered ANN on the COMPRESSED serving tiers (IVFPQ codes, binary
sketches): keep_cols metadata rides the code/sketch rows, the predicate
restricts candidates only (prefilter semantics, ranks recut), pushed
into the pruned scans — completing the filtered-ANN family across all
four tiers (brute/IVF in test_ivf_filtered.py)."""

import os

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import pq as PQ
from spark_indexedrdd_spark.functions import quant as Q
from tests.oracle_utils import compare, duck_con

QIDS = [0, 50, 100]
PRED = "label % 2 = 0"


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _qvecs(emb, qids):
    rows = emb.where(F.col("vec_id").isin(qids)).collect()
    return [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]


# ------------------------------ IVFPQ ------------------------------- #


@pytest.fixture(scope="module")
def ivfpq_store(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fc") / "ivfpq_keep")
    PQ.write_ivfpq_store(
        emb.select("vec_id", "embedding", "label"),
        p,
        n_clusters=16,
        n_probe=4,
        m=8,
        ksub=16,
        method="det",
        keep_cols=("label",),
    )
    return p


def test_ivfpq_filtered_serve_oracle_exact(spark, sf_dir, emb, ivfpq_store):
    served = PQ.ivfpq_store_ann(
        spark, ivfpq_store, _qvecs(emb, QIDS), k=5, n_probe=4,
        filter_pred=PRED,
    )
    out = compare(
        served,
        PQ.sql_ivfpq_residual_ann(query_ids=QIDS, filter_pred=PRED),
        duck_con(sf_dir),
    )
    assert out["ok"], out


def test_ivfpq_filter_composes_with_tombstones(
    spark, sf_dir, emb, tmp_path
):
    p = str(tmp_path / "ivfpq_keep_tomb")
    PQ.write_ivfpq_store(
        emb.select("vec_id", "embedding", "label"),
        p, n_clusters=16, n_probe=4, m=8, ksub=16, method="det",
        keep_cols=("label",),
    )
    PQ.delete_ivfpq_ids(
        spark, p, emb.where("vec_id % 7 = 0").select("vec_id"),
        batch_tag="fc-del",
    )
    served = PQ.ivfpq_store_ann(
        spark, p, _qvecs(emb, QIDS), k=5, n_probe=4, filter_pred=PRED
    )
    out = compare(
        served,
        PQ.sql_ivfpq_residual_ann(
            query_ids=QIDS, exclude_pred="vec_id % 7 = 0", filter_pred=PRED
        ),
        duck_con(sf_dir),
    )
    assert out["ok"], out


def test_ivfpq_filter_pushed_into_codes_scan(spark, emb, ivfpq_store):
    plan = PQ.ivfpq_store_ann(
        spark, ivfpq_store, _qvecs(emb, QIDS), k=5, n_probe=2,
        filter_pred="label = 3",
    )._jdf.queryExecution().executedPlan().toString()
    pushed = [
        l for l in plan.splitlines()
        if "PushedFilters" in l and "label" in l
    ]
    assert pushed, plan


def test_ivfpq_append_enforces_and_carries_keep_cols(spark, emb, tmp_path):
    p = str(tmp_path / "ivfpq_keep_app")
    half = emb.select("vec_id", "embedding", "label")
    PQ.write_ivfpq_store(
        half.where("vec_id % 2 = 0"), p, n_clusters=8, m=4, ksub=8,
        method="det", keep_cols=("label",),
    )
    with pytest.raises(ValueError, match="keep_cols"):
        PQ.append_ivfpq_batch(
            emb.select("vec_id", "embedding").where("vec_id % 2 = 1"), p
        )
    PQ.append_ivfpq_batch(half.where("vec_id % 2 = 1"), p)
    served = PQ.ivfpq_store_ann(
        spark, p, _qvecs(emb, QIDS), k=20, n_probe=8, filter_pred=PRED
    ).collect()
    assert len(served) == len(QIDS) * 20
    assert any(r.cand_id % 2 == 1 for r in served), "appended rows unseen"
    labs = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert all(labs[r.cand_id] % 2 == 0 for r in served)


# ------------------------------ binary ------------------------------ #


@pytest.fixture(scope="module")
def binary_store(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fc") / "binary_keep")
    Q.write_binary_store(
        emb.select("vec_id", "embedding", "label"), p, keep_cols=("label",)
    )
    return p


def test_binary_filtered_serve_oracle_exact(spark, sf_dir, emb, binary_store):
    served = Q.binary_store_ann(
        spark, binary_store, _qvecs(emb, QIDS), k=5, filter_pred=PRED
    )
    out = compare(
        served,
        Q.sql_binary_ann(query_ids=QIDS, k=5, filter_pred=PRED),
        duck_con(sf_dir),
    )
    assert out["ok"], out


def test_binary_filter_is_stage1(spark, emb, binary_store):
    """Stage-1 placement: every candidate the Hamming prefilter keeps
    already satisfies the predicate, so the k results per query are
    all matching AND k is filled (enough matches exist)."""
    served = Q.binary_store_ann(
        spark, binary_store, _qvecs(emb, QIDS), k=5, n_candidates=16,
        filter_pred=PRED,
    ).collect()
    assert len(served) == len(QIDS) * 5
    labs = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert all(labs[r.cand_id] % 2 == 0 for r in served)


def test_binary_filter_stage1_not_postfilter(spark, emb, binary_store):
    """The sharpest behavioral discriminator for stage-1 placement:
    with n_candidates == k, a post-filter of the unfiltered Hamming
    top-k would keep only the ~half of those k that match the 50%
    predicate — stage-1 placement fills ALL k slots with matching
    candidates for every query. (The final df's plan can't witness the
    pushed filter: stage 1 is materialized + cached inside the serve,
    so the label predicate executes in that earlier job.)"""
    served = Q.binary_store_ann(
        spark, binary_store, _qvecs(emb, QIDS), k=5, n_candidates=5,
        filter_pred=PRED,
    ).collect()
    per_q = {}
    for r in served:
        per_q[r.q_id] = per_q.get(r.q_id, 0) + 1
    assert per_q == {q: 5 for q in QIDS}, per_q


def test_binary_append_enforces_keep_cols(spark, emb, binary_store):
    with pytest.raises(ValueError, match="keep_cols"):
        Q.append_binary_batch(
            emb.select("vec_id", "embedding").where("vec_id < 0"),
            binary_store,
        )
