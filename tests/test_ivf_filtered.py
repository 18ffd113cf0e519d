"""Filtered ANN: metadata-predicate vector search on the IVF tier —
prefilter semantics (ranks recut over matching candidates), in-plan and
from the persisted store (keep_cols), oracle-exact with det centroids."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import ivf as IVF
from tests.oracle_utils import compare, duck_con

QIDS = [0, 50, 100, 150, 200]
PRED = "label % 2 = 0"


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="module")
def store(spark, emb):
    path = os.path.join("spark-warehouse", "test_ivf_filtered")
    shutil.rmtree(path, ignore_errors=True)
    IVF.write_ivf_store(
        emb.select("vec_id", "embedding", "label"),
        path,
        n_clusters=8,
        method="det",
        keep_cols=("label",),
    )
    return path


def test_filtered_inplan_oracle_exact(spark, sf_dir, emb):
    res = IVF.ivf_ann(
        emb, QIDS, k=5, n_clusters=8, n_probe=8, method="det",
        filter_pred=PRED,
    )
    out = compare(
        res,
        IVF.sql_ivf_ann(
            query_ids=QIDS, k=5, n_clusters=8, n_probe=8, filter_pred=PRED
        ),
        duck_con(sf_dir),
    )
    assert out["ok"], out


def test_filtered_results_satisfy_pred(spark, emb):
    res = IVF.ivf_ann(
        emb, QIDS, k=5, n_clusters=8, n_probe=8, method="det",
        filter_pred=PRED,
    )
    labels = {
        r.label
        for r in res.join(
            emb.select(F.col("vec_id").alias("cand_id"), "label"), "cand_id"
        ).collect()
    }
    assert labels and all(l % 2 == 0 for l in labels)


def test_filtered_is_prefilter_not_postfilter(spark, emb):
    """Prefilter must FILL k from matching candidates; post-filtering
    an unfiltered top-k would under-fill whenever the unfiltered top-k
    contains non-matching rows. Exhaustive probes ⇒ every query gets
    exactly k matching neighbors (corpus has >> k matches)."""
    res = IVF.ivf_ann(
        emb, QIDS, k=5, n_clusters=8, n_probe=8, method="det",
        filter_pred=PRED,
    )
    counts = {r.q_id: r.cnt for r in res.groupBy("q_id").agg(
        F.count("*").alias("cnt")).collect()}
    assert counts == {q: 5 for q in QIDS}


def test_store_filtered_matches_inplan(spark, emb, store):
    served = IVF.ivf_ann_from_store(
        spark, store, QIDS, k=5, n_probe=8, filter_pred=PRED
    )
    inplan = IVF.ivf_ann(
        emb, QIDS, k=5, n_clusters=8, n_probe=8, method="det",
        filter_pred=PRED,
    )
    key = lambda r: (r.q_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, served.collect()), key=lambda t: t[:2]) == \
        sorted(map(tuple, inplan.collect()), key=lambda t: t[:2])


def test_store_filter_composes_with_tombstones(spark, sf_dir, emb, store):
    """Filtered serve on a store with committed tombstones: oracle =
    full-fit centroids, candidates = survivors AND matching."""
    path = os.path.join("spark-warehouse", "test_ivf_filtered_tomb")
    shutil.rmtree(path, ignore_errors=True)
    IVF.write_ivf_store(
        emb.select("vec_id", "embedding", "label"),
        path,
        n_clusters=8,
        method="det",
        keep_cols=("label",),
    )
    IVF.delete_ivf_ids(
        spark, path, emb.where("vec_id % 7 = 0").select("vec_id"),
        batch_tag="t-del",
    )
    served = IVF.ivf_ann_from_store(
        spark, path, [50, 100, 150], k=5, n_probe=8, filter_pred=PRED
    )
    out = compare(
        served,
        IVF.sql_ivf_ann(
            query_ids=[50, 100, 150], k=5, n_clusters=8, n_probe=8,
            exclude_pred="vec_id % 7 = 0", filter_pred=PRED,
        ),
        duck_con(sf_dir),
    )
    assert out["ok"], out


def test_filter_pred_pushed_into_store_scan(spark, store):
    """The 100 TB property: the metadata predicate reaches the parquet
    source of the pruned candidate scan (PushedFilters), composing
    with the cluster-directory pruning — never a separate join."""
    plan = IVF.ivf_ann_from_store(
        spark, store, QIDS, k=5, n_probe=2, filter_pred="label = 3"
    )._jdf.queryExecution().executedPlan().toString()
    pushed = [
        l for l in plan.splitlines()
        if "PushedFilters" in l and "label" in l
    ]
    assert pushed, plan


def test_unpersisted_filter_column_fails_loudly(spark, emb):
    path = os.path.join("spark-warehouse", "test_ivf_nokeep")
    shutil.rmtree(path, ignore_errors=True)
    IVF.write_ivf_store(
        emb.select("vec_id", "embedding"), path, n_clusters=8, method="det"
    )
    with pytest.raises(Exception, match="label|UNRESOLVED|cannot be resolved"):
        IVF.ivf_ann_from_store(
            spark, path, QIDS, k=5, n_probe=2, filter_pred="label = 3"
        )


def test_append_enforces_keep_cols(spark, emb, store):
    with pytest.raises(ValueError, match="keep_cols"):
        IVF.append_ivf_batch(
            emb.select("vec_id", "embedding").where("vec_id < 0"), store
        )


def test_append_carries_keep_cols(spark, emb):
    """Appended batches persist the store's keep_cols: a filtered
    serve over a half-built + half-appended store fills k per query
    and can surface candidates from the APPENDED half — i.e. appended
    rows are visible through the metadata predicate, not just the
    build wave."""
    path = os.path.join("spark-warehouse", "test_ivf_filtered_append")
    shutil.rmtree(path, ignore_errors=True)
    half = emb.select("vec_id", "embedding", "label")
    IVF.write_ivf_store(
        half.where("vec_id % 2 = 0"), path, n_clusters=8, method="det",
        keep_cols=("label",),
    )
    IVF.append_ivf_batch(half.where("vec_id % 2 = 1"), path)
    served = IVF.ivf_ann_from_store(
        spark, path, QIDS, k=20, n_probe=8, filter_pred=PRED
    ).collect()
    assert len(served) == len(QIDS) * 20
    cand_ids = {r.cand_id for r in served}
    assert any(c % 2 == 1 for c in cand_ids), "appended rows not served"
    labels = {
        r.label
        for r in emb.where(F.col("vec_id").isin(list(cand_ids)))
        .select("label").collect()
    }
    assert all(l % 2 == 0 for l in labels)


def test_build_refuses_reserved_keep_cols(spark, emb):
    """keep_cols naming a store-internal column (cluster_id, nrm, the
    id/vector columns) must refuse at validation time with the loud
    ValueError, not die later as an ambiguous-reference analysis error
    inside the build write (r10 ADVICE)."""
    path = os.path.join("spark-warehouse", "test_ivf_reserved")
    frame = emb.select(
        "vec_id", "embedding", "label", F.lit(0).alias("cluster_id")
    )
    for bad in ("cluster_id", "nrm", "vec_id", "embedding"):
        shutil.rmtree(path, ignore_errors=True)
        with pytest.raises(ValueError, match="keep_cols"):
            IVF.write_ivf_store(
                frame, path, n_clusters=8, method="det", keep_cols=(bad,)
            )
