"""The shared data-first/meta-last commit protocol
(functions/store_commit.py) across the multi-part ANN stores: a crash
mid-rebuild over an EXISTING committed store must leave it clearly
uncommitted (readers raise FileNotFoundError) — never a silent MIX of
old and new parts — and the idempotent re-run must recommit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import store_commit as SC

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(SF_DIR + "/embeddings.parquet").limit(200)


def test_helper_roundtrip_and_retract(tmp_path):
    p = str(tmp_path / "m")
    with pytest.raises(FileNotFoundError):
        SC.read_meta(p)
    SC.commit_meta(p, {"a": 1})
    assert SC.read_meta(p) == {"a": 1}
    SC.retract_meta(p)
    with pytest.raises(FileNotFoundError):
        SC.read_meta(p)
    SC.retract_meta(p)  # idempotent on a fresh/retracted path


def _crash_rebuild(monkeypatch, write_fn, read_fn):
    """Shared scenario: committed build -> crash mid-rebuild -> reader
    must raise -> re-run recommits -> reader works."""
    write_fn()  # initial committed build
    read_fn()

    def boom(path, meta):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(SC, "commit_meta", boom)
    with pytest.raises(RuntimeError):
        write_fn()
    monkeypatch.undo()
    with pytest.raises(FileNotFoundError):
        read_fn()
    write_fn()  # idempotent re-run
    read_fn()


def test_ivf_store_rebuild_crash(spark, emb, tmp_path, monkeypatch):
    from spark_indexedrdd_spark.functions import ivf as IV

    p = str(tmp_path / "ivf")
    _crash_rebuild(
        monkeypatch,
        lambda: IV.write_ivf_store(emb, p, n_clusters=4, method="det"),
        lambda: IV.read_ivf_store(spark, p),
    )


def test_ivfpq_store_rebuild_crash(spark, emb, tmp_path, monkeypatch):
    from spark_indexedrdd_spark.functions import pq as PQ

    p = str(tmp_path / "ivfpq")
    _crash_rebuild(
        monkeypatch,
        lambda: PQ.write_ivfpq_store(
            emb, p, n_clusters=4, m=4, ksub=8, method="det"
        ),
        lambda: PQ.read_ivfpq_store(spark, p),
    )


def test_binary_store_rebuild_crash(spark, emb, tmp_path, monkeypatch):
    from spark_indexedrdd_spark.functions import quant as Q

    p = str(tmp_path / "bin")
    qv = [(0, [1.0] * 64)]
    _crash_rebuild(
        monkeypatch,
        lambda: Q.write_binary_store(emb, p),
        lambda: Q.binary_store_ann(spark, p, qv, k=2).collect(),
    )


def test_failed_fit_does_not_brick_committed_store(spark, emb, tmp_path):
    """retract happens only after the non-destructive fit: a rebuild
    whose centroid fit raises leaves the committed store readable."""
    from spark_indexedrdd_spark.functions import ivf as IV

    p = str(tmp_path / "ivf_fit")
    IV.write_ivf_store(emb, p, n_clusters=4, method="det")
    with pytest.raises(ValueError):
        IV.write_ivf_store(emb, p, n_clusters=4, method="no-such-method")
    vecs, cents = IV.read_ivf_store(spark, p)  # still committed
    assert vecs.count() == 200 and len(cents) == 4


def test_ivfpq_serve_defaults_n_probe_from_meta(spark, emb, tmp_path):
    """The build's n_probe is recorded so serving agrees with it: with
    no explicit argument the serve path reads it from the meta."""
    from spark_indexedrdd_spark.functions import pq as PQ

    p = str(tmp_path / "ivfpq_np")
    PQ.write_ivfpq_store(
        emb, p, n_clusters=4, n_probe=1, m=4, ksub=8, method="det"
    )
    qv = [(0, [1.0] * 64)]
    from_meta = PQ.ivfpq_store_ann(spark, p, qv, k=3).collect()
    explicit = PQ.ivfpq_store_ann(spark, p, qv, k=3, n_probe=1).collect()
    assert sorted(map(tuple, from_meta)) == sorted(map(tuple, explicit))


def test_classifier_model_rebuild_crash(spark, tmp_path, monkeypatch):
    from spark_indexedrdd_spark.functions import classifier as C

    docs = spark.read.parquet(SF_DIR + "/documents.parquet").limit(100)
    p = str(tmp_path / "clf")
    _crash_rebuild(
        monkeypatch,
        lambda: C.train_and_write_classifier(
            docs, F.col("text").contains("spark"), p, n_buckets=32, iters=1
        ),
        lambda: C.read_classifier_model(spark, p),
    )
