"""Tombstone deletes on the persisted IVF store: serve parity against
the DuckDB twin, replay idempotence, crash invisibility, compaction
equivalence, and the dedup path's tombstone awareness.

IndexedRDD `delete(ks)` semantics (IndexedRDD.scala:120-123) carried
onto the vector index — the delete is a manifest-pointer-committed
tombstone, never a rewrite; compaction is the explicit rewrite."""

import os

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions.ivf import (
    compact_ivf_store,
    delete_ivf_ids,
    incremental_semantic_dedup_from_store,
    ivf_ann,
    ivf_ann_from_store,
    read_ivf_store,
    sql_ivf_ann,
    write_ivf_store,
)
from spark_indexedrdd_spark.sources.tables import load_table
from tests.oracle_utils import compare, duck_con

QIDS = [50, 100, 150, 200, 250, 300, 400, 450]  # survivors of % 7 = 0


@pytest.fixture()
def store(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ivf")
    write_ivf_store(emb, path, n_clusters=16, method="det")
    return emb, path


def test_serve_without_delete_matches_inplan(spark, store):
    emb, path = store
    served = ivf_ann_from_store(spark, path, QIDS, k=5, n_probe=4)
    inplan = ivf_ann(emb, QIDS, k=5, n_clusters=16, n_probe=4, method="det")
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inplan.collect())
    )


def test_delete_then_serve_matches_exclusion_oracle(spark, sf_dir, store):
    _emb, path = store
    doomed = [i for i in range(0, 600, 7)]
    assert delete_ivf_ids(spark, path, doomed, batch_tag="takedown-1")
    served = ivf_ann_from_store(spark, path, QIDS, k=5, n_probe=4)
    rep = compare(
        served,
        sql_ivf_ann(query_ids=QIDS, exclude_pred="vec_id % 7 = 0"),
        duck_con(sf_dir),
    )
    assert rep["ok"], rep
    # deleted ids are gone from BOTH roles
    rows = served.collect()
    assert rows and all(r.cand_id % 7 != 0 and r.q_id % 7 != 0 for r in rows)


def test_deleted_query_id_yields_no_rows(spark, store):
    _emb, path = store
    delete_ivf_ids(spark, path, [0], batch_tag="t0")
    out = ivf_ann_from_store(spark, path, [0], k=5).collect()
    assert out == []


def test_replay_is_noop_and_crash_is_invisible(spark, store):
    emb, path = store
    assert delete_ivf_ids(spark, path, [0, 7], batch_tag="b1") is True
    before = sorted(map(tuple, ivf_ann_from_store(spark, path, QIDS).collect()))
    # replay of a committed tag: no-op, same results
    assert delete_ivf_ids(spark, path, [0, 7], batch_tag="b1") is False
    assert sorted(map(tuple, ivf_ann_from_store(spark, path, QIDS).collect())) == before
    # crash shape: tombstone directory on disk but tag never committed
    # to meta → readers must not see it (manifest-pointer visibility)
    emb.where("vec_id = 50").select("vec_id").write.mode("overwrite").parquet(
        os.path.join(path, "tombstones", "crashed")
    )
    assert sorted(map(tuple, ivf_ann_from_store(spark, path, QIDS).collect())) == before


def test_compaction_preserves_serve_and_drops_rows(spark, store):
    _emb, path = store
    doomed = [i for i in range(0, 600, 7)]
    delete_ivf_ids(spark, path, doomed, batch_tag="d1")
    before = sorted(map(tuple, ivf_ann_from_store(spark, path, QIDS).collect()))
    n_live = compact_ivf_store(spark, path)
    vecs, _ = read_ivf_store(spark, path)
    assert vecs.where(F.col("vec_id") % 7 == 0).count() == 0
    assert vecs.count() == n_live
    assert not os.path.exists(os.path.join(path, "tombstones"))
    after = sorted(map(tuple, ivf_ann_from_store(spark, path, QIDS).collect()))
    assert after == before
    # compaction with no tombstones is a no-op shortcut
    assert compact_ivf_store(spark, path) == n_live


def test_delete_accepts_dataframe_and_rejects_bad_tag(spark, store):
    emb, path = store
    ids_df = emb.where("vec_id % 7 = 0").select("vec_id")
    assert delete_ivf_ids(spark, path, ids_df, batch_tag="df-batch")
    served = ivf_ann_from_store(spark, path, QIDS, k=5)
    assert all(r.cand_id % 7 != 0 for r in served.collect())
    with pytest.raises(ValueError):
        delete_ivf_ids(spark, path, [1], batch_tag="../evil")


def test_incremental_dedup_ignores_tombstoned_neighbors(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(5)
    vs = [[float(x) for x in rng.normal(size=8)] for _ in range(8)]
    corpus = spark.createDataFrame(
        [(i, vs[i]) for i in range(8)], "vec_id long, embedding array<float>"
    )
    path = str(tmp_path / "ivf")
    write_ivf_store(corpus, path, n_clusters=2, method="det")
    batch = spark.createDataFrame(
        [(100, vs[3])], "vec_id long, embedding array<float>"
    )
    r = incremental_semantic_dedup_from_store(batch, path, threshold=0.999).collect()
    assert len(r) == 1 and not r[0].keep and r[0].dup_of == 3
    # delete the only near-neighbor → the replayed batch now KEEPs
    delete_ivf_ids(spark, path, [3], batch_tag="rm3")
    r2 = incremental_semantic_dedup_from_store(batch, path, threshold=0.999).collect()
    assert len(r2) == 1 and r2[0].keep and r2[0].dup_of is None


@pytest.mark.slow
def test_reingest_tombstoned_id_excluded_until_compact(spark, store):
    """Delete-wins until compaction: append_ivf_batch drops currently
    tombstoned ids (they would be written but permanently shadowed by
    the serve anti-join); after compaction the id is re-addable."""
    from spark_indexedrdd_spark.functions.ivf import append_ivf_batch

    emb, path = store
    assert delete_ivf_ids(spark, path, [50], batch_tag="td")
    append_ivf_batch(emb.where("vec_id = 50"), path)
    # the original (tombstoned) row is still physically present —
    # deletes are logical — but the re-ingest must NOT add a shadow
    # copy that compaction-someday would silently resurrect
    vecs, _ = read_ivf_store(spark, path)
    assert vecs.where("vec_id = 50").count() == 1, "shadow copy written"
    compact_ivf_store(spark, path)
    vecs1, _ = read_ivf_store(spark, path)
    assert vecs1.where("vec_id = 50").count() == 0, "compaction kept dead row"
    append_ivf_batch(emb.where("vec_id = 50"), path)
    vecs2, _ = read_ivf_store(spark, path)
    assert vecs2.where("vec_id = 50").count() == 1


def test_delete_refuses_uncastable_ids(spark, store):
    """Ids that cast to NULL against the store's id type would anti-join
    nothing — a takedown that reports success and deletes nothing. The
    delete must refuse loudly instead."""
    import pytest as _pytest

    _emb, path = store
    # ANSI sessions throw CAST_INVALID_INPUT from the cast itself;
    # non-ANSI sessions null the value and hit the explicit guard —
    # either way the delete fails loudly instead of no-op'ing
    with _pytest.raises(Exception, match="cast|CAST"):
        delete_ivf_ids(spark, path, ["not-a-number"], batch_tag="bad")


def test_store_serve_handles_float_vectors_and_int_ids(spark, sf_dir, tmp_path):
    """The probe frame's schema derives from the STORE's own types — a
    store with float32 embeddings or non-long ids must serve, not fail
    (or silently mis-cast) against a hardcoded long/array<double>
    literal."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("int").alias("vec_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    path = str(tmp_path / "ivf_f32")
    write_ivf_store(emb, path, n_clusters=8, method="det")
    rows = ivf_ann_from_store(spark, path, [50, 100], k=3, n_probe=4).collect()
    assert len(rows) > 0
    assert {r.q_id for r in rows} <= {50, 100}


def test_vacuum_floor_applies_to_ivf_as_of_surface(spark, store):
    """vacuum_store's retention floor covers the IVF ledger too (its
    as-of surface is delete history): after vacuum(keep_versions=1), a
    pre-takedown `version=` serve refuses loudly while the live serve
    is byte-identical. The IVF store has no manifest roots, so the
    vacuum is floor-advance (+ tombstone retention) only."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    emb, path = store
    v_pre = SC.read_meta(path)["version"]
    delete_ivf_ids(
        spark, path, emb.where("vec_id % 7 = 0").select("vec_id"),
        batch_tag="vac-d1",
    )
    pre_live = sorted(
        map(tuple, ivf_ann_from_store(spark, path, QIDS, k=5).collect())
    )
    out = SC.vacuum_store(path, keep_versions=1)
    assert out["floor"] > v_pre
    # the takedown's tombstones are retained (the live meta names them)
    assert out["removed_tombstones"] == []
    with pytest.raises(ValueError, match="floor"):
        ivf_ann_from_store(spark, path, QIDS, k=5, version=v_pre)
    assert (
        sorted(map(tuple, ivf_ann_from_store(spark, path, QIDS, k=5).collect()))
        == pre_live
    )
