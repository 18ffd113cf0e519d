"""r14 (r13 VERDICT item 7): EVERY ledger-backed foreachBatch writer
rides the same shared self-maintenance cadence
(snapshots.LedgerVacuumCadence) the postings and IVF tiers got in
r12/r13 — this file pins the three newly wired tiers (zonemap, bloom,
binary sketches): pass counts bounded by the full-interval re-arm
(never a scan per micro-batch), the ledger checkpoint lands, the
resting ledger is bounded, and the store still serves exactly after
maintenance. The sketch/top-k/BPE writers mint no per-commit versions,
so the cadence is N/A there by design (their docstrings say why)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.sources.tables import load_table


def _count_passes(writer):
    """Wrap the writer's cadence so each ACTUAL vacuum pass (a returned
    report, not a mere due-check) is counted."""
    passes = []
    orig = writer._vacuum.maybe_vacuum

    def counting(*a, **kw):
        rep = orig(*a, **kw)
        if rep is not None:
            passes.append(rep)
        return rep

    writer._vacuum.maybe_vacuum = counting
    return passes


def _ledger_state(store):
    vdir = os.path.join(store, "_versions")
    files = [
        f for f in os.listdir(vdir)
        if f.endswith(".json") and f[:-5].isdigit()
    ]
    return files, os.path.exists(os.path.join(vdir, "_checkpoint.json"))


def _assert_cadence(passes, n_commits, vacuum_every, store):
    # the full-interval re-arm bounds passes by ceil(N/vacuum_every):
    # after a pass the ledger rests near keep_versions, and the cadence
    # is not due again until a FULL interval of new commits lands
    assert passes, "the cadence never fired over a ledger past threshold"
    assert len(passes) <= math.ceil(n_commits / vacuum_every), (
        f"{len(passes)} passes over {n_commits} commits at "
        f"vacuum_every={vacuum_every} — the re-arm is leaking "
        "(a pass per micro-batch is the r12 wart this cadence fixed)"
    )
    files, has_checkpoint = _ledger_state(store)
    assert has_checkpoint, "vacuum passed but no ledger checkpoint landed"
    # resting ledger: ~keep_versions + the commits since the last pass
    assert len(files) <= vacuum_every + 3, (
        f"ledger still holds {len(files)} per-commit files — "
        "the checkpoint did not fold them"
    )


def test_streaming_zonemap_cadence_self_maintains(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.sources.zonemap import (
        StreamingZonemapIngest,
        zonemap_read,
    )

    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "zm")
    st = StreamingZonemapIngest(
        path, "l_shipdate", n_files=4, vacuum_every=3, keep_versions=1
    )
    passes = _count_passes(st)
    n_batches = 8
    for i in range(n_batches):
        st.foreach_batch(li.where(f"l_orderkey % {n_batches} = {i}"), i)
    _assert_cadence(passes, n_batches, 3, path)
    # the maintained store still reads exactly
    assert zonemap_read(spark, path).count() == li.count()
    # and a replayed committed batch is still a no-op THROUGH the
    # checkpointed ledger (the replay tags must survive maintenance)
    st2 = StreamingZonemapIngest(path, "l_shipdate", n_files=4)
    st2.foreach_batch(li.where(f"l_orderkey % {n_batches} = 1"), 1)
    assert zonemap_read(spark, path).count() == li.count()


def test_streaming_bloom_cadence_self_maintains(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.sources.bloomindex import (
        StreamingBloomIngest,
        bloom_multiget,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "bl")
    st = StreamingBloomIngest(
        path, "o_custkey", n_files=4, vacuum_every=3, keep_versions=1
    )
    passes = _count_passes(st)
    n_batches = 8
    for i in range(n_batches):
        st.foreach_batch(orders.where(f"o_orderkey % {n_batches} = {i}"), i)
    _assert_cadence(passes, n_batches, 3, path)
    keys = [7, 19, 42]
    got = sorted(
        map(tuple, bloom_multiget(spark, path, keys).collect())
    )
    want = sorted(
        map(tuple, orders.where(F.col("o_custkey").isin(keys)).collect())
    )
    assert got == want and got


def test_streaming_binary_cadence_self_maintains(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.functions import quant as Q

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "bq")
    st = Q.StreamingBinaryStore(path, vacuum_every=3, keep_versions=1)
    passes = _count_passes(st)
    n_batches = 8
    for i in range(n_batches):
        st.foreach_batch(emb.where(f"vec_id % {n_batches} = {i}"), i)
    _assert_cadence(passes, n_batches, 3, path)
    # serve-identical to a one-shot reference store post-maintenance
    ref = str(tmp_path / "bq_ref")
    Q.write_binary_store(emb, ref)
    qv = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where("vec_id IN (10, 20, 30)").collect()
    ]
    got = sorted(map(tuple, Q.binary_store_ann(spark, path, qv, k=5).collect()))
    want = sorted(map(tuple, Q.binary_store_ann(spark, ref, qv, k=5).collect()))
    assert got == want and got


def test_cadence_threshold_refusal_is_uniform(tmp_path):
    """The constructor refusal (vacuum_every <= keep_versions + 1 would
    re-fire a full vacuum every micro-batch) must hold on every newly
    wired tier, same as the postings/IVF tiers."""
    from spark_indexedrdd_spark.functions.quant import StreamingBinaryStore
    from spark_indexedrdd_spark.sources.bloomindex import StreamingBloomIngest
    from spark_indexedrdd_spark.sources.zonemap import StreamingZonemapIngest

    for ctor in (
        lambda: StreamingZonemapIngest(
            str(tmp_path / "z"), "l_shipdate",
            vacuum_every=2, keep_versions=1,
        ),
        lambda: StreamingBloomIngest(
            str(tmp_path / "b"), "o_custkey",
            vacuum_every=2, keep_versions=1,
        ),
        lambda: StreamingBinaryStore(
            str(tmp_path / "q"), vacuum_every=2, keep_versions=1
        ),
    ):
        with pytest.raises(ValueError, match="vacuum_every"):
            ctor()
