"""SCD2 history merge: branch semantics, idempotent replay, chained
batches, and the point-in-time view."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_indexedrdd_spark.operators import scd as S

T0, T1, T2 = "2020-01-01 00:00:00", "2021-01-01 00:00:00", "2022-01-01 00:00:00"


def _rows(df):
    return {
        (r.k, str(r.valid_from), str(r.valid_to), r.is_current): (r.v, r.s)
        for r in df.collect()
    }


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [Row(k=1, v=10.0, s="a"), Row(k=2, v=20.0, s="b"),
         Row(k=3, v=30.0, s="c"), Row(k=4, v=None, s="d")]
    )


def test_scd2_apply_branches(spark, dim):
    hist = S.scd2_init(dim, T0)
    updates = spark.createDataFrame(
        [
            Row(k=1, v=11.0, s="a"),   # changed value -> close + reopen
            Row(k=2, v=20.0, s="b"),   # identical -> no-op
            Row(k=4, v=None, s="d"),   # null-safe identical -> no-op
            Row(k=9, v=90.0, s="z"),   # new key -> insert open
        ]
    )
    out = S.scd2_apply(hist, updates, ["k"], ["v", "s"], T1)
    got = _rows(out)
    assert got == {
        (1, T0, T1, False): (10.0, "a"),
        (1, T1, "None", True): (11.0, "a"),
        (2, T0, "None", True): (20.0, "b"),
        (3, T0, "None", True): (30.0, "c"),
        (4, T0, "None", True): (None, "d"),
        (9, T1, "None", True): (90.0, "z"),
    }


def test_scd2_null_transition_counts_as_change(spark, dim):
    hist = S.scd2_init(dim, T0)
    updates = spark.createDataFrame([Row(k=4, v=40.0, s="d")])
    out = S.scd2_apply(hist, updates, ["k"], ["v", "s"], T1)
    got = _rows(out)
    assert got[(4, T0, T1, False)] == (None, "d")
    assert got[(4, T1, "None", True)] == (40.0, "d")


def test_scd2_chained_batches(spark, dim):
    hist = S.scd2_init(dim, T0)
    h1 = S.scd2_apply(
        hist,
        spark.createDataFrame([Row(k=1, v=11.0, s="a")]),
        ["k"], ["v", "s"], T1,
    )
    h2 = S.scd2_apply(
        h1,
        spark.createDataFrame([Row(k=1, v=12.0, s="a")]),
        ["k"], ["v", "s"], T2,
    )
    got = _rows(h2)
    assert got[(1, T0, T1, False)] == (10.0, "a")
    assert got[(1, T1, T2, False)] == (11.0, "a")
    assert got[(1, T2, "None", True)] == (12.0, "a")
    # exactly one open row per key
    open_per_key = (
        h2.where("is_current").groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_per_key)


def test_scd2_replay_is_idempotent(spark, dim):
    """Re-applying the SAME batch at the SAME named batch_ts leaves the
    history unchanged — the update now equals the open row, so every
    update hits the no-op branch."""
    hist = S.scd2_init(dim, T0)
    batch = spark.createDataFrame([Row(k=1, v=11.0, s="a")])
    h1 = S.scd2_apply(hist, batch, ["k"], ["v", "s"], T1)
    h2 = S.scd2_apply(h1, batch, ["k"], ["v", "s"], T1)
    assert _rows(h1) == _rows(h2)


def test_scd2_as_of(spark, dim):
    hist = S.scd2_init(dim, T0)
    h1 = S.scd2_apply(
        hist,
        spark.createDataFrame([Row(k=1, v=11.0, s="a")]),
        ["k"], ["v", "s"], T1,
    )
    before = {r.k: r.v for r in S.scd2_as_of(h1, "2020-06-01").collect()}
    after = {r.k: r.v for r in S.scd2_as_of(h1, "2021-06-01").collect()}
    at_batch = {r.k: r.v for r in S.scd2_as_of(h1, T1).collect()}
    assert before[1] == 10.0 and after[1] == 11.0
    assert at_batch[1] == 11.0  # valid_from inclusive, valid_to exclusive
    prior = S.scd2_as_of(h1, "2019-01-01").collect()
    assert prior == []  # before the dimension existed


def test_scd2_closed_rows_bypass_the_join(spark, dim):
    """Plan shape: the update join's subtree must filter is_current —
    closed history rides only the union, so at scale the closed
    majority is never shuffled."""
    hist = S.scd2_init(dim, T0)
    h1 = S.scd2_apply(
        hist,
        spark.createDataFrame([Row(k=1, v=11.0, s="a")]),
        ["k"], ["v", "s"], T1,
    )
    h2 = S.scd2_apply(
        h1,
        spark.createDataFrame([Row(k=2, v=22.0, s="b")]),
        ["k"], ["v", "s"], T2,
    )
    from spark_indexedrdd_spark.plans import explain as X

    plan = X.physical_plan(h2)
    assert "is_current" in plan
    got = _rows(h2)
    assert got[(1, T0, T1, False)] == (10.0, "a")  # survived two merges


def test_scd2_temporal_join(spark, dim):
    hist = S.scd2_apply(
        S.scd2_init(dim, T0),
        spark.createDataFrame([Row(k=1, v=11.0, s="a"),
                               Row(k=9, v=90.0, s="z")]),
        ["k"], ["v", "s"], T1,
    )
    facts = spark.createDataFrame(
        [
            Row(f_id=1, fk=1, ts="2020-06-01 00:00:00"),  # v=10 era
            Row(f_id=2, fk=1, ts="2021-06-01 00:00:00"),  # v=11 era
            Row(f_id=3, fk=1, ts=T1),                     # boundary -> new
            Row(f_id=4, fk=9, ts="2020-06-01 00:00:00"),  # before key existed
            Row(f_id=5, fk=77, ts="2021-06-01 00:00:00"), # unknown key
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.f_id: r.v
        for r in S.scd2_temporal_join(
            facts, hist, {"fk": "k"}, "ts"
        ).collect()
    }
    assert out[1] == 10.0
    assert out[2] == 11.0
    assert out[3] == 11.0           # valid_from inclusive
    assert out[4] is None           # fact predates the key
    assert out[5] is None           # unknown key kept with NULLs
    # no fact duplication: exactly one output row per fact
    assert len(out) == 5
