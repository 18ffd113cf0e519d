"""Tests for the targeted-partition multiget fast path
(reference IndexedRDD.scala:79-94)."""

import pytest

from spark_indexedrdd_spark.core import IndexedDataFrame
from spark_indexedrdd_spark.operators.point import PointLookupIndex, stable_hash


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame([(i, i * 2) for i in range(200)], "k long, v long")
    return IndexedDataFrame.build(df, "k", num_partitions=5)


def test_multiget_hits_and_misses(idx):
    pli = PointLookupIndex(idx)
    assert pli.multiget([0, 7, 199, -1, 1000]) == {0: 0, 7: 14, 199: 398}
    assert pli.get(42) == 84
    assert pli.get(-42) is None


def test_string_keys(spark):
    df = spark.createDataFrame(
        [(f"key{i}", i) for i in range(50)], "k string, v long"
    )
    idx = IndexedDataFrame.build(df, "k", num_partitions=4)
    pli = PointLookupIndex(idx)
    assert pli.multiget(["key0", "key49", "nope"]) == {"key0": 0, "key49": 49}


def test_composite_keys(spark):
    df = spark.createDataFrame(
        [(i, f"s{j}", i + j) for i in range(10) for j in range(3)],
        "k1 long, k2 string, v long",
    )
    idx = IndexedDataFrame.build(df, ["k1", "k2"], num_partitions=4)
    pli = PointLookupIndex(idx)
    assert pli.multiget([(0, "s0"), (9, "s2"), (5, "nope")]) == {
        (0, "s0"): 0,
        (9, "s2"): 11,
    }


def test_native_index_partition_layout_assumption(spark):
    """NativeHashPointIndex's core assumption: repartition(n, keys)
    places rows in physical partition pmod(hash(keys), n). Full check
    over long, string, and composite keys."""
    from pyspark.sql import functions as F

    cases = [
        (spark.range(0, 500).select(F.col("id").alias("k"), F.lit(1).alias("v")), ["k"], 8),
        (
            spark.createDataFrame([(f"s{i}", i) for i in range(200)], "k string, v int"),
            ["k"],
            4,
        ),
        (
            spark.createDataFrame(
                [(i, f"x{i % 5}", i) for i in range(200)], "k1 long, k2 string, v int"
            ),
            ["k1", "k2"],
            4,
        ),
    ]
    for df, keys, n in cases:
        part = df.repartition(n, *keys)
        nk = len(keys)
        got = part.rdd.mapPartitionsWithIndex(
            lambda pid, it, nk=nk: [(pid, tuple(r[:nk])) for r in it]
        ).collect()
        expect = {
            tuple(r[:nk]): r["__p"]
            for r in part.select(
                *keys, F.pmod(F.hash(*keys), F.lit(n)).alias("__p")
            ).collect()
        }
        assert all(expect[k] == pid for pid, k in got)


def test_native_index_multiget(spark):
    from spark_indexedrdd_spark.operators.point import NativeHashPointIndex

    df = spark.createDataFrame([(i, i * 3) for i in range(300)], "k long, v long")
    idx = IndexedDataFrame.build(df, "k", num_partitions=6)
    ni = NativeHashPointIndex(idx)
    assert ni.multiget([0, 7, 299, -1]) == {0: 0, 7: 21, 299: 897}
    assert ni.get(42) == 126
    assert ni.get(-42) is None
    parts = ni.owning_partitions([(3,), (17,)])
    assert sum(len(v) for v in parts.values()) == 2


def test_native_index_composite(spark):
    from spark_indexedrdd_spark.operators.point import NativeHashPointIndex

    df = spark.createDataFrame(
        [(i, f"s{j}", i * 10 + j) for i in range(20) for j in range(3)],
        "k1 long, k2 string, v long",
    )
    idx = IndexedDataFrame.build(df, ["k1", "k2"], num_partitions=4)
    ni = NativeHashPointIndex(idx)
    assert ni.multiget([(0, "s0"), (19, "s2"), (5, "zz")]) == {
        (0, "s0"): 0,
        (19, "s2"): 192,
    }


def test_stable_hash_deterministic():
    assert stable_hash("abc") == stable_hash("abc")
    assert stable_hash((1, "a")) == stable_hash((1, "a"))
    assert stable_hash(7) == 7


def test_targets_only_owning_partitions(idx):
    pli = PointLookupIndex(idx)
    ks = [3, 17]
    parts = {pli.partition_of(k) for k in ks}
    assert len(parts) <= 2  # the job plan touches at most these
