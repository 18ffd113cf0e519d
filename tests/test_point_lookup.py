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


# --------------------------------------------------------------------- #
# driver-side Murmur3 (hashing.py): must equal Spark's F.hash exactly
# --------------------------------------------------------------------- #


def test_python_murmur3_matches_spark_hash(spark):
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from spark_indexedrdd_spark import hashing as H

    cases = [
        ("k long", [(v,) for v in [0, 1, -1, 2**33, -(2**40), 7]]),
        ("k int", [(v,) for v in [0, 1, -1, 2**31 - 1, -(2**31)]]),
        ("k string", [(s,) for s in ["", "a", "abc", "abcd", "héllo", "x" * 37]]),
        ("k double", [(v,) for v in [0.0, -0.0, 1.5, -3.25, 1e300]]),
        ("k boolean", [(True,), (False,)]),
        ("k date", [(datetime.date(1970, 1, 1),), (datetime.date(2026, 8, 13),)]),
        (
            T.StructType(
                [
                    T.StructField("a", T.LongType()),
                    T.StructField("b", T.StringType()),
                ]
            ),
            [(1, "x"), (2, None), (None, "y"), (None, None), (99, "zz")],
        ),
    ]
    for schema, rows in cases:
        df = spark.createDataFrame(rows, schema=schema)
        got = df.select(F.hash(*df.columns).alias("h")).collect()
        hs = H.hashers_for_schema(df.schema)
        assert hs is not None
        for g, r in zip(got, rows):
            assert g["h"] == H.spark_hash_tuple(tuple(r), hs), (schema, r)


def test_timestamp_keys_have_no_driver_hash(spark):
    # session-TZ-dependent — must fall back to the ask-Spark path
    from pyspark.sql import types as T

    from spark_indexedrdd_spark import hashing as H

    schema = T.StructType([T.StructField("t", T.TimestampType())])
    assert H.hashers_for_schema(schema) is None


def test_pli_native_path_used_for_contract_frames(spark):
    df = spark.createDataFrame([(i, i) for i in range(100)], "k long, v long")
    idx = IndexedDataFrame.build(df, "k", num_partitions=5)
    pli = PointLookupIndex(idx)
    assert pli._hashers is not None  # zero-extra-shuffle layout
    assert pli.multiget([0, 99, 1000]) == {0: 0, 99: 99}


def test_pli_falls_back_when_layout_breaks_contract(spark):
    # frame whose physical partition count disagrees with num_partitions:
    # the layout-independent stable_hash path must kick in and still be
    # correct
    df = spark.createDataFrame([(i, i * 3) for i in range(100)], "k long, v long")
    idx = IndexedDataFrame(df.repartition(3, "k").cache(), ["k"], 7)
    pli = PointLookupIndex(idx)
    assert pli._hashers is None
    assert pli.multiget([0, 50, 99, -5]) == {0: 0, 50: 150, 99: 297}
    assert 0 <= pli.partition_of(12345) < 7


def test_nli_owning_partitions_driver_side(spark):
    from spark_indexedrdd_spark.operators.point import NativeHashPointIndex

    df = spark.createDataFrame(
        [(f"doc{i}", float(i)) for i in range(80)], "k string, v double"
    )
    idx = IndexedDataFrame.build(df, "k", num_partitions=6)
    ni = NativeHashPointIndex(idx)
    assert ni._hashers is not None
    ks = [f"doc{i}" for i in range(0, 80, 7)] + ["missing"]
    assert ni.multiget(ks) == {f"doc{i}": float(i) for i in range(0, 80, 7)}
