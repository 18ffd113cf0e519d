"""Source layer: the driver's TPC-H-ish parquet tables + KV view builders.

The reference has no source layer at all — ingestion is any upstream
``RDD[(K, V)]`` (reference IndexedRDD.scala:465-466). Here the source layer
is ``spark.read.parquet`` (columnar, predicate pushdown, column pruning)
plus builders for the KV views used throughout tests/bench (FIXTURES.md §2).

Scale note: reads keep Catalyst pushdown intact — callers filter/select on
the returned DataFrame and the parquet scan prunes row groups/columns.
Never collect here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_indexedrdd_spark.core import IndexedDataFrame

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Older testdata wrote events.ts as TIMESTAMP(NANOS), which Spark
        # only reads with this flag (as nanosecond longs). Current data is
        # timestamp[us]; the flag is a no-op there. Runtime-settable, so
        # set it defensively — the caller's session may not have it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events(df)
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` regardless of how the parquet encodes it.

    Observed encodings of the testdata over time:

    - ``timestamp[us]`` without timezone (current): Spark infers
      TIMESTAMP_NTZ (wall-clock, no zone).
    - TIMESTAMP(NANOS) (legacy): only readable with
      ``spark.sql.legacy.parquet.nanosAsLong=true`` → arrives as
      nanosecond LongType.
    - ``timestamp[us, tz=UTC]``: Spark reads TIMESTAMP_LTZ.

    All three normalize to:

    - ``ts_us``  bigint microseconds since the UTC epoch — the column
                 event-time operators compare/order on, so Spark and the
                 DuckDB oracle use identical integer arithmetic.
    - ``ts``     TIMESTAMP (instant) rebuilt from ``ts_us`` so every
                 branch yields the same type downstream.

    The NTZ branch uses ``timestampdiff(MICROSECOND, ntz_epoch, ts)`` —
    pure wall-clock arithmetic, independent of the session timezone, so a
    plain non-UTC session (the driver's) computes the same ``ts_us`` as
    our UTC-pinned session. DuckDB's ``epoch_us(ts)`` on the same file is
    wall-clock micros too, so the engines agree exactly.
    """
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # legacy nanosAsLong path: nanos → floor-divide to micros
        df = df.withColumn("ts_us", F.expr("ts DIV 1000"))
    elif isinstance(ts_type, TimestampNTZType):
        # tz-independent: wall-clock micros since the NTZ epoch
        df = df.withColumn(
            "ts_us",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ),
        )
    elif isinstance(ts_type, TimestampType):
        df = df.withColumn("ts_us", F.unix_micros(F.col("ts")))
    else:
        raise TypeError(
            f"events.ts has unsupported type {ts_type}; expected "
            "TIMESTAMP, TIMESTAMP_NTZ, or legacy nanosAsLong LongType"
        )
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# --------------------------------------------------------------------- #
# KV views (FIXTURES.md §2) — the bench/oracle instantiations of the
# reference's IndexedRDD[K, V] on real tables.
# --------------------------------------------------------------------- #


def orders_kv(spark: SparkSession, sf_dir: str, cache: bool = True) -> IndexedDataFrame:
    """key=o_orderkey, value=o_totalprice — the flagship KV view."""
    df = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return IndexedDataFrame.from_unique(df, "o_orderkey", cache=cache)


def customer_kv(spark: SparkSession, sf_dir: str, cache: bool = True) -> IndexedDataFrame:
    """key=c_custkey, value=struct(c_acctbal, c_mktsegment) — nested value."""
    df = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.struct("c_acctbal", "c_mktsegment").alias("cval")
    )
    return IndexedDataFrame.from_unique(df, "c_custkey", cache=cache)


def lineitem_kv(spark: SparkSession, sf_dir: str, cache: bool = True) -> IndexedDataFrame:
    """Composite key (l_orderkey, l_linenumber) -> revenue.

    Exercises the reference's Tuple2 composite keys
    (KeySerializer.scala:145-176) as multi-column keys."""
    # raw IEEE product (no rounding): bit-identical across engines, unlike
    # ROUND at decimal midpoints (Spark HALF_UP vs DuckDB double math).
    # (l_orderkey, l_linenumber) is NOT unique in the testdata — build()
    # dedupes deterministically (max rev wins), exercising the reference's
    # duplicate-merge construction path (IndexedRDD.scala:463-486).
    df = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    return IndexedDataFrame.build(df, ["l_orderkey", "l_linenumber"], cache=cache)


def nation_kv(spark: SparkSession, sf_dir: str, cache: bool = True) -> IndexedDataFrame:
    df = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return IndexedDataFrame.from_unique(df, "n_nationkey", cache=cache)
