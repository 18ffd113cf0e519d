"""Bucketed-table persistence: co-located joins ACROSS jobs.

An IndexedDataFrame's hash-partitioning contract lives only as long as
its cache. Writing it as a bucketed table persists the contract: a later
session reading two tables bucketed by the same key into the same bucket
count joins them with no exchange at all (Catalyst recognizes the
bucketing as a HashPartitioning on the scan).

This is the durable form of the reference's partitioner-as-global-index
(reference IndexedRDD.scala:42): at 100 TB, re-shuffling a table on every
job start is the single biggest avoidable cost; bucketing pays the
shuffle once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_indexedrdd_spark.core import IndexedDataFrame


def write_bucketed(
    idf: IndexedDataFrame,
    table_name: str,
    num_buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ sorted within buckets) managed table.
    Sorting by key within buckets additionally lets sort-merge joins skip
    their sort — the scan is already ordered."""
    n = num_buckets or idf.num_partitions
    spark = idf.df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        # a crashed previous write can leave an orphaned managed-table
        # location that blocks re-creation (LOCATION_ALREADY_EXISTS)
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{table_name.lower()}", ignore_errors=True)
    (
        idf.df.write.mode(mode)
        .bucketBy(n, *idf.keys)
        .sortBy(*idf.keys)
        .format("parquet")
        .saveAsTable(table_name)
    )


def write_sorted(
    idf: IndexedDataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist as range-partitioned, key-sorted parquet — the file-layout
    substitute for the reference's per-partition ART index
    (SURVEY.md §1.4): each file covers a narrow key range and stores
    per-row-group min/max stats, so a point read prunes to one file and
    one row group. Complements bucketing (which optimizes joins) for the
    point-lookup-heavy workload."""
    (
        idf.df.repartitionByRange(idf.num_partitions, *idf.keys)
        .sortWithinPartitions(*idf.keys)
        .write.mode(mode)
        .parquet(path)
    )


def read_sorted(
    spark: SparkSession, path: str, keys: list[str] | str
) -> "DataFrame":
    """Reopen sorted parquet for point reads. Filters on the key reach
    the scan as PushedFilters and prune via file/row-group statistics."""
    return spark.read.parquet(path)


def read_bucketed(
    spark: SparkSession, table_name: str, keys: list[str] | str, num_buckets: int
) -> IndexedDataFrame:
    """Reopen a bucketed table as an IndexedDataFrame WITHOUT any
    repartition: the bucketing metadata already satisfies the
    partitioning contract."""
    df = spark.table(table_name)
    keys = [keys] if isinstance(keys, str) else list(keys)
    return IndexedDataFrame(df, keys, num_buckets)
