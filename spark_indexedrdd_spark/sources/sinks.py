"""Sinks: partitioned/bucketed parquet writers with read-back helpers.

The reference has no sinks at all (SURVEY.md §2.5 — RDD actions only).
At 100 TB the write layout IS the read performance of every downstream
job: partition columns give partition pruning, bucketing gives
exchange-free joins (sources/bucketed.py), and target file sizing avoids
the small-files problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """Write parquet partitioned by ``partition_cols`` (hive layout →
    downstream filters on those columns prune whole directories).

    ``target_partitions`` repartitions by the partition columns first so
    each output directory gets few, large files instead of one shard per
    task (the small-files problem at scale)."""
    out = df
    if target_partitions:
        out = df.repartition(target_partitions, *partition_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
