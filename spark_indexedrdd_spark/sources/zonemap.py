"""Zone-map file skipping: per-file min/max sidecar statistics on a
clustering column, consulted BEFORE the scan is scheduled.

The reference has no storage layer at all (SURVEY.md §2.5 — RDD
actions over an in-memory index); this is the at-rest analog of its
partition-pruned point lookups, for RANGE predicates on a column you
don't want to hive-partition by. Hive partitioning (sources/sinks.py)
prunes directories but explodes at high cardinality (a directory per
distinct l_shipdate is ~2,500 dirs at SF1 and pure small-file poison at
100 TB); parquet row-group stats prune *inside* a task but every file
still gets listed, split and scheduled. A zone map closes the gap —
the Delta/Iceberg data-skipping design, self-contained on plain
parquet:

- the writer CLUSTERS the data by the zone column (range repartition +
  within-partition sort), so each file covers a tight value range;
- a one-pass, column-pruned aggregation records per-file min/max/count
  into a ``zones`` parquet sidecar (#files rows — KBs per thousand
  files, the same order as a Delta log checkpoint);
- readers push the range predicate into the SIDECAR scan, collect only
  the surviving file names, and hand exactly those files to the real
  scan. At 100 TB / 1M files a one-week range over a year of data
  schedules ~2% of the tasks instead of listing everything; the
  driver-side cost is |surviving files| strings, never the full list.

The residual predicate stays on the scan (zone maps prune at file
granularity, row-group stats then prune within), so results are
value-identical to a full-scan filter — which is exactly what the
DuckDB oracle checks.

Commit protocol (functions/store_commit): retract → data + sidecar →
meta-last commit; a crash mid-rebuild leaves the store clearly
uncommitted, and readers refuse a sidecar that could mix builds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_zonemap_table(
    df: DataFrame,
    path: str,
    zone_col: str,
    n_files: int | None = None,
) -> None:
    """Cluster ``df`` by ``zone_col`` and persist it with a per-file
    min/max zone map.

    ``n_files`` sets the range-partition count (→ output file count);
    default lets AQE pick. Sizing rule at scale: target
    ``spark.sql.files.maxPartitionBytes``-sized files so one pruned
    file is one task."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = df.sparkSession
    SC.retract_meta(path)
    out = (
        df.repartitionByRange(n_files, zone_col)
        if n_files
        else df.repartitionByRange(zone_col)
    )
    out.sortWithinPartitions(zone_col).write.mode("overwrite").parquet(
        path + "/data"
    )
    stats = (
        spark.read.parquet(path + "/data")
        # hidden _metadata column: no extra data columns are read — the
        # stats pass scans exactly one column of the files it indexes
        .select(
            F.col("_metadata.file_path").alias("file"),
            F.col(zone_col).alias("z"),
        )
        .groupBy("file")
        .agg(
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
            F.count("*").cast("long").alias("n_rows"),
        )
        # store file BASENAMES (the data dir is flat) — the store must
        # stay relocatable (copy/rsync between clusters)
        .select(
            F.element_at(F.split(F.col("file"), "/"), -1).alias("file"),
            "z_min",
            "z_max",
            "n_rows",
        )
    )
    stats.coalesce(1).write.mode("overwrite").parquet(path + "/zones")
    SC.commit_meta(path, {"zone_col": zone_col})


def zonemap_prune_files(
    spark: SparkSession,
    path: str,
    lo=None,
    hi=None,
) -> "tuple[list[str], int]":
    """(surviving absolute file paths, total file count) for an
    inclusive [lo, hi] range on the store's zone column. The range
    predicate is evaluated IN the sidecar scan — only survivors'
    names ever reach the driver. Bounds may be None (open side)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    SC.read_meta(path)  # commit-marker check
    stats = spark.read.parquet(path + "/zones")
    total = stats.count()
    keep = stats
    if lo is not None:
        keep = keep.where(F.col("z_max") >= F.lit(lo))
    if hi is not None:
        keep = keep.where(F.col("z_min") <= F.lit(hi))
    files = [
        os.path.join(path, "data", r.file) for r in keep.select("file").collect()
    ]
    return sorted(files), total


def zonemap_read(
    spark: SparkSession,
    path: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """The store's rows with ``zone_col`` in the inclusive [lo, hi]
    range, scanning only zone-surviving files. Value-identical to
    ``read.parquet(data).where(...)`` — the zone map changes which
    tasks run, never the answer (the residual filter and the parquet
    row-group stats still apply inside each file)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    zone_col = SC.read_meta(path)["zone_col"]
    files, _total = zonemap_prune_files(spark, path, lo, hi)
    if not files:
        return spark.read.parquet(path + "/data").where(F.lit(False))
    df = spark.read.parquet(*files)
    if lo is not None:
        df = df.where(F.col(zone_col) >= F.lit(lo))
    if hi is not None:
        df = df.where(F.col(zone_col) <= F.lit(hi))
    return df
