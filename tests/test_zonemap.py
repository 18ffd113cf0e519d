"""Zone-map file skipping: pruning actually skips files, results are
value-identical to a full-scan filter, commit marker fences crashed
rebuilds. (sources/zonemap.py — the at-rest range analog of the
reference's partition-pruned point lookups, PartitionPruningRDD usage
in IndexedRDD.scala:50-55.)"""

import os

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.sources.tables import load_table
from spark_indexedrdd_spark.sources.zonemap import (
    write_zonemap_table,
    zonemap_prune_files,
    zonemap_read,
)


@pytest.fixture(scope="module")
def li_store(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zm") / "lineitem_zm")
    li = load_table(spark, sf_dir, "lineitem")
    write_zonemap_table(li, path, "l_shipdate", n_files=16)
    return li, path


def test_pruning_skips_files_and_preserves_values(spark, li_store):
    li, path = li_store
    lo, hi = "1996-01-01", "1996-03-31"
    files, total = zonemap_prune_files(spark, path, lo, hi)
    assert total == 16
    # a one-quarter range over ~7 years of clustered dates must skip
    # most files — the property the clustering write exists for
    assert 0 < len(files) < total / 2
    got = zonemap_read(spark, path, lo, hi)
    want = li.where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi)
    )
    assert got.count() == want.count() > 0
    s = sorted(map(tuple, got.select("l_orderkey", "l_linenumber").collect()))
    w = sorted(map(tuple, want.select("l_orderkey", "l_linenumber").collect()))
    assert s == w


def test_open_bounds_and_empty_range(spark, li_store):
    li, path = li_store
    assert zonemap_read(spark, path).count() == li.count()  # no bounds
    hi_only = zonemap_read(spark, path, hi="1995-06-30")
    assert hi_only.count() == li.where("l_shipdate <= '1995-06-30'").count()
    # a range before every shipdate: zero files, empty frame, schema kept
    none = zonemap_read(spark, path, "1980-01-01", "1980-12-31")
    assert none.count() == 0
    assert none.columns == li.columns
    files, _ = zonemap_prune_files(spark, path, "1980-01-01", "1980-12-31")
    assert files == []


def test_numeric_zone_column(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_zm")
    o = load_table(spark, sf_dir, "orders")
    write_zonemap_table(o, path, "o_totalprice", n_files=8)
    got = zonemap_read(spark, path, 1000.0, 50000.0)
    want = o.where("o_totalprice BETWEEN 1000.0 AND 50000.0")
    assert got.count() == want.count() > 0
    files, total = zonemap_prune_files(spark, path, 1000.0, 5000.0)
    assert len(files) < total


def test_uncommitted_store_refused(spark, sf_dir, tmp_path):
    path = str(tmp_path / "zm")
    o = load_table(spark, sf_dir, "orders").limit(100)
    write_zonemap_table(o, path, "o_orderdate", n_files=2)
    os.remove(os.path.join(path, "meta.json"))  # crashed-rebuild shape
    with pytest.raises(FileNotFoundError):
        zonemap_read(spark, path, "1994-01-01", "1994-12-31")


def test_rebuild_replaces_stale_sidecar(spark, sf_dir, tmp_path):
    """A rebuild must leave sidecar and data consistent — per-file rows
    in the sidecar sum to the data row count."""
    path = str(tmp_path / "zm")
    o = load_table(spark, sf_dir, "orders")
    write_zonemap_table(o.where("o_orderkey % 2 = 0"), path, "o_orderdate", n_files=4)
    write_zonemap_table(o, path, "o_orderdate", n_files=4)
    stats = spark.read.parquet(path + "/zones")
    assert stats.agg(F.sum("n_rows")).collect()[0][0] == o.count()
    assert zonemap_read(spark, path).count() == o.count()
