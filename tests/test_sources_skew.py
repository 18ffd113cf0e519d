"""Bucketed persistence, partitioned sinks, and skew operators."""

import tempfile

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.core import IndexedDataFrame
from spark_indexedrdd_spark.operators import skew
from spark_indexedrdd_spark.plans import explain as X
from spark_indexedrdd_spark.sources import sinks
from spark_indexedrdd_spark.sources.bucketed import read_bucketed, write_bucketed
from spark_indexedrdd_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


def test_bucketed_roundtrip_join_no_shuffle(spark, orders):
    a = IndexedDataFrame.from_unique(
        orders.select("o_orderkey", "o_totalprice"), "o_orderkey", num_partitions=4,
        cache=False,
    )
    b = IndexedDataFrame.from_unique(
        orders.select("o_orderkey", (F.col("o_totalprice") * 2).alias("v2")),
        "o_orderkey",
        num_partitions=4,
        cache=False,
    )
    write_bucketed(a, "t_bucket_a", num_buckets=4)
    write_bucketed(b, "t_bucket_b", num_buckets=4)
    ra = read_bucketed(spark, "t_bucket_a", "o_orderkey", 4)
    rb = read_bucketed(spark, "t_bucket_b", "o_orderkey", 4)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ra.inner_join(rb, lambda x, y: x + y)
        assert joined.count() == orders.count()
        # bucketing satisfies the join distribution: zero live shuffles
        assert X.count_live_shuffles(joined.df) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sorted_parquet_point_read_prunes(spark, orders):
    import tempfile as _tf

    from spark_indexedrdd_spark.sources.bucketed import read_sorted, write_sorted

    kv = IndexedDataFrame.from_unique(
        orders.select("o_orderkey", "o_totalprice"), "o_orderkey",
        num_partitions=4, cache=False,
    )
    path = _tf.mkdtemp(prefix="sorted_") + "/orders_kv"
    write_sorted(kv, path)
    back = read_sorted(spark, path, "o_orderkey")
    point = back.where(F.col("o_orderkey") == 42)
    plan = point._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)" in plan, plan
    assert point.count() == 1
    assert back.count() == orders.count()


def test_partitioned_sink_prunes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="sink_") + "/docs"
    sinks.write_partitioned(docs, out, ["lang"], target_partitions=2)
    back = sinks.read_partitioned(spark, out)
    assert back.count() == docs.count()
    pruned = back.where(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan
    assert pruned.count() == docs.where("lang = 'en'").count()


def test_salted_sum_is_exact(spark, orders):
    plain = {
        r.o_custkey: r.total
        for r in orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("total"))
        .collect()
    }
    salted = {
        r.o_custkey: r.total
        for r in skew.salted_sum(orders, ["o_custkey"], "o_totalprice").collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-6


def test_replicated_salt_join_matches_plain(spark, orders, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        skew.replicated_salt_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"), cust, ["c_custkey"]
        )
        .groupBy("c_mktsegment")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_broadcast_join_plan(spark, orders, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    out = skew.salted_broadcast_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"), cust, ["c_custkey"]
    )
    plan = X.executed_plan(out)
    assert X.has_broadcast_join(plan)

# ---------------------- z-order layout --------------------------------- #


def test_zorder_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Z-ordered parquet must give row-group stats pruning on BOTH sort
    columns; a lexicographic sort only prunes its leading column."""
    from spark_indexedrdd_spark.sources import zorder as Z

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    zpath = str(tmp_path / "orders_z")
    lpath = str(tmp_path / "orders_lex")
    cols = ["o_custkey", "o_totalprice"]
    Z.write_zordered(orders, zpath, cols, num_files=16, row_group_rows=1)
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(lpath)
    )

    # content round-trip
    assert spark.read.parquet(zpath).count() == n
    a = sorted(r.o_orderkey for r in spark.read.parquet(zpath).select("o_orderkey").collect())
    b = sorted(r.o_orderkey for r in orders.select("o_orderkey").collect())
    assert a == b

    # narrow ranges: ~5% of each column's span
    ck = orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    tp = orders.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    ck_lo = ck[0] + (ck[1] - ck[0]) * 45 // 100
    ck_hi = ck[0] + (ck[1] - ck[0]) * 50 // 100
    tp_lo = tp[0] + (tp[1] - tp[0]) * 0.45
    tp_hi = tp[0] + (tp[1] - tp[0]) * 0.50

    z_ck = Z.rowgroup_prune_fraction(zpath, "o_custkey", ck_lo, ck_hi)
    z_tp = Z.rowgroup_prune_fraction(zpath, "o_totalprice", tp_lo, tp_hi)
    l_tp = Z.rowgroup_prune_fraction(lpath, "o_totalprice", tp_lo, tp_hi)

    # z-order prunes meaningfully on BOTH dims
    assert z_ck < 0.6, z_ck
    assert z_tp < 0.6, z_tp
    # and beats the lexicographic layout on the trailing column
    assert z_tp < l_tp, (z_tp, l_tp)


def test_zorder_quantile_ranks_handle_skew(spark, tmp_path):
    """Power-law column: min-max ranks collapse almost everything into
    rank 0; equi-depth quantile ranks must spread rows evenly enough
    that z-ordering still prunes on the skewed dimension."""
    from spark_indexedrdd_spark.sources import zorder as Z

    df = (
        spark.range(20000)
        .withColumn("skewed", (F.pow(F.lit(10.0), F.col("id") % 7) * (F.col("id") % 97 + 1)))
        .withColumn("uniform", F.col("id") % 1000)
    )
    zpath = str(tmp_path / "skew_z")
    Z.write_zordered(df, zpath, ["skewed", "uniform"], num_files=16, quantile=True, row_group_rows=1)
    assert spark.read.parquet(zpath).count() == 20000
    # a narrow band in the BULK of the skewed distribution must prune
    lo, hi = 50.0, 500.0
    frac = Z.rowgroup_prune_fraction(zpath, "skewed", lo, hi)
    assert frac < 0.6, frac


def test_register_views_sql_passthrough(spark, sf_dir):
    """A user can run raw Spark SQL over the registered views and get
    the same answer as the DataFrame operators."""
    from spark_indexedrdd_spark.operators import analytics as AN
    from spark_indexedrdd_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate >= TIMESTAMP '2000-06-01')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ).collect()
    via_df = AN.late_shipment_orders(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    ).collect()
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]


def test_salted_revenue_oracle_exact(spark, sf_dir):
    from tests.oracle_utils import compare, duck_con

    con = duck_con(sf_dir)
    try:
        rep = compare(
            skew.salted_revenue_by_returnflag(load_table(spark, sf_dir, "lineitem")),
            skew.SQL_SALTED_REVENUE_BY_RETURNFLAG,
            con,
        )
        assert rep["ok"], rep
    finally:
        con.close()
