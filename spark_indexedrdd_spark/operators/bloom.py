"""Bloom-filter join pruning — filter a huge fact table by a selective
dimension WITHOUT broadcasting the dim or shuffling unmatched fact rows.

Spark-first design: Catalyst already owns this optimization
(``InjectRuntimeFilter``): when the creation side of a shuffle join is
selective, it inserts ``bloom_filter_agg`` over the dim keys and a
``might_contain(xxhash64(fact_key))`` filter on the fact scan side, so
unmatched fact rows die before the exchange. We do NOT hand-roll a
Python-side bloom (that would move the probe off the JVM hot path);
this operator expresses the join so injection applies and pins the
session confs that gate it.

At 100 TB: the bloom build is a tiny two-phase object-hash aggregate on
the dim; the probe is a JVM expression inside the fact's scan stage —
the shuffle only carries surviving rows. With a 1%-selective dim that is
a ~100× reduction in exchange volume. The reference has no analogue (its
joins always co-partition both sides; reference IndexedRDD.scala:237-283).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def runtime_bloom_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    how: str = "inner",
    application_side_threshold: str | None = None,
) -> DataFrame:
    """Join ``fact`` to the (pre-filtered, selective) ``dim`` with
    Catalyst runtime bloom pruning eligible.

    Injection fires when the join shuffles (a broadcastable dim already
    beats a bloom — Catalyst then prunes via the broadcast hash table
    itself) and the application side's scan exceeds
    ``spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold``
    (default 10GB — at real scale it just fires; pass
    ``application_side_threshold="0"`` to force it for small tests).
    Confs are set at call time because queries may run in a caller's
    bone-stock session."""
    spark = fact.sparkSession
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    if application_side_threshold is not None:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            application_side_threshold,
        )
    return fact.join(dim, on, how)


def urgent_revenue_bloom(
    lineitem: DataFrame,
    orders: DataFrame,
    priority: str = "1-URGENT",
    force_for_small_data: bool = False,
) -> DataFrame:
    """Revenue by return flag over lineitems of urgent orders — the
    canonical bloom-prunable shape (selective dim ⋈ huge fact). Results
    are identical with or without injection; the bloom only changes how
    many fact rows reach the shuffle."""
    from pyspark.sql import functions as F

    from spark_indexedrdd_spark.operators.analytics import _dec_sum

    dim = orders.where(F.col("o_orderpriority") == priority).select("o_orderkey")
    j = runtime_bloom_join(
        lineitem,
        dim,
        F.col("l_orderkey") == F.col("o_orderkey"),
        application_side_threshold="0" if force_for_small_data else None,
    )
    return (
        j.groupBy("l_returnflag")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


def sql_urgent_revenue_bloom(priority: str = "1-URGENT") -> str:
    return f"""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey AND o_orderpriority = '{priority}'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """
