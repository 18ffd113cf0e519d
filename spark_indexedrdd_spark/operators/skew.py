"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting handles most runtime skew; salting is the
explicit tool for EXTREME single-key skew in aggregations and joins
(e.g. the empty-string document, the null-ish user id) where one
reducer would otherwise receive a large fraction of all rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    alias: str = "total",
) -> DataFrame:
    """Two-stage aggregate for skewed group keys: rows first combine
    within (key, salt) — spreading a hot key over n_salts reducers —
    then the tiny per-salt partials combine per key.

    For sums this is exact (associative+commutative). The first stage's
    map-side partial aggregation already bounds each task's output to
    (#distinct keys x n_salts) rows."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.sum(value_col).alias("__partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias(alias))


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join when the small side fits in a broadcast: broadcast
    joins have NO shuffle at all, so key skew cannot hot-spot a reducer.
    This is the first tool to reach for — salting the big side is only
    needed when the small side is too large to broadcast."""
    return big.join(F.broadcast(small), on=key_cols, how=how)


def replicated_salt_join(
    big: DataFrame,
    medium: DataFrame,
    key_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join for a medium right side (too big to broadcast,
    small enough to replicate n_salts times): the big side gets a random
    salt, the medium side is exploded across every salt, and the join key
    becomes (key..., salt) — a hot key's rows spread over n_salts
    reducers instead of one."""
    b = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    m = medium.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(m, on=[*key_cols, "__salt"], how=how)
    return out.drop("__salt")


def salted_revenue_by_returnflag(lineitem: DataFrame, n_salts: int = 16) -> DataFrame:
    """Driver-gate form of the salted aggregate on a GENUINELY skewed
    key (l_returnflag has 3 values — every key is hot). Both stages
    accumulate in DECIMAL(18,6), which is order-independent, so the
    two-stage salted result is bit-identical to the oracle's one-stage
    sum — exactness of the mitigation is part of the contract."""
    salted = lineitem.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum(rev).alias("__partial"),
        F.count("*").alias("__n"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("__partial").cast("double").alias("revenue"),
            F.sum("__n").cast("long").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


SQL_SALTED_REVENUE_BY_RETURNFLAG = """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""
