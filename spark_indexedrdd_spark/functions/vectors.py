"""Vector math over array<float> embedding columns — all built-in
higher-order functions (JVM-side, no Python UDF in the hot path).

Cross-engine determinism: the dot product is a **sequential left fold
over the array** in both implementations (Spark ``F.aggregate``, DuckDB
``list_reduce``) — identical accumulation order over identical IEEE
doubles gives bit-identical results, with no decimal casting games.
(Order-free decimal accumulation was tried first and is NOT portable:
Spark and DuckDB round double→DECIMAL differently at the last digit.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns: sequential double fold
    in array order (deterministic; whole-stage codegen)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ------------------------------------------------------------------ #
# DuckDB SQL twins: same sequential fold, same IEEE ops.
# ------------------------------------------------------------------ #


def sql_dot(a: str, b: str) -> str:
    """list_reduce folds left over the products list — the same order as
    Spark's F.aggregate, so the double accumulation is bit-identical.
    (list_reduce has no init; acc starts at the first product, which
    equals folding from 0.0 since 0.0 + x == x in IEEE.) Empty arrays
    don't occur in our data; guard upstream if they can."""
    prods = (
        f"list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))"
    )
    return f"list_reduce({prods}, (acc, p) -> acc + p)"


def sql_norm(a: str) -> str:
    return f"SQRT({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
