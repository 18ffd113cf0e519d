"""Symmetric per-vector int8 embedding quantization.

The storage/bandwidth lever for 100 TB embedding tables: float32 →
int8 + one float64 scale per vector is a 4× reduction on the column that
dominates ANN scan cost, with reconstruction error bounded by scale/2
per component. Quantize once at ingest, ship int8 over the wire, and
dequantize (or score directly in int8) inside the scan.

All arithmetic is cross-engine exact by construction, so the error-stats
query carries a DuckDB oracle:

- ``scale = max(|x|) / 127`` — array_max is order-free comparisons;
  the division is one IEEE op.
- ``q_i = round(x_i / scale)`` — both engines round half away from zero
  for doubles (Spark HALF_UP, DuckDB round()); |x_i/scale| ≤ 127 by
  construction, so int8 never clips.
- ``err_i = |x_i - q_i * scale|``, reported as the order-free array_max.

The reference has no similarity/storage surface (SURVEY.md §2.5) —
extension operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INT8_MAX = 127.0


def _scale(vec: Column) -> Column:
    return (
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
        / F.lit(INT8_MAX)
    )


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, scale double, qvec array<tinyint>): symmetric per-vector
    int8. Zero vectors get scale 0 and all-zero codes (guarded division).
    Narrow map — no shuffle; at scale this runs inside the ingest scan."""
    scale = _scale(F.col(vec_col))
    safe = F.when(scale > 0, scale).otherwise(F.lit(1.0))
    qvec = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") / safe).cast("tinyint"),
    )
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        qvec.alias("qvec"),
    )


def dequantize_int8(
    qdf: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(id, embedding array<double>) reconstructed as ``q_i * scale`` —
    the exact arithmetic the error stats account for."""
    return qdf.select(
        F.col(id_col),
        F.transform(
            F.col("qvec"), lambda q: q.cast("double") * F.col("scale")
        ).alias("embedding"),
    )


def quantize_error_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector reconstruction report: (id, scale, max_abs_err).
    ``max_abs_err ≤ scale/2`` always (round-to-nearest); the query is the
    ingest-time acceptance check for the quantized table. Oracle:
    :func:`sql_quantize_error_stats` — every step is order-free or a
    single IEEE op, so the doubles hash-match exactly."""
    scale = _scale(F.col(vec_col))
    safe = F.when(scale > 0, scale).otherwise(F.lit(1.0))
    err = F.transform(
        F.col(vec_col),
        lambda x: F.abs(
            x.cast("double")
            - F.round(x.cast("double") / safe) * safe
        ),
    )
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        F.array_max(err).alias("max_abs_err"),
    )


def sql_quantize_error_stats(
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB twin of :func:`quantize_error_stats` (same guarded-zero
    branch, same rounding mode — both engines round doubles half away
    from zero)."""
    scale = (
        f"list_max(list_transform({vec_col},"
        f" x -> abs(CAST(x AS DOUBLE)))) / {INT8_MAX}"
    )
    return f"""
        WITH s AS (
            SELECT {id_col}, {vec_col}, {scale} AS scale,
                   CASE WHEN {scale} > 0 THEN {scale} ELSE 1.0 END AS safe
            FROM {table}
        )
        SELECT {id_col}, scale,
               list_max(list_transform({vec_col},
                   x -> abs(CAST(x AS DOUBLE)
                            - round(CAST(x AS DOUBLE) / safe) * safe)
               )) AS max_abs_err
        FROM s
    """
