"""Stream-stream and stream-static joins (Structured Streaming).

The classic funnel query — "purchase within N minutes of the same user's
signup" — as a watermarked stream-stream inner join. Both sides carry an
event-time watermark and the join condition time-bounds the match window,
so Spark can expire buffered state: a signup is held only until the
purchase-side watermark passes ``signup_ts + within``; unmatched rows age
out. Without the time bound the state would be unbounded — this operator
makes the bound part of the API.

Stream-static enrichment joins (stream ⋈ dimension table) need no
watermark on the static side and broadcast per micro-batch.

The reference has no streaming surface (SURVEY.md §2); batch twins below
are the oracle in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_indexedrdd_spark.streaming.windows import _as_stream_dir, events_stream


def _funnel(signups: DataFrame, purchases: DataFrame, within_minutes: int) -> DataFrame:
    """Shared join definition: one expression tree for batch AND stream
    (the equality in tests is between the two *executions* of this same
    logical plan)."""
    s = signups.select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
        F.col("ts_us").alias("signup_ts_us"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (
            F.col("p_ts")
            <= F.col("s_ts") + F.expr(f"INTERVAL {int(within_minutes)} MINUTES")
        )
    )
    return s.join(p, cond).select(
        F.col("s_user").alias("user_id"),
        "signup_ts_us",
        "purchase_ts_us",
        "purchase_value",
    )


def batch_purchase_after_signup(
    events: DataFrame, within_minutes: int = 60
) -> DataFrame:
    """Batch form over the normalized events table."""
    return _funnel(
        events.where(F.col("event_type") == "signup"),
        events.where(F.col("event_type") == "purchase"),
        within_minutes,
    )


def streaming_purchase_after_signup(
    spark: SparkSession,
    events_path: str,
    within_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream self-join form: one readStream source filtered into
    both legs (Spark supports watermarked self-joins), each leg
    watermarked so join state expires. Drive with availableNow + append.
    """
    stream = events_stream(spark, events_path)
    signups = stream.where(F.col("event_type") == "signup").withWatermark(
        "ts", watermark
    )
    purchases = stream.where(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    return _funnel(signups, purchases, within_minutes)


def _funnel_outer(
    signups: DataFrame, purchases: DataFrame, within_minutes: int
) -> DataFrame:
    """LEFT OUTER variant of :func:`_funnel`: every signup appears once
    per matching purchase, or once with NULL purchase columns if none
    arrived within the window — the conversion-funnel report shape."""
    s = signups.select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
        F.col("ts_us").alias("signup_ts_us"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (
            F.col("p_ts")
            <= F.col("s_ts") + F.expr(f"INTERVAL {int(within_minutes)} MINUTES")
        )
    )
    return s.join(p, cond, "left_outer").select(
        F.col("s_user").alias("user_id"),
        "signup_ts_us",
        "purchase_ts_us",
        "purchase_value",
    )


def batch_signup_conversion(
    events: DataFrame, within_minutes: int = 60
) -> DataFrame:
    """Batch form of the left-outer funnel over normalized events."""
    return _funnel_outer(
        events.where(F.col("event_type") == "signup"),
        events.where(F.col("event_type") == "purchase"),
        within_minutes,
    )


def streaming_signup_conversion(
    spark: SparkSession,
    events_path: str,
    within_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermarks on both legs.

    Scale/semantics: Spark buffers a signup until the GLOBAL watermark —
    the min across both legs' (max event time - delay) — passes
    ``signup_ts + within``; only then can it prove no match will arrive
    and emit the NULL-padded row. So (a) join state stays bounded by the
    same time condition as the inner form, and (b) outer results are
    correct-but-delayed by the watermark — and on a finite stream,
    signups within (delay + within) of the earlier-ending leg never get
    their NULL row (measured; asserted in tests). The documented
    Structured Streaming outer-join contract."""
    stream = events_stream(spark, events_path)
    signups = stream.where(F.col("event_type") == "signup").withWatermark(
        "ts", watermark
    )
    purchases = stream.where(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    return _funnel_outer(signups, purchases, within_minutes)


def sql_batch_signup_conversion(within_minutes: int = 60) -> str:
    """DuckDB twin of the left-outer funnel (same integer-microsecond
    time bound; the purchase filter must live in the join's right input,
    not WHERE, to preserve outer semantics)."""
    us = int(within_minutes) * 60 * 1_000_000
    return f"""
        SELECT s.user_id,
               epoch_us(s.ts) AS signup_ts_us,
               epoch_us(p.ts) AS purchase_ts_us,
               p.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'signup') s
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON s.user_id = p.user_id
         AND epoch_us(p.ts) >= epoch_us(s.ts)
         AND epoch_us(p.ts) <= epoch_us(s.ts) + {us}
    """


def stream_static_enrich(
    spark: SparkSession,
    events_path: str,
    dim: DataFrame,
    on: str = "user_id",
) -> DataFrame:
    """Stream-static enrichment: the static side needs no watermark and
    is (broadcast-)joined fresh each micro-batch — at scale, keep the dim
    small or pre-bucket it on the join key."""
    return events_stream(spark, events_path).join(F.broadcast(dim), on, "left")


def sql_batch_purchase_after_signup(within_minutes: int = 60) -> str:
    """DuckDB twin of the batch funnel: identical integer-microsecond
    arithmetic (ts_us), so the time bound is exact in both engines."""
    us = int(within_minutes) * 60 * 1_000_000
    return f"""
        SELECT s.user_id,
               epoch_us(s.ts) AS signup_ts_us,
               epoch_us(p.ts) AS purchase_ts_us,
               p.value AS purchase_value
        FROM events s JOIN events p
          ON s.user_id = p.user_id
         AND s.event_type = 'signup' AND p.event_type = 'purchase'
         AND epoch_us(p.ts) >= epoch_us(s.ts)
         AND epoch_us(p.ts) <= epoch_us(s.ts) + {us}
    """
