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
from pyspark.sql.streaming import StatefulProcessor
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


# --------------------------------------------------------------------- #
# transformWithState (Spark 4): the successor API to
# applyInPandasWithState — typed state handles (value/list/map), native
# per-state TTL, timers, and a RocksDB-backed store. Same operator
# semantics as running_user_totals above, expressed in the new API so
# users on either surface are covered.
# --------------------------------------------------------------------- #


class RunningTotalsProcessor(StatefulProcessor):
    """StatefulProcessor: one ValueState row per user."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, total, last_us = (
            self._totals.get() if self._totals.exists() else (0, 0.0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts_us"].max()))
        self._totals.update((n, total, last_us))
        yield pd.DataFrame(
            [(int(user_id), n, total, last_us)],
            columns=["user_id", "n_events", "total_value", "last_ts_us"],
        )

    def close(self) -> None:
        pass


def tws_runtime_available() -> bool:
    """transformWithState's Python state server speaks protobuf; the
    JVM side also needs the RocksDB provider (bundled with Spark). Only
    the protobuf wheel can genuinely be missing."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_tws(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """`running_user_totals` on the transformWithState API (Spark 4).

    Requires (a) the RocksDB state store provider (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider`` — bundled with Spark) and
    (b) the ``protobuf`` package, which the PySpark state-server
    protocol imports at query start; without it the query would crash at
    runtime, so this raises up front instead. At scale the RocksDB store
    spills state to local disk with changelog checkpointing, so per-user
    state is bounded by disk not heap; pass ``ttl_ms`` to expire idle
    users' state natively instead of the timeout dance
    applyInPandasWithState needs. `running_user_totals` is the
    protobuf-free equivalent (same semantics, tested stream≡batch)."""
    if not tws_runtime_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package "
            "(PySpark's state-server protocol), which is not importable "
            "here; use running_user_totals (applyInPandasWithState) — "
            "same operator semantics"
        )
    return (
        events.select("user_id", "value", "ts_us")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
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
