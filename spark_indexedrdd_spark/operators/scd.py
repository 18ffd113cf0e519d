"""Slowly-changing-dimension (type 2) history merge and point-in-time
lookup.

The reference's mutation surface is copy-on-write versioning: every
`multiput`/`delete` returns a NEW IndexedRDD and the old snapshot stays
queryable (IndexedRDD.scala:96-175; the README's put/get isolation
example). That gives you *implicit* versions-by-lineage. A warehouse
needs the explicit form — one relation carrying every version of every
key with validity intervals — which is what SCD2 is. These operators
extend the multiput family (core.py:582-713) from "merge the latest
value" to "merge AND keep the history", with the same batch semantics:
one update batch, one deterministic timestamp, one shuffle.

Columns added to the dimension: ``valid_from`` / ``valid_to``
(timestamps; open rows have NULL valid_to) and ``is_current``.

Scale: the merge joins ONLY the open rows against the update batch on
the key (closed history passes through untouched — at 100 TB the
closed majority is never shuffled if the table is stored partitioned
by is_current, and Spark prunes the closed partition from the join
subtree entirely). The join is key-equality — broadcast when the batch
is driver-sized (the common CDC case), shuffle-hash co-partitioned
otherwise, exactly the multiput_df strategy. Change detection is a
column-wise comparison, not a hash, so it is null-safe and
oracle-exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _changed(compare_cols: "list[str]") -> "F.Column":
    """True when any tracked attribute differs (null-safe)."""
    return ~reduce(
        lambda a, b: a & b,
        [F.col(f"o_{c}").eqNullSafe(F.col(f"u_{c}")) for c in compare_cols],
    )


def scd2_init(
    dim: DataFrame, valid_from: str, ts_type: str = "timestamp"
) -> DataFrame:
    """Bootstrap a plain dimension into SCD2 shape: every row open as of
    ``valid_from``."""
    return dim.select(
        "*",
        F.lit(valid_from).cast(ts_type).alias("valid_from"),
        F.lit(None).cast(ts_type).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: "list[str]",
    compare_cols: "list[str]",
    batch_ts: str,
    ts_type: str = "timestamp",
) -> DataFrame:
    """Apply one update batch to an SCD2 history at ``batch_ts``:

    - open row, no matching update (or all tracked attrs equal): kept;
    - open row, matching update with a change: CLOSED at batch_ts and a
      new open row with the update's attributes appended;
    - update for an unseen key: new open row;
    - closed rows: passed through untouched (never joined).

    The update batch must be unique per key (pre-aggregate upstream —
    same contract as multiput's merge of duplicate keys, core.py:587).

    Output column order: key_cols + compare_cols + valid_from /
    valid_to / is_current. Deterministic for a fixed (history, updates,
    batch_ts) — no wall clock is read; the caller names the batch time,
    which is what makes replays idempotent."""
    ts = F.lit(batch_ts).cast(ts_type)
    open_rows = history.where(F.col("is_current"))
    closed_rows = history.where(~F.col("is_current"))

    o = open_rows.select(
        *[F.col(c).alias(f"o_{c}") for c in key_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        "valid_from",
    )
    u = updates.select(
        *[F.col(c).alias(f"u_{c}") for c in key_cols],
        *[F.col(c).alias(f"u_{c}") for c in compare_cols],
    )
    on = [F.col(f"o_{c}") == F.col(f"u_{c}") for c in key_cols]
    j = o.join(u, reduce(lambda a, b: a & b, on), "full_outer")

    matched = F.col(f"o_{key_cols[0]}").isNotNull() & F.col(
        f"u_{key_cols[0]}"
    ).isNotNull()
    update_only = F.col(f"o_{key_cols[0]}").isNull()
    change = matched & _changed(compare_cols)

    def emit(prefix: str, valid_from, valid_to, is_current):
        return [
            *[F.col(f"{prefix}_{c}").alias(c) for c in key_cols],
            *[F.col(f"{prefix}_{c}").alias(c) for c in compare_cols],
            valid_from.alias("valid_from"),
            valid_to.cast(ts_type).alias("valid_to"),
            is_current.alias("is_current"),
        ]

    surviving_open = j.where(~update_only & ~change).select(
        *emit("o", F.col("valid_from"), F.lit(None), F.lit(True))
    )
    closed_now = j.where(change).select(
        *emit("o", F.col("valid_from"), ts, F.lit(False))
    )
    new_versions = j.where(change | update_only).select(
        *emit("u", ts, F.lit(None), F.lit(True))
    )
    passthrough = closed_rows.select(
        *key_cols, *compare_cols, "valid_from", "valid_to", "is_current"
    )
    return (
        passthrough.unionByName(surviving_open)
        .unionByName(closed_now)
        .unionByName(new_versions)
    )


def scd2_as_of(history: DataFrame, ts: str, ts_type: str = "timestamp") -> DataFrame:
    """Point-in-time view: the version of each key valid at ``ts``
    (valid_from <= ts < valid_to, open intervals unbounded). A plain
    filter — partition/file pruning applies when the history is stored
    partitioned or sorted by validity."""
    t = F.lit(ts).cast(ts_type)
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("valid_to", "is_current")


def sql_scd2_apply(
    dim_table: str,
    key_cols: "list[str]",
    compare_cols: "list[str]",
    init_ts: str,
    batch_ts: str,
    updates_sql: str,
) -> str:
    """DuckDB twin of ``scd2_apply(scd2_init(dim, init_ts), updates,
    ...)`` — the one-batch form the driver checks. ``updates_sql`` is a
    subquery producing the update batch (unique per key)."""
    keys = ", ".join(key_cols)
    attrs = ", ".join(compare_cols)
    o_keys = " AND ".join(f"o.{c} = u.{c}" for c in key_cols)
    same = " AND ".join(
        f"(o.{c} = u.{c} OR (o.{c} IS NULL AND u.{c} IS NULL))"
        for c in compare_cols
    )
    o_cols = ", ".join(f"o.{c} AS {c}" for c in (*key_cols, *compare_cols))
    u_cols = ", ".join(f"u.{c} AS {c}" for c in (*key_cols, *compare_cols))
    return f"""
        WITH open_rows AS (
            SELECT {keys}, {attrs},
                   TIMESTAMP '{init_ts}' AS valid_from
            FROM {dim_table}
        ),
        u AS ({updates_sql}),
        matched_changed AS (
            SELECT {o_cols}, o.valid_from
            FROM open_rows o JOIN u ON {o_keys}
            WHERE NOT ({same})
        )
        SELECT {keys}, {attrs}, valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        FROM open_rows o
        WHERE NOT EXISTS (
            SELECT 1 FROM u WHERE {o_keys} AND NOT ({same})
        )
        UNION ALL
        SELECT {keys}, {attrs}, valid_from,
               TIMESTAMP '{batch_ts}' AS valid_to, FALSE AS is_current
        FROM matched_changed
        UNION ALL
        SELECT {u_cols}, TIMESTAMP '{batch_ts}' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        FROM u
        WHERE NOT EXISTS (
            SELECT 1 FROM open_rows o WHERE {o_keys} AND ({same})
        )
    """


def scd2_temporal_join(
    fact: DataFrame,
    history: DataFrame,
    key_map: "dict[str, str]",
    ts_col: str,
) -> DataFrame:
    """Join fact rows to the dimension VERSION valid at the fact's own
    timestamp — the point of keeping SCD2 history (an as-of-now join
    would misattribute historical facts to current attributes).
    ``key_map`` maps fact key columns to history key columns; the match
    condition is key equality AND valid_from <= fact.ts < valid_to
    (open intervals unbounded). Facts with no valid version (timestamp
    before the key existed, or unknown key) keep NULL dimension
    columns — dropping them would silently shrink the fact table.

    Scale: a key-equality join (broadcast/SMJ as sizes dictate) with
    the interval predicate as a cheap post-join residual — per key
    there are only |versions| candidate rows, so the fan-out before
    filtering is versions-per-key, not interval-length (the range-join
    bucketing machinery is unnecessary here by construction). At most
    ONE version matches per fact row (validity intervals partition
    time), so the join never duplicates facts."""
    on = None
    for fk, hk in key_map.items():
        c = fact[fk] == history[hk]
        on = c if on is None else on & c
    interval = (history["valid_from"] <= fact[ts_col]) & (
        history["valid_to"].isNull() | (fact[ts_col] < history["valid_to"])
    )
    return fact.join(history, on & interval, "left").drop(
        *[history[hk] for hk in key_map.values()]
    )
