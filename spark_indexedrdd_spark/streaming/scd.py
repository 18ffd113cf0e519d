"""Streaming SCD2: a CDC stream maintained as a type-2 history via
foreachBatch — the streaming twin of ``operators.scd.scd2_apply``, the
same way ``StreamingKVStore`` streams the multiput family.

Each micro-batch:

1. compacts the batch to its LATEST change per key (CDC batches can
   carry several changes for one key; max (change_ts_us, tie-break
   cols) wins — deterministic),
2. stamps the whole batch with ONE batch time = the max change_ts_us
   in the batch (derived from the DATA, not the wall clock, so a
   replayed batch applies at the same timestamp and the no-op branch
   of scd2_apply absorbs it — idempotent under foreachBatch's
   at-least-once contract),
3. ``scd2_apply`` merges it into the current history,
4. every ``compact_every`` batches, ``localCheckpoint`` materializes
   the accumulated union/join chain (the reindex() analog — unbounded
   plan growth is the failure mode, not data size).

Scale: inherits scd2_apply's shape — only open rows join each batch;
closed history rides the union. State between batches is one DataFrame
lineage, checkpoint-bounded.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_indexedrdd_spark.operators.scd import scd2_apply
from spark_indexedrdd_spark.checkpoint import truncate_lineage


def compact_cdc_batch(
    batch_df: DataFrame,
    key_cols: "list[str]",
    ts_col: str = "change_ts_us",
) -> DataFrame:
    """Latest change per key: max ts wins, later-arriving duplicates of
    the same (key, ts) resolved by the remaining columns' max — fully
    deterministic for any batch content."""
    others = [c for c in batch_df.columns if c not in (*key_cols, ts_col)]
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(ts_col), *[F.desc(c) for c in others]
    )
    return (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", ts_col)
    )


class StreamingSCD2Store:
    def __init__(
        self,
        history: DataFrame,
        key_cols: "list[str]",
        compare_cols: "list[str]",
        ts_col: str = "change_ts_us",
        compact_every: int = 8,
    ):
        self.current = history
        self.key_cols = key_cols
        self.compare_cols = compare_cols
        self.ts_col = ts_col
        self.compact_every = compact_every
        self._batches = 0

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Pass to ``writeStream.foreachBatch``. Batch rows: key cols +
        compare cols + the change-timestamp column."""
        head = batch_df.select(F.max(self.ts_col).alias("m")).collect()
        if not head or head[0]["m"] is None:
            return
        batch_ts_us = int(head[0]["m"])
        batch_ts = datetime.datetime.fromtimestamp(
            batch_ts_us / 1_000_000, tz=datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S.%f")
        updates = compact_cdc_batch(batch_df, self.key_cols, self.ts_col)
        updated = scd2_apply(
            self.current,
            updates,
            self.key_cols,
            self.compare_cols,
            batch_ts,
        )
        self._batches += 1
        if self._batches % self.compact_every == 0:
            updated = updated.transform(truncate_lineage)
        self.current = updated

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        return (
            stream_df.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.foreach_batch)
            .trigger(**trigger_kwargs)
            .start()
        )
