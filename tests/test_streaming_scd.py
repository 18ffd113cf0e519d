"""StreamingSCD2Store: a CDC file stream folded into a type-2 history;
final open rows equal the overall latest change per key, closed rows
preserve the change trail, and replaying a batch is a no-op."""

import tempfile

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from spark_indexedrdd_spark.operators.scd import scd2_init
from spark_indexedrdd_spark.sources.tables import load_table
from spark_indexedrdd_spark.streaming.scd import (
    StreamingSCD2Store,
    compact_cdc_batch,
)


def test_compact_cdc_batch_latest_per_key(spark):
    batch = spark.createDataFrame(
        [
            Row(k=1, v=10.0, change_ts_us=100),
            Row(k=1, v=11.0, change_ts_us=200),   # later wins
            Row(k=2, v=20.0, change_ts_us=100),
            Row(k=2, v=21.0, change_ts_us=100),   # ts tie: max value wins
        ]
    )
    got = {r.k: r.v for r in compact_cdc_batch(batch, ["k"]).collect()}
    assert got == {1: 11.0, 2: 21.0}


def test_streaming_scd2_matches_batch_latest(spark, sf_dir, tmp_path):
    # split events into time-ordered files so the stream delivers
    # multiple micro-batches (one file per trigger) and real change
    # trails accumulate; file N holds the N-th quartile of event time
    ev_all = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "value", "event_type", "ts_us")
        .orderBy("ts_us")
    )
    n = ev_all.count()
    rows = ev_all.collect()
    src = str(tmp_path / "cdc_src")
    for i in range(4):
        part = rows[i * n // 4 : (i + 1) * n // 4]
        spark.createDataFrame(part, ev_all.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = spark.read.parquet(src).schema

    empty = spark.createDataFrame(
        [], "user_id long, value double, event_type string"
    )
    store = StreamingSCD2Store(
        scd2_init(empty, "2000-01-01 00:00:00"),
        key_cols=["user_id"],
        compare_cols=["value", "event_type"],
        compact_every=2,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            "user_id",
            "value",
            "event_type",
            F.col("ts_us").alias("change_ts_us"),
        )
    )
    q = store.attach(stream, tempfile.mkdtemp(prefix="scdckpt_"), availableNow=True)
    q.awaitTermination(120)

    hist = store.current
    open_rows = {
        r.user_id: (r.value, r.event_type)
        for r in hist.where("is_current").collect()
    }
    # batch ground truth: overall latest event per user by (ts, value,
    # event_type) — the same deterministic order compact_cdc_batch uses
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("value"), F.desc("event_type")
    )
    latest = {
        r.user_id: (r.value, r.event_type)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    }
    assert open_rows == latest
    # history sanity: every key has exactly one open row; closed rows
    # carry strictly increasing validity
    per_key = hist.groupBy("user_id").agg(
        F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias("n_open"),
        F.count("*").alias("n_rows"),
    )
    rows = per_key.collect()
    assert all(r.n_open == 1 for r in rows)
    assert any(r.n_rows > 1 for r in rows)  # real change trails exist
    bad = hist.where(
        F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.col("valid_from"))
    ).count()
    assert bad == 0


def test_streaming_scd2_replay_batch_is_noop(spark):
    empty = spark.createDataFrame([], "k long, v double")
    store = StreamingSCD2Store(
        scd2_init(empty, "2000-01-01 00:00:00"),
        key_cols=["k"],
        compare_cols=["v"],
    )
    batch = spark.createDataFrame(
        [Row(k=1, v=10.0, change_ts_us=1_700_000_000_000_000)]
    )
    store.foreach_batch(batch, 0)
    after_first = sorted(map(tuple, store.current.collect()))
    store.foreach_batch(batch, 0)  # at-least-once redelivery
    assert sorted(map(tuple, store.current.collect())) == after_first
