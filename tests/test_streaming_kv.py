"""StreamingKVStore: the incremental-update pattern end to end —
a rate-limited file stream of events multiput into an orders-keyed store,
final state compared against a single batch aggregation."""

import tempfile

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.core import SUM_MERGE, IndexedDataFrame
from spark_indexedrdd_spark.sources.tables import load_table
from spark_indexedrdd_spark.streaming.kv_sink import StreamingKVStore
from spark_indexedrdd_spark.streaming.windows import _as_stream_dir


def test_streaming_kv_matches_batch(spark, sf_dir):
    events_path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(events_path).schema

    base = IndexedDataFrame.build(
        spark.createDataFrame([], "user_id long, value double"),
        "user_id",
        num_partitions=4,
    )
    store = StreamingKVStore(base, merge=SUM_MERGE, compact_every=2, keep_history=True)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_as_stream_dir(events_path))
        .select("user_id", "value")
    )
    q = store.attach(
        stream, tempfile.mkdtemp(prefix="kvckpt_"), availableNow=True
    )
    q.awaitTermination(120)

    got = {r["user_id"]: r["value"] for r in store.current.collect()}
    batch = {
        r["user_id"]: r["s"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(batch)
    for k in got:
        assert abs(got[k] - batch[k]) < 1e-9, k

    # multi-version property: history is still queryable and older
    if store.history:
        assert store.history[0].count() <= store.current.count()
