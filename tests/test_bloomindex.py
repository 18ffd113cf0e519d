"""Bloom-sidecar point-lookup pruning: lookups skip files the keys
cannot be in, results are value-identical to a full-scan IN-filter
(false positives cost a task, never a row), commit marker fences
crashed rebuilds, the store is relocatable. (sources/bloomindex.py —
the at-rest analog of the reference's targeted-partition multiget,
IndexedRDD.scala:50-62, on a column the table is NOT clustered by.)"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.sources.bloomindex import (
    bloom_multiget,
    bloom_prune_files,
    write_bloom_table,
)
from spark_indexedrdd_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def orders_store(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bl") / "orders_bloom")
    orders = load_table(spark, sf_dir, "orders")
    # keyed on o_custkey: a SECONDARY column — many rows per key,
    # layout not clustered by it (round-robined into 16 files)
    write_bloom_table(orders, path, "o_custkey", n_files=16)
    return orders, path


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_lookup_matches_full_scan(spark, orders_store):
    orders, path = orders_store
    keys = [7, 19, 42, -5]
    got = bloom_multiget(spark, path, keys)
    want = orders.where(F.col("o_custkey").isin(keys))
    assert _sorted_rows(got) == _sorted_rows(want)
    assert got.count() > 0


def test_pruning_skips_files(spark, orders_store):
    _, path = orders_store
    # ground truth: the files that actually contain the key (a
    # customer's ~10 orders spread over ~10 of the 16 round-robined
    # files — pruning must schedule those, and at the default m=8192
    # the false-positive allowance is near zero)
    truth = {
        os.path.basename(r.f)
        for r in spark.read.parquet(path + "/data")
        .where(F.col("o_custkey") == 7)
        .select(F.col("_metadata.file_path").alias("f"))
        .distinct()
        .collect()
    }
    files, total = bloom_prune_files(spark, path, [7])
    got = {os.path.basename(f) for f in files}
    assert total == 16
    assert truth <= got, "bloom must never skip a containing file"
    assert len(got) <= len(truth) + 2, "pruning barely beats ground truth"
    assert len(got) < total, "some non-containing files are skipped"


def test_false_positives_never_change_values(spark, sf_dir, tmp_path):
    # m=16 forces heavy bloom saturation → many false-positive files;
    # the residual IN-filter must keep the answer exact anyway
    path = str(tmp_path / "bloom_tiny_m")
    orders = load_table(spark, sf_dir, "orders")
    write_bloom_table(orders, path, "o_custkey", n_files=8, m=16, k=2)
    keys = [7, 19]
    got = bloom_multiget(spark, path, keys)
    want = orders.where(F.col("o_custkey").isin(keys))
    assert _sorted_rows(got) == _sorted_rows(want)


def test_miss_only_lookup_is_empty(spark, orders_store):
    orders, path = orders_store
    got = bloom_multiget(spark, path, [-1, -2])
    assert got.count() == 0
    assert got.columns == orders.columns


def test_empty_and_null_keys(spark, orders_store):
    _, path = orders_store
    assert bloom_multiget(spark, path, []).count() == 0
    files, _ = bloom_prune_files(spark, path, [None])
    assert files == []


def test_uncommitted_store_refused(spark, orders_store, tmp_path):
    _, path = orders_store
    broken = str(tmp_path / "broken")
    shutil.copytree(path, broken)
    os.remove(os.path.join(broken, "meta.json"))
    with pytest.raises(Exception, match="meta|commit|uncommitted"):
        bloom_multiget(spark, broken, [7])


def test_store_is_relocatable(spark, orders_store, tmp_path):
    orders, path = orders_store
    moved = str(tmp_path / "moved_bloom")
    shutil.copytree(path, moved)
    got = bloom_multiget(spark, moved, [42])
    want = orders.where(F.col("o_custkey") == 42)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_string_key_column(spark, sf_dir, tmp_path):
    # xxhash64 positions must agree between build and lookup for
    # non-numeric key types too (key_ddl cast on the lookup frame)
    path = str(tmp_path / "bloom_str")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    write_bloom_table(docs, path, "lang", n_files=8)
    got = bloom_multiget(spark, path, ["en", "fr"])
    want = docs.where(F.col("lang").isin(["en", "fr"]))
    assert _sorted_rows(got) == _sorted_rows(want)


# --------------------- appends + streaming ingest --------------------- #


def test_append_batch_exact_and_replay(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.sources.bloomindex import append_bloom_batch

    orders = load_table(spark, sf_dir, "orders")
    base = orders.where("o_orderkey % 3 != 0")
    batch = orders.where("o_orderkey % 3 = 0")
    path = str(tmp_path / "bl_append")
    write_bloom_table(base, path, "o_custkey", n_files=8)
    assert append_bloom_batch(batch, path, batch_tag="b1", n_files=4)
    keys = [7, 19, 42]
    got = bloom_multiget(spark, path, keys)
    want = orders.where(F.col("o_custkey").isin(keys))
    assert _sorted_rows(got) == _sorted_rows(want)
    files, total = bloom_prune_files(spark, path, [7])
    assert total == 12 and 0 < len(files) < total
    # replay of a committed tag is a no-op
    assert not append_bloom_batch(batch, path, batch_tag="b1")
    assert _sorted_rows(bloom_multiget(spark, path, keys)) == _sorted_rows(want)


def test_crashed_append_invisible_then_replay_exact(spark, sf_dir, tmp_path):
    import glob
    import shutil as sh

    from spark_indexedrdd_spark.sources.bloomindex import append_bloom_batch

    orders = load_table(spark, sf_dir, "orders")
    base = orders.where("o_orderkey % 3 != 0")
    batch = orders.where("o_orderkey % 3 = 0")
    path = str(tmp_path / "bl_crash")
    write_bloom_table(base, path, "o_custkey", n_files=8)
    want_pre = _sorted_rows(
        base.where(F.col("o_custkey") == 7).select("o_orderkey")
    )
    # crash between file publish and meta commit: stray data + sidecar
    a_data = glob.glob(os.path.join(path, "data", "*.parquet"))[0]
    sh.copy(a_data, os.path.join(path, "data", "batch-b1-00099.parquet"))
    a_side = glob.glob(os.path.join(path, "bloom", "*.parquet"))[0]
    sh.copy(a_side, os.path.join(path, "bloom", "part-stray.parquet"))
    got_pre = bloom_multiget(spark, path, [7]).select("o_orderkey")
    assert _sorted_rows(got_pre) == want_pre, "stray files must be invisible"
    assert append_bloom_batch(batch, path, batch_tag="b1")
    got = bloom_multiget(spark, path, [7]).select("o_orderkey")
    want = orders.where(F.col("o_custkey") == 7).select("o_orderkey")
    assert _sorted_rows(got) == _sorted_rows(want)


def test_streaming_bloom_ingest_replay_noop(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.sources.bloomindex import StreamingBloomIngest

    orders = load_table(spark, sf_dir, "orders")
    b0 = orders.where("o_orderkey % 2 = 0")
    b1 = orders.where("o_orderkey % 2 = 1")
    path = str(tmp_path / "bl_stream")
    st = StreamingBloomIngest(path, "o_custkey", n_files=4)
    st.foreach_batch(b0, 0)
    st.foreach_batch(b1, 1)
    want = orders.where(F.col("o_custkey") == 42)
    assert _sorted_rows(bloom_multiget(spark, path, [42])) == _sorted_rows(want)
    st2 = StreamingBloomIngest(path, "o_custkey", n_files=4)
    st2.foreach_batch(b1, 1)  # re-delivery after restart
    assert _sorted_rows(bloom_multiget(spark, path, [42])) == _sorted_rows(want)


# ---------------- commit-protocol model (property) --------------------- #

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    ops=st.lists(
        st.sampled_from(["clean", "crash_replay", "dup_replay"]),
        min_size=1,
        max_size=3,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bloom_commit_protocol_model(spark, sf_dir, ops):
    """Property over delivery histories (postings model, bloom form):
    any mix of clean commits, crash-after-publish replays, and
    duplicate redeliveries serves exactly the one-shot union."""
    import shutil
    import tempfile

    from spark_indexedrdd_spark.sources.bloomindex import append_bloom_batch

    orders = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="blmodel_")
    try:
        p = os.path.join(root, "store")
        write_bloom_table(orders.where("o_orderkey % 7 = 0"), p,
                          "o_custkey", n_files=4)
        for i, op in enumerate(ops):
            batch = orders.where(f"o_orderkey % 7 = {i + 1}")
            tag = f"t{i}"
            if op == "clean":
                assert append_bloom_batch(batch, p, batch_tag=tag)
            elif op == "crash_replay":
                with open(os.path.join(p, "meta.json")) as fh:
                    pre = fh.read()
                assert append_bloom_batch(batch, p, batch_tag=tag)
                with open(os.path.join(p, "meta.json"), "w") as fh:
                    fh.write(pre)
                assert append_bloom_batch(batch, p, batch_tag=tag)
            else:
                assert append_bloom_batch(batch, p, batch_tag=tag)
                assert append_bloom_batch(batch, p, batch_tag=tag) is False
        want = orders.where(f"o_orderkey % 7 <= {len(ops)}")
        keys = [7, 19, 42]
        got = _sorted_rows(bloom_multiget(spark, p, keys))
        exp = _sorted_rows(want.where(F.col("o_custkey").isin(keys)))
        assert got == exp and len(got) > 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_legacy_store_append_backfills_base_manifest(spark, sf_dir, tmp_path):
    """A store committed before the manifest pointer existed (meta has
    no 'manifests') must gain a backfilled 'base' manifest on its
    first append — committing a meta that names a never-written
    manifest would make every later read raise."""
    import json

    from spark_indexedrdd_spark.sources.bloomindex import append_bloom_batch

    orders = load_table(spark, sf_dir, "orders")
    base = orders.where("o_orderkey % 3 != 0")
    batch = orders.where("o_orderkey % 3 = 0")
    path = str(tmp_path / "bl_legacy")
    write_bloom_table(base, path, "o_custkey", n_files=8)
    mp = os.path.join(path, "meta.json")
    meta = json.load(open(mp))
    del meta["manifests"]
    del meta["applied"]
    json.dump(meta, open(mp, "w"))
    shutil.rmtree(os.path.join(path, "_manifests"))
    assert append_bloom_batch(batch, path, batch_tag="b1")
    got = bloom_multiget(spark, path, [7])
    want = orders.where(F.col("o_custkey") == 7)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_type_skewed_batch_is_cast_to_store_key_type(spark, sf_dir, tmp_path):
    """xxhash64 hashes int and bigint differently: an append whose key
    column arrives as a narrower type must be cast to the store's
    pinned key_ddl, or its files' bloom positions would never match a
    lookup (silent false negatives)."""
    from spark_indexedrdd_spark.sources.bloomindex import append_bloom_batch

    orders = load_table(spark, sf_dir, "orders")
    base = orders.where("o_orderkey % 3 != 0")
    batch = orders.where("o_orderkey % 3 = 0").withColumn(
        "o_custkey", F.col("o_custkey").cast("int")
    )
    path = str(tmp_path / "bl_typeskew")
    write_bloom_table(base, path, "o_custkey", n_files=8)
    assert append_bloom_batch(batch, path, batch_tag="b1", n_files=4)
    got = bloom_multiget(spark, path, [7])
    want = orders.where(F.col("o_custkey") == 7)
    assert got.count() == want.count() > 0


def test_real_stream_ingest_equals_one_shot(spark, sf_dir, tmp_path):
    """True readStream→attach ingest (checkpointed, availableNow)
    serves lookups value-identical to a one-shot build."""
    import tempfile

    from spark_indexedrdd_spark.sources.bloomindex import StreamingBloomIngest

    orders = load_table(spark, sf_dir, "orders")
    src = str(tmp_path / "bl_src")
    orders.repartition(3).write.parquet(src)
    store = str(tmp_path / "bl_stream_store")
    st = StreamingBloomIngest(store, "o_custkey", n_files=4)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = st.attach(stream, tempfile.mkdtemp(prefix="blckpt_"), availableNow=True)
    q.awaitTermination(120)
    got = bloom_multiget(spark, store, [42])
    want = orders.where(F.col("o_custkey") == 42)
    assert _sorted_rows(got) == _sorted_rows(want) and got.count() > 0


def test_optimize_preserves_snapshots_and_merges(spark, sf_dir, tmp_path):
    """Snapshot-preserving OPTIMIZE on the bloom store: batch files
    re-merge under the pinned (m, k), lookups stay byte-identical live
    AND as-of, and vacuum reclaims the pre-optimize files."""
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.sources.bloomindex import (
        append_bloom_batch,
        optimize_bloom_store,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "bl_opt")
    write_bloom_table(orders.where("o_orderkey % 3 = 1"), path,
                      "o_custkey", n_files=8)
    append_bloom_batch(orders.where("o_orderkey % 3 = 2"), path,
                       batch_tag="b1", n_files=8)
    v_pre = SC.read_meta(path)["version"]
    append_bloom_batch(orders.where("o_orderkey % 3 = 0"), path,
                       batch_tag="b2", n_files=8)
    keys = [7, 19, 42]
    want = orders.where(F.col("o_custkey").isin(keys))
    pre_rows = _sorted_rows(bloom_multiget(spark, path, keys, version=v_pre))
    n_after = optimize_bloom_store(spark, path, n_files=8)
    assert n_after == 8
    assert _sorted_rows(bloom_multiget(spark, path, keys)) == _sorted_rows(want)
    files, total = bloom_prune_files(spark, path, [7])
    assert total == 8 and 0 < len(files) < total  # still prunes
    # pre-optimize snapshot byte-identical (floor unmoved)
    assert _sorted_rows(
        bloom_multiget(spark, path, keys, version=v_pre)) == pre_rows
    rep = SC.vacuum_store(path, keep_versions=1, spark=spark)
    assert any(r.startswith("data/") for r in rep["removed_files"])
    with pytest.raises(ValueError, match="floor|rewrit"):
        bloom_multiget(spark, path, keys, version=v_pre)
    assert _sorted_rows(bloom_multiget(spark, path, keys)) == _sorted_rows(want)
