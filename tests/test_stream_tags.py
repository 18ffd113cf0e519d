"""r14: checkpoint-namespaced replay tags on EVERY streaming store
writer (store_commit.StreamTagMixin / checkpoint_namespace). Batch ids
are monotonic only per checkpoint; the un-namespaced tags every writer
used until r14 meant a stream restarted against the same store with a
FRESH checkpoint (ids reset to 0) silently no-oped its early batches as
"replays" of another run's commits — the r13 ADVICE hazard on the
versioned KV store, present family-wide. These tests pin the fix on a
real two-checkpoint postings ingest, the cross-upgrade legacy guard,
and the namespace derivation itself."""

import glob
import json
import os
import shutil

from pyspark.sql import functions as F  # noqa: F401

from spark_indexedrdd_spark.functions import retrieval as R
from spark_indexedrdd_spark.functions import store_commit as SC
from spark_indexedrdd_spark.sources.tables import load_table


def _drop_files(df, preds, src_dir, scratch):
    os.makedirs(src_dir, exist_ok=True)
    for i, pred in enumerate(preds):
        w = os.path.join(scratch, f"w{os.path.basename(src_dir)}{i}")
        df.where(pred).coalesce(1).write.parquet(w)
        part = glob.glob(f"{w}/part-*.parquet")[0]
        dest = os.path.join(src_dir, f"f{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60,) * 2)


def _run(st, spark, src, ckpt, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = st.attach(stream, ckpt, availableNow=True)
    q.awaitTermination(180)


def test_fresh_checkpoint_batches_land_on_the_postings_store(
    spark, sf_dir, tmp_path
):
    """Two INDEPENDENT streaming runs (own sources, own checkpoints,
    both starting at batch 0) feed one store: every document must land
    exactly once. Pre-r14, run B's batch 0 carried the tag run A's
    initializing commit recorded, so its data silently vanished."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "pstore")
    scratch = str(tmp_path)
    src_a, src_b = str(tmp_path / "srcA"), str(tmp_path / "srcB")
    _drop_files(docs, ["doc_id % 4 = 0", "doc_id % 4 = 1"], src_a, scratch)
    _drop_files(docs, ["doc_id % 4 = 2", "doc_id % 4 = 3"], src_b, scratch)
    schema = spark.read.parquet(src_a).schema

    st_a = R.StreamingPostingsStore(store, n_buckets=16)
    _run(st_a, spark, src_a, str(tmp_path / "ckptA"), schema)
    st_b = R.StreamingPostingsStore(store, n_buckets=16)
    _run(st_b, spark, src_b, str(tmp_path / "ckptB"), schema)

    meta = SC.read_meta(store)
    assert int(meta["n_docs"]) == docs.count(), (
        "a fresh checkpoint's batches were swallowed as replays of "
        "another run's batch ids"
    )
    # tags are namespaced per checkpoint: two distinct prefixes, and
    # the bare ids appear nowhere
    applied = meta.get("applied") or []
    prefixes = {t.split("-")[0] for t in applied}
    assert len(prefixes) == 2, applied
    assert not any(t.isdigit() for t in applied), applied
    # the store serves the union exactly (vs in-plan BM25)
    got = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    want = sorted(map(tuple, R.bm25_topk(docs).collect()))
    assert got == want


def test_same_checkpoint_restart_replay_is_still_a_noop(
    spark, sf_dir, tmp_path
):
    """Restarting the SAME checkpoint must keep the replay contract:
    the namespace is stable across restarts, so a redelivered
    committed batch is a no-op, not a new namespaced commit."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "pstore2")
    src = str(tmp_path / "src")
    _drop_files(docs, ["doc_id % 2 = 0", "doc_id % 2 = 1"], src, str(tmp_path))
    schema = spark.read.parquet(src).schema
    ckpt = str(tmp_path / "ckpt")

    st = R.StreamingPostingsStore(store, n_buckets=16)
    _run(st, spark, src, ckpt, schema)
    n_docs = int(SC.read_meta(store)["n_docs"])
    applied = list(SC.read_meta(store).get("applied") or [])
    # simulate the restart redelivering a committed batch: fresh
    # writer handle, SAME checkpoint namespace, same batch id
    st2 = R.StreamingPostingsStore(store, n_buckets=16)
    st2._ckpt_dir = ckpt  # what attach() records before the replay
    st2.foreach_batch(docs.where("doc_id % 2 = 1"), 1)
    meta = SC.read_meta(store)
    assert int(meta["n_docs"]) == n_docs
    assert list(meta.get("applied") or []) == applied


def test_legacy_history_redelivery_stays_a_noop_across_the_upgrade(
    spark, sf_dir, tmp_path
):
    """A store with PRE-namespace history (bare-id tags) must treat a
    redelivered legacy batch as applied even though the upgraded
    writer now namespaces its tags — without the guard the redelivery
    would re-append under the new tag and double the postings."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "pstore3")
    legacy = R.StreamingPostingsStore(store, n_buckets=16)
    legacy.foreach_batch(docs.where("doc_id % 2 = 0"), 0)  # legacy tags
    legacy.foreach_batch(docs.where("doc_id % 2 = 1"), 1)
    n_docs = int(SC.read_meta(store)["n_docs"])

    ckpt = str(tmp_path / "ckpt_new")
    os.makedirs(ckpt)
    with open(os.path.join(ckpt, "metadata"), "w") as fh:
        json.dump({"id": "0a1b2c3d-0000-4000-8000-000000000000"}, fh)
    upgraded = R.StreamingPostingsStore(store, n_buckets=16)
    upgraded._ckpt_dir = ckpt
    upgraded.foreach_batch(docs.where("doc_id % 2 = 1"), 1)  # redelivery
    assert int(SC.read_meta(store)["n_docs"]) == n_docs, (
        "legacy-history redelivery re-applied under the new namespace"
    )


def test_checkpoint_namespace_derivation():
    assert SC.checkpoint_namespace(None) == ""
    assert SC.checkpoint_namespace("/nonexistent/dir") == ""
    import tempfile

    d = tempfile.mkdtemp(prefix="ckpt_ns_")
    with open(os.path.join(d, "metadata"), "w") as fh:
        json.dump({"id": "0a1b2c3d-4e5f-4000-8000-000000000000"}, fh)
    ns = SC.checkpoint_namespace(d)
    assert ns == "0a1b2c3d4e5f" and SC.checkpoint_namespace(d) == ns
    shutil.rmtree(d, ignore_errors=True)


def test_direct_foreach_batch_keeps_legacy_tags(spark, sf_dir, tmp_path):
    """Outside attach() (operator scripts, tests) the tags stay the
    bare legacy form — byte-for-byte the pre-r14 behavior."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "pstore4")
    st = R.StreamingPostingsStore(store, n_buckets=16)
    st.foreach_batch(docs.where("doc_id % 2 = 0"), 0)
    st.foreach_batch(docs.where("doc_id % 2 = 1"), 1)
    assert "1" in (SC.read_meta(store).get("applied") or [])
    # and the replay contract holds in legacy form too
    n_docs = int(SC.read_meta(store)["n_docs"])
    st.foreach_batch(docs.where("doc_id % 2 = 1"), 1)
    assert int(SC.read_meta(store)["n_docs"]) == n_docs
