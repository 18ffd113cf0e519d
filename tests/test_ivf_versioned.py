"""Manifest-pointer appends + snapshot-preserving OPTIMIZE on the
vector tiers (r11): as-of serves cover APPENDS, not just deletes —
the postings store's versioned-at-rest surface
(reference multi-version semantics, IndexedRDD.scala:25-33, carried
onto the persisted ANN indexes).

Pins: append snapshot isolation (a version pinned before an append
serves byte-identically after it), tagged replay exactness (committed
tag → no-op; crashed publish → swept and republished exactly),
collision refusals, OPTIMIZE preserving every servable snapshot while
folding tombstones + small files, vacuum reclaim with loud refusal
below the floor, and the legacy (pre-manifest) fallback + backfill."""

import json
import os
import shutil

import pytest

from spark_indexedrdd_spark.functions import store_commit as SC
from spark_indexedrdd_spark.functions.ivf import (
    append_ivf_batch,
    delete_ivf_ids,
    ivf_ann_from_store,
    optimize_ivf_store,
    read_ivf_store,
    write_ivf_store,
)
from spark_indexedrdd_spark.sources.tables import load_table

QIDS = [50, 100, 150, 200, 250]


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def split_store(spark, sf_dir, tmp_path):
    """Store built from vec_id < 400; the rest is append fodder."""
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    write_ivf_store(
        emb.where("vec_id < 400"), path, n_clusters=8, method="det"
    )
    return emb, path


def test_append_is_versioned_away(spark, split_store):
    emb, path = split_store
    v_build = SC.read_meta(path)["version"]
    before = _rows(ivf_ann_from_store(spark, path, QIDS, k=5))
    assert append_ivf_batch(
        emb.where("vec_id >= 400"), path, batch_tag="w1"
    ) is True
    after = _rows(ivf_ann_from_store(spark, path, QIDS, k=5))
    assert after != before  # the appended vectors compete as candidates
    # the pinned snapshot still serves the PRE-append results exactly
    asof = _rows(ivf_ann_from_store(spark, path, QIDS, k=5, version=v_build))
    assert asof == before
    # and the live store row count reflects exactly one fold
    vecs, _ = read_ivf_store(spark, path)
    assert vecs.count() == emb.count()


def test_tagged_replay_is_noop(spark, split_store):
    emb, path = split_store
    batch = emb.where("vec_id >= 400")
    assert append_ivf_batch(batch, path, batch_tag="w1") is True
    files = SC.resolve_manifest_files(path, SC.read_meta(path))
    served = _rows(ivf_ann_from_store(spark, path, QIDS, k=5))
    assert append_ivf_batch(batch, path, batch_tag="w1") is False
    assert SC.resolve_manifest_files(path, SC.read_meta(path)) == files
    assert _rows(ivf_ann_from_store(spark, path, QIDS, k=5)) == served


def test_crashed_publish_is_swept_and_replay_is_exact(spark, split_store):
    emb, path = split_store
    # simulate a crash AFTER publish but BEFORE the meta commit: a
    # stray batch-<tag>-* file sits in a cluster dir, unreferenced
    vdir = os.path.join(path, "vectors")
    cdir = next(
        os.path.join(vdir, d)
        for d in sorted(os.listdir(vdir))
        if d.startswith("cluster_id=")
    )
    committed = next(
        f for f in sorted(os.listdir(cdir)) if f.endswith(".parquet")
    )
    stray = os.path.join(cdir, "batch-w1-99999.parquet")
    shutil.copy(os.path.join(cdir, committed), stray)
    # invisible to readers (manifest-resolved)
    vecs, _ = read_ivf_store(spark, path)
    assert vecs.count() == emb.where("vec_id < 400").count()
    # the replay sweeps the stray before republishing — exactly once
    assert append_ivf_batch(
        emb.where("vec_id >= 400"), path, batch_tag="w1"
    ) is True
    assert not os.path.exists(stray)
    vecs, _ = read_ivf_store(spark, path)
    assert vecs.count() == emb.count()
    assert (
        vecs.groupBy("vec_id").count().where("count > 1").count() == 0
    ), "replay duplicated rows"


def test_tag_collision_and_reserved_prefix_refuse(spark, split_store):
    emb, path = split_store
    batch = emb.where("vec_id >= 400")
    with pytest.raises(ValueError, match="collides"):
        append_ivf_batch(batch, path, batch_tag="base")
    with pytest.raises(ValueError, match="reserved"):
        append_ivf_batch(batch, path, batch_tag="optimize-1")
    with pytest.raises(ValueError, match="reserved"):
        append_ivf_batch(batch, path, batch_tag="anon-00001")


def test_optimize_folds_files_and_preserves_snapshots(spark, split_store):
    emb, path = split_store
    n_total = emb.count()
    append_ivf_batch(
        emb.where("vec_id >= 400 AND vec_id < 500"), path, batch_tag="w1"
    )
    v_after_w1 = SC.read_meta(path)["version"]
    served_w1 = _rows(ivf_ann_from_store(spark, path, QIDS, k=5))
    append_ivf_batch(emb.where("vec_id >= 500"), path, batch_tag="w2")
    doomed = [i for i in range(0, 600, 7)]
    delete_ivf_ids(spark, path, doomed, batch_tag="takedown")
    served_live = _rows(ivf_ann_from_store(spark, path, QIDS, k=5))
    files_before = len(
        SC.resolve_manifest_files(path, SC.read_meta(path))
    )
    n_live = optimize_ivf_store(spark, path)
    assert n_live == n_total - len(
        [i for i in doomed if i < n_total]
    )
    meta = SC.read_meta(path)
    # tombstones folded physically, ledger zeroed, one manifest
    assert meta["deletes"] == [] and meta["manifests"] == [
        f"optimize-{meta['compactions']}"
    ]
    files_after = len(SC.resolve_manifest_files(path, meta))
    assert files_after <= 8  # n_clusters × files_per_cluster(=1)
    assert files_after < files_before
    # live serve is byte-identical across the rewrite
    assert _rows(ivf_ann_from_store(spark, path, QIDS, k=5)) == served_live
    # a pre-optimize snapshot still serves byte-identically (its
    # files were never touched; floor unmoved)
    assert (
        _rows(ivf_ann_from_store(spark, path, QIDS, k=5, version=v_after_w1))
        == served_w1
    )
    # a future tag reusing a RETIRED manifest name (whose files older
    # servable snapshots still reference) refuses loudly; 'w1'/'w2'
    # themselves short-circuit as applied-tag replays, so probe with
    # 'base' — retired by the optimize, never an applied tag
    assert "base" in meta["retired_manifests"]
    with pytest.raises(ValueError, match="collides"):
        append_ivf_batch(emb.where("vec_id >= 400"), path, batch_tag="base")


def test_vacuum_reclaims_pre_optimize_files(spark, split_store):
    emb, path = split_store
    append_ivf_batch(emb.where("vec_id >= 400"), path, batch_tag="w1")
    v_old = SC.read_meta(path)["version"]
    delete_ivf_ids(spark, path, [0, 7, 14], batch_tag="t1")
    optimize_ivf_store(spark, path)
    served = _rows(ivf_ann_from_store(spark, path, QIDS, k=5))
    rep = SC.vacuum_store(path, keep_versions=1)
    assert rep["removed_files"], "pre-optimize files should be dead"
    # the vacuumed snapshot refuses loudly...
    with pytest.raises(ValueError, match="floor|rewrit"):
        ivf_ann_from_store(spark, path, QIDS, k=5, version=v_old)
    # ...and the live serve is untouched
    assert _rows(ivf_ann_from_store(spark, path, QIDS, k=5)) == served
    # the reclaimed tombstone dirs are gone too
    assert not os.path.isdir(os.path.join(path, "tombstones", "t1"))


def test_legacy_store_falls_back_then_backfills(spark, split_store):
    emb, path = split_store
    pre = _rows(ivf_ann_from_store(spark, path, QIDS, k=5))
    # strip the store back to the pre-r11 shape: no manifest pointer
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    for k in ("manifests", "applied"):
        meta.pop(k, None)
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    shutil.rmtree(os.path.join(path, "_manifests"), ignore_errors=True)
    # directory-listing fallback serves identically
    assert _rows(ivf_ann_from_store(spark, path, QIDS, k=5)) == pre
    # optimize refuses loudly on the legacy shape
    with pytest.raises(ValueError, match="manifest"):
        optimize_ivf_store(spark, path)
    # one tagged append backfills 'base' and the full surface returns
    assert append_ivf_batch(
        emb.where("vec_id >= 400"), path, batch_tag="w1"
    ) is True
    meta = SC.read_meta(path)
    assert meta["manifests"] == ["base", "w1"]
    vecs, _ = read_ivf_store(spark, path)
    assert vecs.count() == emb.count()
    optimize_ivf_store(spark, path)  # now legal
    vecs, _ = read_ivf_store(spark, path)
    assert vecs.count() == emb.count()


def test_ivfpq_append_versioned_and_optimize(spark, sf_dir, tmp_path):
    """The compressed tier mirrors the IVF surface: as-of covers code
    appends; OPTIMIZE folds tombstones + files without moving the
    floor; replay is a no-op."""
    from spark_indexedrdd_spark.functions.pq import (
        append_ivfpq_batch,
        delete_ivfpq_ids,
        ivfpq_store_ann,
        optimize_ivfpq_store,
        write_ivfpq_store,
    )

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_store(
        emb.where("vec_id < 400"), path,
        n_clusters=8, m=4, ksub=8, method="det",
    )
    queries = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where("vec_id IN (10, 20, 30)").collect()
    ]
    v_build = SC.read_meta(path)["version"]
    before = _rows(ivfpq_store_ann(spark, path, queries, k=5))
    assert append_ivfpq_batch(
        emb.where("vec_id >= 400"), path, batch_tag="w1"
    ) is True
    # replay no-op
    assert append_ivfpq_batch(
        emb.where("vec_id >= 400"), path, batch_tag="w1"
    ) is False
    # as-of the build: pre-append results, exactly
    assert (
        _rows(ivfpq_store_ann(spark, path, queries, k=5, version=v_build))
        == before
    )
    # appended codes are visible live and invisible to the pinned
    # snapshot (ADC top-5 may or may not change — check the frames)
    from spark_indexedrdd_spark.functions.pq import read_ivfpq_store

    codes_live, _c, _b = read_ivfpq_store(spark, path)
    assert codes_live.count() == emb.count()
    codes_asof, _c, _b = read_ivfpq_store(
        spark, path, meta=SC.read_meta_version(path, v_build)
    )
    assert codes_asof.count() == emb.where("vec_id < 400").count()
    delete_ivfpq_ids(spark, path, [5, 15, 25], batch_tag="t1")
    served = _rows(ivfpq_store_ann(spark, path, queries, k=5))
    n_live = optimize_ivfpq_store(spark, path)
    assert n_live == emb.count() - 3
    assert _rows(ivfpq_store_ann(spark, path, queries, k=5)) == served
    meta = SC.read_meta(path)
    assert meta["deletes"] == [] and len(meta["manifests"]) == 1


def test_streaming_ingest_is_exactly_once_and_optimizes(
    spark, sf_dir, tmp_path
):
    """The streaming SemDeDup ingest rides the tagged append: verdicts
    match the sequential batch path, the store never duplicates a
    replayed batch's vectors, and ``optimize_every`` keeps the manifest
    list bounded without changing what is served."""
    import glob

    from spark_indexedrdd_spark.functions import ivf as IV
    from spark_indexedrdd_spark.streaming.dedup import (
        streaming_semantic_dedup,
    )

    emb = _emb(spark, sf_dir)
    corpus = emb.where("vec_id < 300")
    batches = [
        emb.where("vec_id >= 300 AND vec_id < 400"),
        emb.where("vec_id >= 400"),
    ]
    store = str(tmp_path / "ivf")
    write_ivf_store(corpus, store, n_clusters=8, method="det")

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    for i, b in enumerate(batches, start=1):
        tmp_out = str(tmp_path / f"w{i}")
        b.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dest = str(stream_dir / f"f{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60,) * 2)
    q = (
        streaming_semantic_dedup(
            spark, str(stream_dir), store, str(tmp_path / "verdicts"),
            threshold=0.3, optimize_every=2,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    vecs, _ = read_ivf_store(spark, store)
    assert vecs.count() == emb.count()
    assert (
        vecs.groupBy("vec_id").count().where("count > 1").count() == 0
    ), "streaming replay duplicated vectors"
    meta = SC.read_meta(store)
    # cadence: the manifest list folded at least once and stays bounded
    assert int(meta.get("compactions", 0)) >= 1
    assert len(meta["manifests"]) <= 2
    # the applied ledger survives the optimize — a replayed batch_id
    # is still a no-op
    assert append_ivf_batch(
        batches[0].select("vec_id", "embedding"), store, batch_tag="b1"
    ) is False
    served = ivf_ann_from_store(spark, store, QIDS, k=5)
    assert served.count() == len(QIDS) * 5


@pytest.mark.slow
def test_streaming_ivf_vacuum_cadence_is_pin_safe(spark, sf_dir, tmp_path):
    """r13: the vector tier gets the SAME self-maintenance composition
    the lexical tier has (snapshots.LedgerVacuumCadence, one shared
    implementation): vacuum_every runs retention + ledger checkpoint
    from the ingest's own foreachBatch turn, the floor caps at a held
    pin (never past it), the pinned serve stays byte-identical through
    the maintenance, and a replayed batch is still a no-op."""
    import glob

    from spark_indexedrdd_spark.functions import snapshots as SNAP
    from spark_indexedrdd_spark.streaming.dedup import (
        streaming_semantic_dedup,
    )

    emb = _emb(spark, sf_dir)
    store = str(tmp_path / "ivf")
    tags = str(tmp_path / "tags")
    write_ivf_store(emb.where("vec_id < 300"), store, n_clusters=8, method="det")

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    lo, hi = 300, emb.agg({"vec_id": "max"}).collect()[0][0] + 1
    step = max(1, (hi - lo) // 6)
    cuts = list(range(lo, hi, step)) + [hi]

    def drop_files(idxs):
        for i in idxs:
            b = emb.where(f"vec_id >= {cuts[i]} AND vec_id < {cuts[i + 1]}")
            tmp_out = str(tmp_path / f"w{i}")
            b.coalesce(1).write.parquet(tmp_out)
            part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
            dest = str(stream_dir / f"f{i}.parquet")
            shutil.copy(part, dest)
            os.utime(dest, (1_700_000_000 + i * 60,) * 2)

    def run_stream():
        q = (
            streaming_semantic_dedup(
                spark, str(stream_dir), store, str(tmp_path / "verdicts"),
                threshold=0.3, vacuum_every=3, keep_versions=1,
                pin_tag_dir=tags,
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # phase 1: a couple of appends land, then the run pins the frontier
    drop_files(range(2))
    run_stream()
    pin = SNAP.pin_stores(tags, "run-1", {"dense": store})
    pinned_serve = _rows(
        ivf_ann_from_store(
            spark, store, QIDS, k=5, version=pin["dense"]["version"]
        )
    )
    # phase 2: ingest continues past the pin; the cadence must vacuum
    # (folding the below-pin ledger) without ever passing the pin
    drop_files(range(2, len(cuts) - 1))
    run_stream()

    meta = SC.read_meta(store)
    vdir = os.path.join(store, "_versions")
    # retention ran: floor advanced exactly to the pin (never past it)
    # and the ledger checkpoint folded below-pin commits
    assert int(meta.get("rewrite_floor", 0)) == pin["dense"]["version"]
    assert os.path.exists(os.path.join(vdir, "_checkpoint.json"))
    ledger = [
        int(f[:-5])
        for f in os.listdir(vdir)
        if f.endswith(".json") and f[:-5].isdigit()
    ]
    # everything below the pinned floor folded into the checkpoint;
    # what remains is exactly the pin-protected range (which grows
    # with ingest while the pin is held — the bounded part is BELOW)
    assert min(ledger) >= int(meta["rewrite_floor"])
    assert len(ledger) <= (len(cuts) - 1 - 2) + 3  # post-pin commits + slack
    # the pinned snapshot still serves byte-identically
    v = SNAP.pin_versions(SNAP.read_pin(tags, "run-1"))
    assert (
        _rows(ivf_ann_from_store(spark, store, QIDS, k=5, version=v["dense"]))
        == pinned_serve
    )
    # every vector arrived exactly once, and a replayed batch tag is
    # still a no-op through the maintenance
    vecs, _ = read_ivf_store(spark, store)
    assert vecs.count() == emb.count()
    assert vecs.groupBy("vec_id").count().where("count > 1").count() == 0
    # batch ids restart per phase-2 query? No: the shared checkpoint
    # makes ids monotonic across both runs, so phase 1's first batch
    # committed under tag b0 — its replay stays a no-op
    assert append_ivf_batch(
        emb.where(f"vec_id >= {cuts[0]} AND vec_id < {cuts[1]}"),
        store,
        batch_tag="b0",
    ) is False


def test_binary_store_versioned_append_optimize_vacuum(
    spark, sf_dir, tmp_path
):
    """The binary sketch tier joins the ledger: twin-manifest appends
    (sketches + vectors under ONE commit) are as-of-versioned and
    replay-exact; OPTIMIZE folds tombstones + files in both parts
    without moving the floor; vacuum reclaims the dead snapshots."""
    from spark_indexedrdd_spark.functions import quant as Q

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "bstore")
    Q.write_binary_store(emb.where("vec_id < 400"), path)
    qv = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where("vec_id IN (10, 20)").collect()
    ]
    v_build = SC.read_meta(path)["version"]
    before = _rows(Q.binary_store_ann(spark, path, qv, k=5))
    assert Q.append_binary_batch(
        emb.where("vec_id >= 400"), path, batch_tag="w1"
    ) is True
    assert Q.append_binary_batch(
        emb.where("vec_id >= 400"), path, batch_tag="w1"
    ) is False
    meta = SC.read_meta(path)
    assert meta["sk_manifests"] == ["base", "w1"]
    assert meta["vec_manifests"] == ["vec-base", "vec-w1"]
    # as-of the build: appended vectors invisible in BOTH stages
    assert (
        _rows(Q.binary_store_ann(spark, path, qv, k=5, version=v_build))
        == before
    )
    sk_live = Q._sketches_for_meta(spark, path, meta)
    assert sk_live.count() == emb.count()
    # takedown + snapshot-preserving optimize
    Q.delete_binary_ids(spark, path, [5, 15, 25], batch_tag="t1")
    served = _rows(Q.binary_store_ann(spark, path, qv, k=5))
    v_pre_opt = SC.read_meta(path)["version"]
    n_live = Q.optimize_binary_store(spark, path)
    assert n_live == emb.count() - 3
    meta = SC.read_meta(path)
    assert meta["deletes"] == []
    assert len(meta["sk_manifests"]) == 1
    assert _rows(Q.binary_store_ann(spark, path, qv, k=5)) == served
    # pre-optimize snapshot serves byte-identically (floor unmoved)
    assert (
        _rows(Q.binary_store_ann(spark, path, qv, k=5, version=v_pre_opt))
        == served
    )
    # vacuum reclaims the pre-optimize files and fences old versions
    rep = SC.vacuum_store(path, keep_versions=1)
    assert rep["removed_files"]
    with pytest.raises(ValueError, match="floor|rewrit"):
        Q.binary_store_ann(spark, path, qv, k=5, version=v_build)
    assert _rows(Q.binary_store_ann(spark, path, qv, k=5)) == served


def test_binary_legacy_store_falls_back_then_backfills(
    spark, sf_dir, tmp_path
):
    from spark_indexedrdd_spark.functions import quant as Q

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "bstore_legacy")
    Q.write_binary_store(emb.where("vec_id < 400"), path)
    qv = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where("vec_id IN (10, 20)").collect()
    ]
    pre = _rows(Q.binary_store_ann(spark, path, qv, k=5))
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    for k in ("sk_manifests", "vec_manifests", "applied"):
        meta.pop(k, None)
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    shutil.rmtree(os.path.join(path, "_manifests"), ignore_errors=True)
    assert _rows(Q.binary_store_ann(spark, path, qv, k=5)) == pre
    with pytest.raises(ValueError, match="manifest"):
        Q.optimize_binary_store(spark, path)
    assert Q.append_binary_batch(
        emb.where("vec_id >= 400"), path, batch_tag="w1"
    ) is True
    meta = SC.read_meta(path)
    assert meta["sk_manifests"] == ["base", "w1"]
    assert Q._sketches_for_meta(spark, path, meta).count() == emb.count()
    Q.optimize_binary_store(spark, path)  # now legal


def test_legacy_backfill_refuses_base_tag_before_any_write(
    spark, sf_dir, tmp_path
):
    """r11 review finding: on a LEGACY store the tag 'base' passes the
    early collision check (empty lists) and used to overwrite the
    just-backfilled base manifest — erasing the whole pre-batch corpus
    from the committed view. The refusal must land BEFORE any data is
    staged or published, on every appender."""
    from spark_indexedrdd_spark.functions import quant as Q
    from spark_indexedrdd_spark.functions import retrieval as R

    emb = _emb(spark, sf_dir)

    def _strip(path, keys):
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as fh:
            meta = json.load(fh)
        for k in keys:
            meta.pop(k, None)
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)
        shutil.rmtree(os.path.join(path, "_manifests"), ignore_errors=True)

    # IVF
    p = str(tmp_path / "ivf")
    write_ivf_store(emb.where("vec_id < 400"), p, n_clusters=8, method="det")
    _strip(p, ("manifests", "applied"))
    with pytest.raises(ValueError, match="collides"):
        append_ivf_batch(emb.where("vec_id >= 400"), p, batch_tag="base")
    # no published batch files, and the backfilled base is intact
    vdir = os.path.join(p, "vectors")
    strays = [
        f
        for d in os.listdir(vdir)
        if os.path.isdir(os.path.join(vdir, d))
        for f in os.listdir(os.path.join(vdir, d))
        if f.startswith("batch-base-")
    ]
    assert not strays
    vecs, _ = read_ivf_store(spark, p)
    assert vecs.count() == emb.where("vec_id < 400").count()

    # binary (two-part)
    bp = str(tmp_path / "bstore")
    Q.write_binary_store(emb.where("vec_id < 400"), bp)
    _strip(bp, ("sk_manifests", "vec_manifests", "applied"))
    with pytest.raises(ValueError, match="collides"):
        Q.append_binary_batch(
            emb.where("vec_id >= 400"), bp, batch_tag="base"
        )
    meta = SC.read_meta(bp)
    assert Q._sketches_for_meta(spark, bp, meta).count() == emb.where(
        "vec_id < 400"
    ).count()

    # postings
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pp = str(tmp_path / "postings")
    R.write_postings_store(docs.where("doc_id < 400"), pp, n_buckets=16)
    _strip(pp, ("manifests", "dl_manifests", "applied"))
    with pytest.raises(ValueError, match="collides"):
        R.append_postings_batch(
            docs.where("doc_id >= 400"), pp, batch_tag="base"
        )
    pdir = os.path.join(pp, "postings")
    strays = [
        f
        for d in os.listdir(pdir)
        if os.path.isdir(os.path.join(pdir, d))
        for f in os.listdir(os.path.join(pdir, d))
        if f.startswith("batch-base-")
    ]
    assert not strays


def test_append_honors_build_files_per_cluster(spark, sf_dir, tmp_path):
    """r11 review finding: appends must default to the BUILD's recorded
    files_per_cluster, not the signature default of 1."""
    emb = _emb(spark, sf_dir)
    p = str(tmp_path / "ivf_fpc")
    write_ivf_store(
        emb.where("vec_id < 300"), p,
        n_clusters=8, method="det", files_per_cluster=2,
    )
    append_ivf_batch(emb.where("vec_id >= 300"), p, batch_tag="w1")
    meta = SC.read_meta(p)
    w1_files = SC.resolve_manifest_files(path=p, meta={"manifests": ["w1"]})
    # under fpc=1 the append writes at most n_clusters(=8) files; with
    # the build's fpc=2 honored it writes into up to 16 buckets
    assert len(w1_files) > 8, w1_files


def test_ivf_changes_cdc(spark, split_store):
    """Version-to-version CDC on the vector tier (store_changes):
    added = the interval's appended ids, deleted = its tombstoned ids,
    added-then-deleted nets to nothing; refuses across an OPTIMIZE and
    across a rebuild (fresh build_token)."""
    from spark_indexedrdd_spark.functions.ivf import ivf_changes

    emb, path = split_store
    v1 = SC.read_meta(path)["version"]
    append_ivf_batch(emb.where("vec_id >= 400"), path, batch_tag="w1")
    # delete two pre-existing ids and one id appended THIS interval
    delete_ivf_ids(spark, path, [7, 14, 450], batch_tag="t1")
    v3 = SC.read_meta(path)["version"]
    ch = {(r[0], r.change) for r in ivf_changes(spark, path, v1, v3).collect()}
    added = {r.vec_id for r in emb.where("vec_id >= 400").collect()} - {450}
    assert ch == {(i, "added") for i in added} | {
        (7, "deleted"), (14, "deleted")
    }
    # empty interval: typed zero rows
    assert ivf_changes(spark, path, v3, v3).count() == 0
    # OPTIMIZE resets the ledgers: the crossing interval refuses
    optimize_ivf_store(spark, path)
    v4 = SC.read_meta(path)["version"]
    with pytest.raises(ValueError, match="compaction|rebuild"):
        ivf_changes(spark, path, v1, v4)
    # rebuild mints a new build_token: even look-alike ledgers refuse
    write_ivf_store(
        emb.where("vec_id < 400"), path, n_clusters=8, method="det"
    )
    v5 = SC.read_meta(path)["version"]
    with pytest.raises(ValueError, match="compaction|rebuild|floor|rewrit"):
        ivf_changes(spark, path, v1, v5)


def test_binary_changes_cdc(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.functions import quant as Q

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "bstore")
    Q.write_binary_store(emb.where("vec_id < 400"), path)
    v1 = SC.read_meta(path)["version"]
    Q.append_binary_batch(emb.where("vec_id >= 400"), path, batch_tag="w1")
    Q.delete_binary_ids(spark, path, [3, 410], batch_tag="t1")
    v3 = SC.read_meta(path)["version"]
    ch = {
        (r[0], r.change)
        for r in Q.binary_changes(spark, path, v1, v3).collect()
    }
    added = {r.vec_id for r in emb.where("vec_id >= 400").collect()} - {410}
    assert ch == {(i, "added") for i in added} | {(3, "deleted")}


def test_asof_read_keeps_partition_pruning(spark, split_store):
    """The manifest-resolved (explicit file list + basePath) as-of read
    must keep cluster_id filters at the PARTITION level — directory
    pruning, not a post-scan data filter — or every probed-cluster
    serve silently degrades to a full-index scan at scale."""
    from pyspark.sql import functions as F

    emb, path = split_store
    v1 = SC.read_meta(path)["version"]
    append_ivf_batch(emb.where("vec_id >= 400"), path, batch_tag="w1")
    snap = SC.read_meta_version(path, v1)
    vecs, _ = read_ivf_store(spark, path, meta=snap)
    one = vecs.where(F.col("cluster_id") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cluster_id" in ln for ln in pf), plan
    # and the snapshot really is the pre-append file set
    assert vecs.count() == emb.where("vec_id < 400").count()


def test_streaming_binary_store_matches_batch(spark, sf_dir, tmp_path):
    """StreamingBinaryStore: file-per-micro-batch ingest builds the same
    servable store as the build+append batch path (serve-identical),
    batch 0's id is in the replay ledger from the initializing commit,
    and optimize_every keeps the twin manifest lists bounded."""
    import glob

    from spark_indexedrdd_spark.functions import quant as Q

    emb = _emb(spark, sf_dir)
    batches = [
        emb.where("vec_id < 300"),
        emb.where("vec_id >= 300 AND vec_id < 400"),
        emb.where("vec_id >= 400"),
    ]
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    for i, b in enumerate(batches, start=1):
        tmp_out = str(tmp_path / f"w{i}")
        b.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dest = str(stream_dir / f"f{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60,) * 2)
    store = str(tmp_path / "bstore_stream")
    schema = spark.read.parquet(str(stream_dir / "f1.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    s = Q.StreamingBinaryStore(store, optimize_every=2)
    q = s.attach(stream, str(tmp_path / "ckpt"), availableNow=True)
    q.processAllAvailable()
    q.stop()

    ref = str(tmp_path / "bstore_ref")
    Q.write_binary_store(emb, ref)
    qv = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where("vec_id IN (10, 20, 30)").collect()
    ]
    got = _rows(Q.binary_store_ann(spark, store, qv, k=5))
    want = _rows(Q.binary_store_ann(spark, ref, qv, k=5))
    assert got == want and got
    meta = SC.read_meta(store)
    # batch 0 is replay-guarded from the initializing commit itself
    # (r14: tags are checkpoint-namespaced — <ns>-b0, never bare b0)
    tags = sorted(meta["applied"])
    assert any(t.endswith("-b0") for t in tags), tags
    assert not any(t == "b0" for t in tags), tags
    # the optimize cadence fired and bounded the manifest lists
    assert int(meta.get("compactions", 0)) >= 1
    assert len(meta["sk_manifests"]) <= 2
    # a redelivered committed batch is a no-op (its committed tag form)
    b1_tag = next(t for t in tags if t.endswith("-b1"))
    assert Q.append_binary_batch(batches[1], store, batch_tag=b1_tag) is False


def test_binary_delete_wins_append_and_cdc_reports_delete(
    spark, sf_dir, tmp_path
):
    """r11 review finding: the binary/IVFPQ appends must drop currently
    tombstoned ids (delete-wins, the IVF convention) — otherwise a
    delete-then-re-append lands the id in a committed manifest the
    serve hides, and the CDC's added∧deleted netting silently drops the
    delete event."""
    from spark_indexedrdd_spark.functions import pq as PQ
    from spark_indexedrdd_spark.functions import quant as Q

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "bstore")
    Q.write_binary_store(emb.where("vec_id < 400"), path)
    v1 = SC.read_meta(path)["version"]
    Q.delete_binary_ids(spark, path, [7], batch_tag="t1")
    # the re-ingest batch INCLUDES the tombstoned id — it must be
    # excluded from the committed manifest (delete-wins)
    Q.append_binary_batch(
        emb.where("vec_id = 7 OR vec_id >= 400"), path, batch_tag="w1"
    )
    meta = SC.read_meta(path)
    assert (
        Q._sketches_for_meta(spark, path, meta)
        .where("vec_id = 7").count() == 1
    ), "shadow copy written"
    v3 = meta["version"]
    ch = {
        (r[0], r.change)
        for r in Q.binary_changes(spark, path, v1, v3).collect()
    }
    assert (7, "deleted") in ch, ch
    assert all(i != 7 for i, c in ch if c == "added")

    # IVFPQ tier: same contract
    p2 = str(tmp_path / "ivfpq")
    PQ.write_ivfpq_store(
        emb.where("vec_id < 400"), p2,
        n_clusters=8, m=4, ksub=8, method="det",
    )
    v1 = SC.read_meta(p2)["version"]
    PQ.delete_ivfpq_ids(spark, p2, [7], batch_tag="t1")
    PQ.append_ivfpq_batch(
        emb.where("vec_id = 7 OR vec_id >= 400"), p2, batch_tag="w1"
    )
    meta = SC.read_meta(p2)
    codes, _c, _b = PQ.read_ivfpq_store(spark, p2, meta=meta)
    assert codes.where("vec_id = 7").count() == 1, "shadow copy written"
    ch = {
        (r[0], r.change)
        for r in PQ.ivfpq_changes(spark, p2, v1, meta["version"]).collect()
    }
    assert (7, "deleted") in ch, ch


def test_streaming_binary_init_batch_does_not_optimize(
    spark, sf_dir, tmp_path
):
    """r11 review finding: the cadence must not fire on the fresh
    single-batch build (the zonemap/bloom twins' convention)."""
    import glob

    from spark_indexedrdd_spark.functions import quant as Q

    emb = _emb(spark, sf_dir)
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    tmp_out = str(tmp_path / "w1")
    emb.where("vec_id < 200").coalesce(1).write.parquet(tmp_out)
    shutil.copy(
        glob.glob(f"{tmp_out}/part-*.parquet")[0],
        str(stream_dir / "f1.parquet"),
    )
    store = str(tmp_path / "bstore")
    schema = spark.read.parquet(str(stream_dir / "f1.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    s = Q.StreamingBinaryStore(store, optimize_every=1)
    q = s.attach(stream, str(tmp_path / "ckpt"), availableNow=True)
    q.processAllAvailable()
    q.stop()
    assert int(SC.read_meta(store).get("compactions", 0)) == 0


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    ops=st.lists(
        st.sampled_from(
            [
                "append_clean",
                "append_crash",
                "append_redeliver",
                "delete",
                "optimize",
                "vacuum",
                "vacuum_prune",
            ]
        ),
        min_size=2,
        max_size=6,
    )
)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_ivf_versioned_lifecycle_model(spark, sf_dir, ops):
    """Property over store lifecycles: for ANY sequence of appends
    (clean / crash-after-publish replay / duplicate redelivery),
    tombstone deletes, snapshot-preserving optimizes, and retention
    vacuums, the live store equals a simple set model (exactly-once
    appends with delete-wins, physical folds at optimize), and every
    recorded version snapshot either serves its frozen id set exactly
    (at/above the floor) or refuses loudly (below it)."""
    import shutil as sh
    import tempfile

    emb = _emb(spark, sf_dir)
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    root = tempfile.mkdtemp(prefix="ivfmodel_")
    try:
        p = os.path.join(root, "store")
        base_ids = {i for i in all_ids if i % 17 == 0}
        write_ivf_store(
            emb.where("vec_id % 17 = 0"), p, n_clusters=4, method="det"
        )
        live = set(base_ids)
        tombs: set = set()
        snaps = []  # (version, frozenset(live))
        n_appends = 0
        n_deletes = 0

        def record():
            snaps.append((SC.read_meta(p)["version"], frozenset(live)))

        record()
        for op in ops:
            if op.startswith("append"):
                n_appends += 1
                m = n_appends  # slices %17 == m are disjoint per append
                if m > 16:
                    continue
                batch_ids = {i for i in all_ids if i % 17 == m}
                batch = emb.where(f"vec_id % 17 = {m}")
                tag = f"a{m}"
                if op == "append_crash":
                    with open(os.path.join(p, "meta.json")) as fh:
                        pre = fh.read()
                    assert append_ivf_batch(batch, p, batch_tag=tag)
                    with open(os.path.join(p, "meta.json"), "w") as fh:
                        fh.write(pre)  # crash: publish done, commit rewound
                    assert append_ivf_batch(batch, p, batch_tag=tag)
                else:
                    assert append_ivf_batch(batch, p, batch_tag=tag)
                    if op == "append_redeliver":
                        assert (
                            append_ivf_batch(batch, p, batch_tag=tag)
                            is False
                        )
                live |= batch_ids - tombs  # delete-wins exactly-once
            elif op == "delete":
                n_deletes += 1
                del_ids = {
                    i for i in all_ids if i % 13 == n_deletes % 13
                }
                delete_ivf_ids(
                    spark, p, sorted(del_ids), batch_tag=f"d{n_deletes}"
                )
                live -= del_ids
                tombs |= del_ids
            elif op == "optimize":
                n_live = optimize_ivf_store(spark, p)
                assert n_live == len(live)
                tombs = set()  # physically folded
            elif op == "vacuum":
                SC.vacuum_store(p, keep_versions=1)
            elif op == "vacuum_prune":
                # r12: retention + ledger checkpoint in one pass — the
                # below-floor per-commit files fold into the
                # index/metas checkpoint pair; every invariant below
                # (snapshot serves, refusals, list_versions range)
                # must hold identically through the fold
                SC.vacuum_store(p, keep_versions=1, prune_ledger=True)
            record()
            vecs, _ = read_ivf_store(spark, p)
            got = {r.vec_id for r in vecs.select("vec_id").collect()}
            # the live FRAME may still hold tombstoned rows (logical
            # deletes); the serve path's view is frame minus tombstones
            assert got - tombs == live, (op, len(got), len(live))
        # every recorded snapshot: exact at/above the floor, loud below
        floor = int(SC.read_meta(p).get("rewrite_floor", 0))
        for v, frozen in snaps:
            if v >= floor:
                snap_meta = SC.read_meta_version(p, v)
                vecs, _ = read_ivf_store(spark, p, meta=snap_meta)
                got = {
                    r.vec_id for r in vecs.select("vec_id").collect()
                }
                tomb_df = SC.committed_tombstones(
                    spark, p, snap_meta, "vec_id",
                    vecs.schema["vec_id"].dataType,
                )
                dead = (
                    {r.vec_id for r in tomb_df.collect()}
                    if tomb_df is not None
                    else set()
                )
                assert got - dead == frozen, (v, len(got), len(frozen))
            else:
                with pytest.raises(ValueError):
                    SC.assert_snapshot_servable(
                        p, SC.read_meta_version(p, v)
                    )
        # a ledger prune must never shrink the ENUMERABLE range: every
        # recorded version stays listed (folded ones via the
        # checkpoint index) and its meta stays readable above —
        # read_meta_version succeeded for every snap in the loop
        listed = set(SC.list_versions(p))
        assert {v for v, _ in snaps} <= listed, (snaps, sorted(listed))
    finally:
        sh.rmtree(root, ignore_errors=True)
