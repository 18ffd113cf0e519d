"""Takedown deletes across the persisted stores: postings
(exact-BM25-over-survivors tombstones + stat deltas from the doclen
sidecar), signature store (ledger tombstones), and the cross-store
orchestrator. The IVF store's delete mechanics are pinned in
tests/test_ivf_delete.py; oracle parity for the postings takedown runs
via the `bm25_takedown_serve` contract entry."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import dedup as D
from spark_indexedrdd_spark.functions import retrieval as R
from spark_indexedrdd_spark.functions.takedown import takedown_docs
from spark_indexedrdd_spark.sources.tables import load_table

DEL_PRED = "doc_id % 5 = 0"


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture()
def store(spark, docs, tmp_path):
    path = str(tmp_path / "postings")
    R.write_postings_store(docs, path)
    return path


def _survivor_scores(docs):
    return sorted(
        map(tuple, R.bm25_topk(docs.where(f"NOT ({DEL_PRED})")).collect())
    )


def test_delete_then_serve_equals_rebuilt_over_survivors(spark, docs, store):
    """The exactness claim itself: serve-after-delete must be
    bit-identical to the in-plan operator over the surviving corpus —
    df, n_docs and avgdl all re-derived, not approximated."""
    assert R.delete_postings_docs(
        spark, store, docs.where(DEL_PRED).select("doc_id"), "take-1"
    )
    got = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    assert got == _survivor_scores(docs)
    assert got  # non-vacuous


def test_delete_replay_and_crash_are_exact(spark, docs, store):
    doomed = docs.where(DEL_PRED).select("doc_id")
    assert R.delete_postings_docs(spark, store, doomed, "t1") is True
    before = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    # replay of a committed tag: no-op, stats not double-subtracted
    assert R.delete_postings_docs(spark, store, doomed, "t1") is False
    meta = json.load(open(os.path.join(store, "meta.json")))
    n_del = meta["n_docs_deleted"]
    assert sorted(map(tuple, R.bm25_from_store(spark, store).collect())) == before
    # crash model: a tombstone dir written with NO meta commit is
    # invisible to serves
    shutil.copytree(
        os.path.join(store, "tombstones", "t1"),
        os.path.join(store, "tombstones", "crashed"),
    )
    assert sorted(map(tuple, R.bm25_from_store(spark, store).collect())) == before
    assert json.load(open(os.path.join(store, "meta.json")))["n_docs_deleted"] == n_del


def test_double_delete_across_tags_never_double_subtracts(spark, docs, store):
    """Overlapping id sets in two batches: the second batch's deltas
    count only the NEWLY-dead docs, so stats still equal the survivor
    corpus exactly."""
    R.delete_postings_docs(spark, store, docs.where(DEL_PRED).select("doc_id"), "a")
    # second batch: every %5 doc again, plus the %7 docs
    R.delete_postings_docs(
        spark, store, docs.where("doc_id % 5 = 0 OR doc_id % 7 = 0").select("doc_id"), "b"
    )
    want = sorted(
        map(
            tuple,
            R.bm25_topk(
                docs.where("NOT (doc_id % 5 = 0 OR doc_id % 7 = 0)")
            ).collect(),
        )
    )
    assert sorted(map(tuple, R.bm25_from_store(spark, store).collect())) == want
    meta = json.load(open(os.path.join(store, "meta.json")))
    n_live = docs.where("NOT (doc_id % 5 = 0 OR doc_id % 7 = 0)").count()
    assert meta["n_docs"] - meta["n_docs_deleted"] == n_live


def test_unknown_ids_are_noop_and_legacy_store_raises(spark, docs, store, tmp_path):
    before = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    assert R.delete_postings_docs(spark, store, [10**9, 10**9 + 1], "ghost")
    meta = json.load(open(os.path.join(store, "meta.json")))
    assert meta["n_docs_deleted"] == 0 and meta["total_dl_deleted"] == 0
    assert sorted(map(tuple, R.bm25_from_store(spark, store).collect())) == before
    # a store built before the doclen sidecar: delete must refuse
    # loudly, not guess stats
    legacy = str(tmp_path / "legacy")
    R.write_postings_store(docs, legacy)
    meta_p = os.path.join(legacy, "meta.json")
    m = json.load(open(meta_p))
    del m["dl_manifests"]
    json.dump(m, open(meta_p, "w"))
    with pytest.raises(ValueError, match="doclen"):
        R.delete_postings_docs(spark, legacy, [1], "t")
    with pytest.raises(ValueError):
        R.delete_postings_docs(spark, store, [1], "../evil")


def test_append_then_delete_composes(spark, docs, store):
    """Delete ids spanning the base build AND an appended batch: the
    appended batch's doclen manifest must feed the delta math."""
    half = docs.where("doc_id % 2 = 0")
    fresh = str(store) + "_half"
    R.write_postings_store(half, fresh)
    assert R.append_postings_batch(
        docs.where("doc_id % 2 = 1"), fresh, batch_tag="odds"
    )
    R.delete_postings_docs(
        spark, fresh, docs.where(DEL_PRED).select("doc_id"), "take"
    )
    got = sorted(map(tuple, R.bm25_from_store(spark, fresh).collect()))
    assert got == _survivor_scores(docs)


def test_dl_manifest_tag_collision_is_loud(spark, docs, store):
    # the whole dl- namespace is now reserved up front (r11: refusal
    # must run BEFORE the replay sweep), which subsumes the original
    # per-name collision check this test pinned
    with pytest.raises(ValueError, match="reserved prefix"):
        R.append_postings_batch(
            docs.where("doc_id % 97 = 0"), store, batch_tag="dl-base"
        )


def test_compaction_preserves_serve_and_drops_rows(spark, docs, store):
    R.delete_postings_docs(spark, store, docs.where(DEL_PRED).select("doc_id"), "t")
    before = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    n_live = docs.where(f"NOT ({DEL_PRED})").count()
    assert R.compact_postings_store(spark, store) == n_live
    assert sorted(map(tuple, R.bm25_from_store(spark, store).collect())) == before
    assert not os.path.exists(os.path.join(store, "tombstones"))
    post = spark.read.parquet(store + "/postings")
    assert post.where(F.col("doc_id") % 5 == 0).count() == 0
    dl = spark.read.parquet(store + "/doclen")
    assert dl.count() == n_live
    meta = json.load(open(os.path.join(store, "meta.json")))
    assert meta["n_docs"] == n_live and "n_docs_deleted" not in meta
    # idempotent: second compaction is a no-op
    assert R.compact_postings_store(spark, store) == n_live
    # and the store keeps accepting appends afterwards
    assert R.append_postings_batch(
        docs.where(DEL_PRED), store, batch_tag="readd"
    )
    assert sorted(map(tuple, R.bm25_from_store(spark, store).collect())) == sorted(
        map(tuple, R.bm25_topk(docs).collect())
    )


def test_signature_tombstones_shield_new_arrivals(spark, docs, tmp_path):
    """A tombstoned corpus doc must stop claiming new docs as dups;
    the store-based incremental result must equal the in-plan result
    over the survivor corpus."""
    path = str(tmp_path / "sigs")
    corpus = docs.where("doc_id % 20 != 0")
    new = docs.where("doc_id % 20 = 0")
    D.write_signature_store(corpus, path)
    base = sorted(
        map(tuple, D.incremental_lsh_candidates_from_store(new, path).collect())
    )
    spark.catalog.clearCache()
    dead = corpus.where("doc_id % 7 = 0").select("doc_id")
    D.delete_signature_docs(spark, path, dead, "take-1")
    got = sorted(
        map(tuple, D.incremental_lsh_candidates_from_store(new, path).collect())
    )
    spark.catalog.clearCache()
    want = sorted(
        map(
            tuple,
            D.incremental_lsh_candidates(
                new, corpus.where("doc_id % 7 != 0")
            ).collect(),
        )
    )
    spark.catalog.clearCache()
    assert got == want
    # either the delete visibly removed corpus-side pairs, or no dead
    # doc participated in any candidate pair (then the result must be
    # unchanged) — both directions pin that tombstones do exactly the
    # survivor-corpus thing, nothing more
    dead_ids = {r.doc_id for r in dead.collect()}
    if any(b in dead_ids for _, b, _ in base):
        assert got != base
    else:
        assert got == base
    # raw view still has the rows; live view does not
    assert D.read_signature_store(spark, path, live=False).where(
        "doc_id % 20 != 0 AND doc_id % 7 = 0"
    ).count() > 0
    assert (
        D.read_signature_store(spark, path).where(
            "doc_id % 20 != 0 AND doc_id % 7 = 0"
        ).count()
        == 0
    )


def test_tombstoned_near_dup_stops_claiming_new_docs(spark, tmp_path):
    """Direct shield check on a constructed corpus: doc 1 is a
    near-copy of incoming doc 100; after doc 1 is taken down, the
    (100, 1) candidate pair must vanish."""
    path = str(tmp_path / "sigs")
    text = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, text), (2, "completely unrelated words about spark shuffles")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame([(100, text + " today")], "doc_id long, text string")
    D.write_signature_store(corpus, path)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in D.incremental_lsh_candidates_from_store(new, path).collect()
    }
    spark.catalog.clearCache()
    assert (100, 1) in pairs  # the fixture really is a near-dup
    D.delete_signature_docs(spark, path, [1], "take")
    pairs2 = {
        (r.doc_a, r.doc_b)
        for r in D.incremental_lsh_candidates_from_store(new, path).collect()
    }
    spark.catalog.clearCache()
    assert (100, 1) not in pairs2


def test_compact_signature_store_drops_dead_rows(spark, docs, tmp_path):
    path = str(tmp_path / "sigs")
    D.write_signature_store(docs, path)
    D.delete_signature_docs(spark, path, [0, 5, 10], "t1")
    live_before = sorted(
        map(tuple, D.read_signature_store(spark, path).collect())
    )
    D.compact_signature_store(spark, path)
    assert not os.path.exists(os.path.join(path, "_tombstones"))
    assert sorted(map(tuple, D.read_signature_store(spark, path).collect())) == live_before
    assert (
        D.read_signature_store(spark, path, live=False)
        .where("doc_id in (0, 5, 10)")
        .count()
        == 0
    )


def test_takedown_orchestrator(spark, docs, sf_dir, tmp_path):
    from spark_indexedrdd_spark.functions import ivf as IVF

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    p_post = str(tmp_path / "postings")
    p_sig = str(tmp_path / "sigs")
    p_ivf = str(tmp_path / "ivf")
    R.write_postings_store(docs, p_post)
    D.write_signature_store(docs, p_sig)
    IVF.write_ivf_store(emb, p_ivf, n_clusters=8, method="det")
    ids = [0, 5, 10, 15, 20]
    out = takedown_docs(
        spark, ids, "legal-42",
        postings_path=p_post, signature_path=p_sig, ivf_path=p_ivf,
    )
    assert out == {"postings": True, "signatures": True, "ivf": True}
    # every store individually reflects the batch
    assert json.load(open(os.path.join(p_post, "meta.json")))["deletes"] == ["legal-42"]
    assert D.read_signature_store(spark, p_sig).where(
        F.col("doc_id").isin(ids)
    ).count() == 0
    served = IVF.ivf_ann_from_store(spark, p_ivf, [50, 100], k=5).collect()
    assert all(r.cand_id not in ids for r in served)
    # re-run (partial-failure recovery): committed stores report False,
    # the ledger store re-applies exactly
    out2 = takedown_docs(
        spark, ids, "legal-42",
        postings_path=p_post, signature_path=p_sig, ivf_path=p_ivf,
    )
    assert out2 == {"postings": False, "signatures": True, "ivf": False}


def test_reappend_tombstoned_doc_keeps_bm25_exact(spark, docs, store):
    """Delete-wins until compaction: re-ingesting a tombstoned doc must
    NOT drift n_docs/avgdl away from the visible corpus — the batch's
    tombstoned ids are excluded before stats are computed, so serves
    stay bit-identical to a survivor rebuild."""
    dead = docs.where("doc_id % 10 = 3").select("doc_id")
    assert R.delete_postings_docs(spark, store, dead, batch_tag="td-re")
    # the doc comes back in a later ingest batch (plus genuinely-new
    # content is absent here — the batch is ONLY shadowed ids)
    assert R.append_postings_batch(
        docs.where("doc_id % 10 = 3"), store, batch_tag="re-ingest"
    )
    got = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    want = sorted(
        map(tuple, R.bm25_topk(docs.where("doc_id % 10 != 3")).collect())
    )
    assert got == want
    # after compaction the id is genuinely re-addable
    R.compact_postings_store(spark, store)
    assert R.append_postings_batch(
        docs.where("doc_id % 10 = 3"), store, batch_tag="re-ingest-2"
    )
    got2 = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    full = sorted(map(tuple, R.bm25_topk(docs).collect()))
    assert got2 == full


def test_signature_compact_carries_racing_tombstones(
    spark, docs, tmp_path, monkeypatch
):
    """A tombstone batch committed DURING the compaction rewrite must
    survive the swap (carried into the compacted ledger), not be
    silently dropped — the store's contract allows concurrent
    deletes."""
    path = str(tmp_path / "sig_race")
    D.write_signature_store(docs, path)
    D.delete_signature_docs(
        spark, path, docs.where("doc_id % 10 = 3").select("doc_id"), "early"
    )
    # plant a "racing" delete: present on disk, but invisible to the
    # compaction's FIRST tag listing (as if committed mid-rewrite)
    D.delete_signature_docs(
        spark, path, docs.where("doc_id % 10 = 7").select("doc_id"), "racing"
    )
    real = D._tombstone_tags
    calls = {"n": 0}

    def fake(p):
        calls["n"] += 1
        tags = real(p)
        if calls["n"] == 1:
            return [t for t in tags if t != "racing"]
        return tags

    monkeypatch.setattr(D, "_tombstone_tags", fake)
    D.compact_signature_store(spark, path)
    live = D.read_signature_store(spark, path, live=True)
    ids = {r.doc_id for r in live.select("doc_id").distinct().collect()}
    assert not any(i % 10 == 3 for i in ids), "folded delete dropped rows"
    assert not any(i % 10 == 7 for i in ids), "racing delete must survive"
    raw = D.read_signature_store(spark, path, live=False)
    raw_ids = {r.doc_id for r in raw.select("doc_id").distinct().collect()}
    assert any(i % 10 == 7 for i in raw_ids), "racing rows still on disk"
    assert not any(i % 10 == 3 for i in raw_ids), "folded rows dropped"


def test_uncastable_delete_ids_refuse_loudly(spark, docs, store, tmp_path):
    """An id that cannot cast to the store's id type becomes NULL,
    drops out of the tombstone join, and the takedown would report
    success while deleting nothing — both stores must refuse loudly
    instead (the delete_ivf_ids rule). Castable strings still work."""
    with pytest.raises(ValueError, match="refusing"):
        R.delete_postings_docs(spark, store, ["not-a-number"], "bad-1")
    meta = json.load(open(os.path.join(store, "meta.json")))
    assert "bad-1" not in meta.get("deletes", [])
    # a numeric string casts fine and must still be accepted
    assert R.delete_postings_docs(spark, store, ["5"], "str-ok")
    sig = str(tmp_path / "sig")
    D.write_signature_store(docs.limit(50), sig)
    with pytest.raises(ValueError, match="refusing"):
        D.delete_signature_docs(spark, sig, ["nope"], "bad-2")
    assert D.signature_tombstones(spark, sig) is None


def test_delete_every_doc_then_serve_is_empty(spark, docs, store):
    """A takedown that deletes EVERY document leaves n_docs = 0: the
    serve must return the typed empty result, not raise on the NULL
    0/0 avgdl."""
    assert R.delete_postings_docs(spark, store, docs.select("doc_id"), "all")
    out = R.bm25_from_store(spark, store)
    assert out.count() == 0
    assert out.columns == ["qid", "doc_id", "score", "rank"]


def _recut(rows, dead, k):
    """Expected post-delete serve: the pre-delete serve with deleted
    candidates dropped and ranks recut per query (codebooks/sketches
    are pinned by the store, so deletion only hides candidates)."""
    out, n_by_q = [], {}
    for r in sorted(rows, key=lambda r: (r[0], r[-1])):
        if r[1] in dead:
            continue
        n = n_by_q.get(r[0], 0) + 1
        n_by_q[r[0]] = n
        if n <= k:
            out.append(tuple(list(r[:-1]) + [n]))
    return sorted(out)


def test_ivfpq_delete_serve_equals_recut(spark, sf_dir, tmp_path):
    """Tombstone-delete on the servable IVFPQ store: the post-delete
    serve equals the pre-delete serve with the deleted candidates
    excluded and ranks recut; replay is a no-op; a crash before the
    meta commit is invisible; compaction is serve-transparent."""
    import spark_indexedrdd_spark.functions.pq as PQ
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    p = str(tmp_path / "ivfpq_del")
    PQ.write_ivfpq_store(emb, p, n_clusters=4, m=4, ksub=8, method="det")
    qv = [(0, [1.0] * 64), (1, [0.5] * 64)]
    k, dead = 5, None
    pre_big = [tuple(r) for r in PQ.ivfpq_store_ann(spark, p, qv, k=k + 3).collect()]
    dead = {pre_big[0][1], pre_big[1][1], pre_big[k][1]}
    assert PQ.delete_ivfpq_ids(spark, p, sorted(dead), "take-1")
    got = sorted(map(tuple, PQ.ivfpq_store_ann(spark, p, qv, k=k).collect()))
    assert got == _recut(pre_big, dead, k) and len(got) > 0
    assert not any(r[1] in dead for r in got)
    # replay no-op; uncastable refuses; empty is a no-op commit
    assert PQ.delete_ivfpq_ids(spark, p, sorted(dead), "take-1") is False
    with pytest.raises(ValueError, match="refusing"):
        PQ.delete_ivfpq_ids(spark, p, ["nope"], "bad")
    assert PQ.delete_ivfpq_ids(spark, p, [], "empty")
    # crash before the meta commit: tombstone parquet invisible
    pre_meta = open(os.path.join(p, "meta.json")).read()
    assert PQ.delete_ivfpq_ids(spark, p, [pre_big[2][1]], "crash-1")
    with open(os.path.join(p, "meta.json"), "w") as fh:
        fh.write(pre_meta)
    after_rewind = sorted(
        map(tuple, PQ.ivfpq_store_ann(spark, p, qv, k=k).collect())
    )
    assert after_rewind == got  # uncommitted delete invisible
    assert PQ.delete_ivfpq_ids(spark, p, [pre_big[2][1]], "crash-1")  # replay
    served = sorted(map(tuple, PQ.ivfpq_store_ann(spark, p, qv, k=k).collect()))
    # compaction drops dead rows, serve-transparent
    n_live = PQ.compact_ivfpq_store(spark, p)
    codes = spark.read.parquet(p + "/codes")
    assert codes.count() == n_live
    assert not SC.read_meta(p)["deletes"]
    assert sorted(map(tuple, PQ.ivfpq_store_ann(spark, p, qv, k=k).collect())) == served


def test_binary_delete_serve_equals_recut(spark, sf_dir, tmp_path):
    """Tombstone-delete on the binary sketch store: with an exhaustive
    stage-1 (n_candidates >= corpus) the post-delete serve equals the
    pre-delete serve recut over survivors; the deleted id can never
    surface."""
    import spark_indexedrdd_spark.functions.quant as Q
    from spark_indexedrdd_spark.sources.tables import load_table

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .limit(150)
    )
    p = str(tmp_path / "bin_del")
    Q.write_binary_store(emb, p)
    qv = [(0, [1.0] * 64)]
    k = 5
    pre_big = [
        tuple(r)
        for r in Q.binary_store_ann(
            spark, p, qv, k=k + 3, n_candidates=300
        ).collect()
    ]
    dead = {pre_big[0][1], pre_big[2][1]}
    assert Q.delete_binary_ids(spark, p, sorted(dead), "take-1")
    got = sorted(
        map(
            tuple,
            Q.binary_store_ann(spark, p, qv, k=k, n_candidates=300).collect(),
        )
    )
    assert got == _recut(pre_big, dead, k) and len(got) > 0
    assert Q.delete_binary_ids(spark, p, sorted(dead), "take-1") is False
    with pytest.raises(ValueError, match="refusing"):
        Q.delete_binary_ids(spark, p, ["nope"], "bad")


def test_takedown_orchestrator_covers_compressed_tiers(
    spark, docs, sf_dir, tmp_path
):
    """One takedown batch applied across all five store kinds under one
    tag: every ANN tier stops serving the dead ids, and the re-run
    replays as a per-store no-op."""
    import spark_indexedrdd_spark.functions.ivf as IVF
    import spark_indexedrdd_spark.functions.pq as PQ
    import spark_indexedrdd_spark.functions.quant as Q
    from spark_indexedrdd_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    p_post = str(tmp_path / "post")
    p_sig = str(tmp_path / "sig")
    p_ivf = str(tmp_path / "ivf")
    p_pq = str(tmp_path / "ivfpq")
    p_bin = str(tmp_path / "bin")
    R.write_postings_store(docs, p_post)
    D.write_signature_store(docs, p_sig)
    IVF.write_ivf_store(emb, p_ivf, n_clusters=4, method="det")
    PQ.write_ivfpq_store(emb, p_pq, n_clusters=4, m=4, ksub=8, method="det")
    Q.write_binary_store(emb.limit(150), p_bin)
    dead = [50, 100]
    res = takedown_docs(
        spark, dead, "legal-7",
        postings_path=p_post, signature_path=p_sig, ivf_path=p_ivf,
        ivfpq_path=p_pq, binary_path=p_bin,
    )
    assert res == {
        "postings": True, "signatures": True, "ivf": True,
        "ivfpq": True, "binary": True,
    }
    qv = [(0, [1.0] * 64)]
    assert not any(
        r.cand_id in dead
        for r in PQ.ivfpq_store_ann(spark, p_pq, qv, k=20).collect()
    )
    assert not any(
        r.cand_id in dead
        for r in Q.binary_store_ann(
            spark, p_bin, qv, k=20, n_candidates=300
        ).collect()
    )
    res2 = takedown_docs(
        spark, dead, "legal-7",
        postings_path=p_post, signature_path=p_sig, ivf_path=p_ivf,
        ivfpq_path=p_pq, binary_path=p_bin,
    )
    assert res2 == {
        "postings": False, "signatures": True, "ivf": False,
        "ivfpq": False, "binary": False,
    }


def test_optimize_preserves_snapshots_then_vacuum_reclaims(
    spark, docs, tmp_path
):
    """The OPTIMIZE/VACUUM pair (r11): snapshot-preserving compaction
    folds the tombstones and re-merges files WITHOUT moving the
    servability floor — the pre-optimize snapshot keeps serving
    byte-identically — and a later vacuum reclaims the pre-optimize
    files, manifests and tombstone dirs once the floor passes them."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    path = str(tmp_path / "postings_opt")
    R.write_postings_store(docs.where("doc_id % 2 = 0"), path, n_buckets=8)
    R.append_postings_batch(
        docs.where("doc_id % 2 = 1"), path, batch_tag="opt-b1"
    )
    R.delete_postings_docs(
        spark, path, docs.where(DEL_PRED).select("doc_id"),
        batch_tag="opt-d1",
    )
    v_pre = SC.read_meta(path)["version"]
    pre_live = sorted(map(tuple, R.bm25_from_store(spark, path).collect()))
    pre_snap = sorted(
        map(tuple, R.bm25_from_store(spark, path, version=v_pre).collect())
    )
    n_files_pre = len(SC.list_parquet_files(os.path.join(path, "postings")))

    n_live = R.optimize_postings_store(spark, path)
    v_post = SC.read_meta(path)["version"]
    meta = SC.read_meta(path)
    assert meta["deletes"] == [] and len(meta["manifests"]) == 1

    # live serve unchanged; the pre-optimize snapshot STILL serves
    # (the destructive compactor would have floored it away)
    assert (
        sorted(map(tuple, R.bm25_from_store(spark, path).collect()))
        == pre_live
    )
    assert (
        sorted(
            map(tuple, R.bm25_from_store(spark, path, version=v_pre).collect())
        )
        == pre_snap
    )
    assert n_live == docs.where(f"NOT ({DEL_PRED})").count()
    # stat exactness: optimized serve == survivor-corpus rebuild
    assert pre_live == _survivor_scores(docs)
    # CDC across the boundary refuses loudly (ledgers reset)
    with pytest.raises(ValueError, match="crossed the interval"):
        R.postings_changes(spark, path, v_pre, v_post)

    out = SC.vacuum_store(path, keep_versions=1)
    assert out["floor"] == v_post
    # pre-optimize batch/base files + their manifests + the tombstone
    # dir are reclaimed; the optimized file set survives
    assert out["removed_files"] and out["removed_tombstones"] == ["opt-d1"]
    assert set(out["removed_manifests"]) >= {"base", "opt-b1"}
    n_files_post = len(SC.list_parquet_files(os.path.join(path, "postings")))
    assert n_files_post < n_files_pre
    with pytest.raises(ValueError, match="floor"):
        R.bm25_from_store(spark, path, version=v_pre)
    assert (
        sorted(map(tuple, R.bm25_from_store(spark, path).collect()))
        == pre_live
    )


def test_optimize_without_tombstones_remerges_files(spark, docs, tmp_path):
    """OPTIMIZE is also the small-file re-merge: on a store with no
    deletes it folds the append-accumulated files into one set per
    bucket and the serve is unchanged."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    path = str(tmp_path / "postings_merge")
    R.write_postings_store(docs.where("doc_id % 2 = 0"), path, n_buckets=8)
    R.append_postings_batch(
        docs.where("doc_id % 2 = 1"), path, batch_tag="m-b1"
    )
    pre = sorted(map(tuple, R.bm25_from_store(spark, path).collect()))
    R.optimize_postings_store(spark, path)
    assert (
        sorted(map(tuple, R.bm25_from_store(spark, path).collect())) == pre
    )
    assert SC.read_meta(path)["manifests"] == ["optimize-1"]


def test_optimize_conflict_destroys_nothing_and_rerun_succeeds(
    spark, docs, tmp_path, monkeypatch
):
    """A writer committing DURING an optimize loses nothing: optimize's
    meta commit detects the moved frontier and raises
    ConcurrentWriteConflict BEFORE anything it staged is referenced;
    the winner's takedown stands, and the re-run optimizes against the
    winner's state exactly."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    path = str(tmp_path / "postings_race")
    R.write_postings_store(docs, path, n_buckets=8)
    orig = R._publish_staged
    fired = {"done": False}

    def racing_publish(p, stage, tag):
        out = orig(p, stage, tag)
        if not fired["done"]:
            fired["done"] = True
            R.delete_postings_docs(
                spark, path, docs.where(DEL_PRED).select("doc_id"),
                batch_tag="race-d1",
            )
        return out

    monkeypatch.setattr(R, "_publish_staged", racing_publish)
    with pytest.raises(SC.ConcurrentWriteConflict):
        R.optimize_postings_store(spark, path)
    monkeypatch.undo()
    # the winner's takedown is intact and servable
    assert (
        sorted(map(tuple, R.bm25_from_store(spark, path).collect()))
        == _survivor_scores(docs)
    )
    # re-run folds the winner's tombstones physically; serve unchanged
    n_live = R.optimize_postings_store(spark, path)
    assert n_live == docs.where(f"NOT ({DEL_PRED})").count()
    assert SC.read_meta(path)["deletes"] == []
    assert (
        sorted(map(tuple, R.bm25_from_store(spark, path).collect()))
        == _survivor_scores(docs)
    )


def test_optimize_crash_before_commit_leaves_store_intact(
    spark, docs, tmp_path, monkeypatch
):
    """Crash between publish and the meta commit: every reader still
    sees the pre-optimize store (published files are unreferenced), and
    the re-run is exact."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    path = str(tmp_path / "postings_crash")
    R.write_postings_store(docs, path, n_buckets=8)
    R.delete_postings_docs(
        spark, path, docs.where(DEL_PRED).select("doc_id"),
        batch_tag="crash-d1",
    )
    pre = sorted(map(tuple, R.bm25_from_store(spark, path).collect()))

    def boom(p, meta, rewrite=False):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(SC, "commit_meta", boom)
    with pytest.raises(RuntimeError):
        R.optimize_postings_store(spark, path)
    monkeypatch.undo()
    assert (
        sorted(map(tuple, R.bm25_from_store(spark, path).collect())) == pre
    )
    R.optimize_postings_store(spark, path)
    assert (
        sorted(map(tuple, R.bm25_from_store(spark, path).collect())) == pre
    )


def test_append_tags_cannot_collide_with_retired_or_internal_names(
    spark, docs, tmp_path
):
    """Post-optimize, names an older servable snapshot still references
    must stay un-collidable: reserved prefixes refuse outright (BEFORE
    any replay sweep could touch live optimize files), and the retired
    ledger blocks reuse of 'base'/old tags until a vacuum reclaims
    their manifest files — after which the name is free again."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    path = str(tmp_path / "postings_collide")
    half = docs.where("doc_id % 2 = 0")
    rest = docs.where("doc_id % 2 = 1")
    R.write_postings_store(half, path, n_buckets=8)
    R.optimize_postings_store(spark, path)
    assert SC.read_meta(path)["manifests"] == ["optimize-1"]
    live_pre = sorted(map(tuple, R.bm25_from_store(spark, path).collect()))

    # reserved prefix: refused loudly, and the live optimize files are
    # untouched (the old bug swept batch-optimize-1-* before raising)
    with pytest.raises(ValueError, match="reserved prefix"):
        R.append_postings_batch(rest, path, batch_tag="optimize-1")
    assert (
        sorted(map(tuple, R.bm25_from_store(spark, path).collect()))
        == live_pre
    )
    # retired name: 'base' left the live lists but its manifest file is
    # still referenced by the pre-optimize snapshot
    with pytest.raises(ValueError, match="collides"):
        R.append_postings_batch(rest, path, batch_tag="base")

    # vacuum reclaims the pre-optimize manifests -> the name frees up
    out = SC.vacuum_store(path, keep_versions=1)
    assert "base" in out["removed_manifests"]
    assert R.append_postings_batch(rest, path, batch_tag="base") is True
    single = str(tmp_path / "postings_collide_single")
    R.write_postings_store(docs, single, n_buckets=8)
    assert sorted(map(tuple, R.bm25_from_store(spark, path).collect())) == \
        sorted(map(tuple, R.bm25_from_store(spark, single).collect()))


def test_repeated_vacuum_does_not_erode_retention(spark, docs, tmp_path):
    """vacuum's own floor-advance commit is ledger bookkeeping: running
    vacuum repeatedly with the same keep_versions must not slide the
    retention window over its own commits and refuse data versions the
    caller asked to keep."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    path = str(tmp_path / "postings_revac")
    R.write_postings_store(docs.where("doc_id % 2 = 0"), path, n_buckets=8)
    v1 = SC.read_meta(path)["version"]
    R.append_postings_batch(
        docs.where("doc_id % 2 = 1"), path, batch_tag="rv-b1"
    )
    v2 = SC.read_meta(path)["version"]
    snap_v2 = sorted(
        map(tuple, R.bm25_from_store(spark, path, version=v2).collect())
    )
    # keep_versions=2 with two data versions: the floor never advances
    # and NO ledger version is minted — fully idempotent
    out = SC.vacuum_store(path, keep_versions=2)
    assert out["floor"] == v1 and SC.read_meta(path)["version"] == v2
    R.bm25_from_store(spark, path, version=v1).collect()
    # keep_versions=1: the floor advances to v2 with ONE bookkeeping
    # commit; re-runs must not count that commit as a data version and
    # slide the window past v2 (the erosion bug)
    out1 = SC.vacuum_store(path, keep_versions=1)
    out2 = SC.vacuum_store(path, keep_versions=1)
    out3 = SC.vacuum_store(path, keep_versions=1)
    assert out1["floor"] == out2["floor"] == out3["floor"] == v2
    assert SC.read_meta(path)["version"] == v2 + 1
    assert (
        sorted(map(tuple, R.bm25_from_store(spark, path, version=v2).collect()))
        == snap_v2
    )
    with pytest.raises(ValueError, match="floor"):
        R.bm25_from_store(spark, path, version=v1)
    # a real commit after the bookkeeping one does not inherit the flag:
    # it counts as a data version for the next retention window
    R.delete_postings_docs(
        spark, path, docs.where("doc_id % 31 = 0").select("doc_id"),
        batch_tag="rv-d1",
    )
    v4 = SC.read_meta(path)["version"]
    assert not SC.read_meta_version(path, v4).get("vacuum_bookkeeping")
    out4 = SC.vacuum_store(path, keep_versions=1)
    assert out4["floor"] == v4
