"""Retrieval family: BM25 store/serve parity, postings partition
pruning, and exact-stratification properties. (Oracle parity for
bm25_topk / tfidf_keywords / stratified_split runs via
test_oracle_parity's contract-wide sweep.)"""

import math
import os

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import retrieval as R
from spark_indexedrdd_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def store(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("postings") / "store")
    R.write_postings_store(docs, path)
    return path


def test_bm25_store_serve_matches_in_plan(spark, docs, store):
    """The persisted-index serve path must score EXACTLY like the
    in-plan operator over the same corpus — same fixed-point sums,
    same ranks."""
    a = sorted(map(tuple, R.bm25_topk(docs).collect()))
    b = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    assert a == b
    assert len(a) > 0


def test_bm25_store_serve_prunes_partitions(spark, store):
    """The serve scan must read only the query terms' bucket
    directories — the multiget-routes-to-partitions contract. With 256
    buckets and <=9 distinct query terms, the pruned scan touches <=9
    of the existing bucket dirs."""
    import json

    with open(os.path.join(store, "meta.json")) as fh:
        n_buckets = json.load(fh)["n_buckets"]
    terms = sorted({t for _, s in R.DEFAULT_BM25_QUERIES for t in s.split()})
    bkts = {
        r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.xxhash64("term"), n_buckets).alias("b"))
        .collect()
    }
    postings = spark.read.parquet(store + "/postings").where(
        F.col("bucket").isin(sorted(bkts)) & F.col("term").isin(terms)
    )
    plan = postings._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    # the executed scan's selected partition count is the ground truth
    files = postings.select(
        F.input_file_name().alias("f")
    ).distinct().collect()
    touched = {f["f"].split("bucket=")[1].split("/")[0] for f in files}
    assert len(touched) <= len(bkts), (touched, bkts)


def test_bm25_scores_monotone_and_ranked(docs):
    out = R.bm25_topk(docs, k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s >= 0 for s in scores)


def test_stratified_split_exact_proportions(docs):
    """Per stratum: exactly floor(n*0.8) train and floor(n*0.9)-floor(
    n*0.8) val rows — the property hash-threshold splits only hold in
    expectation."""
    out = R.stratified_split(docs).groupBy("stratum", "split").count()
    got = {(r["stratum"], r["split"]): r["count"] for r in out.collect()}
    totals = {}
    for (s, _), c in got.items():
        totals[s] = totals.get(s, 0) + c
    for s, n in totals.items():
        t1 = math.floor(n * 0.8)
        t2 = math.floor(n * 0.9)
        assert got.get((s, "train"), 0) == t1, (s, n, got)
        assert got.get((s, "val"), 0) == t2 - t1, (s, n, got)
        assert got.get((s, "test"), 0) == n - t2, (s, n, got)


def test_stratified_split_deterministic_under_repartition(docs):
    a = sorted(map(tuple, R.stratified_split(docs).collect()))
    b = sorted(
        map(tuple, R.stratified_split(docs.repartition(13)).collect())
    )
    assert a == b


def test_tfidf_keywords_rank_contract(docs):
    out = R.tfidf_keywords(docs, k=3).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert per_doc
    for _, rows in per_doc.items():
        assert len(rows) <= 3
        rows.sort(key=lambda r: r["rank"])
        scores = [r["tfidf"] for r in rows]
        assert scores == sorted(scores, reverse=True)


@pytest.mark.parametrize("n_buckets", [256, 64])
def test_postings_append_equals_rebuild(spark, docs, tmp_path, n_buckets):
    inc = str(tmp_path / "post_inc")
    R.write_postings_store(docs.where("doc_id % 2 = 0"), inc, n_buckets=n_buckets)
    R.append_postings_batch(docs.where("doc_id % 2 = 1"), inc)
    full = str(tmp_path / "post_full")
    R.write_postings_store(docs, full, n_buckets=n_buckets)
    a = sorted(map(tuple, R.bm25_from_store(spark, inc).collect()))
    b = sorted(map(tuple, R.bm25_from_store(spark, full).collect()))
    assert a == b
    assert len(a) > 0


def test_postings_append_replay_is_noop(spark, docs, tmp_path):
    p = str(tmp_path / "post_replay")
    R.write_postings_store(docs.where("doc_id % 2 = 0"), p)
    batch = docs.where("doc_id % 2 = 1")
    assert R.append_postings_batch(batch, p, batch_tag="b1") is True
    before = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    # at-least-once redelivery of a committed batch must change nothing
    assert R.append_postings_batch(batch, p, batch_tag="b1") is False
    after = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    assert before == after


def test_streaming_postings_store_matches_single_shot(spark, docs, tmp_path):
    """Docs streamed file-by-file into the postings store must serve
    BM25 exactly like a store built in one shot."""
    import tempfile

    d = docs.select("doc_id", "text")
    src = str(tmp_path / "pss_src")
    for i in range(3):
        d.where(f"doc_id % 3 = {i}").coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "pss_store")
    st = R.StreamingPostingsStore(store)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = st.attach(stream, tempfile.mkdtemp(prefix="pssckpt_"), availableNow=True)
    q.awaitTermination(120)
    single = str(tmp_path / "pss_single")
    R.write_postings_store(d, single)
    a = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    b = sorted(map(tuple, R.bm25_from_store(spark, single).collect()))
    assert a == b
    assert R.StreamingPostingsStore(store)._initialized


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    fracs=st.sampled_from(
        [(0.5, 0.25), (0.6, 0.2), (0.7, 0.15), (0.8, 0.1), (0.9, 0.05)]
    ),
    seed=st.integers(min_value=0, max_value=3),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_stratified_split_property(docs, fracs, seed):
    """For any (train_frac, val_frac) and seed: exact floor proportions
    per stratum, and every doc assigned exactly once."""
    tf, vf = fracs
    out = R.stratified_split(
        docs, train_frac=tf, val_frac=vf, seed=seed
    ).groupBy("stratum", "split").count()
    got = {(r["stratum"], r["split"]): r["count"] for r in out.collect()}
    totals = {}
    for (s, _), c in got.items():
        totals[s] = totals.get(s, 0) + c
    assert sum(totals.values()) == docs.count()
    for s, n in totals.items():
        t1 = math.floor(n * tf)
        t2 = math.floor(n * (tf + vf))
        assert got.get((s, "train"), 0) == t1
        assert got.get((s, "val"), 0) == t2 - t1
        assert got.get((s, "test"), 0) == n - t2


def test_bm25_unseen_and_partial_terms(spark, docs):
    """A query whose terms never occur yields no rows for that qid; a
    query mixing seen and unseen terms scores on the seen ones only."""
    out = R.bm25_topk(
        docs,
        queries=((7, "zzzunseen qqqmissing"), (8, "spark zzzunseen")),
        k=5,
    ).collect()
    qids = {r["qid"] for r in out}
    assert 7 not in qids
    assert 8 in qids


def test_bm25_empty_text_docs_counted_in_stats(spark):
    """Token-less documents contribute to n_docs/avgdl but never match —
    pinned against a hand model (the oracle-side regression this guards
    is documented in sql_bm25_topk's stats CTE)."""
    df = spark.createDataFrame(
        [(1, "spark spark join"), (2, ""), (3, "   "), (4, "spark")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["score"]
        for r in R.bm25_topk(df, queries=((1, "spark"),), k=10).collect()
    }
    assert set(out) == {1, 4}
    # doc 4 (dl=1, tf=1) must outscore doc 1 (dl=3, tf=2)? No: tf
    # saturation vs length norm — just pin the hand computation.
    import math

    n_docs, df_t = 4, 2
    avgdl = round((3 + 0 + 0 + 1) / 4, 9)
    idf = round(math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0), 9)
    for doc, tf, dl in ((1, 2, 3), (4, 1, 1)):
        tfpart = round((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))), 9)
        s9 = round(idf * tfpart * 1e9)
        assert out[doc] == round(s9 / 1e9, 9), (doc, out[doc])


def test_bm25_scan_prunes_columns(docs):
    """The corpus scan must read only (doc_id, text) — a scan shipping
    all five document columns for a 2-column operator is wrong."""
    from spark_indexedrdd_spark.plans import explain as X

    schema = X.read_schema(R.bm25_topk(docs))
    assert "text" in schema and "doc_id" in schema
    for col in ("source", "n_chars"):
        assert col not in schema, schema


def test_stratified_split_single_doc_stratum(spark):
    """floor-threshold edge: a 1-doc stratum has floor(0.8)=0 train,
    floor(0.9)=0 val — the doc lands in test, never lost."""
    df = spark.createDataFrame(
        [(1, "xx"), (2, "yy"), (3, "yy")], "doc_id long, lang string"
    )
    got = {
        (r["stratum"], r["doc_id"]): r["split"]
        for r in R.stratified_split(df, strat_col="lang").collect()
    }
    assert len(got) == 3
    assert got[("xx", 1)] == "test"


def test_stratified_split_null_stratum_kept(spark):
    """ADVICE r7: NULL strat_col rows must not vanish — they form their
    own stratum (SQL PARTITION BY semantics), with exact proportions,
    via the null-safe grouping/join key."""
    rows = [(i, None if i % 3 == 0 else ("aa" if i % 2 == 0 else "bb"))
            for i in range(1, 31)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = R.stratified_split(df, strat_col="lang").collect()
    assert len(out) == 30  # nothing dropped
    null_rows = [r for r in out if r["stratum"] is None]
    assert len(null_rows) == 10
    splits = {}
    for r in null_rows:
        splits[r["split"]] = splits.get(r["split"], 0) + 1
    # floor(10*0.8)=8 train, floor(10*0.9)-8=1 val, rest test
    assert splits == {"train": 8, "val": 1, "test": 1}


def test_stratified_split_null_stratum_matches_oracle(spark):
    """Engine parity on a nullable strat column: Spark output equals
    the DuckDB oracle (which keeps NULL as its own window partition)."""
    import duckdb

    rows = [(i, None if i % 4 == 0 else f"l{i % 3}") for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sorted(
        (r["doc_id"], r["stratum"], r["split"])
        for r in R.stratified_split(df, strat_col="lang").collect()
    )
    con = duckdb.connect()
    pdf = df.toPandas()
    con.register("documents", pdf)
    exp = sorted(
        map(tuple, con.sql(R.sql_stratified_split()).fetchall())
    )
    assert got == exp


def test_legacy_store_tagged_replay_backfill_not_doubled(spark, docs, tmp_path):
    """Crash replay against a PRE-MANIFEST store: the legacy 'base'
    backfill must not list the crashed attempt's published
    batch-<tag>-* files — the deterministic republish puts the same
    names into the tag's own manifest, so a backfill that saw them
    would make the committed union name each file twice (doubled tf
    rows and df(term), wrong scores)."""
    import json as _json
    import shutil as _sh

    p = str(tmp_path / "legacy_crash")
    R.write_postings_store(docs.where("doc_id % 2 = 0"), p)
    meta_p = os.path.join(p, "meta.json")
    m = _json.load(open(meta_p))
    for k in ("manifests", "dl_manifests"):
        m.pop(k)
    legacy_meta = _json.dumps(m)
    with open(meta_p, "w") as fh:
        fh.write(legacy_meta)
    _sh.rmtree(os.path.join(p, "_manifests"))
    batch = docs.where("doc_id % 2 = 1")
    assert R.append_postings_batch(batch, p, batch_tag="c1") is True
    # crash: rewind to the pre-manifest meta; published files stay
    with open(meta_p, "w") as fh:
        fh.write(legacy_meta)
    assert R.append_postings_batch(batch, p, batch_tag="c1") is True
    full = str(tmp_path / "legacy_crash_full")
    R.write_postings_store(docs, full)
    a = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    b = sorted(map(tuple, R.bm25_from_store(spark, full).collect()))
    assert a == b and len(a) > 0


def test_committed_empty_store_serves_empty_and_isolated(spark, docs, tmp_path):
    """A store whose committed file list is EMPTY is not a legacy
    store: the serve must return the typed zero-row result, never fall
    back to directory listing (where a concurrent append's published-
    but-uncommitted files would be visible)."""
    import shutil as _sh

    from spark_indexedrdd_spark.functions import store_commit as SC

    p = str(tmp_path / "empty_store")
    empty = docs.where("1 = 0")
    R.write_postings_store(empty, p)
    out = R.bm25_from_store(spark, p)
    assert out.count() == 0
    assert out.columns == ["qid", "doc_id", "score", "rank"]
    # plant a published-but-uncommitted postings file (what a crashed
    # concurrent append leaves): it must stay invisible
    donor = str(tmp_path / "donor")
    R.write_postings_store(docs.limit(50), donor)
    rel = SC.list_parquet_files(donor + "/postings")[0]
    dst = os.path.join(p, "postings", os.path.dirname(rel))
    os.makedirs(dst, exist_ok=True)
    _sh.copy(
        os.path.join(donor, "postings", rel),
        os.path.join(p, "postings", rel),
    )
    assert R.bm25_from_store(spark, p).count() == 0


def test_postings_append_crash_replay_exact(spark, docs, tmp_path):
    """Crash window between publishing batch files and the meta commit:
    restore the pre-commit meta (files already moved — exactly the
    state a crash leaves), replay the batch, and the serve path must
    equal a one-shot store — the sweep of batch-<tag>-* files makes
    re-publication exact, not double."""
    p = str(tmp_path / "post_crash")
    R.write_postings_store(docs.where("doc_id % 2 = 0"), p)
    with open(os.path.join(p, "meta.json")) as fh:
        pre_commit_meta = fh.read()
    batch = docs.where("doc_id % 2 = 1")
    assert R.append_postings_batch(batch, p, batch_tag="c1") is True
    # simulate the crash: meta rewind to pre-commit, published files stay
    with open(os.path.join(p, "meta.json"), "w") as fh:
        fh.write(pre_commit_meta)
    assert R.append_postings_batch(batch, p, batch_tag="c1") is True
    full = str(tmp_path / "post_crash_full")
    R.write_postings_store(docs, full)
    a = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    b = sorted(map(tuple, R.bm25_from_store(spark, full).collect()))
    assert a == b and len(a) > 0


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
@pytest.mark.slow
def test_postings_commit_protocol_model(spark, docs, ops):
    """Property over delivery histories: for ANY sequence of batch
    deliveries — clean commit, crash-after-publish-then-replay, or
    committed-then-duplicate-redelivery — the served store equals a
    one-shot build over exactly the applied batches. The staged-commit
    protocol's whole claim, quantified over sequences instead of the
    single scenario test."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="postmodel_")
    try:
        p = os.path.join(root, "store")
        R.write_postings_store(docs.where("doc_id < 200"), p)
        slices = [
            docs.where(f"doc_id >= {200 + 100 * i} AND doc_id < {300 + 100 * i}")
            for i in range(len(ops))
        ]
        for i, (op, batch) in enumerate(zip(ops, slices)):
            tag = f"t{i}"
            if op == "clean":
                assert R.append_postings_batch(batch, p, batch_tag=tag)
            elif op == "crash_replay":
                with open(os.path.join(p, "meta.json")) as fh:
                    pre = fh.read()
                assert R.append_postings_batch(batch, p, batch_tag=tag)
                # crash after publish, before commit: meta rewinds
                with open(os.path.join(p, "meta.json"), "w") as fh:
                    fh.write(pre)
                assert R.append_postings_batch(batch, p, batch_tag=tag)
            else:  # dup_replay: committed, then redelivered
                assert R.append_postings_batch(batch, p, batch_tag=tag)
                assert R.append_postings_batch(batch, p, batch_tag=tag) is False
        single = os.path.join(root, "single")
        R.write_postings_store(
            docs.where(f"doc_id < {200 + 100 * len(ops)}"), single
        )
        a = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
        b = sorted(map(tuple, R.bm25_from_store(spark, single).collect()))
        assert a == b and len(a) > 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_sweep_batch_files_does_not_touch_dash_extending_tags(
    spark, docs, tmp_path
):
    """The crash-replay sweep for tag 'b1' must delete ONLY
    batch-b1-NNNNN files, never another COMMITTED tag whose name
    extends it with a dash (batch-b1-2-NNNNN) — tags are
    caller-supplied, so prefix matching would silently destroy
    committed data."""
    p = str(tmp_path / "post_tags")
    R.write_postings_store(docs.where("doc_id < 200"), p)
    assert R.append_postings_batch(
        docs.where("doc_id >= 200 AND doc_id < 300"), p, batch_tag="b1-2"
    )
    committed = {
        (d, f)
        for d in os.listdir(os.path.join(p, "postings"))
        if d.startswith("bucket=")
        for f in os.listdir(os.path.join(p, "postings", d))
        if f.startswith("batch-b1-2-")
    }
    assert committed
    # plant a half-moved file from an uncommitted 'b1' publish crash
    some_bucket = next(iter(committed))[0]
    orphan = os.path.join(
        p, "postings", some_bucket, "batch-b1-00000.parquet"
    )
    open(orphan, "w").close()
    R._sweep_batch_files(p, "b1")
    assert not os.path.exists(orphan)
    survivors = {
        (d, f)
        for d in os.listdir(os.path.join(p, "postings"))
        if d.startswith("bucket=")
        for f in os.listdir(os.path.join(p, "postings", d))
        if f.startswith("batch-b1-2-")
    }
    assert survivors == committed


def test_append_rejects_path_breaking_batch_tags(spark, docs, tmp_path):
    """batch_tag is used as a path component (_staging/<tag>) and file
    name segment: separators and leading dots ('..' would aim the
    staging cleanup OUTSIDE the store) must raise, not hit the
    filesystem."""
    p = str(tmp_path / "post_tagval")
    R.write_postings_store(docs.where("doc_id < 100"), p)
    batch = docs.where("doc_id >= 100 AND doc_id < 150")
    for bad in ("..", ".hidden", "a/b", "a\\b", "", "x y"):
        with pytest.raises(ValueError, match="invalid batch_tag"):
            R.append_postings_batch(batch, p, batch_tag=bad)
    assert R.append_postings_batch(batch, p, batch_tag="ok-1.2_A")


def test_rebuild_crash_leaves_store_uncommitted(spark, docs, tmp_path, monkeypatch):
    """Rebuilding over an EXISTING committed store retracts the old
    meta before the data overwrite: a crash mid-rebuild must leave the
    store clearly uncommitted (reader raises FileNotFoundError), never
    the stale meta standing over half-overwritten postings."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    p = str(tmp_path / "post_rebuild")
    R.write_postings_store(docs.where("doc_id < 100"), p, n_buckets=64)
    assert R.bm25_from_store(spark, p).count() >= 0  # committed, readable

    def boom(path, meta):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(SC, "commit_meta", boom)
    with pytest.raises(RuntimeError):
        R.write_postings_store(docs, p, n_buckets=256)
    monkeypatch.undo()
    # old meta must be GONE (retracted), not standing over new data
    with pytest.raises(FileNotFoundError):
        with open(os.path.join(p, "meta.json")) as fh:
            fh.read()
    # the re-run (idempotent overwrite) recommits cleanly
    R.write_postings_store(docs, p, n_buckets=256)
    assert R.bm25_from_store(spark, p).count() > 0


def test_sql_bm25_topk_escapes_quotes(spark):
    """Caller-supplied query terms containing single quotes must not
    break (or inject into) the generated oracle SQL."""
    import duckdb

    df = spark.createDataFrame(
        [(1, "o'reilly spark book"), (2, "spark join")],
        "doc_id long, text string",
    )
    qs = ((1, "o'reilly spark"),)
    got = sorted(
        map(tuple, R.bm25_topk(df, queries=qs, k=5).collect())
    )
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    exp = sorted(map(tuple, con.sql(R.sql_bm25_topk(queries=qs, k=5)).fetchall()))
    assert [g[:2] for g in got] == [e[:2] for e in exp]
    assert len(got) > 0


def test_write_postings_store_tokenless_corpus(spark, tmp_path):
    """SUM(dl) is NULL on an all-token-less corpus; the writer must
    record total_dl=0 instead of raising (ADVICE r7)."""
    import json

    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    p = str(tmp_path / "post_empty")
    R.write_postings_store(df, p)
    with open(os.path.join(p, "meta.json")) as fh:
        meta = json.load(fh)
    assert meta["n_docs"] == 2 and meta["total_dl"] == 0


def test_streaming_store_crash_mid_init_reruns_clean(spark, docs, tmp_path):
    """A crash during first-batch init leaves postings data but no
    meta.json (meta is the commit marker, written last). A restarted
    store must see _initialized=False and re-run the overwrite-mode
    build — serving exactly like a store built once, not doubled."""
    p = str(tmp_path / "pss_crash")
    batch = docs.select("doc_id", "text")
    # simulate the crash: data written, meta never committed
    st0 = R.StreamingPostingsStore(p)
    R.write_postings_store(batch, p)
    os.remove(os.path.join(p, "meta.json"))
    assert not R.StreamingPostingsStore(p)._initialized
    # replayed batch 0 re-initializes
    st1 = R.StreamingPostingsStore(p)
    st1.foreach_batch(batch, 0)
    single = str(tmp_path / "pss_crash_single")
    R.write_postings_store(batch, single)
    a = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    b = sorted(map(tuple, R.bm25_from_store(spark, single).collect()))
    assert a == b and len(a) > 0
    # and the replay tag was committed atomically with the init
    import json as _json

    with open(os.path.join(p, "meta.json")) as fh:
        assert _json.load(fh)["applied"] == ["0"]


def test_postings_serve_is_snapshot_isolated_during_append(
    spark, docs, tmp_path
):
    """The manifest-pointer commit's reader guarantee: between a
    batch's file publish and its meta commit, a concurrent
    bm25_from_store sees EXACTLY the pre-batch store — same rows, same
    scores — never new postings scored with old n_docs/total_dl. The
    crash-shaped meta rewind reproduces precisely that window (files
    and batch manifest on disk, committed meta pre-batch)."""
    p = str(tmp_path / "post_snap")
    R.write_postings_store(docs.where("doc_id % 2 = 0"), p)
    before = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    with open(os.path.join(p, "meta.json")) as fh:
        pre_commit_meta = fh.read()
    batch = docs.where("doc_id % 2 = 1")
    assert R.append_postings_batch(batch, p, batch_tag="w1") is True
    committed = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    # rewind meta: the in-window state a concurrent reader would see
    with open(os.path.join(p, "meta.json"), "w") as fh:
        fh.write(pre_commit_meta)
    in_window = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    assert in_window == before, "reader saw published-but-uncommitted files"
    # replay to completion: readers flip atomically to the full store
    assert R.append_postings_batch(batch, p, batch_tag="w1") is True
    after = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    full = str(tmp_path / "post_snap_full")
    R.write_postings_store(docs, full)
    expect = sorted(map(tuple, R.bm25_from_store(spark, full).collect()))
    assert after == expect == committed and len(after) > 0
    assert after != before, "full-corpus serve should rescore"


def test_postings_serve_ignores_unmanifested_files(spark, docs, tmp_path):
    """Files no committed manifest names are invisible — the general
    isolation property behind the append window: drop a stray parquet
    copy into a bucket directory (what any crashed/foreign writer
    leaves) and the serve output must not move."""
    import shutil as _sh

    p = str(tmp_path / "post_stray")
    R.write_postings_store(docs, p)
    before = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    root = os.path.join(p, "postings")
    bdir, fname = next(
        (d, f)
        for d in sorted(os.listdir(root))
        if d.startswith("bucket=")
        for f in sorted(os.listdir(os.path.join(root, d)))
        if f.endswith(".parquet")
    )
    _sh.copy(
        os.path.join(root, bdir, fname),
        os.path.join(root, bdir, "stray-copy.parquet"),
    )
    after = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
    assert after == before, "serve read a file outside the manifest"


@given(
    ops=st.lists(
        st.sampled_from(
            ["append", "append_crash", "delete", "delete_crash",
             "compact", "snapshot"]
        ),
        min_size=2,
        max_size=4,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_postings_full_lifecycle_model(spark, docs, ops):
    """Property over FULL store lifecycles — appends (clean or
    crash-replayed), takedowns (clean or crash-replayed), compaction,
    and as-of snapshot reads interleaved in any order: the live serve
    always equals a one-shot build over exactly the surviving docs, and
    every snapshot taken before the last compaction boundary still
    serves its frozen live set exactly."""
    import shutil
    import tempfile

    from spark_indexedrdd_spark.functions import store_commit as SC

    root = tempfile.mkdtemp(prefix="postlife_")
    try:
        p = os.path.join(root, "store")
        all_ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
        base = [i for i in all_ids if i < 200]
        R.write_postings_store(docs.where("doc_id < 200"), p)
        live = set(base)
        next_slice = 200
        snapshots = []  # (version, frozenset(live))
        compact_floor = 0  # versions <= floor are invalidated
        k = 3
        for i, op in enumerate(ops):
            tag = f"t{i}"
            if op in ("append", "append_crash"):
                lo, hi = next_slice, next_slice + 100
                next_slice = hi
                batch = docs.where(f"doc_id >= {lo} AND doc_id < {hi}")
                if op == "append_crash":
                    pre = open(os.path.join(p, "meta.json")).read()
                    assert R.append_postings_batch(batch, p, batch_tag=tag)
                    with open(os.path.join(p, "meta.json"), "w") as fh:
                        fh.write(pre)
                assert R.append_postings_batch(batch, p, batch_tag=tag)
                live |= {x for x in all_ids if lo <= x < hi}
            elif op in ("delete", "delete_crash"):
                doomed = sorted(x for x in live if x % k == 0)
                k += 2
                if op == "delete_crash":
                    pre = open(os.path.join(p, "meta.json")).read()
                    assert R.delete_postings_docs(spark, p, doomed, tag)
                    with open(os.path.join(p, "meta.json"), "w") as fh:
                        fh.write(pre)
                assert R.delete_postings_docs(spark, p, doomed, tag)
                live -= set(doomed)
            elif op == "compact":
                R.compact_postings_store(spark, p)
                compact_floor = SC.read_meta(p)["version"]
            else:  # snapshot: record the committed frontier + live set
                snapshots.append(
                    (SC.read_meta(p)["version"], frozenset(live))
                )

        def rebuild_serve(ids):
            ref = os.path.join(root, "ref")
            shutil.rmtree(ref, ignore_errors=True)
            idlist = ",".join(str(x) for x in sorted(ids)) or "-1"
            R.write_postings_store(docs.where(f"doc_id IN ({idlist})"), ref)
            return sorted(map(tuple, R.bm25_from_store(spark, ref).collect()))

        got = sorted(map(tuple, R.bm25_from_store(spark, p).collect()))
        assert got == rebuild_serve(live)
        for v, frozen in snapshots:
            if v <= compact_floor:
                continue  # compaction rewrote the files this snapshot names
            snap = sorted(
                map(tuple, R.bm25_from_store(spark, p, version=v).collect())
            )
            assert snap == rebuild_serve(frozen), f"snapshot v{v} drifted"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_snapshot_serve_keeps_manifest_pruning(spark, docs, tmp_path):
    """The as-of serve must prune exactly like the live serve: the
    frozen meta's manifests drive the driver-side bucket pruning, so
    the scan lists only the query terms' bucket files — time travel is
    not a full-scan path (plan-asserted)."""
    import re

    from spark_indexedrdd_spark.functions import store_commit as SC

    p = str(tmp_path / "snap_prune")
    R.write_postings_store(docs.where("doc_id % 2 = 0"), p)
    v1 = SC.read_meta(p)["version"]
    R.append_postings_batch(docs.where("doc_id % 2 = 1"), p, batch_tag="b1")
    terms = sorted({t for _, s in R.DEFAULT_BM25_QUERIES for t in s.split()})
    for frame in (
        R.bm25_from_store(spark, p, version=v1),
        R.bm25_from_store(spark, p),
    ):
        # inputFiles() is the ground truth for which files the scan
        # lists (the executed-plan string elides locations under AQE)
        touched = {
            m.group(0)
            for f in frame.inputFiles()
            for m in [re.search(r"bucket=\d+", f)]
            if m
        }
        assert 0 < len(touched) <= len(terms), touched


@pytest.mark.slow
def test_streaming_postings_store_optimize_cadence(spark, docs, tmp_path):
    """optimize_every bounds the manifest/file growth under continuous
    ingest: with the cadence at 2 the streamed store ends with a folded
    manifest list, and serves exactly like the single-shot build."""
    import tempfile

    from spark_indexedrdd_spark.functions import store_commit as SC

    d = docs.select("doc_id", "text")
    src = str(tmp_path / "pssopt_src")
    for i in range(4):
        d.where(f"doc_id % 4 = {i}").coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "pssopt_store")
    st = R.StreamingPostingsStore(store, optimize_every=2)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = st.attach(stream, tempfile.mkdtemp(prefix="pssoptckpt_"), availableNow=True)
    q.awaitTermination(180)
    meta = SC.read_meta(store)
    # the cadence folded at least once, and the last fold left at most
    # optimize_every entries (the terminal batch may append after it)
    assert int(meta.get("compactions", 0)) >= 1
    assert len(meta["manifests"]) <= 2
    single = str(tmp_path / "pssopt_single")
    R.write_postings_store(d, single)
    a = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    b = sorted(map(tuple, R.bm25_from_store(spark, single).collect()))
    assert a == b


def test_streaming_vacuum_cadence_validates_against_refire_loop(tmp_path):
    """r12 review finding: with vacuum_every <= keep_versions+1 the
    post-prune resting file level sits at/above the threshold, so every
    micro-batch would pay a full (futile) retention scan. The
    constructor refuses the degenerate configuration loudly."""
    with pytest.raises(ValueError, match="must exceed"):
        R.StreamingPostingsStore(
            str(tmp_path / "s"), vacuum_every=5, keep_versions=8
        )
    with pytest.raises(ValueError, match="must exceed"):
        R.StreamingPostingsStore(
            str(tmp_path / "s"), vacuum_every=2, keep_versions=1
        )
    # the boundary-legal form constructs fine
    R.StreamingPostingsStore(
        str(tmp_path / "s"), vacuum_every=3, keep_versions=1
    )


def test_pin_held_floor_does_not_refire_vacuum_per_batch(
    spark, docs, tmp_path, monkeypatch
):
    """r12 VERDICT item 2 / ADVICE medium: every commit grows the
    ledger by one, so the old any-growth re-arm fired a full-store
    retention scan on EVERY micro-batch once a held pin capped the
    floor (the count could never fall back under the threshold). The
    cadence must re-arm only a full interval past the post-vacuum
    resting level: a pin held across N commits costs at most
    N/vacuum_every (+1) passes, not N."""
    from spark_indexedrdd_spark.functions import snapshots as SNAP

    d = docs.select("doc_id", "text").limit(60).cache()
    store = str(tmp_path / "pinloop_store")
    tags = str(tmp_path / "pinloop_tags")
    vacuum_every = 3
    st = R.StreamingPostingsStore(
        store, vacuum_every=vacuum_every, keep_versions=1, pin_tag_dir=tags
    )
    # batch 0 initializes the store; pin its frontier and HOLD it
    st.foreach_batch(d.where("doc_id % 12 = 0"), 0)
    SNAP.pin_stores(tags, "held-run", {"lexical": store})

    passes = []
    orig = SNAP.vacuum_respecting_pins

    def counted(*a, **k):
        passes.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(SNAP, "vacuum_respecting_pins", counted)
    n_commits = 3 * vacuum_every  # ≥ 2× the cadence, per the work order
    for i in range(1, n_commits + 1):
        st.foreach_batch(d.where(f"doc_id % 12 = {i}"), i)
    assert len(passes) <= n_commits // vacuum_every + 1, (
        f"{len(passes)} vacuum passes over {n_commits} pin-held commits "
        f"— the cadence degraded to a scan-per-batch loop"
    )
    assert passes, "cadence never fired — the guard over-corrected"
    # the held pin still serves byte-identically through every pass
    v = SNAP.pin_versions(SNAP.read_pin(tags, "held-run"))
    assert R.bm25_from_store(spark, store, version=v["lexical"]).count() >= 0


@pytest.mark.slow
def test_streaming_postings_store_vacuum_cadence_is_pin_safe(
    spark, docs, tmp_path
):
    """vacuum_every (r12) makes the streamed store fully
    self-maintaining: the per-commit ledger stays bounded (retention +
    checkpoint run from the writer's own foreachBatch turn), the final
    serve still equals the single-shot build, and a pin taken
    mid-stream survives the automatic retention — the pinned snapshot
    serves byte-identically afterwards."""
    import tempfile

    from spark_indexedrdd_spark.functions import snapshots as SNAP
    from spark_indexedrdd_spark.functions import store_commit as SC

    d = docs.select("doc_id", "text")
    src = str(tmp_path / "pssvac_src")
    for i in range(3):
        d.where(f"doc_id % 6 = {i}").coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "pssvac_store")
    tags = str(tmp_path / "pssvac_tags")
    schema = spark.read.parquet(src).schema

    # phase 1: ingest half the corpus, then pin the committed frontier
    st = R.StreamingPostingsStore(
        store, vacuum_every=3, keep_versions=1, pin_tag_dir=tags
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ckpt = tempfile.mkdtemp(prefix="pssvacckpt_")
    q = st.attach(stream, ckpt, availableNow=True)
    q.awaitTermination(180)
    pin = SNAP.pin_stores(tags, "run-1", {"lexical": store})
    pinned_serve = sorted(
        map(
            tuple,
            R.bm25_from_store(
                spark, store, version=pin["lexical"]["version"]
            ).collect(),
        )
    )

    # phase 2: the other half arrives (new doc ids only); the cadence
    # (3 ledger files with keep_versions=1) must vacuum+prune at least
    # once — but never past the pin
    for i in range(3, 6):
        d.where(f"doc_id % 6 = {i}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    st2 = R.StreamingPostingsStore(
        store, vacuum_every=3, keep_versions=1, pin_tag_dir=tags
    )
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = st2.attach(stream2, ckpt, availableNow=True)
    q2.awaitTermination(180)

    vdir = os.path.join(store, "_versions")
    n_files = len([f for f in os.listdir(vdir) if f[:-5].isdigit()])
    meta = SC.read_meta(store)
    # retention ran (floor advanced to the pin, never past it) and the
    # ledger checkpoint folded below-pin commits
    assert int(meta.get("rewrite_floor", 0)) == pin["lexical"]["version"]
    assert os.path.exists(os.path.join(vdir, "_checkpoint.json"))
    assert n_files <= 3 + 2  # cadence bound + in-flight commits
    # the pin still serves byte-identically through the retention
    v = SNAP.pin_versions(SNAP.read_pin(tags, "run-1"))
    got = sorted(
        map(
            tuple,
            R.bm25_from_store(spark, store, version=v["lexical"]).collect(),
        )
    )
    assert got == pinned_serve
    # and the live serve equals the single-shot union build
    single = str(tmp_path / "pssvac_single")
    R.write_postings_store(d, single)
    a = sorted(map(tuple, R.bm25_from_store(spark, store).collect()))
    b = sorted(map(tuple, R.bm25_from_store(spark, single).collect()))
    assert a == b
