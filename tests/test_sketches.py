"""Mergeable summary store: HLL batch-split exactness, error bounds vs
exact aggregations, and the KB-state incremental contract."""

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import sketches as SK


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hll_estimates_within_bound(spark, docs):
    est = {
        (r.lang, r.source): r.distinct_est
        for r in SK.distinct_sketches(docs, ["lang", "source"], "doc_id")
        .select(
            "lang", "source",
            F.hll_sketch_estimate("hll").cast("double").alias("distinct_est"),
        )
        .collect()
    }
    exact = {
        (r.lang, r.source): r.d
        for r in docs.groupBy("lang", "source")
        .agg(F.countDistinct("doc_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        # lg_k=12 -> rsd ~1.6%; allow 5% plus integer slack
        assert abs(est[k] - exact[k]) <= max(3, 0.05 * exact[k]), k


def test_batch_split_equals_single_shot(spark, docs, tmp_path):
    """HLL register updates are per-bucket maxes — commutative — so a
    store fed in two batches reports the SAME distinct estimates as one
    fed everything at once."""
    store_a = str(tmp_path / "sk_a")
    store_b = str(tmp_path / "sk_b")
    b1 = docs.where("doc_id % 2 = 0")
    b2 = docs.where("doc_id % 2 = 1")
    SK.write_sketch_store(b1, store_a, ["lang"], "doc_id", "n_chars")
    SK.append_sketch_batch(b2, store_a, ["lang"], "doc_id", "n_chars")
    SK.write_sketch_store(docs, store_b, ["lang"], "doc_id", "n_chars")
    a = {
        r.lang: (r.n_rows, r.distinct_est)
        for r in SK.read_summary(spark, store_a, ["lang"]).collect()
    }
    b = {
        r.lang: (r.n_rows, r.distinct_est)
        for r in SK.read_summary(spark, store_b, ["lang"]).collect()
    }
    assert a == b


def test_quantiles_within_rank_error(spark, docs, tmp_path):
    store = str(tmp_path / "sk_q")
    SK.write_sketch_store(docs, store, ["lang"], "doc_id", "n_chars")
    got = {
        r.lang: (r.q50, r.q95)
        for r in SK.read_summary(spark, store, ["lang"]).collect()
    }
    for lang, (q50, q95) in got.items():
        vals = sorted(
            r.n_chars
            for r in docs.where(F.col("lang") == lang).collect()
        )
        n = len(vals)
        # KLL k=200 normalized rank error ~1.65%; allow 5% rank slack
        def rank_of(v):
            import bisect
            return bisect.bisect_right(vals, v) / n

        assert 0.45 <= rank_of(q50) <= 0.55, (lang, q50)
        assert 0.90 <= rank_of(q95) <= 1.0, (lang, q95)


def test_store_stays_kb_sized(spark, docs, tmp_path):
    """The incremental contract: state grows with |groups|×|batches|,
    never with rows — 4 appends of the full corpus stay a handful of
    KB-scale rows per group."""
    store = str(tmp_path / "sk_small")
    SK.write_sketch_store(docs, store, ["lang"], "doc_id", "n_chars")
    for _ in range(3):
        SK.append_sketch_batch(docs, store, ["lang"], "doc_id", "n_chars")
    sk = spark.read.parquet(store)
    n_langs = docs.select("lang").distinct().count()
    assert sk.count() == 4 * n_langs
    sizes = sk.select(
        (F.length("hll") + F.length("kll")).alias("b")
    ).collect()
    assert all(r.b < 64 * 1024 for r in sizes)
    # and the merged report still matches the single-shot corpus counts
    est = {
        r.lang: r.n_rows
        for r in SK.read_summary(spark, store, ["lang"]).collect()
    }
    exact = {
        r.lang: 4 * r.c
        for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    assert est == exact


def test_overlap_estimate(spark, docs, tmp_path):
    """Half-overlapping doc-id sets: inclusion-exclusion recovers the
    planted overlap within compounded sketch error."""
    a = docs.where("doc_id < 300")          # 0..299
    b = docs.where("doc_id >= 150")         # 150..499 -> overlap 150
    pa, pb = str(tmp_path / "ov_a"), str(tmp_path / "ov_b")
    SK.write_sketch_store(a, pa, [], "doc_id", "n_chars")
    SK.write_sketch_store(b, pb, [], "doc_id", "n_chars")
    r = SK.overlap_estimate(spark, pa, pb).collect()[0]
    assert abs(r.distinct_a - 300) <= 15
    assert abs(r.distinct_b - 350) <= 18
    assert abs(r.overlap_est - 150) <= 30
    # disjoint stores -> near-zero overlap
    c = docs.where("doc_id >= 300")
    pc = str(tmp_path / "ov_c")
    SK.write_sketch_store(c, pc, [], "doc_id", "n_chars")
    r2 = SK.overlap_estimate(spark, str(tmp_path / "ov_a"), pc).collect()[0]
    assert r2.overlap_est <= 25


def test_streaming_sketch_ingest(spark, docs, tmp_path):
    """A 3-file stream appended via foreachBatch reports the same
    distinct estimates as a single-shot store (HLL merge exactness)."""
    import tempfile

    src = str(tmp_path / "sk_stream_src")
    for i in range(3):
        docs.where(f"doc_id % 3 = {i}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = str(tmp_path / "sk_stream_store")
    st = SK.StreamingSketchStore(store, ["lang"], "doc_id", "n_chars")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = st.attach(stream, tempfile.mkdtemp(prefix="skckpt_"), availableNow=True)
    q.awaitTermination(120)

    single = str(tmp_path / "sk_single")
    SK.write_sketch_store(docs, single, ["lang"], "doc_id", "n_chars")
    a = {
        r.lang: (r.n_rows, r.distinct_est)
        for r in SK.read_summary(spark, store, ["lang"]).collect()
    }
    b = {
        r.lang: (r.n_rows, r.distinct_est)
        for r in SK.read_summary(spark, single, ["lang"]).collect()
    }
    assert a == b


def test_quantile_drift_detects_shift(spark, docs, tmp_path):
    """Same distribution -> ks_stat within sketch rank error; a
    shifted copy (n_chars + 60% of its range) -> large ks_stat."""
    from pyspark.sql import functions as F2

    pa = str(tmp_path / "dr_a")
    pb = str(tmp_path / "dr_b")
    pc = str(tmp_path / "dr_c")
    SK.write_sketch_store(docs, pa, [], "doc_id", "n_chars")
    # independent same-distribution sample: the other half of doc ids
    SK.write_sketch_store(
        docs.where("doc_id % 2 = 0"), pb, [], "doc_id", "n_chars"
    )
    shifted = docs.withColumn("n_chars", F2.col("n_chars") + 200)
    SK.write_sketch_store(shifted, pc, [], "doc_id", "n_chars")

    same = SK.quantile_drift(spark, pa, pb).collect()[0].ks_stat
    drift = SK.quantile_drift(spark, pa, pc).collect()[0].ks_stat
    assert same < 0.1, same
    assert drift > 0.3, drift
    assert drift > same

    # an empty store on EITHER side is a clear error, not a JVM crash
    pe = str(tmp_path / "dr_empty")
    SK.write_sketch_store(docs.limit(0), pe, [], "doc_id", "n_chars")
    with pytest.raises(ValueError, match="no sketches"):
        SK.quantile_drift(spark, pe, pb)
    with pytest.raises(ValueError, match="no sketches"):
        SK.quantile_drift(spark, pa, pe)


# ------------------------------------------------------------------ #
# Heavy hitters (mergeable top-m summaries)
# ------------------------------------------------------------------ #


def _tokens(docs):
    return docs.select(
        "lang",
        F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("tok"),
    ).where(F.length("tok") > 0)


def test_topk_single_batch_exact(spark, docs, tmp_path):
    """One batch with m >= #distinct items: the store IS the exact
    count table — lower == upper == truth, thresholds all zero."""
    toks = _tokens(docs)
    p = str(tmp_path / "tk_exact")
    SK.write_topk_store(toks, p, ["lang"], "tok", m=100_000)
    got = {
        (r.lang, r.tok): (r.cnt_lower, r.cnt_upper)
        for r in SK.read_topk(spark, p, ["lang"], "tok", k=10).collect()
    }
    exact = {
        (r.lang, r.tok): r.c
        for r in toks.groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got, "empty top-k"
    for key, (lo, hi) in got.items():
        assert lo == hi == exact[key], key


def test_topk_split_batches_bounds_hold(spark, docs, tmp_path):
    """3 batches with a SMALL m: every reported item's true count must
    sit inside [cnt_lower, cnt_upper], and items kept by every batch
    whose thresholds were 0 stay exact."""
    toks = _tokens(docs).cache()
    p = str(tmp_path / "tk_split")
    SK.write_topk_store(toks.where("tok rlike '^[a-h]'"), p, ["lang"], "tok", m=20)
    SK.append_topk_batch(toks.where("tok rlike '^[i-q]'"), p, ["lang"], "tok", m=20)
    SK.append_topk_batch(
        toks.where("tok rlike '^[^a-q]'"), p, ["lang"], "tok", m=20
    )
    exact = {
        (r.lang, r.tok): r.c
        for r in toks.groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    rows = SK.read_topk(spark, p, ["lang"], "tok", k=15).collect()
    assert rows
    for r in rows:
        true = exact[(r.lang, r.tok)]
        assert r.cnt_lower <= true <= r.cnt_upper, (r, true)
        # the alphabet split means each item lives in exactly one batch
        assert r.n_batches_seen == 1
    toks.unpersist()


def test_topk_merge_recovers_planted_heavy_hitter(spark, tmp_path):
    """All of a heavy item's occurrences land in one batch slice where
    it is top-1: the merge must surface it first with its exact lower
    count intact despite m being tiny and the tail noisy."""
    rows = []
    for b in range(3):
        rows += [("g", "heavy")] * 50
        rows += [("g", f"noise_{b}_{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "grp string, item string")
    p = str(tmp_path / "tk_heavy")
    SK.write_topk_store(df.where("item like '%_0_%' or item = 'heavy'"),
                        p, ["grp"], "item", m=5)
    SK.append_topk_batch(df.where("item like '%_1_%'"), p, ["grp"], "item", m=5)
    SK.append_topk_batch(df.where("item like '%_2_%'"), p, ["grp"], "item", m=5)
    top = SK.read_topk(spark, p, ["grp"], "item", k=1).collect()[0]
    assert top.item == "heavy"
    assert top.cnt_lower == 150
    # absent from batches 1 and 2's summaries only because it wasn't in
    # those batch slices; their thresholds bound the upper estimate
    assert top.cnt_upper >= top.cnt_lower
