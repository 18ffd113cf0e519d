"""Trained quality classifier (functions/classifier.py): the GD loop's
fixed-point determinism (exact match vs a pure-Python reference model),
actual learning (recovers a text-derived label), the DuckDB unrolled-CTE
oracle, and edge cases (empty text, single-class corpus)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import classifier as C
from tests.oracle_utils import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ #
# Pure-Python reference: the same model, same fixed-point arithmetic,
# no Spark — the training loop's ground truth.
# ------------------------------------------------------------------ #


def _py_buckets(text: str, n_buckets: int) -> list[int]:
    toks = [t for t in text.lower().strip().split() if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    bks = {
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
        for g in grams
    }
    return sorted(bks)


def _py_train(rows, n_buckets, iters, lr, scale):
    """rows: [(id, text, y)] -> (w, bias, scores dict)"""
    feats = [(i, _py_buckets(t, n_buckets), float(y)) for i, t, y in rows]
    n = len(feats)
    w, bias = [0.0] * n_buckets, 0.0
    for _ in range(iters):
        sums = [0] * n_buckets
        bias_s = 0
        for _i, bks, y in feats:
            m = bias
            for b in bks:
                m = m + w[b]
            g = 1.0 / (1.0 + math.exp(-m)) - y
            q = math.floor(g * scale)
            bias_s += q
            for b in bks:
                sums[b] += q
        # double/double division, matching the engines (classifier.py)
        denom = float(n * scale)
        w = [
            w[b] - lr * (float(sums[b]) / denom) for b in range(n_buckets)
        ]
        bias = bias - lr * (float(bias_s) / denom)
    scores = {}
    for i, bks, _y in feats:
        m = bias
        for b in bks:
            m = m + w[b]
        scores[i] = round(1.0 / (1.0 + math.exp(-m)), 9)
    return w, bias, scores


def test_training_matches_python_reference_exactly(spark):
    """The distributed GD loop's weights/bias/scores are bit-identical
    to the sequential Python model — proof the integer-quantized
    gradient makes training order-free."""
    docs = spark.read.parquet(SF_DIR + "/documents.parquet").limit(200)
    rows = [
        (r.doc_id, r.text, 1 if "spark" in r.text else 0)
        for r in docs.select("doc_id", "text").collect()
    ]
    nb, it, lr = 256, 4, 4.0
    w_py, b_py, scores_py = _py_train(rows, nb, it, lr, C.SCALE)
    w_sp, b_sp, feats = C.train_logreg_hashed(
        docs, F.col("text").contains("spark"), n_buckets=nb, iters=it, lr=lr
    )
    assert b_sp == b_py
    assert w_sp == w_py
    got = {
        r.doc_id: r.clf_score
        for r in C.classifier_score(feats, w_sp, b_sp).collect()
    }
    assert got == scores_py


def test_training_matches_python_reference_on_random_corpora(spark):
    """Property: for arbitrary small corpora (arbitrary token soups,
    arbitrary label assignments, varying hyperparameters) the
    distributed trainer equals the sequential Python model EXACTLY —
    weights, bias, and scores. This is the fixed-point determinism
    claim quantified over inputs, not one corpus."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    token = st.text(
        alphabet="abcxyz0é日'\"", min_size=1, max_size=4
    ).map(lambda s: s.strip()).filter(bool)
    doc = st.lists(token, min_size=0, max_size=12).map(" ".join)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        texts=st.lists(doc, min_size=1, max_size=8),
        labels=st.lists(st.booleans(), min_size=8, max_size=8),
        nb=st.sampled_from([16, 64]),
        it=st.integers(min_value=1, max_value=3),
        lr=st.sampled_from([1.0, 4.0]),
    )
    def check(texts, labels, nb, it, lr):
        rows = [
            (i, t, int(labels[i])) for i, t in enumerate(texts)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t, _ in rows], "doc_id long, text string"
        )
        pos = [i for i, _, y in rows if y]
        lab = F.col("doc_id").isin(pos) if pos else F.lit(False)
        w_py, b_py, scores_py = _py_train(rows, nb, it, lr, C.SCALE)
        w_sp, b_sp, feats = C.train_logreg_hashed(
            docs, lab, n_buckets=nb, iters=it, lr=lr
        )
        assert (w_sp, b_sp) == (w_py, b_py)
        got = {
            r.doc_id: r.clf_score
            for r in C.classifier_score(feats, w_sp, b_sp).collect()
        }
        assert got == scores_py

    check()


def test_driver_gd_path_equals_distributed_path_exactly(spark):
    """The numpy driver-side GD (small-corpus fast path) and the
    distributed per-iteration-job loop produce BIT-identical weights,
    bias, and scores on a real corpus — the same pin the CC union-find
    and BPE driver paths carry. This is also the empirical exp-parity
    check between numpy and the JVM on real margin values."""
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    lab = F.col("text").contains("spark")
    nb, it, lr = 256, 6, 4.0
    w_drv, b_drv, feats = C.train_logreg_hashed(
        docs, lab, n_buckets=nb, iters=it, lr=lr, driver_max_docs=10**9
    )
    w_dst, b_dst, _ = C.train_logreg_hashed(
        docs, lab, n_buckets=nb, iters=it, lr=lr, driver_max_docs=0
    )
    import struct

    pack = lambda xs: b"".join(struct.pack("<d", x) for x in xs)  # noqa: E731
    assert pack(w_drv) == pack(w_dst)
    assert struct.pack("<d", b_drv) == struct.pack("<d", b_dst)
    s_drv = C.classifier_score(feats, w_drv, b_drv).collect()
    s_dst = C.classifier_score(feats, w_dst, b_dst).collect()
    assert sorted(map(tuple, s_drv)) == sorted(map(tuple, s_dst))


def test_unicode_and_quote_tokens_match_python_reference(spark):
    """Non-ASCII tokens and quote characters flow through md5 hashing
    identically in Spark (UTF-8 binary md5) and the Python reference —
    the byte-level contract the DuckDB twin also relies on."""
    rows = [
        (1, "héllo wörld héllo", 1),
        (2, "日本語 テキスト 日本語", 0),
        (3, "it's a \"quoted\" token — em—dash", 1),
        (4, "emoji 🙂 token 🙂 twice", 0),
        (5, "MiXeD CaSe TOKENS mixed case tokens", 1),
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = {i: y for i, t, y in rows}
    lab = F.col("doc_id").isin([i for i, _, y in rows if y == 1])
    nb, it, lr = 64, 3, 2.0
    w_py, b_py, scores_py = _py_train(
        [(i, t, y) for i, t, y in rows], nb, it, lr, C.SCALE
    )
    w_sp, b_sp, feats = C.train_logreg_hashed(
        docs, lab, n_buckets=nb, iters=it, lr=lr
    )
    assert (w_sp, b_sp) == (w_py, b_py)
    got = {
        r.doc_id: r.clf_score
        for r in C.classifier_score(feats, w_sp, b_sp).collect()
    }
    assert got == scores_py
    assert set(got) == set(labels)


def test_learns_text_derived_label(spark):
    """With a label recoverable from text, defaults reach >0.9 accuracy
    and the two classes' mean scores separate widely — the filter
    actually filters."""
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    pdf = C.quality_classifier(
        docs, F.col("text").contains("spark")
    ).toPandas()
    acc = ((pdf.clf_score > 0.5).astype(int) == pdf.y).mean()
    assert acc > 0.9
    means = pdf.groupby("y")["clf_score"].mean()
    assert means[1] - means[0] > 0.5
    # the Pareto lottery keeps a score-biased, non-trivial subset
    assert 0.0 < pdf.keep.mean() < 1.0
    assert pdf.loc[pdf.keep, "clf_score"].mean() > pdf.clf_score.mean()


def test_oracle_parity(spark):
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    df = C.quality_classifier(docs, F.col("text").contains("spark"))
    rep = compare(
        df,
        C.sql_quality_classifier(label_sql="contains(text, 'spark')"),
        duck_con(SF_DIR),
    )
    assert rep["ok"], rep["issues"]


def test_empty_and_null_text_score_at_bias(spark):
    """Token-less docs have no features: their score is sigmoid(bias),
    identical for all of them, and training doesn't crash on them."""
    docs = spark.createDataFrame(
        [(1, "spark spark good", 1), (2, "", 0), (3, None, 0), (4, "bad doc", 0)],
        "doc_id long, text string, y int",
    )
    w, bias, feats = C.train_logreg_hashed(
        docs, F.col("y") == 1, n_buckets=32, iters=2, lr=1.0
    )
    scores = {
        r.doc_id: r.clf_score for r in C.classifier_score(feats, w, bias).collect()
    }
    assert scores[2] == scores[3] == round(1.0 / (1.0 + math.exp(-bias)), 9)


def test_empty_corpus_returns_zero_model(spark):
    """Training on zero documents returns the zero model instead of a
    division-by-zero; scoring an empty features frame is empty."""
    docs = spark.createDataFrame([], "doc_id long, text string")
    w, bias, feats = C.train_logreg_hashed(
        docs, F.lit(True), n_buckets=16, iters=2, lr=1.0
    )
    assert w == [0.0] * 16 and bias == 0.0
    assert C.classifier_score(feats, w, bias).count() == 0


def test_model_store_roundtrip_scores_exactly(spark, tmp_path):
    """Persisted model scores an ingest batch exactly like the in-plan
    model (train once, gate every later batch); crash-before-meta
    leaves no readable store."""
    import os

    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    train = docs.where("doc_id % 2 = 0")
    batch = docs.where("doc_id % 2 = 1")
    path = str(tmp_path / "clf_model")
    w, bias = C.train_and_write_classifier(
        train, F.col("text").contains("spark"), path, n_buckets=256, iters=4
    )
    w2, b2 = C.read_classifier_model(spark, path)
    assert w2 == w and b2 == bias
    feats = C._bucketize(batch, F.lit(False), 256, "text", "doc_id")
    inplan = {
        r.doc_id: r.clf_score
        for r in C.classifier_score(feats, w, bias).collect()
    }
    stored = {
        r.doc_id: (r.clf_score, r.keep)
        for r in C.classifier_score_from_store(batch, path).collect()
    }
    assert {k: v[0] for k, v in stored.items()} == inplan
    # weights written but meta missing = uncommitted store
    os.remove(os.path.join(path, "meta.json"))
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        C.read_classifier_model(spark, path)


def test_streaming_gate_matches_store_scoring_and_replays_idempotent(
    spark, tmp_path
):
    """The foreachBatch gate's verdicts equal classifier_score_from_store
    over the same docs, a REPLAYED batch changes nothing (batch_id-keyed
    overwrite), and empty batches are no-ops."""
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    model = str(tmp_path / "gate_model")
    out = str(tmp_path / "gate_out")
    C.train_and_write_classifier(
        docs.where("doc_id < 250"),
        F.col("text").contains("spark"),
        model,
        n_buckets=256,
        iters=4,
    )
    b1 = docs.where("doc_id >= 250 AND doc_id < 350")
    b2 = docs.where("doc_id >= 350")
    gate = C.StreamingClassifierGate(model, out)
    gate.foreach_batch(b1, 0)
    gate.foreach_batch(b2, 1)
    gate.foreach_batch(docs.limit(0), 2)  # empty: no-op, no directory

    got = {
        r.doc_id: (r.clf_score, r.keep)
        for r in C.read_gate_verdicts(spark, out).collect()
    }
    want = {
        r.doc_id: (r.clf_score, r.keep)
        for r in C.classifier_score_from_store(
            docs.where("doc_id >= 250"), model
        ).collect()
    }
    assert got == want

    gate.foreach_batch(b1, 0)  # at-least-once replay of batch 0
    again = {
        r.doc_id: (r.clf_score, r.keep)
        for r in C.read_gate_verdicts(spark, out).collect()
    }
    assert again == want
    assert C.read_gate_verdicts(spark, out).count() == len(want)


def test_gate_verdicts_stamp_model_id_making_retrains_detectable(
    spark, tmp_path
):
    """Per-batch replay idempotence only holds while the persisted
    model is unchanged (class docstring) — so every verdict row carries
    the loaded model's fingerprint, and a verdict set spanning a
    retrain shows >1 DISTINCT model_id instead of silently mixing."""
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    model = str(tmp_path / "mid_model")
    out = str(tmp_path / "mid_out")
    C.train_and_write_classifier(
        docs.where("doc_id < 200"),
        F.col("text").contains("spark"),
        model,
        n_buckets=256,
        iters=2,
    )
    C.StreamingClassifierGate(model, out).foreach_batch(
        docs.where("doc_id >= 200 AND doc_id < 300"), 0
    )
    ids_a = {
        r.model_id
        for r in C.read_gate_verdicts(spark, out).select("model_id").collect()
    }
    assert len(ids_a) == 1
    # retrain on a different slice -> different weights -> new id; a
    # FRESH gate (restart) gating the next batch produces a mixed set
    C.train_and_write_classifier(
        docs.where("doc_id < 100"),
        F.col("text").contains("the"),
        model,
        n_buckets=256,
        iters=2,
    )
    C.StreamingClassifierGate(model, out).foreach_batch(
        docs.where("doc_id >= 300 AND doc_id < 400"), 1
    )
    mixed = {
        r.model_id
        for r in C.read_gate_verdicts(spark, out).select("model_id").collect()
    }
    assert len(mixed) == 2 and ids_a < mixed


def test_score_from_store_is_shuffle_free(spark, tmp_path):
    """Serving is a narrow per-row fold: zero exchanges in the plan."""
    from spark_indexedrdd_spark.plans import explain as X

    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    model = str(tmp_path / "plan_model")
    C.train_and_write_classifier(
        docs.limit(100), F.col("text").contains("spark"), model,
        n_buckets=64, iters=2,
    )
    served = C.classifier_score_from_store(docs, model)
    plan = X.physical_plan(served)
    assert X.count_exchanges(plan) == 0, plan


def test_single_class_corpus_converges_to_base_rate(spark):
    """All-positive labels: no gradient signal beyond the bias, which
    walks toward +inf logit; scores stay in (0, 1] and uniform buckets
    never crash the grid join."""
    docs = spark.createDataFrame(
        [(i, f"doc number {i} text", 1) for i in range(10)],
        "doc_id long, text string, y int",
    )
    pdf = C.quality_classifier(
        docs, F.col("y") == 1, n_buckets=32, iters=3, lr=1.0
    ).toPandas()
    assert (pdf.clf_score > 0.5).all()
    assert (pdf.y == 1).all()
