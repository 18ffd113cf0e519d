"""Distributed BPE training/encoding vs a plain-Python reference
implementation of the same (deterministically tie-broken) algorithm."""

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions.bpe import EOW, encode_bpe, train_bpe
from spark_indexedrdd_spark.sources.tables import load_table


def _py_vocab(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                c[w] += 1
    return c


def _py_symbols(word):
    return list(word[:-1]) + [word[-1] + EOW]


def _py_merge(sym, a, b):
    out = []
    for x in sym:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_train(texts, n_merges):
    from collections import Counter

    vocab = {tuple(_py_symbols(w)): c for w, c in _py_vocab(texts).items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = {
            tuple(_py_merge(list(s), a, b)): c for s, c in vocab.items()
        }
    return merges


def _py_encode(text, merges):
    toks = []
    for w in text.lower().strip().split():
        if not w:
            continue
        sym = _py_symbols(w)
        for a, b in merges:
            sym = _py_merge(sym, a, b)
        toks.extend(sym)
    return toks


TEXTS = [
    "low lower lowest",
    "new newer newest newest",
    "low low new wide widest",
    "the newest widest lowest the the",
]


def test_train_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = train_bpe(df, n_merges=12)
    want = _py_train(TEXTS, 12)
    assert got == want
    assert len(got) >= 5  # the corpus genuinely supports merges


def test_encode_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=8)
    enc = {r.doc_id: list(r.bpe_tokens) for r in encode_bpe(df, merges).collect()}
    for i, t in enumerate(TEXTS):
        assert enc[i] == _py_encode(t, merges), i


def test_encode_compresses_and_roundtrips(spark, sf_dir):
    """On the real documents table: merges shrink token counts, and
    stripping EOW markers reconstructs the normalized text."""
    docs = load_table(spark, sf_dir, "documents").limit(50).cache()
    merges = train_bpe(docs, n_merges=10)
    assert merges
    enc = encode_bpe(docs, merges)
    base = encode_bpe(docs, [])
    joined = (
        enc.select("doc_id", F.col("n_bpe").alias("n_merged"))
        .join(base.select("doc_id", F.col("n_bpe").alias("n_chars")), "doc_id")
        .agg(F.sum("n_merged").alias("m"), F.sum("n_chars").alias("c"))
        .collect()[0]
    )
    assert joined.m < joined.c  # merges actually compress
    # round-trip: concat symbols, split words back on EOW
    row = enc.join(docs.select("doc_id", "text"), "doc_id").first()
    rebuilt = (
        "".join(row.bpe_tokens).replace(EOW, " ").strip()
    )
    normalized = " ".join(row.text.lower().strip().split())
    assert rebuilt == normalized
    docs.unpersist()


def test_train_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    assert train_bpe(df, n_merges=6) == train_bpe(df, n_merges=6)


def test_batched_selection_equals_merge_at_a_time(spark):
    """The top-M batched driver loop must pick the EXACT sequence the
    one-merge-per-job argmax picks — including on a tie-heavy corpus
    where an unsafe batch would reorder merges. batch_top_m=1 is
    literally the old per-merge loop."""
    rows = [
        (1, "aa ab aa ab ba bb"),
        (2, "cd cd ce de cd"),
        (3, "aa cd aa cd xyz xyz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seq = train_bpe(df, n_merges=10, batch_top_m=1)
    bat = train_bpe(df, n_merges=10, batch_top_m=64)
    assert seq == bat and len(seq) > 0


# ------------------------- persisted merge store ---------------------- #


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_store_roundtrip_and_encode_parity(spark, tmp_path):
    """write -> read returns the identical ordered merge list, and
    encode_from_store output equals encode_bpe with the in-memory
    merges (plus the merges_id version column)."""
    from spark_indexedrdd_spark.functions import bpe as B

    df = _docs(spark)
    p = str(tmp_path / "bpe_store")
    merges = B.train_and_write_bpe(df, p, n_merges=8)
    assert B.read_bpe_store(spark, p) == merges
    got = B.encode_from_store(spark, df, p)
    assert set(got.columns) == {"doc_id", "bpe_tokens", "n_bpe", "merges_id"}
    want = {
        r.doc_id: list(r.bpe_tokens)
        for r in B.encode_bpe(df, merges).collect()
    }
    rows = got.collect()
    assert {r.doc_id: list(r.bpe_tokens) for r in rows} == want
    assert {r.merges_id for r in rows} == {B.merges_id(merges)}


def test_store_uncommitted_and_mixed_builds_refused(spark, tmp_path):
    """meta.json is the commit marker: a store whose rebuild crashed
    pre-commit is FileNotFoundError; committed rows that do not match
    their meta (mixed build) are a loud ValueError, never a silent
    tokenize under the wrong merges."""
    import pytest as _pytest

    from spark_indexedrdd_spark.functions import bpe as B
    from spark_indexedrdd_spark.functions import store_commit as SC

    df = _docs(spark)
    p = str(tmp_path / "bpe_crash")
    B.train_and_write_bpe(df, p, n_merges=6)
    good = B.read_bpe_store(spark, p)

    # crash during rebuild = old meta retracted, new rows half-written:
    # simulate the retract step, reader refuses cleanly
    SC.retract_meta(p)
    with _pytest.raises(FileNotFoundError):
        B.read_bpe_store(spark, p)

    # recommit a meta that does NOT match the rows -> loud error
    SC.commit_meta(p, {"n_merges": len(good), "merges_id": "bogus"})
    with _pytest.raises(ValueError, match="does not match"):
        B.read_bpe_store(spark, p)

    # a full rebuild recovers
    B.write_bpe_store(spark, good, p)
    assert B.read_bpe_store(spark, p) == good


def test_streaming_encoder_matches_store_encode_and_replays(spark, tmp_path):
    """The foreachBatch twin: batch outputs equal encode_from_store on
    the same rows, replay of a batch overwrites instead of duplicating,
    and every row carries the tokenizer fingerprint."""
    from spark_indexedrdd_spark.functions import bpe as B

    df = _docs(spark)
    store = str(tmp_path / "bpe_m")
    out = str(tmp_path / "bpe_enc")
    B.train_and_write_bpe(df, store, n_merges=8)

    enc = B.StreamingBpeEncoder(store, out)
    b0, b1 = df.where("doc_id < 2"), df.where("doc_id >= 2")
    enc.foreach_batch(b0, 0)
    enc.foreach_batch(b1, 1)
    enc.foreach_batch(b0, 0)  # at-least-once replay

    got = B.read_encoded_batches(spark, out)
    want = B.encode_from_store(spark, df, store)
    g = {r.doc_id: (list(r.bpe_tokens), r.merges_id) for r in got.collect()}
    w = {r.doc_id: (list(r.bpe_tokens), r.merges_id) for r in want.collect()}
    assert g == w  # replay did not duplicate; content identical
    assert got.count() == df.count()


def test_train_driver_and_distributed_paths_identical(spark):
    """The size-gated driver-side merge loop must reproduce the
    distributed batched-argmax loop merge-for-merge (both are pinned to
    merge-at-a-time selection; this pins them to each other)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    driver = train_bpe(df, n_merges=12, driver_max_vocab=1 << 20)
    distributed = train_bpe(df, n_merges=12, driver_max_vocab=0)
    assert driver == distributed
    assert driver == _py_train(TEXTS, 12)
