"""Property-based tests (Hypothesis) — the rebuild's analog of the
reference's ScalaCheck suites (KeySerializerSuite.scala:28-132).

The reference property-tests its byte codecs (round-trip + prefix
freedom). Those codecs don't exist here (native Spark types), so the
properties that matter become:

- composite (multi-column) keys behave identically to single keys in
  every operator (the Tuple2Serializer guarantee);
- multiput with an associative+commutative merge is batch-order
  insensitive;
- delete/put algebra: put then delete is identity on the rest of the map.

Hypothesis drives small key/value universes; each property executes the
full distributed plan.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_indexedrdd_spark.core import SUM_MERGE, IndexedDataFrame

KEYS = st.integers(min_value=-5, max_value=5)
VALS = st.integers(min_value=-100, max_value=100)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def base(spark):
    df = spark.createDataFrame([(i, i * 10) for i in range(-5, 6)], "k long, v long")
    return IndexedDataFrame.build(df, "k", num_partitions=3)


@given(updates=st.dictionaries(KEYS, VALS, min_size=1, max_size=6))
@_slow
def test_multiput_matches_python_model(spark, base, updates):
    model = {i: i * 10 for i in range(-5, 6)}
    for k, u in updates.items():
        model[k] = model[k] + u if k in model else u
    out = base.multiput(updates, f=SUM_MERGE)
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == model


@given(
    batch=st.lists(st.tuples(KEYS, VALS), min_size=2, max_size=8),
)
@_slow
def test_multiput_df_order_insensitive(spark, base, batch):
    """Duplicate update keys fold with f; for associative+commutative f
    the batch order must not matter."""
    fwd = spark.createDataFrame(batch, "k long, v long")
    rev = spark.createDataFrame(list(reversed(batch)), "k long, v long")
    a = {r["k"]: r["v"] for r in base.multiput_df(fwd, f=SUM_MERGE).collect()}
    b = {r["k"]: r["v"] for r in base.multiput_df(rev, f=SUM_MERGE).collect()}
    assert a == b


@given(ks=st.lists(KEYS, min_size=1, max_size=6, unique=True))
@_slow
def test_delete_then_lookup_miss_rest_intact(spark, base, ks):
    out = base.delete(ks)
    got = {r["k"]: r["v"] for r in out.collect()}
    for k in ks:
        assert k not in got
    for i in range(-5, 6):
        if i not in ks:
            assert got[i] == i * 10


@given(
    pairs=st.dictionaries(
        st.tuples(KEYS, st.sampled_from(["a", "b", "c"])),
        VALS,
        min_size=1,
        max_size=8,
    )
)
@_slow
def test_composite_keys_equal_single_key_semantics(spark, pairs):
    """Build+multiget over a composite key == the same data keyed by a
    single synthetic key (the Tuple2 <-> flat-key isomorphism the
    reference guarantees via Tuple2Serializer)."""
    rows = [(k1, k2, v) for (k1, k2), v in pairs.items()]
    comp = IndexedDataFrame.build(
        spark.createDataFrame(rows, "k1 long, k2 string, v long"),
        ["k1", "k2"],
        num_partitions=3,
    )
    flat_rows = [(f"{k1}|{k2}", v) for (k1, k2), v in pairs.items()]
    flat = IndexedDataFrame.build(
        spark.createDataFrame(flat_rows, "k string, v long"), "k", num_partitions=3
    )
    got_comp = comp.multiget(list(pairs))
    got_flat = flat.multiget([f"{k1}|{k2}" for (k1, k2) in pairs])
    assert {f"{a}|{b}": v for (a, b), v in got_comp.items()} == got_flat
    assert comp.count() == flat.count() == len(pairs)


# --- driver-side Murmur3 == F.hash, property form ---------------------- #


def test_murmur3_property_batch(spark):
    """One batched comparison over adversarial + random values of every
    supported key type (cheaper than per-example Spark jobs; the fixed
    unit cases live in test_point_lookup.py)."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from spark_indexedrdd_spark import hashing as H

    rnd = random.Random(20260813)
    longs = [rnd.randint(-(2**62), 2**62) for _ in range(150)] + [
        0, -1, 1, 2**31, -(2**31), 2**62
    ]
    strs = [
        "".join(
            chr(rnd.randint(32, 0x2FFF)) for _ in range(rnd.randint(0, 40))
        )
        for _ in range(150)
    ] + ["", " ", "é中\U0001f600"]
    doubles = [rnd.uniform(-1e18, 1e18) for _ in range(100)] + [
        0.0, -0.0, 1e-300, float("inf"), float("-inf")
    ]

    for schema, vals in [
        (T.StructType([T.StructField("k", T.LongType())]), [(v,) for v in longs]),
        (T.StructType([T.StructField("k", T.StringType())]), [(v,) for v in strs]),
        (T.StructType([T.StructField("k", T.DoubleType())]), [(v,) for v in doubles]),
        (
            T.StructType(
                [
                    T.StructField("a", T.LongType()),
                    T.StructField("b", T.StringType()),
                    T.StructField("c", T.DoubleType()),
                ]
            ),
            [
                (l, s, d)
                for l, s, d in zip(longs[:80], strs[:80], doubles[:80])
            ],
        ),
    ]:
        df = spark.createDataFrame(vals, schema=schema)
        got = df.select(F.hash(*df.columns).alias("h")).collect()
        hs = H.hashers_for_schema(df.schema)
        for g, row in zip(got, vals):
            assert g["h"] == H.spark_hash_tuple(tuple(row), hs), row


@_slow
@given(
    weird=st.lists(
        st.text(min_size=0, max_size=12),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_multiget_arbitrary_string_keys(spark, weird):
    """Hypothesis-generated string keys (quotes, backslashes, unicode,
    control chars): multiget must behave exactly like a Python dict
    regardless of which predicate path (inline SQL vs Column) it takes."""
    from spark_indexedrdd_spark.core import IndexedDataFrame

    rows = [(w, i) for i, w in enumerate(weird)]
    df = spark.createDataFrame(rows, "k string, v long")
    kv = IndexedDataFrame.build(df, "k", num_partitions=2)
    got = kv.multiget(weird + ["\x00nope'--"])
    assert got == {w: i for i, w in enumerate(weird)}


WORDS = st.lists(
    st.sampled_from(["a", "bb", "ccc", "the", "x9", "日本", "z"]),
    min_size=0,
    max_size=12,
)


@_slow
@given(docs=st.lists(WORDS, min_size=1, max_size=5))
def test_repetition_stats_matches_python_model(spark, docs):
    """HOF n-gram construction vs a plain-Python model over arbitrary
    token sequences — pins the shifted-slice zip (width>len, empties,
    unicode, all-identical runs) against an independent formulation."""
    from spark_indexedrdd_spark.functions.text import repetition_stats

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}

    def frac(toks, w):
        grams = [" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)]
        return 0.0 if not grams else 1.0 - len(set(grams)) / len(grams)

    for i, words in enumerate(docs):
        toks = [t.lower() for t in words]
        assert got[i].n_tokens == len(toks)
        assert got[i].dup_bigram_frac == frac(toks, 2), (i, toks)
        assert got[i].dup_trigram_frac == frac(toks, 3), (i, toks)


@_slow
@given(docs=st.lists(WORDS, min_size=1, max_size=5))
def test_duplicate_spans_matches_python_model(spark, docs):
    """Span hashing + corpus counting vs a plain-Python model: for every
    width-3 window (stride 1), a position is duplicated iff its token
    span occurs >= 2 times anywhere in the corpus (within-doc repeats
    included). Pins the sequence/slice construction and the two-level
    aggregation against an independent formulation."""
    from collections import Counter

    from spark_indexedrdd_spark.functions.text import duplicate_spans

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in duplicate_spans(df, width=3).collect()}

    toks = {i: [t.lower() for t in words] for i, words in enumerate(docs)}
    spans = {
        i: [" ".join(t[j:j + 3]) for j in range(len(t) - 2)]
        for i, t in toks.items()
    }
    corpus = Counter(s for ss in spans.values() for s in ss)
    for i in toks:
        n = len(spans[i])
        nd = sum(1 for s in spans[i] if corpus[s] >= 2)
        assert got[i].n_spans == n, (i, spans[i])
        assert got[i].n_dup_spans == nd, (i, spans[i])
        expect = 0.0 if n == 0 else nd / n
        assert got[i].dup_span_frac == expect


@_slow
@given(
    vecs=st.lists(
        st.lists(
            st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0, 2.0]),
            min_size=4,
            max_size=4,
        ).filter(lambda v: any(x != 0.0 for x in v)),
        min_size=2,
        max_size=10,
    )
)
def test_semantic_dedup_matches_python_model(spark, vecs):
    """Det-centroid SemDeDup vs a plain-Python model: same first-k
    centroids, same argmax tie-break (first max), same min-smaller-id
    duplicate rule. Exact float comparison is safe — the planted values
    make every dot product exact in binary floating point."""
    import math

    from spark_indexedrdd_spark.functions.ivf import semantic_dedup

    k = 2
    thr = 0.9
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r
        for r in semantic_dedup(
            df, threshold=thr, n_clusters=k, method="det"
        ).collect()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cents = [vecs[i] for i in range(min(k, len(vecs)))]
    assign = {}
    for i, v in enumerate(vecs):
        sims = [dot(v, c) / math.sqrt(dot(c, c)) for c in cents]
        assign[i] = max(range(len(sims)), key=lambda j: (sims[j], -j))
    dup_of = {}
    for i, v in enumerate(vecs):
        near = [
            j
            for j in range(i)
            if assign[j] == assign[i]
            and dot(v, vecs[j])
            / (math.sqrt(dot(v, v)) * math.sqrt(dot(vecs[j], vecs[j])))
            >= thr
        ]
        dup_of[i] = min(near) if near else None
    for i in range(len(vecs)):
        assert got[i].cluster_id == assign[i], (i, vecs)
        assert got[i].dup_of == dup_of[i], (i, vecs)
        assert got[i].keep == (dup_of[i] is None)


@_slow
@given(docs=st.lists(WORDS, min_size=1, max_size=4))
def test_remove_duplicate_spans_matches_python_model(spark, docs):
    """Removal semantics vs a plain-Python model: canonical =
    lexicographically-smallest (doc, pos) occurrence of each duplicated
    width-3 span; every other occurrence covers [pos, pos+3); kept
    tokens are the uncovered ones, in order."""
    from collections import Counter

    from spark_indexedrdd_spark.functions.text import remove_duplicate_spans

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r for r in remove_duplicate_spans(df, width=3).collect()
    }

    toks = {i: [t.lower() for t in words] for i, words in enumerate(docs)}
    occ = [
        (i, p + 1, " ".join(t[p:p + 3]))
        for i, t in toks.items()
        for p in range(len(t) - 2)
    ]
    cnt = Counter(h for _, _, h in occ)
    canon = {}
    for i, p, h in sorted(occ):
        canon.setdefault(h, (i, p))
    for i, t in toks.items():
        starts = {
            p for (d, p, h) in occ
            if d == i and cnt[h] >= 2 and canon[h] != (d, p)
        }
        kept = [
            tok for j, tok in enumerate(t, start=1)
            if not any(s <= j < s + 3 for s in starts)
        ]
        assert got[i].n_tokens == len(t)
        assert got[i].n_removed == len(t) - len(kept), (i, docs)
        assert got[i].clean_text == " ".join(kept), (i, docs)


# --------------------------------------------------------------------- #
# SCD2 merge vs a pure-Python history model (r7)
# --------------------------------------------------------------------- #

_SCD_TS = ["2021-0{m}-01 00:00:00".format(m=m) for m in range(1, 8)]


def _scd_model_apply(history, updates, ts):
    """history: list of dicts with k,v,valid_from,valid_to,is_current."""
    out = [r for r in history if not r["is_current"]]
    open_rows = {r["k"]: r for r in history if r["is_current"]}
    for k, r in open_rows.items():
        u = updates.get(k)
        if u is None or u == r["v"]:
            out.append(r)
        else:
            out.append({**r, "valid_to": ts, "is_current": False})
            out.append(
                {"k": k, "v": u, "valid_from": ts, "valid_to": None,
                 "is_current": True}
            )
    for k, u in updates.items():
        if k not in open_rows:
            out.append(
                {"k": k, "v": u, "valid_from": ts, "valid_to": None,
                 "is_current": True}
            )
    return out


@given(
    batches=st.lists(
        st.dictionaries(KEYS, VALS, min_size=0, max_size=4),
        min_size=1,
        max_size=4,
    )
)
@_slow
@pytest.mark.slow
def test_scd2_chained_batches_match_python_model(spark, batches):
    from spark_indexedrdd_spark.operators.scd import scd2_apply, scd2_init

    dim = spark.createDataFrame(
        [(i, i * 10) for i in range(-2, 3)], "k long, v long"
    )
    hist = scd2_init(dim, "2020-01-01 00:00:00")
    model = [
        {"k": i, "v": i * 10, "valid_from": "2020-01-01 00:00:00",
         "valid_to": None, "is_current": True}
        for i in range(-2, 3)
    ]
    for i, batch in enumerate(batches):
        ts = _SCD_TS[i]
        if batch:
            upd = spark.createDataFrame(
                list(batch.items()), "k long, v long"
            )
            hist = scd2_apply(hist, upd, ["k"], ["v"], ts)
            model = _scd_model_apply(model, batch, ts)
    got = sorted(
        (r.k, r.v, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in hist.collect()
    )
    want = sorted(
        (
            r["k"],
            r["v"],
            r["valid_from"],
            str(None) if r["valid_to"] is None else r["valid_to"],
            r["is_current"],
        )
        for r in model
    )
    assert got == want
