"""Oracle-parity + behavior tests for text analysis and dedup operators
over the real documents table."""

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import dedup as DD
from spark_indexedrdd_spark.functions import text as TX
from spark_indexedrdd_spark.sources.tables import load_table
from tests.oracle_utils import compare, duck_con


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize(
    "builder,sql_builder",
    [
        (TX.text_stats, TX.sql_text_stats),
        (TX.lang_id, TX.sql_lang_id),
        (TX.fingerprint, TX.sql_fingerprint),
        (TX.winnow_fingerprints, TX.sql_winnow_fingerprints),
        (DD.exact_dedup, DD.sql_exact_dedup),
        (DD.shingles, DD.sql_shingles),
        (DD.minhash_signatures, DD.sql_minhash_signatures),
        (DD.lsh_candidates, DD.sql_lsh_candidates),
        (DD.simhash, DD.sql_simhash),
        (DD.ngram_jaccard_pairs, DD.sql_ngram_jaccard_pairs),
        (DD.dedup_pipeline, DD.sql_dedup_pipeline),
        (TX.hash_split, TX.sql_hash_split),
        (TX.pack_documents, TX.sql_pack_documents),
    ],
    ids=lambda b: getattr(b, "__name__", str(b)),
)
def test_oracle_parity(builder, sql_builder, docs, con):
    report = compare(builder(docs), sql_builder(), con)
    assert report["ok"], report


def test_exact_dedup_finds_planted_duplicates(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "  THE   quick  Brown fox "),  # same after normalization
        (3, "something else entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.group_size for r in DD.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}  # keeps min doc_id per group


def test_lsh_finds_planted_near_duplicates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("gamma", "gamax", 1)  # one token changed
    far = "totally different words with no overlap whatsoever at all " * 5
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in DD.lsh_candidates(df).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] > 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_near_pairs_on_planted_dups(spark):
    base = " ".join(f"tok{i}" for i in range(100))
    near = base.replace("tok50", "tok50x")
    far = " ".join(f"other{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in DD.simhash_near_pairs(df, max_hamming=10).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_incremental_lsh_never_pairs_corpus_with_itself(spark):
    """Incremental ingest: candidates touch a NEW doc (new×corpus,
    new×new); near-dup pairs entirely inside the corpus are not
    re-reported — that work was done when those docs were ingested."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    far = "totally different words with no overlap whatsoever at all " * 5
    fresh = "unrelated new content nothing shared here at all ever " * 5
    # exact duplicates guarantee identical signatures → all bands match,
    # so every expected pair is deterministic (no band-hash luck)
    corpus = spark.createDataFrame(
        [(1, base), (2, base), (3, far)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, base), (11, base), (12, fresh)], "doc_id long, text string"
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in DD.incremental_lsh_candidates(new, corpus).collect()
    }
    assert all(a in {10, 11, 12} for a, _ in pairs)  # every pair touches new
    assert (10, 1) in pairs and (10, 2) in pairs     # new×corpus found
    assert (10, 11) in pairs                         # new×new found (a<b once)
    assert (11, 10) not in pairs
    # the corpus-internal duplicate (1,2) is NOT re-reported — that work
    # was done when those docs were ingested
    assert not any({a, b} == {1, 2} for a, b in pairs)
    assert not any(3 in (a, b) or 12 in (a, b) for a, b in pairs)  # far docs


def test_dedup_pipeline_verdicts(spark):
    """Planted corpus: exact copies collapse to one representative BEFORE
    LSH; near-dups cluster through the representative; an exact copy of
    a near-dup inherits the CLUSTER canonical (chains collapse)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("gamma", "gamax", 1)
    far = "totally different words with no overlap whatsoever at all " * 5
    rows = [
        (1, base),   # kept — canonical of everything base-like
        (2, base),   # exact copy of 1
        (3, near),   # near-dup of 1
        (4, near),   # exact copy of 3 -> canonical must chain to 1
        (5, far),    # kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.status, r.canonical_id)
        for r in DD.dedup_pipeline(df).collect()
    }
    assert got == {
        1: ("kept", 1),
        2: ("exact_dup", 1),
        3: ("near_dup", 1),
        4: ("exact_dup", 1),
        5: ("kept", 5),
    }
    # survivors = canonical set
    survivors = {c for _, c in got.values()}
    assert survivors == {1, 5}


def test_signature_store_equivalent_to_inplan_incremental(spark, sf_dir, tmp_path):
    """The store-backed incremental path must produce exactly the rows
    of the in-plan query-form — same pairs, same est_jaccard — while
    reading the corpus side from parquet signatures instead of text."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.where("doc_id % 20 = 0")
    corpus = docs.where("doc_id % 20 != 0")
    store = str(tmp_path / "sigstore")
    DD.write_signature_store(corpus, store)

    inplan = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in DD.incremental_lsh_candidates(new, corpus).collect()
    }
    stored = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in DD.incremental_lsh_candidates_from_store(new, store).collect()
    }
    assert stored == inplan and len(stored) > 0


def test_signature_store_append_batch_flow(spark, tmp_path):
    """Two-batch ingest: batch 2's candidates must see batch 1 as corpus
    after append_signature_batch folded it in."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    far = "totally different words with no overlap whatsoever at all " * 5
    store = str(tmp_path / "sigstore")
    corpus = spark.createDataFrame([(1, base), (2, far)], "doc_id long, text string")
    DD.write_signature_store(corpus, store)

    batch1 = spark.createDataFrame([(10, base)], "doc_id long, text string")
    p1 = {(r.doc_a, r.doc_b) for r in
          DD.incremental_lsh_candidates_from_store(batch1, store).collect()}
    assert p1 == {(10, 1)}
    DD.append_signature_batch(batch1, store)

    batch2 = spark.createDataFrame([(20, base)], "doc_id long, text string")
    p2 = {(r.doc_a, r.doc_b) for r in
          DD.incremental_lsh_candidates_from_store(batch2, store).collect()}
    assert p2 == {(20, 1), (20, 10)}  # sees original corpus AND batch 1


def test_simhash_blocking_is_lossless(spark):
    """simhash_near_pairs must equal the brute-force all-pairs result for
    ANY max_hamming — the (d+1)-chunk pigeonhole blocking loses nothing.
    (Round 2's fixed 4×16-bit chunks were lossy for d > 3: at d=8 on
    sf0.01 they missed 219 of 412 true pairs.)"""
    rows = [
        (i, " ".join(f"w{j}" for j in range(20)) + f" extra{i} x{i % 3}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r.doc_id: (r.simhash_hi, r.simhash_lo) for r in DD.simhash(df).collect()}

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    ids = sorted(fp)
    for d in (1, 3, 8, 15):
        brute = {
            (a, b, ham(fp[a], fp[b]))
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if ham(fp[a], fp[b]) <= d
        }
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in DD.simhash_near_pairs(df, max_hamming=d).collect()
        }
        assert got == brute, f"lossy blocking at d={d}"


def test_chunk_ranges_disjoint_and_exact_count():
    """The pigeonhole argument needs exactly k DISJOINT chunks — ≤ d
    differing bits can dirty at most d of them, so one stays clean.
    Coverage of all 64 bits is not required for losslessness (uncovered
    bits only make buckets coarser); with ≥2 chunks both halves are
    fully covered, which keeps buckets tight."""
    for k in (1, 2, 4, 5, 9, 16, 33, 64):
        ranges = DD._chunk_ranges(k)
        assert len(ranges) == k
        seen = set()
        for half, start, width in ranges:
            assert width >= 1 and start + width <= 32
            bits = {(half, start + i) for i in range(width)}
            assert not (bits & seen)
            seen |= bits
        if k >= 2:
            assert len(seen) == 64  # both halves fully covered


def test_ngram_stop_shingle_guard(spark):
    """A boilerplate shingle shared by every doc (above the DF cap) must
    be dropped from the shingle sets BEFORE the join: pairs whose only
    overlap is the hot shingle disappear, sizes shrink accordingly, and
    the join never sees a key with more rows than the cap."""
    boiler = "copyright acme corp all rights reserved"
    rows = [
        (i, f"unique{i} words{i} only{i} here{i} {boiler}", "s")
        for i in range(6)
    ]
    # docs 10/11 genuinely similar beyond the boilerplate
    rows += [
        (10, f"alpha beta gamma delta epsilon {boiler}", "s"),
        (11, f"alpha beta gamma delta zeta {boiler}", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r.doc_a, r.doc_b): r
        for r in DD.ngram_jaccard_pairs(df, stop_shingle_df=4).collect()
    }
    # boilerplate-only pairs are gone entirely
    assert all(a == 10 and b == 11 for a, b in out)
    r = out[(10, 11)]
    # capped sets: only the non-boilerplate shingles count. doc10 has 9
    # shingles; the 4 pure-boilerplate ones ("copyright acme corp" onward)
    # appear in all 8 docs (DF=8 > cap=4) and are dropped, leaving 5.
    assert r.size_a == r.size_b == 5
    # shared after the cap: "alpha beta gamma", "beta gamma delta"
    assert r.inter == 2
    assert abs(r.jaccard - 2 / 8) < 1e-15
    # the planted hot shingles exceed the cap: assert none survived into
    # the joinable shingle set
    sh = DD.shingles(df)
    freq = sh.groupBy("shingle").count()
    hot = {r["shingle"] for r in freq.where(F.col("count") > 4).collect()}
    assert hot, "planted boilerplate must exceed the cap"


def test_jaccard_exactness(spark):
    # doc1: shingles {a b c, b c d}; doc2: {a b c, b c e} -> inter 1, union 3
    df = spark.createDataFrame(
        [(1, "a b c d", "s"), (2, "a b c e", "s")],
        "doc_id long, text string, source string",
    )
    rows = DD.ngram_jaccard_pairs(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.inter, r.size_a, r.size_b) == (1, 2, 1, 2, 2)
    assert abs(r.jaccard - 1 / 3) < 1e-15


def test_winnowing_guarantee(spark):
    """Winnowing's contract: two docs sharing a run of >= k+w-1 tokens
    share at least one fingerprint; disjoint docs share none."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens >= k+w-1=6
    df = spark.createDataFrame(
        [
            (1, f"one two {shared} three four five six seven"),
            (2, f"nine ten eleven {shared} twelve thirteen fourteen"),
            (3, "completely different words everywhere all the time here"),
        ],
        "doc_id long, text string",
    )
    fps = TX.winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_redact_pii_planted(spark):
    rows = [
        (1, "contact me at alice.smith+x@example.co.uk or 192.168.1.100 thanks"),
        (2, "call +1 (555) 123-4567 today"),
        (3, "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.clean_text, r.n_redactions) for r in TX.redact_pii(df).collect()}
    assert "<EMAIL>" in out[1][0] and "<IP>" in out[1][0] and out[1][1] == 2
    assert "<PHONE>" in out[2][0] and out[2][1] == 1
    assert out[3] == ("nothing sensitive here at all", 0)


def test_contamination_check_planted(spark):
    from spark_indexedrdd_spark.functions.text import CONTAMINATION_PROBES

    probe = CONTAMINATION_PROBES[0]
    rows = [
        (1, f"some preamble {probe} and a closing remark here"),  # contaminated
        (2, "entirely unrelated content with zero overlap whatsoever today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = {(r.doc_id, r.probe_id) for r in TX.contamination_check(df).collect()}
    assert (1, 0) in hits
    assert all(doc != 2 for doc, _ in hits)


def test_lang_id_prefers_profile_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der hund ist nicht in das haus und die katze"),
            (3, "el gato es que no se en la casa y un perro"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.pred_lang for r in TX.lang_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "es"}


def test_hash_sample_deterministic_and_append_stable(spark, sf_dir):
    """hash_sample: same rows on every run and under repartitioning; a
    doc's membership never changes when more docs are appended; rate is
    approximately honored; different seeds draw near-independently."""
    docs = load_table(spark, sf_dir, "documents")
    s1 = {r.doc_id for r in TX.hash_sample(docs, 0.2).select("doc_id").collect()}
    s2 = {
        r.doc_id
        for r in TX.hash_sample(docs.repartition(7), 0.2).select("doc_id").collect()
    }
    assert s1 == s2 and s1
    # append-stability: sampling half the table gives exactly the
    # members of the full-table sample that are in that half
    half = docs.where(F.col("doc_id") % 2 == 0)
    sh = {r.doc_id for r in TX.hash_sample(half, 0.2).select("doc_id").collect()}
    assert sh == {d for d in s1 if d % 2 == 0}
    n = docs.count()
    assert 0.1 * n < len(s1) < 0.3 * n
    other = {
        r.doc_id
        for r in TX.hash_sample(docs, 0.2, seed=7).select("doc_id").collect()
    }
    assert other != s1  # a different seed is a different draw


def test_hash_split_fractions_and_stability(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s = TX.hash_split(docs)
    counts = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == docs.count()
    # 90/5/5 within generous tolerance at small n
    assert abs(counts.get("train", 0) / n - 0.9) < 0.06
    # stable under recomputation and subsetting: a doc's split never changes
    sub = TX.hash_split(docs.limit(50)).collect()
    full = {r.doc_id: r.split for r in s.collect()}
    assert all(full[r.doc_id] == r.split for r in sub)


def test_pack_documents_capacity_bound(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cap = 8000
    packed = TX.pack_documents(docs, capacity_chars=cap)
    per_bin = packed.groupBy("lang", "source", "pack_id").agg(
        F.sum("n_chars").alias("total"), F.max("n_chars").alias("biggest")
    )
    # streaming first-fit bound: bin total < capacity + its biggest doc
    bad = per_bin.where(F.col("total") >= cap + F.col("biggest")).count()
    assert bad == 0
    # bins are consecutive doc ranges: max doc of bin k < min doc of bin k+1
    import itertools
    rows = sorted(
        packed.collect(), key=lambda r: (r.lang, r.source, r.pack_id, r.doc_id)
    )
    for (lang, source), grp in itertools.groupby(rows, key=lambda r: (r.lang, r.source)):
        grp = list(grp)
        for a, b in zip(grp, grp[1:]):
            assert a.pack_id <= b.pack_id


def test_windowed_event_dedup_oracle_and_rule(spark, sf_dir):
    from tests.oracle_utils import compare, duck_con

    events = load_table(spark, sf_dir, "events")
    out = DD.windowed_event_dedup(events)
    con = duck_con(sf_dir)
    try:
        rep = compare(out, DD.sql_windowed_event_dedup(), con)
        assert rep["ok"], rep
    finally:
        con.close()
    # the rule itself: one event per (user, type, hour bucket)
    dup = (
        out.groupBy("user_id", "event_type", "bucket_us")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_simhash_raises_on_token_overflow(spark):
    """A document with more tokens than the 20-bit packed counters can
    count (2^20 - 1) must FAIL LOUDLY, never produce a silently
    corrupted fingerprint (the packed-aggregation capacity contract)."""
    n_over = (1 << 20) + 1  # one past capacity
    big = "x " * n_over
    df = spark.createDataFrame(
        [(1, big), (2, "a normal small document")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="more than .* tokens"):
        DD.simhash(df).collect()


def test_simhash_ok_just_under_token_cap(spark):
    """2^20 - 1 tokens is exactly representable — no false positive from
    the guard, and the fingerprint of an all-identical-token doc equals
    the token's own hash bits (majority of n identical votes)."""
    n_ok = (1 << 20) - 1
    df = spark.createDataFrame([(1, "x " * n_ok)], "doc_id long, text string")
    row = DD.simhash(df).collect()[0]
    one = DD.simhash(
        spark.createDataFrame([(1, "x")], "doc_id long, text string")
    ).collect()[0]
    assert (row.simhash_hi, row.simhash_lo) == (one.simhash_hi, one.simhash_lo)


def test_repetition_stats_flags_repetitive_docs(spark):
    """A document that repeats one phrase must flag; varied text must
    not; degenerate inputs (empty, single token) get 0.0 fractions."""
    from spark_indexedrdd_spark.functions.text import repetition_stats

    rows = [
        (1, "buy now " * 50),                       # one bigram forever
        (2, "the quick brown fox jumps over a lazy dog near the river"),
        (3, ""),
        (4, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[1].repetition_flag and out[1].dup_bigram_frac > 0.9
    assert not out[2].repetition_flag
    assert out[3].dup_bigram_frac == 0.0 and out[3].n_tokens == 0
    assert out[4].dup_bigram_frac == 0.0 and not out[4].repetition_flag


def test_domain_cap_sample_caps_and_is_stable(spark):
    """No domain exceeds the cap; the kept set is identical across
    repartitionings (hash order is data-derived, not partition-derived)."""
    from spark_indexedrdd_spark.functions.text import domain_cap_sample

    rows = [(i, f"src{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = domain_cap_sample(df, cap=10).collect()
    per = {}
    for r in kept:
        per.setdefault(r.domain, []).append(r.doc_id)
    assert all(len(v) <= 10 for v in per.values()) and len(per) == 3
    kept2 = domain_cap_sample(df.repartition(7), cap=10).collect()
    assert {(r.domain, r.doc_id) for r in kept} == {
        (r.domain, r.doc_id) for r in kept2
    }


def test_temperature_sample_flattens_language_mix(spark):
    """alpha<1 must upweight the rare language relative to proportional
    sampling, total kept ≈ budget, and membership is repartition-stable."""
    from spark_indexedrdd_spark.functions.text import temperature_sample

    rows = [(i, "en") for i in range(900)] + [(900 + i, "yo") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, alpha=0.3, budget_frac=0.5).collect()
    by = {}
    for r in kept:
        by[r.lang] = by.get(r.lang, 0) + 1
    # proportional would keep ~50 'yo' docs; temperature must keep more
    assert by.get("yo", 0) > 60, by
    assert 0.35 * 1000 < len(kept) < 0.65 * 1000
    kept2 = temperature_sample(df.repartition(5), alpha=0.3, budget_frac=0.5).collect()
    assert {r.doc_id for r in kept} == {r.doc_id for r in kept2}


def test_weighted_sample_prefers_heavy_weights(spark):
    """Efraimidis-Spirakis: heavy-weight rows dominate the sample;
    size is exactly k; membership is repartition-stable; weight<=0 rows
    can never appear."""
    from spark_indexedrdd_spark.functions.text import weighted_sample

    rows = [(i, 1.0) for i in range(500)] + [(500 + i, 100.0) for i in range(500)]
    rows += [(2000, 0.0), (2001, -5.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = weighted_sample(df, k=100, weight_col="w").collect()
    assert len(kept) == 100
    heavy = sum(1 for r in kept if r.weight == 100.0)
    assert heavy > 85, heavy
    assert all(r.weight > 0 for r in kept)
    kept2 = weighted_sample(df.repartition(9), k=100, weight_col="w").collect()
    assert {r.doc_id for r in kept} == {r.doc_id for r in kept2}


def test_duplicate_spans_planted_corpus(spark):
    """Exact-substring span semantics on a planted corpus: a 10-token
    span shared by two documents is duplicated in BOTH (corpus count
    >= 2), a within-document repeat counts against itself, unique text
    reports zero, and sub-width docs get (0, 0, 0.0)."""
    from spark_indexedrdd_spark.functions.text import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, shared + " one two three"),           # shares the span with 2
        (2, "x y " + shared),                      # same 10-token span
        (3, shared + " " + shared),                # self-repeat, no partner
        (4, "totally unique words with no overlap at all here today now"),
        (5, "too short"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in duplicate_spans(df, width=10).collect()}
    # doc1: 4 spans (13 tokens), the first is the shared span
    assert out[1].n_spans == 4 and out[1].n_dup_spans >= 1
    assert out[2].n_dup_spans >= 1
    # doc3 repeats the span within itself: its two copies both count
    assert out[3].n_dup_spans >= 2
    assert out[4].n_dup_spans == 0 and out[4].dup_span_frac == 0.0
    assert out[5].n_spans == 0 and out[5].dup_span_frac == 0.0
    assert out[6].n_spans == 0 and out[6].dup_span_frac == 0.0
    # fraction is occurrences-based
    assert out[1].dup_span_frac == out[1].n_dup_spans / out[1].n_spans


def test_duplicate_spans_stride_reduces_spans(spark):
    """stride=width produces the non-overlapping tiling: span count is
    ~n/width instead of n-width+1 — the documented 100 TB cost knob —
    and duplicated spans are still caught when aligned."""
    from spark_indexedrdd_spark.functions.text import duplicate_spans

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    dense = {r.doc_id: r for r in duplicate_spans(df, width=10).collect()}
    tiled = {
        r.doc_id: r
        for r in duplicate_spans(df, width=10, stride=10).collect()
    }
    assert dense[1].n_spans == 91
    assert tiled[1].n_spans == 10
    # identical docs: everything is duplicated under either stride
    assert dense[1].dup_span_frac == 1.0 and tiled[1].dup_span_frac == 1.0


def test_remove_duplicate_spans_canonical_rule(spark):
    """Removal semantics: the lexicographically-smallest (doc, pos)
    occurrence of a duplicated span survives; every other occurrence's
    tokens are deleted; unique text is untouched; a within-document
    repeat keeps its first copy."""
    from spark_indexedrdd_spark.functions.text import remove_duplicate_spans

    span = "a1 a2 a3 a4 a5"
    self_span = "b1 b2 b3 b4 b5"
    rows = [
        (1, span + " tail1 tail2"),            # canonical (smallest doc_id)
        (2, "head1 head2 " + span),            # later doc: span removed
        (3, span + " mid " + span),            # both copies non-canonical
        (4, "u1 u2 u3 u4 u5 u6 u7"),           # untouched
        (5, self_span + " mid2 " + self_span), # within-doc: 1st copy IS
                                               # canonical, 2nd removed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r for r in remove_duplicate_spans(df, width=5).collect()
    }
    assert out[1].n_removed == 0 and out[1].clean_text == span + " tail1 tail2"
    assert out[2].n_removed == 5 and out[2].clean_text == "head1 head2"
    # doc3's canonical lives in doc1, so BOTH of doc3's copies go
    assert out[3].n_removed == 10 and out[3].clean_text == "mid"
    assert out[4].n_removed == 0 and out[4].clean_text == rows[3][1]
    assert out[5].n_removed == 5
    assert out[5].clean_text == self_span + " mid2"


def test_remove_duplicate_spans_full_removal_empty_text(spark):
    """A document that is entirely a copy of an earlier one collapses
    to empty clean_text (n_removed == n_tokens) — and overlapping
    duplicated windows never double-count a token."""
    from spark_indexedrdd_spark.functions.text import remove_duplicate_spans

    text = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r for r in remove_duplicate_spans(df, width=5).collect()
    }
    assert out[1].n_removed == 0 and out[1].clean_text == text
    assert out[2].n_removed == 12 and out[2].clean_text == ""


def test_corpus_span_stats_exact_and_approx(spark, sf_dir):
    """The exact form matches a hand-computable planted corpus; the HLL
    approx form lands within 3×rsd of the exact distinct count on real
    testdata (deterministic: Spark's HLL++ has no run-to-run
    randomness), with the same n_spans."""
    from spark_indexedrdd_spark.functions.text import corpus_span_stats

    text = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    row = corpus_span_stats(df, width=5).collect()[0]
    # 8 spans per doc, every span occurs twice
    assert (row.n_spans, row.n_distinct_spans) == (16, 8)
    assert row.dup_rate == 0.5

    docs = load_table(spark, sf_dir, "documents")
    exact = corpus_span_stats(docs).collect()[0]
    approx = corpus_span_stats(docs, approx=True, rsd=0.02).collect()[0]
    assert approx.n_spans == exact.n_spans
    rel = abs(approx.n_distinct_spans - exact.n_distinct_spans) / max(
        1, exact.n_distinct_spans
    )
    assert rel <= 0.06, rel


def test_corpus_span_report_folds_duplicate_spans(spark, sf_dir):
    """The r13 consolidation pin (r12 VERDICT item 4): the contract's
    corpus_span_stats entry now serves corpus_span_report, whose
    n_dup_spans / n_docs_with_dups columns must equal the direct
    corpus aggregate of duplicate_spans' per-document output, and
    whose first three columns must equal corpus_span_stats verbatim —
    so the one hash-checked entry pins BOTH span pipelines."""
    import pyspark.sql.functions as F

    from spark_indexedrdd_spark.functions.text import (
        corpus_span_report,
        corpus_span_stats,
        duplicate_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    rep = corpus_span_report(docs).collect()[0]
    stats = corpus_span_stats(docs).collect()[0]
    per_doc = duplicate_spans(docs)
    fold = per_doc.agg(
        F.sum("n_dup_spans").alias("nd"),
        F.sum(F.when(F.col("n_dup_spans") > 0, 1).otherwise(0)).alias("dd"),
        F.sum("n_spans").alias("ns"),
    ).collect()[0]
    assert (rep.n_spans, rep.n_distinct_spans, rep.dup_rate) == (
        stats.n_spans, stats.n_distinct_spans, stats.dup_rate,
    )
    assert rep.n_dup_spans == fold.nd
    assert rep.n_docs_with_dups == fold.dd
    # structural consistency between the two constituent pipelines:
    # both explode the identical md5 span hashes
    assert rep.n_spans == fold.ns


def test_corpus_span_report_twin_matches_on_empty_corpus(spark, sf_dir):
    """r13 ADVICE: the twin's fold CTE used to yield NULL (not 0) for
    n_dup_spans / n_docs_with_dups on an EMPTY corpus while the Spark
    side coalesces both to 0 — a hash-check over an empty table would
    mismatch. Both sides must now agree bit-for-bit on empty input."""
    import os

    import duckdb

    from spark_indexedrdd_spark.functions.text import (
        corpus_span_report,
        sql_corpus_span_report,
    )

    docs = load_table(spark, sf_dir, "documents").limit(0)
    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet")
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{path}' WHERE 1 = 0"
    )
    report = compare(corpus_span_report(docs), sql_corpus_span_report(), con)
    con.close()
    assert report["ok"], report


def test_compact_store_preserves_rows_and_shrinks_files(spark, tmp_path):
    """Compaction after many appends: identical row set, far fewer
    files, and the store path stays valid for the incremental reader."""
    import glob

    from spark_indexedrdd_spark.functions.dedup import (
        append_signature_batch,
        compact_store,
        incremental_lsh_candidates_from_store,
        write_signature_store,
    )

    store = str(tmp_path / "sig")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    corpus = spark.createDataFrame([(1, base)], "doc_id long, text string")
    write_signature_store(corpus, store)
    for i in range(2, 8):
        append_signature_batch(
            spark.createDataFrame(
                [(i, f"batch {i} words " + base)], "doc_id long, text string"
            ),
            store,
        )
    before = spark.read.parquet(store).sort("doc_id").collect()
    n_files_before = len(glob.glob(f"{store}/*.parquet"))
    compact_store(spark, store, num_partitions=1)
    after = spark.read.parquet(store).sort("doc_id").collect()
    n_files_after = len(glob.glob(f"{store}/*.parquet"))
    assert after == before
    assert n_files_after < n_files_before and n_files_after == 1
    # reader still works against the compacted store
    probe = spark.createDataFrame([(100, base)], "doc_id long, text string")
    got = {r.doc_b for r in
           incremental_lsh_candidates_from_store(probe, store).collect()}
    assert 1 in got


def test_training_shards_layout_and_determinism(spark, sf_dir, tmp_path):
    """Serving layout contract: every row lands in the shard its hash
    dictates (repartition-stable), each shard's files hold rows in
    order_key order, the manifest matches the data, and a new seed is a
    different permutation without moving the same doc set."""
    from spark_indexedrdd_spark.functions.shards import (
        read_training_shard,
        training_order,
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = {(r.doc_id, r.order_key, r.shard_id)
         for r in training_order(docs).collect()}
    b = {(r.doc_id, r.order_key, r.shard_id)
         for r in training_order(docs.repartition(7)).collect()}
    assert a == b  # physical layout cannot change the permutation
    e2 = {r.doc_id: r.order_key for r in training_order(docs, seed=43).collect()}
    e1 = {r.doc_id: r.order_key for r in training_order(docs, seed=42).collect()}
    assert e1.keys() == e2.keys() and e1 != e2  # new epoch, same corpus

    path = str(tmp_path / "serving")
    write_training_shards(docs, path, n_shards=4)
    man = {r.shard_id: r for r in
           spark.read.parquet(path + "/_manifest").collect()}
    total = 0
    for sid in range(4):
        rows = read_training_shard(spark, path, sid).collect()
        total += len(rows)
        assert len(rows) == man[sid].n_rows
        keys = [r.order_key for r in rows]
        assert keys == sorted(keys)  # reader restores training order
        assert keys[0] == man[sid].min_order_key
        assert keys[-1] == man[sid].max_order_key
    assert total == docs.count()

    # layout contract for NON-Spark trainers: every file is internally
    # ordered, and name-sorted files concatenate to the shard's order
    import glob

    for sid in range(4):
        files = sorted(glob.glob(f"{path}/shards/shard_id={sid}/*.parquet"))
        concat = []
        for f in files:
            ks = [r.order_key for r in spark.read.parquet(f).collect()]
            assert ks == sorted(ks), f  # per-file order
            concat += ks
        assert concat == sorted(concat), sid  # file-name order = global
