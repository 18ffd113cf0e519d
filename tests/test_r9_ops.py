"""Round-9 operators: perceptual hashing (dHash) + image near-dup.

The dHash recipe (grid -> adjacent-cell comparison -> 64-bit pack ->
pigeonhole-blocked Hamming pairs) is pinned three ways: against a
plain-Python reference of the identical arithmetic, against the DuckDB
oracle (exact, integer-only — the hash-green surface), and against an
all-pairs ground truth on synthetic payload families where near-dups
exist by construction."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import multimodal as M
from spark_indexedrdd_spark.sources.tables import load_table


def _py_dhash(payload: bytes) -> int:
    """Reference implementation — same integer arithmetic as dhash64."""
    n_cells = M.DHASH_ROWS * M.DHASH_COLS
    b = np.frombuffer(payload, dtype=np.uint8)
    n = len(b)
    g = np.zeros(n_cells, dtype=np.int64)
    if n:
        seg = (np.arange(n, dtype=np.int64) * n_cells) // n
        np.add.at(g, seg, b.astype(np.int64))
        cnt = np.bincount(seg, minlength=n_cells)
        nz = cnt > 0
        g[nz] = g[nz] // cnt[nz]
    h = 0
    for r in range(M.DHASH_ROWS):
        for c in range(M.DHASH_COLS - 1):
            if g[r * M.DHASH_COLS + c] > g[r * M.DHASH_COLS + c + 1]:
                h |= 1 << (r * (M.DHASH_COLS - 1) + c)
    return h - (1 << 64) if h >= 1 << 63 else h


def test_dhash_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_binary(docs)
    got = {r.doc_id: r.dhash for r in M.dhash64(media).collect()}
    want = {
        r.doc_id: _py_dhash(bytes(r.payload)) for r in media.collect()
    }
    assert got == want and len(got) > 0


def test_dhash_matches_duckdb_oracle(spark, sf_dir):
    """The hash-green surface: DuckDB recomputes the identical
    fingerprints from the text column (ASCII payloads: byte == ord)."""
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.doc_id, r.dhash)
        for r in M.dhash64(M.attach_binary(docs)).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.sql(M.sql_dhash64()).fetchall()))
    assert got == want


def test_near_dup_blocking_is_exact_vs_all_pairs(spark, sf_dir):
    """Pigeonhole blocking == all-pairs xor-popcount, at a threshold
    where the corpus yields candidates (byte-payload stand-ins sit
    farther apart than resized pixel grids would; the blocking is
    threshold-agnostic)."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.attach_binary(docs)
    mh = 16
    got = sorted(
        map(tuple, M.image_near_dup(media, max_hamming=mh).collect())
    )
    hashes = {r.doc_id: r.dhash for r in M.dhash64(media).collect()}
    ids = sorted(hashes)
    want = sorted(
        (a, b, bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= mh
    )
    assert got == want
    assert len(got) > 0  # the threshold genuinely exercises the join


def test_near_dup_finds_constructed_duplicates(spark):
    """Payload families with in-place byte edits (what re-encoded or
    slightly-retouched images look like to a pooled grid): each copy
    must pair with its original within a small Hamming distance, and
    unrelated families must NOT pair."""
    import random

    rng = random.Random(7)
    fams = []
    for f in range(6):
        base = bytes(rng.randrange(256) for _ in range(720))
        fams.append(base)
    rows = []
    for f, base in enumerate(fams):
        rows.append((f * 10, bytearray(base)))
        for c in (1, 2):
            tweaked = bytearray(base)
            for pos in range(c * 3):  # a few in-place byte edits
                tweaked[37 * (pos + 1)] ^= 0x05
            rows.append((f * 10 + c, tweaked))
    df = spark.createDataFrame(
        [(i, bytes(p), "image/fake", len(p)) for i, p in rows],
        "doc_id long, payload binary, mime string, byte_len long",
    )
    pairs = M.image_near_dup(df, max_hamming=8).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    for f in range(len(fams)):
        assert any(
            a // 10 == f and b // 10 == f for a, b in found
        ), f"family {f} produced no near-dup pair"
    assert all(a // 10 == b // 10 for a, b in found), (
        "unrelated families paired: " + str(found)
    )


def test_near_dup_plan_has_no_cartesian(spark, sf_dir):
    """The candidate join is an equi-join on (chunk_id, chunk_val) —
    never a cartesian/nested-loop product (the 100 TB requirement)."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        M.image_near_dup(M.attach_binary(docs), max_hamming=8)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_empty_and_tiny_payloads(spark):
    """Degenerate payloads: empty -> all-zero grid -> hash 0; payloads
    shorter than the cell count still hash deterministically (empty
    cells are 0, matching the oracle's COALESCE)."""
    df = spark.createDataFrame(
        [(0, b""), (1, b"a"), (2, b"ab" * 3)],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.dhash for r in M.dhash64(df).collect()}
    assert got[0] == 0
    assert got[1] == _py_dhash(b"a")
    assert got[2] == _py_dhash(b"ab" * 3)
