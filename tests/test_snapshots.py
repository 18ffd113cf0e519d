"""Named multi-store snapshot pins (functions/snapshots.py): one
durable name captures the whole retrieval stack's committed versions,
serves at the pin are byte-stable across later ingest on EVERY store,
and retention passing any pinned store fails the whole pin loudly."""

import os

import pytest

from spark_indexedrdd_spark.functions import retrieval as R
from spark_indexedrdd_spark.functions import snapshots as SNAP
from spark_indexedrdd_spark.functions import store_commit as SC
from spark_indexedrdd_spark.functions.hybrid import hybrid_rrf_from_stores
from spark_indexedrdd_spark.functions.ivf import (
    append_ivf_batch,
    optimize_ivf_store,
    write_ivf_store,
)
from spark_indexedrdd_spark.sources.tables import load_table

# (qid, lexical query text, dense query vec_id) — hybrid.HYBRID_QUERIES shape
QUERIES = ((1, "the quick data", 10), (2, "data quality", 20))


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def stack(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    post = str(tmp_path / "postings")
    ivf = str(tmp_path / "ivf")
    R.write_postings_store(docs.where("doc_id < 400"), post, n_buckets=32)
    write_ivf_store(
        emb.where("vec_id < 400"), ivf, n_clusters=8, method="det"
    )
    return docs, emb, post, ivf, str(tmp_path / "tags")


def _serve(spark, post, ivf, versions=None):
    v = versions or {}
    return hybrid_rrf_from_stores(
        spark, post, ivf, queries=QUERIES, k=5, k_branch=10, n_probe=8,
        postings_version=v.get("lexical"), ivf_version=v.get("dense"),
    )


def test_pin_survives_ingest_on_both_stores(spark, stack):
    docs, emb, post, ivf, tags = stack
    before = _rows(_serve(spark, post, ivf))
    pin = SNAP.pin_stores(tags, "run-1", {"lexical": post, "dense": ivf})
    # ingest on BOTH stores moves the live serve...
    R.append_postings_batch(docs.where("doc_id >= 400"), post, batch_tag="b1")
    append_ivf_batch(emb.where("vec_id >= 400"), ivf, batch_tag="b1")
    live = _rows(_serve(spark, post, ivf))
    assert live != before
    # ...but the pin re-serves the run's exact corpus
    v = SNAP.pin_versions(SNAP.read_pin(tags, "run-1"))
    assert v == {k: r["version"] for k, r in pin.items()}
    assert _rows(_serve(spark, post, ivf, v)) == before


def test_pin_is_immutable(spark, stack):
    _docs, _emb, post, ivf, tags = stack
    SNAP.pin_stores(tags, "run-1", {"lexical": post})
    with pytest.raises(ValueError, match="immutable"):
        SNAP.pin_stores(tags, "run-1", {"lexical": post, "dense": ivf})
    # the original pin is untouched
    assert set(SNAP.read_pin(tags, "run-1")) == {"lexical"}


def test_retention_past_any_store_fails_the_whole_pin(spark, stack):
    docs, emb, post, ivf, tags = stack
    pin = SNAP.pin_stores(tags, "run-1", {"lexical": post, "dense": ivf})
    # age ONLY the dense store past the pin: append, optimize, vacuum
    append_ivf_batch(emb.where("vec_id >= 400"), ivf, batch_tag="b1")
    optimize_ivf_store(spark, ivf)
    SC.vacuum_store(ivf, keep_versions=1)
    with pytest.raises(ValueError, match="dense"):
        SNAP.pin_versions(pin)
    # all-or-nothing: the intact lexical store does not make it pass
    with pytest.raises(ValueError, match="no longer servable"):
        SNAP.assert_pin_servable(pin)


def test_unversioned_store_refuses_at_pin_time(spark, stack, tmp_path):
    import json

    _docs, _emb, post, _ivf, tags = stack
    legacy = str(tmp_path / "legacy")
    os.makedirs(legacy)
    with open(os.path.join(legacy, "meta.json"), "w") as fh:
        json.dump({"n_docs": 0}, fh)  # pre-ledger marker, no version
    with pytest.raises(ValueError, match="ledger"):
        SNAP.pin_stores(tags, "run-2", {"lexical": post, "old": legacy})
    # nothing half-written
    assert not os.path.exists(os.path.join(tags, "run-2.json"))


def test_contract_hybrid_pinned_serve_matches_oracle(spark, sf_dir):
    """The r12 hatch entry (PAST_CUTOFF_NEW — obliges the r13 window):
    pin both retrieval stores, ingest the held-out fifth into both,
    serve through pin_versions — must equal the DuckDB hybrid-RRF twin
    over the BASE corpus only. This is the pin machinery's first
    oracle-checked composition; the driver hash-checks the same pair
    when the entry rotates in."""
    import duckdb

    import __spark_entry__ as E
    from oracle_utils import compare

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    rep = compare(
        E.queries()["hybrid_pinned_serve"](spark, sf_dir),
        E.oracle_sql()["hybrid_pinned_serve"],
        con,
    )
    con.close()
    assert rep["ok"], rep


def test_pin_protection_is_path_spelling_independent(spark, stack):
    """Regression (r11 ADVICE): pins used to match stores by RAW path
    string, so a pin recorded via one spelling (relative, trailing
    slash, symlink) silently failed to protect a vacuum addressed via
    another — and the pin only refused later, after the bytes were
    gone. Every spelling of the same store must hit the same
    protection entry."""
    docs, emb, post, ivf, tags = stack
    before = _rows(_serve(spark, post, ivf))
    # pin via symlink + trailing slash; vacuum via the real path
    link = os.path.join(os.path.dirname(ivf), "ivf-link")
    os.symlink(ivf, link)
    SNAP.pin_stores(tags, "run-1", {"lexical": post, "dense": link + "/"})
    assert SNAP.min_pinned_versions(tags).get(os.path.realpath(ivf)) is not None
    append_ivf_batch(emb.where("vec_id >= 400"), ivf, batch_tag="b1")
    optimize_ivf_store(spark, ivf)
    SNAP.vacuum_respecting_pins(tags, ivf, keep_versions=1)
    v = SNAP.pin_versions(SNAP.read_pin(tags, "run-1"))
    assert _rows(_serve(spark, post, ivf, v)) == before
    # pre-r12 pins (raw caller spelling on disk) are canonicalized on
    # READ too: a hand-written legacy pin file still protects
    import json

    legacy_rel = os.path.relpath(ivf)
    with open(os.path.join(tags, "legacy.json"), "w") as fh:
        json.dump({"dense": {"path": legacy_rel, "version": v["dense"]}}, fh)
    assert (
        SNAP.min_pinned_versions(tags)[os.path.realpath(ivf)] == v["dense"]
    )


def test_vacuum_respecting_pins_protects_then_reclaims(spark, stack):
    """Routine retention must not break a held pin: the floor caps at
    the oldest pinned version, the pinned serve stays byte-identical,
    and retiring the pin (deleting the tag file) lets the next vacuum
    pass reclaim it."""
    from spark_indexedrdd_spark.functions.ivf import optimize_ivf_store

    docs, emb, post, ivf, tags = stack
    before = _rows(_serve(spark, post, ivf))
    pinned = SNAP.pin_stores(tags, "run-1", {"lexical": post, "dense": ivf})
    append_ivf_batch(emb.where("vec_id >= 400"), ivf, batch_tag="b1")
    optimize_ivf_store(spark, ivf)
    # pin-aware vacuum: floor caps at the pinned version — nothing of
    # the pinned snapshot is reclaimed, the pin still serves, and the
    # report NAMES the retention blocker (r12 VERDICT item 5)
    rep0 = SNAP.vacuum_respecting_pins(tags, ivf, keep_versions=1)
    assert rep0["protected_by"] == "run-1"
    assert rep0["protect_version"] == pinned["dense"]["version"]
    assert rep0["floor"] <= pinned["dense"]["version"]
    v = SNAP.pin_versions(SNAP.read_pin(tags, "run-1"))
    assert _rows(_serve(spark, post, ivf, v)) == before
    # retire the pin (the sanctioned spelling of deleting the tag
    # file) -> the next pass reclaims, reports NO blocker, and the
    # retired pin refuses at resolve time
    retired = SNAP.retire_pin(tags, "run-1")
    assert retired == pinned
    with pytest.raises(FileNotFoundError):
        SNAP.retire_pin(tags, "run-1")  # never a silent no-op
    rep = SNAP.vacuum_respecting_pins(tags, ivf, keep_versions=1)
    assert rep["removed_files"]
    assert "protected_by" not in rep and "protect_version" not in rep
    with pytest.raises(ValueError, match="no longer servable"):
        SNAP.pin_versions({"dense": {"path": ivf, "version": v["dense"]}})
