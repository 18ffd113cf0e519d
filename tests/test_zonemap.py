"""Zone-map file skipping: pruning actually skips files, results are
value-identical to a full-scan filter, commit marker fences crashed
rebuilds. (sources/zonemap.py — the at-rest range analog of the
reference's partition-pruned point lookups, PartitionPruningRDD usage
in IndexedRDD.scala:50-55.)"""

import os

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.sources.tables import load_table
from spark_indexedrdd_spark.sources.zonemap import (
    write_zonemap_table,
    zonemap_prune_files,
    zonemap_read,
)


@pytest.fixture(scope="module")
def li_store(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zm") / "lineitem_zm")
    li = load_table(spark, sf_dir, "lineitem")
    write_zonemap_table(li, path, "l_shipdate", n_files=16)
    return li, path


def test_pruning_skips_files_and_preserves_values(spark, li_store):
    li, path = li_store
    lo, hi = "1996-01-01", "1996-03-31"
    files, total = zonemap_prune_files(spark, path, lo, hi)
    assert total == 16
    # a one-quarter range over ~7 years of clustered dates must skip
    # most files — the property the clustering write exists for
    assert 0 < len(files) < total / 2
    got = zonemap_read(spark, path, lo, hi)
    want = li.where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi)
    )
    assert got.count() == want.count() > 0
    s = sorted(map(tuple, got.select("l_orderkey", "l_linenumber").collect()))
    w = sorted(map(tuple, want.select("l_orderkey", "l_linenumber").collect()))
    assert s == w


def test_open_bounds_and_empty_range(spark, li_store):
    li, path = li_store
    assert zonemap_read(spark, path).count() == li.count()  # no bounds
    hi_only = zonemap_read(spark, path, hi="1995-06-30")
    assert hi_only.count() == li.where("l_shipdate <= '1995-06-30'").count()
    # a range before every shipdate: zero files, empty frame, schema kept
    none = zonemap_read(spark, path, "1980-01-01", "1980-12-31")
    assert none.count() == 0
    assert none.columns == li.columns
    files, _ = zonemap_prune_files(spark, path, "1980-01-01", "1980-12-31")
    assert files == []


def test_numeric_zone_column(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_zm")
    o = load_table(spark, sf_dir, "orders")
    write_zonemap_table(o, path, "o_totalprice", n_files=8)
    got = zonemap_read(spark, path, 1000.0, 50000.0)
    want = o.where("o_totalprice BETWEEN 1000.0 AND 50000.0")
    assert got.count() == want.count() > 0
    files, total = zonemap_prune_files(spark, path, 1000.0, 5000.0)
    assert len(files) < total


def test_uncommitted_store_refused(spark, sf_dir, tmp_path):
    path = str(tmp_path / "zm")
    o = load_table(spark, sf_dir, "orders").limit(100)
    write_zonemap_table(o, path, "o_orderdate", n_files=2)
    os.remove(os.path.join(path, "meta.json"))  # crashed-rebuild shape
    with pytest.raises(FileNotFoundError):
        zonemap_read(spark, path, "1994-01-01", "1994-12-31")


def test_rebuild_replaces_stale_sidecar(spark, sf_dir, tmp_path):
    """A rebuild must leave sidecar and data consistent — per-file rows
    in the sidecar sum to the data row count."""
    path = str(tmp_path / "zm")
    o = load_table(spark, sf_dir, "orders")
    write_zonemap_table(o.where("o_orderkey % 2 = 0"), path, "o_orderdate", n_files=4)
    write_zonemap_table(o, path, "o_orderdate", n_files=4)
    stats = spark.read.parquet(path + "/zones")
    assert stats.agg(F.sum("n_rows")).collect()[0][0] == o.count()
    assert zonemap_read(spark, path).count() == o.count()


# --------------------- appends + streaming ingest --------------------- #


def test_append_batch_exact_and_pruned(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.sources.zonemap import (
        append_zonemap_batch,
        compact_zonemap_store,
    )

    li = load_table(spark, sf_dir, "lineitem")
    base = li.where("l_orderkey % 3 != 0")
    batch = li.where("l_orderkey % 3 = 0")
    path = str(tmp_path / "zm_append")
    write_zonemap_table(base, path, "l_shipdate", n_files=8)
    assert append_zonemap_batch(batch, path, batch_tag="b1", n_files=4)
    lo, hi = "1996-01-01", "1996-03-31"
    got = zonemap_read(spark, path, lo, hi)
    want = li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi))
    assert got.count() == want.count() > 0
    # pruning still skips files (batch adds at most its own overlap)
    files, total = zonemap_prune_files(spark, path, lo, hi)
    assert total == 12 and len(files) < total
    # replay of a committed tag is a no-op
    assert not append_zonemap_batch(batch, path, batch_tag="b1")
    assert zonemap_read(spark, path, lo, hi).count() == want.count()
    # compaction re-clusters without changing values; replay still no-op
    compact_zonemap_store(spark, path)
    assert zonemap_read(spark, path, lo, hi).count() == want.count()
    assert not append_zonemap_batch(batch, path, batch_tag="b1")


def test_reserved_prefixes_scope_to_the_minting_family(spark, sf_dir, tmp_path):
    """Regression (r11 ADVICE): the r11 blanket refusal applied every
    family's internal prefixes to every store, so a pre-r11 zonemap
    store whose caller tagged batches 'vec-2024' started refusing
    appends on upgrade — crashing a restarted streaming query
    mid-ledger. Scoped check: a family refuses only prefixes IT mints
    (zonemap: anon-/optimize-), so the sidecar-twin prefixes of OTHER
    families stay ordinary caller tags here."""
    import pytest

    from spark_indexedrdd_spark.sources.zonemap import append_zonemap_batch

    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "zm_prefix")
    write_zonemap_table(
        li.where("l_orderkey % 3 != 0"), path, "l_shipdate", n_files=4
    )
    batch = li.where("l_orderkey % 3 = 0")
    # other families' internal prefixes are legal caller tags here...
    assert append_zonemap_batch(
        batch.where("l_linenumber = 1"), path, batch_tag="vec-2024"
    )
    assert append_zonemap_batch(
        batch.where("l_linenumber = 2"), path, batch_tag="dl-2024"
    )
    # ...and replay stays exactly-once under them
    assert not append_zonemap_batch(
        batch.where("l_linenumber = 1"), path, batch_tag="vec-2024"
    )
    # the prefixes zonemap itself mints still refuse loudly
    for tag in ("anon-00001", "optimize-1"):
        with pytest.raises(ValueError, match="reserved prefix"):
            append_zonemap_batch(batch, path, batch_tag=tag)
    want = li.where(
        "l_orderkey % 3 != 0 OR (l_orderkey % 3 = 0 AND l_linenumber <= 2)"
    ).count()
    assert zonemap_read(spark, path).count() == want


def test_crashed_append_invisible_then_replay_exact(spark, sf_dir, tmp_path):
    import glob
    import shutil as sh

    from spark_indexedrdd_spark.sources.zonemap import append_zonemap_batch

    li = load_table(spark, sf_dir, "lineitem")
    base = li.where("l_orderkey % 3 != 0")
    batch = li.where("l_orderkey % 3 = 0")
    path = str(tmp_path / "zm_crash")
    write_zonemap_table(base, path, "l_shipdate", n_files=8)
    n_before = zonemap_read(spark, path).count()
    # simulate a crash AFTER the batch's file publish + sidecar write
    # but BEFORE the meta commit: stray data + unmanifested zones files
    a_data = glob.glob(os.path.join(path, "data", "*.parquet"))[0]
    sh.copy(a_data, os.path.join(path, "data", "batch-b1-00099.parquet"))
    a_zone = glob.glob(os.path.join(path, "zones", "*.parquet"))[0]
    sh.copy(a_zone, os.path.join(path, "zones", "part-stray.parquet"))
    # readers resolve the sidecar via committed manifests only — the
    # stray files are invisible (reads see exactly the pre-append store)
    assert zonemap_read(spark, path).count() == n_before
    # the replay sweeps the half-published tag files and lands exactly
    assert append_zonemap_batch(batch, path, batch_tag="b1")
    assert (
        zonemap_read(spark, path).count() == base.count() + batch.count()
    )


def test_streaming_zonemap_ingest_replay_noop(spark, sf_dir, tmp_path):
    from spark_indexedrdd_spark.sources.zonemap import (
        StreamingZonemapIngest,
        zonemap_read,
    )

    li = load_table(spark, sf_dir, "lineitem")
    b0 = li.where("l_orderkey % 2 = 0")
    b1 = li.where("l_orderkey % 2 = 1")
    path = str(tmp_path / "zm_stream")
    st = StreamingZonemapIngest(path, "l_shipdate", n_files=4)
    st.foreach_batch(b0, 0)
    st.foreach_batch(b1, 1)
    assert zonemap_read(spark, path).count() == li.count()
    # a restarted query re-delivers batch 1: committed tag → no-op
    st2 = StreamingZonemapIngest(path, "l_shipdate", n_files=4)
    st2.foreach_batch(b1, 1)
    assert zonemap_read(spark, path).count() == li.count()


# ---------------- commit-protocol model (property) --------------------- #

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


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
def test_zonemap_commit_protocol_model(spark, sf_dir, ops):
    """Property over delivery histories (postings model, zonemap form):
    for ANY sequence of clean commits, crash-after-publish replays, and
    duplicate redeliveries, the served table equals a one-shot build
    over exactly the applied batches."""
    import shutil
    import tempfile

    from spark_indexedrdd_spark.sources.zonemap import append_zonemap_batch

    li = load_table(spark, sf_dir, "lineitem")
    root = tempfile.mkdtemp(prefix="zmmodel_")
    try:
        p = os.path.join(root, "store")
        write_zonemap_table(li.where("l_orderkey % 7 = 0"), p,
                            "l_shipdate", n_files=4)
        for i, op in enumerate(ops):
            batch = li.where(f"l_orderkey % 7 = {i + 1}")
            tag = f"t{i}"
            if op == "clean":
                assert append_zonemap_batch(batch, p, batch_tag=tag)
            elif op == "crash_replay":
                with open(os.path.join(p, "meta.json")) as fh:
                    pre = fh.read()
                assert append_zonemap_batch(batch, p, batch_tag=tag)
                with open(os.path.join(p, "meta.json"), "w") as fh:
                    fh.write(pre)  # crash: publish done, commit rewound
                assert append_zonemap_batch(batch, p, batch_tag=tag)
            else:
                assert append_zonemap_batch(batch, p, batch_tag=tag)
                assert append_zonemap_batch(batch, p, batch_tag=tag) is False
        want = li.where(f"l_orderkey % 7 <= {len(ops)}")
        lo, hi = "1995-01-01", "1996-12-31"
        got_n = zonemap_read(spark, p, lo, hi).count()
        want_n = want.where(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi)
        ).count()
        assert got_n == want_n > 0
        assert zonemap_read(spark, p).count() == want.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_real_stream_ingest_equals_one_shot(spark, sf_dir, tmp_path):
    """True readStream→attach ingest (checkpointed, availableNow)
    produces a store value-identical to a one-shot build."""
    import tempfile

    from spark_indexedrdd_spark.sources.zonemap import StreamingZonemapIngest

    li = load_table(spark, sf_dir, "lineitem").limit(2000)
    src = str(tmp_path / "zm_src")
    # several source files → several micro-batches at maxFilesPerTrigger=1
    li.repartition(3).write.parquet(src)
    store = str(tmp_path / "zm_stream_store")
    st = StreamingZonemapIngest(store, "l_shipdate", n_files=4)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = st.attach(stream, tempfile.mkdtemp(prefix="zmckpt_"), availableNow=True)
    q.awaitTermination(120)
    got = zonemap_read(spark, store).count()
    assert got == spark.read.parquet(src).count() > 0


def test_legacy_flat_store_tagged_replay_backfill_not_doubled(
    spark, sf_dir, tmp_path
):
    """Crash replay against a PRE-MANIFEST flat store: the legacy
    'base' sidecar backfill must not list the crashed attempt's
    published batch-<tag>-* zone files — the deterministic republish
    puts the same names into the tag's own manifest, and a double
    listing makes every batch data file read twice (doubled rows)."""
    import json
    import shutil as sh

    from spark_indexedrdd_spark.sources.zonemap import append_zonemap_batch

    li = load_table(spark, sf_dir, "lineitem")
    base = li.where("l_orderkey % 3 != 0")
    batch = li.where("l_orderkey % 3 = 0")
    path = str(tmp_path / "zm_legacy")
    write_zonemap_table(base, path, "l_shipdate", n_files=8)
    meta_p = os.path.join(path, "meta.json")
    m = json.load(open(meta_p))
    m.pop("manifests")
    legacy = json.dumps(m)
    with open(meta_p, "w") as fh:
        fh.write(legacy)
    sh.rmtree(os.path.join(path, "_manifests"))
    assert append_zonemap_batch(batch, path, batch_tag="b1", n_files=4)
    with open(meta_p, "w") as fh:  # crash rewind; published files stay
        fh.write(legacy)
    assert append_zonemap_batch(batch, path, batch_tag="b1", n_files=4)
    assert zonemap_read(spark, path).count() == base.count() + batch.count()


def test_optimize_preserves_snapshots_and_retightens(spark, sf_dir, tmp_path):
    """Snapshot-preserving OPTIMIZE (r11): global re-cluster folds
    batch files and re-tightens zone overlap WITHOUT moving the
    servability floor — pre-optimize as-of reads stay byte-identical
    until vacuum reclaims them."""
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.sources.zonemap import (
        append_zonemap_batch,
        optimize_zonemap_store,
    )

    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "zm_opt")
    write_zonemap_table(li.where("l_orderkey % 3 = 1"), path,
                        "l_shipdate", n_files=8)
    append_zonemap_batch(li.where("l_orderkey % 3 = 2"), path,
                         batch_tag="b1", n_files=8)
    v_pre = SC.read_meta(path)["version"]
    append_zonemap_batch(li.where("l_orderkey % 3 = 0"), path,
                         batch_tag="b2", n_files=8)
    lo, hi = "1996-01-01", "1996-03-31"
    want = li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi))
    pre_rows = sorted(map(tuple, zonemap_read(
        spark, path, lo, hi, version=v_pre).collect()))
    _f, total_before = zonemap_prune_files(spark, path, lo, hi)
    files_before = len(_f)
    n_after = optimize_zonemap_store(spark, path, n_files=8)
    assert n_after == 8 < total_before == 24
    # live reads identical; overlap re-tightened to the build's
    assert zonemap_read(spark, path, lo, hi).count() == want.count() > 0
    f_after, total_after = zonemap_prune_files(spark, path, lo, hi)
    assert total_after == 8 and len(f_after) <= files_before
    assert len(f_after) < total_after  # still prunes
    # the pre-optimize snapshot serves byte-identically (floor unmoved)
    assert sorted(map(tuple, zonemap_read(
        spark, path, lo, hi, version=v_pre).collect())) == pre_rows
    # replay of a pre-optimize tag is still a no-op
    assert not append_zonemap_batch(
        li.where("l_orderkey % 3 = 0"), path, batch_tag="b2")
    # vacuum reclaims the pre-optimize data files and fences the as-of
    rep = SC.vacuum_store(path, keep_versions=1, spark=spark)
    assert any(r.startswith("data/") for r in rep["removed_files"])
    with pytest.raises(ValueError, match="floor|rewrit"):
        zonemap_read(spark, path, lo, hi, version=v_pre)
    assert zonemap_read(spark, path, lo, hi).count() == want.count()


def test_post_optimize_untagged_append_never_reuses_retired_anon_name(
    spark, sf_dir, tmp_path
):
    """r11 review finding: after an optimize collapses the live
    manifest list, the next untagged append's anon name must skip the
    RETIRED names too — reusing one would overwrite a manifest that
    retained pre-optimize snapshots still resolve."""
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.sources.zonemap import (
        append_zonemap_batch,
        optimize_zonemap_store,
    )

    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "zm_anon")
    write_zonemap_table(li.where("l_orderkey % 3 = 1"), path,
                        "l_shipdate", n_files=4)
    # untagged append mints anon-00001
    append_zonemap_batch(li.where("l_orderkey % 3 = 2"), path, n_files=4)
    assert "anon-00001" in SC.read_meta(path)["manifests"]
    v_pre = SC.read_meta(path)["version"]
    lo, hi = "1996-01-01", "1996-03-31"
    pre_rows = sorted(map(tuple, zonemap_read(
        spark, path, lo, hi, version=v_pre).collect()))
    optimize_zonemap_store(spark, path, n_files=4)
    # the next untagged append must NOT re-mint anon-00001
    append_zonemap_batch(li.where("l_orderkey % 3 = 0"), path, n_files=4)
    meta = SC.read_meta(path)
    assert "anon-00001" in meta["retired_manifests"]
    assert "anon-00001" not in meta["manifests"]
    # the retained pre-optimize snapshot still serves byte-identically
    assert sorted(map(tuple, zonemap_read(
        spark, path, lo, hi, version=v_pre).collect())) == pre_rows
    # and a tagged append colliding with a retired name refuses
    with pytest.raises(ValueError, match="collides"):
        append_zonemap_batch(
            li.where("l_orderkey % 3 = 0"), path, batch_tag="base")
