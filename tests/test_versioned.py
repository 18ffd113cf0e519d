"""Persisted multi-version KV store (sources/versioned.py): version
isolation across commits, fold == live-operator equivalence, compaction
transparency, and cross-"session" reopen."""

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.core import SUM_MERGE, IndexedDataFrame
from spark_indexedrdd_spark.sources.versioned import VersionedKVStore


@pytest.fixture()
def store(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, v double"
    )
    idf = IndexedDataFrame.from_unique(base, "k", num_partitions=8, cache=False)
    return VersionedKVStore.init(idf, str(tmp_path / "vstore"))


def _as_dict(idf):
    return {r.k: r.v for r in idf.df.collect()}


def test_versions_coexist_and_are_isolated(store, spark):
    """The reference README demo (README.md:29-45): commit new versions,
    old ones keep answering with their own contents."""
    ups = spark.createDataFrame([(1, 100.0), (200, 1.5)], "k long, v double")
    v1 = store.commit_puts(ups)                       # overwrite
    v2 = store.commit_deletes(
        spark.createDataFrame([(2,), (999,)], "k long")
    )
    d0, d1, d2 = (_as_dict(store.read(v)) for v in (0, v1, v2))
    assert d0[1] == 1.0 and 2 in d0 and 200 not in d0
    assert d1[1] == 100.0 and d1[200] == 1.5 and 2 in d1
    assert d2[1] == 100.0 and 2 not in d2 and 999 not in d2
    assert len(d0) == 100 and len(d1) == 101 and len(d2) == 100


def test_fold_equals_live_operators(store, spark):
    """read(latest) must equal applying the same deltas to a live frame
    with multiput_df/delete_df — on-disk deltas and in-memory updates
    mean the same thing."""
    ups = spark.createDataFrame(
        [(i, 10.0) for i in range(0, 100, 7)] + [(500, 3.0)],
        "k long, v double",
    )
    dels = spark.createDataFrame([(3,), (500,)], "k long")
    store.commit_puts(ups, merge="sum")
    store.commit_deletes(dels)

    live = IndexedDataFrame.from_unique(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "k long, v double"
        ),
        "k", num_partitions=8, cache=False,
    ).multiput_df(ups, f=SUM_MERGE).delete_df(dels)
    assert _as_dict(store.read()) == _as_dict(live)


def test_compaction_is_transparent(store, spark):
    for i in range(3):
        store.commit_puts(
            spark.createDataFrame([(i, 1.0)], "k long, v double"),
            merge="sum",
        )
    before = _as_dict(store.read())
    vc = store.compact()
    assert _as_dict(store.read(vc)) == before
    # time travel to pre-compaction versions still works
    assert _as_dict(store.read(1))[0] == 1.0
    # post-compaction commits fold from the snapshot
    store.commit_puts(
        spark.createDataFrame([(0, 5.0)], "k long, v double"), merge="sum"
    )
    assert _as_dict(store.read())[0] == before[0] + 5.0


def test_reopen_reads_same_table(store, spark):
    store.commit_puts(
        spark.createDataFrame([(7, 70.0)], "k long, v double")
    )
    reopened = VersionedKVStore.open(spark, store.path)
    assert _as_dict(reopened.read()) == _as_dict(store.read())
    assert reopened.versions() == store.versions()


def test_unknown_version_and_merge_rejected(store, spark):
    with pytest.raises(ValueError):
        store.read(99)
    with pytest.raises(ValueError):
        store.commit_puts(
            spark.createDataFrame([(1, 1.0)], "k long, v double"),
            merge="max",
        )
