"""Targeted-partition point lookups — the multiget fast path.

The reference's ``multiget`` computes each key's owning partition on the
driver with the partitioner and launches a job on ONLY those partitions
(``context.runJob(partitionsRDD, fn, partitions)``,
reference IndexedRDD.scala:79-94); untouched partitions are never
scheduled. DataFrames cannot express "run on a subset of cached
partitions", so :class:`PointLookupIndex` reproduces the property with the
RDD API: hash-partition pairs by key, build one hash-map per partition
(the dict stands in for the per-partition ART tree,
reference PARTPartition.scala:26-40), and ``sc.runJob`` on just the owning
partitions.

Scale: on a 1000-executor cluster a multiget of k keys schedules at most
min(k, n) tasks and moves only the requested values to the driver — same
asymptotics as the reference. This is an *optional* fast path: the
DataFrame ``isin`` filter in ``IndexedDataFrame.multiget`` is the
correctness-checked default.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import zlib

from pyspark import TaskContext

from spark_indexedrdd_spark.core import IndexedDataFrame


def stable_hash(key: Any) -> int:
    """Process-independent key hash (the partitioner function).

    PySpark's ``portable_hash`` relies on the interpreter's ``hash()``,
    which for strings differs between the driver and worker processes
    unless PYTHONHASHSEED is pinned. The partitioner is our global index
    (reference IndexedRDD.scala:42) — the driver must compute the same
    partition id the workers did, so use a pure function of the key's
    repr instead."""
    if isinstance(key, tuple):
        h = 0x345678
        for item in key:
            h = (h * 1000003) ^ stable_hash(item)
        return h & 0x7FFFFFFF
    if isinstance(key, int):
        return key & 0x7FFFFFFF
    return zlib.crc32(repr(key).encode("utf-8")) & 0x7FFFFFFF


class PointLookupIndex:
    """Per-partition hash index over an IndexedDataFrame's entries."""

    def __init__(self, idf: IndexedDataFrame):
        self.keys = list(idf.keys)
        self.value_cols = list(idf.value_cols)
        self.n = idf.num_partitions
        nk = len(self.keys)
        single_key = nk == 1
        single_val = len(self.value_cols) == 1

        def to_pair(row):
            k = row[0] if single_key else tuple(row[:nk])
            v = row[nk] if single_val else tuple(row[nk:])
            return (k, v)

        pairs = idf.df.rdd.map(to_pair).partitionBy(self.n, stable_hash)
        # one dict per partition — the in-memory index
        self._parts = pairs.mapPartitions(
            lambda it: iter([dict(it)]), preservesPartitioning=True
        ).cache()
        self._parts.count()  # materialize

    def partition_of(self, key: Any) -> int:
        return stable_hash(key) % self.n

    def multiget(self, ks: Iterable[Any]) -> dict:
        """Probe only the owning partitions (reference IndexedRDD.scala:80-92)."""
        ks = list(ks)
        if not ks:
            return {}
        by_part: dict[int, list] = {}
        for k in ks:
            by_part.setdefault(self.partition_of(k), []).append(k)
        target_parts = sorted(by_part)

        def probe(iterator):
            pid = TaskContext.get().partitionId()
            wanted = by_part.get(pid, [])
            for d in iterator:  # exactly one dict per partition
                return [(k, d[k]) for k in wanted if k in d]
            return []

        sc = self._parts.context
        # runJob flattens the per-partition lists into one list of pairs
        found = sc.runJob(self._parts, probe, partitions=target_parts)
        return dict(found)

    def get(self, key: Any):
        return self.multiget([key]).get(key)

    def unpersist(self) -> None:
        self._parts.unpersist()
