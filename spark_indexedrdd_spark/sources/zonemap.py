"""Zone-map file skipping: per-file min/max sidecar statistics on a
clustering column, consulted BEFORE the scan is scheduled.

The reference has no storage layer at all (SURVEY.md §2.5 — RDD
actions over an in-memory index); this is the at-rest analog of its
partition-pruned point lookups, for RANGE predicates on a column you
don't want to hive-partition by. Hive partitioning (sources/sinks.py)
prunes directories but explodes at high cardinality (a directory per
distinct l_shipdate is ~2,500 dirs at SF1 and pure small-file poison at
100 TB); parquet row-group stats prune *inside* a task but every file
still gets listed, split and scheduled. A zone map closes the gap —
the Delta/Iceberg data-skipping design, self-contained on plain
parquet:

- the writer CLUSTERS the data by the zone column (range repartition +
  within-partition sort), so each file covers a tight value range;
- a one-pass, column-pruned aggregation records per-file min/max/count
  into a ``zones`` parquet sidecar (#files rows — KBs per thousand
  files, the same order as a Delta log checkpoint);
- readers push the range predicate into the SIDECAR scan, collect only
  the surviving file names, and hand exactly those files to the real
  scan. At 100 TB / 1M files a one-week range over a year of data
  schedules ~2% of the tasks instead of listing everything; the
  driver-side cost is |surviving files| strings, never the full list.

The residual predicate stays on the scan (zone maps prune at file
granularity, row-group stats then prune within), so results are
value-identical to a full-scan filter — which is exactly what the
DuckDB oracle checks.

Commit protocol (functions/store_commit): retract → data + sidecar →
meta-last commit; a crash mid-rebuild leaves the store clearly
uncommitted, and readers refuse a sidecar that could mix builds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _file_stats(spark: SparkSession, files: "list[str]", zone_col: str):
    """Per-file (basename, z_min, z_max, n_rows) over exactly
    ``files`` — hidden ``_metadata`` column, so the stats pass scans
    exactly one data column of the files it indexes. Basenames keep
    the store relocatable (copy/rsync between clusters)."""
    return (
        spark.read.parquet(*files)
        .select(
            F.col("_metadata.file_path").alias("file"),
            F.col(zone_col).alias("z"),
        )
        .groupBy("file")
        .agg(
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
            F.count("*").cast("long").alias("n_rows"),
        )
        .select(
            F.element_at(F.split(F.col("file"), "/"), -1).alias("file"),
            "z_min",
            "z_max",
            "n_rows",
        )
    )


def write_zonemap_table(
    df: DataFrame,
    path: str,
    zone_col: str,
    n_files: int | None = None,
    applied_tags=(),
) -> None:
    """Cluster ``df`` by ``zone_col`` and persist it with a per-file
    min/max zone map.

    ``n_files`` sets the range-partition count (→ output file count);
    default lets AQE pick. Sizing rule at scale: target
    ``spark.sql.files.maxPartitionBytes``-sized files so one pruned
    file is one task. ``applied_tags`` seeds the append replay ledger
    (streaming init: the first batch's id commits WITH the build).

    Manifest-pointer commit: readers resolve the SIDECAR file list
    from the manifests a committed meta names, and data files are only
    ever reached through committed sidecar rows — so appends are
    snapshot-isolated without readers ever listing a directory."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = df.sparkSession
    SC.retract_meta(path)
    out = (
        df.repartitionByRange(n_files, zone_col)
        if n_files
        else df.repartitionByRange(zone_col)
    )
    out.sortWithinPartitions(zone_col).write.mode("overwrite").parquet(
        path + "/data"
    )
    data_files = [
        os.path.join(path, "data", f)
        for f in SC.list_parquet_files(path + "/data")
    ]
    _file_stats(spark, data_files, zone_col).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/zones")
    SC.write_manifest(path, "base", SC.list_parquet_files(path + "/zones"))
    SC.commit_meta(
        path,
        {
            "zone_col": zone_col,
            # pinned so appends cast their batch to the store's type —
            # mixed-type zone stats would make pruning silently wrong
            "zone_ddl": df.schema[zone_col].dataType.simpleString(),
            "manifests": ["base"],
            "applied": [str(t) for t in applied_tags],
        },
    )


def _resolve_zones(spark: SparkSession, path: str, meta: dict):
    """The committed sidecar rows under ONE meta snapshot (manifest
    union; directory fallback for a pre-manifest store)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    rel = SC.resolve_manifest_files(path, meta)
    if rel is None:
        return spark.read.parquet(path + "/zones")
    return spark.read.parquet(*[os.path.join(path, "zones", f) for f in rel])


def append_zonemap_batch(
    df: DataFrame,
    path: str,
    batch_tag: "str | None" = None,
    n_files: int | None = None,
) -> bool:
    """Fold an ingest batch into the zone-mapped table: cluster the
    BATCH by the store's zone column, publish its files, and commit
    their zone rows behind the manifest pointer. Returns False (replay
    no-op) when ``batch_tag`` was already applied.

    Append keeps pruning EXACT but widens overlap: batch files cluster
    within the batch only, so a range may now touch one file per batch
    plus the base overlap — the LSM-tree trade. Periodic
    ``compact_zonemap_store`` re-clusters globally when the batch-file
    count makes serves schedule too many tasks.

    Crash/replay, legacy backfill, and visibility semantics live in ONE
    place — ``store_commit.append_flat_store_batch`` (stage → sweep →
    deterministic ``batch-<tag>-*`` moves → zone rows → atomic meta
    commit; stray crash files are named by no committed manifest and
    are invisible, so re-delivery is exact). Single-writer. The batch's
    zone column is cast to the store's pinned ``zone_ddl`` so a
    type-skewed source can never write mixed-type zone stats (which
    would prune wrongly without erroring)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = df.sparkSession
    meta0 = SC.read_meta(path)
    zone_col = meta0["zone_col"]
    if meta0.get("zone_ddl"):
        df = df.withColumn(zone_col, F.col(zone_col).cast(meta0["zone_ddl"]))
    out = (
        df.repartitionByRange(n_files, zone_col)
        if n_files
        else df.repartitionByRange(zone_col)
    ).sortWithinPartitions(zone_col)
    return SC.append_flat_store_batch(
        path,
        batch_tag,
        write_batch=lambda dest, mode: out.write.mode(mode).parquet(dest),
        build_sidecar=lambda files: _file_stats(spark, files, zone_col),
        sidecar_sub="zones",
    )


def optimize_zonemap_store(
    spark: SparkSession, path: str, n_files: int | None = None
) -> int:
    """Snapshot-PRESERVING global re-cluster (the Delta OPTIMIZE ZORDER
    analog on the one-column zone map; :func:`compact_zonemap_store`
    is the destructive form): read the committed rows through the
    sidecar, range-re-cluster on the zone column — append-accumulated
    batch files re-merge and the per-file zone overlap re-tightens to
    the build's — and publish through the ordinary sidecar-manifest
    commit (store_commit.optimize_flat_store). Every earlier snapshot
    keeps serving byte-identically (its sidecar rows still name the
    old data files) until a ``vacuum_store(spark=...)`` pass reclaims
    them — the ``spark=`` matters: a bare ``vacuum_store(path)`` skips
    the ``data/`` GC (no session to read the sidecars) and flags the
    skip in its report's ``data_gc`` note. Returns the live data-file
    count after."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    if meta.get("manifests") is None:
        raise ValueError(
            "optimize_zonemap_store requires a manifest-pointer store; "
            "one append backfills it, or rebuild"
        )
    zone_col = meta["zone_col"]
    files = _surviving_files(
        path, _resolve_zones(spark, path, meta), None, None
    )
    if not files:
        # nothing committed to re-cluster (empty build, or every row
        # tombstoned): a no-op beats the opaque Spark error that
        # spark.read.parquet() with zero paths raises (r11 ADVICE)
        return 0
    live = spark.read.parquet(*files)
    out = (
        live.repartitionByRange(n_files, zone_col)
        if n_files
        else live.repartitionByRange(zone_col)
    ).sortWithinPartitions(zone_col)
    SC.optimize_flat_store(
        path,
        meta,
        write_data=lambda dest: out.write.mode("overwrite").parquet(dest),
        build_sidecar=lambda fs: _file_stats(spark, fs, zone_col),
        sidecar_sub="zones",
    )
    return _resolve_zones(spark, path, meta).count()


def compact_zonemap_store(spark: SparkSession, path: str) -> int:
    """Globally re-cluster the store (append-accumulated batch files
    re-merge, zone overlap re-tightens); returns the file count after.

    The rewrite is built in a SIBLING directory read from the old
    committed files — never a checkpoint of data whose directory is
    about to be overwritten — so the old store stays fully intact and
    durable until the swap. The swap itself is retract → dir renames →
    commit: a crash before it leaves the old store committed and
    untouched; a crash inside it leaves the store loudly uncommitted
    with the compacted copy recoverable on disk — never a silent mix.
    The replay ledger is carried over, so already-committed append
    tags stay no-ops after a compact."""
    import shutil

    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    tmp = path + "__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    write_zonemap_table(
        zonemap_read(spark, path),
        tmp,
        meta["zone_col"],
        applied_tags=meta.get("applied", []),
    )
    new_meta = SC.read_meta(tmp)
    # the sibling's meta carries the SIBLING's ledger version (1) —
    # replace it with the snapshot version this compaction is based on,
    # so the commit below keeps OCC teeth: a writer that committed on
    # path after the recheck makes the commit CONFLICT (loudly
    # uncommitted, recoverable) instead of silently advancing past the
    # winner. rewrite=True records the servability floor.
    new_meta["version"] = meta.get("version")
    new_meta.pop("rewrite_floor", None)
    # carry the folded replay watermarks too (r14): write_zonemap_table
    # only carries the exact `applied` list — dropping the watermarks
    # would re-apply a redelivered folded stream batch after a compact
    if meta.get("applied_watermarks"):
        new_meta["applied_watermarks"] = meta["applied_watermarks"]
    SC.recheck_version(path, meta)  # abort BEFORE the destructive swap
    SC.retract_meta(path)  # <-- old store now loudly uncommitted
    for sub in ("data", "zones", "_manifests"):
        shutil.rmtree(os.path.join(path, sub), ignore_errors=True)
        os.replace(os.path.join(tmp, sub), os.path.join(path, sub))
    SC.commit_meta(path, new_meta, rewrite=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return len(SC.list_parquet_files(path + "/data"))


from spark_indexedrdd_spark.functions.store_commit import (  # noqa: E402
    StreamTagMixin as _StreamTagMixin,
)


class StreamingZonemapIngest(_StreamTagMixin):
    """foreachBatch ingest for the zone-mapped table — the store-family
    streaming twin (postings convention): the first non-empty batch
    initializes with its batch_id in the replay ledger of the SAME
    atomic commit; later batches append with the batch_id as the
    replay tag, so at-least-once re-delivery of a committed batch is a
    true no-op. Tags are checkpoint-namespaced via ``attach``
    (StreamTagMixin, r14), so a fresh checkpoint's reset batch ids
    never collide with another run's committed tags."""

    def __init__(
        self,
        path: str,
        zone_col: str,
        n_files: int | None = None,
        optimize_every: int | None = None,
        vacuum_every: int | None = None,
        keep_versions: int = 8,
        pin_tag_dir: str | None = None,
    ):
        self.path = path
        self.zone_col = zone_col
        self.n_files = n_files
        # fold the manifest list with the snapshot-preserving global
        # re-cluster once it reaches this many entries (the postings
        # cadence): bounded file counts AND re-tightened zone overlap
        # under continuous ingest, without breaking as-of reads
        self.optimize_every = optimize_every
        # vacuum_every (r14): the shared self-maintenance cadence every
        # streaming store writer rides (snapshots.LedgerVacuumCadence —
        # full-interval re-arm, pin routing, threshold refusal): when
        # the per-commit ledger reaches N files, retention + ledger
        # checkpoint run from this writer's own foreachBatch turn.
        # Zonemap is a flat sidecar store, so the data GC needs the
        # batch's session (maybe_vacuum(spark=)).
        if vacuum_every is not None:
            from spark_indexedrdd_spark.functions.snapshots import (
                LedgerVacuumCadence,
            )

            self._vacuum = LedgerVacuumCadence(
                path, vacuum_every, keep_versions, pin_tag_dir
            )
        else:
            self._vacuum = None
        self._initialized = os.path.exists(os.path.join(path, "meta.json"))

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        tag = self._stream_tag(str(batch_id))
        if self._legacy_applied(self.path, str(batch_id)):
            return
        if not self._initialized:
            write_zonemap_table(
                batch_df,
                self.path,
                self.zone_col,
                n_files=self.n_files,
                applied_tags=(tag,),
            )
            self._initialized = True
        else:
            append_zonemap_batch(
                batch_df, self.path, batch_tag=tag,
                n_files=self.n_files,
            )
            if self.optimize_every:
                from spark_indexedrdd_spark.functions import (
                    store_commit as _SC,
                )

                n = len(_SC.read_meta(self.path).get("manifests") or [])
                if n >= int(self.optimize_every):
                    optimize_zonemap_store(
                        batch_df.sparkSession, self.path, self.n_files
                    )
        if self._vacuum is not None:
            self._vacuum.maybe_vacuum(spark=batch_df.sparkSession)

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        """Start a streaming query feeding this ingest (postings-twin
        convention): checkpointed batch_ids + the replay-tag ledger
        give exactly-once store effects over at-least-once delivery."""
        return self._start_stream(
            stream_df, checkpoint_dir, "update", **trigger_kwargs
        )


def zonemap_prune_files(
    spark: SparkSession,
    path: str,
    lo=None,
    hi=None,
) -> "tuple[list[str], int]":
    """(surviving absolute file paths, total file count) for an
    inclusive [lo, hi] range on the store's zone column. The range
    predicate is evaluated IN the sidecar scan — only survivors'
    names ever reach the driver. Bounds may be None (open side)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)  # commit-marker check
    stats = _resolve_zones(spark, path, meta)
    return _surviving_files(path, stats, lo, hi), stats.count()


def _surviving_files(path: str, stats, lo, hi) -> "list[str]":
    """Zone-surviving absolute file paths — no total count, so the
    serve path pays exactly one sidecar job (the count is diagnostic
    and only the public tuple form computes it)."""
    keep = stats
    if lo is not None:
        keep = keep.where(F.col("z_max") >= F.lit(lo))
    if hi is not None:
        keep = keep.where(F.col("z_min") <= F.lit(hi))
    files = [
        os.path.join(path, "data", r.file) for r in keep.select("file").collect()
    ]
    return sorted(files)


def zonemap_read(
    spark: SparkSession,
    path: str,
    lo=None,
    hi=None,
    version: "int | None" = None,
) -> DataFrame:
    """The store's rows with ``zone_col`` in the inclusive [lo, hi]
    range, scanning only zone-surviving files. Value-identical to
    ``read.parquet(data).where(...)`` — the zone map changes which
    tasks run, never the answer (the residual filter and the parquet
    row-group stats still apply inside each file).

    ``version`` reads the store AS OF an earlier committed meta
    (store_commit's version ledger): the snapshot's sidecar manifests
    name only the batches committed by then, and data files are
    reached solely through those sidecar rows — so later appends are
    invisible. Snapshots survive until compaction rewrites the data
    dirs (read_meta_version docstring)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.resolve_serve_meta(path, version)
    zone_col = meta["zone_col"]
    files = _surviving_files(path, _resolve_zones(spark, path, meta), lo, hi)
    if not files:
        return spark.read.parquet(path + "/data").where(F.lit(False))
    df = spark.read.parquet(*files)
    if lo is not None:
        df = df.where(F.col(zone_col) >= F.lit(lo))
    if hi is not None:
        df = df.where(F.col(zone_col) <= F.lit(hi))
    return df
