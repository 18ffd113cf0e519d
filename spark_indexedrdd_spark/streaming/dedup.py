"""Streaming dedup with bounded state — the streaming twin of
``functions.dedup.exact_dedup``.

An unbounded ``dropDuplicates`` must keep every key ever seen; at
100 TB/day of events that state never stops growing. The native
Structured Streaming operator ``dropDuplicatesWithinWatermark`` keeps a
key's state only until the event-time watermark passes it, so state is
O(keys-per-watermark-window), not O(keys-ever). Duplicates arriving
within the watermark horizon (the realistic at-least-once-delivery case:
retries, replayed micro-batches) are dropped; a duplicate arriving later
than the watermark is by definition outside the delivery-replay horizon.

The reference has no streaming surface at all (SURVEY.md §2); this sits
alongside the repo's other Structured Streaming operators
(windows.py, stateful.py, kv_sink.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from spark_indexedrdd_spark.streaming.windows import _as_stream_dir, events_stream


def streaming_dedup(
    spark: SparkSession,
    events_path: str,
    keys: Sequence[str] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream over the events table, event-time watermark on ``ts``,
    first-occurrence dedup by ``keys`` with watermark-bounded state.
    Returned unstarted; drive with ``trigger(availableNow=True)`` in
    append mode (dedup emits rows immediately — no window close to wait
    for)."""
    stream = events_stream(spark, events_path)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_incremental_lsh(
    spark: SparkSession,
    docs_path: str,
    sig_store_path: str,
    candidates_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int = 1,
):
    """Continuous-ingest near-duplicate detection: each arriving document
    file becomes a micro-batch that is (1) LSH-banded against the
    persisted signature store — near-dup candidates vs the whole accepted
    corpus, at |new bands| × bucket-occupancy cost — then (2) folded into
    the store, so the NEXT batch sees it as corpus. The streaming twin of
    ``functions.dedup.incremental_lsh_candidates_from_store`` +
    ``append_signature_batch``; candidate rows append to
    ``candidates_path`` as parquet.

    This is the 100 TB continuous-dedup shape: per batch, corpus text is
    never re-read — only its ~136 B/doc signatures — and corpus×corpus
    never happens.

    Delivery note: foreachBatch is at-least-once — on recovery a replayed
    batch can append its candidate rows (and signatures) twice.
    Candidates dedupe downstream by (doc_a, doc_b); duplicated signature
    rows only add identical band rows, which cannot change any future
    candidate SET (the banded join's DISTINCT absorbs them). A replayed
    batch also sees ITS OWN docs in the store — the banded join's
    ``doc_a != doc_b`` guard keeps self-pairs out even then.

    Returns the unstarted ``DataStreamWriter``; drive with e.g.
    ``.trigger(availableNow=True).option("checkpointLocation", ...)``.
    """
    from spark_indexedrdd_spark.functions.dedup import (
        _incremental_candidates_from_sigs,
        minhash_signatures,
        read_signature_store,
    )

    schema = spark.read.parquet(docs_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_path)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # Hash the batch text ONCE, cache the (tiny) signature frame,
        # and serve both the candidate join and the store append from
        # it. The cache is unpersisted before the batch returns —
        # DataFrame caches are not GC-cleaned, so the previous shape
        # (incremental_lsh_candidates_from_store's internal cache, never
        # released) leaked one cached plan per micro-batch into executor
        # storage memory for the stream's lifetime.
        sig_new = minhash_signatures(batch_df, text_col, id_col).cache()
        try:
            sig_old = read_signature_store(
                batch_df.sparkSession, sig_store_path
            )
            cands = _incremental_candidates_from_sigs(sig_new, sig_old, id_col)
            cands.write.mode("append").parquet(candidates_path)
            sig_new.write.mode("append").parquet(sig_store_path)
        finally:
            sig_new.unpersist()

    return stream.writeStream.foreachBatch(_process).outputMode("append")


def streaming_semantic_dedup(
    spark: SparkSession,
    emb_path: str,
    ivf_store_path: str,
    verdicts_path: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 1,
    optimize_every: "int | None" = None,
    vacuum_every: "int | None" = None,
    keep_versions: int = 8,
    pin_tag_dir: "str | None" = None,
    checkpoint_dir: "str | None" = None,
):
    """Continuous-ingest SemDeDup: each arriving embedding file becomes
    a micro-batch that is (1) assigned to the persisted IVF index's
    clusters and compared against ONLY those clusters' stored vectors
    (+ smaller-id batchmates) — the embedding-side twin of
    ``streaming_incremental_lsh`` — then (2) appended into the store
    under the SAME centroids, so the next batch sees it as corpus.
    Per-vector verdict rows (vec_id, cluster_id, keep, dup_of) append
    to ``verdicts_path``.

    The 100 TB shape: corpus embeddings are read per batch only from
    the clusters the batch lands in (partition-pruned directories);
    corpus×corpus never happens; the only global state is k centroids.

    Delivery note: the vector APPEND is exactly-once — the batch_id is
    the replay tag for the store's staged manifest-pointer commit
    (``append_ivf_batch(batch_tag=...)``, r11), so at-least-once
    re-delivery of a committed batch never duplicates stored vectors.
    The VERDICT side is nearly exactly-once (r14): a redelivered batch
    whose tag is already committed is a FULL no-op — the replay check
    runs BEFORE the verdict compute, so post-commit redeliveries never
    append duplicate verdict rows (pre-r14 they recomputed against a
    store already holding their own copy and could flip to
    dup-of-itself's-copy). The remaining at-least-once window is a
    crash between the verdict write and the store's commit point;
    verdicts dedupe downstream by vec_id if that window matters.

    ``optimize_every=N`` folds the manifest list with the
    snapshot-preserving ``optimize_ivf_store`` whenever it reaches N
    entries (the ``StreamingPostingsStore`` cadence) — bounded
    per-cluster file counts under continuous ingest without breaking
    the as-of surface.

    ``vacuum_every=M`` (r13) completes the vector tier's
    self-maintenance, riding the SAME
    ``snapshots.LedgerVacuumCadence`` the postings tier uses: when the
    per-commit ledger reaches M files, retention + ledger checkpoint
    run from this writer's own foreachBatch turn, routed through
    ``vacuum_respecting_pins`` when ``pin_tag_dir`` is given — a
    training run's pinned IVF snapshot is never reclaimed, and a held
    pin costs one pass per M commits, never a scan per micro-batch.
    Composed with ``optimize_every``, a streamed vector store is fully
    self-maintaining at 100 TB: bounded data files, bounded ledger,
    pin-safe scheduled retention — the exact composition the lexical
    tier has.

    Returns the unstarted ``DataStreamWriter``; drive with e.g.
    ``.trigger(availableNow=True).option("checkpointLocation", ...)``.
    """
    from spark_indexedrdd_spark.functions.ivf import (
        append_ivf_batch,
        incremental_semantic_dedup_from_store,
        optimize_ivf_store,
    )

    if vacuum_every is not None:
        from spark_indexedrdd_spark.functions.snapshots import (
            LedgerVacuumCadence,
        )

        cadence = LedgerVacuumCadence(
            ivf_store_path, vacuum_every, keep_versions, pin_tag_dir
        )
    else:
        cadence = None

    schema = spark.read.parquet(emb_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(emb_path)
    )

    # ``checkpoint_dir=`` (r14): pass the SAME directory the caller
    # sets as checkpointLocation and the replay tags are namespaced by
    # that checkpoint's query id (store_commit.checkpoint_namespace —
    # the fresh-checkpoint/reset-batch-ids collision fix every
    # class-based writer gets through attach()); without it tags stay
    # the legacy un-namespaced 'b<id>' form. Resolved lazily at the
    # first batch (Spark writes the checkpoint metadata at query
    # start, before any batch runs).
    ns_cache: "list[str | None]" = [None]

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from spark_indexedrdd_spark.functions import store_commit as _SC

        if ns_cache[0] is None:
            ns_cache[0] = _SC.checkpoint_namespace(checkpoint_dir)
        _semantic_dedup_batch(
            batch_df, batch_id, ivf_store_path, verdicts_path,
            threshold, id_col, vec_col, ns_cache[0],
            optimize_every=optimize_every, cadence=cadence,
        )

    return stream.writeStream.foreachBatch(_process).outputMode("append")


def _semantic_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    ivf_store_path: str,
    verdicts_path: str,
    threshold: float,
    id_col: str,
    vec_col: str,
    ns: "str | None",
    optimize_every: "int | None" = None,
    cadence=None,
) -> None:
    """One ``streaming_semantic_dedup`` micro-batch, factored out so
    redelivery semantics are directly testable. A batch whose tag is
    already committed (exact entry OR covered by its checkpoint
    namespace's folded watermark) is a FULL no-op: with the r14
    tag_is_applied check up front, a post-commit redelivery skips the
    verdict recompute entirely instead of appending a duplicate set of
    verdict rows before the vector append no-ops. The remaining
    at-least-once window on the verdict sink is a crash between the
    verdict write and the store's commit point — unavoidable with two
    sinks and documented on streaming_semantic_dedup."""
    from spark_indexedrdd_spark.functions import store_commit as _SC
    from spark_indexedrdd_spark.functions.ivf import (
        append_ivf_batch,
        incremental_semantic_dedup_from_store,
        optimize_ivf_store,
    )

    tag = f"{ns}-b{batch_id}" if ns else f"b{batch_id}"
    meta = _SC.read_meta(ivf_store_path)
    if _SC.tag_is_applied(meta, tag):
        return
    if ns and f"b{batch_id}" in (meta.get("applied") or []):
        # cross-upgrade guard: a pre-namespace run committed the
        # bare id — its redelivery must stay a no-op
        return
    batch = batch_df.select(id_col, vec_col)
    verdicts = incremental_semantic_dedup_from_store(
        batch, ivf_store_path, threshold, id_col, vec_col
    )
    verdicts.write.mode("append").parquet(verdicts_path)
    append_ivf_batch(
        batch, ivf_store_path, id_col, vec_col,
        batch_tag=tag,
    )
    if optimize_every is not None:
        n_manifests = len(
            _SC.read_meta(ivf_store_path).get("manifests") or []
        )
        if n_manifests >= optimize_every:
            optimize_ivf_store(
                batch_df.sparkSession, ivf_store_path, id_col
            )
    if cadence is not None:
        cadence.maybe_vacuum()
