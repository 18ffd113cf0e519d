"""Measure the r13 wave at sf0.1 vs sf1.0 (SCALING addendum):

1. `corpus_span_report` — the reshaped contract entry (the
   duplicate_spans fold). Claim: the consolidated report prices as the
   sum of its two constituent passes over the span explode (both
   ~linear in corpus size), and the two 100 TB knobs still work on it:
   `stride=width` (non-overlapping spans, 1/width the exploded rows)
   and `approx=True` (HLL distinct — sketch merge instead of a
   distinct-span shuffle).

2. The pin-held streaming vacuum cadence — the r13 fix. Claim: with a
   pin capping the floor across N ingest commits, maintenance runs
   ceil-bounded passes (N/vacuum_every, not N), so total maintenance
   time is a small multiple of ONE pass at any data scale; per-pass
   cost scales with the store's file/manifest count, never with
   commits-ever.

Same protocol as the r9–r12 addenda (scripts/gen_sf1.py data,
local[32], min of 3 rounds for reads; one-time builds timed once).

Run:  python scripts/measure_r13_sf1.py   (needs .scratch/sf1.0)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

N_COMMITS = 12
VACUUM_EVERY = 3


def main() -> int:
    from spark_indexedrdd_spark.functions import retrieval as R
    from spark_indexedrdd_spark.functions import snapshots as SNAP
    from spark_indexedrdd_spark.functions import text as T

    # the bench harness's own session (8g driver, AQE, UTC): the span
    # explode at sf1.0 needs the same driver headroom bench.py has
    from spark_indexedrdd_spark.session import get_spark

    spark = get_spark("r13-sf1", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.select(F.max(F.xxhash64(*df.columns))).collect()

    def timed(fn, rounds=3):
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    tiers = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1.0": os.path.join(REPO, ".scratch", "sf1.0"),
    }
    results: dict = {}
    for tier, sf in tiers.items():
        r: dict = {}
        docs = spark.read.parquet(
            os.path.join(sf, "documents.parquet")
        ).select("doc_id", "text")
        r["n_docs"] = docs.count()

        # ---- 1. the consolidated span report and its scale knobs ----
        r["span_report_exact"] = timed(
            lambda: force(T.corpus_span_report(docs))
        )
        r["span_stats_exact_alone"] = timed(
            lambda: force(T.corpus_span_stats(docs))
        )
        r["duplicate_spans_alone"] = timed(
            lambda: force(T.duplicate_spans(docs))
        )
        r["span_stats_stride_eq_width"] = timed(
            lambda: force(T.corpus_span_stats(docs, stride=10))
        )
        r["span_stats_hll"] = timed(
            lambda: force(T.corpus_span_stats(docs, approx=True))
        )

        # ---- 2. pin-held streaming vacuum cadence ----
        store = os.path.join(REPO, ".scratch", f"r13_pinloop_{tier}")
        tags = os.path.join(REPO, ".scratch", f"r13_pintags_{tier}")
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(tags, ignore_errors=True)
        st = R.StreamingPostingsStore(
            store,
            n_buckets=32,
            vacuum_every=VACUUM_EVERY,
            keep_versions=1,
            pin_tag_dir=tags,
        )
        st.foreach_batch(docs.where("doc_id % 24 = 0"), 0)
        SNAP.pin_stores(tags, "run", {"lexical": store})
        passes = []
        orig = SNAP.vacuum_respecting_pins

        def counted(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            passes.append(time.perf_counter() - t0)
            return out

        SNAP.vacuum_respecting_pins = counted
        t0 = time.perf_counter()
        try:
            for i in range(1, N_COMMITS + 1):
                st.foreach_batch(docs.where(f"doc_id % 24 = {i}"), i)
        finally:
            SNAP.vacuum_respecting_pins = orig
        r["pin_held_ingest_total"] = round(time.perf_counter() - t0, 3)
        r["vacuum_passes"] = len(passes)
        r["vacuum_pass_time_total"] = round(sum(passes), 3)
        r["commits"] = N_COMMITS
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(tags, ignore_errors=True)
        results[tier] = r
        print(json.dumps({tier: r}))

    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
