"""Measure the r10 ledger entries at sf0.1 vs sf1.0 (SCALING addendum).

Same protocol as the r9 addendum (scripts/gen_sf1.py data, local[32],
min of 3 rounds, store dirs wiped per scale so writes stay cold):
postings snapshot serve (as-of version read) and the version-to-version
CDC extract. The design claim under test: an as-of serve costs the same
as a live serve (one frozen meta read, same pruned scan), and the CDC
extract is O(delta in the interval), independent of store size.

Run:  python scripts/measure_r10_sf1.py   (needs .scratch/sf1.0 from
gen_sf1.py; prints a markdown table row set for SCALING.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    from spark_indexedrdd_spark.functions import retrieval as R
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("r10-sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tiers = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1.0": os.path.join(REPO, ".scratch", "sf1.0"),
    }
    results: dict = {}
    for tier, sf in tiers.items():
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        p = os.path.join(REPO, ".scratch", f"r10_post_{tier}")
        shutil.rmtree(p, ignore_errors=True)
        R.write_postings_store(docs.where("doc_id % 2 = 0"), p)
        v1 = SC.read_meta(p)["version"]
        R.append_postings_batch(
            docs.where("doc_id % 2 = 1"), p, batch_tag="m1"
        )
        R.delete_postings_docs(
            spark, p, docs.where("doc_id % 5 = 0").select("doc_id"), "m2"
        )
        v3 = SC.read_meta(p)["version"]

        def timed(fn, rounds=3):
            best = float("inf")
            for _ in range(rounds):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            return best

        results[(tier, "live_serve")] = timed(
            lambda: R.bm25_from_store(spark, p).collect()
        )
        results[(tier, "snapshot_serve_v1")] = timed(
            lambda: R.bm25_from_store(spark, p, version=v1).collect()
        )
        results[(tier, "postings_changes_v1_v3")] = timed(
            lambda: R.postings_changes(spark, p, v1, v3).count()
        )
        shutil.rmtree(p, ignore_errors=True)

    print("\n| entry | sf0.1 s | sf1.0 s | ratio |")
    print("|---|---|---|---|")
    for name in ("live_serve", "snapshot_serve_v1", "postings_changes_v1_v3"):
        a = results[("sf0.1", name)]
        b = results[("sf1.0", name)]
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
