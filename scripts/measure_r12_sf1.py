"""Measure the r12 wave at sf0.1 vs sf1.0 (SCALING addendum): the
delete -> OPTIMIZE -> serve composition on the IVF store (the reshaped
contract entry), and the version-ledger checkpoint's cost profile
under many micro-commits.

Same protocol as the r9/r10/r11 addenda (scripts/gen_sf1.py data,
local[32], min of 3 rounds; store builds timed separately from serves).

Design claims under test:
- the OPTIMIZE in the delete -> serve path costs ~one committed-
  survivors scan + bucketed write (∝ corpus size, the shape of one
  full append), and the post-OPTIMIZE serve matches the tombstone-
  masked serve it replaces or better (tombstone anti-join gone, file
  count restored to the build's bound);
- vacuum_store(prune_ledger=True) is ledger-bound: its cost scales
  with COMMIT COUNT (KB-sized JSON reads + one checkpoint write),
  not with data size — sf0.1 and sf1.0 at the same commit count
  should price within noise of each other;
- post-prune enumeration (list_versions) parses the number-array
  index only: it must not regress vs the pre-prune listdir at any
  data scale (the one-file checkpoint form regressed 0.25 -> 2.13 ms
  at 120 folded commits; the split fixed it — this pins the fix at
  both tiers).

Run:  python scripts/measure_r12_sf1.py   (needs .scratch/sf1.0)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_COMMITS = 40
QIDS = [50, 100, 150, 200, 250, 300, 400, 450]


def main() -> int:
    from spark_indexedrdd_spark.functions import ivf as IVF
    from spark_indexedrdd_spark.functions import retrieval as R
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("r12-sf1")
        .getOrCreate()
    )
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

        # ---- delete -> OPTIMIZE -> serve (the reshaped contract path) ----
        emb = spark.read.parquet(
            os.path.join(sf, "embeddings.parquet")
        ).select("vec_id", "embedding")
        p = os.path.join(REPO, ".scratch", f"r12_ivfopt_{tier}")
        shutil.rmtree(p, ignore_errors=True)
        IVF.write_ivf_store(emb, p, n_clusters=16, method="det")
        IVF.delete_ivf_ids(
            spark, p, emb.where("vec_id % 7 = 0").select("vec_id"),
            batch_tag="del",
        )

        def serve():
            force(IVF.ivf_ann_from_store(spark, p, QIDS, k=5, n_probe=4))

        r["serve_tombstone_masked"] = timed(serve)
        t0 = time.perf_counter()
        IVF.optimize_ivf_store(spark, p)
        r["optimize"] = round(time.perf_counter() - t0, 3)
        r["serve_post_optimize"] = timed(serve)

        # ---- ledger checkpoint under N_COMMITS micro-commits ----
        docs = spark.read.parquet(
            os.path.join(sf, "documents.parquet")
        ).select("doc_id", "text")
        lp = os.path.join(REPO, ".scratch", f"r12_ledger_{tier}")
        shutil.rmtree(lp, ignore_errors=True)
        R.write_postings_store(docs.where("doc_id % 2 = 0"), lp, n_buckets=32)
        t0 = time.perf_counter()
        for i in range(N_COMMITS):
            R.append_postings_batch(
                docs.where(
                    f"doc_id % 2 = 1 AND doc_id % {2 * N_COMMITS} = {2 * i + 1}"
                ),
                lp,
                batch_tag=f"mb{i:03d}",
            )
        r["appends_total"] = round(time.perf_counter() - t0, 3)
        vdir = os.path.join(lp, "_versions")
        r["ledger_files_pre"] = len(
            [f for f in os.listdir(vdir) if f[:-5].isdigit()]
        )
        r["list_versions_pre_ms"] = round(
            timed(lambda: [SC.list_versions(lp) for _ in range(100)]) * 10, 3
        )
        t0 = time.perf_counter()
        out = SC.vacuum_store(lp, keep_versions=3, prune_ledger=True)
        r["vacuum_prune"] = round(time.perf_counter() - t0, 3)
        r["pruned"] = len(out["pruned_ledger"])
        r["ledger_files_post"] = len(
            [f for f in os.listdir(vdir) if f[:-5].isdigit()]
        )
        r["list_versions_post_ms"] = round(
            timed(lambda: [SC.list_versions(lp) for _ in range(100)]) * 10, 3
        )
        # the ledger stays fully enumerable and the store fully servable
        assert len(SC.list_versions(lp)) >= N_COMMITS + 1
        force(R.bm25_from_store(spark, lp))
        results[tier] = r
        print(tier, json.dumps(r), flush=True)

    print("RESULT " + json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
