"""Measure the r11 wave at sf0.1 vs sf1.0 (SCALING addendum): the
composed filtered-serve → MMR pipeline, the store-served RM3, and the
vacuum maintenance ops.

Same protocol as the r9/r10 addenda (scripts/gen_sf1.py data,
local[32], min of 3 rounds; store builds timed separately from serves).

Design claims under test: the filtered-MMR composition costs ~the pool
generator (MMR's rerank window is corpus-oblivious); store-served RM3
stays ∝ matched postings for the combined term set; vacuum cost is a
file listing + KB-sized ledger reads, independent of data size.

Run:  python scripts/measure_r11_sf1.py   (needs .scratch/sf1.0)
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


def main() -> int:
    from spark_indexedrdd_spark.functions import ivf as IVF
    from spark_indexedrdd_spark.functions import mmr as MMR
    from spark_indexedrdd_spark.functions import retrieval as R
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("r11-sf1")
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

    MMR_QIDS = [0, 100, 200, 300, 400]
    tiers = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1.0": os.path.join(REPO, ".scratch", "sf1.0"),
    }
    results: dict = {}
    for tier, sf in tiers.items():
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        emb = spark.read.parquet(
            os.path.join(sf, "embeddings.parquet")
        ).select("vec_id", "embedding", "label")
        r: dict = {}

        ivf_p = os.path.join(REPO, ".scratch", f"r11_ivf_{tier}")
        shutil.rmtree(ivf_p, ignore_errors=True)
        t0 = time.perf_counter()
        IVF.write_ivf_store(
            emb, ivf_p, n_clusters=16, method="det", keep_cols=("label",)
        )
        r["ivf_store_build"] = round(time.perf_counter() - t0, 3)

        def filtered_mmr():
            pool = IVF.ivf_ann_from_store(
                spark, ivf_p, MMR_QIDS, k=20, n_probe=4,
                filter_pred="label % 2 = 0",
            ).select("q_id", "cand_id", F.col("cosine_sim").alias("rel_sim"))
            force(MMR.mmr_over_candidates(pool, emb, k=5))

        r["mmr_filtered_serve"] = timed(filtered_mmr)

        post_p = os.path.join(REPO, ".scratch", f"r11_post_{tier}")
        shutil.rmtree(post_p, ignore_errors=True)
        t0 = time.perf_counter()
        R.write_postings_store(
            docs.where("doc_id % 2 = 0"), post_p, n_buckets=64
        )
        R.append_postings_batch(
            docs.where("doc_id % 2 = 1"), post_p, batch_tag="m-b1"
        )
        r["postings_build_plus_append"] = round(time.perf_counter() - t0, 3)
        r["bm25_rm3_from_store"] = timed(
            lambda: force(R.bm25_rm3_from_store(spark, post_p, docs))
        )

        # vacuum: maintenance-op cost at each scale (floor advance +
        # debris listing; nothing dead here, which IS the common case)
        r["vacuum_postings"] = timed(
            lambda: SC.vacuum_store(post_p, keep_versions=1), rounds=1
        )
        results[tier] = r
        print(tier, json.dumps(r), flush=True)

    ratio = {
        k: (
            round(results["sf1.0"][k] / results["sf0.1"][k], 2)
            if results["sf0.1"][k]
            else None
        )
        for k in results["sf0.1"]
    }
    print("RATIOS", json.dumps(ratio), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
