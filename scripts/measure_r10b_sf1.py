"""Measure the r10 retrieval/filter wave at sf0.1 vs sf1.0 (SCALING
addendum): hybrid RRF (in-plan), filtered IVF store serve, filtered
IVFPQ store serve, filtered binary store serve.

Same protocol as the r9/r10 addenda (scripts/gen_sf1.py data,
local[32], min of 3 rounds; store builds are timed separately from
serves so the table separates one-time and per-query costs).

Design claims under test: hybrid cost ≈ sum of its branch passes
(fusion is branch-results-sized); a filtered serve costs ~the same as
the unfiltered serve over the same probes (the predicate rides the
already-pruned scan — row-skipping, never a metadata join).

Run:  python scripts/measure_r10b_sf1.py   (needs .scratch/sf1.0)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from spark_indexedrdd_spark.functions import hybrid as H
    from spark_indexedrdd_spark.functions import ivf as IVF
    from spark_indexedrdd_spark.functions import pq as PQ
    from spark_indexedrdd_spark.functions import quant as Q
    from spark_indexedrdd_spark.functions import similarity as SIM

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("r10b-sf1")
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
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        emb = spark.read.parquet(
            os.path.join(sf, "embeddings.parquet")
        ).select("vec_id", "embedding", "label")
        r: dict = {}

        r["hybrid_rrf"] = timed(lambda: force(H.hybrid_rrf(docs, emb)))

        ivf_p = os.path.join(REPO, ".scratch", f"r10b_ivf_{tier}")
        shutil.rmtree(ivf_p, ignore_errors=True)
        t0 = time.perf_counter()
        IVF.write_ivf_store(
            emb, ivf_p, n_clusters=16, method="det", keep_cols=("label",)
        )
        r["ivf_store_build"] = round(time.perf_counter() - t0, 3)
        r["ivf_serve_unfiltered"] = timed(
            lambda: force(
                IVF.ivf_ann_from_store(
                    spark, ivf_p, SIM.DEFAULT_QUERY_IDS, k=5, n_probe=4
                )
            )
        )
        r["ivf_serve_filtered"] = timed(
            lambda: force(
                IVF.ivf_ann_from_store(
                    spark, ivf_p, SIM.DEFAULT_QUERY_IDS, k=5, n_probe=4,
                    filter_pred="label % 2 = 0",
                )
            )
        )

        qrows = emb.where(
            F.col("vec_id").isin(list(SIM.DEFAULT_QUERY_IDS))
        ).collect()
        qv = [(rr.vec_id, [float(x) for x in rr.embedding]) for rr in qrows]

        pq_p = os.path.join(REPO, ".scratch", f"r10b_ivfpq_{tier}")
        shutil.rmtree(pq_p, ignore_errors=True)
        t0 = time.perf_counter()
        PQ.write_ivfpq_store(
            emb, pq_p, n_clusters=16, m=8, ksub=16, method="det",
            keep_cols=("label",),
        )
        r["ivfpq_store_build"] = round(time.perf_counter() - t0, 3)
        r["ivfpq_serve_filtered"] = timed(
            lambda: force(
                PQ.ivfpq_store_ann(
                    spark, pq_p, qv, k=5, n_probe=4,
                    filter_pred="label % 2 = 0",
                )
            )
        )

        bin_p = os.path.join(REPO, ".scratch", f"r10b_bin_{tier}")
        shutil.rmtree(bin_p, ignore_errors=True)
        t0 = time.perf_counter()
        Q.write_binary_store(emb, bin_p, keep_cols=("label",))
        r["binary_store_build"] = round(time.perf_counter() - t0, 3)
        r["binary_serve_filtered"] = timed(
            lambda: force(
                Q.binary_store_ann(
                    spark, bin_p, qv, k=5, filter_pred="label % 2 = 0"
                )
            )
        )
        results[tier] = r
        print(tier, r, flush=True)

    print("\n| entry | sf0.1 s | sf1.0 s | ratio |")
    print("|---|---|---|---|")
    for k in results["sf0.1"]:
        a, b = results["sf0.1"][k], results["sf1.0"][k]
        print(f"| {k} | {a} | {b} | {round(b / max(a, 1e-9), 2)}x |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
