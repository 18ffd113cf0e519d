"""Measure the r11 vector-tier ledger wave at sf0.1 vs sf1.0 (SCALING
addendum 2): fragmented-store serves after micro-batch appends, the
snapshot-preserving OPTIMIZE's cost and its effect on serve time, and
the as-of read's overhead (one extra ledger JSON read).

Same protocol as the r9/r10/r11 addenda (scripts/gen_sf1.py data,
local[32], min of 3 rounds; store builds timed separately from serves).

Design claims under test:
- appending B micro-batches multiplies per-cluster file counts by ~B,
  degrading probed-cluster serves ∝ file-open overhead, and OPTIMIZE
  restores the build's bounded layout (serve_after_optimize ≈
  serve_fresh);
- optimize cost ≈ one committed-survivors scan + bucketed write — the
  same cost shape as one full append, ∝ corpus size;
- an as-of serve costs the same as a live serve (the snapshot is one
  KB-sized ledger read; the file sets differ, not the plan shape).

Run:  python scripts/measure_r11b_sf1.py   (needs .scratch/sf1.0)
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

N_BATCHES = 8
QIDS = [0, 100, 200, 300, 400]


def main() -> int:
    from spark_indexedrdd_spark.functions import ivf as IVF
    from spark_indexedrdd_spark.functions import quant as Q
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("r11b-sf1")
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
        emb = spark.read.parquet(
            os.path.join(sf, "embeddings.parquet")
        ).select("vec_id", "embedding")
        r: dict = {}

        # ---- IVF: fresh build vs B-batch fragmented vs optimized ----
        p = os.path.join(REPO, ".scratch", f"r11b_ivf_{tier}")
        shutil.rmtree(p, ignore_errors=True)
        IVF.write_ivf_store(
            emb.where(f"vec_id % {N_BATCHES} = 0"), p,
            n_clusters=16, method="det",
        )
        t0 = time.perf_counter()
        for b in range(1, N_BATCHES):
            IVF.append_ivf_batch(
                emb.where(f"vec_id % {N_BATCHES} = {b}"), p,
                batch_tag=f"b{b}",
            )
        r["ivf_appends_total"] = round(time.perf_counter() - t0, 3)
        meta = SC.read_meta(p)
        r["ivf_files_fragmented"] = len(SC.resolve_manifest_files(p, meta))
        v_frag = meta["version"]

        def serve(version=None):
            force(IVF.ivf_ann_from_store(
                spark, p, QIDS, k=10, n_probe=4, version=version,
            ))

        r["ivf_serve_fragmented"] = timed(serve)
        t0 = time.perf_counter()
        IVF.optimize_ivf_store(spark, p)
        r["ivf_optimize"] = round(time.perf_counter() - t0, 3)
        r["ivf_files_optimized"] = len(
            SC.resolve_manifest_files(p, SC.read_meta(p))
        )
        r["ivf_serve_optimized"] = timed(serve)
        # as-of the fragmented snapshot: same plan, old file set
        r["ivf_serve_asof"] = timed(lambda: serve(version=v_frag))

        # ---- binary store: same shape on the two-part layout ----
        bp = os.path.join(REPO, ".scratch", f"r11b_bin_{tier}")
        shutil.rmtree(bp, ignore_errors=True)
        Q.write_binary_store(emb.where(f"vec_id % {N_BATCHES} = 0"), bp)
        for b in range(1, N_BATCHES):
            Q.append_binary_batch(
                emb.where(f"vec_id % {N_BATCHES} = {b}"), bp,
                batch_tag=f"b{b}",
            )
        qv = [
            (int(row.vec_id), [float(x) for x in row.embedding])
            for row in emb.where(
                "vec_id IN (0, 100, 200, 300, 400)"
            ).collect()
        ]

        def bserve():
            force(Q.binary_store_ann(spark, bp, qv, k=10))

        r["bin_serve_fragmented"] = timed(bserve)
        t0 = time.perf_counter()
        Q.optimize_binary_store(spark, bp)
        r["bin_optimize"] = round(time.perf_counter() - t0, 3)
        r["bin_serve_optimized"] = timed(bserve)

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
