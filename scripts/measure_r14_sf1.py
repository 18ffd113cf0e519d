"""Measure the r14 wave at sf0.1 vs sf1.0 (SCALING addendum):

1. `bm25_rm3_from_store` — the r14 debut: the FULL RM3 pipeline served
   from the postings store (build + staged append + %5 takedown, then
   feedback retrieval AND expanded re-score from pruned buckets).
   Claim: the one-time build prices ~linearly with the corpus; the
   SERVE reads only the query/expansion terms' bucket directories plus
   q × k_fb text probes, so it grows with matched postings (a small
   fraction of the corpus), far sublinearly vs a full scan — the same
   scaling shape bm25_from_store showed in the r9 addendum.

2. `ivfpq_filtered_serve` — the r14 debut: filtered ANN × tombstones on
   the compressed tier. Claim: the serve reads n_probe of n_clusters
   code directories (m bytes/candidate), with the label predicate a
   parquet PushedFilter on that pruned scan — serve cost ∝ probed
   corpus fraction, never a decode or metadata join.

3. `segment_set_ops` — the r14 consolidation. Claim: the consolidated
   three-branch report costs ≈ the sum of its per-op constituents (the
   branches share only the two filtered projections, each KB-sized on
   customer), i.e. the fold trades three driver round-trips for one
   job with no superlinear term.

Same protocol as the r9–r13 addenda (scripts/gen_sf1.py data,
local[32], min of 3 rounds for serves; one-time builds timed once).

Run:  python scripts/measure_r14_sf1.py   (needs .scratch/sf1.0)
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


def main() -> int:
    from spark_indexedrdd_spark.functions import pq as PQ
    from spark_indexedrdd_spark.functions import retrieval as R
    from spark_indexedrdd_spark.operators import analytics as AN
    from spark_indexedrdd_spark.session import get_spark

    spark = get_spark("r14-sf1", master="local[32]", shuffle_partitions=32)
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

    def timed_once(fn):
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

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
        emb = spark.read.parquet(
            os.path.join(sf, "embeddings.parquet")
        ).select("vec_id", "embedding", "label")
        cust = spark.read.parquet(os.path.join(sf, "customer.parquet"))
        r["n_docs"] = docs.count()
        r["n_vecs"] = emb.count()

        # ---- 1. RM3 from the postings store ----
        store = os.path.join(REPO, ".scratch", f"r14_rm3_{tier}")
        shutil.rmtree(store, ignore_errors=True)

        def build_rm3():
            R.write_postings_store(
                docs.where("doc_id % 2 = 0"), store, n_buckets=64
            )
            R.append_postings_batch(
                docs.where("doc_id % 2 = 1"), store, batch_tag="m-b1"
            )
            R.delete_postings_docs(
                spark, store,
                docs.where("doc_id % 5 = 0").select("doc_id"),
                batch_tag="m-takedown",
            )

        r["rm3_store_build_append_takedown_once"] = timed_once(build_rm3)
        survivors = docs.where("doc_id % 5 != 0")
        r["rm3_store_serve"] = timed(
            lambda: force(R.bm25_rm3_from_store(spark, store, survivors))
        )
        r["rm3_inplan_for_reference"] = timed(
            lambda: force(R.bm25_rm3_topk(survivors))
        )
        shutil.rmtree(store, ignore_errors=True)

        # ---- 2. filtered ANN on the compressed tier ----
        pqs = os.path.join(REPO, ".scratch", f"r14_ivfpqf_{tier}")
        shutil.rmtree(pqs, ignore_errors=True)

        def build_pq():
            PQ.write_ivfpq_store(
                emb, pqs, n_clusters=16, n_probe=4, m=8, ksub=16,
                method="det", keep_cols=("label",),
            )
            PQ.delete_ivfpq_ids(
                spark, pqs,
                emb.where("vec_id % 7 = 0").select("vec_id"),
                batch_tag="m-takedown",
            )

        r["ivfpq_filtered_build_takedown_once"] = timed_once(build_pq)
        qvecs = [
            (int(x.vec_id), [float(v) for v in x.embedding])
            for x in emb.where("vec_id IN (1, 101, 201)").collect()
        ]
        r["ivfpq_filtered_serve"] = timed(
            lambda: PQ.ivfpq_store_ann(
                spark, pqs, qvecs, k=5, n_probe=4,
                filter_pred="label % 2 = 0",
            ).collect()
        )
        r["ivfpq_unfiltered_serve_for_reference"] = timed(
            lambda: PQ.ivfpq_store_ann(
                spark, pqs, qvecs, k=5, n_probe=4
            ).collect()
        )
        shutil.rmtree(pqs, ignore_errors=True)

        # ---- 3. the set-op consolidation ----
        r["segment_set_ops_report"] = timed(
            lambda: force(AN.segment_set_ops(cust, 1, 2))
        )

        def per_op_sum():
            force(AN.segment_except(cust, 1, 2))
            force(AN.segment_intersect(cust, 1, 2))
            force(AN.segment_except_all(cust, 1, 2))

        r["segment_per_op_sum"] = timed(per_op_sum)
        results[tier] = r
        print(json.dumps({tier: r}))

    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
