"""Prove the ledger checkpoint at REALISTIC commit counts (r12 VERDICT
item 3): the r12 measurement folded 38 commits; the design claim is
~10^5 (a year of micro-batch streaming). This script mints a
10^4-commit ledger through the REAL commit path (`read_meta` →
`commit_meta` — pure driver-side JSON + fsync, no Spark work per
commit, exactly what a streaming writer's bookkeeping costs), then
measures, pre/post `vacuum_store(prune_ledger=True)`:

- `list_versions` — enumeration must go O(checkpoint-index), not
  O(commits-ever);
- one as-of serve through `bm25_from_store(version=...)` — the
  user-visible read that rides `read_meta_version`;
- the prune itself, and a SECOND vacuum pass right after — the
  below-floor skip (r12 ADVICE) must make the re-run pay the
  retained-range only, not 10^4 guaranteed-failed opens.

Run:  python scripts/measure_r13_ledger.py [n_commits]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

N_COMMITS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000


def timed(fn, rounds: int = 3):
    best = None
    out = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main() -> int:
    from spark_indexedrdd_spark.functions import retrieval as R
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("r13-ledger-measure")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )

    root = tempfile.mkdtemp(prefix="r13ledger_")
    store = os.path.join(root, "postings")
    report: dict = {"n_commits": N_COMMITS}
    try:
        # real store, real manifests; then 10^4 real commits on top
        R.write_postings_store(docs, store, n_buckets=16)
        R.append_postings_batch(
            docs.where("doc_id % 7 = 0").selectExpr(
                "doc_id + 100000 AS doc_id", "text"
            ),
            store,
            batch_tag="seed",
        )
        t0 = time.perf_counter()
        meta = SC.read_meta(store)
        for _ in range(N_COMMITS):
            SC.commit_meta(store, meta)
        report["mint_commits_s"] = round(time.perf_counter() - t0, 3)
        frontier = SC.read_meta(store)["version"]
        vdir = os.path.join(store, "_versions")

        def count_ledger_files():
            return len(
                [
                    f
                    for f in os.listdir(vdir)
                    if f.endswith(".json") and f[:-5].isdigit()
                ]
            )

        report["pre_ledger_files"] = count_ledger_files()
        dt, vs = timed(lambda: SC.list_versions(store))
        report["pre_list_versions_ms"] = round(dt * 1000, 2)
        report["pre_versions_seen"] = len(vs)
        dt, pre_rows = timed(
            lambda: sorted(
                map(
                    tuple,
                    R.bm25_from_store(spark, store, version=frontier).collect(),
                )
            ),
            rounds=3,
        )
        report["pre_asof_serve_s"] = round(dt, 3)

        t0 = time.perf_counter()
        SC.vacuum_store(store, keep_versions=8, prune_ledger=True)
        report["prune_s"] = round(time.perf_counter() - t0, 3)
        report["post_ledger_files"] = count_ledger_files()
        dt, vs = timed(lambda: SC.list_versions(store))
        report["post_list_versions_ms"] = round(dt * 1000, 2)
        report["post_versions_seen"] = len(vs)
        dt, post_rows = timed(
            lambda: sorted(
                map(
                    tuple,
                    R.bm25_from_store(spark, store, version=frontier).collect(),
                )
            ),
            rounds=3,
        )
        report["post_asof_serve_s"] = round(dt, 3)
        report["serve_identical"] = pre_rows == post_rows

        # the below-floor skip: a second pass must NOT pay one failed
        # open per folded commit
        t0 = time.perf_counter()
        SC.vacuum_store(store, keep_versions=8, prune_ledger=True)
        report["second_vacuum_s"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
