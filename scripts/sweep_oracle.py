"""Full-contract oracle sweep — the pre-driver local gate.

Runs every ``queries()`` entry that has an ``oracle_sql()`` twin
against DuckDB on the same parquet tables (default sf0.01, the scale
the driver checks at) and prints per-query PASS/FAIL plus a summary.
This is the playbook that precedes every driver run: a hash mismatch
found here costs one local iteration; found by the driver it costs a
round.

Usage::

    python scripts/sweep_oracle.py [sf_dir] [start_idx] [end_idx]

Results also land in ``/tmp/sweep_<start>_<end>.json`` for diffing
across runs. Uses tests/oracle_utils.compare — stricter than the
driver (exact float equality), so anything green here is green there.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from oracle_utils import compare, duck_con  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("oracle-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in queries if n in oracles]
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    end = int(sys.argv[3]) if len(sys.argv) > 3 else len(names)
    names = names[start:end]

    con = duck_con(sf_dir)
    results: dict = {}
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            rep = compare(queries[name](spark, sf_dir), oracles[name], con)
            results[name] = {
                "ok": rep["ok"],
                "issues": rep["issues"][:3],
                "rows": rep["rows"],
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            results[name] = {
                "ok": False,
                "issues": [f"ERR {type(e).__name__}: {e}"],
                "sec": round(time.time() - t0, 2),
            }
        r = results[name]
        print(
            f"[{start + i + 1}/{start + len(names)}] "
            f"{'PASS' if r['ok'] else 'FAIL'} {name} ({r['sec']}s)",
            flush=True,
        )
        if not r["ok"]:
            print("   ", r["issues"], flush=True)

    n_ok = sum(1 for r in results.values() if r["ok"])
    print(f"\nSWEEP DONE: {n_ok}/{len(results)} pass", flush=True)
    with open(f"/tmp/sweep_{start}_{end}.json", "w") as f:
        json.dump(results, f, indent=1)
    fails = [n for n, r in results.items() if not r["ok"]]
    if fails:
        print("FAILS:", fails, flush=True)
    return 0 if not fails else 1


if __name__ == "__main__":
    sys.exit(main())
