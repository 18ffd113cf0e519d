"""Name-targeted oracle check — run specific ``queries()`` entries
against their DuckDB twins (same compare as scripts/sweep_oracle.py).

Usage::

    python scripts/check_oracle_names.py [sf_dir] name [name ...]
"""

from __future__ import annotations

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
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("oracle-check-names")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    con = duck_con(sf_dir)
    fails = 0
    for name in names:
        t0 = time.time()
        try:
            if name not in oracles:
                print(f"SKIP {name} (no oracle_sql twin)")
                continue
            rep = compare(queries[name](spark, sf_dir), oracles[name], con)
            ok = rep.get("ok", False)
        except Exception as e:  # noqa: BLE001
            rep, ok = {"err": repr(e)[:300]}, False
        fails += 0 if ok else 1
        print(
            f"{'PASS' if ok else 'FAIL'} {name} {time.time() - t0:.1f}s"
            + ("" if ok else f" {rep}")
        )
    print(f"done: {len(names) - fails}/{len(names)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
