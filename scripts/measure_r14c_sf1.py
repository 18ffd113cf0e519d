"""Measure the r14 third wave at sf1.0 (SCALING addendum; same
protocol as measure_r14b_sf1.py): waiting_suppliers_q21 (window
rewrite), dsir_select (single-explode counts), image dhash near-dup
(checkpointed proxy + vectorized bit-pack; bench-only entry, built
inline here exactly like bench.py does).

Run:  python scripts/measure_r14c_sf1.py <label>   (needs .scratch/sf1.0)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_indexedrdd_spark.session import get_spark  # noqa: E402

SF1 = os.path.join(REPO, ".scratch", "sf1.0")
NAMES = ["waiting_suppliers_q21", "dsir_select"]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    import __spark_entry__ as E
    from spark_indexedrdd_spark.functions import multimodal as MM
    from spark_indexedrdd_spark.sources.tables import load_table

    spark = get_spark(app_name=f"measure_r14c_{label}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out: dict[str, float] = {}
    for name in NAMES:
        ts = []
        for _ in range(3):
            df = qs[name](spark, SF1)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        out[name] = round(min(ts), 3)
        print(name, [round(t, 3) for t in ts], flush=True)
    docs = load_table(spark, SF1, "documents")
    ts = []
    for _ in range(3):
        # time CONSTRUCTION + action: image_near_dup eagerly
        # checkpoints the dhash proxy at construction (bench.py's
        # timed lambda includes it too)
        t0 = time.time()
        df = MM.image_near_dup(MM.attach_binary(docs), max_hamming=8)
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    out["image_dhash_near_dup"] = round(min(ts), 3)
    print("image_dhash_near_dup", [round(t, 3) for t in ts], flush=True)
    path = f"/tmp/r14c_sf1_{label}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
