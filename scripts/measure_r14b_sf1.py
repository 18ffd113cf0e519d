"""Measure the r14 optimization-round fence/hoist wave at sf1.0
(SCALING addendum; same protocol as the r9-r13 addenda).

Entries: embedding_quantize_stats (quantize_error_stats projection
fence), repetition_stats (gram/dup-frac fences), similarity_ann_ivf /
similarity_ann_ivf_det (per-side norm hoist), mmr_rerank (pair-norm
hoist). Run twice: once at HEAD ("after"), once with the pre-change
blobs checked out ("before") — the caller flips the working tree.

Run:  python scripts/measure_r14b_sf1.py <label>   (needs .scratch/sf1.0)
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
NAMES = [
    "embedding_quantize_stats",
    "repetition_stats",
    "similarity_ann_ivf",
    "similarity_ann_ivf_det",
    "mmr_rerank",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    import __spark_entry__ as E

    spark = get_spark(app_name=f"measure_r14b_{label}")
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
    path = f"/tmp/r14b_sf1_{label}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
