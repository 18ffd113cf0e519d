"""Turn two bench.py runs at different scale factors into the measured
scaling table SCALING.md records (r8 VERDICT item 4).

bench.py prints one JSON line per run whose "queries" map holds
min-of-N per-query seconds. Run it at sf0.1 (the driver tier) and at
the synthetic sf1.0 tier (scripts/gen_sf1.py), then::

    python scripts/scaling_report.py /tmp/bench_sf01.json /tmp/bench_sf1.json

emits a markdown table of per-query times and the 10x-data time ratio.
Ratio reading: ~1 means the query is dominated by fixed overhead at
this scale (job scheduling, store setup), <=10 means at-worst-linear in
rows on a fixed-size executor pool (local[32] both runs — a real
cluster would also grow the pool), >10 flags super-linear growth worth
a plan inspection.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    try:  # a BENCH_LOCAL.json detail file (pretty-printed object)
        return json.loads(text)
    except json.JSONDecodeError:
        pass
    for line in text.splitlines()[::-1]:  # bench.py stdout: gate line last
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main() -> None:
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    label_a = f"sf{a.get('sf', '?')}"
    label_b = f"sf{b.get('sf', '?')}"
    print(f"| query | {label_a} s | {label_b} s | ratio |")
    print("|---|---|---|---|")
    rows = []
    for name in sorted(set(qa) & set(qb)):
        ta, tb = qa[name], qb[name]
        ratio = tb / ta if ta > 0 else float("inf")
        rows.append((ratio, name, ta, tb))
    for ratio, name, ta, tb in sorted(rows, reverse=True):
        print(f"| {name} | {ta:.2f} | {tb:.2f} | {ratio:.1f}x |")
    gate_a, gate_b = a.get("value"), b.get("value")
    if gate_a and gate_b:
        print(
            f"\ngate set: {gate_a:.2f} s -> {gate_b:.2f} s "
            f"({gate_b / gate_a:.1f}x on 10x data)"
        )
    missing = sorted(set(qa) ^ set(qb))
    if missing:
        print(f"\nonly in one run (skipped): {missing}")


if __name__ == "__main__":
    main()
