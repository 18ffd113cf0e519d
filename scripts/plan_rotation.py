"""Print the NEXT round's correctness-window rotation plan.

Run AFTER the driver lands a new CORRECTNESS_r{N}.json: it replays the
staleness-tripwire math from tests/test_driver_sim.py and prints, as
copy-pasteable Python tuples,

  1. the verbatim staleness batch the next window MUST front-queue
     (queries that would trip the coverage-horizon test if left out),
  2. the PAST_CUTOFF_NEW debuts the escape-hatch contract obliges the
     next rotation to include,
  3. fill suggestions for the remaining slots, oldest driver evidence
     first (so nothing drifts toward the horizon),

plus the budget arithmetic (n, horizon, spare slots). This turns each
round's first task — rotating `__spark_entry__.py`'s window lists and
extending the `HORIZON_STALE_R{N}` tripwire assertion — into a
mechanical edit instead of a re-derivation.

Usage: python scripts/plan_rotation.py
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__ as E

    names = list(E.queries().keys())
    n = len(names)
    horizon = max(2, math.ceil(n / 50))
    rows_only = set(getattr(E, "ROWS_ONLY", ()))
    past_cutoff = list(getattr(E, "PAST_CUTOFF_NEW", ()))

    records = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not records:
        print("no CORRECTNESS_r*.json records found")
        return 1
    last_seen: dict[str, str] = {}
    for rec in records:
        tag = os.path.basename(rec)
        for q in json.load(open(rec)):
            last_seen[q] = tag
    # Replay the tripwire's math exactly (test_driver_sim.py): a query
    # is stale unless it appears in the NEXT window (being planned —
    # not yet known) or in the last horizon-1 on-disk records. The
    # must-front-queue list is therefore everything outside the union
    # of the last horizon-1 records. (The previous version of this
    # script kept only horizon-2 records and substituted the STALE
    # pre-rotation window for the missing one, double-counting the
    # latest record and reporting a phantom overfull window.)
    keep = horizon - 1
    recent: set = set()
    for rec in records[-keep:] if keep > 0 else []:
        for q in json.load(open(rec)):
            recent.add(q)
    must = [
        q
        for q in names
        if q not in recent and q not in rows_only and q not in past_cutoff
    ]
    debuts = past_cutoff
    slots = 50 - len(must) - len(debuts)
    print(f"contract n = {n}, horizon = {horizon} rounds, window = 50")
    print(f"latest record: {os.path.basename(records[-1])}")
    print(f"\n# MUST front-queue ({len(must)} — absent from the last "
          f"{max(keep, 0)} record(s); tripwire-verbatim):")
    print("HORIZON_STALE = (")
    for q in must:
        print(f'    "{q}",  # last: {last_seen.get(q, "never")}')
    print(")")
    print(f"\n# PAST_CUTOFF_NEW debuts ({len(debuts)}):")
    print("DEBUTS = (" + ", ".join(f'"{q}"' for q in debuts) + ")")
    if slots < 0:
        print(f"\n!! OVERFULL: {-slots} more required names than slots — "
              "consolidate contract entries (rotation-budget note in "
              "__spark_entry__.py)")
        return 2
    window_now = set(names[:50])

    def freshness(q: str) -> str:
        if q in window_now:
            # presumptively green in the record the driver is about to
            # write — freshest, so it sorts last among fill candidates
            return "CORRECTNESS_r99-presumptive"
        return last_seen.get(q, "")

    fill = sorted(
        (q for q in names
         if q not in must and q not in debuts and q not in rows_only),
        key=freshness,
    )[:slots]
    print(f"\n# fill suggestions ({slots} spare slots, oldest evidence "
          "first):")
    print("FILL = (")
    for q in fill:
        print(f'    "{q}",  # last: {last_seen.get(q, "never")}')
    print(")")
    print(f"\nROWS_ONLY (never windowed): {sorted(rows_only)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
