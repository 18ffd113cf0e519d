"""Prove the applied-watermark fold at realistic stream-tag counts
(r14): under continuous tagged ingest every micro-batch appends one
replay tag to meta's `applied` list, so a year of streaming makes
EVERY `read_meta` parse a ~10^5-string list — the meta-size analog of
the per-commit version-ledger growth the r13 checkpoint bounded. This
script mints a 10^4-stream-tag meta through the REAL commit path
(`read_meta` -> append tag -> `commit_meta`, exactly a tagged append's
bookkeeping), then measures pre/post `vacuum_store` (whose every pass
now folds checkpoint-namespaced tags into per-namespace watermarks):

- meta.json size on disk and one `read_meta` parse;
- the fold itself (riding a realistic keep_versions=3 retention
  pass with the ledger checkpoint — production's cadence shape; the
  floor-at-rest bookkeeping-commit path is pytest-pinned);
- the replay check `tag_is_applied` for a folded tag, a fresh-
  checkpoint tag, and an operator tag — semantics must survive the
  fold exactly.

Run:  python scripts/measure_r14_applied_fold.py [n_tags]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TAGS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000


def timed(fn, rounds: int = 5):
    best = None
    out = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main() -> int:
    from spark_indexedrdd_spark.functions import store_commit as SC

    tmp = tempfile.mkdtemp(prefix="r14_fold_")
    p = os.path.join(tmp, "store")
    os.makedirs(os.path.join(p, "postings"))
    # a minimal manifest-pointer meta (the fold is family-agnostic:
    # it only touches `applied`); one operator tag stays exact
    SC.commit_meta(p, {"manifests": [], "applied": ["opbatch"]})

    # two checkpoint generations, interleaved the way a restart
    # produces them: ns A commits 0..N/2, then a fresh checkpoint
    # (ns B) takes over at batch id 0 again
    ns_a, ns_b = "aaaaaaaaaaaa", "bbbbbbbbbbbb"
    t0 = time.perf_counter()
    for i in range(N_TAGS):
        meta = SC.read_meta(p)
        ns, bid = (ns_a, i) if i < N_TAGS // 2 else (ns_b, i - N_TAGS // 2)
        meta.setdefault("applied", []).append(f"{ns}-b{bid}")
        SC.commit_meta(p, meta)  # data commits — what appends mint
    mint_s = time.perf_counter() - t0

    mpath = os.path.join(p, "meta.json")
    size_pre = os.path.getsize(mpath)
    read_pre, meta = timed(lambda: SC.read_meta(p))
    n_applied_pre = len(meta["applied"])

    t0 = time.perf_counter()
    rep = SC.vacuum_store(p, keep_versions=3, prune_ledger=True)
    fold_s = time.perf_counter() - t0

    # steady state: a cadenced store never re-pays the backlog — the
    # next pass has nothing to fold and below-floor versions are
    # checkpoint-skipped
    t0 = time.perf_counter()
    rep2 = SC.vacuum_store(p, keep_versions=3, prune_ledger=True)
    second_s = time.perf_counter() - t0
    assert rep2["folded_applied"] == 0

    size_post = os.path.getsize(mpath)
    read_post, meta = timed(lambda: SC.read_meta(p))
    chk_folded, ok_folded = timed(
        lambda: SC.tag_is_applied(meta, f"{ns_a}-b{N_TAGS // 4}")
    )
    assert ok_folded, "folded tag must stay applied"
    assert SC.tag_is_applied(meta, f"{ns_b}-b0"), "ns B folded too"
    assert not SC.tag_is_applied(meta, f"{ns_b}-b{N_TAGS}"), "future id"
    assert not SC.tag_is_applied(meta, "cccccccccccc-b0"), "fresh ckpt"
    assert SC.tag_is_applied(meta, "opbatch"), "operator tag kept exact"
    assert meta["applied"] == ["opbatch"]
    assert meta["applied_watermarks"] == {
        f"{ns_a}-b": N_TAGS // 2 - 1,
        f"{ns_b}-b": N_TAGS - N_TAGS // 2 - 1,
    }

    print(f"n_stream_tags            {N_TAGS}")
    print(f"mint (full commit path)  {mint_s:.2f} s "
          f"({1000 * mint_s / N_TAGS:.2f} ms/commit)")
    print(f"meta.json size           {size_pre / 1024:.1f} KiB -> "
          f"{size_post / 1024:.1f} KiB")
    print(f"read_meta parse          {1000 * read_pre:.2f} ms -> "
          f"{1000 * read_post:.2f} ms")
    print(f"vacuum w/ fold           {1000 * fold_s:.1f} ms "
          f"(folded_applied={rep['folded_applied']}; one-time backlog "
          f"pay-down, dominated by the ledger checkpoint of "
          f"{N_TAGS} list-bearing metas)")
    print(f"second vacuum pass       {1000 * second_s:.1f} ms "
          f"(folded_applied=0 — steady state)")
    print(f"tag_is_applied (folded)  {1e6 * chk_folded:.1f} us")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
