"""Named multi-store snapshot pins — reproducibility across the
retrieval stack.

Every persisted store family carries its own OCC version ledger
(functions/store_commit.py) and every serve path takes ``version=``,
so any single store can be re-served as-of. What a training run needs
on top is ONE durable name that captures the whole stack — "the
postings index at v7, the IVF index at v12, the classifier at v3" —
written once when the run starts and resolvable years later, so
"which data did run X see?" is a file read, not an archaeology
project. (The reference's multi-version semantics,
IndexedRDD.scala:25-33, lifted from a single RDD lineage to a fleet
of at-rest indexes; the operational shape is a manifest-of-manifests,
like a Delta Lake multi-table checkpoint without a catalog
transaction.)

Consistency contract: a pin records each store's COMMITTED frontier at
read time. The reads are not a cross-store transaction — a writer
committing to store B between the pin's read of A and of B yields a
pin where A is slightly older than B. Each recorded version is still a
real committed snapshot of its store (per-store snapshot isolation is
the ledger's guarantee), which is exactly the consistency a
multi-table reader gets from any catalog-less lake format. Pin while
ingest is quiesced (or right after the commits you mean to capture)
when cross-store simultaneity matters.

Durability of the pinned DATA is the retention contract:
``store_commit.vacuum_store(keep_versions=N)`` advances each store's
servability floor independently, and a pin older than a store's floor
refuses loudly at resolve time (:func:`assert_pin_servable`) — the
pin file itself never silently outlives the bytes it names.
"""

from __future__ import annotations

import json
import os

from spark_indexedrdd_spark.functions import store_commit as SC


def _tag_file(tag_dir: str, name: str) -> str:
    # reuse the batch-tag charset rule: one copy of "safe as a path
    # segment" across the protocol surface
    SC.validate_batch_tag(name)
    return os.path.join(tag_dir, name + ".json")


def _canon(path: str) -> str:
    """ONE canonical spelling per store for pin bookkeeping: realpath
    (absolute, symlinks resolved, no trailing slash). Pins are matched
    to vacuum targets BY PATH STRING — a pin recorded as
    ``./stores/ivf`` that a later ``vacuum_respecting_pins`` addresses
    as ``/data/stores/ivf/`` must still protect the snapshot, not fail
    loudly only after the bytes are gone. Both the record side
    (:func:`pin_stores`) and every lookup side
    (:func:`min_pinned_versions`, :func:`vacuum_respecting_pins`)
    canonicalize through here."""
    return os.path.realpath(os.path.abspath(path))


def pin_stores(
    tag_dir: str, name: str, stores: "dict[str, str]"
) -> "dict[str, dict]":
    """Durably record ``{alias: {"path", "version"}}`` for every store
    in ``stores`` (``{alias: store_path}``) under ``tag_dir/<name>.json``
    and return it. The version recorded is the store's committed
    frontier (``meta.json``'s own version — never an uncommitted ledger
    reservation). Pins are IMMUTABLE: re-pinning an existing name
    refuses loudly (a silently moved pin is the reproducibility bug
    this module exists to prevent); delete the file explicitly to
    retire a name. Refuses a store with no version ledger (nothing to
    pin) — every post-r10 store commit mints one."""
    pin: "dict[str, dict]" = {}
    for alias, path in sorted(stores.items()):
        meta = SC.read_meta(path)
        version = meta.get("version")
        if version is None:
            raise ValueError(
                f"store {alias!r} at {path!r} predates the version "
                "ledger — commit once (any append/delete) to mint one"
            )
        # canonical path at record time: the retention-protection map
        # keys on this string (see _canon)
        pin[alias] = {"path": _canon(path), "version": int(version)}
    fpath = _tag_file(tag_dir, name)
    os.makedirs(tag_dir, exist_ok=True)
    # exclusive create IS the immutability check (no TOCTOU window)
    try:
        fd = os.open(fpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ValueError(
            f"pin {name!r} already exists in {tag_dir!r} — pins are "
            "immutable; pick a new name or delete the old pin "
            "explicitly"
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(pin, fh)
        fh.flush()
        os.fsync(fh.fileno())
    dfd = os.open(tag_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    return pin


def read_pin(tag_dir: str, name: str) -> "dict[str, dict]":
    """The recorded ``{alias: {"path", "version"}}`` map. FileNotFound
    for an unknown name — never a guess."""
    with open(_tag_file(tag_dir, name)) as fh:
        return json.load(fh)


def assert_pin_servable(pin: "dict[str, dict]") -> None:
    """Refuse loudly — naming every broken store — if ANY pinned
    version fell below its store's servability floor (a later
    destructive compaction/rebuild, or a ``vacuum_store`` retention
    pass, reclaimed its files). A pin is all-or-nothing: serving a
    stack where one index silently moved forward is the torn-snapshot
    bug, so one dead store fails the whole pin."""
    broken = []
    for alias, ref in sorted(pin.items()):
        try:
            snap = SC.read_meta_version(ref["path"], ref["version"])
            SC.assert_snapshot_servable(ref["path"], snap)
        except (ValueError, FileNotFoundError) as e:
            broken.append(f"{alias} (v{ref['version']}): {e}")
    if broken:
        raise ValueError(
            "pin is no longer servable — retention passed it:\n  "
            + "\n  ".join(broken)
        )


def pin_versions(pin: "dict[str, dict]") -> "dict[str, int]":
    """``{alias: version}`` — the form serve paths consume, e.g.
    ``hybrid_rrf_from_stores(postings_version=v['lexical'],
    ivf_version=v['dense'])``. Validates servability first, so a
    vacuumed pin fails HERE with the full per-store report instead of
    deep inside one branch's scan."""
    assert_pin_servable(pin)
    return {alias: ref["version"] for alias, ref in pin.items()}


class LedgerVacuumCadence:
    """The shared self-maintenance cadence for streaming store writers
    (one implementation; the postings and vector tiers both ride it):
    when the per-commit ledger reaches ``vacuum_every`` files, run
    retention + ledger checkpoint from the writer's OWN foreachBatch
    turn — the single-writer maintenance contract holds because the
    ingest IS the writer — routed through
    :func:`vacuum_respecting_pins` when a ``pin_tag_dir`` is given.

    Cadence contract (r12 VERDICT item 2): re-arm only a FULL INTERVAL
    past the post-vacuum resting level (``n_files >= resting +
    vacuum_every``), never on the count merely sitting above the
    threshold — a held pin caps the floor so the resting level can't
    drop, and an any-growth guard would re-fire a full-store retention
    scan on EVERY micro-batch (each commit grows the ledger by one). A
    pin held across N commits costs at most N/vacuum_every (+1)
    passes. The constructor refuses ``vacuum_every <= keep_versions +
    1``: a prune leaves ~keep_versions data versions plus the
    floor-advance commit on disk, so a smaller threshold re-fires a
    full vacuum on every micro-batch."""

    def __init__(
        self,
        path: str,
        vacuum_every: int,
        keep_versions: int = 8,
        pin_tag_dir: "str | None" = None,
    ):
        if int(vacuum_every) <= keep_versions + 1:
            raise ValueError(
                f"vacuum_every={vacuum_every} must exceed "
                f"keep_versions+1={keep_versions + 1}: a prune leaves "
                "~keep_versions data versions plus the floor-advance "
                "commit on disk, so a smaller threshold re-fires a "
                "full vacuum on every micro-batch"
            )
        self.path = path
        self.vacuum_every = int(vacuum_every)
        self.keep_versions = keep_versions
        self.pin_tag_dir = pin_tag_dir
        # file count observed right after the last vacuum pass: the
        # re-arm baseline (see the class note)
        self._post_vacuum_files: "int | None" = None

    def _ledger_files(self) -> int:
        # same filter as store_commit._max_version/list_versions: a
        # stray non-.json artifact must not inflate the cadence count
        vdir = os.path.join(self.path, "_versions")
        if not os.path.isdir(vdir):
            return 0
        return len(
            [
                f
                for f in os.listdir(vdir)
                if f.endswith(".json") and f[:-5].isdigit()
            ]
        )

    def maybe_vacuum(self, spark=None) -> "dict | None":
        """Run one retention + ledger-checkpoint pass iff due; returns
        the vacuum report (with ``protected_by`` when a pin capped the
        floor) or None. Pass ``spark=`` for flat sidecar stores whose
        data GC needs a session (zonemap/bloom)."""
        n = self._ledger_files()
        due = n >= self.vacuum_every and (
            self._post_vacuum_files is None
            or n >= self._post_vacuum_files + self.vacuum_every
        )
        if not due:
            return None
        if self.pin_tag_dir is not None:
            report = vacuum_respecting_pins(
                self.pin_tag_dir,
                self.path,
                keep_versions=self.keep_versions,
                spark=spark,
                prune_ledger=True,
            )
        else:
            report = SC.vacuum_store(
                self.path,
                keep_versions=self.keep_versions,
                spark=spark,
                prune_ledger=True,
            )
        self._post_vacuum_files = self._ledger_files()
        return report


def oldest_pins(tag_dir: str) -> "dict[str, tuple[int, str]]":
    """``{store_path: (oldest pinned version, pin name holding it)}``
    across EVERY pin in ``tag_dir`` — the retention protection map,
    with the holder NAMED so an operator can see (and release) what is
    blocking reclamation. Unknown/empty tag dirs yield an empty map
    (nothing to protect)."""
    out: "dict[str, tuple[int, str]]" = {}
    if not os.path.isdir(tag_dir):
        return out
    for f in sorted(os.listdir(tag_dir)):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(tag_dir, f)) as fh:
            pin = json.load(fh)
        name = f[:-5]
        for ref in pin.values():
            # canonicalize on read too: pre-r12 pins recorded the raw
            # caller spelling (relative / trailing-slash / symlink)
            p, v = _canon(ref["path"]), int(ref["version"])
            if p not in out or v < out[p][0]:
                out[p] = (v, name)
    return out


def min_pinned_versions(tag_dir: str) -> "dict[str, int]":
    """The oldest pinned version per store path, across EVERY pin in
    ``tag_dir`` — the retention protection map. Unknown/empty tag dirs
    yield an empty map (nothing to protect)."""
    return {p: v for p, (v, _name) in oldest_pins(tag_dir).items()}


def retire_pin(tag_dir: str, name: str) -> "dict[str, dict]":
    """Explicitly release a pin so the NEXT retention pass may reclaim
    the snapshots it protected, returning the retired
    ``{alias: {"path", "version"}}`` map (the operator's record of what
    just became reclaimable). Raises FileNotFoundError for an unknown
    name — retiring a pin that was never held is a bookkeeping bug,
    never a no-op. This is the sanctioned spelling of "delete the tag
    file": pins are immutable while held (:func:`pin_stores`), and
    retirement is the single mutation their lifecycle has."""
    fpath = _tag_file(tag_dir, name)
    with open(fpath) as fh:
        pin = json.load(fh)
    os.remove(fpath)
    return pin


def vacuum_respecting_pins(
    tag_dir: str,
    path: str,
    keep_versions: int = 1,
    spark=None,
    prune_ledger: bool = False,
) -> dict:
    """``store_commit.vacuum_store`` with the floor capped at the
    oldest version any pin in ``tag_dir`` records for this store —
    routine retention can never silently break a training-run pin.
    When a pin holds the cap, the returned report says so:
    ``protected_by`` names the pin and ``protect_version`` is its
    capped floor (r12 VERDICT item 5 — a silent cap left operators
    unable to see which retention blocker to release). Retire pins
    explicitly (:func:`retire_pin`) to let the next vacuum pass
    reclaim their snapshots; the refusal machinery then reports any
    still-held pin loudly (:func:`assert_pin_servable`)."""
    held = oldest_pins(tag_dir).get(_canon(path))
    report = SC.vacuum_store(
        path,
        keep_versions=keep_versions,
        spark=spark,
        protect_version=held[0] if held is not None else None,
        prune_ledger=prune_ledger,
    )
    if held is not None:
        report["protect_version"] = held[0]
        report["protected_by"] = held[1]
    return report
