"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer-training member of the pipeline: the
one corpus-scale artifact an LLM data pipeline produces besides the
data itself.

The classic algorithm is corpus-scale only in its FIRST step: BPE
statistics depend solely on the word VOCABULARY with counts, so one
corpus pass (tokenize → explode → count distinct words — a hash
aggregate with map-side combine) reduces 100 TB of text to a
dim-sized (word, count) table, and every merge iteration after that
runs on the vocab alone: explode adjacent symbol pairs weighted by
word count (one small shuffle), pick the most frequent pair
(deterministic (count DESC, pair ASC) tie-break — the paper leaves
ties unspecified, which would never reproduce), collect that ONE pair
to the driver, and apply it with a narrow left-to-right greedy fold
over each vocab entry's symbol array. ``localCheckpoint`` every few
merges bounds the growing plan exactly like the other iterative loops
(pagerank, connected components).

No SQL oracle: the merge loop is data-dependent control flow (each
iteration's argmax feeds the next rewrite — 20 chained re-tokenizations
of a recursive CTE is not a DuckDB formulation, and the driver contract
documents stores/trainers as pytest-verified instead). Correctness is
pinned against a plain-Python reference implementation of the paper's
algorithm on the same inputs, plus greedy-encoding properties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions.text import tokens
from spark_indexedrdd_spark.localframe import local_rows_df
from spark_indexedrdd_spark.checkpoint import truncate_lineage

# marks end-of-word so merges never cross word boundaries and a final
# symbol "st</w>" is distinguishable from a word-internal "st"
EOW = "</w>"


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) — the ONE corpus-scale pass."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _char_symbols(word: Column) -> Column:
    """['h','e','y</w>'] — character symbols with the EOW marker fused
    onto the last character (the paper's formulation)."""
    chars = F.split(word, "")
    n = F.size(chars)
    return F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )


def _merge_fold(a: str, b: str) -> Column:
    """Left-to-right greedy application of one merge (a, b) -> 'ab' to
    the __sym array: a sequential fold that appends each symbol unless
    it completes the pair with the accumulator's last element."""
    merged = a + b
    return F.aggregate(
        F.col("__sym"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _safe_merge_prefix(
    top: "list[tuple[str, str, int]]", full_list: bool, budget: int
) -> "list[tuple[str, str]]":
    """Longest prefix of the sorted (a, b, count) candidate list that
    provably equals what merge-at-a-time argmax would pick.

    Applying merge (a, b) -> ab only perturbs pair counts that involve
    a or b (consumed) or ab (created), and every CREATED pair's count
    is bounded by an OLD pair's count that shares a symbol with the
    merge ((prev,ab) <= (prev,a); (ab,next) <= (b,next); (ab,ab) <=
    (b,a)). So a later candidate is still the true next argmax as long
    as (1) it is symbol-disjoint from everything applied earlier in
    the batch — the walk STOPS at the first violation, which also
    guarantees no higher-ranked pair shared a symbol — and (2) no
    equal-count pair sharing a symbol with the applied set sits below
    it, where an equal-count CREATED pair could win the (count DESC,
    a ASC, b ASC) tie-break. Pairs outside the collected top-M have
    count <= the list's tail count, so candidates at or below the tail
    count are only safe when the list is the complete pair table."""
    merges: "list[tuple[str, str]]" = []
    used: "set[str]" = set()
    tail = top[-1][2] if top else 0
    for i, (a, b, c) in enumerate(top):
        if len(merges) >= budget or c < 2:
            break
        if {a, b} & used:
            break
        if merges:
            if not full_list and c <= tail:
                break
            if any(
                cc == c and ({p, q} & (used | {a, b, a + b}))
                for p, q, cc in top[i + 1:]
            ):
                break
        merges.append((a, b))
        used |= {a, b, a + b}
    return merges


def _merge_fold_py(sym: "list[str]", a: str, b: str) -> "list[str]":
    """Plain-Python twin of :func:`_merge_fold` — the identical
    left-to-right greedy fold (append each symbol unless it completes
    the pair with the output's last element)."""
    out: "list[str]" = []
    ab = a + b
    for x in sym:
        if out and out[-1] == a and x == b:
            out[-1] = ab
        else:
            out.append(x)
    return out


def _train_merges_py(
    vocab: "list[tuple[list[str], int]]", n_merges: int
) -> "list[tuple[str, str]]":
    """Merge-at-a-time BPE on a collected (symbols, count) vocabulary —
    the driver-side loop for small vocabularies. Integer pair counts
    and the (count DESC, left ASC, right ASC) argmax are exactly the
    distributed loop's: Python ints are exact like BIGINT sums, and
    Python's code-point string order equals Spark's UTF8 binary order
    (UTF-8 byte order is code-point order)."""
    merges: "list[tuple[str, str]]" = []
    while len(merges) < n_merges:
        counts: "dict[tuple[str, str], int]" = {}
        for sym, cnt in vocab:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < 2:
            break
        merges.append((a, b))
        vocab = [(_merge_fold_py(sym, a, b), cnt) for sym, cnt in vocab]
    return merges


def train_bpe(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    checkpoint_every: int = 5,
    batch_top_m: int = 64,
    driver_max_vocab: "int | None" = None,
) -> "list[tuple[str, str]]":
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(left, right), ...] — the tokenizer artifact
    (apply with :func:`encode_bpe`). Stops early if no pair occurs
    twice. Deterministic: (count DESC, left ASC, right ASC) argmax.

    Small vocabularies train on the DRIVER: after the one corpus-scale
    pass, every merge iteration is a function of the (word, count)
    vocabulary alone, and below ``driver_max_vocab`` entries (default
    env ``SPARK_GRAFT_BPE_DRIVER_MAX_VOCAB`` = 65536 ≈ a few MB
    collected) the per-iteration pair-count jobs are pure scheduler
    overhead — the collected loop (:func:`_train_merges_py`) is
    merge-at-a-time by construction and bit-identical (pytest-pinned
    against the distributed path and the plain-Python Sennrich
    reference; the same driver-side-small-state pattern as the
    kmeans/codebook fits in ivf.py/pq.py). A full-corpus vocabulary
    past the cap (real text at 100 TB: millions of words) takes the
    distributed loop unchanged; ``driver_max_vocab=0`` forces it.

    Distributed driver round-trips are amortized: each job collects the
    top ``batch_top_m`` pairs (KB-sized) and applies the longest
    provably-argmax-equivalent prefix (:func:`_safe_merge_prefix` —
    symbol-disjoint, tie-safe), so 1k merges need far fewer than 1k
    jobs while remaining bit-identical to merge-at-a-time selection
    (pinned against the plain-Python Sennrich model in tests)."""
    import os as _os

    if driver_max_vocab is None:
        driver_max_vocab = int(
            _os.environ.get("SPARK_GRAFT_BPE_DRIVER_MAX_VOCAB", "65536")
        )
    vocab = (
        _word_vocab(df, text_col)
        .select(_char_symbols(F.col("w")).alias("__sym"), "cnt")
        .transform(truncate_lineage)
    )
    n_vocab = vocab.count()  # prices the checkpoint blocks, not the scan
    if driver_max_vocab and n_vocab <= driver_max_vocab:
        return _train_merges_py(
            [(list(r["__sym"]), int(r["cnt"])) for r in vocab.collect()],
            n_merges,
        )
    # Right-size once: every later iteration runs on the vocab alone,
    # and a sampled trainer's vocab is usually thousands of rows spread
    # over shuffle.partitions near-empty partitions — per-iteration job
    # overhead then dominates (measured 3x on the sf0.1 bench entry).
    # ~50k rows per partition keeps a 100M-word full-corpus vocabulary
    # wide while collapsing sample-sized trainers to a few tasks.
    n_parts = max(1, min(
        vocab.rdd.getNumPartitions(), n_vocab // 50_000 + 1
    ))
    if n_parts < vocab.rdd.getNumPartitions():
        # narrow op over the checkpoint — no second materialization
        vocab = vocab.coalesce(n_parts)
    merges: list[tuple[str, str]] = []
    since_ckpt = 0
    while len(merges) < n_merges:
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("__sym"), 1, F.size("__sym") - 1),
                    F.slice(F.col("__sym"), 2, F.size("__sym") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
            "cnt",
        )
        top = [
            (r["p"]["a"], r["p"]["b"], r["c"])
            for r in (
                pairs.groupBy("p")
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), F.asc("p.a"), F.asc("p.b"))
                .limit(batch_top_m)
                .collect()
            )
        ]
        batch = _safe_merge_prefix(
            top,
            full_list=len(top) < batch_top_m,
            budget=n_merges - len(merges),
        )
        if not batch:
            break
        merges.extend(batch)
        for a, b in batch:  # disjoint: chained folds == sequential
            vocab = vocab.select(_merge_fold(a, b).alias("__sym"), "cnt")
        since_ckpt += len(batch)
        if since_ckpt >= checkpoint_every:
            vocab = vocab.transform(truncate_lineage)
            since_ckpt = 0
    return merges


def encode_bpe(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list: per word, start
    from character symbols and apply every merge in training order
    (the standard greedy encoder). Output: (id, bpe_tokens
    array<string>, n_bpe).

    The merge folds run once per DISTINCT word, not once per corpus
    word occurrence (greedy BPE encoding is a pure function of the
    word, so encoding the vocabulary and joining back is semantically
    identical — pytest-pinned against the per-occurrence Python
    reference). At corpus scale this turns n_merges chained
    array-fold passes over every token occurrence into vocab-sized
    work plus one equi-join that Spark auto-broadcasts while the
    encoded vocab is small (AQE/sort-merge takes over for a 100M-word
    vocabulary — still far cheaper than corpus-width folds; measured
    14x on the sf0.1 bench entry)."""
    words = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("__pos", "w"),
    )
    sym = words.select("w").distinct().select(
        "w", _char_symbols(F.col("w")).alias("__sym")
    )
    for a, b in merges:
        sym = sym.select("w", _merge_fold(a, b).alias("__sym"))
    out = words.join(sym, "w").select(id_col, "__pos", "__sym")
    # collect_list order is shuffle-dependent — re-establish document
    # order from the carried word position before flattening
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("__pos", "__sym"))),
        lambda s: s["__sym"],
    )
    return (
        out.groupBy(id_col)
        .agg(F.flatten(ordered).alias("bpe_tokens"))
        .select(
            id_col,
            "bpe_tokens",
            F.size("bpe_tokens").cast("int").alias("n_bpe"),
        )
    )


# --------------------------------------------------------------------- #
# Persisted merge store — train once, encode every ingest batch.
# The one text-family trainer that lacked a store twin (r8 VERDICT
# item 8): without it, gating a new corpus batch through the tokenizer
# meant re-training or hand-carrying the merge list. Same commit
# protocol as the classifier model store (classifier.py
# write_classifier_model): data first, meta.json LAST as the atomic
# commit marker; a rebuild retracts the old meta FIRST so a crash
# leaves either no marker (clearly uncommitted) or a fully committed
# merge list — never the old meta over half-overwritten merges.
# --------------------------------------------------------------------- #


def merges_id(merges: "list[tuple[str, str]]") -> str:
    """Deterministic fingerprint of a merge list (order-sensitive —
    BPE merges are ordered). Stamped into the store meta and onto
    every streaming-encoder output row so token streams produced under
    DIFFERENT tokenizers are detectable at read time, mirroring the
    classifier gate's model_id."""
    import hashlib

    payload = "\x1f".join(f"{a}\x1e{b}" for a, b in merges)
    return hashlib.md5(payload.encode()).hexdigest()[:16]


def write_bpe_store(spark, merges: "list[tuple[str, str]]", path: str) -> None:
    """Persist an ordered merge list: rows at ``path/merges`` (rank,
    left, right), then the meta marker (n_merges + merges_id) LAST."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    SC.retract_meta(path)
    # repartition(1), NOT coalesce(1): coalescing a Python-local frame
    # serializes a Python-runner handshake per pickled slice into one
    # task (~4.8s flat at local[32]; see write_classifier_model).
    # read_bpe_store orders by rank, so file row order is free.
    local_rows_df(
        spark,
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).repartition(1).write.mode("overwrite").parquet(path + "/merges")
    SC.commit_meta(
        path, {"n_merges": len(merges), "merges_id": merges_id(merges)}
    )


def read_bpe_store(spark, path: str) -> "list[tuple[str, str]]":
    """The ordered merge list back as driver-side values — a tokenizer
    is n_merges string pairs, the same KB-scale state it was at
    training. Raises FileNotFoundError on an uncommitted store and
    ValueError if the committed rows do not match their meta (a
    mixed-build store must never silently tokenize)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    rows = spark.read.parquet(path + "/merges").orderBy("rank").collect()
    merges = [(r.left, r.right) for r in rows]
    if len(merges) != int(meta["n_merges"]) or merges_id(merges) != meta[
        "merges_id"
    ]:
        raise ValueError(
            f"BPE store at {path} does not match its committed meta "
            "(partial or mixed build) — rebuild with write_bpe_store"
        )
    return merges


def train_and_write_bpe(
    df: DataFrame,
    path: str,
    n_merges: int = 20,
    text_col: str = "text",
) -> "list[tuple[str, str]]":
    """Convenience: train on the reference corpus and publish the
    tokenizer."""
    merges = train_bpe(df, n_merges, text_col)
    write_bpe_store(df.sparkSession, merges, path)
    return merges


def encode_from_store(
    spark,
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode under the persisted tokenizer — identical output to
    :func:`encode_bpe` with the in-memory merge list (pytest-pinned),
    plus a ``merges_id`` column naming the tokenizer version."""
    merges = read_bpe_store(spark, path)
    return encode_bpe(df, merges, text_col, id_col).withColumn(
        "merges_id", F.lit(merges_id(merges))
    )


class StreamingBpeEncoder:
    """foreachBatch tokenizer — the streaming twin of
    :func:`encode_from_store`: each micro-batch of documents is encoded
    under the PERSISTED merge list and written to
    ``out_path/batch_id=N``, so an at-least-once replay of batch N
    overwrites its own directory instead of duplicating token rows
    (the same idempotent-foreachBatch discipline as
    classifier.StreamingClassifierGate, and the same model-version
    caveat: replay after a store rebuild re-encodes under the NEW
    tokenizer — detectable because every row carries merges_id).

    Maintenance note (r14): no LedgerVacuumCadence here — this writer
    only READS the merges store (written once by training, static
    thereafter) and emits per-batch output directories; there is no
    growing per-commit ledger on either side to vacuum. Output
    retention is the downstream consumer's policy (the batch_id
    layout makes range deletes trivial)."""

    def __init__(self, store_path: str, out_path: str,
                 text_col: str = "text", id_col: str = "doc_id") -> None:
        self.store_path = store_path
        self.out_path = out_path
        self.text_col = text_col
        self.id_col = id_col
        self._merges: "list[tuple[str, str]] | None" = None

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        if self._merges is None:
            self._merges = read_bpe_store(
                batch_df.sparkSession, self.store_path
            )
        out = encode_bpe(
            batch_df, self._merges, self.text_col, self.id_col
        ).withColumn("merges_id", F.lit(merges_id(self._merges)))
        out.write.mode("overwrite").parquet(
            f"{self.out_path}/batch_id={batch_id}"
        )


def read_encoded_batches(spark, path: str) -> DataFrame:
    """All committed encoder output with batch_id recovered from the
    directory layout."""
    return spark.read.option("basePath", path).parquet(path + "/batch_id=*")
