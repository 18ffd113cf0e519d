"""Learned quality classifier over hashed n-gram features — the
"trained filter" stage of a web-scale LLM data pipeline (the GPT-3 /
LLaMA recipe: train a linear classifier that separates a high-quality
reference slice from raw web text, score every document, keep a
Pareto-lottery-weighted sample biased toward high scores; Brown et al.
2020, arXiv:2005.14165 Appendix A). Complements the repo's other
quality gates: `text.quality_filter` (heuristics), `text.lm_cross_entropy`
(perplexity), `text.dsir_select` (importance resampling) — this is the
*discriminatively trained* member of that family.

Reference parity note: the reference KV engine (amplab/spark-indexedrdd)
has no learned-filter surface; this module is part of the repo's
training-data-pipeline extension (SURVEY.md §2 extensions), built in the
same aggregate-shapes as `aggregateUsingIndex` (IndexedRDD.scala:170-186):
per-key combine then a tiny global state update.

Model: logistic regression on hashed word unigram+bigram features
(md5-derived bucket ids — the engine-portable hash used by
`text.dsir_select`), trained with full-batch gradient descent where every
cross-row reduction is an EXACT integer sum of floor-quantized per-row
contributions. That makes the learned weights bit-identical across
engines and run orders, so training itself is hash-checkable against an
unrolled-CTE DuckDB oracle (the `operators/graph.py` fixed-point
playbook applied to model training).

Features are BINARY PRESENCE of each bucket (sorted distinct bucket
list): presence features keep per-feature gradients O(class gap) so
full-batch GD separates in a handful of iterations, where mean-count
normalization (x=count/n) shrinks every gradient by 1/doc-length and
needs hundreds of steps — and the sort fixes one cross-engine fold
order for the margin sum.

Determinism contract (why every step is engine-exact):
- bucket ids: first-8-hex-of-md5 mod n_buckets — integer, portable;
- per-doc margin: LEFT fold over the SORTED distinct bucket list of
  w[bucket] double adds (F.aggregate / list_reduce — never a grouped
  float sum, and list_distinct order differences can't leak in);
- gradient: per-instance contribution floor(g * scale) quantized to
  BIGINT, summed exactly; floor (not round) because round-half ties
  break differently across engines, floor is unambiguous;
- weight update: w - lr * (grad_sum / (N * scale)) with each division
  operand cast to double FIRST (DuckDB's semantics) — identical IEEE
  ops from identical integer inputs even past 2^53, where Python's
  native int/int (correctly-rounded rational) would diverge;
- last-ulp exp()/pow() divergence only enters through the quantizer,
  which would need a value within ~1e-11 of an integer to flip — the
  same accepted risk class as dsir_select's ROUND(9) ln.

Scale (100 TB): training is `iters` passes over a localCheckpoint-ed
narrow (id, y, buckets) frame — one tokenize+hash scan total; each pass
is one map-side-combined shuffle of n_buckets-cardinality keys plus an
n_buckets-row driver collect (same bounded-driver-state pattern as
`pq.py`'s Lloyd's: n_buckets ≤ 64k ⇒ KBs); the model ships back as a
broadcast literal array. Scoring is a narrow per-row fold inside the
scan stage — no shuffle. Gradient-sum overflow budget: |contrib| ≤
scale, so 2^63 / scale ≈ 9.2e12 gram instances per bucket at the
default scale=1e6 — above a 100 TB corpus's per-bucket load; lower
`scale` if buckets are very few and docs very many.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from spark_indexedrdd_spark.functions.text import sql_tokens, tokens
from spark_indexedrdd_spark.localframe import local_rows_df
from spark_indexedrdd_spark.checkpoint import truncate_lineage

SCALE = 1_000_000  # gradient fixed-point quantum (1e-6 per instance)
PARETO_ALPHA = 9.0  # GPT-3 Appendix A's np.random.pareto(9) lottery


def _bucketize(
    df: DataFrame,
    label: Column,
    n_buckets: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, y, __b) — __b is the SORTED DISTINCT list of md5 buckets of
    the doc's word unigrams+bigrams (dsir_select's portable feature map,
    presence-encoded). One pass; callers localCheckpoint so `iters`
    consumers don't re-hash."""
    if n_buckets < 1:  # % 0 would yield NULL buckets, not an error
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # NULL text = no features (not a NULL score): coalesce before
    # tokenizing, mirrored in the SQL twin
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    tk = df.select(
        F.col(id_col),
        F.coalesce(label, F.lit(False)).cast("int").cast("double").alias("y"),
        toks.alias("__t"),
    )
    t = F.col("__t")
    pair_len = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(t, 1, pair_len),
        F.slice(t, 2, pair_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(t, bigrams)
    bucket_of = lambda g: (  # noqa: E731 - tiny local expr builder
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("int")
    return tk.select(
        F.col(id_col),
        "y",
        F.array_sort(F.array_distinct(F.transform(grams, bucket_of))).alias(
            "__b"
        ),
    )


def _margin(w: list[float], bias: float) -> Column:
    """bias + left-fold of w[bucket] over the doc's sorted distinct
    buckets — the model as a pure JVM expression (w shipped as ONE
    parsed SQL array literal, not n_buckets client-built F.lit columns:
    building 1024 Columns costs ~0.56s of py4j round-trips PER GD
    iteration, F.lit(list) the same (it expands to per-element lits),
    while one expr string parses in ~7ms and constant-folds to the
    identical array Literal — measured values bit-equal, per-iteration
    wall 0.8s -> 0.22s at sf0.1. repr() emits shortest-roundtrip
    decimals and the D suffix parses them back through
    Double.parseDouble, so the doubles survive exactly; n_buckets
    doubles, same footprint class as dsir_select's broadcast row)."""
    warr = F.expr(
        "array(" + ",".join(repr(float(x)) + "D" for x in w) + ")"
    )
    return F.lit(float(bias)) + F.aggregate(
        F.col("__b"),
        F.lit(0.0),
        lambda acc, bk: acc + F.element_at(warr, bk + 1),
    )


def _train_gd_driver(
    ys, bs, n_buckets: int, iters: int, lr: float, scale: int, n_docs: int
) -> "tuple[list[float], float]":
    """Driver-side twin of the distributed GD loop — the SAME IEEE
    operation sequence, vectorized with numpy, for corpora whose
    collected features fit driver memory (caller gates on a doc cap).

    Bit-identity argument, step by step against the Spark loop:
    - margin fold: ``np.cumsum`` along the gram axis IS the sequential
      left fold (cumsum must produce every prefix, so it cannot
      reassociate); padding slots gather a 0.0 sentinel weight and
      ``x + 0.0 == x`` exactly (no intermediate here is ever -0.0:
      weights come from subtractions, which never produce -0.0);
    - ``bias + fold`` / ``1/(1+exp(-m)) - y`` / ``floor(g*scale)``:
      the same IEEE double ops elementwise (exp parity between numpy
      and the JVM is pinned by tests/test_classifier.py's driver-vs-
      distributed equality on real corpora — a disagreement could only
      flip a result through floor() landing within 1 ulp of an
      integer, the module docstring's accepted quantizer risk class);
    - gradient sums: exact int64 accumulation (np.add.at), identical
      to any-order BIGINT SUM;
    - weight update: ``w - lr * (s/denom)`` with the same
      int64->double cast and parenthesization.
    """
    import numpy as np

    lens = np.fromiter((len(b) for b in bs), np.int64, n_docs)
    flat = (
        np.concatenate([np.asarray(b, dtype=np.int64) for b in bs])
        if lens.sum() else np.zeros(0, np.int64)
    )
    y = np.asarray(ys, dtype=np.float64)
    starts = np.zeros(n_docs + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    max_len = int(lens.max()) if n_docs else 0
    # padded (docs x max_len) gather-index matrix, built chunk-wise so
    # peak memory stays ~64 MB however ragged the corpus is
    chunk_rows = max(1, (8 << 20) // max(1, max_len))
    w = np.zeros(n_buckets, np.float64)
    bias = 0.0
    denom = float(n_docs * scale)
    for _ in range(int(iters)):
        w_ext = np.append(w, 0.0)  # sentinel slot for padding
        m = np.empty(n_docs, np.float64)
        for lo in range(0, n_docs, chunk_rows):
            hi = min(lo + chunk_rows, n_docs)
            cl = int(lens[lo:hi].max()) if hi > lo else 0
            if cl == 0:
                m[lo:hi] = 0.0
                continue
            idx = np.full((hi - lo, cl), n_buckets, np.int64)
            for j in range(lo, hi):
                idx[j - lo, : lens[j]] = flat[starts[j] : starts[j + 1]]
            m[lo:hi] = np.cumsum(w_ext[idx], axis=1)[:, -1]
        m = bias + m
        g = 1.0 / (1.0 + np.exp(-m)) - y
        q = np.floor(g * scale).astype(np.int64)
        acc = np.zeros(n_buckets, np.int64)
        np.add.at(acc, flat, np.repeat(q, lens))
        bias_s = int(q.sum())
        w = w - lr * (acc.astype(np.float64) / denom)
        bias = bias - lr * (float(bias_s) / denom)
    return [float(x) for x in w], float(bias)


def train_logreg_hashed(
    df: DataFrame,
    label: Column,
    n_buckets: int = 1024,
    iters: int = 8,
    lr: float = 4.0,
    scale: int = SCALE,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_max_docs: "int | None" = None,
) -> "tuple[list[float], float, DataFrame]":
    """Full-batch gradient descent for logistic regression on hashed
    n-gram features, every cross-row sum exact-integer (module
    docstring). Returns ``(weights, bias, features)`` where features is
    the checkpointed (id, y, __b) frame — reuse it for scoring so the
    corpus is tokenized exactly once.

    Small corpora train on the DRIVER: each distributed GD iteration is
    one blocking scheduler job whose real work at small N is
    milliseconds — 8 iterations pay ~8x fixed job overhead. Below
    ``driver_max_docs`` documents (default env
    ``SPARK_GRAFT_CLF_DRIVER_MAX_DOCS`` = 200000; the gradient state
    was ALWAYS collected per iteration — this additionally collects the
    (y, __b) features once, ~1 KB/doc) the identical op sequence runs
    in numpy (:func:`_train_gd_driver`, bit-equality pinned in pytest
    both paths). A 100 TB corpus past the cap takes the distributed
    loop unchanged; pass ``driver_max_docs=0`` to force it."""
    import os as _os

    feats = _bucketize(df, label, n_buckets, text_col, id_col).transform(truncate_lineage)
    n_docs = feats.count()  # exact; also materializes the checkpoint
    w = [0.0] * n_buckets
    bias = 0.0
    if n_docs == 0:  # empty corpus: zero model, no 0-division in updates
        return w, bias, feats
    if driver_max_docs is None:
        driver_max_docs = int(
            _os.environ.get("SPARK_GRAFT_CLF_DRIVER_MAX_DOCS", "200000")
        )
    if driver_max_docs and n_docs <= driver_max_docs:
        pdf = feats.select("y", "__b").toPandas()
        w, bias = _train_gd_driver(
            pdf["y"].to_list(), pdf["__b"].to_list(),
            n_buckets, iters, lr, scale, n_docs,
        )
        return w, bias, feats
    for _ in range(int(iters)):
        g = (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w, bias))) - F.col("y")
        ).alias("g")
        # ONE job per iteration: with presence features every bucket's
        # per-doc contribution IS the bias contribution floor(g*scale),
        # so the bias gradient rides the same explode+sum as sentinel
        # bucket -1 instead of paying a second corpus scan
        grad = (
            feats.select(g, "__b")
            .select(
                F.explode(
                    F.concat(F.col("__b"), F.array(F.lit(-1)))
                ).alias("bucket"),
                F.floor(F.col("g") * scale).alias("q"),
            )
            .groupBy("bucket")
            .agg(F.sum("q").alias("s"))
            .collect()
        )
        sums = {r.bucket: r.s for r in grad}
        bias_s = sums.pop(-1, 0)
        # identical op order to the SQL twin: w - lr*(s/(N*scale)),
        # with BOTH operands cast to double BEFORE dividing — DuckDB's
        # CAST(s AS DOUBLE)/(cnt*sc) rounds each side to double first,
        # while Python's int/int is correctly-rounded rational
        # division; they agree only below 2^53, and N*scale exceeds
        # that within this module's own 100 TB ambitions
        denom = float(n_docs * scale)
        w = [
            w[b] - lr * (float(sums.get(b, 0)) / denom)
            for b in range(n_buckets)
        ]
        bias = bias - lr * (float(bias_s or 0) / denom)
    return w, bias, feats


def _score_col(w: list[float], bias: float) -> Column:
    """ROUND(9) sigmoid of the margin — THE scoring expression; the
    single source of truth the SQL twin mirrors."""
    return F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w, bias))), 9
    )


def _attach_keep(
    scored: DataFrame, id_col: str, alpha: float, seed: int
) -> DataFrame:
    """Append the Pareto-lottery ``keep`` verdict to a scored frame."""
    return scored.withColumn(
        "keep", pareto_keep(F.col("clf_score"), F.col(id_col), alpha, seed)
    )


def classifier_score(
    feats: DataFrame, w: list[float], bias: float, id_col: str = "doc_id"
) -> DataFrame:
    """(id, clf_score ROUND 9) for a (id, y, __b) features frame — a
    narrow per-row fold, no shuffle."""
    return feats.select(
        F.col(id_col), _score_col(w, bias).alias("clf_score")
    )


def pareto_keep(
    score_rounded: Column, id_col: Column, alpha: float = PARETO_ALPHA,
    seed: int = 42,
) -> Column:
    """GPT-3's lottery: keep iff score > 1 - pareto(alpha) draw, with
    the draw derived deterministically from md5(seed:id) (hash_sample's
    uniform) so replays/repartitions agree. Inverse-CDF:
    pareto = (1-u)^(-1/alpha) - 1. Both sides ROUND(9) so engines
    compare identical doubles."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed) + ":"), id_col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = h / F.lit(float(1 << 32))
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return score_rounded > F.round(F.lit(1.0) - pareto, 9)


def quality_classifier(
    df: DataFrame,
    label: Column,
    n_buckets: int = 1024,
    iters: int = 8,
    lr: float = 4.0,
    scale: int = SCALE,
    alpha: float = PARETO_ALPHA,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end learned filter: train on the in-corpus ``label`` slice
    (the reference-quality proxy, e.g. lang=='en' — same slice-as-target
    convention as dsir_select), score every document, attach the Pareto
    lottery verdict. Output (id, y, clf_score, keep)."""
    w, bias, feats = train_logreg_hashed(
        df, label, n_buckets, iters, lr, scale, text_col, id_col
    )
    scored = feats.select(
        F.col(id_col),
        F.col("y").cast("int").alias("y"),
        _score_col(w, bias).alias("clf_score"),
    )
    return _attach_keep(scored, id_col, alpha, seed)


# --------------------------------------------------------------------- #
# Persisted model store: train once on the reference corpus, score every
# later ingest batch without retraining (the store twin every operator
# family ships). The model is n_buckets+1 doubles — KBs — so the store
# is a tiny parquet plus the repo's data-first/meta-last commit marker.
# --------------------------------------------------------------------- #


def write_classifier_model(
    spark,
    w: list[float],
    bias: float,
    path: str,
) -> None:
    """Persist (weights, bias): weights at ``path/weights`` (bucket, w
    rows), then ``path/meta.json`` (bias + n_buckets) atomically LAST —
    meta's existence is the commit marker. A rebuild over an existing
    store retracts the old meta FIRST, so a crash at any point leaves
    either no marker (clearly uncommitted; re-run rebuilds) or a fully
    committed model — never the old meta over half-overwritten weights
    (store_commit module docstring)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    SC.retract_meta(path)
    # repartition(1), NOT coalesce(1): coalescing a Python-local
    # (parallelized) frame folds its ~n_cores pickled slices into ONE
    # task that pays a Python-runner handshake per slice — a flat
    # ~4.8s at local[32] regardless of row count (measured; the
    # repartition keeps the slices parallel and shuffles 1024 rows,
    # 0.33s). Readers index rows by bucket, so file row order is free.
    local_rows_df(
        spark, [(b, float(x)) for b, x in enumerate(w)],
        "bucket int, w double",
    ).repartition(1).write.mode("overwrite").parquet(path + "/weights")
    SC.commit_meta(path, {"bias": float(bias), "n_buckets": len(w)})


def read_classifier_model(spark, path: str) -> "tuple[list[float], float]":
    """(weights, bias) back as driver-side values — the model is
    n_buckets doubles, the same bounded state it was at training."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    rows = spark.read.parquet(path + "/weights").collect()
    w = [0.0] * int(meta["n_buckets"])
    for r in rows:
        w[r.bucket] = float(r.w)
    return w, float(meta["bias"])


def train_and_write_classifier(
    df: DataFrame,
    label: Column,
    path: str,
    n_buckets: int = 1024,
    iters: int = 8,
    lr: float = 4.0,
    scale: int = SCALE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "tuple[list[float], float]":
    """Convenience: train on the reference corpus and publish the model."""
    w, bias, _feats = train_logreg_hashed(
        df, label, n_buckets, iters, lr, scale, text_col, id_col
    )
    write_classifier_model(df.sparkSession, w, bias, path)
    return w, bias


def _model_id(w: "list[float]", bias: float) -> str:
    """Deterministic fingerprint of a loaded model (weights + bias as
    repr'd doubles) — stamped onto every gate verdict row so verdicts
    produced under DIFFERENT persisted models are detectable."""
    import hashlib

    payload = ",".join(repr(float(x)) for x in list(w) + [float(bias)])
    return hashlib.md5(payload.encode()).hexdigest()[:16]


class StreamingClassifierGate:
    """foreachBatch quality gate — the streaming twin every store
    family ships: each micro-batch of documents is scored under the
    PERSISTED model (no retraining, no read of other batches) and its
    verdicts land at ``out_path/batch_id=N`` with mode=overwrite, so an
    at-least-once REPLAY of batch N overwrites its own directory
    instead of duplicating verdicts (streaming/monitor.py's idempotent
    foreachBatch discipline). Model weights load once per gate
    instance — n_buckets+1 doubles, not per-batch I/O.

    Model-version caveat: per-batch idempotence holds only while the
    persisted model is unchanged — if the store is RETRAINED and a
    restarted gate replays an old batch, batch N's directory is
    overwritten with verdicts from the NEW model. Every verdict row
    therefore carries ``model_id`` (md5 of the loaded weights+bias),
    so a mixed-model verdict set is detectable at read time —
    ``SELECT DISTINCT model_id`` > 1 row — rather than silent; gates
    that must never mix should drain before retraining."""

    def __init__(
        self,
        model_path: str,
        out_path: str,
        alpha: float = PARETO_ALPHA,
        seed: int = 42,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.model_path = model_path
        self.out_path = out_path
        self.alpha = alpha
        self.seed = seed
        self.text_col = text_col
        self.id_col = id_col
        self._model: "tuple[list[float], float] | None" = None

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        # persist around the two actions (emptiness probe + verdict
        # write) so the source batch is scanned once, not twice
        batch_df.persist()
        try:
            if not batch_df.take(1):
                return
            if self._model is None:
                w, bias = read_classifier_model(
                    batch_df.sparkSession, self.model_path
                )
                self._model = (w, bias, _model_id(w, bias))
            w, bias, model_id = self._model
            feats = _bucketize(
                batch_df, F.lit(False), len(w), self.text_col, self.id_col
            )
            verdicts = _attach_keep(
                classifier_score(feats, w, bias, self.id_col),
                self.id_col,
                self.alpha,
                self.seed,
            ).withColumn("model_id", F.lit(model_id))
            verdicts.write.mode("overwrite").parquet(
                f"{self.out_path}/batch_id={batch_id}"
            )
        finally:
            batch_df.unpersist()

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        return (
            stream_df.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.foreach_batch)
            .trigger(**trigger_kwargs)
            .start()
        )


def read_gate_verdicts(spark, path: str) -> DataFrame:
    """All gate verdicts with their batch_id partition column."""
    return spark.read.option("basePath", path).parquet(path)


def classifier_score_from_store(
    df: DataFrame,
    path: str,
    alpha: float = PARETO_ALPHA,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score an INCREMENTAL ingest batch under the PERSISTED model —
    the quality gate a 100 TB pipeline applies per crawl batch without
    retraining. n_buckets comes from the store's meta (never the
    caller: mixing bucketizations would silently mis-route features).
    One narrow scan, no shuffle; scores equal the in-plan
    :func:`classifier_score` on the same docs exactly (pytest-pinned).
    Output (id, clf_score, keep)."""
    spark = df.sparkSession
    w, bias = read_classifier_model(spark, path)
    feats = _bucketize(df, F.lit(False), len(w), text_col, id_col)
    return _attach_keep(
        classifier_score(feats, w, bias, id_col), id_col, alpha, seed
    )


# --------------------------------------------------------------------- #
# DuckDB oracle: the SAME training unrolled as chained CTEs (one
# m{i}/grad{i}/w{i} block per GD iteration — the pagerank unrolled-CTE
# playbook applied to model training).
# --------------------------------------------------------------------- #


def sql_quality_classifier(
    table: str = "documents",
    label_sql: str = "lang = 'en'",
    n_buckets: int = 1024,
    iters: int = 8,
    lr: float = 4.0,
    scale: int = SCALE,
    alpha: float = PARETO_ALPHA,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Exact DuckDB twin of :func:`quality_classifier`: identical md5
    buckets, left-fold margins, floor-quantized integer gradient sums,
    identical IEEE weight updates, ROUND(9) score and lottery."""
    t = sql_tokens(f"COALESCE({text_col}, '')")
    lr_f, sc = float(lr), int(scale)
    blocks = [
        f"""
        tk AS (
            SELECT {id_col},
                   CAST(CAST(COALESCE({label_sql}, FALSE) AS INT) AS DOUBLE) AS y,
                   {t} AS t
            FROM {table}
        ),
        base AS MATERIALIZED (
            SELECT {id_col}, y,
                   list_sort(list_distinct(list_transform(
                       list_concat(
                           t,
                           list_transform(range(1, len(t)),
                                          i -> t[i] || ' ' || t[i + 1])
                       ),
                       g -> CAST(('0x' || substr(md5(g), 1, 8))::BIGINT
                                 % {n_buckets} AS INTEGER)
                   ))) AS bks
            FROM tk
        ),
        nn AS MATERIALIZED (SELECT COUNT(*) AS cnt FROM base),
        w0 AS (SELECT (SELECT list(0.0) FROM range({n_buckets})) AS arr,
                      0.0 AS bias)"""
    ]
    for i in range(1, int(iters) + 1):
        blocks.append(
            f"""
        m{i} AS MATERIALIZED (
            SELECT b.{id_col}, b.y, b.bks,
                   1.0 / (1.0 + exp(-(
                       w{i-1}.bias + CASE WHEN len(b.bks) = 0 THEN 0.0
                           ELSE list_reduce(
                               list_prepend(0.0,
                                   list_transform(b.bks,
                                       bk -> w{i-1}.arr[bk + 1])),
                               (a, x) -> a + x) END
                   ))) - b.y AS g
            FROM base b, w{i-1}
        ),
        grad{i} AS MATERIALIZED (
            SELECT u.bk AS bucket,
                   SUM(CAST(floor(u.g * {sc}) AS BIGINT)) AS s
            FROM (SELECT g, unnest(bks) AS bk FROM m{i}) u
            GROUP BY 1
        ),
        w{i} AS MATERIALIZED (
            SELECT (SELECT list(
                        w{i-1}.arr[CAST(gr.range AS INTEGER) + 1]
                        - {lr_f} * (CAST(COALESCE(g2.s, 0) AS DOUBLE)
                                    / (nn.cnt * {sc}))
                        ORDER BY gr.range)
                    FROM range({n_buckets}) gr
                    LEFT JOIN grad{i} g2 ON g2.bucket = gr.range
                    CROSS JOIN nn) AS arr,
                   w{i-1}.bias - {lr_f} * (
                       CAST(COALESCE((SELECT SUM(CAST(floor(g * {sc}) AS BIGINT))
                                      FROM m{i}), 0) AS DOUBLE)
                       / ((SELECT cnt FROM nn) * {sc})) AS bias
            FROM w{i-1}
        )"""
        )
    T = int(iters)
    return (
        "WITH "
        + ",".join(blocks)
        + f"""
        , scored AS (
            SELECT b.{id_col}, CAST(b.y AS INTEGER) AS y,
                   ROUND(1.0 / (1.0 + exp(-(
                       w{T}.bias + CASE WHEN len(b.bks) = 0 THEN 0.0
                           ELSE list_reduce(
                               list_prepend(0.0,
                                   list_transform(b.bks,
                                       bk -> w{T}.arr[bk + 1])),
                               (a, x) -> a + x) END
                   ))), 9) AS clf_score
            FROM base b, w{T}
        )
        SELECT {id_col}, y, clf_score,
               clf_score > ROUND(1.0 - (POW(1.0 -
                   CAST(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) / 4294967296.0,
                   {-1.0 / float(alpha)!r}) - 1.0), 9) AS keep
        FROM scored
        """
    )
