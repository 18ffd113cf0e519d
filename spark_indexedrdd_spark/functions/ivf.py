"""IVF (inverted-file) approximate nearest neighbor — the clustering
counterpart to hyperplane LSH (functions/similarity.py).

Index build: centroids over (a sample of) the corpus; every vector is
assigned to its nearest centroid (the "inverted list"). Query: score
each query against the centroids only, probe the ``n_probe`` nearest
lists, exact-rerank inside them.

Scale: the centroid set is tiny and ships INSIDE the assignment UDF —
assignment and probe selection are pure per-row projections (one
Arrow-vectorized pandas UDF over the scan, bit-exact sequential
accumulation), so between the corpus scan and the candidate join there
is NO exchange at all. (The first implementation
crossJoined the corpus against the centroid table and picked the argmax
with a window partitioned by vec_id — a k×-amplified full-corpus
shuffle that existed only to compute an argmax. At 100 TB with k=16
that shuffle IS the job; the vectorized projection deletes it.)
The probe side (q × n_probe rows) is broadcast into the candidate
equi-join, so the corpus is scanned exactly once, never shuffled; the
only exchange in the whole query is the final top-k window over the
(small) candidate set — the same terminal shape as hyperplane LSH.

A persisted index would additionally write ``assigned`` partitioned BY
cluster_id so a probe reads only n_probe/k of the files; ``build_ivf``
keeps that repartition available for that use.

Two centroid modes:

- ``kmeans`` (default): seeded driver-side numpy Lloyd's over a capped
  bounded sample (the PQ codebooks' ``_lloyd_np``). Best recall; NOT
  SQL-reproducible (float reductions with engine-specific summation)
  — the driver records a rows-only check for it.
- ``det``: the embeddings of the k smallest vec_ids, taken as
  centroids verbatim (no iterations). Every arithmetic step — the
  assignment argmax, the probe ranking, the re-rank cosine — is a
  sequential double fold, so :func:`sql_ivf_ann` reproduces the result
  bit-exactly in DuckDB and the IVF *pipeline* (assign → probe →
  re-rank) gets a hash-checked driver row. Recall is worse than
  kmeans (centroids are arbitrary corpus points); it is the
  correctness twin, not the quality path.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions.vectors import cosine, dot, norm
from spark_indexedrdd_spark.localframe import local_rows_df


# KMeans training-set cap: centroid quality saturates long before the
# full corpus — fit on a seeded sample of at most this many vectors and
# assign the FULL corpus afterwards. Keeps the iterative fit bounded
# (~100k × dim doubles) no matter the corpus size.
TRAIN_SAMPLE_CAP = 100_000

# The bounded size probe counts at most this many rows (CollectLimit
# short-circuits, so this is never a full scan). 20× the cap keeps the
# derived sample fraction CONTINUOUS at the cap boundary: with the old
# fixed 5% fraction, a corpus of cap+1 rows suddenly trained on ~5k
# vectors instead of ~100k.
_PROBE_LIMIT = 20 * TRAIN_SAMPLE_CAP

# Byte ceiling on the collected kmeans training sample (the row cap is
# min(TRAIN_SAMPLE_CAP, this / (dim * 8)) — see _train_sample). Env-
# overridable for clusters with bigger driver heaps.
TRAIN_SAMPLE_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_TRAIN_SAMPLE_MAX_BYTES", str(256 * 1024 * 1024))
)


def _py_norm(vec: "list[float]") -> float:
    """L2 norm with the exact IEEE sequence of ``vectors.dot(a, a)``:
    a left fold of x*x products in array order, then sqrt. Computing it
    driver-side (the centroid is driver-side anyway) keeps the literal
    bit-identical to what either engine would compute from the data."""
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _train_sample(
    emb: DataFrame, seed: int, id_col: str, vec_col: str
):
    """The seeded, capped kmeans training sample as a driver-side
    (rows, dim) float64 numpy array — ONE collect shared by every fit
    that needs it (centroids AND the PQ residual codebooks; the det
    method's ``_det_head`` analog). Bounded-probe count:
    limit(N).count() short-circuits after N rows, so deciding the
    sample fraction never costs a full scan; the fraction scales to
    land near the cap instead of a fixed 5% (continuous through the
    cap boundary — cap+1 rows → fraction ≈ 1.0 → still ~cap training
    vectors; past the probe limit n_bounded saturates and the fraction
    floors at 5%, >100k of >2M rows, trimmed back by limit()).

    Driver memory: the row cap is BYTE-derived — min(100k rows,
    ``TRAIN_SAMPLE_MAX_BYTES`` / (dim × 8)) — so a high-dim corpus
    cannot OOM the driver (at dim 768 a flat 100k rows would be
    ~614 MB of float64 plus Python-list transients; the byte cap
    holds the array near 256 MB at any dim). The collected rows go
    straight into one numpy array, never a second list-of-lists copy.
    An empty corpus raises a deliberate ValueError instead of
    propagating numpy internals from ``_lloyd_np``."""
    import numpy as np

    n_bounded = emb.select(id_col).limit(_PROBE_LIMIT + 1).count()
    if n_bounded == 0:
        raise ValueError(
            "kmeans fit needs a non-empty corpus (0 embedding rows) — "
            "use method='det' semantics only over non-empty data too"
        )
    peek = emb.select(vec_col).limit(1).collect()  # CollectLimit: 1 row
    dim = len(peek[0][0]) if peek and peek[0][0] is not None else 1
    cap = max(1, min(TRAIN_SAMPLE_CAP, TRAIN_SAMPLE_MAX_BYTES // (dim * 8)))
    if n_bounded <= cap:
        train = emb
    else:
        frac = min(1.0, max(0.05, 1.1 * cap / n_bounded))
        train = emb.sample(fraction=frac, seed=seed).limit(cap)
    return np.array(
        [r[0] for r in train.select(vec_col).collect()], dtype=np.float64
    )


def _kmeans_centroids(
    emb: DataFrame,
    k: int,
    seed: int,
    id_col: str,
    vec_col: str,
    sample: "list[list[float]] | None" = None,
) -> "list[list[float]]":
    """Lloyd's centroids over a seeded sample of at most
    ``TRAIN_SAMPLE_CAP`` vectors — driver-side numpy Lloyd's (the PQ
    codebooks' ``_lloyd_np``, same 10 iterations), NOT a pyspark.ml
    fit: the sample is capped regardless of corpus size (row AND byte
    cap — ``TRAIN_SAMPLE_MAX_BYTES``, ~256 MB of float64 at any dim),
    and the ml estimator spent ~10 Spark jobs of scheduling on data
    that fits in driver numpy (guide §4.2 — let Spark distribute the
    corpus-sized work, hand the bounded kernel to native code; r14).
    ``sample`` shares one collected training sample across fits."""
    import numpy as np

    from spark_indexedrdd_spark.functions.pq import _lloyd_np

    if sample is None:
        sample = _train_sample(emb, seed, id_col, vec_col)
    x = np.asarray(sample, dtype=np.float64)
    return [[float(v) for v in c] for c in _lloyd_np(x, k, seed)]


def _det_head(
    emb: DataFrame, n: int, id_col: str, vec_col: str
) -> "list[list[float]]":
    """ONE TakeOrdered pass for the first-n-by-id embeddings. In det
    mode both the centroid fit (first n_clusters) and the PQ codebook
    fit (first ksub) read prefixes of this list, so composite callers
    (IVFPQ query/build paths) collect max(n_clusters, ksub) rows once
    instead of running two identical full-corpus TakeOrdered jobs."""
    rows = emb.orderBy(id_col).limit(n).select(vec_col).collect()
    return [[float(x) for x in r[0]] for r in rows]


def _det_centroids(
    emb: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    head: "list[list[float]] | None" = None,
) -> "list[list[float]]":
    """The embeddings of the k smallest ids, verbatim — deterministic
    and reproducible from the data by any engine (the SQL twin derives
    the identical set with ORDER BY id LIMIT k). ``head`` supplies a
    pre-collected :func:`_det_head` prefix (len ≥ k) to skip the
    scan."""
    if head is not None:
        return [list(v) for v in head[:k]]
    return _det_head(emb, k, id_col, vec_col)


def _centroids(
    emb: DataFrame,
    k: int,
    seed: int,
    id_col: str,
    vec_col: str,
    method: str,
    head: "list[list[float]] | None" = None,
    sample: "list[list[float]] | None" = None,
) -> "list[tuple[list[float], float]]":
    if method == "det":
        cents = _det_centroids(emb, k, id_col, vec_col, head=head)
    elif method == "kmeans":
        cents = _kmeans_centroids(emb, k, seed, id_col, vec_col, sample=sample)
    else:
        raise ValueError(f"unknown IVF centroid method: {method!r}")
    return [(c, _py_norm(c)) for c in cents]


def _centroid_sims_np(emb_series, cents: "list[tuple[list[float], float]]"):
    """(n, k) float64 matrix of dot(vec, centroid_j) / ||centroid_j||.

    Bit-exactness (what the det oracle depends on, same argument as
    similarity._signature_udf): each centroid dot accumulates
    dimension-by-dimension — ``acc += v[:, i] * c[i]`` — sequential over
    dimensions, vectorized over ROWS, so per row it is exactly the left
    fold DuckDB's ``list_reduce`` computes. ``np.dot``/``@`` would be
    faster but block-reorders the summation and breaks parity. The
    query-side norm is constant per row, so dividing by it cannot
    change any argmax/ranking and is omitted on both engines."""
    import numpy as np

    v = np.array(emb_series.tolist(), dtype=np.float64)  # f32→f64 exact
    sims = np.empty((v.shape[0], len(cents)), dtype=np.float64)
    for j, (c, c_norm) in enumerate(cents):
        acc = np.zeros(v.shape[0], dtype=np.float64)
        for i, ci in enumerate(c):
            acc += v[:, i] * ci
        sims[:, j] = acc / c_norm
    return sims


def _assign_udf(cents: "list[tuple[list[float], float]]"):
    """Arrow-vectorized nearest-centroid assignment: int cluster_id per
    row. ``np.argmax`` returns the FIRST index of the max, so sim ties
    resolve to the smallest cluster_id — the same tie-break the SQL
    twin's ROW_NUMBER uses. A narrow projection (one UDF node, constant
    plan size): no join, no window, no shuffle. Measured (sf0.1,
    local[32]): the interpreted per-row HOF-fold form of this same
    arithmetic cost ~1.9s of the query; this is the same Arrow form
    that took the LSH signatures 5.8s → 1.0s."""
    import numpy as np
    import pandas as pd

    def assign(emb: "pd.Series") -> "pd.Series":
        sims = _centroid_sims_np(emb, cents)
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    assign.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf(assign, "int")


def _probe_udf(cents: "list[tuple[list[float], float]]", n_probe: int):
    """Arrow-vectorized probe selection: array<int> of the n_probe
    nearest cluster_ids, best first. Stable argsort on -sims keeps
    original (ascending cluster_id) order on ties — identical ordering
    to the SQL twin's (sim DESC, cluster_id) window."""
    import numpy as np
    import pandas as pd

    def probes(emb: "pd.Series") -> "pd.Series":
        sims = _centroid_sims_np(emb, cents)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    probes.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return F.pandas_udf(probes, "array<int>")


def build_ivf(
    emb: DataFrame,
    k: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    repartition_lists: bool = True,
    cand_filter: "str | None" = None,
) -> "tuple[DataFrame, list[tuple[list[float], float]]]":
    """Returns (assigned, centroids): ``assigned`` is the corpus with a
    cluster_id column (the inverted file); ``centroids`` is the
    driver-side [(vector, norm), ...] list whose index is the
    cluster_id. Assignment is a narrow Arrow-vectorized projection — no
    join, no window, no shuffle (cf. module docstring).

    ``repartition_lists=True`` additionally clusters the rows by
    cluster_id — the layout a PERSISTED index wants (each inverted list
    co-located / one file group per list, so probes prune). One-shot
    queries should pass False: their candidate join broadcasts the probe
    side, which needs no co-location.

    ``cand_filter`` (filtered ANN, ``ivf_ann(filter_pred=)``) restricts
    the ASSIGNED rows only — the centroid fit always reads the full
    frame (the index is built once, filters vary per query), and the
    filter sits below the assignment projection so Catalyst pushes it
    into the source."""
    cents = _centroids(emb, k, seed, id_col, vec_col, method)
    cand_src = emb.where(cand_filter) if cand_filter else emb
    assigned = cand_src.select(
        F.col(id_col),
        F.col(vec_col),
        _assign_udf(cents)(F.col(vec_col)).alias("cluster_id"),
    )
    if repartition_lists:
        assigned = assigned.repartition("cluster_id")
    return assigned, cents


def ivf_ann(
    emb: DataFrame,
    query_ids: Iterable[int],
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    filter_pred: "str | None" = None,
) -> DataFrame:
    """IVF top-k: (q_id, cand_id, cosine_sim, rank). Approximate — a true
    neighbor in an unprobed list is missed; recall is tested on clustered
    data in tests/test_similarity.py and tests/test_ivf_clusters.py.

    ``filter_pred`` is FILTERED ANN (the classic hard case for vector
    indexes — here it is just a predicate): top-k among candidates
    satisfying a metadata predicate (e.g. ``"label % 2 = 0"``),
    PREFILTER semantics — ranks are recut over the matching candidates,
    never a post-filter of an unfiltered top-k (which under-fills k
    exactly when the filter is selective). Centroids still fit on the
    FULL corpus and queries are still looked up unfiltered: the filter
    restricts the RESULT space only, matching the persisted-store
    reality where the index is built once and filters vary per query.
    The predicate sits directly on the candidate scan, below the
    Arrow assignment projection — Catalyst pushes it into the source.

    ``method="kmeans"``: no SQL oracle (driver records a rows-only
    check) — Lloyd's centroid updates are float mean reductions whose
    summation order is engine-specific, so no ANSI-SQL formulation
    reproduces the corpus partition bit-exactly.
    End-to-end determinism within Spark is still pinned: fixed seed,
    fixed iteration count, rank ties broken by cand_id.

    ``method="det"``: first-k-ids centroids; every step is a sequential
    double fold, so :func:`sql_ivf_ann` is an EXACT DuckDB twin and the
    driver hash-checks the full assign → probe → re-rank pipeline.

    Plan shape: corpus scanned once (assignment fused into the scan
    projection), probe side broadcast, one window over the candidate
    set. ``.explain()`` shows no exchange between the scan and the
    candidate join."""
    assigned, cents = build_ivf(
        emb, n_clusters, seed, id_col, vec_col, method,
        repartition_lists=False, cand_filter=filter_pred,
    )

    probes = (
        emb.where(F.col(id_col).isin(list(query_ids)))
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("__qn"),
            F.explode(
                _probe_udf(cents, n_probe)(F.col(vec_col))
            ).alias("cluster_id"),
        )
    )

    # norms once per SIDE row, not per candidate pair: the interpreted
    # HOF fold costs O(dims) per evaluation and cosine() would re-fold
    # both norms for every (query, candidate) pair — dot/(qn*cn) is the
    # identical IEEE sequence (sqrt each, multiply, divide)
    cand = (
        F.broadcast(probes)
        .join(assigned.withColumn("__cn", norm(F.col(vec_col))), "cluster_id")
        .where(F.col("q_id") != F.col(id_col))
    )
    scored = cand.select(
        "q_id",
        F.col(id_col).alias("cand_id"),
        (dot(F.col("q_vec"), F.col(vec_col))
         / (F.col("__qn") * F.col("__cn"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "cand_id", "cosine_sim", F.col("rank").cast("int"))
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "det",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings, then mark a vector as a
    duplicate iff some SAME-CLUSTER vector with a smaller id has cosine
    similarity >= ``threshold``. Returns one verdict row per vector:
    (vec_id, cluster_id, keep, dup_of) where ``dup_of`` is the smallest
    such neighbor id (NULL when kept) — the deterministic stand-in for
    the paper's keep-farthest-from-centroid rule, chosen so the verdict
    is reproducible by any engine.

    Scale: this is the whole point of the clustering pass — the
    pairwise comparison is INTRA-CLUSTER only, never all-pairs. With k
    clusters the candidate pair count drops from N²/2 to ~N²/(2k)
    (uniform case); at 100 TB you raise k so the expected cluster fits
    a task (the paper also caps per-cluster membership). The plan:
    shuffle-free centroid assignment fused into the scan (cf. module
    docstring), ONE shuffle of the corpus on cluster_id for the
    self-join, then a left join of verdicts back onto the assignment —
    which reuses the same cluster_id partitioning.

    ``method="det"`` (default here, unlike ``ivf_ann``): first-k-ids
    centroids make the full verdict table fold-exact, so
    :func:`sql_semantic_dedup` is an exact DuckDB twin and the driver
    hash-checks this operator. ``method="kmeans"`` is the quality path
    at scale; its verdicts are deterministic within Spark but not
    SQL-reproducible (same Lloyd's caveat as ``ivf_ann``)."""
    assigned, _cents = build_ivf(
        emb, n_clusters, seed, id_col, vec_col, method, repartition_lists=False
    )
    from spark_indexedrdd_spark.functions.vectors import dot, norm

    normed = assigned.select(
        F.col(id_col),
        "cluster_id",
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),  # once per vector, not per pair
    )
    a = normed.select(
        F.col(id_col).alias("__a"), "cluster_id",
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = normed.select(
        F.col(id_col).alias("__b"), "cluster_id",
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    dup_of = (
        a.join(b, "cluster_id")
        .where(F.col("__b") < F.col("__a"))
        .where(
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
            >= F.lit(float(threshold))
        )
        .groupBy(F.col("__a").alias(id_col))
        .agg(F.min("__b").alias("dup_of"))
    )
    return (
        assigned.select(id_col, "cluster_id")
        .join(dup_of, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


# --------------------------------------------------------------------- #
# IVF store: the persisted-embedding path for continuous semantic dedup
# (the embedding-side analog of dedup.write_signature_store)
# --------------------------------------------------------------------- #


def write_ivf_store(
    emb: DataFrame,
    path: str,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    files_per_cluster: int = 1,
    keep_cols: "tuple[str, ...]" = (),
) -> None:
    """Materialize the corpus as a partitioned IVF index: vectors (with
    precomputed norms and centroid assignment) at ``path/vectors``
    PARTITIONED BY cluster_id — so any cluster-scoped read prunes to
    one directory — and the centroid table at ``path/centroids``.

    This is the one-time (per corpus) cost that makes per-batch
    incremental semantic dedup touch only the clusters the batch lands
    in: a batch hitting c of k clusters reads ~c/k of the stored
    vectors, and the centroids (k rows) are the only global state.

    Commit protocol (store_commit docstring): the old meta marker is
    retracted FIRST, the parts (vectors, centroids) land, then meta
    commits atomically — a crash mid-rebuild over an existing store
    leaves it clearly uncommitted instead of silently MIXING the old
    centroids with half-overwritten vectors (the lists would re-shape
    under every stored id).

    ``files_per_cluster`` sizes the layout: without the pre-write
    repartition below, every upstream task writes into every cluster
    directory — task_count × n_clusters small files, the classic
    partitionBy explosion (at 1,000 executors × 1,024 clusters that is
    a million files per build). Keying the shuffle by (cluster, a
    bounded id-hash salt) caps the store at exactly n_clusters ×
    files_per_cluster files; raise files_per_cluster until each file
    is ~maxPartitionBytes at your corpus size.

    ``keep_cols`` persists metadata columns alongside each vector
    (e.g. a label/date/source column) — the store then supports
    FILTERED ANN (``ivf_ann_from_store(filter_pred=...)``): the
    predicate lands in the pruned candidate scan as a parquet
    PushedFilter, so a filtered serve reads probed clusters and
    row-skips inside them, never a separate metadata join. keep_cols
    is recorded in meta; appends re-read it so batch schemas can't
    silently diverge."""
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.functions.vectors import norm

    SC.validate_keep_cols(emb, keep_cols, reserved=(id_col, vec_col))
    cents = _centroids(emb, n_clusters, seed, id_col, vec_col, method)
    assigned = emb.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("nrm"),
        _assign_udf(cents)(F.col(vec_col)).alias("cluster_id"),
        *[F.col(c) for c in keep_cols],
    )
    assigned = assigned.repartition(
        n_clusters * files_per_cluster,
        "cluster_id",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(files_per_cluster)),
    )
    # retract only once the non-destructive work (centroid fit) is done:
    # a failed FIT must not brick an intact committed store
    SC.retract_meta(path)
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(
        path + "/vectors"
    )
    spark = emb.sparkSession
    local_rows_df(
        spark,
        [(i, c, n) for i, (c, n) in enumerate(cents)],
        "cluster_id int, centroid array<double>, c_norm double",
    ).write.mode("overwrite").parquet(path + "/centroids")
    # manifest-pointer commit (r11): readers resolve the file set from
    # the committed meta, so appends become versioned-away snapshots
    # (ivf_ann_from_store as-of covers appends, not just deletes) and
    # a concurrent reader never sees a published-but-uncommitted batch
    SC.write_manifest(
        path, "base", SC.list_parquet_files(path + "/vectors")
    )
    SC.commit_meta(
        path,
        {
            "n_clusters": int(n_clusters),
            "method": str(method),
            "keep_cols": list(keep_cols),
            "id_col": id_col,
            "vec_col": vec_col,
            "files_per_cluster": int(files_per_cluster),
            "manifests": ["base"],
            "applied": [],
            # identity of THIS build: store_changes refuses an
            # interval that crosses a rebuild (ledgers reset)
            "build_token": os.urandom(8).hex(),
        },
    )


def _vectors_for_meta(spark, path: str, meta: dict) -> DataFrame:
    """The vector frame under ONE committed meta snapshot — shared
    protocol (store_commit.read_store_files; ``basePath`` preserves
    the cluster_id partition pruning), legacy directory fallback."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    return SC.read_store_files(
        spark, path, meta, "manifests", "vectors", base_path=True
    )


def read_ivf_store(
    spark, path: str, meta: "dict | None" = None
) -> "tuple[DataFrame, list[tuple[list[float], float]]]":
    """Returns (vectors, centroids) — vectors lazily from the committed
    file set (cluster_id filters prune directories), centroids as the
    driver-side list ``build_ivf`` produces. ``meta`` pins the vectors
    to ONE committed snapshot (the as-of serve path passes the resolved
    version's meta); default is the live committed meta.
    FileNotFoundError on an uncommitted (crashed-rebuild) store."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    if meta is None:
        meta = SC.read_meta(path)  # commit-marker check + file pointer
    rows = (
        spark.read.parquet(path + "/centroids")
        .orderBy("cluster_id")
        .collect()
    )
    cents = [([float(x) for x in r.centroid], float(r.c_norm)) for r in rows]
    return _vectors_for_meta(spark, path, meta), cents


def append_ivf_batch(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    files_per_cluster: "int | None" = None,
    batch_tag: "str | None" = None,
) -> bool:
    """Fold an accepted ingest batch into the store: assign with the
    STORED centroids (the index's clustering is fixed at build time —
    re-fitting would silently re-shape every list) and append into the
    per-cluster directories, with the same bounded-file-count shuffle
    as the build (write_ivf_store docstring).

    Commit protocol (r11 — store_commit.append_partitioned_store_batch,
    the postings store's staged manifest-pointer shape on the hive
    layout): the batch's file list lands in ``_manifests/<tag>.json``
    and ONE atomic meta commit makes it visible, so a concurrent serve
    sees entirely-pre-batch or entirely-post-batch vectors, and the
    version ledger's as-of surface covers appends
    (``ivf_ann_from_store(version=...)``). With a ``batch_tag`` the
    append is crash-replayable and exactly-once — returns False when
    the tag was already applied (the streaming ingest's replay guard);
    without one it is a direct append under an anonymous manifest.

    Delete-wins until compaction: ids currently tombstoned are
    EXCLUDED from the batch (broadcast anti-join). Without this, a
    re-ingested deleted id would be written but permanently shadowed
    by the serve path's tombstone anti-join — invisible rows on disk.
    To genuinely re-add a deleted id, compact first (which clears the
    tombstone list), then append."""
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.functions.vectors import norm

    spark = new_emb.sparkSession
    if batch_tag is not None:
        # replay fast-path: a committed tag returns before any store
        # scan (the shared machine re-checks under its own meta read)
        SC.validate_batch_tag(batch_tag)
        if SC.tag_is_applied(SC.read_meta(path), batch_tag):
            SC.cleanup_flat_staging(path, batch_tag)
            return False
    meta = SC.read_meta(path)
    # the BUILD's layout knob, unless the caller overrides: without
    # this, streaming appends to a files_per_cluster=4 store would
    # silently bucket with pmod(hash, 1) and diverge from the build
    # contract until the next OPTIMIZE (r11 review finding)
    fpc = int(files_per_cluster or meta.get("files_per_cluster", 1))
    _vecs, cents = read_ivf_store(spark, path, meta=meta)
    tomb = _tombstone_ids(
        spark, path, meta, id_col,
        _vecs.schema[id_col].dataType,
    )
    if tomb is not None:
        new_emb = new_emb.join(F.broadcast(tomb), id_col, "left_anti")
    # the store's keep_cols contract, not the batch's shape (names AND
    # types vs the persisted rows — store_commit.enforce_store_keep_cols)
    keep_cols = SC.enforce_store_keep_cols(meta, new_emb, store_df=_vecs)
    assigned = new_emb.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("nrm"),
        _assign_udf(cents)(F.col(vec_col)).alias("cluster_id"),
        *[F.col(c) for c in keep_cols],
    )
    assigned = assigned.repartition(
        len(cents) * fpc,
        "cluster_id",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(fpc)),
    )

    def _write(dest: str, mode: str) -> None:
        assigned.write.mode(mode).partitionBy("cluster_id").parquet(dest)

    return SC.append_partitioned_store_batch(
        path, batch_tag, _write, "vectors"
    )


def incremental_semantic_dedup_from_store(
    new_emb: DataFrame,
    path: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup verdicts for an INCREMENTAL ingest batch against the
    persisted IVF store: each new vector is assigned with the stored
    centroids (broadcast inside one Arrow UDF — no shuffle), compared
    against the store vectors of ITS OWN cluster (new×store) and
    against same-cluster vectors of the batch with smaller ids
    (new×new). The stored corpus is NEVER self-compared, and only the
    clusters the batch lands in are read — the cluster_id IN (...)
    filter prunes whole store directories.

    Id contract: batch ids must be larger than every stored id
    (monotone ingest order) — then a verdict here equals what the batch
    :func:`semantic_dedup` would say over (corpus ∪ batch) with the
    same centroids (pytest-pinned with det centroids). ``doc != doc``
    guards keep at-least-once replays (batch appended, checkpoint lost)
    from emitting self-pairs, mirroring the LSH store's note.

    Returns (vec_id, cluster_id, keep, dup_of) for the NEW ids only."""
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.functions.vectors import dot, norm

    spark = new_emb.sparkSession
    # ONE meta snapshot pins both the committed file set and the
    # tombstone set — a concurrent append/delete can't tear the view
    meta = SC.read_meta(path)
    _store_all, cents = read_ivf_store(spark, path, meta=meta)
    # committed tombstones (delete_ivf_ids) are dead for dedup too: a
    # removed vector must not claim new arrivals as its duplicates
    tomb = _tombstone_ids(
        spark, path, meta, id_col,
        _store_all.schema[id_col].dataType,
    )
    if tomb is not None:
        _store_all = _store_all.join(F.broadcast(tomb), id_col, "left_anti")
    new_n = new_emb.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
        _assign_udf(cents)(F.col(vec_col)).alias("cluster_id"),
    )
    hit = [
        r.cluster_id
        for r in new_n.select("cluster_id").distinct().collect()
    ]
    store = _store_all.where(F.col("cluster_id").isin(hit)).select(
        F.col(id_col).alias("__b"),
        F.col(vec_col).alias("vb"),
        F.col("nrm").alias("nb"),
        "cluster_id",
    )
    a = new_n.select(
        F.col(id_col).alias("__a"), "cluster_id",
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    nc = (
        a.join(store, "cluster_id")
        .where(F.col("__b") != F.col("__a"))
        .where(sim >= F.lit(float(threshold)))
        .select("__a", "__b")
    )
    b_new = new_n.select(
        F.col(id_col).alias("__b"), "cluster_id",
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    nn = (
        a.join(b_new, "cluster_id")
        .where(F.col("__b") < F.col("__a"))
        .where(sim >= F.lit(float(threshold)))
        .select("__a", "__b")
    )
    dup_of = (
        nc.unionByName(nn)
        .groupBy(F.col("__a").alias(id_col))
        .agg(F.min("__b").alias("dup_of"))
    )
    return (
        new_n.select(id_col, "cluster_id")
        .join(dup_of, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


# --------------------------------------------------------------------- #
# Tombstone deletes on the IVF store — IndexedRDD `delete(ks)` semantics
# (IndexedRDD.scala:120-123) carried onto the persisted vector index:
# the cheap incremental operation is a tombstone append + atomic meta
# commit; the expensive rewrite is an explicit, rebuild-class
# compaction. (Lucene/FAISS IDSelector and Delta deletion vectors use
# the same split for the same reason: rewriting a 100 TB index per
# takedown batch is not an option.)
# --------------------------------------------------------------------- #


def delete_ivf_ids(
    spark,
    path: str,
    ids,
    batch_tag: str,
    id_col: str = "vec_id",
) -> bool:
    """Tombstone-delete stored vectors by id. Returns False (replay
    no-op) when ``batch_tag`` was already applied.

    Commit protocol (store_commit module docstring, manifest-pointer
    shape): the tombstone parquet lands under ``tombstones/<tag>``
    first — INVISIBLE, because readers resolve the tombstone set from
    the tags a committed meta names — then one atomic meta rewrite
    records the tag. A crash before the commit leaves the delete
    unapplied and the replay's overwrite-mode rewrite of the same dir
    is exact, so re-delivery is idempotent, not just at-least-once.
    Snapshot isolation falls out of the single meta read on the serve
    path: a concurrent reader sees entirely-pre-delete or
    entirely-post-delete results, never a torn mix. Single-writer,
    like every meta-rewriting store path.

    ``ids`` is a Python iterable or a single-column DataFrame — a
    takedown batch at 100 TB can be millions of ids, so the DataFrame
    form never collects; the iterable form is the targeted-delete
    convenience. Deleting an id absent from the store is a no-op by
    construction (tombstones are anti-joined, not asserted)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    # pin the tombstone ids to the STORE's id type (the shared protocol
    # try_casts and refuses loudly — an anti-join between mismatched
    # types silently never matches); LAZY so a replayed tag returns
    # before the schema scan
    return SC.tombstone_delete(
        spark, path, ids, batch_tag, id_col,
        lambda: spark.read.parquet(path + "/vectors")
        .select(id_col).schema[0].dataType,
    )


def _tombstone_ids(
    spark, path: str, meta: dict, id_col: str, id_type=None
) -> "DataFrame | None":
    """The committed tombstone set under ONE meta snapshot (None when
    the store has no applied deletes) — shared protocol
    (store_commit.committed_tombstones). ``id_type`` should come from a
    frame the caller already holds; the vectors-schema fallback exists
    for callers without one (legacy pre-fix batches were written as
    long; values are preserved by the upcast they took, so casting back
    is exact for every type a long can hold)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    if id_type is None:
        id_type = (
            spark.read.parquet(path + "/vectors")
            .select(id_col)
            .schema[0]
            .dataType
        )
    return SC.committed_tombstones(spark, path, meta, id_col, id_type)


def ivf_ann_from_store(
    spark,
    path: str,
    query_ids: Iterable[int],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: "int | None" = None,
    filter_pred: "str | None" = None,
) -> DataFrame:
    """ANN top-k served FROM the persisted store: (q_id, cand_id,
    cosine_sim, rank), with committed tombstones excluded from both the
    query set and the candidates.

    ``filter_pred`` is FILTERED ANN on the at-rest index: candidates
    must satisfy a metadata predicate over the store's ``keep_cols``
    (``write_ivf_store(keep_cols=...)``), prefilter semantics — ranks
    recut over the matching candidates (``ivf_ann(filter_pred=)``
    docstring). The predicate composes with the cluster pruning: it
    sits on the pruned vectors scan, where Catalyst pushes it into the
    parquet source (PushedFilters, plan-asserted) — a filtered serve
    reads the probed clusters and row-group-skips inside them, never a
    separate metadata join. A predicate naming a column the build did
    not persist fails analysis loudly.

    Plan shape at scale: meta + centroids are one driver-side read;
    probe selection collects q × n_probe rows (bounded by the query
    batch); the candidate scan then carries ``cluster_id IN (probed)``
    — a partition-directory filter on the store layout, so a serve
    touching c of k clusters reads ~c/k of the index — and the
    tombstone set broadcasts into a left-anti join (never a shuffle of
    the candidates). The only exchange is the terminal top-k window,
    same as :func:`ivf_ann`.

    Parity: on a det-method store, serve-after-delete is bit-identical
    to the full-corpus-centroid / surviving-candidate DuckDB twin
    ``sql_ivf_ann(exclude_pred=...)`` (centroids were fit BEFORE the
    delete and are pinned by the store — deletion never re-shapes the
    lists).

    ``version`` serves AS OF an earlier committed meta, freezing BOTH
    the file set (the manifest pointer — appends after the snapshot
    are invisible, r11) and the tombstone set (a pre-takedown read
    still sees deleted vectors while compaction hasn't dropped them).
    On a legacy pre-manifest store the file pointer is absent and the
    as-of surface degrades to delete history only (one tagged append
    backfills the pointer)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.resolve_serve_meta(path, version)
    vecs, cents = read_ivf_store(spark, path, meta=meta)
    tomb = _tombstone_ids(
        spark, path, meta, id_col, vecs.schema[id_col].dataType
    )
    if tomb is not None:
        vecs = vecs.join(F.broadcast(tomb), id_col, "left_anti")
    probes = (
        vecs.where(F.col(id_col).isin(list(query_ids)))
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(
                _probe_udf(cents, n_probe)(F.col(vec_col))
            ).alias("cluster_id"),
        )
    )
    probe_rows = probes.collect()
    hit = sorted({r.cluster_id for r in probe_rows})
    # probe frame typed from the STORE's own schema, not a literal —
    # a store with string ids or float vectors would otherwise fail
    # (or silently mis-cast) at createDataFrame
    from pyspark.sql import types as T

    probe_schema = T.StructType(
        [
            T.StructField("q_id", vecs.schema[id_col].dataType),
            T.StructField("q_vec", vecs.schema[vec_col].dataType),
            T.StructField("cluster_id", T.IntegerType()),
        ]
    )
    probe_df = local_rows_df(
        spark, [(r.q_id, r.q_vec, r.cluster_id) for r in probe_rows],
        probe_schema,
    )
    cand_vecs = vecs.where(filter_pred) if filter_pred else vecs
    # same per-side norm hoist as ivf_ann: dot/(qn*cn) is cosine()'s
    # exact IEEE sequence with the two norm folds paid once per row
    # instead of once per candidate pair
    cand = (
        F.broadcast(probe_df.withColumn("__qn", norm(F.col("q_vec"))))
        .join(
            cand_vecs.where(F.col("cluster_id").isin(hit))
            .withColumn("__cn", norm(F.col(vec_col))),
            "cluster_id",
        )
        .where(F.col("q_id") != F.col(id_col))
    )
    scored = cand.select(
        "q_id",
        F.col(id_col).alias("cand_id"),
        (dot(F.col("q_vec"), F.col(vec_col))
         / (F.col("__qn") * F.col("__cn"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "cand_id", "cosine_sim", F.col("rank").cast("int"))
    )


def compact_ivf_store(
    spark,
    path: str,
    id_col: str = "vec_id",
) -> int:
    """Physically drop tombstoned vectors and clear the tombstone list.
    Returns the number of live vectors after compaction.

    Rebuild-class by design (docstring at delete_ivf_ids): survivors
    are re-written under the SAME stored centroid assignment (the
    cluster_id column is carried, never re-fit — compaction must not
    re-shape the lists). The rewrite lands in a SIBLING directory read
    from the old committed files — never a checkpoint of data whose
    directory is about to be overwritten, so the old store stays fully
    durable until the swap, and a session-level
    partitionOverwriteMode=dynamic can never leave an all-tombstoned
    cluster's stale files behind (the sibling starts empty). The swap
    is retract → dir rename → commit: a crash before it leaves the old
    store committed and untouched; inside it, loudly uncommitted with
    the compacted copy recoverable on disk. Run when the tombstone
    fraction justifies the rewrite — Delta's VACUUM/OPTIMIZE
    economics."""
    import os
    import shutil

    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    vecs, _cents = read_ivf_store(spark, path, meta=meta)
    tomb = _tombstone_ids(
        spark, path, meta, id_col, vecs.schema[id_col].dataType
    )
    if tomb is None:
        return vecs.count()
    survivors = vecs.join(F.broadcast(tomb), id_col, "left_anti")
    tmp = path + "__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    # same bounded-file-count shuffle as the build (one file per
    # cluster here; compaction is where small appended files re-merge)
    survivors.repartition("cluster_id").write.mode("overwrite").partitionBy(
        "cluster_id"
    ).parquet(tmp + "/vectors")
    # live count from the rewrite's parquet footers (driver-side
    # metadata, not a second scan of the survivors — r14)
    n_live = SC.parquet_rows_total(
        os.path.join(dp, f)
        for dp, _dn, fns in os.walk(tmp + "/vectors")
        for f in fns
        if f.endswith(".parquet")
    )
    SC.recheck_version(path, meta)  # abort BEFORE the destructive swap
    SC.retract_meta(path)  # <-- old store now loudly uncommitted
    shutil.rmtree(os.path.join(path, "vectors"), ignore_errors=True)
    os.replace(tmp + "/vectors", os.path.join(path, "vectors"))
    shutil.rmtree(os.path.join(path, "tombstones"), ignore_errors=True)
    # the destructive swap removed every old data file, so the manifest
    # lists and the retired-name collision ledger reset with it (the
    # rewrite=True commit advances the servability floor — no older
    # snapshot can resolve the dead names anymore)
    shutil.rmtree(os.path.join(path, "_manifests"), ignore_errors=True)
    SC.write_manifest(
        path, "base", SC.list_parquet_files(path + "/vectors")
    )
    meta["manifests"] = ["base"]
    meta.pop("retired_manifests", None)
    meta["deletes"] = []
    meta["compactions"] = int(meta.get("compactions", 0)) + 1
    SC.commit_meta(path, meta, rewrite=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return n_live


def optimize_ivf_store(
    spark,
    path: str,
    id_col: "str | None" = None,
    files_per_cluster: "int | None" = None,
) -> int:
    """Snapshot-PRESERVING compaction of the IVF store (the Delta
    OPTIMIZE half of the OPTIMIZE/VACUUM pair, vector-tier form;
    :func:`compact_ivf_store` is the destructive rebuild,
    ``store_commit.vacuum_store`` the retention reclaim): physically
    fold the tombstones and re-merge append-accumulated small
    per-cluster files into a fresh bounded file set — n_clusters ×
    files_per_cluster, the build's own layout knob — published through
    the ordinary manifest-pointer commit. Old versions' files are NOT
    touched, so every earlier snapshot keeps serving byte-identically
    and the servability floor does not move; ``vacuum_store`` reclaims
    them later. Returns the live vector count.

    The 100 TB shape: under continuous ingest
    (``streaming.dedup.streaming_semantic_dedup_ingest``) every
    micro-batch adds up to n_clusters files, so a year of hourly
    batches turns each probed-cluster read into a ~9k-file listing —
    this is the lever that keeps serve-side file resolution
    O(manifest), exactly the postings store's
    :func:`~spark_indexedrdd_spark.functions.retrieval.optimize_postings_store`.
    The survivors scan reads the committed files once and writes once
    — the same cost shape as an append of the live corpus; the stored
    ``cluster_id`` is carried, never re-fit (compaction must not
    re-shape the lists).

    Requires a manifest-pointer store (every r11+ build; one tagged
    append backfills older stores); refuses loudly on a legacy
    directory-listing store, where "unreferenced" is not
    well-defined."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    rel = SC.resolve_manifest_files(path, meta)
    if rel is None:
        raise ValueError(
            "optimize_ivf_store requires a manifest-pointer store; "
            "this store predates the pointer — one append backfills "
            "it, or rebuild"
        )
    id_col = id_col or meta.get("id_col", "vec_id")
    fpc = int(files_per_cluster or meta.get("files_per_cluster", 1))
    n_clusters = int(meta["n_clusters"])
    vecs = _vectors_for_meta(spark, path, meta)
    tomb = _tombstone_ids(
        spark, path, meta, id_col, vecs.schema[id_col].dataType
    )
    if tomb is not None:
        vecs = vecs.join(F.broadcast(tomb), id_col, "left_anti")
    survivors = vecs.repartition(
        n_clusters * fpc,
        "cluster_id",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(fpc)),
    )

    def _write(stage: str) -> None:
        survivors.write.mode("overwrite").partitionBy(
            "cluster_id"
        ).parquet(stage)

    SC.optimize_partitioned_store(path, meta, _write, "vectors")
    # live count from the just-committed manifest's parquet footers —
    # O(files) driver-side metadata, not a second full index scan
    # (the postings form reads its meta counters for the same reason);
    # the delete ledger was zeroed by the commit, so footer rows ==
    # live rows exactly (r14). Re-read the COMMITTED meta from disk:
    # counting must not depend on optimize_partitioned_store mutating
    # the caller's dict in place — a helper returning a fresh meta
    # would otherwise silently count the OLD manifest's files.
    meta_new = SC.read_meta(path)
    rel_new = SC.resolve_manifest_files(path, meta_new)
    if rel_new is not None:
        return SC.parquet_rows_total(
            os.path.join(path, "vectors", f) for f in rel_new
        )
    return _vectors_for_meta(spark, path, meta_new).count()


def ivf_changes(spark, path: str, v_from: int, v_to: int) -> DataFrame:
    """Version-to-version CDC on the IVF store: (vec_id, added|deleted)
    between two committed versions, reading only the interval's delta
    manifests and tombstone batches — O(delta), the postings store's
    ``postings_changes`` carried onto the vector tier (shared protocol,
    store_commit.store_changes). Refuses across an OPTIMIZE/compaction/
    rebuild boundary, where the ledgers reset."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    return SC.store_changes(
        spark, path, v_from, v_to, "manifests", "vectors"
    )


def sql_semantic_dedup(
    table: str = "embeddings",
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Exact DuckDB twin of ``semantic_dedup(..., method="det")`` — the
    cents/assigned CTEs are identical to :func:`sql_ivf_ann` (same
    bit-exactness argument); the verdict adds an intra-cluster pairwise
    threshold compare on the fold-exact cosine, which both engines
    evaluate on bit-identical doubles."""
    from spark_indexedrdd_spark.functions.vectors import sql_cosine, sql_dot, sql_norm

    c_sim = f"({sql_dot(f'e.{vec_col}', 'c.centroid')} / c.c_norm)"
    return f"""
        WITH cents AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS INTEGER) AS cluster_id,
                   {vec_col} AS centroid,
                   {sql_norm(vec_col)} AS c_norm
            FROM (SELECT {id_col}, {vec_col} FROM {table}
                  ORDER BY {id_col} LIMIT {n_clusters})
        ),
        assigned AS (
            SELECT {id_col}, {vec_col}, cluster_id FROM (
                SELECT e.{id_col}, e.{vec_col}, c.cluster_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.{id_col}
                           ORDER BY {c_sim} DESC, c.cluster_id
                       ) AS rn
                FROM {table} e CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        dup AS (
            SELECT a.{id_col}, MIN(b.{id_col}) AS dup_of
            FROM assigned a JOIN assigned b USING (cluster_id)
            WHERE b.{id_col} < a.{id_col}
              AND {sql_cosine(f'a.{vec_col}', f'b.{vec_col}')} >= {float(threshold)}
            GROUP BY a.{id_col}
        )
        SELECT a.{id_col}, a.cluster_id,
               d.dup_of IS NULL AS keep, d.dup_of
        FROM assigned a LEFT JOIN dup d USING ({id_col})
    """


def sql_ivf_ann(
    table: str = "embeddings",
    query_ids: Iterable[int] = (),
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_pred: "str | None" = None,
    filter_pred: "str | None" = None,
) -> str:
    """Exact DuckDB twin of ``ivf_ann(..., method="det")``.

    ``exclude_pred`` (e.g. ``"vec_id % 7 = 0"``) models a tombstone
    delete applied AFTER the index build: the centroid fit still reads
    the full table (the store pins centroids at build time — deletion
    never re-fits), while query selection and the candidate lists see
    only survivors. This is the oracle for
    :func:`ivf_ann_from_store` after :func:`delete_ivf_ids`.

    ``filter_pred`` is the FILTERED-ANN twin: it restricts the
    CANDIDATE lists only (queries still found unfiltered, centroids
    still full-fit) — the oracle for ``ivf_ann(filter_pred=)`` and the
    store serve with ``filter_pred=``. Composes with ``exclude_pred``
    (filtered serve on a store with tombstones).

    Bit-exactness argument (same as sql_hyperplane_lsh_ann): both sides
    use sequential double folds for every dot product; the centroid set
    is ORDER BY id LIMIT k on both sides; the Spark side's driver-side
    centroid norms (``_py_norm``) fold in the same IEEE sequence as
    ``sql_norm`` here; argmax ties resolve to the smallest cluster_id on
    both sides (array_position-of-first-max vs ROW_NUMBER ORDER BY sim
    DESC, cluster_id). The oracle's plan (cross join + windows) is the
    NAIVE formulation — parity requires identical values, not identical
    plans; the Spark side is the shuffle-free one."""
    from spark_indexedrdd_spark.functions.vectors import sql_cosine, sql_dot, sql_norm

    ids = ", ".join(str(i) for i in query_ids)
    live = f" WHERE NOT ({exclude_pred})" if exclude_pred else ""
    cand_conds = []
    if exclude_pred:
        cand_conds.append(f"NOT ({exclude_pred})")
    if filter_pred:
        cand_conds.append(f"({filter_pred})")
    cand_live = (" WHERE " + " AND ".join(cand_conds)) if cand_conds else ""
    c_sim = f"({sql_dot(f'e.{vec_col}', 'c.centroid')} / c.c_norm)"
    q_sim = f"({sql_dot(f'q.{vec_col}', 'c.centroid')} / c.c_norm)"
    return f"""
        WITH cents AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS INTEGER) AS cluster_id,
                   {vec_col} AS centroid,
                   {sql_norm(vec_col)} AS c_norm
            FROM (SELECT {id_col}, {vec_col} FROM {table}
                  ORDER BY {id_col} LIMIT {n_clusters})
        ),
        assigned AS (
            SELECT {id_col}, {vec_col}, cluster_id FROM (
                SELECT e.{id_col}, e.{vec_col}, c.cluster_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.{id_col}
                           ORDER BY {c_sim} DESC, c.cluster_id
                       ) AS rn
                FROM (SELECT * FROM {table}{cand_live}) e CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT q_id, q_vec, cluster_id FROM (
                SELECT q.{id_col} AS q_id, q.{vec_col} AS q_vec, c.cluster_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.{id_col}
                           ORDER BY {q_sim} DESC, c.cluster_id
                       ) AS rn
                FROM (SELECT * FROM {table} WHERE {id_col} IN ({ids}){live.replace(' WHERE ', ' AND ')}) q
                CROSS JOIN cents c
            ) WHERE rn <= {n_probe}
        ),
        scored AS (
            SELECT p.q_id, a.{id_col} AS cand_id,
                   {sql_cosine('p.q_vec', f'a.{vec_col}')} AS cosine_sim
            FROM probes p JOIN assigned a USING (cluster_id)
            WHERE p.q_id <> a.{id_col}
        ),
        ranked AS (
            SELECT q_id, cand_id, cosine_sim,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine_sim DESC, cand_id) AS INTEGER) AS rank
            FROM scored
        )
        SELECT q_id, cand_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
    """
