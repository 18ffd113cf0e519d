"""Product quantization (PQ) for vector search at corpus scale.

The reference engine has no vector surface at all (SURVEY.md §2.5 —
amplab/spark-indexedrdd stops at KV ops); this module extends the
similarity family (similarity.py, ivf.py, quant.py) with the standard
memory-compression path for billion-vector ANN (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 — public
paper): split each d-dim vector into ``m`` subspaces, learn a ``ksub``-
word codebook per subspace, store each vector as ``m`` small codes.
At d=64 float32 → m=8 one-byte codes that is a 32× scan-size reduction:
the ADC scan reads 8 bytes per candidate instead of 256, which is the
difference between an in-memory and an out-of-core index at 10^9+
vectors.

Design (same split as ivf.py):

- ``method="kmeans"``: per-subspace Lloyd's codebooks over a seeded
  bounded sample — the quality path; pyspark.ml float reductions are
  not SQL-reproducible, so no exact oracle (recall pinned in tests).
- ``method="det"``: codewords are the sub-slices of the first-ksub-
  by-id embeddings — every downstream step is a sequential double
  fold, so :func:`sql_pq_ann` is an EXACT DuckDB twin and the driver
  hash-checks the full train → encode → ADC pipeline.

Bit-exactness argument (same as ivf._centroid_sims_np): every distance
is accumulated dimension-by-dimension in subspace order — numpy
``acc = acc + diff*diff`` vectorized over rows, sequential over dims —
which per row is exactly the left fold DuckDB's list_reduce computes
(0.0 + t0 == t0 in IEEE). The ADC total folds the m per-subspace table
entries in subspace order on both engines. argmin ties resolve to the
smallest code on both sides (np.argmin first-index vs ROW_NUMBER
ORDER BY d, code).

Plan shape / scale:

- Encoding is a narrow Arrow-vectorized projection — no join, no
  window, no shuffle; it fuses into the scan stage and streams.
- ADC scoring is PURE JVM: the per-query distance tables (m × ksub
  doubles, built driver-side from the collected query rows — bounded
  by |queries|, the same driver-sized contract as multiget) are folded
  into the plan as literal arrays; each candidate costs m element_at
  lookups + m additions inside whole-stage codegen. No Python touches
  the corpus-sized path.
- The q×N scored relation windows on q_id — fine for the documented
  small-q use; at large q or corpus, compose with IVF probes (classic
  IVFPQ: ivf.build_ivf prunes to probed lists, then ADC re-ranks the
  survivors) so the scan never scores unprobed lists.
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import DataFrame, Window

from spark_indexedrdd_spark.localframe import local_rows_df
from pyspark.sql import functions as F

def _sub_bounds(d: int, m: int) -> "list[tuple[int, int]]":
    """[(lo, hi), ...) 0-based half-open dim ranges; d must divide by m."""
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    step = d // m
    return [(j * step, (j + 1) * step) for j in range(m)]


def _py_sub_dist(a: "list[float]", b: "list[float]") -> float:
    """Squared L2 with the exact IEEE sequence both engines use: left
    fold of (a_i-b_i)^2 terms in dimension order from 0.0."""
    acc = 0.0
    for x, y in zip(a, b):
        t = float(x) - float(y)
        acc = acc + t * t
    return acc


def _det_codebooks(
    emb: DataFrame,
    m: int,
    ksub: int,
    id_col: str,
    vec_col: str,
    head: "list[list[float]] | None" = None,
) -> "list[list[list[float]]]":
    """codebooks[sub][code] = sub-slice of the (code+1)-th embedding by
    id order — reproducible from the data by any engine (the SQL twin
    derives the identical codewords with ORDER BY id LIMIT ksub).
    ``head``: pre-collected ``ivf._det_head`` prefix (len ≥ ksub) —
    composite IVFPQ callers share one TakeOrdered pass with the
    centroid fit instead of two identical corpus scans."""
    if head is not None:
        vecs = [list(v) for v in head[:ksub]]
    else:
        rows = emb.orderBy(id_col).limit(ksub).select(vec_col).collect()
        vecs = [[float(x) for x in r[0]] for r in rows]
    if len(vecs) < ksub:
        raise ValueError(f"corpus has fewer than ksub={ksub} vectors")
    bounds = _sub_bounds(len(vecs[0]), m)
    return [[v[lo:hi] for v in vecs] for lo, hi in bounds]


def _lloyd_np(x, ksub: int, seed: int, iters: int = 10):
    """Seeded Lloyd's over an in-memory (n, dsub) float64 matrix.
    Deterministic for a fixed seed; empty clusters reseed to the points
    farthest from their assigned centroids (standard fix). Memory is
    n×ksub×8 bytes for the distance matrix — ~13 MB at the 100k cap
    with ksub=16."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = x.shape[0]
    cents = x[rng.choice(n, size=min(ksub, n), replace=False)].copy()
    if cents.shape[0] < ksub:  # tiny corpus: pad by repeating points
        pad = x[rng.choice(n, size=ksub - cents.shape[0])]
        cents = np.concatenate([cents, pad])
    for _ in range(iters):
        d2 = (
            (x ** 2).sum(axis=1, keepdims=True)
            - 2.0 * (x @ cents.T)
            + (cents ** 2).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        far = np.argsort(-d2[np.arange(n), assign])
        fi = 0
        for c in range(ksub):
            mask = assign == c
            if mask.any():
                cents[c] = x[mask].mean(axis=0)
            else:
                cents[c] = x[far[fi]]
                fi += 1
    return cents


def _kmeans_codebooks(
    emb: DataFrame,
    m: int,
    ksub: int,
    seed: int,
    id_col: str,
    vec_col: str,
    sample: "list[list[float]] | None" = None,
) -> "list[list[list[float]]]":
    """Per-subspace Lloyd's codebooks over ONE seeded bounded sample
    (``ivf._train_sample``'s continuous-fraction probe; pass
    ``sample`` to share a caller's collect). The sample is
    collected once and the m fits run DRIVER-SIDE in numpy
    (:func:`_lloyd_np`): the training set is capped at 100k rows
    regardless of corpus size, and m pyspark.ml fits at that scale cost
    m×(driver→cluster roundtrip + 10 Spark jobs) — measured 19.7 s of a
    20 s pq_encode bench at sf0.1 — versus well under a second of
    in-memory numpy for the identical math. Cluster-side ML earns its
    overhead only when the training data exceeds the driver, which the
    cap prevents by construction. Seeded per subspace (seed+j) so
    subspaces draw independent initializations."""
    import numpy as np

    if sample is None:
        from spark_indexedrdd_spark.functions.ivf import _train_sample

        sample = _train_sample(emb, seed, id_col, vec_col)
    v = np.asarray(sample, dtype=np.float64)
    return [
        [[float(x) for x in c] for c in _lloyd_np(v[:, lo:hi], ksub, seed + j)]
        for j, (lo, hi) in enumerate(_sub_bounds(v.shape[1], m))
    ]


def train_pq(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    head: "list[list[float]] | None" = None,
    sample: "list[list[float]] | None" = None,
) -> "list[list[list[float]]]":
    if method == "det":
        return _det_codebooks(emb, m, ksub, id_col, vec_col, head=head)
    if method == "kmeans":
        return _kmeans_codebooks(
            emb, m, ksub, seed, id_col, vec_col, sample=sample
        )
    raise ValueError(f"unknown PQ codebook method: {method!r}")


def _encode_udf(codebooks: "list[list[list[float]]]"):
    """Arrow-vectorized PQ encoder: array<int> of m codes per row.
    Distances accumulate dimension-sequentially (bit-exact contract in
    the module docstring); np.argmin takes the first minimum, matching
    the SQL twin's (d, code) window order."""
    import numpy as np
    import pandas as pd

    d = sum(len(cb[0]) for cb in codebooks)
    bounds = _sub_bounds(d, len(codebooks))

    def encode(emb_series: "pd.Series") -> "pd.Series":
        v = np.array(emb_series.tolist(), dtype=np.float64)
        codes = np.empty((v.shape[0], len(codebooks)), dtype=np.int32)
        for j, ((lo, hi), cb) in enumerate(zip(bounds, codebooks)):
            sub = v[:, lo:hi]
            dists = np.empty((v.shape[0], len(cb)), dtype=np.float64)
            for c, word in enumerate(cb):
                acc = np.zeros(v.shape[0], dtype=np.float64)
                for i, wi in enumerate(word):
                    t = sub[:, i] - wi
                    acc = acc + t * t
                dists[:, c] = acc
            codes[:, j] = np.argmin(dists, axis=1)
        return pd.Series(list(codes))

    encode.__annotations__ = {"emb_series": pd.Series, "return": pd.Series}
    return F.pandas_udf(encode, "array<int>")


def pq_encode(
    emb: DataFrame,
    codebooks: "list[list[list[float]]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): the compressed index — m ints per vector. A narrow
    projection; persist this (ideally with ivf cluster_id for IVFPQ)
    and the ANN scan never touches the float vectors again."""
    return emb.select(
        F.col(id_col),
        _encode_udf(codebooks)(F.col(vec_col)).alias("codes"),
    )


def _adc_expr(m: int) -> "F.Column":
    """ADC distance as a pure-JVM fold over a TABLE COLUMN:
    Σ_sub tbl[sub][codes[sub]], added in subspace order from 0.0 — the
    codegen twin of the SQL side's list_reduce over the ordered
    per-subspace list. The table rides a broadcast column rather than
    inlined literals: a literal m×ksub×|q| expression forest blew past
    janino's 64 KB method limit at 8 queries (observed — codegen
    fell back to interpreted), while this form is constant-size in
    both q and ksub."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, sub: acc
        + F.element_at(
            F.element_at(F.col("tbl"), sub + 1),
            F.element_at(F.col("codes"), sub + 1) + 1,
        ),
    )


def pq_ann(
    emb: DataFrame,
    query_ids: Iterable[int],
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
) -> DataFrame:
    """PQ top-k by asymmetric distance (ADC): (q_id, cand_id, adc_dist,
    rank). Approximate — candidates rank by quantized distance, so a
    true neighbor can be out-ranked when quantization error exceeds the
    margin; recall on clustered data is pinned in tests.

    ``method="det"`` has the exact DuckDB twin :func:`sql_pq_ann`;
    ``method="kmeans"`` is the quality path (rows-only, same contract
    as ivf_ann). Queries stay driver-sized: their vectors are collected
    to build the m×ksub distance tables (the multiget contract — |q|
    rows, never the corpus), after which scoring is all JVM."""
    cbs = train_pq(emb, m, ksub, seed, id_col, vec_col, method)
    codes = pq_encode(emb, cbs, id_col, vec_col)

    qids = list(query_ids)
    q_rows = (
        emb.where(F.col(id_col).isin(qids))
        .select(id_col, vec_col)
        .collect()
    )
    d = sum(len(cb[0]) for cb in cbs)
    bounds = _sub_bounds(d, m)
    per_query = []
    for r in sorted(q_rows, key=lambda r: r[0]):
        qv = [float(x) for x in r[1]]
        table = [
            [_py_sub_dist(qv[lo:hi], word) for word in cb]
            for (lo, hi), cb in zip(bounds, cbs)
        ]
        per_query.append((int(r[0]), table))

    tables = local_rows_df(emb.sparkSession, 
        per_query, "q_id: long, tbl: array<array<double>>"
    )
    scored = (
        codes.select(F.col(id_col).alias("cand_id"), "codes")
        .join(F.broadcast(tables))
        .select("q_id", "cand_id", _adc_expr(m).alias("adc_dist"))
        .where(F.col("q_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "cand_id", "adc_dist", F.col("rank").cast("int"))
    )


def pq_error_stats(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
) -> DataFrame:
    """One-row reconstruction report: mean/max squared L2 error of the
    PQ approximation and the compression ratio — the go/no-go check
    before swapping an index to codes. Error per row folds the m
    per-subspace residuals in order (same exactness as the ADC path:
    the residual d(sub_j, codeword(code_j)) IS the encode-time minimum,
    recomputed via the same literal-table fold)."""
    cbs = train_pq(emb, m, ksub, seed, id_col, vec_col, method)
    codes = pq_encode(
        emb.select(id_col, vec_col), cbs, id_col, vec_col
    )
    d = sum(len(cb[0]) for cb in cbs)
    bounds = _sub_bounds(d, m)
    enc = emb.join(codes.withColumnRenamed(id_col, "__cid"),
                   F.col(id_col) == F.col("__cid"))
    acc = F.lit(0.0)
    for j, ((lo, hi), cb) in enumerate(zip(bounds, cbs)):
        sub_dists = []
        for word in cb:
            w_acc = F.lit(0.0)
            for i, wi in enumerate(word):
                t = F.col(vec_col)[lo + i].cast("double") - F.lit(float(wi))
                w_acc = w_acc + t * t
            sub_dists.append(w_acc)
        acc = acc + F.element_at(F.array(*sub_dists), F.col("codes")[j] + 1)
    per_row = enc.select(acc.alias("sq_err"))
    return per_row.agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.round(F.avg("sq_err"), 9).alias("mean_sq_err"),
        F.round(F.max("sq_err"), 9).alias("max_sq_err"),
        F.lit(float(d * 4) / float(m)).alias("compression_ratio"),
    )


# --------------------------------------------------------------------- #
# DuckDB twins (det method): codebooks derive from the table itself,
# so no literals cross the engine boundary.
# --------------------------------------------------------------------- #


def _sql_sub_dist(a: str, b: str, dsub: int) -> str:
    """Fold-order squared L2 between two dsub-length DOUBLE lists."""
    terms = (
        f"list_transform(range(1, {dsub + 1}),"
        f" i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))"
    )
    return f"list_reduce({terms}, (x, y) -> x + y)"


def sql_pq_ann(
    table: str = "embeddings",
    query_ids: Iterable[int] = (),
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Exact DuckDB twin of ``pq_ann(..., method="det")`` — train,
    encode, and ADC re-expressed as the naive relational formulation
    (codebook cross joins + argmin windows + an ORDERED per-subspace
    list fold for the ADC total; parity needs identical values, not
    identical plans)."""
    ids = ", ".join(str(i) for i in query_ids)
    dsub = dim // m
    sub_slice = (
        f"list_slice({vec_col}, sub_id * {dsub} + 1, sub_id * {dsub} + {dsub})"
    )
    enc_dist = _sql_sub_dist("s.sub", "cb.cw", dsub)
    adc_dist = _sql_sub_dist("q.sub", "cb.cw", dsub)
    return f"""
        WITH cb AS (
            SELECT sub_id, CAST(rn - 1 AS INTEGER) AS code,
                   {sub_slice} AS cw
            FROM (
                SELECT {vec_col},
                       ROW_NUMBER() OVER (ORDER BY {id_col}) AS rn
                FROM (SELECT {id_col}, {vec_col} FROM {table}
                      ORDER BY {id_col} LIMIT {ksub})
            ), (SELECT unnest(range({m})) AS sub_id)
        ),
        corpus_sub AS (
            SELECT {id_col}, sub_id, {sub_slice} AS sub
            FROM {table}, (SELECT unnest(range({m})) AS sub_id)
        ),
        codes AS (
            SELECT {id_col}, sub_id, code FROM (
                SELECT s.{id_col}, s.sub_id, cb.code,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.{id_col}, s.sub_id
                           ORDER BY {enc_dist}, cb.code
                       ) AS rn
                FROM corpus_sub s JOIN cb USING (sub_id)
            ) WHERE rn = 1
        ),
        q_sub AS (
            SELECT {id_col} AS q_id, sub_id, {sub_slice} AS sub
            FROM (SELECT * FROM {table} WHERE {id_col} IN ({ids})),
                 (SELECT unnest(range({m})) AS sub_id)
        ),
        adc AS (
            SELECT q.q_id, c.{id_col} AS cand_id,
                   list_reduce(
                       list({adc_dist} ORDER BY q.sub_id),
                       (x, y) -> x + y
                   ) AS adc_dist
            FROM q_sub q
            JOIN codes c ON c.sub_id = q.sub_id
            JOIN cb ON cb.sub_id = c.sub_id AND cb.code = c.code
            WHERE q.q_id <> c.{id_col}
            GROUP BY q.q_id, c.{id_col}
        ),
        ranked AS (
            SELECT q_id, cand_id, adc_dist,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY adc_dist, cand_id
                   ) AS INTEGER) AS rank
            FROM adc
        )
        SELECT q_id, cand_id, adc_dist, rank FROM ranked WHERE rank <= {k}
    """


def ivfpq_ann(
    emb: DataFrame,
    query_ids: Iterable[int],
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
) -> DataFrame:
    """IVFPQ: IVF probe pruning × PQ code scanning — the composition
    that makes billion-vector search tractable. IVF cuts the candidate
    set to ``n_probe/n_clusters`` of the corpus; PQ cuts the bytes per
    scanned candidate by ``d*4/m``. At n_clusters=1024, n_probe=8,
    d=64, m=8 the scan touches ~0.8% of the corpus at 1/32 the bytes —
    a ~4000× I/O reduction vs brute force, which is the difference
    between seconds and hours at 10^9 vectors.

    This is the FLAT-code variant: codes quantize the raw vectors, so
    the same code table serves any probe set. Classic IVFPQ quantizes
    the RESIDUAL (x − centroid), which roughly halves quantization
    error for the same m — at the cost of per-list codebooks that
    complicate reuse and (here) the oracle; the flat form keeps the
    exact det twin and the cluster-level quality contract pinned in
    tests, and residual encoding layers on without changing the plan
    shape.

    Plan shape: corpus scanned once — assignment and encoding both fuse
    into the scan projection (two Arrow stages, no shuffle); the query
    side (probe lists + ADC tables) is computed driver-side from |q|
    collected rows and broadcast; scoring is the JVM element_at fold of
    :func:`_adc_expr` over only the probed lists' rows."""
    from spark_indexedrdd_spark.functions.ivf import (
        _assign_udf,
        _centroids,
        _det_head,
        _train_sample,
    )

    head = (
        _det_head(emb, max(n_clusters, ksub), id_col, vec_col)
        if method == "det"
        else None
    )
    sample = (
        _train_sample(emb, seed, id_col, vec_col)
        if method == "kmeans"
        else None
    )
    cents = _centroids(
        emb, n_clusters, seed, id_col, vec_col, method, head, sample=sample
    )
    cbs = train_pq(
        emb, m, ksub, seed, id_col, vec_col, method, head, sample=sample
    )
    codes = emb.select(
        F.col(id_col),
        _assign_udf(cents)(F.col(vec_col)).alias("cluster_id"),
        _encode_udf(cbs)(F.col(vec_col)).alias("codes"),
    )

    qids = list(query_ids)
    q_rows = (
        emb.where(F.col(id_col).isin(qids)).select(id_col, vec_col).collect()
    )
    d = sum(len(cb[0]) for cb in cbs)
    bounds = _sub_bounds(d, m)
    per_query = []
    for r in sorted(q_rows, key=lambda r: r[0]):
        qv = [float(x) for x in r[1]]
        # probe selection, driver-side: the same sequential-fold
        # centroid sims as ivf._centroid_sims_np / the SQL twin, ties
        # to the smaller cluster_id via stable sort
        sims = []
        for cid, (c, c_norm) in enumerate(cents):
            acc = 0.0
            for x, ci in zip(qv, c):
                acc = acc + float(x) * float(ci)
            sims.append((-(acc / c_norm), cid))
        probe_list = [cid for _, cid in sorted(sims)[:n_probe]]
        table = [
            [_py_sub_dist(qv[lo:hi], word) for word in cb]
            for (lo, hi), cb in zip(bounds, cbs)
        ]
        per_query.append((int(r[0]), table, probe_list))

    probes = (
        local_rows_df(emb.sparkSession, 
            per_query,
            "q_id: long, tbl: array<array<double>>, probe: array<int>",
        )
        .select("q_id", "tbl", F.explode("probe").alias("cluster_id"))
    )
    scored = (
        F.broadcast(probes)
        .join(codes, "cluster_id")
        .select(
            "q_id",
            F.col(id_col).alias("cand_id"),
            _adc_expr(m).alias("adc_dist"),
        )
        .where(F.col("q_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "cand_id", "adc_dist", F.col("rank").cast("int"))
    )


def sql_ivfpq_ann(
    table: str = "embeddings",
    query_ids: Iterable[int] = (),
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Exact DuckDB twin of ``ivfpq_ann(..., method="det")`` — the
    cents/assigned/probes CTEs of :func:`ivf.sql_ivf_ann` composed with
    the cb/codes/ADC CTEs of :func:`sql_pq_ann`, with the ADC join
    restricted to candidates in the query's probed lists."""
    from spark_indexedrdd_spark.functions.vectors import sql_dot, sql_norm

    ids = ", ".join(str(i) for i in query_ids)
    dsub = dim // m
    sub_slice = (
        f"list_slice({vec_col}, sub_id * {dsub} + 1, sub_id * {dsub} + {dsub})"
    )
    enc_dist = _sql_sub_dist("s.sub", "cb.cw", dsub)
    adc_dist = _sql_sub_dist("q.sub", "cb.cw", dsub)
    c_sim = f"({sql_dot(f'e.{vec_col}', 'c.centroid')} / c.c_norm)"
    q_sim = f"({sql_dot(f'qq.{vec_col}', 'c.centroid')} / c.c_norm)"
    return f"""
        WITH cents AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS INTEGER) AS cluster_id,
                   {vec_col} AS centroid,
                   {sql_norm(vec_col)} AS c_norm
            FROM (SELECT {id_col}, {vec_col} FROM {table}
                  ORDER BY {id_col} LIMIT {n_clusters})
        ),
        assigned AS (
            SELECT {id_col}, cluster_id FROM (
                SELECT e.{id_col}, c.cluster_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.{id_col}
                           ORDER BY {c_sim} DESC, c.cluster_id
                       ) AS rn
                FROM {table} e CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        cb AS (
            SELECT sub_id, CAST(rn - 1 AS INTEGER) AS code,
                   {sub_slice} AS cw
            FROM (
                SELECT {vec_col},
                       ROW_NUMBER() OVER (ORDER BY {id_col}) AS rn
                FROM (SELECT {id_col}, {vec_col} FROM {table}
                      ORDER BY {id_col} LIMIT {ksub})
            ), (SELECT unnest(range({m})) AS sub_id)
        ),
        corpus_sub AS (
            SELECT {id_col}, sub_id, {sub_slice} AS sub
            FROM {table}, (SELECT unnest(range({m})) AS sub_id)
        ),
        codes AS (
            SELECT {id_col}, sub_id, code FROM (
                SELECT s.{id_col}, s.sub_id, cb.code,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.{id_col}, s.sub_id
                           ORDER BY {enc_dist}, cb.code
                       ) AS rn
                FROM corpus_sub s JOIN cb USING (sub_id)
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT q_id, cluster_id FROM (
                SELECT qq.{id_col} AS q_id, c.cluster_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY qq.{id_col}
                           ORDER BY {q_sim} DESC, c.cluster_id
                       ) AS rn
                FROM (SELECT * FROM {table} WHERE {id_col} IN ({ids})) qq
                CROSS JOIN cents c
            ) WHERE rn <= {n_probe}
        ),
        q_sub AS (
            SELECT {id_col} AS q_id, sub_id, {sub_slice} AS sub
            FROM (SELECT * FROM {table} WHERE {id_col} IN ({ids})),
                 (SELECT unnest(range({m})) AS sub_id)
        ),
        adc AS (
            SELECT q.q_id, c.{id_col} AS cand_id,
                   list_reduce(
                       list({adc_dist} ORDER BY q.sub_id),
                       (x, y) -> x + y
                   ) AS adc_dist
            FROM q_sub q
            JOIN codes c ON c.sub_id = q.sub_id
            JOIN cb ON cb.sub_id = c.sub_id AND cb.code = c.code
            JOIN assigned a ON a.{id_col} = c.{id_col}
            JOIN probes p ON p.q_id = q.q_id AND p.cluster_id = a.cluster_id
            WHERE q.q_id <> c.{id_col}
            GROUP BY q.q_id, c.{id_col}
        ),
        ranked AS (
            SELECT q_id, cand_id, adc_dist,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY adc_dist, cand_id
                   ) AS INTEGER) AS rank
            FROM adc
        )
        SELECT q_id, cand_id, adc_dist, rank FROM ranked WHERE rank <= {k}
    """


def _res_codebooks(
    emb: DataFrame,
    cents: "list[tuple[list[float], float]]",
    m: int,
    ksub: int,
    seed: int,
    id_col: str,
    vec_col: str,
    method: str,
    head: "list[list[float]] | None" = None,
    sample: "list[list[float]] | None" = None,
) -> "list[list[list[float]]]":
    """Codebooks over RESIDUALS (x − centroid[assign(x)]).

    det: residuals of the first-ksub-by-id vectors, assigned driver-side
    with the same sequential-fold sims / first-max tie-break as the SQL
    twin's window. kmeans: numpy Lloyd's over the residuals of the
    capped sample (assignment vectorized, same arithmetic). ``head``:
    pre-collected ``ivf._det_head`` prefix shared with the centroid
    fit (det only); ``sample``: the pre-collected ``ivf._train_sample``
    shared with the kmeans centroid fit (one collect, two fits — r14)."""
    import numpy as np

    if method == "det":
        if head is not None:
            vecs = [list(v) for v in head[:ksub]]
        else:
            rows = (
                emb.orderBy(id_col).limit(ksub).select(vec_col).collect()
            )
            vecs = [[float(x) for x in r[0]] for r in rows]
    elif sample is not None:
        vecs = [list(v) for v in sample]
    else:
        from spark_indexedrdd_spark.functions.ivf import _train_sample

        vecs = _train_sample(emb, seed, id_col, vec_col)
    # driver-side assignment with the engines' exact fold arithmetic
    residuals = []
    for v in vecs:
        best_j, best_s = 0, None
        for j, (c, c_norm) in enumerate(cents):
            acc = 0.0
            for x, ci in zip(v, c):
                acc = acc + float(x) * float(ci)
            s = acc / c_norm
            if best_s is None or s > best_s:
                best_j, best_s = j, s
        residuals.append(
            [float(x) - float(ci) for x, ci in zip(v, cents[best_j][0])]
        )
    if method == "det":
        bounds = _sub_bounds(len(residuals[0]), m)
        return [[r[lo:hi] for r in residuals] for lo, hi in bounds]
    rv = np.array(residuals, dtype=np.float64)
    return [
        [[float(x) for x in c] for c in _lloyd_np(rv[:, lo:hi], ksub, seed + j)]
        for j, (lo, hi) in enumerate(_sub_bounds(rv.shape[1], m))
    ]


def _assign_res_encode(
    emb: DataFrame,
    cents: "list[tuple[list[float], float]]",
    codebooks: "list[list[list[float]]]",
    id_col: str,
    vec_col: str,
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """One Arrow pass over the corpus: nearest centroid, then PQ codes
    of the RESIDUAL → (id, cluster_id, codes). mapInPandas, not a
    struct-returning pandas_udf: extracting two fields from one UDF
    struct re-evaluates the UDF per field (no CSE across the collapsed
    projection — observed two ArrowEvalPython nodes over the same scan,
    i.e. assignment+encoding computed twice; the same no-CSE family as
    text._tokenized's fence). Same fold arithmetic as the flat
    encoder, applied to (v − centroid)."""
    import numpy as np
    import pandas as pd

    from spark_indexedrdd_spark.functions.ivf import _centroid_sims_np

    d = sum(len(cb[0]) for cb in codebooks)
    bounds = _sub_bounds(d, len(codebooks))
    cent_m = np.array([c for c, _ in cents], dtype=np.float64)
    id_type = emb.schema[id_col].dataType.simpleString()

    def assign_encode(batches):
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if v.shape[0] == 0:
                continue
            sims = _centroid_sims_np(pdf[vec_col], cents)
            assign = np.argmax(sims, axis=1)
            res = v - cent_m[assign]
            codes = np.empty((v.shape[0], len(codebooks)), dtype=np.int32)
            for j, ((lo, hi), cb) in enumerate(zip(bounds, codebooks)):
                sub = res[:, lo:hi]
                dists = np.empty((v.shape[0], len(cb)), dtype=np.float64)
                for c, word in enumerate(cb):
                    acc = np.zeros(v.shape[0], dtype=np.float64)
                    for i, wi in enumerate(word):
                        t = sub[:, i] - wi
                        acc = acc + t * t
                    dists[:, c] = acc
                codes[:, j] = np.argmin(dists, axis=1)
            out = {
                id_col: pdf[id_col],
                "cluster_id": assign.astype(np.int32),
                "codes": list(codes),
            }
            for c in keep_cols:  # metadata rides the encode pass
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    keep_schema = "".join(
        f", {c} {emb.schema[c].dataType.simpleString()}" for c in keep_cols
    )
    return emb.select(id_col, vec_col, *keep_cols).mapInPandas(
        assign_encode,
        schema=(
            f"{id_col} {id_type}, cluster_id int, codes array<int>"
            + keep_schema
        ),
    )


def ivfpq_residual_ann(
    emb: DataFrame,
    query_ids: Iterable[int],
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
) -> DataFrame:
    """Classic IVFPQ: PQ codes quantize the RESIDUAL (x − centroid)
    instead of x itself. Residual magnitudes are cluster-radius-sized
    rather than corpus-sized, so for the same m the quantizer spends
    its codes on a far smaller ball — roughly halving reconstruction
    error (Jégou 2011 §IV) and restoring within-list ranking that flat
    codes blur (measured on the 8-blob fixture in tests/test_pq.py).
    The cost: a query's distance table is per-PROBED-LIST (the residual
    is relative to each list's centroid), so table build is
    n_probe×m×ksub per query instead of m×ksub — still driver-trivial
    for multiget-contract query counts.

    Plan shape: identical to :func:`ivfpq_ann` — assignment + residual
    + encoding fuse into ONE Arrow scan projection; the probe side
    (now (q_id, cluster_id, tbl) rows) broadcasts; scoring is the same
    JVM element_at fold over only probed lists."""
    from spark_indexedrdd_spark.functions.ivf import (
        _centroids,
        _det_head,
        _train_sample,
    )

    head = (
        _det_head(emb, max(n_clusters, ksub), id_col, vec_col)
        if method == "det"
        else None
    )
    sample = (
        _train_sample(emb, seed, id_col, vec_col)
        if method == "kmeans"
        else None
    )
    cents = _centroids(
        emb, n_clusters, seed, id_col, vec_col, method, head, sample=sample
    )
    cbs = _res_codebooks(
        emb, cents, m, ksub, seed, id_col, vec_col, method, head,
        sample=sample,
    )
    codes = _assign_res_encode(emb, cents, cbs, id_col, vec_col)

    qids = list(query_ids)
    q_rows = (
        emb.where(F.col(id_col).isin(qids)).select(id_col, vec_col).collect()
    )
    d = sum(len(cb[0]) for cb in cbs)
    bounds = _sub_bounds(d, m)
    probe_rows = []
    for r in sorted(q_rows, key=lambda r: r[0]):
        qv = [float(x) for x in r[1]]
        sims = []
        for cid, (c, c_norm) in enumerate(cents):
            acc = 0.0
            for x, ci in zip(qv, c):
                acc = acc + float(x) * float(ci)
            sims.append((-(acc / c_norm), cid))
        for _, cid in sorted(sims)[:n_probe]:
            q_res = [x - float(ci) for x, ci in zip(qv, cents[cid][0])]
            table = [
                [_py_sub_dist(q_res[lo:hi], word) for word in cb]
                for (lo, hi), cb in zip(bounds, cbs)
            ]
            probe_rows.append((int(r[0]), cid, table))

    probes = local_rows_df(emb.sparkSession, 
        probe_rows,
        "q_id: long, cluster_id: int, tbl: array<array<double>>",
    )
    scored = (
        F.broadcast(probes)
        .join(codes, "cluster_id")
        .select(
            "q_id",
            F.col(id_col).alias("cand_id"),
            _adc_expr(m).alias("adc_dist"),
        )
        .where(F.col("q_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "cand_id", "adc_dist", F.col("rank").cast("int"))
    )


def sql_ivfpq_residual_ann(
    table: str = "embeddings",
    query_ids: Iterable[int] = (),
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_pred: "str | None" = None,
    filter_pred: "str | None" = None,
) -> str:
    """Exact DuckDB twin of ``ivfpq_residual_ann(..., method="det")``:
    residuals computed relationally (assigned ⋈ cents), codebooks from
    the first-ksub residuals, per-(query, probed-list) residual tables
    via the probes ⋈ cents join.

    ``exclude_pred`` (e.g. ``"vec_id % 7 = 0"``) models a tombstone
    delete applied AFTER the store build (sql_ivf_ann's convention):
    centroids AND codebooks still fit on the full table (the store pins
    both — deletion never re-codes), while the candidate codes see only
    survivors. This is the oracle for :func:`ivfpq_store_ann` after
    :func:`delete_ivfpq_ids`.

    ``filter_pred`` is the FILTERED-ANN twin on the compressed tier:
    candidate codes restricted to rows matching a predicate over
    ``table``'s columns (queries unfiltered, quantizer full-fit) —
    applied as an id semi-join because the residual CTE carries only
    (id, cluster, residual). Composes with ``exclude_pred``."""
    from spark_indexedrdd_spark.functions.vectors import sql_dot, sql_norm

    ids = ", ".join(str(i) for i in query_ids)
    dsub = dim // m
    res_slice = (
        f"list_slice(residual, sub_id * {dsub} + 1, sub_id * {dsub} + {dsub})"
    )
    conds = []
    if exclude_pred:
        conds.append(f"NOT ({exclude_pred})")
    if filter_pred:
        conds.append(
            f"{id_col} IN (SELECT {id_col} FROM {table}"
            f" WHERE ({filter_pred}))"
        )
    live = (" WHERE " + " AND ".join(conds)) if conds else ""
    enc_dist = _sql_sub_dist("s.sub", "cb.cw", dsub)
    adc_dist = _sql_sub_dist("q.sub", "cb.cw", dsub)
    c_sim = f"({sql_dot(f'e.{vec_col}', 'c.centroid')} / c.c_norm)"
    q_sim = f"({sql_dot(f'qq.{vec_col}', 'c.centroid')} / c.c_norm)"
    residual_expr = (
        f"list_transform(range(1, {dim} + 1),"
        f" i -> CAST({vec_col}[i] AS DOUBLE) - centroid[i])"
    )
    q_residual_expr = (
        f"list_transform(range(1, {dim} + 1),"
        f" i -> CAST(qq.{vec_col}[i] AS DOUBLE) - c.centroid[i])"
    )
    return f"""
        WITH cents AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS INTEGER) AS cluster_id,
                   {vec_col} AS centroid,
                   {sql_norm(vec_col)} AS c_norm
            FROM (SELECT {id_col}, {vec_col} FROM {table}
                  ORDER BY {id_col} LIMIT {n_clusters})
        ),
        assigned AS (
            SELECT {id_col}, {vec_col}, cluster_id, centroid FROM (
                SELECT e.{id_col}, e.{vec_col}, c.cluster_id, c.centroid,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.{id_col}
                           ORDER BY {c_sim} DESC, c.cluster_id
                       ) AS rn
                FROM {table} e CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        res AS (
            SELECT {id_col}, cluster_id, {residual_expr} AS residual
            FROM assigned
        ),
        cb AS (
            SELECT sub_id, CAST(rn - 1 AS INTEGER) AS code,
                   {res_slice} AS cw
            FROM (
                SELECT residual,
                       ROW_NUMBER() OVER (ORDER BY {id_col}) AS rn
                FROM (SELECT {id_col}, residual FROM res
                      ORDER BY {id_col} LIMIT {ksub})
            ), (SELECT unnest(range({m})) AS sub_id)
        ),
        corpus_sub AS (
            SELECT {id_col}, cluster_id, sub_id, {res_slice} AS sub
            FROM (SELECT * FROM res{live}) res_live,
                 (SELECT unnest(range({m})) AS sub_id)
        ),
        codes AS (
            SELECT {id_col}, cluster_id, sub_id, code FROM (
                SELECT s.{id_col}, s.cluster_id, s.sub_id, cb.code,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.{id_col}, s.sub_id
                           ORDER BY {enc_dist}, cb.code
                       ) AS rn
                FROM corpus_sub s JOIN cb USING (sub_id)
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT q_id, cluster_id, residual FROM (
                SELECT qq.{id_col} AS q_id, c.cluster_id,
                       {q_residual_expr} AS residual,
                       ROW_NUMBER() OVER (
                           PARTITION BY qq.{id_col}
                           ORDER BY {q_sim} DESC, c.cluster_id
                       ) AS rn
                FROM (SELECT * FROM {table} WHERE {id_col} IN ({ids})) qq
                CROSS JOIN cents c
            ) WHERE rn <= {n_probe}
        ),
        q_sub AS (
            SELECT q_id, cluster_id, sub_id, {res_slice} AS sub
            FROM probes, (SELECT unnest(range({m})) AS sub_id)
        ),
        adc AS (
            SELECT q.q_id, c.{id_col} AS cand_id,
                   list_reduce(
                       list({adc_dist} ORDER BY q.sub_id),
                       (x, y) -> x + y
                   ) AS adc_dist
            FROM q_sub q
            JOIN codes c ON c.sub_id = q.sub_id
                        AND c.cluster_id = q.cluster_id
            JOIN cb ON cb.sub_id = c.sub_id AND cb.code = c.code
            WHERE q.q_id <> c.{id_col}
            GROUP BY q.q_id, c.{id_col}
        ),
        ranked AS (
            SELECT q_id, cand_id, adc_dist,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY adc_dist, cand_id
                   ) AS INTEGER) AS rank
            FROM adc
        )
        SELECT q_id, cand_id, adc_dist, rank FROM ranked WHERE rank <= {k}
    """


def write_ivfpq_store(
    emb: DataFrame,
    path: str,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "kmeans",
    keep_cols: "tuple[str, ...]" = (),
) -> None:
    """Materialize the corpus as a SERVABLE IVFPQ index: residual codes
    at ``path/codes`` PARTITIONED BY cluster_id, centroids at
    ``path/centroids``, codebooks at ``path/codebooks``. This is the
    at-scale serving layout: a query reads n_probe code directories —
    m ints per row, never the float vectors — so the whole index is
    n_probe/n_clusters × corpus-rows × m bytes per query, and the only
    global state is k centroid rows + m×ksub codewords.

    One pass over the corpus (the mapInPandas assign+encode), one
    cluster-partitioned write. Defaults (n_probe) are stored alongside
    so serving and build agree.

    Commit protocol (store_commit docstring): retract the old meta
    marker, land the three parts, commit meta atomically LAST — a
    crashed rebuild cannot leave old codebooks silently decoding new
    codes.

    ``keep_cols`` persists metadata columns beside each code row —
    FILTERED ANN on the compressed tier
    (``ivfpq_store_ann(filter_pred=)``), same contract as
    ``ivf.write_ivf_store(keep_cols=...)``: recorded in meta, appends
    re-read it, the predicate reaches the pruned codes scan as a
    parquet PushedFilter."""
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.functions.ivf import (
        _centroids,
        _det_head,
        _train_sample,
    )

    SC.validate_keep_cols(emb, keep_cols, reserved=(id_col, vec_col))
    head = (
        _det_head(emb, max(n_clusters, ksub), id_col, vec_col)
        if method == "det"
        else None
    )
    sample = (
        _train_sample(emb, seed, id_col, vec_col)
        if method == "kmeans"
        else None
    )
    cents = _centroids(
        emb, n_clusters, seed, id_col, vec_col, method, head, sample=sample
    )
    cbs = _res_codebooks(
        emb, cents, m, ksub, seed, id_col, vec_col, method, head,
        sample=sample,
    )
    codes = _assign_res_encode(
        emb, cents, cbs, id_col, vec_col, keep_cols=keep_cols
    )
    # retract only once the non-destructive work (centroid/codebook
    # fits) is done: a failed FIT must not brick an intact store
    SC.retract_meta(path)
    codes.write.mode("overwrite").partitionBy("cluster_id").parquet(
        path + "/codes"
    )
    spark = emb.sparkSession
    local_rows_df(spark, 
        [(i, c, n) for i, (c, n) in enumerate(cents)],
        "cluster_id int, centroid array<double>, c_norm double",
    ).write.mode("overwrite").parquet(path + "/centroids")
    local_rows_df(spark, 
        [
            (sub, code, word)
            for sub, cb in enumerate(cbs)
            for code, word in enumerate(cb)
        ],
        "sub_id int, code int, cw array<double>",
    ).write.mode("overwrite").parquet(path + "/codebooks")
    # manifest-pointer commit (r11, same shape as the IVF vectors
    # store): readers resolve the code files from the committed meta,
    # so appends are versioned-away snapshots and the as-of serve
    # covers them, not just deletes
    import os as _os

    SC.write_manifest(path, "base", SC.list_parquet_files(path + "/codes"))
    SC.commit_meta(
        path,
        {
            "n_clusters": int(n_clusters),
            "n_probe": int(n_probe),
            "m": int(m),
            "ksub": int(ksub),
            "keep_cols": list(keep_cols),
            "id_col": id_col,
            "vec_col": vec_col,
            "manifests": ["base"],
            "applied": [],
            "build_token": _os.urandom(8).hex(),
        },
    )


def _codes_for_meta(spark, path: str, meta: dict):
    """The code frame under ONE committed meta snapshot — shared
    protocol (store_commit.read_store_files; ``basePath`` preserves
    the cluster_id partition pruning), legacy directory fallback."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    return SC.read_store_files(
        spark, path, meta, "manifests", "codes", base_path=True
    )


def read_ivfpq_store(spark, path: str, meta: "dict | None" = None):
    """(codes_df, centroids, codebooks) — codes lazily from the
    committed file set (cluster_id filters prune to probed
    directories); centroids/codebooks as the driver-side structures the
    build produced. ``meta`` pins the codes to ONE committed snapshot
    (the as-of serve path passes the resolved version's meta).
    FileNotFoundError on an uncommitted store."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    if meta is None:
        meta = SC.read_meta(path)  # commit-marker check + file pointer
    cent_rows = (
        spark.read.parquet(path + "/centroids").orderBy("cluster_id").collect()
    )
    cents = [
        ([float(x) for x in r.centroid], float(r.c_norm)) for r in cent_rows
    ]
    cb_rows = (
        spark.read.parquet(path + "/codebooks")
        .orderBy("sub_id", "code")
        .collect()
    )
    m = 1 + max(r.sub_id for r in cb_rows)
    cbs = [[] for _ in range(m)]
    for r in cb_rows:
        cbs[r.sub_id].append([float(x) for x in r.cw])
    return _codes_for_meta(spark, path, meta), cents, cbs


def append_ivfpq_batch(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_tag: "str | None" = None,
) -> bool:
    """Fold an ingest batch into the store: assign + encode with the
    STORED centroids and codebooks (the quantizer is fixed at build
    time — re-fitting would silently re-code every list) and append
    into the per-cluster directories. The store's keep_cols contract
    is enforced (ivf.append_ivf_batch docstring): a batch missing a
    persisted metadata column refuses loudly.

    Commit protocol (r11): staged manifest-pointer append
    (store_commit.append_partitioned_store_batch) — snapshot-isolated,
    as-of-covered, and with a ``batch_tag`` crash-replayable
    exactly-once (returns False on a committed tag's replay)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    spark = new_emb.sparkSession
    if batch_tag is not None:
        SC.validate_batch_tag(batch_tag)
        if SC.tag_is_applied(SC.read_meta(path), batch_tag):
            SC.cleanup_flat_staging(path, batch_tag)
            return False
    meta = SC.read_meta(path)
    _codes, cents, cbs = read_ivfpq_store(spark, path, meta=meta)
    # delete-wins until compaction (ivf.append_ivf_batch convention,
    # r11 review finding): a re-ingested tombstoned id would land in a
    # committed manifest while the serve's anti-join hides it —
    # invisible rows on disk, and the CDC's added∧deleted netting
    # would silently drop the delete event
    tomb = SC.committed_tombstones(
        spark, path, meta, id_col, _codes.schema[id_col].dataType
    )
    if tomb is not None:
        new_emb = new_emb.join(F.broadcast(tomb), id_col, "left_anti")
    # names AND types vs the persisted code rows (store_commit helper)
    keep_cols = SC.enforce_store_keep_cols(meta, new_emb, store_df=_codes)
    batch = _assign_res_encode(
        new_emb, cents, cbs, id_col, vec_col, keep_cols=keep_cols
    )

    def _write(dest: str, mode: str) -> None:
        batch.write.mode(mode).partitionBy("cluster_id").parquet(dest)

    return SC.append_partitioned_store_batch(path, batch_tag, _write, "codes")


def optimize_ivfpq_store(
    spark, path: str, id_col: "str | None" = None
) -> int:
    """Snapshot-PRESERVING compaction of the IVFPQ code store — the
    compressed-tier twin of :func:`ivf.optimize_ivf_store` (one
    shared protocol, store_commit.optimize_partitioned_store):
    physically fold the tombstones and re-merge append-accumulated
    small per-cluster code files into one file per cluster, published
    through the manifest-pointer commit. Old snapshots keep serving
    byte-identically (floor unmoved); ``vacuum_store`` reclaims their
    files later. Returns the live code count. Refuses on a legacy
    pre-manifest store."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    rel = SC.resolve_manifest_files(path, meta)
    if rel is None:
        raise ValueError(
            "optimize_ivfpq_store requires a manifest-pointer store; "
            "this store predates the pointer — one append backfills "
            "it, or rebuild"
        )
    id_col = id_col or meta.get("id_col", "vec_id")
    codes = _codes_for_meta(spark, path, meta)
    tomb = SC.committed_tombstones(
        spark, path, meta, id_col, codes.schema[id_col].dataType
    )
    if tomb is not None:
        codes = codes.join(F.broadcast(tomb), id_col, "left_anti")
    survivors = codes.repartition("cluster_id")

    def _write(stage: str) -> None:
        survivors.write.mode("overwrite").partitionBy(
            "cluster_id"
        ).parquet(stage)

    SC.optimize_partitioned_store(path, meta, _write, "codes")
    return _codes_for_meta(spark, path, meta).count()


def ivfpq_changes(spark, path: str, v_from: int, v_to: int):
    """Version-to-version CDC on the IVFPQ code store: (vec_id,
    added|deleted), O(delta) — shared protocol (ivf.ivf_changes
    docstring, store_commit.store_changes)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    return SC.store_changes(spark, path, v_from, v_to, "manifests", "codes")


def ivfpq_store_ann(
    spark,
    path: str,
    queries: "list[tuple[int, list[float]]]",
    k: int = 5,
    n_probe: "int | None" = None,
    id_col: str = "vec_id",
    version: "int | None" = None,
    filter_pred: "str | None" = None,
) -> DataFrame:
    """Serve ANN from a persisted IVFPQ store: (q_id, cand_id,
    adc_dist, rank) for driver-side query vectors. The codes read
    filters cluster_id to the union of all probe lists — a
    PARTITION-PRUNED scan of n_probe directories per query (asserted
    in tests), reading m ints per candidate. Probe tables are the same
    driver-side residual tables as :func:`ivfpq_residual_ann`.
    ``n_probe`` defaults to the value the BUILD recorded in the store
    meta (that is why it is stored), an explicit argument overrides.

    Committed tombstones (delete_ivfpq_ids) are excluded from the
    candidates broadcast-side; ``version`` serves AS OF an earlier
    committed meta, freezing BOTH the code-file set (the manifest
    pointer — appends after the snapshot are invisible, r11) and the
    tombstone set, like ivf_ann_from_store; on a legacy pre-manifest
    store the surface degrades to delete history only.

    ``filter_pred`` is FILTERED ANN on the compressed tier: candidates
    restricted to a metadata predicate over the store's keep_cols
    (prefilter semantics — ranks recut; ``ivf.ivf_ann(filter_pred=)``
    docstring). The predicate sits on the pruned codes scan where it
    becomes a parquet PushedFilter, composing with the cluster pruning
    — never a metadata join or a decode."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.resolve_serve_meta(path, version)
    if n_probe is None:
        n_probe = int(meta.get("n_probe", 4))
    codes, cents, cbs = read_ivfpq_store(spark, path, meta=meta)
    tomb = SC.committed_tombstones(
        spark, path, meta, id_col, codes.schema[id_col].dataType
    )
    if tomb is not None:
        # takedown-batch sized — broadcast, never a candidate shuffle
        codes = codes.join(F.broadcast(tomb), id_col, "left_anti")
    if filter_pred:
        codes = codes.where(filter_pred)
    m = len(cbs)
    d = sum(len(cb[0]) for cb in cbs)
    bounds = _sub_bounds(d, m)
    probe_rows = []
    for q_id, qv in sorted(queries):
        qv = [float(x) for x in qv]
        sims = []
        for cid, (c, c_norm) in enumerate(cents):
            acc = 0.0
            for x, ci in zip(qv, c):
                acc = acc + float(x) * float(ci)
            sims.append((-(acc / c_norm), cid))
        for _, cid in sorted(sims)[:n_probe]:
            q_res = [x - float(ci) for x, ci in zip(qv, cents[cid][0])]
            table = [
                [_py_sub_dist(q_res[lo:hi], word) for word in cb]
                for (lo, hi), cb in zip(bounds, cbs)
            ]
            probe_rows.append((int(q_id), cid, table))

    probed_clusters = sorted({cid for _, cid, _ in probe_rows})
    probes = local_rows_df(spark, 
        probe_rows,
        "q_id: long, cluster_id: int, tbl: array<array<double>>",
    )
    scored = (
        F.broadcast(probes)
        .join(
            codes.where(F.col("cluster_id").isin(probed_clusters)),
            "cluster_id",
        )
        .select(
            "q_id",
            F.col(id_col).alias("cand_id"),
            _adc_expr(m).alias("adc_dist"),
        )
        .where(F.col("q_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "cand_id", "adc_dist", F.col("rank").cast("int"))
    )


def delete_ivfpq_ids(
    spark,
    path: str,
    ids,
    batch_tag: str,
    id_col: str = "vec_id",
) -> bool:
    """Tombstone-delete stored codes by id — the takedown path for the
    servable IVFPQ index (reference delete(ks), IndexedRDD.scala:
    120-123, on the at-rest code table; same protocol as
    ivf.delete_ivf_ids). Returns False (replay no-op) when
    ``batch_tag`` was already applied.

    Codebooks and centroids are PINNED by the store (deletion never
    re-codes the lists), so a post-delete serve equals the pre-delete
    serve with the deleted candidates excluded and ranks recut —
    pytest-pinned. The tombstone parquet lands first (invisible until
    the atomic meta commit lists its tag); uncastable ids refuse
    loudly (try_cast + null check — a NULL id would anti-join nothing
    and report success while deleting nothing)."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    # LAZY id_type: a replayed tag returns before the schema scan
    return SC.tombstone_delete(
        spark, path, ids, batch_tag, id_col,
        lambda: spark.read.parquet(path + "/codes")
        .select(id_col).schema[0].dataType,
    )


def compact_ivfpq_store(spark, path: str, id_col: str = "vec_id") -> int:
    """Physically drop tombstoned codes and clear the tombstone list;
    returns the live code count. Survivors keep their pinned cluster
    assignment and codes (never re-fit). Sibling-dir rewrite swapped in
    under recheck → retract → rename → commit(rewrite=True) — same
    durability/OCC shape as compact_ivf_store."""
    import os
    import shutil

    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    codes = _codes_for_meta(spark, path, meta)
    tomb = SC.committed_tombstones(
        spark, path, meta, id_col, codes.schema[id_col].dataType
    )
    if tomb is None:
        return codes.count()
    survivors = codes.join(F.broadcast(tomb), id_col, "left_anti")
    tmp = path + "__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    survivors.repartition("cluster_id").write.mode("overwrite").partitionBy(
        "cluster_id"
    ).parquet(tmp + "/codes")
    n_live = spark.read.parquet(tmp + "/codes").count()
    SC.recheck_version(path, meta)  # abort BEFORE the destructive swap
    SC.retract_meta(path)  # <-- old store now loudly uncommitted
    shutil.rmtree(os.path.join(path, "codes"), ignore_errors=True)
    os.replace(tmp + "/codes", os.path.join(path, "codes"))
    shutil.rmtree(os.path.join(path, "tombstones"), ignore_errors=True)
    # destructive swap: manifest lists and retired-name ledger reset
    # (the rewrite=True commit advances the servability floor)
    shutil.rmtree(os.path.join(path, "_manifests"), ignore_errors=True)
    SC.write_manifest(path, "base", SC.list_parquet_files(path + "/codes"))
    meta["manifests"] = ["base"]
    meta.pop("retired_manifests", None)
    meta["deletes"] = []
    meta["compactions"] = int(meta.get("compactions", 0)) + 1
    SC.commit_meta(path, meta, rewrite=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return n_live
