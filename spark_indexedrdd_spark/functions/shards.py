"""Deterministic training-data ordering and shard layout — the last
mile of a 100 TB pipeline: after filtering/dedup/sampling, the corpus
must be served to trainers in a reproducible shuffled order, split into
shards workers can claim independently.

Spark-first: the order is a pure per-row hash expression (seeded md5 —
reproducible on ANY engine, stable under re-runs and repartitioning, no
``rand()`` whose value depends on partition layout), the shard
assignment is a modulus over the same hash, and the physical layout is
one ``repartition(shard) + sortWithinPartitions(order)`` write — the
only shuffle in the job. A manifest table (shard → row count + order-key
range) is derived from the same frame so trainers can size work without
listing files.

The reference has no serving-layout surface (SURVEY.md §2.5); this
extends the pipeline operators (hash_split / weighted_sample /
pack_documents in functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def training_order(
    df: DataFrame,
    seed: int = 42,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, order_key, shard_id): a deterministic global shuffle.

    order_key = md5("<seed>:<id>") — a hex string whose lexicographic
    order is a pseudorandom permutation of the corpus, identical on any
    engine and under any physical layout (contrast ``rand()``, whose
    draw depends on partition index). shard_id = the first 8 hex chars
    mod ``n_shards`` — uniform, and INDEPENDENT of the within-shard
    order tail, so every shard sees its own uniform sample of the
    corpus in its own pseudorandom order.

    Changing ``seed`` is a fresh epoch permutation; the common trainer
    loop (seed per epoch) re-derives order without rewriting data.

    Scale: a narrow projection — zero shuffles. The DuckDB twin is
    bit-identical (md5 + integer arithmetic)."""
    order = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(order, 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    return df.select(
        F.col(id_col),
        order.alias("order_key"),
        shard.alias("shard_id"),
    )


def sql_training_order(
    table: str = "documents",
    seed: int = 42,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`training_order` — same md5, same hex→int
    prefix, same modulus."""
    order = f"md5('{seed}:' || CAST({id_col} AS VARCHAR))"
    return f"""
        SELECT {id_col}, {order} AS order_key,
               CAST(CAST(('0x' || substr({order}, 1, 8)) AS BIGINT)
                    % {n_shards} AS INTEGER) AS shard_id
        FROM {table}
    """


def write_training_shards(
    df: DataFrame,
    path: str,
    seed: int = 42,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> None:
    """Materialize the corpus in serving layout: parquet partitioned by
    shard_id, rows within each shard's files sorted by order_key, plus
    a ``_manifest`` table (shard_id, n_rows, min/max order_key).

    One shuffle total (the range repartition); the within-shard sort is
    task-local. Layout contract: every FILE holds rows in order_key
    order, and file NAMES within a shard directory follow the global
    order (range partitioning on (shard_id, order_key) makes task
    numbering = range order), so a trainer reading a shard's files
    sorted by name streams the exact permutation with no sort.
    (A Spark read does NOT inherit that order — the scan packs splits
    by size — which is why :func:`read_training_shard` sorts
    explicitly; per-shard data is worker-sized by construction.)"""
    laid = (
        training_order(df, seed, n_shards, id_col)
        .join(df, id_col)
        .repartitionByRange(n_shards, "shard_id", "order_key")
        .sortWithinPartitions("shard_id", "order_key")
    )
    laid.write.mode("overwrite").partitionBy("shard_id").parquet(
        path + "/shards"
    )
    manifest = (
        training_order(df, seed, n_shards, id_col)
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("order_key").alias("min_order_key"),
            F.max("order_key").alias("max_order_key"),
        )
    )
    manifest.write.mode("overwrite").parquet(path + "/_manifest")


def read_training_shard(spark, path: str, shard_id: int) -> DataFrame:
    """One worker's slice: partition pruning reads only this shard's
    directory. The explicit sort restores training order under Spark's
    size-packed split scheduling; non-Spark trainers skip it by reading
    the files name-sorted (see :func:`write_training_shards`)."""
    return (
        spark.read.parquet(path + "/shards")
        .where(F.col("shard_id") == shard_id)
        .sort("order_key")
    )
