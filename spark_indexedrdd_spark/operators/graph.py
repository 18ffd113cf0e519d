"""Iterative graph analytics over the IndexedDataFrame vertex store.

The reference's motivating workload is exactly this: IndexedRDD grew out
of GraphX's vertex-state RDDs (reference README.md:5 "efficient joins
and point lookups, updates" — the join/aggregate ops 12-17 are the
vertex-program primitives; `aggregateUsingIndex` IS GraphX's
aggregateMessages combine step, IndexedRDD.scala:293-297). This module
runs a real vertex program — PageRank — with the rebuilt machinery:

- vertex state = :class:`IndexedDataFrame` keyed by node id,
- message combine = ``aggregate_using_index_expr`` (hash agg with
  map-side partial combine, shuffled straight into the index's
  partitioning — reference kernel PARTPartition.scala:201-203),
- vertex update = ``map_values`` (partitioning preserved, reference
  IndexedRDD.scala:210-216).

Determinism / oracle story: ranks are **fixed-point BIGINTs** (``scale``
units = 1.0 of initial mass per node). Every step is integer arithmetic
— ``rank div outdeg`` per edge message, exact BIGINT sums, integer
damping ``(85 * inflow) div 100`` — so the result is bit-identical on
any engine and any summation order, and :func:`sql_pagerank_trade`
reproduces it in DuckDB as an unrolled chain of CTEs. (Float PageRank
cannot be hash-checked: grouped double sums are order-nondeterministic.)

Scale (100 TB): the per-iteration plan is the optimal PageRank shape —
ONE shuffle per iteration (the message combine, map-side partial), with
the edges→ranks join co-partitioned: edges are cached partitioned by
``src`` with the same partition count as the rank index, so
EnsureRequirements elides both exchanges on the join. Overflow bound:
total mass never exceeds ``n_nodes * scale`` (damping only shrinks it),
and the widest intermediate is ``damping_pct * inflow``, so keep
``n_nodes * scale * 100`` under 2^63 — at the default scale=10^12 that
is ~90M nodes; drop ``scale`` to 10^8 for a 100 TB graph (~10^13 node
budget) at the cost of 4 fewer digits of rank resolution. For deep
iteration counts, ``checkpoint_every`` cuts the growing lineage with a
localCheckpoint (same device as the dedup pointer-jumping loop,
functions/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_indexedrdd_spark.core import IndexedDataFrame

# 1.0 of rank mass, in fixed-point units. 10^12 keeps integer-division
# truncation error ~12 digits below the mass while leaving ~90M nodes of
# BIGINT headroom (see module docstring for the 100 TB setting).
RANK_SCALE = 10**12
DAMPING_PCT = 85  # the classic 0.85, as an integer percentage


def trade_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """The supplier↔customer trade graph: an undirected edge whenever a
    supplier shipped a line item belonging to a customer's order.
    Supplier s maps to node ``-(s+1)`` (strictly negative — plain
    negation would collide supplier 0 with customer 0), customers map
    to their non-negative keys — disjoint node spaces, one BIGINT id
    column. Returned as a DIRECTED edge list with
    both orientations (symmetric closure), so no node is dangling and
    the PageRank loop needs no per-iteration driver action for leaked
    mass.

    Scale: the join is an equi-join on l_orderkey (broadcast or shuffle
    as Catalyst sizes it) and the DISTINCT is one hash aggregate —
    both map-side-combinable.
    """
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (-(F.col("l_suppkey") + 1)).alias("s"),
            F.col("o_custkey").alias("c"),
        )
    )
    fwd = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    rev = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank(
    edges: DataFrame,
    iterations: int = 6,
    scale: int = RANK_SCALE,
    damping_pct: int = DAMPING_PCT,
    num_partitions: int | None = None,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list ``(src, dst)``.

    Every node must have at least one out-edge (feed a symmetric edge
    list, e.g. :func:`trade_edges`, or pre-handle dangling mass) — this
    keeps the loop free of per-iteration driver actions.

    Per iteration (the vertex-program steps, reference ops cited in the
    module docstring):

    1. messages: ``rank div outdeg`` routed along each edge — a
       co-partitioned join of the cached edge list (partitioned by src)
       against the rank index (partitioned by id), zero extra exchange;
    2. combine: ``aggregate_using_index_expr(sum)`` — ONE shuffle,
       map-side partial sums (exact BIGINT);
    3. update: ``teleport + (damping_pct * inflow) div 100`` via
       ``map_values`` — narrow, partitioning preserved.

    Returns (id BIGINT, rank BIGINT); ``rank / scale`` is the rank in
    units of initial per-node mass (sums to ~n_nodes, minus documented
    truncation leakage).
    """
    spark = edges.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions")
    )
    teleport = (100 - damping_pct) * scale // 100

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edeg = (
        edges.join(deg, "src")
        .repartition(n, "src")
        .cache()
    )
    ranks = IndexedDataFrame.from_unique(
        edeg.select(F.col("src").alias("id")).distinct()
        .withColumn("rank", F.lit(scale).cast("long")),
        "id",
        num_partitions=n,
        cache=False,
    )
    for i in range(iterations):
        msgs = (
            edeg.join(ranks.df, F.col("src") == F.col("id"))
            .select(
                F.col("dst").alias("id"),
                F.expr("rank div outdeg").alias("msg"),
            )
        )
        inflow = ranks.aggregate_using_index_expr(
            msgs, F.sum("msg"), alias="inflow"
        )
        ranks = inflow.map_values(
            lambda v: F.expr(
                f"CAST({teleport} + ({damping_pct} * inflow) div 100 AS BIGINT)"
            ),
            alias="rank",
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = IndexedDataFrame(
                ranks.df.localCheckpoint(eager=True), ["id"], n
            )
    # Materialize the final state and release the edge cache — an
    # iterative job's terminal state is checkpointed anyway, and a
    # lazily-returned plan would pin the cached edges forever (the
    # accumulating-cache failure mode the streaming dedup fix removed).
    out = ranks.df.select("id", "rank").localCheckpoint(eager=True)
    edeg.unpersist()
    return out


def pagerank_trade(
    lineitem: DataFrame, orders: DataFrame, iterations: int = 6
) -> DataFrame:
    """PageRank over the supplier↔customer trade graph — the contract
    query instantiation ("trade influence": which suppliers/customers
    sit in the densest purchasing neighborhoods)."""
    return pagerank(trade_edges(lineitem, orders), iterations=iterations)


def sql_pagerank_trade(
    iterations: int = 6,
    scale: int = RANK_SCALE,
    damping_pct: int = DAMPING_PCT,
) -> str:
    """Exact DuckDB twin of :func:`pagerank_trade`: the same integer
    fixed-point recurrence unrolled as one CTE per iteration. BIGINT
    sums are order-independent and ``//`` truncates toward zero exactly
    like Spark's ``div`` (all quantities here are non-negative), so the
    hash-compare is bit-exact with no rounding games."""
    teleport = (100 - damping_pct) * scale // 100
    ctes = [
        """edges AS (
            SELECT DISTINCT src, dst FROM (
                SELECT -(l_suppkey + 1) AS src, o_custkey AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                UNION ALL
                SELECT o_custkey AS src, -(l_suppkey + 1) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            )
        )""",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        f"""r0 AS (
            SELECT src AS id, CAST({scale} AS BIGINT) AS rank
            FROM (SELECT DISTINCT src FROM edges)
        )""",
    ]
    for i in range(iterations):
        ctes.append(f"""r{i + 1} AS (
            SELECT e.dst AS id,
                   CAST({teleport} + ({damping_pct} * SUM(r.rank // d.outdeg)) // 100
                        AS BIGINT) AS rank
            FROM r{i} r
            JOIN deg d ON r.id = d.src
            JOIN edges e ON r.id = e.src
            GROUP BY e.dst
        )""")
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id, rank FROM r{iterations}"
    )
