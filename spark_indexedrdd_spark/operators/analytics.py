"""SQL analytics surface the reference lacks entirely (SURVEY.md §2.5):
grouped aggregation, window top-k, sort/limit, set ops, rollup, as-of
join, sessionization. Expressed declaratively so Catalyst owns the
physical plan (partial aggregation, broadcast selection, AQE).

Each operator ships with its DuckDB-SQL twin for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_indexedrdd_spark.localframe import local_rows_df
from spark_indexedrdd_spark.checkpoint import truncate_lineage


def _dec_sum(col) -> "F.Column":
    """Order-independent, cross-engine-exact double sum: accumulate in
    DECIMAL(18,6), cast back. Scale 6 >= the true decimal scale of every
    summed expression here (price*disc*tax has 6), so the decimal cast
    never lands on a rounding midpoint where engines disagree."""
    return F.sum(col.cast("decimal(18,6)")).cast("double")


def pricing_summary(lineitem: DataFrame, exact: bool = True) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation: one hash-agg, map-side
    partial, 2 grouping keys — the canonical scale-out aggregate.

    ``exact=True`` accumulates in DECIMAL(18,6) so the sums are
    bit-identical across engines (the oracle-parity form).
    ``exact=False`` sums native doubles — the plan Tungsten vectorizes
    hardest, and what a 100 TB run should use when last-ulp
    cross-engine reproducibility isn't required (~2× less agg CPU)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    if exact:
        # pre-project the decimal casts: the aggregate then sums plain
        # columns, which halves the generated-code size (first-run JIT
        # latency) and shares the disc_price subexpression; the decimal
        # math — and hence the oracle bit-parity — is unchanged
        pre = lineitem.select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("decimal(18,6)").alias("__q"),
            F.col("l_extendedprice").cast("decimal(18,6)").alias("__p"),
            disc_price.cast("decimal(18,6)").alias("__d"),
            charge.cast("decimal(18,6)").alias("__c"),
        )
        return (
            pre.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("__q").cast("double").alias("sum_qty"),
                F.sum("__p").cast("double").alias("sum_base_price"),
                F.sum("__d").cast("double").alias("sum_disc_price"),
                F.sum("__c").cast("double").alias("sum_charge"),
                F.count("*").cast("long").alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.sum("l_extendedprice").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window top-k per group with deterministic tiebreak. Scale: single
    shuffle on the partition key; AQE handles customer skew."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
    )


def sql_top_orders_per_customer(k: int = 3) -> str:
    return f"""
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
            FROM orders
        ) WHERE rk <= {k}
    """


def global_topk_orders(orders: DataFrame, k: int = 100) -> DataFrame:
    """Global sort + limit. Spark plans TakeOrderedAndProject: per-
    partition top-k then a single-reducer merge of k-element heaps —
    no full global sort ever happens (crucial at 100 TB)."""
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(k)
    )


def sql_global_topk_orders(k: int = 100) -> str:
    return f"""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT {k}
    """


def rollup_doc_counts(documents: DataFrame) -> DataFrame:
    """ROLLUP (lang, source): grouping-set aggregate, one pass."""
    return (
        documents.rollup("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


SQL_ROLLUP_DOC_COUNTS = """
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY ROLLUP (lang, source)
"""


def segment_set_ops(customer: DataFrame, nation_a: int, nation_b: int) -> DataFrame:
    """Consolidated set-op report (r13 VERDICT consolidation — the
    similarity_topk / duplicate_spans fold precedent): ONE entry whose
    hash pins all three set-op pipelines over the same two nation
    segment bags — EXCEPT (``subtract``, set semantics), INTERSECT
    (``intersect``), EXCEPT ALL (``exceptAll``, bag semantics with
    multiplicity). Rows are (set_op, c_mktsegment, n) where n = 1 for
    the set ops (presence) and the surplus multiplicity for
    except_all. The per-op forms (:func:`segment_except`,
    :func:`segment_intersect`, :func:`segment_except_all`) keep their
    own DuckDB twins and pytest parity without burning window slots.

    Scale: each branch is a hash-aggregate / hash-anti-join over the
    two filtered segment projections — Catalyst plans EXCEPT and
    INTERSECT as aggregates over a join, all map-side-combinable; the
    union of the three branches adds no shuffle of its own."""
    a = customer.where(F.col("c_nationkey") == nation_a).select("c_mktsegment")
    b = customer.where(F.col("c_nationkey") == nation_b).select("c_mktsegment")
    one = F.lit(1).cast("long").alias("n")
    ex = a.subtract(b).select(
        F.lit("except").alias("set_op"), "c_mktsegment", one
    )
    it = a.intersect(b).select(
        F.lit("intersect").alias("set_op"), "c_mktsegment", one
    )
    xa = (
        a.exceptAll(b)
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("except_all").alias("set_op"), "c_mktsegment", "n")
    )
    return ex.unionAll(it).unionAll(xa)


def sql_segment_set_ops(nation_a: int, nation_b: int) -> str:
    """Exact DuckDB twin of the consolidated :func:`segment_set_ops`
    report: the three branch subqueries are verbatim
    :func:`sql_segment_except` / :func:`sql_segment_intersect` /
    :func:`sql_segment_except_all` cores, UNION ALL'd under a
    branch tag."""
    return f"""
        SELECT 'except' AS set_op, c_mktsegment, CAST(1 AS BIGINT) AS n
        FROM (
            SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = {nation_a}
            EXCEPT
            SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = {nation_b}
        )
        UNION ALL
        SELECT 'intersect' AS set_op, c_mktsegment, CAST(1 AS BIGINT) AS n
        FROM (
            SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = {nation_a}
            INTERSECT
            SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = {nation_b}
        )
        UNION ALL
        SELECT 'except_all' AS set_op, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT c_mktsegment FROM customer WHERE c_nationkey = {nation_a}
            EXCEPT ALL
            SELECT c_mktsegment FROM customer WHERE c_nationkey = {nation_b}
        )
        GROUP BY c_mktsegment
    """


def segment_except(customer: DataFrame, nation_a: int, nation_b: int) -> DataFrame:
    """Set EXCEPT (the pre-fold segment_set_ops body): segments present
    in nation A but not nation B."""
    a = customer.where(F.col("c_nationkey") == nation_a).select("c_mktsegment")
    b = customer.where(F.col("c_nationkey") == nation_b).select("c_mktsegment")
    return a.subtract(b)  # EXCEPT (set semantics), matching the SQL


def sql_segment_except(nation_a: int, nation_b: int) -> str:
    return f"""
        SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = {nation_a}
        EXCEPT
        SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = {nation_b}
    """


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
) -> DataFrame:
    """TPC-H Q3 shape: 3-table join + grouped revenue + top-10.
    Plan: customer is tiny -> Catalyst broadcasts it into orders; the
    orders⋈lineitem join shuffles on orderkey (or reuses bucketing);
    final top-10 is TakeOrderedAndProject."""
    joined = (
        customer.where(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > cutoff)
    )
    return (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            # o_orderdate is TIMESTAMP_NTZ: format the naive value directly
            # (a cast to TIMESTAMP would apply the session timezone, which
            # the caller's session may not pin to UTC)
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_str"),
            "o_orderpriority",
        )
    )


def sql_shipping_priority(segment: str = "BUILDING", cutoff: str = "1995-03-15") -> str:
    return f"""
        SELECT o_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
               o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = '{segment}'
          AND c_custkey = o_custkey
          AND o_orderdate < TIMESTAMP '{cutoff}'
          AND o_orderkey = l_orderkey
          AND l_shipdate > TIMESTAMP '{cutoff}'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 10
    """


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. The four dimension tables
    (region/nation/customer/supplier) broadcast; only the orders⋈lineitem
    fact join shuffles. Demonstrates Catalyst join reordering + broadcast
    selection over a realistic snowflake."""
    return (
        region.where(F.col("r_name") == region_name)
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


def sql_local_supplier_volume(region_name: str = "ASIA") -> str:
    return f"""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM region, nation, customer, orders, lineitem, supplier
        WHERE r_name = '{region_name}'
          AND n_regionkey = r_regionkey
          AND c_nationkey = n_nationkey
          AND o_custkey = c_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND s_nationkey = c_nationkey
        GROUP BY n_name
    """


def distinct_counts(orders: DataFrame) -> DataFrame:
    """Exact + approximate distinct aggregation. The approx column is the
    100 TB path (HyperLogLog, no shuffle explosion); the oracle checks
    the exact ones, tests bound the approx error."""
    return orders.agg(
        F.countDistinct("o_custkey").cast("long").alias("n_cust_exact"),
        F.approx_count_distinct("o_custkey").cast("long").alias("n_cust_approx"),
    )


SQL_DISTINCT_COUNTS_EXACT = """
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust_exact FROM orders
"""


def revenue_percentiles(orders: DataFrame) -> DataFrame:
    """Exact percentiles (linear interpolation — verified bit-identical
    to DuckDB quantile_cont). At 100 TB use approx_percentile instead
    (t-digest sketch, no global sort); the exact form is the oracle."""
    p = F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return orders.agg(
        p.getItem(0).alias("p50"),
        p.getItem(1).alias("p90"),
        p.getItem(2).alias("p99"),
    )


SQL_REVENUE_PERCENTILES = """
    SELECT quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders
"""


def cube_doc_counts(documents: DataFrame) -> DataFrame:
    """CUBE (lang, source): all 2^2 grouping sets in one pass."""
    return documents.cube("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs")
    )


SQL_CUBE_DOC_COUNTS = """
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY CUBE (lang, source)
"""


PIVOT_SOURCES = ["src0", "src1", "src2", "src3", "src4"]


def pivot_lang_source(documents: DataFrame) -> DataFrame:
    """Pivot: doc counts per lang with one column per (pinned) source.
    Pinning the pivot values keeps the plan single-pass (no distinct-
    values pre-query) — required practice at scale."""
    out = documents.groupBy("lang").pivot("source", PIVOT_SOURCES).count()
    return out.select(
        "lang",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(s) for s in PIVOT_SOURCES],
    )


SQL_PIVOT_LANG_SOURCE = (
    "SELECT lang, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN source = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS {s}"
        for s in PIVOT_SOURCES
    )
    + " FROM documents GROUP BY lang"
)


def json_prop_stats(events: DataFrame) -> DataFrame:
    """Scalar-function surface (JSON): extract a field from the props
    JSON string column and aggregate. get_json_object is JVM-side
    (Jackson), no UDF."""
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("int").alias("k_val")
        )
        .groupBy("k_val")
        .agg(F.count("*").cast("long").alias("n"))
    )


SQL_JSON_PROP_STATS = """
    SELECT CAST(props->>'k' AS INTEGER) AS k_val,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
"""


def orders_by_month(orders: DataFrame) -> DataFrame:
    """Scalar-function surface (date): month bucketing via formatting of
    the naive timestamp (TZ-independent; see driver-session notes)."""
    return (
        orders.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .groupBy("month")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
        )
    )


SQL_ORDERS_BY_MONTH = """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
"""


def segment_intersect(customer: DataFrame, nation_a: int, nation_b: int) -> DataFrame:
    """Set-op family completion: segments present in BOTH nations."""
    a = customer.where(F.col("c_nationkey") == nation_a).select("c_mktsegment")
    b = customer.where(F.col("c_nationkey") == nation_b).select("c_mktsegment")
    return a.intersect(b)


def sql_segment_intersect(nation_a: int, nation_b: int) -> str:
    return f"""
        SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = {nation_a}
        INTERSECT
        SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = {nation_b}
    """


def percentiles_by_segment(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Grouped percentiles over a broadcast-dim join: median + p90 order
    value per market segment."""
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    p = F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9)))
    return joined.groupBy("c_mktsegment").agg(
        p.getItem(0).alias("p50"),
        p.getItem(1).alias("p90"),
        F.count("*").cast("long").alias("n_orders"),
    )


SQL_PERCENTILES_BY_SEGMENT = """
    SELECT c_mktsegment,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


def asof_join_events(events: DataFrame) -> DataFrame:
    """As-of join (Spark has no native one; DuckDB does — the oracle uses
    it): for each 'purchase' event, the most recent prior-or-equal
    'click' event of the same user.

    Implementation: union both sides tagged, one window pass per user
    ordered by ts carrying the last click forward
    (last_value ignoring nulls) — a single shuffle on user_id, no
    range-join explosion. This is the standard scalable as-of pattern."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_us").alias("p_ts"), F.col("event_id").alias("p_event")
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("c_ts"), F.col("event_id").alias("c_event")
    )
    tagged = purchases.select(
        "user_id",
        F.col("p_ts").alias("tsu"),
        F.col("p_event").alias("p_event"),
        F.lit(None).cast("long").alias("c_event"),
        F.lit(1).alias("is_p"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("c_ts").alias("tsu"),
            F.lit(None).cast("long").alias("p_event"),
            F.col("c_event").alias("c_event"),
            F.lit(0).alias("is_p"),
        )
    )
    # clicks sort before purchases at identical ts (is_p ASC) so an
    # equal-timestamp click is visible to the purchase — matches ASOF <=
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("tsu"), F.asc("is_p"), F.asc("c_event"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "last_click", F.last("c_event", ignorenulls=True).over(w)
    )
    return carried.where(F.col("is_p") == 1).select(
        "user_id",
        F.col("p_event").alias("purchase_event"),
        F.col("last_click").alias("asof_click_event"),
    )


# epoch_us: integer microseconds — identical arithmetic to Spark's ts_us
# (both floor-truncate the nanosecond source)
SQL_ASOF_JOIN_EVENTS = """
    WITH p AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events WHERE event_type = 'click')
    SELECT p.user_id,
           p.event_id AS purchase_event,
           c.event_id AS asof_click_event
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.tsu >= c.tsu
"""


RANGE_BUCKET_US = 3_600_000_000  # 1 hour


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Range (interval-containment) join — an operator Spark has no
    native strategy for (an inequality-only join plans as a broadcast
    nested loop: all-pairs work).

    Bucketization makes it an equi-join: intervals explode over the
    fixed-size buckets they cover; points compute their bucket; the join
    key is (extra_keys..., bucket) and the inequality is a cheap post-
    filter. Shuffle cost ~ rows x (interval_len / bucket + 1), never
    |points| x |intervals|. Both inputs keep all their columns."""
    keys = list(extra_keys or [])
    b = F.lit(RANGE_BUCKET_US)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / b).cast("long"),
                (F.col(end_col) / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bucket", (F.col(point_col) / b).cast("long"))
    return (
        pt.join(iv, on=[*keys, "__bucket"])
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )


def events_to_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Range-join instantiation: assign every event to its session's
    [start, end] interval (sessions from :func:`sessionize`). Every event
    lands in exactly one session, so the output is a total assignment —
    checkable against a plain BETWEEN join in the oracle."""
    sessions = sessionize(events, gap_minutes)
    assigned = range_join(
        events.select("user_id", "event_id", "ts_us"),
        sessions,
        point_col="ts_us",
        start_col="sess_start_us",
        end_col="sess_end_us",
        extra_keys=["user_id"],
    )
    return assigned.select("user_id", "event_id", "sess_id")


def sql_events_to_sessions(gap_minutes: int = 30) -> str:
    return f"""
        WITH sessions AS ({sql_sessionize(gap_minutes)})
        SELECT e.user_id, e.event_id, s.sess_id
        FROM events e JOIN sessions s
          ON e.user_id = s.user_id
         AND epoch_us(e.ts) BETWEEN s.sess_start_us AND s.sess_end_us
    """


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: new session when the gap to the previous event of
    the same user exceeds ``gap_minutes``. lag + conditional cumsum —
    one shuffle on user_id. Returns per-session aggregates."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    marked = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts_us").alias("sess_start_us"),
            F.max("ts_us").alias("sess_end_us"),
        )
    )


def sql_sessionize(gap_minutes: int = 30) -> str:
    return f"""
        WITH base AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        ), lagged AS (
            SELECT user_id, event_id, ts_us,
                   ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap
            FROM base
        ), marked AS (
            SELECT user_id, event_id, ts_us,
                   CASE WHEN gap IS NULL OR gap > {gap_minutes * 60 * 1_000_000} THEN 1 ELSE 0 END AS new_sess
            FROM lagged
        ), sess AS (
            SELECT user_id, ts_us,
                   CAST(SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
            FROM marked
        )
        SELECT user_id, sess_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts_us) AS sess_start_us, MAX(ts_us) AS sess_end_us
        FROM sess GROUP BY user_id, sess_id
    """


def volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    start: str = "1996-01-01",
    end: str = "1997-12-31",
) -> DataFrame:
    """TPC-H Q7 shape: bidirectional trade volume between two nations by
    year. The nation filter is applied BEFORE the broadcast joins (each
    nation leg pre-filtered to the two names), so the inner joins drop
    out-of-scope suppliers/customers early instead of filtering after the
    fact join — the OR-of-pairs predicate can't push across join branches
    on its own. Only the lineitem⋈orders⋈customer fact joins shuffle."""
    both = [nation_a, nation_b]
    n1 = nation.where(F.col("n_name").isin(both)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.where(F.col("n_name").isin(both)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        lineitem.where(
            (F.col("l_shipdate") >= start) & (F.col("l_shipdate") <= end)
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def sql_volume_shipping(
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    start: str = "1996-01-01",
    end: str = "1997-12-31",
) -> str:
    return f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND n1.n_name IN ('{nation_a}', '{nation_b}')
          AND n2.n_name IN ('{nation_a}', '{nation_b}')
          AND n1.n_name <> n2.n_name
          AND l_shipdate >= TIMESTAMP '{start}'
          AND l_shipdate <= TIMESTAMP '{end}'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns in a
    quarter. Selective filters (returnflag, 3-month order window) are on
    the scan side of each fact table so they push into the parquet read;
    nation broadcasts; the top-k is TakeOrderedAndProject with a
    deterministic custkey tiebreak (revenue is cross-engine bit-exact,
    so the tie order — and hence the row SET — matches the oracle)."""
    j = (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= start) & (F.col("o_orderdate") < end)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


def sql_returned_item_report(
    start: str = "1996-01-01", end: str = "1996-04-01", k: int = 20
) -> str:
    return f"""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '{start}'
          AND o_orderdate < TIMESTAMP '{end}'
          AND l_returnflag = 'R'
          AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT {k}
    """


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share. One broadcast join
    (part is the small dim), one global two-sum aggregate; the final
    percentage is plain IEEE double arithmetic over two decimal-exact
    sums, so it is bit-identical across engines."""
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = lineitem.where(
        (F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end)
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    agg = j.agg(
        _dec_sum(
            F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
        ).alias("promo_revenue"),
        _dec_sum(disc).alias("total_revenue"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
        "promo_revenue",
        "total_revenue",
    )


def sql_promo_revenue(start: str = "1996-01-01", end: str = "1997-01-01") -> str:
    return f"""
        SELECT CAST(100.0 AS DOUBLE) * promo_revenue / total_revenue AS promo_pct,
               promo_revenue, total_revenue
        FROM (
            SELECT
                CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
            FROM lineitem, part
            WHERE l_partkey = p_partkey
              AND l_shipdate >= TIMESTAMP '{start}'
              AND l_shipdate < TIMESTAMP '{end}'
        )
    """


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, since: str = "1999-01-01"
) -> DataFrame:
    """Anti-join shape (TPC-H Q22 spirit): customers with no order after
    a date, counted per market segment with their idle balance. The anti
    join build side is the FILTERED orders key set; Catalyst broadcasts
    it when small, else shuffled-hash — either way only keys move."""
    recent = orders.where(F.col("o_orderdate") >= since).select("o_custkey")
    return (
        customer.join(
            recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_idle_customers"),
            _dec_sum(F.col("c_acctbal")).alias("idle_balance"),
        )
        .orderBy("c_mktsegment")
    )


def sql_customers_without_orders(since: str = "1999-01-01") -> str:
    return f"""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_idle_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS idle_balance
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '{since}'
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """


def orders_above_customer_average(
    orders: DataFrame, factor: float = 2.0, k: int = 50
) -> DataFrame:
    """Correlated-subquery shape (TPC-H Q17/Q18 spirit): orders whose
    price exceeds ``factor`` × that customer's average. Decorrelated the
    way Catalyst itself would: one grouped aggregate over the fact, then
    a self-join on the group key — both sides shuffle once on o_custkey
    and the per-customer average is computed map-side-partial first.
    The threshold comparison is IEEE double on a decimal-exact average,
    identical in both engines."""
    avg_per_cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        (
            _dec_sum(F.col("o_totalprice"))
            / F.count("*").cast("double")
        ).alias("avg_price")
    )
    return (
        orders.join(avg_per_cust, F.col("o_custkey") == F.col("ck"))
        .where(F.col("o_totalprice") > F.lit(factor) * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "avg_price")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(k)
    )


def sql_orders_above_customer_average(factor: float = 2.0, k: int = 50) -> str:
    return f"""
        SELECT o_orderkey, o_custkey, o_totalprice, avg_price
        FROM orders
        JOIN (
            SELECT o_custkey AS ck,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) AS avg_price
            FROM orders GROUP BY o_custkey
        ) a ON o_custkey = ck
        WHERE o_totalprice > {factor} * avg_price
        ORDER BY o_totalprice DESC, o_orderkey LIMIT {k}
    """


def running_revenue_by_month(orders: DataFrame, max_custkey: int = 200) -> DataFrame:
    """Cumulative window shape: per-customer running revenue over order
    months (lag/cumsum family — the reference cannot express windows at
    all). One shuffle on the partition key; the running sum is computed
    inside the sort of each customer's frame. Bounded to a customer
    range so the driver-gate result stays small; the plan is
    range-filter + window either way."""
    monthly = (
        orders.where(F.col("o_custkey") <= max_custkey)
        .groupBy(
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        )
        .agg(_dec_sum(F.col("o_totalprice")).alias("month_revenue"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # decimal-accumulate the running sum so fold order can't matter
    return monthly.select(
        "o_custkey",
        "order_month",
        "month_revenue",
        F.sum(F.col("month_revenue").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_revenue"),
    )


def sql_running_revenue_by_month(max_custkey: int = 200) -> str:
    return f"""
        SELECT o_custkey, order_month, month_revenue,
               CAST(SUM(CAST(month_revenue AS DECIMAL(18,6))) OVER (
                   PARTITION BY o_custkey ORDER BY order_month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_revenue
        FROM (
            SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS order_month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS month_revenue
            FROM orders WHERE o_custkey <= {max_custkey}
            GROUP BY o_custkey, order_month
        )
    """


def late_shipment_orders(
    orders: DataFrame, lineitem: DataFrame, since: str = "2000-06-01"
) -> DataFrame:
    """Semi-join shape (TPC-H Q4 spirit): count orders by priority that
    have AT LEAST ONE lineitem shipped after a date. LEFT SEMI keeps the
    probe side single-copy (no fan-out, no dedup after) and the filtered
    key set is all that moves — broadcast when small, shuffled-hash
    beyond."""
    late = lineitem.where(F.col("l_shipdate") >= since).select("l_orderkey")
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def sql_late_shipment_orders(since: str = "2000-06-01") -> str:
    return f"""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate >= TIMESTAMP '{since}'
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """


def supplier_diversity_by_brand(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Distinct-aggregate-after-join shape (TPC-H Q16 spirit): distinct
    supplier count per part brand. COUNT(DISTINCT) expands to a two-phase
    plan (partial distinct on (brand, suppkey), then count) — the
    formulation that scales, vs collecting supplier sets. part broadcasts
    into the lineitem scan."""
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
            F.count("*").cast("long").alias("n_lineitems"),
        )
        .orderBy("p_brand")
    )


SQL_SUPPLIER_DIVERSITY_BY_BRAND = """
    SELECT p_brand,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem, part
    WHERE l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
"""


def grouping_sets_doc_stats(documents: DataFrame) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond rollup/cube): per-lang, per-source,
    and grand total in ONE pass — Spark expands the sets inside a single
    Expand + hash-agg, no union of scans."""
    return (
        documents.groupingSets(
            [["lang"], ["source"], []], "lang", "source"
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang", "source")
    )


SQL_GROUPING_SETS_DOC_STATS = """
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), ())
    ORDER BY lang, source
"""


def revenue_month_over_month(orders: DataFrame) -> DataFrame:
    """lag/lead window shape: monthly revenue with previous-month value
    and delta. One global-by-month frame — the window key is the month
    (few rows after the pre-aggregation), so the single-partition window
    is over an already-tiny aggregate, not the fact table."""
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(_dec_sum(F.col("o_totalprice")).alias("revenue"))
    w = Window.orderBy("order_month")
    return monthly.select(
        "order_month",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.coalesce(F.lag("revenue").over(w), F.lit(0.0))).alias(
            "delta"
        ),
    )


SQL_REVENUE_MONTH_OVER_MONTH = """
    SELECT order_month, revenue,
           LAG(revenue) OVER (ORDER BY order_month) AS prev_revenue,
           revenue - COALESCE(LAG(revenue) OVER (ORDER BY order_month), 0.0) AS delta
    FROM (
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM orders GROUP BY order_month
    )
"""


def segment_except_all(
    customer: DataFrame, nation_a: int, nation_b: int
) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity-aware): each segment
    occurrence in nation A minus one matching occurrence in nation B.
    Spark's exceptAll ≡ SQL EXCEPT ALL — counted per-row, not per-set —
    completing the set-op family next to `segment_set_ops` (EXCEPT) and
    `segment_intersect` (INTERSECT). Grouped to a deterministic count so
    the oracle comparison is order-free."""
    a = customer.where(F.col("c_nationkey") == nation_a).select("c_mktsegment")
    b = customer.where(F.col("c_nationkey") == nation_b).select("c_mktsegment")
    return (
        a.exceptAll(b)
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("surplus"))
        .orderBy("c_mktsegment")
    )


def sql_segment_except_all(nation_a: int, nation_b: int) -> str:
    return f"""
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS surplus FROM (
            SELECT c_mktsegment FROM customer WHERE c_nationkey = {nation_a}
            EXCEPT ALL
            SELECT c_mktsegment FROM customer WHERE c_nationkey = {nation_b}
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """


def profile_table(
    df: DataFrame, columns: "list[str] | None" = None, exact: bool = True
) -> DataFrame:
    """Column-profile report — the ANALYZE-TABLE pass a training-data
    pipeline runs before ingest: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_str, max_str).

    ``exact=True`` uses COUNT(DISTINCT) — oracle-checkable, one
    shuffle-free aggregate per profile since all columns aggregate in a
    SINGLE pass (no per-column jobs, no collect loop). At 100 TB switch
    ``exact=False``: HyperLogLog ``approx_count_distinct`` keeps the
    pass single-scan with bounded memory per column (no exact-distinct
    hash tables), at ±2% error (rows-only check — the estimate is
    engine-specific). min/max are computed on the string form so one
    schema covers heterogeneous column types; numeric profiling per se
    belongs to the caller's typed queries.

    The un-pivot to rows happens AFTER aggregation via a stack of
    struct literals — driver-size data, no explode of the input."""
    cols = columns or df.columns
    cnt = F.count(F.lit(1))
    d_fn = F.count_distinct if exact else F.approx_count_distinct
    aggs = [cnt.alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__nn_{c}"),
            d_fn(F.col(c)).cast("long").alias(f"__nd_{c}"),
            # typed MIN/MAX, then one cast of the result — numeric
            # ordering, and the string form only has to agree for the
            # columns the caller profiles (ints/strings are identical
            # across engines; double/timestamp FORMATS differ, so keep
            # those out of oracle-checked profile queries)
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_str"),
                F.col(f"__mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def sql_profile_table(
    table: str, columns: "list[str]"
) -> str:
    """Oracle for exact :func:`profile_table`: one SELECT per column,
    UNION ALL'd — fine at oracle scale; the Spark side does it in a
    single aggregate pass."""
    parts = [
        f"""
        SELECT '{c}' AS column,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_str,
               CAST(MAX({c}) AS VARCHAR) AS max_str
        FROM {table}
        """
        for c in columns
    ]
    return " UNION ALL ".join(parts)


def forecast_revenue_q6(
    lineitem: DataFrame,
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    d_lo: float = 0.05,
    d_hi: float = 0.07,
    qty_cap: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): one highly selective
    scan + a single global sum — the canonical pushdown showcase. All
    three predicates reach the parquet scan (`PushedFilters` in
    .explain), so row groups outside the ship-date year are never read;
    no join, no shuffle beyond the final 1-row combine. Sum accumulates
    in DECIMAL(18,4) then casts to double — the cross-engine
    order-independent pattern (see q_aggregate_using_index)."""
    f = lineitem.where(
        (F.col("l_shipdate") >= year_start)
        & (F.col("l_shipdate") < year_end)
        & (F.col("l_discount") >= d_lo)
        & (F.col("l_discount") <= d_hi)
        & (F.col("l_quantity") < qty_cap)
    )
    return f.agg(
        F.sum(
            (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").cast("long").alias("n_lines"),
    )


def sql_forecast_revenue_q6(
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    d_lo: float = 0.05,
    d_hi: float = 0.07,
    qty_cap: float = 24.0,
) -> str:
    return f"""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{year_start}'
          AND l_shipdate < TIMESTAMP '{year_end}'
          AND l_discount BETWEEN {d_lo} AND {d_hi}
          AND l_quantity < {qty_cap}
    """


def order_priority_semijoin(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q4 shape (reference has no SQL surface; SURVEY §2.5
    extension): count orders per priority where AT LEAST ONE line
    shipped more than ``late_days`` after the order date — an EXISTS
    that must compile to a LEFT SEMI join, never a join+distinct (the
    semi join short-circuits on first match and emits each order once,
    where join+distinct would materialize every matching line).

    Scale: the semi join shuffles both sides on orderkey once; the
    non-equi lateness condition rides the join as a residual filter, so
    no post-join pass. Output: (o_orderpriority, n_orders)."""
    li = lineitem.select("l_orderkey", "l_shipdate")
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


def sql_order_priority_semijoin(late_days: int = 60) -> str:
    return f"""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL {int(late_days)} DAY
        )
        GROUP BY o_orderpriority
    """


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer —
    (c_count, custdist) where custdist customers placed exactly c_count
    orders, INCLUDING the zero bucket (hence the left outer join;
    an inner join would silently drop order-less customers).

    Scale: two aggregations with map-side partial combine. The first
    shuffles on custkey (count per customer — at most |customers| rows
    survive each map task); the second shuffles the tiny per-customer
    counts on c_count. Nothing ever carries order line width."""
    per_cust = (
        customer.join(
            orders.select("o_custkey", "o_orderkey"),
            customer["c_custkey"] == orders["o_custkey"],
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


SQL_CUSTOMER_ORDER_DISTRIBUTION = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
"""


def large_orders(
    orders: DataFrame, lineitem: DataFrame, min_qty: float = 250.0
) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): orders whose total line
    quantity exceeds ``min_qty``, with the total attached.

    Scale: aggregate-then-join — the quantity sum reduces lineitem to
    at most |orders| rows (map-side partial combine) BEFORE the join,
    and the HAVING predicate cuts that to the few large orders, so the
    join probe side is tiny (broadcastable under AQE). Joining first
    and aggregating after would shuffle every line with full order
    width. Quantities are integral doubles, so the sum is exact in any
    accumulation order — safe to hash-compare cross-engine (unlike
    price sums, which need the decimal accumulator)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    # o_orderdate is deliberately not projected: raw timestamp columns
    # need per-engine epoch normalization (see asof_join) and add nothing
    # here — o_orderkey already identifies the order.
    return orders.join(
        big, orders["o_orderkey"] == big["l_orderkey"]
    ).select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")


def sql_large_orders(min_qty: float = 250.0) -> str:
    return f"""
        SELECT o_orderkey, o_custkey, o_totalprice, total_qty
        FROM orders
        JOIN (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > {min_qty}
        ) big ON o_orderkey = big.l_orderkey
    """


def disjunctive_part_revenue(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under an OR of brand/size/
    quantity conjunctions). The plan property under test: Catalyst must
    extract the common ``l_partkey = p_partkey`` equi-condition and the
    per-side conjuncts it can push (quantity bounds to the lineitem
    scan, brand/size to the part scan) instead of evaluating the whole
    disjunction post-join.

    Scale: part is the small side — broadcast, so lineitem is scanned
    once, never shuffled; revenue accumulates in decimal (order-free,
    cross-engine exact). Output: one row (revenue)."""
    j = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    def band(brand: str, qlo: int, qhi: int, slo: int, shi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("l_quantity").between(qlo, qhi)
            & F.col("p_size").between(slo, shi)
        )
    cond = (
        band("Brand#12", 1, 11, 1, 5)
        | band("Brand#23", 10, 20, 1, 10)
        | band("Brand#34", 20, 30, 1, 15)
    )
    return j.where(cond).agg(
        _dec_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue")
    )


SQL_DISJUNCTIVE_PART_REVENUE = """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


def waiting_customers(
    customer: DataFrame, orders: DataFrame, big_order: float = 350_000.0
) -> DataFrame:
    """TPC-H Q22 shape: per nation, the count and total balance of
    above-average-balance customers who never placed an order above
    ``big_order`` — scalar aggregate subquery + anti join + group.

    Cross-engine exactness of the threshold: the average is computed as
    decimal-accumulated sum (order-free) divided by the count in ONE
    double division — both engines produce the identical double, so the
    strict > comparison can never flip a customer across engines. The
    per-nation balance total is decimal-accumulated for the same
    reason.

    Scale: the average is a full-column aggregate that reduces to one
    row (broadcast into the filter); the anti join shuffles on custkey
    against only the big-order keys (pre-filtered projection of
    orders); the final group-by is over the small survivor set."""
    stats = customer.agg(
        (_dec_sum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
    )
    big = orders.where(F.col("o_totalprice") > big_order).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(stats))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(big, customer["c_custkey"] == big["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_cust"),
            _dec_sum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


def sql_waiting_customers(big_order: float = 350_000.0) -> str:
    return f"""
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
        FROM customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
            FROM customer
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {big_order}
        )
        GROUP BY c_nationkey
    """


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, factor: float = 0.5
) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): average yearly
    revenue lost if small orders — lines with quantity under ``factor``
    × that part's average quantity — were not filled. The plan property
    under test: the correlated scalar subquery (per-part average) must
    decorrelate to aggregate-then-join, ONE extra aggregation over
    lineitem, not a per-row subquery execution.

    Cross-engine exactness: quantities are integral doubles, so the
    per-part sum is exact in any accumulation order and sum/count is one
    IEEE division — the threshold compares identically on both engines.
    Revenue accumulates in decimal; the final /7.0 is one IEEE op.

    Scale: the per-part average aggregates lineitem down to |parts| rows
    (map-side combine) and is broadcast back, as is the part side — the
    big lineitem table is scanned once, never shuffled. Output: one row
    (avg_yearly)."""
    avg_q = lineitem.groupBy("l_partkey").agg(
        (
            F.sum("l_quantity") / F.count("l_quantity")
        ).alias("avg_qty")
    )
    j = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_q), "l_partkey")
        .where(F.col("l_quantity") < F.lit(float(factor)) * F.col("avg_qty"))
    )
    return j.agg(
        (_dec_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
    )


def sql_small_quantity_revenue(factor: float = 0.5) -> str:
    return f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity < (
            SELECT {float(factor)} * (SUM(l2.l_quantity) / COUNT(l2.l_quantity))
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
    """


def waiting_suppliers(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for each
    supplier, count the lines in finalized multi-supplier orders where
    THIS supplier shipped strictly last — an EXISTS (another supplier
    participated) combined with a NOT EXISTS (no other supplier shipped
    later), i.e. one left-semi and one left-anti join against the same
    lineitem table with non-equi residuals. The double correlated
    EXISTS is the hardest decorrelation shape in the TPC-H suite.

    Scale (r14 rewrite, guide §2.4): the semi+anti join form derived
    lineitem THREE times (three fact scans; three fact shuffles under
    sort-merge, or two whole-fact broadcasts when the estimator allows
    them). Both EXISTS are correlated only on l_orderkey, so one
    hash(l_orderkey) exchange + windows over the order's lines answers
    them from a SINGLE lineitem scan:

      m1 = max shipdate in the order,
      sm = the set of suppliers with a line at m1,
      m2 = max shipdate over lines of suppliers NOT in sm.

    A line (s, d) waits iff some OTHER supplier participated and none
    shipped strictly later, i.e. maxOther(s) <= d where maxOther(s) is
    the max shipdate over other suppliers' lines:
      * another supplier sits at the top (size(sm) > 1 or s not in sm):
        maxOther = m1, and maxOther <= d iff d == m1 — and EXISTS holds
        because that top supplier differs from s;
      * s is the UNIQUE top supplier (sm == {s}): every other
        supplier's line is below m1 and belongs to a not-in-sm
        supplier, so maxOther = m2 exactly; m2 IS NULL means no other
        supplier participated (EXISTS fails) and NULL <= d filters
        false, which is the required outcome.
    TPC-H's l_orderkey/l_suppkey/l_shipdate are NOT NULL, matching the
    joins' implicit null drops. Output: (l_suppkey, numwait)."""
    fin = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    base = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(fin, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    w_o = Window.partitionBy("l_orderkey")
    d = F.col("l_shipdate")
    s1 = base.withColumn("__m1", F.max(d).over(w_o))
    s2 = s1.withColumn(
        "__sm",
        F.collect_set(
            F.when(d == F.col("__m1"), F.col("l_suppkey"))
        ).over(w_o),
    )
    s3 = s2.withColumn(
        "__m2",
        F.max(
            F.when(~F.array_contains("__sm", F.col("l_suppkey")), d)
        ).over(w_o),
    )
    top_other = (F.size("__sm") > 1) | ~F.array_contains(
        "__sm", F.col("l_suppkey")
    )
    waited = s3.where(
        F.when(top_other, d == F.col("__m1")).otherwise(
            F.col("__m2") <= d
        )
    )
    return waited.groupBy("l_suppkey").agg(
        F.count("*").cast("bigint").alias("numwait")
    )


SQL_WAITING_SUPPLIERS = """
    SELECT l1.l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY l1.l_suppkey
"""


def market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    supp_nation: str = "NATION_2",
    market_region: str = "ASIA",
    p_type: str = "PROMO",
    start: str = "1995-01-01",
    end: str = "2001-01-01",
) -> DataFrame:
    """TPC-H Q8 shape (national market share): for each order year, the
    fraction of revenue from ``p_type`` parts sold to customers in
    ``market_region`` that was supplied by ``supp_nation``. The widest
    join tree in the suite — a 7-table snowflake where only the
    lineitem⋈orders⋈customer fact joins shuffle; part (type-filtered),
    supplier, and both nation/region dimension legs broadcast (customer
    is column-pruned but NOT force-broadcast — at 100 TB it is a fact
    table, so AQE picks the strategy). The
    share is a conditional-sum-over-sum on the SAME aggregated rows, so
    the numerator costs no second pass.

    Cross-engine exactness: numerator and denominator accumulate in
    DECIMAL(18,6) (order-independent); the share is then ONE IEEE
    double division per year — identical on both engines.

    Scale: the part filter prunes the fact scan via the broadcast hash
    join's build side (and a Bloom/DPP runtime filter under AQE); the
    per-year output is 6 rows. Output: (o_year, mkt_share)."""
    pk = part.where(F.col("p_type") == p_type).select("p_partkey")
    mkt_nations = (
        nation.join(
            region.where(F.col("r_name") == market_region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_leg = supplier.join(
        F.broadcast(
            nation.where(F.col("n_name") == supp_nation).select(
                F.col("n_nationkey").alias("s_nk"), "n_name"
            )
        ),
        F.col("s_nationkey") == F.col("s_nk"),
        "left",
    ).select("s_suppkey", F.col("n_name").isNotNull().alias("is_supp_nation"))
    j = (
        lineitem.join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.where(
                (F.col("o_orderdate") >= start) & (F.col("o_orderdate") < end)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(mkt_nations), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(supp_leg), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        j.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev.alias("__rev"),
            F.when(F.col("is_supp_nation"), rev).otherwise(
                F.lit(0).cast("decimal(18,6)")
            ).alias("__nat_rev"),
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum("__nat_rev").cast("double")
                / F.sum("__rev").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def sql_market_share(
    supp_nation: str = "NATION_2",
    market_region: str = "ASIA",
    p_type: str = "PROMO",
    start: str = "1995-01-01",
    end: str = "2001-01-01",
) -> str:
    return f"""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM(CASE WHEN n2.n_name = '{supp_nation}'
                             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS mkt_share
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = '{market_region}' AND s_nationkey = n2.n_nationkey
          AND o_orderdate >= TIMESTAMP '{start}'
          AND o_orderdate < TIMESTAMP '{end}'
          AND p_type = '{p_type}'
        GROUP BY o_year
        ORDER BY o_year
    """


def _q15_supplier_revenue(
    lineitem: DataFrame, start: str, end: str
) -> DataFrame:
    """Q15's per-supplier quarter-revenue view BEFORE the checkpoint —
    factored out so the plan test can assert the l_shipdate pushdown
    reaches the lineitem scan (the checkpoint hides the scan from
    top_supplier's own plan)."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end)
        )
        .groupBy("l_suppkey")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape (top supplier): revenue per supplier over one
    quarter, then the supplier(s) whose revenue equals the maximum —
    the reference query's CREATE VIEW + scalar-subquery-max. The naive
    self-referencing formulation (aggregate once for the per-supplier
    view, again for the max, join them) plans TWO full lineitem scans —
    exchange reuse does not fire across the two aggregation branches —
    so the per-supplier view is localCheckpoint-ed (lineitem scanned
    and shuffled exactly once, at the checkpoint), the max is a tiny
    two-phase aggregate over it, and the 1-row max broadcasts back —
    no single-partition WindowExec anywhere (the corpus_top_terms
    discipline; plan-asserted in tests/test_plans.py). The checkpoint
    is |active suppliers| rows in the block manager, executor-spread.

    Cross-engine exactness: revenue accumulates in DECIMAL(18,6) per
    supplier; MAX over the resulting doubles is order-independent, and
    equality against it selects identical rows on both engines.

    Output: (s_suppkey, s_name, total_revenue) — ties all kept, per the
    official query's semantics."""
    rev = _q15_supplier_revenue(lineitem, start, end).transform(truncate_lineage)
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    max_size: int = 10,
    p_type: str = "STANDARD",
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part): for each part of the
    given type up to the given size, the supplier(s) offering the lowest observed
    unit cost, ordered by account balance. The schema has no partsupp
    table, so the cost relation is DERIVED from lineitem —
    MIN(l_extendedprice / l_quantity) per (part, supplier) — which
    preserves the query's defining shape: a correlated MIN subquery
    against a grouped view, decorrelated by Catalyst to
    aggregate-then-join (per-part min joined back on equality), never a
    per-row subquery execution. The output order is the reference's
    ORDER BY s_acctbal DESC LIMIT k, made total with (p_partkey,
    s_suppkey) tie-breaks → TakeOrderedAndProject, no global sort.

    Cross-engine exactness: each unit cost is ONE IEEE division; MIN is
    order-independent; the equality join against the per-part min
    compares identical doubles.

    Scale: the cost view aggregates lineitem down to |part×supplier
    observed| rows in one shuffle; the part filter broadcasts and
    prunes BEFORE the aggregation (build-side pruning of the fact
    scan); supplier/nation broadcast. Output: (s_acctbal, s_name,
    n_name, p_partkey, cost)."""
    pk = part.where(
        (F.col("p_size") <= max_size) & (F.col("p_type") == p_type)
    ).select("p_partkey")
    cost = (
        lineitem.join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    best = cost.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("cost").alias("__min_cost")
    )
    return (
        cost.join(
            F.broadcast(best),
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("cost") == F.col("__min_cost")),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("l_partkey").alias("p_partkey"), "cost",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name")
        )
        .limit(k)
    )


def sql_min_cost_supplier(
    max_size: int = 10, p_type: str = "STANDARD", k: int = 100
) -> str:
    return f"""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS cost
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_size <= {max_size} AND p_type = '{p_type}'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s_acctbal, s_name, n_name, c.l_partkey AS p_partkey, c.cost
        FROM cost c
        JOIN supplier ON s_suppkey = c.l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE c.cost = (
            SELECT MIN(c2.cost) FROM cost c2 WHERE c2.l_partkey = c.l_partkey
        )
        ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC
        LIMIT {k}
    """


def important_parts(
    lineitem: DataFrame, factor: float = 1.5
) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose total revenue
    exceeds ``factor`` × the MEAN per-part revenue — a GROUP BY with a
    scalar threshold derived from the same aggregate, the Q11 HAVING
    shape. (The official query's fraction-of-total threshold is
    SF-dependent by spec; the mean-relative form keeps the result
    non-degenerate at every scale with one constant.) Like Q15, the
    naive two-branch formulation would scan lineitem twice; instead the
    |parts|-row aggregate is localCheckpoint-ed (fact table scanned and
    shuffled once, at the checkpoint), the global total/count is a tiny
    two-phase aggregate over it, broadcast back as one row — no
    single-partition WindowExec. That matters here more than in Q15:
    |parts| grows WITH the scale factor (~200M at the 100 TB target),
    so a global window over it would be a real single-task bottleneck,
    not a dim-sized one (plan-asserted window-free).

    Cross-engine exactness: per-part revenue AND the global total both
    accumulate in decimal (two-phase decimal sum — associative,
    order-free); the threshold is one double multiply, the compare is
    on identical doubles.

    Scale: one hash-agg on l_partkey; the checkpoint is |parts| rows in
    the block manager, executor-spread. Output: (l_partkey, part_rev),
    ordered by value desc with key tie-break."""
    pr = lineitem.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("__rev_dec")
    ).transform(truncate_lineage)
    tot = pr.agg(
        F.sum("__rev_dec").alias("__total"), F.count("*").alias("__n")
    )
    return (
        pr.crossJoin(F.broadcast(tot))
        .where(
            F.col("__rev_dec").cast("double")
            > F.col("__total").cast("double")
            / F.col("__n").cast("double")
            * F.lit(float(factor))
        )
        .select(
            "l_partkey", F.col("__rev_dec").cast("double").alias("part_rev")
        )
        .orderBy(F.desc("part_rev"), F.asc("l_partkey"))
    )


def sql_important_parts(factor: float = 1.5) -> str:
    return f"""
        WITH pr AS (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev_dec
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(rev_dec AS DOUBLE) AS part_rev
        FROM (
            SELECT l_partkey, rev_dec, SUM(rev_dec) OVER () AS total,
                   COUNT(*) OVER () AS n
            FROM pr
        )
        WHERE CAST(rev_dec AS DOUBLE) > CAST(total AS DOUBLE) / CAST(n AS DOUBLE) * {float(factor)}
        ORDER BY part_rev DESC, l_partkey ASC
    """


def excess_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    p_type: str = "PROMO",
    factor: float = 2.0,
) -> DataFrame:
    """TPC-H Q20 shape (excess suppliers): suppliers who shipped more
    than ``factor`` × the per-supplier average quantity of some
    ``p_type`` part — a CHAIN of nested IN subqueries (supplier IN
    (... part IN (...))) that must decorrelate to stacked left-semi
    joins over aggregated views, never per-row subquery execution.
    (The official query thresholds partsupp availability; with no
    partsupp table the shipped-quantity average per part plays the
    threshold role — same nesting, same decorrelation demands.)

    Cross-engine exactness: quantities are integral doubles (exact
    sums any order); the average is one division; COUNT is exact.

    Scale: one (part, supplier) aggregation of the type-filtered fact
    rows (broadcast part prunes the scan); the per-part average
    aggregates that small view again; the final supplier filter is a
    semi join against a key set. Output: (s_suppkey, s_name)."""
    pk = part.where(F.col("p_type") == p_type).select("p_partkey")
    shipped = (
        lineitem.join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    per_part = shipped.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.sum("qty") / F.count("qty")).alias("__avg_qty")
    )
    excess_keys = (
        shipped.join(F.broadcast(per_part), F.col("l_partkey") == F.col("__pk"))
        .where(F.col("qty") > F.lit(float(factor)) * F.col("__avg_qty"))
        .select("l_suppkey")
    )
    return (
        supplier.join(
            excess_keys,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def sql_excess_suppliers(p_type: str = "PROMO", factor: float = 2.0) -> str:
    return f"""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM (
                SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
                FROM lineitem
                WHERE l_partkey IN (
                    SELECT p_partkey FROM part WHERE p_type = '{p_type}'
                )
                GROUP BY l_partkey, l_suppkey
            ) s
            WHERE s.qty > {float(factor)} * (
                SELECT SUM(s2.qty) / COUNT(s2.qty) FROM (
                    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
                    FROM lineitem
                    WHERE l_partkey IN (
                        SELECT p_partkey FROM part WHERE p_type = '{p_type}'
                    )
                    GROUP BY l_partkey, l_suppkey
                ) s2
                WHERE s2.l_partkey = s.l_partkey
            )
        )
        ORDER BY s_suppkey
    """


def sql_top_supplier(start: str = "1996-01-01", end: str = "1996-04-01") -> str:
    return f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{start}'
              AND l_shipdate < TIMESTAMP '{end}'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """


def product_type_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    name_word: str = "widget",
) -> DataFrame:
    """TPC-H Q9 shape (product type profit): profit by supplier nation and
    order year for parts whose name contains a word. The schema has no
    partsupp table, so the supply-cost relation DERIVES from lineitem:
    2% of the cheapest observed line price per (part, supplier) pair.
    The constant factor keeps every summed term on a bounded decimal
    grid — MIN(l_extendedprice) is a scale-2 data value, ×0.02 lands on
    the scale-4 grid, ×integral l_quantity stays there, and
    extendedprice×(1−discount) is scale-4 — so _dec_sum's scale-6
    accumulation is exact and order-independent on both engines (a
    division-derived unit cost would leave the grid and make the
    double→decimal cast engine-sensitive).

    Shape parity with the reference query: a five-way snowflake join
    around the lineitem fact, an aggregate-defined cost view joined back
    on the fact's (partkey, suppkey), and a two-level GROUP BY
    (nation, year) with descending year order.

    Scale: the part-name filter broadcasts and prunes the fact scan
    BEFORE the cost aggregation, so both the cost view and the profit
    join see only in-scope lines; the cost view is bounded by
    |observed part×supplier| of the filtered parts (dim-sized →
    broadcast); supplier/nation broadcast; orders⋈lineitem on orderkey
    is the only fact-sized shuffle. One lineitem scan feeds both the
    cost view and the profit expression via the shared pruned scan
    (Catalyst reuses the broadcast-pruned subplan; worst case two
    parallel pruned scans, never two full-table passes)."""
    pk = part.where(F.col("p_name").contains(name_word)).select("p_partkey")
    pruned = lineitem.join(
        F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey")
    )
    cost = (
        pruned.groupBy(
            F.col("l_partkey").alias("c_pk"), F.col("l_suppkey").alias("c_sk")
        )
        .agg((F.min("l_extendedprice") * F.lit(0.02)).alias("supplycost"))
    )
    # NOT broadcast-hinted: the cost view is partsupp-sized (|observed
    # part×supplier| of the filtered parts) — small enough for AQE to
    # broadcast at moderate SF, but a forced hint would OOM the build
    # side at 100 TB where it's a few percent of the fact; let AQE pick
    j = (
        pruned.join(
            cost,
            (F.col("l_partkey") == F.col("c_pk"))
            & (F.col("l_suppkey") == F.col("c_sk")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_dec_sum(F.col("amount")).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def sql_product_type_profit(name_word: str = "widget") -> str:
    return f"""
        SELECT nation, o_year,
               CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - cost.supplycost * l_quantity AS amount
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN (
                SELECT l_partkey AS c_pk, l_suppkey AS c_sk,
                       MIN(l_extendedprice) * CAST(0.02 AS DOUBLE) AS supplycost
                FROM lineitem
                WHERE l_partkey IN (
                    SELECT p_partkey FROM part
                    WHERE p_name LIKE '%{name_word}%'
                )
                GROUP BY c_pk, c_sk
            ) cost ON l_partkey = c_pk AND l_suppkey = c_sk
            JOIN orders ON o_orderkey = l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE p_name LIKE '%{name_word}%'
        )
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """


def shipmode_priority_dist(
    lineitem: DataFrame,
    orders: DataFrame,
    start: str = "1997-01-01",
    end: str = "1998-01-01",
    late_days: int = 30,
) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): per line
    category, how many lateness-qualifying lines belong to high-priority
    orders vs the rest. The schema has no l_shipmode/l_commitdate/
    l_receiptdate, so the category is l_returnflag and the lateness
    predicate is "shipped more than `late_days` after the order date" —
    the defining shape survives intact: a fact⋈fact join on orderkey, a
    multi-predicate date filter (one side pushable to the scan, one side
    spanning both tables so it can only run post-join), and a CASE-WHEN
    conditional aggregation over an order attribute.

    Counts are BIGINTs — cross-engine exact by construction.

    Scale: the [start, end) shipdate window pushes to the lineitem
    parquet scan (PushedFilters); the cross-table lateness predicate
    runs as a post-join filter; the single shuffle is the orderkey
    join (AQE may flip it to broadcast when the date window makes the
    pruned lineitem side small). Aggregation is partial (map-side
    combine) into |categories| rows."""
    high = ("1-URGENT", "2-HIGH")
    j = (
        lineitem.where(
            (F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end)
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        )
    )
    is_high = F.col("o_orderpriority").isin(*high)
    return (
        j.groupBy(F.col("l_returnflag").alias("category"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("category")
    )


def sql_shipmode_priority_dist(
    start: str = "1997-01-01", end: str = "1998-01-01", late_days: int = 30
) -> str:
    return f"""
        SELECT l_returnflag AS category,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey
          AND l_shipdate >= TIMESTAMP '{start}'
          AND l_shipdate < TIMESTAMP '{end}'
          AND l_shipdate > o_orderdate + INTERVAL {late_days} DAY
        GROUP BY category
        ORDER BY category
    """


def parts_supplier_relationship(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#3",
    excl_type: str = "STANDARD",
    sizes: tuple = (1, 4, 9, 16, 25, 36, 49),
    balance_floor: float = 1000.0,
) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) for parts outside an excluded brand
    and type, restricted to a size list, excluding suppliers on a
    complaint list. Two derivations from the reduced schema: the
    partsupp relation is the DISTINCT (l_partkey, l_suppkey) pairs
    observed in lineitem, and — with no s_comment column — the
    complaint list is suppliers under an account-balance floor. The
    defining plan shapes survive: a NOT IN supplier subquery (null-free
    key → Catalyst rewrites to a broadcast left-anti join, never a
    per-row subquery), a dim-side filtered join, and a COUNT(DISTINCT)
    over grouped keys.

    Counts are BIGINTs — cross-engine exact.

    Scale: the ONLY fact-scale exchange is COUNT(DISTINCT)'s partial
    pass, and both broadcast filters land BELOW it: the dim-side part
    filter prunes lineitem to matching parts (~10% selectivity) and the
    anti-join drops complaint suppliers BEFORE any shuffle, and the
    partial aggregate reduces each scan partition to its distinct
    (brand, type, size, suppkey) combos — coarser than the textbook
    partsupp derivation's (partkey, suppkey) key, so the exchange
    carries strictly fewer, pre-filtered rows AND the standalone
    pair-distinct exchange disappears (r14: 4 exchanges → 3).
    Equivalence with the SQL twin's SELECT-DISTINCT-pairs form:
    COUNT(DISTINCT suppkey) is insensitive to duplicate (partkey,
    suppkey) observations, part is unique on p_partkey so the dim join
    commutes with pair dedup, and the suppkey anti-join commutes with
    both; group keys are unique per output row so the ORDER BY is a
    deterministic total order either way."""
    pk = part.where(
        (F.col("p_brand") != excl_brand)
        & (F.col("p_type") != excl_type)
        & (F.col("p_size").isin(*sizes))
    )
    excl = supplier.where(F.col("s_acctbal") < balance_floor).select(
        F.col("s_suppkey").alias("x_suppkey")
    )
    pairs = lineitem.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    return (
        pairs.join(
            F.broadcast(excl),
            F.col("ps_suppkey") == F.col("x_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(pk), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


def sql_parts_supplier_relationship(
    excl_brand: str = "Brand#3",
    excl_type: str = "STANDARD",
    sizes: tuple = (1, 4, 9, 16, 25, 36, 49),
    balance_floor: float = 1000.0,
) -> str:
    size_list = ", ".join(str(s) for s in sizes)
    return f"""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM (
            SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
            FROM lineitem
        ) partsupp, part
        WHERE p_partkey = ps_partkey
          AND p_brand <> '{excl_brand}'
          AND p_type <> '{excl_type}'
          AND p_size IN ({size_list})
          AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < {balance_floor}
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """


WEEK_US = 7 * 24 * 3600 * 1_000_000


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention over event time: users grouped by the epoch week
    of their FIRST event; for each (cohort_week, week_offset), how many
    of the cohort were active that week and the retention rate. Weeks
    are fixed 7-day epoch buckets of the integer ``ts_us`` — calendar
    months would hang the bucketing on session-timezone wall clocks
    (the round-4 event-time lesson); epoch weeks keep every comparison
    integer and engine-identical.

    Scale: first-week and active-weeks both aggregate on user_id — ONE
    shuffle each over (user, week)-grained data (map-side combined);
    the cohort join is user-keyed between two user-grained aggregates
    (NOT broadcast-hinted — the first-week view is user-dimension sized,
    which can be billions of rows at corpus scale; AQE broadcasts it
    when it is actually small); the |weeks|-row size view does
    broadcast. The final (cohort, offset) aggregate is tiny.

    Output: (cohort_week, week_offset, cohort_size, active_users,
    retention) sorted."""
    wk = (F.col("ts_us") / WEEK_US).cast("long")
    first = events.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = events.select("user_id", wk.alias("week")).distinct()
    cohort_sizes = first.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    j = active.join(first, "user_id")
    return (
        j.groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("long").alias(
                "week_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            "active_users",
            (
                F.col("active_users").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def sql_cohort_retention() -> str:
    wk = f"CAST(epoch_us(ts) // {WEEK_US} AS BIGINT)"
    return f"""
        WITH first AS (
            SELECT user_id, MIN({wk}) AS cohort_week
            FROM events GROUP BY user_id
        ),
        active AS (
            SELECT DISTINCT user_id, {wk} AS week FROM events
        ),
        sizes AS (
            SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
            FROM first GROUP BY cohort_week
        ),
        ret AS (
            SELECT f.cohort_week,
                   CAST(a.week - f.cohort_week AS BIGINT) AS week_offset,
                   CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
            FROM active a JOIN first f USING (user_id)
            GROUP BY f.cohort_week, week_offset
        )
        SELECT r.cohort_week, r.week_offset, s.cohort_size, r.active_users,
               CAST(r.active_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
                   AS retention
        FROM ret r JOIN sizes s USING (cohort_week)
        ORDER BY cohort_week, week_offset
    """


FUNNEL_STEPS = ("signup", "view", "purchase")


def ordered_funnel(
    events: DataFrame, steps: "tuple[str, ...]" = FUNNEL_STEPS
) -> DataFrame:
    """N-step ordered funnel: for each step k, how many users performed
    steps 1..k IN ORDER (greedy earliest-match over the (ts_us,
    event_id) total order — greedy subsequence matching reaches the
    maximum stage, so this equals the chained earliest-qualifying-event
    formulation the SQL twin uses).

    The per-user pass is ONE aggregation: events collect into a sorted
    (ts_us, event_id, type) array per user and a single fold walks it,
    advancing the stage whenever the next event matches steps[stage].
    One shuffle on user_id total, no joins, no window — vs the textbook
    n-fold self-join. A user's event array must fit a task (the
    sessionize-scale caveat: a mega-user is a product problem first);
    the reverse-cumulative step counts ride a ≤n-row window.

    Output: (step, step_name, users) — users reaching step k or beyond."""
    arr = F.sort_array(
        F.collect_list(F.struct("ts_us", "event_id", "event_type"))
    )
    step_lits = F.array(*[F.lit(s) for s in steps])
    stage = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, e: F.when(
            (acc < len(steps))
            & (e["event_type"] == F.element_at(step_lits, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    per_user = events.groupBy("user_id").agg(stage.alias("stage"))
    counts = per_user.groupBy("stage").agg(F.count("*").alias("n"))
    steps_df = local_rows_df(
        events.sparkSession,
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, step_name string",
    )
    # users reaching step k = Σ counts over stages >= k: a |steps|×
    # |stages| theta-join of two tiny aggregates (NOT a sparse
    # reverse-cumsum — a stage nobody stopped at would have no row and
    # silently zero the earlier steps)
    return (
        F.broadcast(steps_df)
        .join(counts, F.col("stage") >= F.col("step"), "left")
        .groupBy("step", "step_name")
        .agg(F.sum(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("users"))
        .orderBy("step")
    )


def sql_ordered_funnel(steps: "tuple[str, ...]" = FUNNEL_STEPS) -> str:
    """Chained earliest-qualifying-event CTEs with strict (ts_us,
    event_id) tuple ordering — equivalent to the Spark side's greedy
    fold (greedy earliest matching is optimal for subsequence
    inclusion)."""
    ctes = [
        f"""s1 AS (
            SELECT user_id, MIN(ROW(epoch_us(ts), event_id)) AS pos
            FROM events WHERE event_type = '{steps[0]}'
            GROUP BY user_id
        )"""
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"""s{i + 1} AS (
            SELECT e.user_id, MIN(ROW(epoch_us(e.ts), e.event_id)) AS pos
            FROM events e JOIN s{i} USING (user_id)
            WHERE e.event_type = '{steps[i]}'
              AND ROW(epoch_us(e.ts), e.event_id) > s{i}.pos
            GROUP BY e.user_id
        )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, '{s}' AS step_name,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM s{i + 1}) AS users"
        for i, s in enumerate(steps)
    )
    return f"""
        WITH {', '.join(ctes)}
        SELECT CAST(step AS INTEGER) AS step, step_name, users
        FROM ({selects})
        ORDER BY step
    """


def ewma_by_user(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Exponentially-weighted moving average of event values per user —
    the standard smoothing for per-entity metric streams. EWMA is a
    RECURSION (acc = α·x + (1−α)·acc), which window frames cannot
    express; like :func:`ordered_funnel` it becomes ONE fold over the
    per-user sorted (ts_us, event_id, value) array — a single shuffle
    on user_id, no self-joins, no windows.

    Cross-engine exactness: the fold is the identical IEEE sequence on
    both engines (lit(alpha) parses to the same double; each step is
    two multiplies and an add in array order), so the final EWMA
    hash-matches without rounding.

    Output: (user_id, n_events, last_value, ewma)."""
    arr = F.sort_array(
        F.collect_list(F.struct("ts_us", "event_id", "value"))
    )
    a = F.lit(float(alpha))
    ew = F.aggregate(
        arr,
        F.lit(None).cast("double"),
        lambda acc, e: F.when(acc.isNull(), e["value"]).otherwise(
            a * e["value"] + (F.lit(1.0) - a) * acc
        ),
    )
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.element_at(arr, -1)["value"].alias("last_value"),
            ew.alias("ewma"),
        )
        .orderBy("user_id")
    )


def sql_ewma_by_user(alpha: float = 0.3) -> str:
    """list_reduce twin: same init-on-first-element fold (DuckDB's
    list_reduce seeds acc with the first element, which equals the
    Spark side's null-init → first-value branch)."""
    return f"""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               (list(value ORDER BY epoch_us(ts), event_id))[-1] AS last_value,
               list_reduce(
                   list(value ORDER BY epoch_us(ts), event_id),
                   (acc, x) -> {float(alpha)} * x + (1.0 - {float(alpha)}) * acc
               ) AS ewma
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """


def event_rate_anomalies(
    events: DataFrame,
    z_thresh: float = 3.0,
    baseline_hours: int = 24,
    min_baseline: int = 12,
) -> DataFrame:
    """Rolling z-score anomaly detection on per-type hourly event rates
    — the monitoring query every ingest pipeline runs over its event
    stream. For each (event_type, hour) bucket, the observed count is
    scored against the mean/stddev of the PRECEDING ``baseline_hours``
    observed buckets (ROWS frame — gaps with zero events do not produce
    buckets and are excluded from the baseline by construction; a
    time-range frame would instead need a densified calendar spine,
    which at 100 TB is an unnecessary generate+join).

    Cross-engine exactness without decimal games: the baseline is
    carried as INTEGER window sums (count, Σx, Σx²) which are exact and
    order-independent; mean/variance/z are then derived with an
    identical double expression tree on both engines, and z is reported
    ROUND(9) (the same last-ulp practice as similarity_topk_fast).
    ``z`` is NULL (and the row non-anomalous) when the baseline has
    fewer than ``min_baseline`` buckets or zero variance.

    Plan: one hash aggregate (map-side combine) + one window over the
    tiny (type × hour) grid — the expensive pass touches each event
    exactly once.

    Output: (event_type, bucket, cnt, n_base, z, is_anomaly)."""
    hour_us = 3_600_000_000
    counts = (
        events.select("event_type", F.expr(f"ts_us div {hour_us}").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return anomalies_from_counts(counts, z_thresh, baseline_hours, min_baseline)


def anomalies_from_counts(
    counts: DataFrame,
    z_thresh: float = 3.0,
    baseline_hours: int = 24,
    min_baseline: int = 12,
) -> DataFrame:
    """The z-score derivation of :func:`event_rate_anomalies` over an
    already-bucketed (event_type, bucket, cnt) frame — shared by the
    batch operator and the streaming counts-store monitor
    (streaming/monitor.py), so both report identical verdicts from
    identical counts."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-baseline_hours, -1)
    )
    stats = counts.select(
        "event_type",
        "bucket",
        "cnt",
        F.count("cnt").over(w).alias("n_base"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
    )
    n = F.col("n_base").cast("double")
    mu = F.col("s").cast("double") / n
    var = (
        F.col("ss").cast("double") - F.col("s").cast("double") * mu
    ) / (n - F.lit(1.0))
    z = (F.col("cnt").cast("double") - mu) / F.sqrt(var)
    ok = (F.col("n_base") >= min_baseline) & (var > 0)
    zc = F.when(ok, F.round(z, 9))
    return stats.select(
        "event_type",
        "bucket",
        "cnt",
        "n_base",
        zc.alias("z"),
        (zc.isNotNull() & (F.abs(zc) > F.lit(float(z_thresh)))).alias(
            "is_anomaly"
        ),
    )


def sql_event_rate_anomalies(
    z_thresh: float = 3.0,
    baseline_hours: int = 24,
    min_baseline: int = 12,
) -> str:
    """DuckDB twin of :func:`event_rate_anomalies`: identical integer
    window sums and the identical double derivation ((ss - s*mu)/(n-1),
    note mu is reused exactly as in the Spark expression tree)."""
    return f"""
        WITH counts AS (
            SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
                   COUNT(*) AS cnt
            FROM events GROUP BY event_type, bucket
        ),
        stats AS (
            SELECT event_type, bucket, cnt,
                   COUNT(cnt) OVER w AS n_base,
                   SUM(cnt) OVER w AS s,
                   SUM(cnt * cnt) OVER w AS ss
            FROM counts
            WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                         ROWS BETWEEN {baseline_hours} PRECEDING AND 1 PRECEDING)
        ),
        derived AS (
            SELECT event_type, bucket, cnt, n_base,
                   CASE WHEN n_base >= {min_baseline}
                         AND (CAST(ss AS DOUBLE)
                              - CAST(s AS DOUBLE)
                                * (CAST(s AS DOUBLE) / CAST(n_base AS DOUBLE)))
                             / (CAST(n_base AS DOUBLE) - 1.0) > 0
                        THEN ROUND(
                            (CAST(cnt AS DOUBLE)
                             - CAST(s AS DOUBLE) / CAST(n_base AS DOUBLE))
                            / SQRT((CAST(ss AS DOUBLE)
                                    - CAST(s AS DOUBLE)
                                      * (CAST(s AS DOUBLE) / CAST(n_base AS DOUBLE)))
                                   / (CAST(n_base AS DOUBLE) - 1.0)), 9)
                   END AS z
            FROM stats
        )
        SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
               CAST(cnt AS BIGINT) AS cnt, CAST(n_base AS BIGINT) AS n_base, z,
               (z IS NOT NULL AND ABS(z) > {float(z_thresh)}) AS is_anomaly
        FROM derived
    """
