"""Round-7 operators: TPC-H Q9/Q12/Q16 shapes and the two training-prep
fan-outs (context-window chunking, fractional-epoch upsampling).

Model-based checks mirror the style of test_text_dedup.py: a tiny pure
Python replica computes the expected answer on constructed rows, so the
semantics are pinned independently of the DuckDB oracle (which the
parametrized parity test already exercises on the real tables).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import text as T
from spark_indexedrdd_spark.operators import analytics as A
from spark_indexedrdd_spark.plans import explain as X


# --------------------------------------------------------------------- #
# chunk_documents
# --------------------------------------------------------------------- #

def _chunks_model(text, max_tokens, stride):
    toks = [t for t in text.lower().strip().split() if t]
    n = len(toks)
    out = []
    starts = range(1, max(n, 1) + 1, stride)
    for s in starts:
        sl = toks[s - 1 : s - 1 + max_tokens]
        out.append(
            (
                (s - 1) // stride,
                s,
                " ".join(sl),
                max(min(max_tokens, n - s + 1), 0),
            )
        )
    return out


@pytest.mark.parametrize(
    "text,max_tokens,stride",
    [
        ("", 4, 3),                        # empty doc -> one empty chunk
        ("a", 4, 3),                       # single token
        ("a b c d", 4, 3),                 # exactly one window
        ("a b c d e", 4, 3),               # overlap + short tail
        ("  a   b\tc  ", 4, 2),            # whitespace normalization
        (" ".join(f"t{i}" for i in range(23)), 8, 5),
    ],
)
def test_chunk_documents_matches_model(spark, text, max_tokens, stride):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    got = [
        (r.chunk_id, r.chunk_start, r.chunk_text, r.n_tokens)
        for r in T.chunk_documents(
            df, max_tokens=max_tokens, stride=stride
        ).orderBy("chunk_start").collect()
    ]
    assert got == _chunks_model(text, max_tokens, stride)


def test_chunk_documents_never_drops_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunked = T.chunk_documents(docs)
    assert (
        chunked.select("doc_id").distinct().count()
        == docs.select("doc_id").distinct().count()
    )


def test_chunk_documents_no_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert X.count_live_shuffles(T.chunk_documents(docs)) == 0


def test_chunk_documents_covers_every_token(spark, sf_dir):
    """With stride <= max_tokens each token index of every doc appears
    in at least one chunk: sum of per-chunk coverage of NEW positions
    (stride for inner chunks) reconstructs the token count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    chunked = T.chunk_documents(docs, max_tokens=32, stride=24)
    per_doc = (
        chunked.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_start") + F.col("n_tokens") - 1).alias("covered"),
        )
        .collect()
    )
    ntoks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(T.tokens(F.col("text"))).alias("n")
        ).collect()
    }
    for r in per_doc:
        assert r.covered == max(ntoks[r.doc_id], 0) or ntoks[r.doc_id] == 0


# --------------------------------------------------------------------- #
# epoch_upsample
# --------------------------------------------------------------------- #

def test_epoch_upsample_copy_counts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    epochs = {"src0": 3.0, "src1": 0.5, "src2": 0.0}
    out = T.epoch_upsample(docs, epochs, default_epochs=1.0)
    per_source = {
        r.source: (r.copies, r.docs)
        for r in out.groupBy("source")
        .agg(
            F.count("*").alias("copies"),
            F.countDistinct("doc_id").alias("docs"),
        )
        .collect()
    }
    n = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # integral epochs: exactly e copies of every doc
    assert per_source["src0"] == (3 * n["src0"], n["src0"])
    # e = 0 drops the source entirely
    assert "src2" not in per_source
    # fractional 0.5: each kept doc appears exactly once, subset of docs
    copies, docs_kept = per_source["src1"]
    assert copies == docs_kept and 0 <= docs_kept <= n["src1"]
    # untouched sources default to one copy each
    assert per_source["src3"] == (n["src3"], n["src3"])


def test_epoch_upsample_deterministic_and_copy_ids_dense(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    epochs = {"src0": 2.5}
    a = T.epoch_upsample(docs, epochs).orderBy("doc_id", "copy_id").collect()
    b = T.epoch_upsample(docs, epochs).orderBy("doc_id", "copy_id").collect()
    assert a == b
    # copy_id is dense 0..k-1 per doc
    seen = {}
    for r in a:
        seen.setdefault(r.doc_id, []).append(r.copy_id)
    for ids in seen.values():
        assert ids == list(range(len(ids)))


def test_epoch_upsample_no_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert X.count_live_shuffles(T.epoch_upsample(docs, {"src0": 2.0})) == 0


# --------------------------------------------------------------------- #
# TPC-H Q9 / Q12 / Q16 shapes
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def tpch(spark, sf_dir):
    return {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in ["lineitem", "part", "supplier", "nation", "orders"]
    }


def test_q9_profit_decomposes(spark, tpch):
    """sum_profit == revenue - cost, recomputed independently per
    (nation, year) through a direct aggregation."""
    out = A.product_type_profit(
        tpch["lineitem"], tpch["part"], tpch["supplier"],
        tpch["nation"], tpch["orders"],
    ).collect()
    assert len(out) > 0
    # amounts are sums of grid-decimal terms: re-summing the per-row
    # profit with plain float on the driver agrees to 1e-6
    rows = (
        tpch["lineitem"]
        .join(
            tpch["part"].where(F.col("p_name").contains("widget")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(tpch["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(tpch["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(tpch["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.year("o_orderdate").alias("y"),
                "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount", "l_quantity")
        .collect()
    )
    min_price = {}
    for r in rows:
        k = (r.l_partkey, r.l_suppkey)
        min_price[k] = min(min_price.get(k, float("inf")), r.l_extendedprice)
    expect = {}
    for r in rows:
        cost = min_price[(r.l_partkey, r.l_suppkey)] * 0.02
        amt = r.l_extendedprice * (1 - r.l_discount) - cost * r.l_quantity
        expect[(r.n_name, r.y)] = expect.get((r.n_name, r.y), 0.0) + amt
    got = {(r.nation, r.o_year): r.sum_profit for r in out}
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == pytest.approx(expect[k], abs=1e-6), k


def test_q9_plan_broadcasts_dims_single_fact_shuffle(spark, tpch):
    df = A.product_type_profit(
        tpch["lineitem"], tpch["part"], tpch["supplier"],
        tpch["nation"], tpch["orders"],
    )
    plan = X.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_q12_counts_partition_totals(spark, tpch):
    out = {
        r.category: (r.high_line_count, r.low_line_count)
        for r in A.shipmode_priority_dist(
            tpch["lineitem"], tpch["orders"]
        ).collect()
    }
    total = (
        tpch["lineitem"]
        .where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(tpch["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .count()
    )
    assert sum(h + lo for h, lo in out.values()) == total
    assert all(h >= 0 and lo >= 0 for h, lo in out.values())


def test_q16_excludes_low_balance_suppliers(spark, tpch):
    out = A.parts_supplier_relationship(
        tpch["lineitem"], tpch["part"], tpch["supplier"],
        balance_floor=10_000.0,   # every supplier excluded -> empty
    )
    assert out.count() == 0
    some = A.parts_supplier_relationship(
        tpch["lineitem"], tpch["part"], tpch["supplier"],
        balance_floor=0.0,        # nobody excluded
    )
    assert some.count() > 0
    # supplier_cnt bounded by total supplier population
    n_supp = tpch["supplier"].count()
    assert all(r.supplier_cnt <= n_supp for r in some.collect())


def test_q16_not_in_plans_as_anti_join_not_subquery(spark, tpch):
    df = A.parts_supplier_relationship(
        tpch["lineitem"], tpch["part"], tpch["supplier"]
    )
    plan = X.physical_plan(df)
    assert "LeftAnti" in plan or "left_anti" in plan.lower(), plan[:3000]
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


# --------------------------------------------------------------------- #
# cohort retention + ordered funnel (r7 event analytics)
# --------------------------------------------------------------------- #

def _ev(spark, rows):
    """rows: (event_id, ts_us, user_id, event_type) — build a frame in
    the loader's normalized shape."""
    return spark.createDataFrame(
        [(e, t, u, ty) for e, t, u, ty in rows],
        "event_id long, ts_us long, user_id long, event_type string",
    )


def test_ordered_funnel_order_matters(spark):
    H = 3_600_000_000
    rows = [
        # user 1: full ordered funnel
        (1, 1 * H, 1, "signup"), (2, 2 * H, 1, "view"), (3, 3 * H, 1, "purchase"),
        # user 2: purchase BEFORE view -> stops at step 1... but a later
        # view would still advance; no later purchase -> stage 2
        (4, 1 * H, 2, "signup"), (5, 2 * H, 2, "purchase"), (6, 3 * H, 2, "view"),
        # user 3: never signs up -> stage 0 despite view+purchase
        (7, 1 * H, 3, "view"), (8, 2 * H, 3, "purchase"),
        # user 4: signup only
        (9, 5 * H, 4, "signup"),
        # user 5: full funnel with noise + repeats
        (10, 1 * H, 5, "click"), (11, 2 * H, 5, "signup"),
        (12, 3 * H, 5, "signup"), (13, 4 * H, 5, "view"),
        (14, 5 * H, 5, "error"), (15, 6 * H, 5, "purchase"),
    ]
    from spark_indexedrdd_spark.operators.analytics import ordered_funnel

    out = {r.step: r.users for r in ordered_funnel(_ev(spark, rows)).collect()}
    # reached step1: users 1,2,4,5 ; step2: 1,2,5 ; step3: 1,5
    assert out == {1: 4, 2: 3, 3: 2}


def test_ordered_funnel_same_timestamp_ties_break_by_event_id(spark):
    rows = [
        (1, 100, 1, "signup"), (2, 100, 1, "view"), (3, 100, 1, "purchase"),
        # reversed event ids at one instant: the array sorts to
        # (purchase, view, signup), so greedy matching finds signup
        # LAST and the user stops at stage 1
        (6, 100, 2, "signup"), (5, 100, 2, "view"), (4, 100, 2, "purchase"),
    ]
    from spark_indexedrdd_spark.operators.analytics import ordered_funnel

    out = {r.step: r.users for r in ordered_funnel(_ev(spark, rows)).collect()}
    assert out == {1: 2, 2: 1, 3: 1}


def test_cohort_retention_model(spark):
    from spark_indexedrdd_spark.operators.analytics import (
        WEEK_US,
        cohort_retention,
    )

    rows = [
        # cohort week 0: users 1, 2
        (1, 0 * WEEK_US + 5, 1, "view"),
        (2, 0 * WEEK_US + 9, 2, "view"),
        # user 1 active weeks 0,1,2 ; user 2 active weeks 0,2
        (3, 1 * WEEK_US + 5, 1, "click"),
        (4, 2 * WEEK_US + 5, 1, "view"),
        (5, 2 * WEEK_US + 7, 2, "view"),
        # cohort week 1: user 3, active weeks 1 and 3
        (6, 1 * WEEK_US + 1, 3, "view"),
        (7, 3 * WEEK_US + 1, 3, "view"),
    ]
    got = {
        (r.cohort_week, r.week_offset): (r.cohort_size, r.active_users, r.retention)
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (2, 1, 0.5),
        (0, 2): (2, 2, 1.0),
        (1, 0): (1, 1, 1.0),
        (1, 2): (1, 1, 1.0),
    }


def test_ewma_matches_python_model(spark):
    from spark_indexedrdd_spark.operators.analytics import ewma_by_user

    rows = [
        (1, 100, 1, "view"), (2, 200, 1, "view"), (3, 300, 1, "view"),
        (4, 100, 2, "view"),
    ]
    df = spark.createDataFrame(
        [(e, t, u, ty, float(10 * e)) for e, t, u, ty in rows],
        "event_id long, ts_us long, user_id long, event_type string, value double",
    )
    got = {r.user_id: (r.n_events, r.last_value, r.ewma)
           for r in ewma_by_user(df, alpha=0.5).collect()}

    def model(vals, a=0.5):
        acc = None
        for v in vals:
            acc = v if acc is None else a * v + (1 - a) * acc
        return acc

    assert got[1] == (3, 30.0, model([10.0, 20.0, 30.0]))
    assert got[2] == (1, 40.0, 40.0)  # single event: ewma == value
