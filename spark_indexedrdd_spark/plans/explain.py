"""Physical-plan inspection helpers.

The reference hand-implements its physical optimizations (zero-shuffle
co-partitioned zips, IndexedRDD.scala:185-198; targeted point jobs,
:79-94). In the rebuild those properties come from Catalyst — these
helpers let tests ASSERT they actually hold rather than hoping:

- ``count_exchanges``: shuffle boundaries in the final plan.
- ``has_broadcast_join`` / ``has_sorted_merge_join``: join strategy.
- ``pushed_filters`` / ``read_schema``: what reached the parquet scan.
- ``wholestage_codegen_spans``: how much of the plan is fused codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Plan AFTER execution — includes AQE's final re-planned form
    (AQE can turn a sort-merge join into a broadcast join at runtime,
    so assertions about joins must look here)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*(").lstrip())


def final_plan_section(plan: str) -> str:
    """The lines of an executed AQE plan that describe RUNTIME work:

    - stops at the top-level '== Initial Plan ==' marker (the pre-AQE
      plan, never executed);
    - prunes every InMemoryRelation subtree (the cached relation prints
      its historical build plan — including the build-time exchange —
      which is not work done by THIS query).
    """
    out: list[str] = []
    skip_indent: int | None = None
    for line in plan.splitlines():
        ind = _indent(line)
        if skip_indent is not None:
            if ind > skip_indent or not line.strip():
                continue
            skip_indent = None
        if "== Initial Plan ==" in line:
            break
        if "InMemoryRelation" in line:
            skip_indent = ind
            continue
        out.append(line)
    return "\n".join(out)


def count_live_shuffles(df: DataFrame) -> int:
    """Shuffles that actually executed for THIS query: walks the executed
    physical plan via the JVM, counting shuffle stages/exchanges while

    - not descending into InMemoryTableScan (a cached relation prints its
      historical build plan — not work done by this query), and
    - not counting broadcast stages (the good kind of exchange).

    Executes the DataFrame so AQE's final plan is available."""
    df.collect()
    root = df._jdf.queryExecution().executedPlan()

    def walk(node) -> int:
        cls = node.getClass().getSimpleName()
        if cls.startswith("InMemoryTableScan"):
            return 0
        if cls.startswith("ShuffleQueryStage") or cls.startswith("ShuffleExchange"):
            return 1
        if cls.startswith("BroadcastQueryStage") or cls.startswith("BroadcastExchange"):
            return 0
        if cls == "AdaptiveSparkPlanExec":
            return walk(node.executedPlan())
        if cls.endswith("QueryStageExec"):
            return walk(node.plan())
        total = 0
        it = node.children().iterator()
        while it.hasNext():
            total += walk(it.next())
        return total

    return walk(root)


def count_exchanges(plan: str) -> int:
    """Shuffle boundaries in a non-AQE plan string."""
    return len(
        re.findall(
            r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_sort_merge_join(plan: str) -> bool:
    return "SortMergeJoin" in plan


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node (simple physical plan)."""
    plan = df._jdf.queryExecution().toString()
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return ", ".join(m)


def read_schema(df: DataFrame) -> str:
    plan = df._jdf.queryExecution().toString()
    m = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return "; ".join(m)


def wholestage_codegen_spans(plan: str) -> int:
    """Distinct codegen stages in a plan string — handles both the tree
    form ('WholeStageCodegen (3)') and the simple form ('*(3) HashAgg…')."""
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    ids |= set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)


def plan_report(df: DataFrame, execute: bool = False) -> dict:
    """One-call plan health check — the numbers a scale review asks for:

    shuffles, broadcasts, join strategies, what reached the parquet scan
    (pushed filters + pruned columns), and codegen coverage. With
    ``execute=True`` the shuffle count is the AQE-final executed number
    (runs the query); otherwise everything is static.

    Intended use: ``assert plan_report(q)["broadcast_joins"] >= 1`` in
    tests, or print it while iterating on an operator."""
    plan = df._jdf.queryExecution().toString()
    # AQE's pre-execution plan carries no codegen markers; the dedicated
    # codegen explain mode reports the subtree count directly
    cg = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
    report = {
        "exchanges_static": count_exchanges(plan),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", plan)),
        "nested_loop_joins": len(re.findall(r"NestedLoopJoin", plan)),
        "pushed_filters": pushed_filters(df),
        "read_schema": read_schema(df),
        "codegen_spans": int(m.group(1)) if m else wholestage_codegen_spans(plan),
        "python_stages": len(
            re.findall(r"(?:ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)
        ),
    }
    if execute:
        report["live_shuffles"] = count_live_shuffles(df)
        # AQE compiles codegen per query stage at runtime — the executed
        # plan is the only place the real span count exists
        report["codegen_spans"] = wholestage_codegen_spans(
            df._jdf.queryExecution().executedPlan().toString()
        )
    return report
