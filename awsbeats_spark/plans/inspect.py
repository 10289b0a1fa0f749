"""Physical-plan assertions: the tooling behind "is this the plan you'd
want at 100 TB?".

Wraps `df.explain()` output (and the executed plan after AQE) so tests
can assert scan pruning, filter pushdown, join strategy and codegen
coverage instead of eyeballing explain dumps. Used by
tests/test_plans.py; also handy interactively:

    from awsbeats_spark.plans import plan_counts
    plan_counts(df)  # {'exchanges': 1, 'broadcast_joins': 2, ...}
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final physical plan string (runs AQE planning, not the job)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True when the parquet scan carries PushedFilters mentioning every
    given column fragment (predicate reached the reader)."""
    plan = formatted_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = " ".join(m)
    return all(f in pushed for f in fragments)


def read_schema_columns(df: DataFrame, table_hint: str | None = None) -> list[list[str]]:
    """Columns each parquet scan reads (ReadSchema) — the column-pruning
    check: a 2-column projection must not scan 11 columns."""
    plan = formatted_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return [
        [c.split(":")[0].strip() for c in s.split(",") if c.strip()] for s in schemas
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def plan_counts(df: DataFrame) -> dict[str, int]:
    plan = executed_plan(df)
    return {
        "exchanges": len(re.findall(r"\bExchange hashpartitioning", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        # codegen spans print as `*(n)` node prefixes in the plan string
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "reused_exchanges": plan.count("ReusedExchange"),
    }
