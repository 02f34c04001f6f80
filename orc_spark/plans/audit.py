"""Executed-plan inspection: the programmatic form of `.explain`.

Usage pattern (also in tests/test_plan_audit.py):

    from orc_spark import plans
    df.write.format("noop").mode("overwrite").save()   # execute
    counts = plans.operator_counts(df)
    plans.assert_no(df, "CartesianProduct", "SortMergeJoin")
    assert "n_tok__MAX" in " ".join(plans.pushed_filters(df))

All helpers read the EXECUTED plan (post-AQE), so what they report is
what actually ran — the planner's promises don't count at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# physical operators worth counting when judging a plan's scale shape
DEFAULT_OPERATORS = (
    "CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastHashJoin", "Exchange",
    "ReusedExchange", "Window", "HashAggregate", "ObjectHashAggregate",
    "Sort", "MapInArrow", "MapInPandas", "ArrowEvalPython",
    "BatchEvalPython",
)


def executed_plan(df: DataFrame) -> str:
    """The executed (post-AQE) physical plan as text.  Run an action
    on ``df`` first if you need the final adaptively-replanned shape."""
    return df._jdf.queryExecution().executedPlan().toString()


def operator_counts(df: DataFrame,
                    operators=DEFAULT_OPERATORS) -> dict[str, int]:
    """Occurrences of each physical operator in the executed plan."""
    plan = executed_plan(df)
    return {op: len(re.findall(re.escape(op), plan)) for op in operators}


def assert_no(df: DataFrame, *operators: str) -> None:
    """Raise AssertionError if any named operator appears in the
    executed plan (e.g. assert_no(df, "CartesianProduct"))."""
    counts = operator_counts(df, operators)
    bad = {op: n for op, n in counts.items() if n}
    assert not bad, f"forbidden operators in executed plan: {bad}"


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters clause of every scan in the executed plan
    (empty list = nothing reached the data source)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """Every ReadSchema clause — what each scan actually reads; the
    projection-pruning check (a 2-column decode whose scan lists every
    stream column is a bug)."""
    return re.findall(r"ReadSchema: ([^\n]*)", executed_plan(df))
