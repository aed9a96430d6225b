"""Plan inspection helpers — make "is this the plan I'd want at 100 TB?"
checkable in tests.

Catalyst owns optimization (SURVEY.md §4: the reference delegates 100% of
planning to Catalyst/Tungsten); these helpers assert the properties we rely
on: filters pushed to the Parquet scan, column pruning, broadcast joins for
small dims, whole-stage codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text of ``df.explain(mode)`` (which only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the physical plan pushes a filter containing ``fragment``
    into the file scan (``PushedFilters: [...]``)."""
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def reads_only_columns(df: DataFrame, columns: set[str]) -> bool:
    """True if every scan's ReadSchema is a subset of ``columns``
    (column pruning reached the reader)."""
    plan = explain_str(df)
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        read = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        if not read.issubset(columns):
            return False
    return True


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees ("codegen" explain mode —
    the formatted mode hides them under AdaptiveSparkPlan)."""
    import re

    plan = explain_str(df, mode="codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0
