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


def _logical_tree(df: DataFrame) -> list[dict]:
    """The optimized logical plan as pre-order nodes ({_cls, _ancestors,
    partitionSpec, global}), walked directly over py4j. NOT via
    ``toJSON()``: TreeNode JSON serialization hangs/explodes on plans
    containing higher-order-function lambdas (the distributed_rank
    bucket expression reproduces it), while a direct child walk is a
    bounded ~hundreds of py4j calls per plan."""
    root = df._jdf.queryExecution().optimizedPlan()
    out: list[dict] = []

    def walk(node, ancestors: tuple[str, ...]) -> None:
        cls = node.getClass().getSimpleName()
        info: dict = {"_cls": cls, "_ancestors": ancestors}
        if cls == "Window":
            info["partitionSpec"] = not node.partitionSpec().isEmpty()
        elif cls == "Sort":
            info["global"] = getattr(node, "global")()
        out.append(info)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), ancestors + (cls,))

    walk(root, ())
    return out


#: nodes that may sit ABOVE a presentation sort without invalidating it —
#: they reshape or truncate the already-computed result, nothing more.
_PRESENTATION = {"Project", "Sort", "GlobalLimit", "LocalLimit", "ReturnAnswer"}


def global_window_nodes(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec in the optimized plan —
    each funnels its whole input through one task at scale. Returns one
    human-readable line per offender."""
    hits = []
    for n in _logical_tree(df):
        if n["_cls"] == "Window" and not n.get("partitionSpec"):
            hits.append(f"global Window under {'/'.join(n['_ancestors']) or '<root>'}")
    return hits


def interior_global_sorts(df: DataFrame) -> list[str]:
    """Global Sort nodes that are NOT the final presentation sort (i.e.
    something other than project/limit consumes their output). A
    presentation sort orders the finished result; an interior global
    sort is a single-partition bottleneck in the dataflow."""
    hits = []
    for n in _logical_tree(df):
        if n["_cls"] == "Sort" and n.get("global"):
            anc = n["_ancestors"]
            if anc and anc[-1] == "LocalLimit":
                # GlobalLimit(LocalLimit(Sort)) — a logical top-k; the
                # physical plan is TakeOrderedAndProject (per-partition
                # top-k + driver merge), not a single-partition sort
                continue
            if not set(anc).issubset(_PRESENTATION):
                hits.append(f"global Sort under {'/'.join(anc)}")
    return hits
