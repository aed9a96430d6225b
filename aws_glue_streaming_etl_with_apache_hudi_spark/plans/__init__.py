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
        info: dict = {"_cls": cls, "_ancestors": ancestors, "_node": node}
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


def _collect_alias_map(nodes: list[dict]) -> dict:
    """exprId.id -> defining JVM expression, from every Project /
    Aggregate / Window named-expression list in the plan (exprIds are
    plan-globally unique, so one flat map is safe)."""
    alias_map: dict = {}
    getters = {
        "Project": "projectList",
        "Aggregate": "aggregateExpressions",
        "Window": "windowExpressions",
    }
    for n in nodes:
        getter = getters.get(n["_cls"])
        if getter is None:
            continue
        seq = getattr(n["_node"], getter)()
        for i in range(seq.size()):
            ne = seq.apply(i)
            if ne.getClass().getSimpleName() == "Alias":
                alias_map[ne.exprId().id()] = ne.child()
    return alias_map


def _bounded_cardinality(expr, alias_map: dict, depth: int = 0) -> bool:
    """True when ``expr``'s value domain is FIXED regardless of data
    volume — the partition keys that make a "partitioned" window a
    single-task funnel in disguise. Detected classes: literals, boolean-
    typed expressions (2 values + null), ``x % <literal>`` / ``pmod(x,
    <literal>)`` (domain = the literal), casts of those, and attributes
    whose defining Alias (traced through Project/Aggregate lists)
    resolves to one of those."""
    if depth > 8:
        return False
    cls = expr.getClass().getSimpleName()
    if cls == "Literal":
        return True
    if expr.dataType().simpleString() == "boolean":
        return True
    if cls in ("Remainder", "Pmod"):
        right = expr.children().apply(1)
        return right.getClass().getSimpleName() == "Literal"
    if cls == "Cast":
        return _bounded_cardinality(expr.children().apply(0), alias_map, depth + 1)
    if cls == "AttributeReference":
        target = alias_map.get(expr.exprId().id())
        if target is not None:
            return _bounded_cardinality(target, alias_map, depth + 1)
    return False


def bounded_partition_windows(df: DataFrame) -> list[str]:
    """Window nodes whose partition spec consists ENTIRELY of bounded-
    cardinality expressions (see _bounded_cardinality) — at scale these
    behave like the partition-LESS windows global_window_nodes flags:
    the row count per partition grows with the data while the partition
    count stays fixed, so a handful of tasks own the whole table.
    Returns one human-readable line per offender."""
    nodes = _logical_tree(df)
    alias_map = _collect_alias_map(nodes)
    hits = []
    for n in nodes:
        if n["_cls"] != "Window" or not n.get("partitionSpec"):
            continue
        spec = n["_node"].partitionSpec()
        exprs = [spec.apply(i) for i in range(spec.size())]
        if exprs and all(_bounded_cardinality(e, alias_map) for e in exprs):
            keys = ", ".join(e.sql() for e in exprs)
            hits.append(
                f"bounded-cardinality Window partition [{keys}] under "
                f"{'/'.join(n['_ancestors']) or '<root>'}"
            )
    return hits


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
