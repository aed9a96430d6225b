"""Vector math over ``array<float>`` columns — pure column expressions.

All JVM-side (``zip_with`` / ``aggregate`` higher-order functions): no
Python in the hot path, whole-stage-codegen-friendly, and the expressions
work identically in batch and streaming plans. Used by similarity search
and embedding near-dedup over the ``embeddings`` fixture
(FIXTURES.md §C — ``embedding array<float>``, dim 64).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def dot_product_sql(a: str, b: str) -> str:
    """Spark-SQL text rendering of ``dot_product`` (same parsed tree).

    SQL-text construction costs ONE parser roundtrip where the Column-API
    lambda plumbing costs ~15 py4j gateway roundtrips per call — the ANN
    operators build these expressions on every plan construction, so the
    driver-side build time is material (guide §1: at small scale the wall
    is job count and plan work, and plan-build scales with call count at
    any scale)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def l2_norm_sql(a: str) -> str:
    """Spark-SQL text rendering of ``l2_norm`` (same parsed tree)."""
    return f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))"


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (|a||b|). NULL-safe on zero vectors (returns NULL
    rather than dividing by zero), matching DuckDB's
    ``list_cosine_similarity`` oracle behavior on non-degenerate input."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)
