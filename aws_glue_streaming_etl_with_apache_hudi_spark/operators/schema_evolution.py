"""Additive schema evolution — the reference's ``evolveSchema`` fixed.

Reference behavior (glue_job_script.py:81-94): align an incoming batch with
the current table schema by ``unionByName(target_empty, allowMissingColumns=
True)`` — columns missing from the batch become nulls, brand-new columns are
kept. Documented latent bugs we do NOT replicate (SURVEY.md §1.2):

- equal schemas -> unbound ``merged_df`` -> ``NameError`` swallowed by a
  blanket ``except`` (accidentally correct). Here: equal schemas are an
  explicit no-op.
- first-run bootstrap (table absent) rode the same ``except``. Here: callers
  pass ``target=None`` (or ``UpsertTable`` handles creation explicitly).
- same-name columns with conflicting types would fail the union at runtime.
  Here: explicit widening rules (numeric promotion, anything-else ->
  string), applied to BOTH sides before the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Numeric widening lattice: promote to the wider numeric type.
_NUMERIC_ORDER = {
    T.ByteType(): 0,
    T.ShortType(): 1,
    T.IntegerType(): 2,
    T.LongType(): 3,
    T.FloatType(): 4,
    T.DoubleType(): 5,
}


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Resolve a type conflict between two columns of the same name."""
    if a == b:
        return a
    if a in _NUMERIC_ORDER and b in _NUMERIC_ORDER:
        return a if _NUMERIC_ORDER[a] >= _NUMERIC_ORDER[b] else b
    # timestamp/date promotion
    if {type(a), type(b)} == {T.DateType, T.TimestampType}:
        return T.TimestampType()
    # last resort: cast both to string (lossless textual representation)
    return T.StringType()


def unify_schemas(left: T.StructType, right: T.StructType) -> dict[str, T.DataType]:
    """Column-name -> resolved type for the union of two schemas.

    Column order: left's columns first (in order), then right-only columns —
    matching ``unionByName(allowMissingColumns=True)`` output order.
    """
    resolved: dict[str, T.DataType] = {f.name: f.dataType for f in left.fields}
    for f in right.fields:
        if f.name in resolved:
            resolved[f.name] = _widen(resolved[f.name], f.dataType)
        else:
            resolved[f.name] = f.dataType
    return resolved


def conform(df: DataFrame, resolved: dict[str, T.DataType]) -> DataFrame:
    """Project ``df`` onto the resolved schema: cast conflicting columns,
    add missing columns as typed nulls, keep resolved column order."""
    present = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for name, dtype in resolved.items():
        if name in present:
            col = F.col(name).cast(dtype) if present[name] != dtype else F.col(name)
        else:
            col = F.lit(None).cast(dtype)
        cols.append(col.alias(name))
    return df.select(*cols)


def evolve_schema(batch: DataFrame, target: DataFrame | None) -> tuple[DataFrame, DataFrame | None]:
    """Align ``batch`` and ``target`` to a common, widened schema.

    Returns the pair conformed to the unified schema; ``target=None``
    (first-run bootstrap, the reference's exception path at
    glue_job_script.py:92-94) returns the batch unchanged.
    Purely a metadata/projection operation — no shuffle, no action.
    """
    if target is None:
        return batch, None
    if batch.schema == target.schema:
        return batch, target
    resolved = unify_schemas(batch.schema, target.schema)
    return conform(batch, resolved), conform(target, resolved)
