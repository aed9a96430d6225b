"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same fixtures, canonicalize, and compare
row counts + column names + values (order-insensitive, columns sorted by
name — the driver's documented compare)."""

from __future__ import annotations

import math

import duckdb

from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import FIXTURE_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: fixed precision
        return f"{v:.6f}"
    if isinstance(v, int):
        return str(v)
    # timestamps/dates/strings -> str
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, stringify cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


#: pandas dtype "kind" normalization: unsigned ints hash like signed ones.
_KIND_ALIASES = {"u": "i"}


def _pandas_kinds(pdf) -> dict[str, str]:
    return {c: _KIND_ALIASES.get(pdf[c].dtype.kind, pdf[c].dtype.kind) for c in pdf.columns}


def _kind_mismatches(s_pdf, d_pdf) -> list[str]:
    """Columns whose pandas dtype KIND differs between Spark and DuckDB.

    The external driver hashes results through a pandas round-trip, where
    physical encoding leaks into the hash even when values are equal:
    DuckDB HUGEINT (an uncast integer ``sum()``) lands as float64 while
    Spark's bigint lands as int64, so 189 hashes as "189.0" vs "189"
    (this is exactly how q12_ship_priority failed r3 with provably equal
    values). Comparing dtype *kinds* ('i' int, 'f' float, 'O' object,
    'b' bool, 'M' datetime) catches that class locally. Columns holding
    NULLs are skipped: pandas null-promotes int->float asymmetrically
    across versions, which is noise the driver's hasher shares on both
    sides of a same-valued column anyway.
    """
    sk, dk = _pandas_kinds(s_pdf), _pandas_kinds(d_pdf)
    bad = []
    for c in s_pdf.columns:
        if c not in dk or sk[c] == dk[c]:
            continue
        if s_pdf[c].isna().any() or d_pdf[c].isna().any():
            continue  # null-promotion noise, not an encoding divergence
        bad.append(f"{c}: spark kind '{sk[c]}' vs duckdb kind '{dk[c]}'")
    return bad


def compare_query(spark, sf_dir: str, fn, sql: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_pdf = sdf.toPandas()
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        d_pdf = con.execute(sql).df()
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    kind_bad = _kind_mismatches(s_pdf, d_pdf)
    if kind_bad:
        return False, (
            "dtype-kind divergence (driver hashes these differently even when "
            f"values match): {kind_bad}"
        )
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs, cd = canonical_rows(s_cols, s_rows), canonical_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
