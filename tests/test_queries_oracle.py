"""Every registered query with an oracle must match DuckDB at sf0.001 —
the local replica of the driver's t2 correctness gate (SURVEY.md §5.1).
Queries without SQL get a rows-run smoke check."""

from __future__ import annotations

import pytest

from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES
from tests.oracle_utils import compare_query

WITH_ORACLE = sorted(name for name, q in QUERIES.items() if q.sql is not None)
NO_ORACLE = sorted(name for name, q in QUERIES.items() if q.sql is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    q = QUERIES[name]
    ok, msg = compare_query(spark, sf_dir, q.fn, q.sql)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0  # runs, stable schema
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
