"""Every registered query with an oracle must match DuckDB at sf0.001 —
the local replica of the driver's t2 correctness gate (SURVEY.md §5.1).
Queries without SQL get a rows-run smoke check."""

from __future__ import annotations

import pytest

# part of the pre-commit registry gate: pytest -m registry_gate
pytestmark = pytest.mark.registry_gate

from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES
from tests.oracle_utils import compare_query

WITH_ORACLE = sorted(name for name, q in QUERIES.items() if q.sql is not None)
NO_ORACLE = sorted(name for name, q in QUERIES.items() if q.sql is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    q = QUERIES[name]
    ok, msg = compare_query(spark, sf_dir, q.fn, q.sql)
    assert ok, f"{name}: {msg}"


def test_every_query_has_an_oracle():
    """Round 8 closed the last rows-only entry (approx_aggregates) —
    the whole registry is DuckDB-value-hash checkable. A new rows-only
    registration must be a deliberate decision, not a forgotten SQL."""
    assert NO_ORACLE == [], f"rows-only queries reappeared: {NO_ORACLE}"


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


def test_gate_catches_uncast_integer_sum(spark, sf_dir):
    """The local gate must flag DuckDB HUGEINT (uncast integer sum) even
    when values are identical — the q12_ship_priority r3 failure class."""
    from pyspark.sql import functions as F

    def probe(spark, sf_dir):
        return (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .groupBy("o_orderstatus")
            .agg(F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("n"))
            .orderBy("o_orderstatus")
        )

    # deliberately UNCAST sum() -> HUGEINT -> pandas float64
    bad_sql = """
        SELECT o_orderstatus,
               sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """
    ok, msg = compare_query(spark, sf_dir, probe, bad_sql)
    assert not ok and "dtype-kind" in msg, msg

    good_sql = bad_sql.replace("END) AS n", "END)::BIGINT AS n")
    ok, msg = compare_query(spark, sf_dir, probe, good_sql)
    assert ok, msg
