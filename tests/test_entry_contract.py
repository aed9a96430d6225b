"""Driver-contract guards that run fast (no full query execution):
every oracle query's column names must match between the Spark plan and
the DuckDB result description — the alias drift that breaks the driver's
hash compare is caught at plan-build time."""

from __future__ import annotations

import pytest

# part of the pre-commit registry gate: pytest -m registry_gate
pytestmark = pytest.mark.registry_gate

from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES
from tests.oracle_utils import duckdb_connection

# building some plans executes driver-side steps (kmeans training, the
# stateful stream); exclude them here — their outputs are covered by the
# executing tests
_PLAN_ONLY_EXCLUDED = {"stateful_running_totals", "knn_ivf"}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, q in QUERIES.items() if q.sql and n not in _PLAN_ONLY_EXCLUDED)
)
def test_column_names_match_oracle(spark, sf_dir, duck, name):
    q = QUERIES[name]
    spark_cols = sorted(q.fn(spark, sf_dir).columns)
    res = duck.execute(f"SELECT * FROM ({q.sql}) LIMIT 0")
    duck_cols = sorted(d[0] for d in res.description)
    assert spark_cols == duck_cols


def test_entry_module_contract():
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 80
    assert all(callable(f) for f in qs.values())
