"""Every registered oracle must return >= 1 row at sf0.01 — a 0-row
result makes the driver's value-hash check vacuous (a query that
filtered EVERYTHING would be indistinguishable from a correct one).

Round-9 regression for the two vacuous rows VERDICT r8 found:
``sql_named_parameters`` bound ``:start_ts = 2024-06-01`` against a
1995–2001 fixture, and ``subquery_scalar``'s ``> 2 * avg`` threshold
selected nothing at every SF. Both now return non-trivial mass; this
test pins the whole registry so the class cannot reappear.

Runs the ORACLE SQL in DuckDB only (no Spark session): the Spark leg
is pinned equal to the oracle by tests/test_queries_oracle.py, so a
non-empty oracle implies a non-empty Spark result. The whole 264-query
sweep is a few seconds.
"""

from __future__ import annotations

import pytest

# part of the pre-commit registry gate: pytest -m registry_gate
pytestmark = pytest.mark.registry_gate

from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_utils import duckdb_connection

#: Queries whose CORRECT answer at sf0.01 is legitimately empty. Adding a
#: name here must be a deliberate decision with a justification comment.
EMPTY_OK: dict[str, str] = {}

ORACLED = sorted(name for name, q in QUERIES.items() if q.sql is not None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_nonvacuous_at_sf001(con, name):
    if name in EMPTY_OK:
        pytest.skip(f"whitelisted empty: {EMPTY_OK[name]}")
    n = con.execute(f"SELECT count(*) FROM ({QUERIES[name].sql})").fetchone()[0]
    assert n >= 1, (
        f"{name}: oracle returns 0 rows at sf0.01 — the driver hash check "
        "cannot fail; rebind parameters/thresholds into the data range"
    )
