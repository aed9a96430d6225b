"""Fixture preconditions the relational3 oracle equivalences rest on.

These are cheap DuckDB-only checks (no Spark session) that fail loudly
if a future fixture regeneration silently breaks an oracle-equivalence
assumption a query documents.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_url_parse_fixture_is_url_safe(sf_dir):
    """url_parse_profile (queries/relational3.py) builds URLs from
    documents.source and documents.lang and compares Spark's parse_url
    (java.net.URI — NULL host on '_' or space) against a string-algebra
    oracle that would still build a host. The equivalence therefore
    requires both columns to be URL-safe; pin that here."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT DISTINCT source, lang FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    assert rows, "empty documents fixture"
    pat = re.compile(r"^[A-Za-z0-9-]+$")
    bad = [(s, l) for s, l in rows if not (pat.match(s or "") and pat.match(l or ""))]
    assert not bad, (
        "documents.source/lang contain URL-unsafe characters; "
        f"url_parse_profile's oracle equivalence breaks: {bad[:5]}"
    )
