"""Stable, engine-portable hashing.

MinHash/SimHash/fingerprint operators need hash functions that (a) run
JVM-side as column expressions and (b) can be reproduced bit-for-bit by the
DuckDB oracle. Spark's ``hash()``/``xxhash64()`` use engine-private seeds,
so instead we derive 60-bit integers from ``md5`` (identical in Spark and
DuckDB): ``conv(substr(md5(s), 1, 15), 16, 10)`` == DuckDB
``CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT)``.

15 hex chars = 60 bits — always fits in a signed BIGINT, no overflow
disagreement between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_hash64(col: Column | str, seed: int | str | None = None) -> Column:
    """Deterministic 60-bit hash of a string column, portable to DuckDB.

    ``seed`` concatenates a salt so independent hash functions can be
    derived: hash_seed(s) = stable_hash64(s, seed).
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}|"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def stable_hash64_sql(expr: str, seed: int | str | None = None) -> str:
    """The DuckDB-side rendering of ``stable_hash64`` for oracle SQL."""
    inner = f"concat('{seed}|', {expr})" if seed is not None else expr
    return f"CAST(concat('0x', substring(md5({inner}), 1, 15)) AS BIGINT)"
