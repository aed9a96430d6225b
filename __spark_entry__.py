"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference pipeline's core product:
latest-state upsert view of the event stream) at sf0.001.
``queries()`` / ``oracle_sql()`` — the full declared surface
(aws_glue_streaming_etl_with_apache_hudi_spark/queries/): every operator from SURVEY.md §2 with its
DuckDB oracle SQL where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["upsert_latest_state"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted -> rows-only check)."""
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
