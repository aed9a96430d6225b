"""The engine's declared query surface (SURVEY.md §2 Part B).

Every entry is a named, deterministic query over the fixture tables
(TESTDATA.md), exposed through ``__spark_entry__.py`` to the driver:

- ``QUERIES[name].fn(spark, sf_dir) -> DataFrame``  — the Spark plan.
- ``QUERIES[name].sql``                              — the ANSI-SQL oracle
  DuckDB runs on the same parquet (None for non-SQL-expressible ops; the
  driver then records a weaker rows-only check).
- ``QUERIES[name].headline``                         — included in bench.py.

Determinism contract (FIXTURES.md): every query imposes a total order,
rounds floats to a fixed precision, and aliases every computed column
identically in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import QUERIES, Query, register
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import relational  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import relational2  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import relational3  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import tpch_more  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import tpch_more2  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import pipeline  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import storage  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import timelineq  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import northstar  # noqa: F401
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import training  # noqa: F401

__all__ = ["QUERIES", "Query", "register"]
