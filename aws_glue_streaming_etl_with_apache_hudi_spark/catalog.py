"""Persistent catalog sync — the Hive/Glue sync stage, Spark-native.

The reference registers its Hudi table and every partition in the Glue
metastore after each commit so OTHER engines (Athena, another Spark app)
see the data (glue_job_script.py:64-73; database/table defined in
cloudformation-template/Glue_StreamingJob_Hudi_Template.yaml:38-54).

Spark analogue: an EXTERNAL (path-based, unmanaged) ``USING parquet``
table in the session catalog, partition columns declared with their true
types, partitions registered per commit. Unlike a temp view this lives in
the shared external catalog: every session of the application
(``spark.newSession()``) resolves it, and when the session is built with a
persistent Hive metastore (``get_spark(warehouse_dir=...)``) it survives
JVM restarts — a brand-new SparkSession pointed at the same warehouse sees
the table, its partitions, and the latest commit, which is exactly the
reference's hive-sync contract.

Scale notes: per-commit partition registration is INCREMENTAL — the upsert
passes the partitions the commit touched and only those get ``ALTER TABLE
ADD PARTITION`` calls (Hudi's sync tool does the same; a full ``MSCK
REPAIR`` per commit would list the entire table, O(partitions) — at 100 TB
that's millions of directories). Full recovery runs only when the table is
(re)created or the schema evolved.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import SparkSession
from pyspark.sql import types as T

HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"

def _hive_unescape(s: str) -> str:
    """Decode Hive partition-path %XX escapes (space, ':', '/', '#', …).

    ``SHOW PARTITIONS`` prints the PATH spelling of a partition spec, in
    which Hive escapes special characters as %XX (the URL quoting
    scheme — stdlib ``unquote`` decodes it). Comparing that spelling
    against raw ``str(value)`` never matches for such values — the sync
    would then DROP the escaped spelling (a no-op) every commit and never
    deregister a genuinely emptied special-char partition. Because '/'
    itself is escaped (%2F), splitting the spec on '/' BEFORE unescaping
    is unambiguous."""
    from urllib.parse import unquote

    return unquote(s)


def _q(name: str) -> str:
    return ".".join(f"`{part}`" for part in name.split("."))


def _sql_literal(v) -> str:
    """Escape a partition/location value for a Spark SQL string literal.

    Partition values are data-derived — a value containing a quote or
    backslash must not be able to break out of the literal (ADVICE r2:
    unescaped interpolation made ALTER TABLE malformed/injectable)."""
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _ddl_fields(schema: T.StructType, partition_by: list[str]) -> list[T.StructField]:
    """Column order for CREATE TABLE: data columns first, partition columns
    last (Hive layout contract)."""
    by_name = {f.name: f for f in schema.fields}
    data = [f for f in schema.fields if f.name not in partition_by]
    return data + [by_name[c] for c in partition_by if c in by_name]


def _schema_matches(spark: SparkSession, name: str, want: list[T.StructField]) -> bool:
    """Normalized schema compare: names + simpleString types (nullability
    and field metadata ignored — a nullability flip must not trigger a
    DROP+CREATE+O(all partitions) recovery). Only a genuinely absent
    table reads as a mismatch; other errors propagate."""
    try:
        cur = spark.table(name).schema.fields
    except AnalysisException:
        return False
    return [(f.name, f.dataType.simpleString()) for f in cur] == [
        (f.name, f.dataType.simpleString()) for f in want
    ]


def sync_external_table(
    spark: SparkSession,
    name: str,
    path: str,
    schema: T.StructType,
    partition_by: list[str],
    touched: list[tuple] | None = None,
) -> None:
    """Register/refresh ``name`` as an external parquet table over ``path``.

    ``touched`` — partition-value tuples this commit wrote (in
    ``partition_by`` order). When given and the table already exists with
    the right schema, only those partitions are registered (incremental
    sync). ``None`` -> full partition recovery.
    """
    # A leftover temp view would shadow the catalog table at resolution
    # time — the exact staleness this module exists to end.
    spark.catalog.dropTempView(name)
    fields = _ddl_fields(schema, partition_by)
    fresh = not _schema_matches(spark, name, fields)
    if fresh:
        # schema evolved / first sync / foreign table squatting on the name:
        # recreate. DROP on an external table never touches the data files.
        spark.sql(f"DROP TABLE IF EXISTS {_q(name)}")
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
        stmt = f"CREATE TABLE {_q(name)} ({cols}) USING parquet"
        if partition_by:
            stmt += " PARTITIONED BY (" + ", ".join(f"`{c}`" for c in partition_by) + ")"
        stmt += f" LOCATION {_sql_literal(path)}"
        spark.sql(stmt)
    if partition_by:
        if fresh or touched is None or any(None in t for t in touched):
            # ALTER ... ADD PARTITION can't spell a null partition value;
            # recovery handles __HIVE_DEFAULT_PARTITION__ directories.
            spark.catalog.recoverPartitions(name)
        else:
            for values in touched:
                parts = ", ".join(
                    f"`{c}` = {_sql_literal(v)}"
                    for c, v in zip(partition_by, values)
                )
                spark.sql(
                    f"ALTER TABLE {_q(name)} ADD IF NOT EXISTS PARTITION ({parts})"
                )
    # a commit replaced files in place: drop any cached file listing
    spark.sql(f"REFRESH TABLE {_q(name)}")


def sync_external_table_locations(
    spark: SparkSession,
    name: str,
    base_location: str,
    schema: T.StructType,
    partition_by: list[str],
    partition_locations: dict[tuple, str],
) -> None:
    """Register a table whose partitions live at SCATTERED locations —
    the timeline-table layout, where each partition's current files sit
    under the snapshot directory of the commit that last rewrote it
    (file-group reuse). This is exactly how Hudi's hive-sync registers a
    COW table: the catalog partition's LOCATION points at the latest
    file slice, and a new commit flips only the touched partitions'
    locations (``ALTER ... SET LOCATION``), so other engines always read
    the latest committed snapshot without knowing the timeline exists.

    ``partition_locations`` is the COMPLETE current partition->directory
    map (tuples in ``partition_by`` order; the owner map is O(metadata)
    to produce — never a data scan): registered partitions absent from
    it are dropped (emptied by deletes). Tuples containing None cannot
    be spelled in partition DDL and must be handled by the caller
    (temp-view fallback)."""
    if not partition_by:
        raise ValueError("use sync_external_table for unpartitioned tables")
    spark.catalog.dropTempView(name)
    fields = _ddl_fields(schema, partition_by)
    if not _schema_matches(spark, name, fields):
        spark.sql(f"DROP TABLE IF EXISTS {_q(name)}")
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
        stmt = (
            f"CREATE TABLE {_q(name)} ({cols}) USING parquet"
            + " PARTITIONED BY ("
            + ", ".join(f"`{c}`" for c in partition_by)
            + f") LOCATION {_sql_literal(base_location)}"
        )
        spark.sql(stmt)
    registered = {
        tuple(
            _hive_unescape(kv.split("=", 1)[1]) for kv in r["partition"].split("/")
        )
        for r in spark.sql(f"SHOW PARTITIONS {_q(name)}").collect()
    }
    for values, loc in partition_locations.items():
        if any(v is None for v in values):
            raise ValueError(f"null partition value in {values}: DDL cannot spell it")
        parts = ", ".join(
            f"`{c}` = {_sql_literal(v)}" for c, v in zip(partition_by, values)
        )
        spark.sql(
            f"ALTER TABLE {_q(name)} ADD IF NOT EXISTS PARTITION ({parts}) "
            f"LOCATION {_sql_literal(loc)}"
        )
        # flip the location if the partition pre-existed under an older
        # commit's directory (ADD IF NOT EXISTS leaves it untouched)
        spark.sql(
            f"ALTER TABLE {_q(name)} PARTITION ({parts}) "
            f"SET LOCATION {_sql_literal(loc)}"
        )
    # de-register partitions that no longer exist (emptied by deletes)
    current = {tuple(str(v) for v in vals) for vals in partition_locations}
    for got in registered:
        if got not in current:
            parts = ", ".join(
                f"`{c}` = {_sql_literal(v)}" for c, v in zip(partition_by, got)
            )
            spark.sql(f"ALTER TABLE {_q(name)} DROP IF EXISTS PARTITION ({parts})")
    spark.sql(f"REFRESH TABLE {_q(name)}")


def drop_partition_from_catalog(
    spark: SparkSession, name: str, partition_by: list[str], values: tuple
) -> None:
    """De-register one partition after DELETE_PARTITION / emptied-partition
    cleanup. Null values fall back to full recovery (SQL can't name them)."""
    if not spark.catalog.tableExists(name):
        return
    if any(v is None for v in values):
        spark.catalog.recoverPartitions(name)
        return
    parts = ", ".join(
        f"`{c}` = {_sql_literal(v)}" for c, v in zip(partition_by, values)
    )
    spark.sql(f"ALTER TABLE {_q(name)} DROP IF EXISTS PARTITION ({parts})")
    spark.sql(f"REFRESH TABLE {_q(name)}")
