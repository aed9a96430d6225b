"""PySpark-native analytics engine with the capability surface of
``aws-samples/aws-glue-streaming-etl-with-apache-hudi``.

The reference (``/root/reference/glue-streaming-job-script/glue_job_script.py``)
is a streaming ETL pipeline: Kinesis JSON stream -> micro-batch
(``forEachBatch``) -> additive schema evolution -> Hudi COPY_ON_WRITE upsert
(record key + precombine + multi-level partition path) -> Hive/Glue catalog
sync, producing a SQL-queryable partitioned table.

This engine re-expresses that Spark-first:

- ``session``     : SparkSession factory (Kryo, AQE, Arrow, UTC — the
                    reference's confs at glue_job_script.py:19 plus scale
                    hardening).
- ``sources``     : batch + streaming readers over Parquet/JSON/CSV and the
                    test fixtures.
- ``operators``   : the engine core — keyed upsert with precombine
                    (glue_job_script.py:50-62), schema evolution
                    (glue_job_script.py:81-94, bugs fixed), plus the
                    LLM-data-pipeline surface: dedup (exact/minhash/simhash),
                    similarity search, text analysis, as-of joins, multimodal
                    column plumbing.
- ``streaming``   : Structured Streaming driver (readStream -> foreachBatch
                    upsert -> checkpoint), the A1/A2/A12 dataflow.
- ``functions``   : column-expression helpers (vector math, stable 64-bit
                    hashing) that stay JVM-side.
- ``plans``       : plan-inspection helpers (pushdown / broadcast asserts).

Everything is built on public PySpark APIs only; no Glue/Hudi runtime needed.
"""

from aws_glue_streaming_etl_with_apache_hudi_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
