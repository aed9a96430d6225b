from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import (
    FIXTURE_TABLES,
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_parquet,
    register_views,
    stream_from_directory,
)

__all__ = [
    "FIXTURE_TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "register_views",
    "stream_from_directory",
]
