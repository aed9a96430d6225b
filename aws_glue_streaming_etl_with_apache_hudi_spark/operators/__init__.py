from aws_glue_streaming_etl_with_apache_hudi_spark.operators.schema_evolution import (
    conform,
    evolve_schema,
    unify_schemas,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import (
    UpsertTable,
    precombine_latest,
    upsert_dataframe,
)

__all__ = [
    "UpsertTable",
    "conform",
    "evolve_schema",
    "precombine_latest",
    "unify_schemas",
    "upsert_dataframe",
]
