from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.pipeline import (
    StreamingUpsertPipeline,
    run_stream_to_completion,
)

__all__ = ["StreamingUpsertPipeline", "run_stream_to_completion"]
