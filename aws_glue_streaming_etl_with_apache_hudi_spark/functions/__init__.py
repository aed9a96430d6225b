from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import (
    stable_hash64,
)

__all__ = ["cosine_similarity", "dot_product", "l2_norm", "stable_hash64"]
