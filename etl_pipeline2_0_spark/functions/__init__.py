from etl_pipeline2_0_spark.functions import (
    dedup,
    mixing,
    multimodal,
    similarity,
    text,
)

__all__ = ["text", "dedup", "similarity", "multimodal", "mixing"]
