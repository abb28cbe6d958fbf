from flink_essentials_spark.functions import (  # noqa: F401
    approx,
    dedup,
    multimodal,
    similarity,
    text,
)
