from flink_essentials_spark.sources import batch, streaming  # noqa: F401
