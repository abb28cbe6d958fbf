from flink_essentials_spark.streaming.watermarks import with_event_time  # noqa: F401
