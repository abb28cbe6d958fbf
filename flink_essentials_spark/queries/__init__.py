from flink_essentials_spark.queries.catalog import ALL_QUERIES, Query  # noqa: F401
