from flink_essentials_spark.operators import (  # noqa: F401
    aggregate,
    joins,
    partitioning,
    stateful,
    transform,
    triggers,
    windows,
)
