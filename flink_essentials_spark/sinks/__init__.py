from flink_essentials_spark.sinks.sinks import (  # noqa: F401
    run_to_memory,
    to_console,
    to_files,
    to_memory,
)
