"""SparkSession factory with scale-aware defaults.

The reference acquires a ``StreamExecutionEnvironment`` once and builds
lazy job blueprints on it (BuiltIn.scala:40-53). Our analog is a
``SparkSession`` configured for the execution model we target:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting)
- shuffle partitions sized to cores locally (cluster deployments
  override via ``spark.sql.shuffle.partitions``; AQE coalesces down)
- Arrow enabled for every pandas-interop path
- session timezone pinned to UTC so event-time semantics are
  deployment-independent (and DuckDB-oracle comparable)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "flink_essentials_spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local mode is a single JVM with N executor threads; on a real
    cluster only ``master`` and memory sizing change — every operator
    in this package expresses distribution via partitioning, so the
    same plans scale to 1000 executors.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs our operators rely on.

    Safe on a caller-provided session (e.g. the verification driver's):
    these are runtime SQL confs, settable after session creation.
    UTC matters for event-time window alignment and oracle comparison.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
