"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H-Q1-style pricing summary) on
                  sf0.001.
queries()       — every oracle-checked query in the engine's registry
                  (flink_essentials_spark.queries.catalog).
oracle_sql()    — the matching DuckDB SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_essentials_spark.queries.catalog import ALL_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return ALL_QUERIES["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in ALL_QUERIES.items() if q.oracle is not None
    }
