"""Bounded sources (reference §2.1 S1/S2/S3/S7).

``fromElements`` / ``fromCollection`` → ``spark.createDataFrame``;
``fromSequence(a, b)`` → ``spark.range`` (a genuinely distributed
range source, split across executors); files → parquet/csv/text/json
readers with explicit schemas (no runtime inference in the engine
path, matching the reference's static typing — BuiltIn.scala:51-52).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def from_elements(
    spark: SparkSession, *elements: Any, column: str = "value"
) -> DataFrame:
    """env.fromElements(1,2,3,4) — BuiltIn.scala:53."""
    return spark.createDataFrame([(e,) for e in elements], [column])


def from_sequence(spark: SparkSession, start: int, end_inclusive: int) -> DataFrame:
    """env.fromSequence(1, N) — BuiltIn.scala:162. Column ``n``."""
    return spark.range(start, end_inclusive + 1).withColumnRenamed("id", "n")


def from_collection(
    spark: SparkSession, rows: Iterable[tuple], schema
) -> DataFrame:
    """env.fromCollection(events) — Windows.scala:68-69."""
    return spark.createDataFrame(list(rows), schema)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_json(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    """JSON-lines reader. Pass an explicit schema in engine paths —
    schema inference costs a full extra pass over the data at scale
    and infers looser types (everything nullable, ints→long ok but
    ambiguous strings stay strings)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC columnar source (built into Spark; the other columnar
    interchange format a lakehouse ingests). Same predicate-pushdown /
    column-pruning properties as the parquet path (plan-audited in
    tests/test_file_formats.py)."""
    return spark.read.options(**options).orc(path)
