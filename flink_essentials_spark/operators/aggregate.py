"""Keyed aggregation: rolling (per-update) and batch.

Reference semantics: ``keyBy(...).reduce/sum`` emits the RUNNING value
on every incoming record (BuiltIn.scala:296-304,
SocketTextStreamWordCount.scala:62-63). Two Spark forms:

- streaming: ``groupBy(key).agg(...)`` in ``update`` output mode —
  per-micro-batch emission of changed totals (the engine-native analog;
  see streaming/wordcount in queries).
- batch "history" form: analytic window ``sum() over (partition by key
  order by ts rows unbounded preceding)`` — materializes the entire
  emission history a Flink rolling reduce would have produced, which is
  what golden tests can assert deterministically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keyed_agg(df: DataFrame, keys: Sequence[str | Column], *aggs: Column) -> DataFrame:
    """Batch keyed aggregation (final value per key)."""
    return df.groupBy(*keys).agg(*aggs)


def rolling_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    **rolling: Column,
) -> DataFrame:
    """Rolling per-key aggregates in event order (emission history).

    ``rolling`` maps output name → PLAIN aggregate expression (``.over``
    is attached here, so don't wrap the aggregate in casts — cast the
    output column afterwards). Each aggregate runs over rows from the
    key's first event to the current one. Requires a deterministic
    total order (pass a unique tiebreak column, e.g. an event id) —
    reference rolling reduce is arrival-order, which only a unique
    ordering makes reproducible (the reference itself leans on
    event-time determinism, TimeBasedTransformations.scala:180-209).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for name, expr in rolling.items():
        out = out.withColumn(name, expr.over(w))
    return out


def word_count(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """The canonical pipeline (SocketTextStreamWordCount.scala:56-67,
    Playground.scala:11-22): tokenize → group → count.

    Works identically on batch and streaming DataFrames (streaming:
    update/complete output mode gives the rolling-emission behavior).
    """
    from flink_essentials_spark.operators.transform import tokenize

    return (
        lines.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
