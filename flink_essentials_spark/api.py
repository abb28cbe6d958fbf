"""Fluent Stream API — the engine's public surface.

A thin, chainable veneer mirroring the reference's capability set
(DataStream → keyBy → window → agg → sink; BuiltIn.scala pipeline
shape) over documented DataFrame calls. Every method returns a new
``Stream`` wrapping a new immutable DataFrame — the lazy "job
blueprint" model (BuiltIn.scala:40-43) is Spark's own lazy plan.

>>> (Stream.from_parquet(spark, path)
...     .with_event_time("ts", "500 milliseconds")
...     .key_by("user_id")
...     .window(tumbling("ts", "3 seconds"))
...     .agg(F.count(F.lit(1)).alias("cnt"))
...     .df)
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_essentials_spark.operators import (
    aggregate,
    joins,
    partitioning,
    stateful,
    transform,
    windows,
)
from flink_essentials_spark.streaming.watermarks import with_event_time


class JobExecutionResult:
    """Synchronous job stats (BuiltIn.scala:306-319's
    ``execute("name").getNetRuntime`` introspection)."""

    def __init__(self, job_name: str, net_runtime_ms: int, num_rows: int):
        self.job_name = job_name
        self.net_runtime_ms = net_runtime_ms
        self.num_rows = num_rows

    def get_net_runtime(self) -> int:
        return self.net_runtime_ms

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"JobExecutionResult({self.job_name!r}, "
            f"net_runtime_ms={self.net_runtime_ms}, num_rows={self.num_rows})"
        )


class Stream:
    """Wraps a DataFrame (batch or streaming) plus key/window context."""

    def __init__(
        self,
        df: DataFrame,
        keys: tuple[str, ...] = (),
        window_col: Column | None = None,
    ):
        self.df = df
        self.keys = keys
        self._window = window_col

    # ---- sources -----------------------------------------------------
    @staticmethod
    def from_elements(spark: SparkSession, *elements: Any, column: str = "value") -> "Stream":
        from flink_essentials_spark.sources.batch import from_elements

        return Stream(from_elements(spark, *elements, column=column))

    @staticmethod
    def from_sequence(spark: SparkSession, start: int, end_inclusive: int) -> "Stream":
        from flink_essentials_spark.sources.batch import from_sequence

        return Stream(from_sequence(spark, start, end_inclusive))

    @staticmethod
    def from_collection(spark: SparkSession, rows: Iterable[tuple], schema) -> "Stream":
        from flink_essentials_spark.sources.batch import from_collection

        return Stream(from_collection(spark, rows, schema))

    @staticmethod
    def from_parquet(spark: SparkSession, path: str) -> "Stream":
        return Stream(spark.read.parquet(path))

    @staticmethod
    def from_csv(spark: SparkSession, path: str, schema=None, **options) -> "Stream":
        from flink_essentials_spark.sources.batch import read_csv

        return Stream(read_csv(spark, path, schema, **options))

    @staticmethod
    def from_json(spark: SparkSession, path: str, schema=None, **options) -> "Stream":
        from flink_essentials_spark.sources.batch import read_json

        return Stream(read_json(spark, path, schema, **options))

    @staticmethod
    def from_text(spark: SparkSession, path: str) -> "Stream":
        from flink_essentials_spark.sources.batch import read_text

        return Stream(read_text(spark, path))

    @staticmethod
    def from_socket(spark: SparkSession, host: str, port: int) -> "Stream":
        from flink_essentials_spark.sources.streaming import socket_lines

        return Stream(socket_lines(spark, host, port))

    @staticmethod
    def from_rate(spark: SparkSession, rows_per_second: int = 10) -> "Stream":
        from flink_essentials_spark.sources.streaming import rate_source

        return Stream(rate_source(spark, rows_per_second))

    @staticmethod
    def from_file_replay(spark: SparkSession, path: str, schema, files_per_trigger: int = 1) -> "Stream":
        from flink_essentials_spark.sources.streaming import file_replay

        return Stream(file_replay(spark, path, schema, files_per_trigger=files_per_trigger))

    # ---- element-wise (§2.3) -----------------------------------------
    def map(self, **named_exprs: Column) -> "Stream":
        return self._wrap(transform.map_columns(self.df, **named_exprs))

    def with_columns(self, **named_exprs: Column) -> "Stream":
        return self._wrap(transform.with_columns(self.df, **named_exprs))

    def flat_map(self, array_expr: Column, alias: str, *keep: str) -> "Stream":
        return self._wrap(transform.flat_map_array(self.df, array_expr, alias, *keep))

    def filter(self, predicate: Column) -> "Stream":
        return self._wrap(self.df.filter(predicate))

    def process(self, fn, output_schema, *, setup=None, teardown=None) -> "Stream":
        return self._wrap(
            transform.process_batches(self.df, fn, output_schema, setup=setup, teardown=teardown)
        )

    def select(self, *cols) -> "Stream":
        return self._wrap(self.df.select(*cols))

    # ---- event time (§1.4) -------------------------------------------
    def with_event_time(self, ts_col: str, out_of_orderness: str = "500 milliseconds") -> "Stream":
        return self._wrap(with_event_time(self.df, ts_col, out_of_orderness))

    # ---- keying / windows (§2.4, §2.5) ---------------------------------
    def key_by(self, *keys: str) -> "Stream":
        return Stream(self.df, keys=keys, window_col=self._window)

    def window(self, window_col: Column) -> "Stream":
        """Pass windows.tumbling/sliding/session(...)."""
        return Stream(self.df, keys=self.keys, window_col=window_col)

    def agg(self, *aggs: Column) -> "Stream":
        if self._window is not None:
            return Stream(windows.window_agg(self.df, self._window, list(self.keys), *aggs))
        return Stream(self.df.groupBy(*self.keys).agg(*aggs))

    def count(self, predicate: Column | None = None) -> "Stream":
        if self._window is not None:
            return Stream(
                windows.windowed_count(self.df, self._window, list(self.keys), predicate)
            )
        agg = (F.count(F.lit(1)) if predicate is None else F.count_if(predicate)).alias("cnt")
        return Stream(self.df.groupBy(*self.keys).agg(agg))

    def reduce(self, *aggs: Column) -> "Stream":
        """Rolling reduce (§2.4 A2) — in streaming use update output mode."""
        return self.agg(*aggs)

    # ---- stateful (§2.9) ----------------------------------------------
    def process_with_state(
        self,
        processor: stateful.KeyedProcessor,
        output_schema,
        *,
        timeout: str = "none",
        order_by: str | None = None,
        event_time_col: str | None = None,
        output_mode: str = "append",
    ) -> "Stream":
        return Stream(
            stateful.keyed_process(
                self.df, list(self.keys), processor, output_schema,
                timeout=timeout, order_by=order_by,
                event_time_col=event_time_col, output_mode=output_mode,
            )
        )

    # ---- multi-stream (§2.7) -------------------------------------------
    def union(self, *others: "Stream") -> "Stream":
        return Stream(joins.union_streams(self.df, *[o.df for o in others]))

    def window_join(self, other: "Stream", left_key: str, right_key: str,
                    left_ts: str, right_ts: str, window_size: str) -> "Stream":
        return Stream(
            joins.window_join(self.df, other.df, left_key, right_key, left_ts, right_ts, window_size)
        )

    def interval_join(self, other: "Stream", left_key: str, right_key: str,
                      left_ts: str, right_ts: str,
                      lower: str = "2 seconds", upper: str = "2 seconds",
                      **kwargs) -> "Stream":
        return Stream(
            joins.interval_join(self.df, other.df, left_key, right_key,
                                left_ts, right_ts, lower, upper, **kwargs)
        )

    def as_of_join(self, other: "Stream", left_key: str, right_key: str,
                   left_ts: str, right_ts: str, payload_cols: list[str],
                   **kwargs) -> "Stream":
        return Stream(
            joins.as_of_join(self.df, other.df, left_key, right_key,
                             left_ts, right_ts, payload_cols, **kwargs)
        )

    def connect(self, other: "Stream", **kwargs) -> "Stream":
        return Stream(joins.connect(self.df, other.df, **kwargs))

    def side_outputs(self, tags: dict, **kwargs) -> dict:
        """Route one pass to N named Streams (first matching tag wins;
        unmatched rows land on the 'main' output)."""
        outs = transform.side_outputs(self.df, tags, **kwargs)
        return {name: self._wrap(df) for name, df in outs.items()}

    # ---- partitioning (§2.8) --------------------------------------------
    def partition_by(self, *keys: str, num_partitions: int | None = None) -> "Stream":
        return self._wrap(partitioning.partition_by_key(self.df, *keys, num_partitions=num_partitions))

    def partition_custom(self, route: Column, num_partitions: int) -> "Stream":
        return self._wrap(
            partitioning.partition_custom(self.df, route, num_partitions)
        )

    def shuffle(self, num_partitions: int) -> "Stream":
        return self._wrap(partitioning.shuffle_random(self.df, num_partitions))

    # ---- sinks (§2.2) ----------------------------------------------------
    def to_console(self, **kwargs):
        from flink_essentials_spark.sinks.sinks import to_console

        return to_console(self.df, **kwargs)

    def to_memory(self, name: str, **kwargs):
        from flink_essentials_spark.sinks.sinks import to_memory

        return to_memory(self.df, name, **kwargs)

    def run_to_memory(self, spark: SparkSession, name: str, **kwargs) -> DataFrame:
        from flink_essentials_spark.sinks.sinks import run_to_memory

        return run_to_memory(spark, self.df, name, **kwargs)

    def to_files(self, path: str, **kwargs):
        from flink_essentials_spark.sinks.sinks import to_files

        return to_files(self.df, path, **kwargs)

    def collect(self):
        """executeAndCollect analog (BuiltIn.scala:320-324), batch only."""
        return self.df.collect()

    def execute(self, job_name: str = "job") -> JobExecutionResult:
        """Synchronous ``execute()`` (BuiltIn.scala:306-319): run the
        plan to completion and return job stats — no data comes back to
        the driver (count only), matching Flink's sink-driven execute;
        use ``collect()`` for executeAndCollect semantics."""
        import time as _time

        t0 = _time.monotonic()
        n = self.df.count()
        return JobExecutionResult(
            job_name, int((_time.monotonic() - t0) * 1000), n
        )

    # ---- internals -------------------------------------------------------
    def _wrap(self, df: DataFrame) -> "Stream":
        return Stream(df, keys=self.keys, window_col=self._window)

    def explain(self, mode: str = "formatted"):
        return self.df.explain(mode)
