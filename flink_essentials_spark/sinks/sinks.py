"""Sinks (reference §2.2).

- text/CSV files (K1/K2) → DataFrame writers; single-file = coalesce(1)
  (the reference's sink-parallelism-1 behavior, BuiltIn.scala:116-123)
- StreamingFileSink + rolling policy (K3) → file sink + checkpoint;
  rolling = one file per micro-batch partition; exactly-once via the
  sink manifest + checkpoint (the guarantee BuiltIn.scala:69-71 asks for)
- print (K5) → console sink; executeAndCollect (K6) → memory sink
- addSink(fn) (K4) → foreachBatch
"""

from __future__ import annotations

import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def to_console(sdf: DataFrame, *, output_mode: str = "append", **options):
    return (
        sdf.writeStream.outputMode(output_mode).format("console").options(**options).start()
    )


def to_memory(sdf: DataFrame, name: str, *, output_mode: str = "append"):
    """executeAndCollect analog: results land in table ``name``."""
    return (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )


def run_to_memory(
    spark: SparkSession, sdf: DataFrame, name: str, *, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming frame to completion synchronously (bounded
    sources / file replay) and return the materialized result table."""
    q = to_memory(sdf, name, output_mode=output_mode)
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def to_files(
    sdf: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    checkpoint: str | None = None,
    output_mode: str = "append",
    **options,
):
    """Fault-tolerant rolling file sink (K3)."""
    ckpt = checkpoint or tempfile.mkdtemp(prefix="fes_ckpt_")
    return (
        sdf.writeStream.outputMode(output_mode)
        .format(fmt)
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .options(**options)
        .start()
    )


def for_each_batch(sdf: DataFrame, fn: Callable[[DataFrame, int], None], *, checkpoint: str | None = None):
    """addSink(fn) analog (K4) with exactly-once batch ids."""
    writer = sdf.writeStream.foreachBatch(fn)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def write_text(df: DataFrame, path: str, *, single_file: bool = False, mode: str = "overwrite"):
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).text(path)


def write_csv(df: DataFrame, path: str, *, single_file: bool = False, mode: str = "overwrite", **options):
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).options(**options).csv(path)
