"""Shared conventions for oracle-checked queries.

The driver compares Spark output against DuckDB by row count, schema
and order-insensitive value hash. Parity rules used throughout the
catalog:

- timestamps → epoch-ms BIGINT (``F.unix_millis`` / ``epoch_ms``):
  engine-neutral, timezone-proof.
- money/double aggregates → exact accumulation, cast to DOUBLE at the
  end: float-addition order differs between engines, so never hash a
  raw double SUM. Two exact strategies, both bit-identical across
  engines:
  (a) integer CENTS (``cents``/``SQL_CENTS``): round the exact
      2-decimal input to int64 hundredths, do pure long arithmetic,
      SUM as int64, convert the one exact sum to double, divide once
      by the scale. This stays on the 64-bit whole-stage-codegen fast
      path (~2.3x faster than decimal at sf0.1) — use it on the FACT
      (lineitem-scale) hot paths. Overflow bound: int64 holds per-group
      partial sums up to ~2e7 rows for the widest product (price·200·200
      ≈ 4e11/row); past that use (b).
  (b) DECIMAL accumulation (``dec``/``dsum``): arbitrary scale, heavier
      codegen — dimension tables and anything that might overflow (a).
  CRITICAL for (b): cast the INPUT COLUMNS (exact 2-decimal values) to
  decimal BEFORE any arithmetic — casting a computed double to decimal
  rounds differently across engines (Spark goes through the double's
  shortest string representation, BigDecimal.valueOf; DuckDB rounds
  the binary value), producing last-cent mismatches.
- every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str) -> Column:
    """Exact-accumulation cast for monetary doubles (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def dsum(col: Column | str, alias: str) -> Column:
    """SUM over decimal, surfaced as double (see module doc)."""
    return F.sum(dec(col)).cast("double").alias(alias)


def ms(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c)


SQL_DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_dsum(expr: str, alias: str) -> str:
    return SQL_DSUM.format(expr=expr) + f" AS {alias}"


def cents(col: Column | str) -> Column:
    """Exact 2-decimal double → int64 hundredths (Spark side).

    round() never sees an exact .5 here — the inputs are 2-decimal
    values whose double representation is within 1e-9 of an integer
    after *100 — so Spark HALF_UP vs DuckDB half-away never diverge.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def sql_cents(expr: str) -> str:
    """DuckDB mirror of :func:`cents`."""
    return f"CAST(round({expr} * 100) AS BIGINT)"
