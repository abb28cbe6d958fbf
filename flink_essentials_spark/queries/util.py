"""Shared conventions for oracle-checked queries.

The driver compares Spark output against DuckDB by row count, schema
and order-insensitive value hash. Parity rules used throughout the
catalog:

- timestamps → epoch-ms BIGINT (``F.unix_millis`` / ``epoch_ms``):
  engine-neutral, timezone-proof.
- money/double aggregates → exact DECIMAL accumulation, cast to DOUBLE
  at the end: float-addition order differs between engines, so never
  hash a raw double SUM. CRITICAL: cast the INPUT COLUMNS (exact
  2-decimal values) to decimal BEFORE any arithmetic — casting a
  computed double to decimal rounds differently across engines (Spark
  goes through the double's shortest string representation,
  BigDecimal.valueOf; DuckDB rounds the binary value), producing
  last-cent mismatches. Decimal-in, decimal-math, double-out is exact
  everywhere.
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
