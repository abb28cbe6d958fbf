"""Approximate aggregates for interactive analytics at scale.

``approx_count_distinct`` (HyperLogLog++) and ``percentile_approx``
(KLL-ish sketch) are Spark built-ins — mergeable sketches, one shuffle,
bounded memory regardless of cardinality. Engine-specific sketch bits
differ across engines, so DuckDB oracles use the EXACT counterparts;
the approx forms are exposed for bench/production use and their error
bound is unit-tested instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cardinality_stats(df: DataFrame, *cols: str, rsd: float = 0.05) -> DataFrame:
    return df.agg(
        *[F.approx_count_distinct(c, rsd).alias(f"approx_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"exact_{c}") for c in cols],
    )


def quantiles(df: DataFrame, col: str, probs: list[float], accuracy: int = 10000) -> DataFrame:
    return df.agg(
        F.percentile_approx(col, probs, accuracy).alias("quantiles"),
        F.min(col).alias("min_v"),
        F.max(col).alias("max_v"),
    )
