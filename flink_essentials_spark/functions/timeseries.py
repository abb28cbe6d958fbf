"""Time-series monitoring operators.

EWMA control chart (Roberts 1959, "Control Chart Tests Based on
Geometric Moving Averages"; Hunter 1986): the streaming-friendly
anomaly detector every ingest pipeline runs on its volume/value
telemetry. The reference repo's windowed aggregations (SURVEY §2 W1-W6)
cover tumbling statistics; this adds the exponentially-weighted member
whose state is one number per key.

Scale notes: everything happens inside ONE keyed window exchange — the
lag terms, the per-key moments (unbounded frame over the same
partitioning), and the flag predicate are all computed per-row with no
second scan and no join. The EWMA is TRUNCATED at ``depth`` lags with
lambda = 1/2, which makes the weighted sum exact integer arithmetic
(values in cents x powers of two), so the DuckDB oracle reproduces the
flags bit-for-bit with no rounding: numerator and denominator are
integers, one division each for the smoothed value and the sigma, and
both engines then compare identical doubles (the media_features
exact-arithmetic contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma_control(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    depth: int = 16,
    threshold: float = 2.5,
) -> DataFrame:
    """Flag rows whose integer ``value_col`` deviates from the
    truncated EWMA of the key's PRIOR values by more than
    ``threshold`` x the key's standard deviation.

    ``value_col`` must already be integer-valued (use
    ``util.cents``); ``order_cols`` must be a deterministic total
    order within each key (e.g. ``[ts_ms, event_id]``).

    EWMA weights are lambda=1/2 over the last ``depth`` observations:
    ewma_t = sum_{i=1..m} x_{t-i} 2^{-i} / sum_{i=1..m} 2^{-i} with
    m = min(t-1, depth) — numerator and denominator scaled by
    2^depth are exact BIGINTs. Rows with no prior observation are
    never flagged (the chart has no baseline yet).

    Returns the flagged rows: key, order columns, value, the EWMA
    baseline, and the z-score vs the key's sigma.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    wk = Window.partitionBy(key_col)
    v = F.col(value_col)

    num = None
    den = None
    for i in range(1, depth + 1):
        weight = 1 << (depth - i)
        lag = F.lag(v, i).over(w)
        term = F.coalesce(lag, F.lit(0)) * F.lit(weight)
        hit = F.when(lag.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = hit if den is None else den + hit

    n = F.count(F.lit(1)).over(wk)
    sm = F.sum(v).over(wk)
    ss = F.sum(v * v).over(wk)
    staged = df.select(
        key_col,
        *order_cols,
        v.alias("value_c"),
        num.alias("__num"),
        den.alias("__den"),
        n.alias("__n"),
        sm.alias("__sm"),
        ss.alias("__ss"),
    )
    # sigma = sqrt(n*ss - sm^2) / n: the radicand is one exact BIGINT,
    # so sqrt sees the identical double on every engine.
    sigma = (
        F.sqrt((F.col("__n") * F.col("__ss") - F.col("__sm") * F.col("__sm")).cast("double"))
        / F.col("__n")
    )
    ewma = F.col("__num").cast("double") / F.col("__den")
    return (
        staged.filter(F.col("__den") > 0)
        .filter(
            F.abs(F.col("value_c") - ewma) > F.lit(threshold) * sigma
        )
        .select(
            key_col,
            *order_cols,
            "value_c",
            ewma.alias("ewma"),
            ((F.col("value_c") - ewma) / sigma).alias("z"),
        )
    )
