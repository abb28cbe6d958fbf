"""Event time & watermarks (reference §1.4).

The reference attaches event time + a bounded-out-of-orderness
watermark via ``assignTimestampsAndWatermarks``
(Windows.scala:71-80, TimeBasedTransformations.scala:160-175). Spark's
``withWatermark(col, delay)`` expresses the same contract: "events more
than ``delay`` behind the max observed event time may be dropped" —
Spark derives the watermark from data (min across inputs, advanced per
micro-batch) rather than source-pushed, but the bounded-out-of-
orderness CONTRACT (TimeBasedTransformations.scala:213-233) is
identical, so tests target the contract, not the mechanism.

Semantics preserved from the reference: an event-time window agg on a
stream without a watermark is rejected in append mode (Windows.scala:
183-185's error analog); watermarks bound window/join state so the
engine can release results and evict state (the "window never fires
without watermark" lesson, TimeBasedTransformations.scala:313-350).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_event_time(
    df: DataFrame,
    ts_col: str,
    out_of_orderness: str = "500 milliseconds",
    *,
    from_epoch_ms: bool = False,
) -> DataFrame:
    """assignTimestampsAndWatermarks analog.

    ``out_of_orderness`` defaults to the reference's 500 ms bound
    (Windows.scala:71-73). ``from_epoch_ms`` converts a long epoch-ms
    column to a timestamp first (the SerializableTimestampAssigner
    case). No-op watermark on batch frames (event time is just data).
    """
    out = df
    if from_epoch_ms:
        out = out.withColumn(ts_col, F.timestamp_millis(F.col(ts_col).cast("long")))
    if out.isStreaming:
        out = out.withWatermark(ts_col, out_of_orderness)
    return out
