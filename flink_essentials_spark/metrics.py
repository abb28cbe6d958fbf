"""Pipeline observability — the reference's metrics-system analog
(Flink exposes counters/gauges per operator; Metrics in the tutorials
appear through the web UI). Spark's native mechanism is
``Dataset.observe``: named aggregate metrics evaluated DURING the job
(no extra pass, no extra scan), surfaced through ``Observation`` in
batch and ``StreamingQueryProgress.observedMetrics`` in streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metrics to a BATCH frame: returns (df, observation);
    run any action on the returned frame, then read ``observation.get``
    — a dict of metric name → value computed inside the same job.

    Example::

        df2, obs = observed(df, n_rows=F.count(F.lit(1)),
                            null_keys=F.sum(F.col("k").isNull().cast("long")))
        df2.write.parquet(path)
        assert obs.get["null_keys"] == 0   # data-quality gate, free
    """
    obs = Observation()
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs


def observed_stream(df: DataFrame, name: str, **metrics: Column) -> DataFrame:
    """Attach named metrics to a STREAMING frame under ``name``; every
    micro-batch's values arrive in
    ``query.lastProgress["observedMetrics"][name]`` (and the progress
    history) — per-batch data-quality counters without a second
    aggregation in the plan."""
    return df.observe(name, *[m.alias(k) for k, m in metrics.items()])
