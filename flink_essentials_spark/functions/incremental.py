"""Incremental aggregate maintenance — the materialized-view refresh
loop: a stored rollup is combined with each new batch's PARTIAL
aggregates instead of recomputing over all history (the difference
between O(batch) and O(corpus) per refresh at 100 TB).

Only MERGEABLE aggregates participate (count/sum/min/max — the
re-aggregation of partials is exact); avg is derived at read time from
sum/count, and distinct-ish metrics go through the mergeable sketches
in functions.approx. Snapshots commit through sinks.versioned, so a
reader never sees a half-refreshed rollup and a bad batch rolls back
by pointer."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_essentials_spark.sinks import versioned

_MERGE = {
    "count": F.sum,  # partial counts re-aggregate by SUM
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def _partial(batch: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]):
    exprs = []
    for out, (kind, col) in aggs.items():
        if kind == "count":
            exprs.append(F.count(F.lit(1)).alias(out))
        elif kind == "sum":
            exprs.append(F.sum(col).alias(out))
        elif kind == "min":
            exprs.append(F.min(col).alias(out))
        elif kind == "max":
            exprs.append(F.max(col).alias(out))
        else:
            raise ValueError(f"non-mergeable aggregate kind {kind!r}")
    return batch.groupBy(*keys).agg(*exprs)


def refresh_rollup(
    spark: SparkSession,
    base: str,
    batch: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    epoch_id: int | None = None,
) -> int:
    """Fold one new batch into the stored rollup and commit a new
    snapshot. ``aggs`` maps output column → (kind, source_col) with
    kind ∈ count/sum/min/max. Returns the committed version.

    Cost: one partial aggregate over the BATCH + one merge groupBy
    over (stored rows ∪ batch partials) — the stored side is
    rollup-sized (group count), not history-sized.

    EXACTLY-ONCE REPLAY: foreachBatch is at-least-once, and SUM/count
    merges are NOT idempotent — a replayed batch would double its
    contribution (max/min merges survive replays by accident; sums do
    not). Pass the foreachBatch ``epoch_id``: each commit tags its
    version before the atomic pointer swap, and a replay whose epoch
    equals the committed tag is skipped (returns the current version
    unchanged). A crash BEFORE the swap leaves the old tag, so the
    replay correctly re-applies."""
    if epoch_id is not None and versioned.committed_epoch(base) == int(epoch_id):
        return versioned._read_pointer(base)
    part = _partial(batch, keys, aggs)
    if versioned.list_versions(base):
        cur = versioned.read_current(spark, base)
        merged = cur.unionByName(part).groupBy(*keys).agg(
            *[_MERGE[kind](out).alias(out) for out, (kind, _) in aggs.items()]
        )
    else:
        merged = part
    return versioned.write_version(spark, base, merged, epoch_id=epoch_id)
