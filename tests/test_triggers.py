"""Trigger/evictor firing-policy goldens (reference §2.6), batch-replay
form — the full deterministic firing history."""

from __future__ import annotations

import datetime as dt

from flink_essentials_spark import fixtures
from flink_essentials_spark.operators import triggers


def _one_key_events(spark, n):
    import pyspark.sql.functions as F

    return fixtures.shopping_cart_events(spark, n).withColumn(
        "user_id", F.lit("K")
    )


def fires(rows):
    return sorted((r["fire_seq"], r["cnt_in_fire"], r["total_seen"]) for r in rows)


def test_count_trigger_cumulative_reemission(spark):
    """W-T1 (WindowAssignersAndTriggers.scala:44-90): FIRE without purge
    re-emits the cumulative buffer — 10, then 20."""
    out = triggers.count_trigger(
        _one_key_events(spark, 25), ["user_id"], 10, order_by="time"
    ).collect()
    assert fires(out) == [(1, 10, 10), (2, 20, 20)]


def test_purging_trigger_fresh_elements_only(spark):
    """W-T2 (:92-116): FIRE_AND_PURGE — each firing sees only fresh N."""
    out = triggers.count_trigger(
        _one_key_events(spark, 25), ["user_id"], 10, purge=True, order_by="time"
    ).collect()
    assert fires(out) == [(1, 10, 10), (2, 10, 20)]


def test_count_evictor_keeps_last_k(spark):
    """W-E1 (TriggersAndEvictors.scala:242-290): evict all but last 5
    before each firing."""
    out = triggers.count_evictor(
        _one_key_events(spark, 25), ["user_id"], 10, 5, order_by="time"
    ).collect()
    assert fires(out) == [(1, 5, 10), (2, 5, 20)]


def test_batch_and_processor_strategies_agree(spark):
    """The declarative batch plan and the stateful KeyedProcessor are
    two physical strategies for the SAME logical operator — their
    firing histories must be identical."""
    from flink_essentials_spark.operators.stateful import keyed_process
    from flink_essentials_spark.operators.triggers import (
        COUNT_FIRE_SCHEMA,
        CountEvictorProcessor,
        CountTriggerProcessor,
    )

    df = _one_key_events(spark, 25)
    for purge in (False, True):
        declarative = triggers.count_trigger(
            df, ["user_id"], 10, purge=purge, order_by="time"
        ).collect()
        stateful = keyed_process(
            df, ["user_id"], CountTriggerProcessor(10, purge=purge),
            COUNT_FIRE_SCHEMA, order_by="time",
        ).collect()
        assert fires(declarative) == fires(stateful)

    declarative = triggers.count_evictor(
        df, ["user_id"], 10, 5, order_by="time"
    ).collect()
    stateful = keyed_process(
        df, ["user_id"], CountEvictorProcessor(10, 5),
        COUNT_FIRE_SCHEMA, order_by="time",
    ).collect()
    assert fires(declarative) == fires(stateful)


def test_timeout_trigger_fires_on_idle_gap(spark):
    """W-T3/W-T5 (TimedOutCountTrigger): fire on count OR idle timeout.
    Batch replay: event-time gap > timeout ≡ stream went idle."""
    import pyspark.sql.functions as F

    # one key; events at t=0,1,2 then a 8-second gap then t=10
    df = fixtures.shopping_cart_events(spark, 4).withColumns(
        {
            "user_id": F.lit("K"),
            "time": F.to_timestamp(F.lit(fixtures.START_TIME.isoformat()))
            + F.make_interval(
                secs=F.when(F.col("quantity") == 3, 10.0)
                .otherwise(F.col("quantity").cast("double"))
            ),
        }
    )
    out = triggers.timed_out_count_trigger(
        df, ["user_id"], max_count=10, timeout_ms=3000, order_by="time",
        event_time_col="time",
    ).collect()
    # idle timer armed at 2+3=5 s fires during the gap (3 buffered);
    # end-of-input fires the re-armed timer (1 buffered)
    assert fires(out) == [(1, 3, 3), (2, 1, 4)]


def test_timeout_trigger_count_path(spark):
    """Same trigger, count dimension: 25 events, max_count=10 → two
    count-fires + one timeout flush of the remainder."""
    out = triggers.timed_out_count_trigger(
        _one_key_events(spark, 25), ["user_id"], max_count=10,
        timeout_ms=3000, order_by="time", event_time_col="time",
    ).collect()
    assert fires(out) == [(1, 10, 10), (2, 10, 20), (3, 5, 25)]


def test_count_evictor_run_after_full_buffer(spark):
    """W-E1 evictAfter placement (TriggersAndEvictors.scala:242-290):
    the window function sees the FULL buffer — min(count+max, k*count)
    — and eviction only trims state for the next fire."""
    out = triggers.count_evictor(
        _one_key_events(spark, 25), ["user_id"], 10, 5,
        order_by="time", run_before=False,
    ).collect()
    assert fires(out) == [(1, 10, 10), (2, 15, 20)]


def test_count_evictor_run_after_strategies_agree(spark):
    from flink_essentials_spark.operators.stateful import keyed_process
    from flink_essentials_spark.operators.triggers import (
        COUNT_FIRE_SCHEMA,
        CountEvictorProcessor,
    )

    df = _one_key_events(spark, 25)
    declarative = triggers.count_evictor(
        df, ["user_id"], 10, 5, order_by="time", run_before=False
    ).collect()
    stateful = keyed_process(
        df, ["user_id"], CountEvictorProcessor(10, 5, run_before=False),
        COUNT_FIRE_SCHEMA, order_by="time",
    ).collect()
    assert fires(declarative) == fires(stateful)
