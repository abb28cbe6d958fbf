"""KeyedProcessor semantics: the reference's KeyedState demos as
deterministic batch-replay goldens (the streaming path shares the same
processor classes; tests/test_streaming.py covers it)."""

from __future__ import annotations

import datetime as dt

from flink_essentials_spark import fixtures
from flink_essentials_spark.operators import stateful
from flink_essentials_spark.operators.stateful import (
    Emitter,
    KeyedProcessor,
    State,
    TtlConfig,
    keyed_process,
)


class RunningCounter(KeyedProcessor):
    """ValueState per-user event counter (KeyedState.scala:65-148):
    emits 'user_id: X - n' per event."""

    def on_element(self, key, row, state: State, out: Emitter):
        n = state.get("n", 0) + 1
        state.put("n", n)
        out.emit(user_id=key[0], n=n)


class ResettingCounter(KeyedProcessor):
    """state.clear() every 3 events (KeyedState.scala:314-318, 350-361)."""

    def on_element(self, key, row, state: State, out: Emitter):
        n = state.get("n", 0) + 1
        if n >= 3:
            state.clear()
        else:
            state.put("n", n)
        out.emit(user_id=key[0], n=n)


class TtlCounter(KeyedProcessor):
    """StateTtlConfig (KeyedState.scala:326-348): counter value expires
    1000 ms after write; expired reads restart from default."""

    TTL = TtlConfig(ttl_ms=1000)

    def on_element(self, key, row, state: State, out: Emitter):
        n = state.get("n", 0, ttl=self.TTL) + 1
        state.put("n", n, ttl=self.TTL)
        out.emit(user_id=key[0], n=n)


class TimerCounter(KeyedProcessor):
    """KeyedState.scala:472-528: on first event register an event-time
    timer at first.ts + 10 s; count events until it fires; emit the
    count on the timer; reset."""

    def on_element(self, key, row, state: State, out: Emitter):
        if state.get("n") is None:
            state.register_timer(state.now_ms() + 10_000)
        state.put("n", state.get("n", 0) + 1)

    def on_timer(self, key, state: State, out: Emitter):
        out.emit(user_id=key[0], n=state.get("n", 0))
        state.clear()


def _cart(spark, n=20, step_s=1):
    df = fixtures.shopping_cart_events(spark, n)
    if step_s != 1:
        import pyspark.sql.functions as F

        base = fixtures.START_TIME
        df = df.withColumn(
            "time",
            F.to_timestamp(F.lit(base.isoformat()))
            + F.make_interval(
                secs=(
                    (F.unix_timestamp("time") - F.lit(int(base.timestamp())))
                    * step_s
                ).cast("double")
            ),
        )
    return df


def test_running_counter_per_key(spark):
    out = keyed_process(
        _cart(spark, 20), ["user_id"], RunningCounter(),
        "user_id string, n long", order_by="time",
    ).collect()
    per_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["n"])):
        per_user.setdefault(r["user_id"], []).append(r["n"])
    # 20 events over 5 users round-robin → each user sees 1,2,3,4
    assert per_user == {u: [1, 2, 3, 4] for u in ("Bob", "Alice", "Sam", "Tom", "Rob")}


def test_clear_resets_counter(spark):
    out = keyed_process(
        _cart(spark, 30), ["user_id"], ResettingCounter(),
        "user_id string, n long", order_by="time",
    ).collect()
    bob = [r["n"] for r in out if r["user_id"] == "Bob"]
    assert bob == [1, 2, 3, 1, 2, 3]


def test_ttl_expires_state(spark):
    # one event per second per user pool of 5 → per-user gap is 5 s > 1 s TTL:
    # every read sees expired state, counter never exceeds 1
    out = keyed_process(
        _cart(spark, 20), ["user_id"], TtlCounter(),
        "user_id string, n long", order_by="time", event_time_col="time",
    ).collect()
    assert {r["n"] for r in out} == {1}

    # same processor, all events for ONE user 300 ms apart → state lives
    import pyspark.sql.functions as F

    df = fixtures.shopping_cart_events(spark, 5).withColumns(
        {
            "user_id": F.lit("Solo"),
            "time": F.to_timestamp(F.lit(fixtures.START_TIME.isoformat()))
            + F.make_interval(
                secs=(F.col("quantity") * 0.3).cast("double")
            ),
        }
    )
    out2 = keyed_process(
        df, ["user_id"], TtlCounter(),
        "user_id string, n long", order_by="time", event_time_col="time",
    ).collect()
    assert sorted(r["n"] for r in out2) == [1, 2, 3, 4, 5]


def test_event_time_timer_fires_between_elements_and_at_eof(spark):
    import pyspark.sql.functions as F

    # one user, events at t = 0,5,10,15,20 s
    df = fixtures.shopping_cart_events(spark, 5).withColumns(
        {
            "user_id": F.lit("Solo"),
            "time": F.to_timestamp(F.lit(fixtures.START_TIME.isoformat()))
            + F.make_interval(secs=(F.col("quantity") * 5.0).cast("double")),
        }
    )
    out = keyed_process(
        df, ["user_id"], TimerCounter(),
        "user_id string, n long", order_by="time", event_time_col="time",
    ).collect()
    # timer@10 fires before event@10 (count=2: events 0,5); timer@20
    # fires before event@20 (count=2: events 10,15); end-of-input fires
    # the pending timer (count=1: event 20)
    assert [r["n"] for r in sorted(out, key=lambda r: r["n"], reverse=True)] == [2, 2, 1]


class MultiTimerScheduler(KeyedProcessor):
    """Flink's registerEventTimeTimer REGISTRY semantics
    (KeyedState.scala:472-528): the first event schedules THREE timers
    (t+2 s, t+4 s, t+6 s) via add_timer; each outstanding timestamp
    fires exactly ONCE, in timestamp order; one is deleted before it
    can fire."""

    def on_element(self, key, row, state: State, out: Emitter):
        if state.get("armed") is None:
            t0 = state.now_ms()
            state.add_timer(t0 + 2_000)
            state.add_timer(t0 + 4_000)
            state.add_timer(t0 + 6_000)
            state.add_timer(t0 + 4_000)  # duplicate: must be a no-op
            state.delete_timer(t0 + 6_000)
            state.put("armed", 1)
        state.put("n", state.get("n", 0) + 1)

    def on_timer(self, key, state: State, out: Emitter):
        out.emit(user_id=key[0], n=state.get("n", 0), at=state.now_ms())


def test_multiple_timers_fire_once_each_in_order(spark):
    import pyspark.sql.functions as F

    # one user, events at t = 0, 5, 10, 15, 20 s
    df = fixtures.shopping_cart_events(spark, 5).withColumns(
        {
            "user_id": F.lit("Solo"),
            "time": F.to_timestamp(F.lit(fixtures.START_TIME.isoformat()))
            + F.make_interval(secs=(F.col("quantity") * 5.0).cast("double")),
        }
    )
    out = keyed_process(
        df, ["user_id"], MultiTimerScheduler(),
        "user_id string, n long, at long", order_by="time",
        event_time_col="time",
    ).collect()
    base_ms = int(fixtures.START_TIME.timestamp() * 1000)
    fired = sorted((r["at"] - base_ms, r["n"]) for r in out)
    # timer@2s fires before event@5s (1 element seen), timer@4s also
    # before event@5s; timer@6s was deleted and must NOT fire; the
    # duplicate 4s registration must not double-fire
    assert fired == [(2_000, 1), (4_000, 1)]


def test_tws_backend_gate(spark):
    """The native transformWithStateInPandas backend: auto-selection
    must resolve to the emulation when the protobuf runtime is absent,
    and an explicit backend='tws' must raise the actionable
    environment error (the Kafka-source posture). On an image WITH
    protobuf this test instead asserts the backend constructs a
    streaming plan."""
    import pytest

    from flink_essentials_spark.operators.stateful_tws import tws_available
    from flink_essentials_spark.schemas import SHOPPING_CART_EVENT_SCHEMA
    from flink_essentials_spark.sources.streaming import file_replay

    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="tws_gate_")
    fixtures.shopping_cart_events(spark, 5).coalesce(1).write.parquet(
        d, mode="overwrite"
    )
    sdf = file_replay(spark, d, SHOPPING_CART_EVENT_SCHEMA)
    if tws_available():
        out = keyed_process(
            sdf, ["user_id"], RunningCounter(),
            "user_id string, n long", backend="tws",
        )
        assert out.isStreaming
    else:
        with pytest.raises(RuntimeError, match="protobuf"):
            keyed_process(
                sdf, ["user_id"], RunningCounter(),
                "user_id string, n long", backend="tws",
            )
        # auto must still produce the emulation plan
        out = keyed_process(
            sdf, ["user_id"], RunningCounter(),
            "user_id string, n long", backend="auto",
        )
        assert out.isStreaming


def test_tws_live_roundtrip(spark, tmp_path):
    """Live TWS micro-batch run — skipped where the protobuf runtime
    is absent (this sandbox image; see stateful_tws docstring)."""
    import pytest

    pytest.importorskip("google.protobuf")
    import uuid

    from flink_essentials_spark.schemas import SHOPPING_CART_EVENT_SCHEMA
    from flink_essentials_spark.sinks.sinks import run_to_memory
    from flink_essentials_spark.sources.streaming import file_replay

    d = str(tmp_path / "replay")
    fixtures.shopping_cart_events(spark, 20).coalesce(1).write.parquet(d)
    sdf = file_replay(spark, d, SHOPPING_CART_EVENT_SCHEMA)
    out = keyed_process(
        sdf, ["user_id"], RunningCounter(),
        "user_id string, n long", backend="tws", event_time_col="time",
    )
    rows = run_to_memory(
        spark, out, f"tws_{uuid.uuid4().hex[:8]}"
    ).collect()
    per_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["n"])):
        per_user.setdefault(r["user_id"], []).append(r["n"])
    assert per_user == {
        u: [1, 2, 3, 4] for u in ("Bob", "Alice", "Sam", "Tom", "Rob")
    }


def test_running_count_declarative_equivalent(spark):
    got = {
        (r["user_id"], r["cnt"])
        for r in stateful.running_count(_cart(spark, 20), ["user_id"]).collect()
    }
    assert got == {(u, 4) for u in ("Bob", "Alice", "Sam", "Tom", "Rob")}
