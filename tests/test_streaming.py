"""Incremental (Structured Streaming) semantics via deterministic file
replay — SURVEY §5(c): DuckDB oracles the final aggregates, these tests
pin the per-micro-batch behavior."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from flink_essentials_spark import fixtures
from flink_essentials_spark.operators.aggregate import word_count
from flink_essentials_spark.operators.stateful import keyed_process
from flink_essentials_spark.operators.triggers import CountTriggerProcessor
from flink_essentials_spark.schemas import (
    LINES_SCHEMA,
    SERVER_EVENT_SCHEMA,
    SHOPPING_CART_EVENT_SCHEMA,
)
from flink_essentials_spark.sinks.sinks import run_to_memory
from flink_essentials_spark.sources.streaming import file_replay
from flink_essentials_spark.streaming.watermarks import with_event_time


@pytest.fixture
def replay_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("replay"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_files(dfs, path):
    """One parquet file per DataFrame, in order → one micro-batch each
    with maxFilesPerTrigger=1. FileStreamSource orders by modification
    time, so mtimes are pinned strictly increasing — same-second writes
    would otherwise replay in arbitrary order."""
    import time as _time

    base = _time.time() - 3600
    for i, df in enumerate(dfs):
        sub = os.path.join(path, f"part={i}")
        df.coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            src = os.path.join(sub, f)
            if f.endswith(".parquet"):
                dst = os.path.join(path, f"{i:04d}.parquet")
                os.rename(src, dst)
                os.utime(dst, (base + i * 10, base + i * 10))
        shutil.rmtree(sub, ignore_errors=True)


def _mem(name: str) -> str:
    return f"{name}_{uuid.uuid4().hex[:8]}"


def test_streaming_wordcount_update_mode_incremental(spark, replay_dir):
    """EP2: per-line replay; update mode re-emits a word's new running
    total each time it grows — the reference's rolling keyed sum
    (SocketTextStreamWordCount.scala:63)."""
    lines = [fixtures.wordcount_lines(spark).filter(F.col("value") == l)
             for l in fixtures.WORDCOUNT_LINES]
    _write_files(lines, replay_dir)
    sdf = file_replay(spark, replay_dir, LINES_SCHEMA)
    stream_out = run_to_memory(
        spark, word_count(sdf, "value"), _mem("wc"), output_mode="update"
    ).collect()

    batch = {r["word"]: r["cnt"] for r in
             word_count(fixtures.wordcount_lines(spark), "value").collect()}
    # last emission per word == batch result (take max cnt: totals only grow)
    last = {}
    for r in stream_out:
        last[r["word"]] = max(last.get(r["word"], 0), r["cnt"])
    assert last == batch
    # incremental behavior: repeated words were re-emitted with growing
    # totals, so update-mode emitted MORE rows than distinct words
    assert len(stream_out) > len(batch)
    # e.g. "to": appears in several lines → multiple emissions
    to_counts = sorted(r["cnt"] for r in stream_out if r["word"] == "to")
    assert to_counts[-1] == batch["to"] and len(to_counts) > 1


def test_streaming_windows_emit_on_watermark(spark, replay_dir):
    """Append-mode windowed aggregation emits a window only once the
    watermark passes its end (TimeBasedTransformations.scala:204-233);
    the final window stays open at end-of-replay (no data beyond it) —
    exactly Flink's 'no watermark, no release' lesson (:313-350)."""
    ev = fixtures.starcraft_events(spark)
    halves = [ev.filter(F.col("event_time") < fixtures.START_TIME.replace(second=6)),
              ev.filter(F.col("event_time") >= fixtures.START_TIME.replace(second=6))]
    _write_files(halves, replay_dir)
    sdf = with_event_time(
        file_replay(spark, replay_dir, SERVER_EVENT_SCHEMA),
        "event_time", "500 milliseconds",
    )
    win = (
        sdf.groupBy(F.window("event_time", "3 seconds"))
        .agg(F.count_if(F.col("event_type") == "PlayerRegistered").alias("cnt"))
        .select(F.col("window.start").alias("ws"), "cnt")
    )
    rows = run_to_memory(spark, win, _mem("win"), output_mode="append").collect()
    got = {int((r["ws"] - fixtures.START_TIME).total_seconds()): r["cnt"] for r in rows}
    # watermark reaches 11 - 0.5 = 10.5 s: windows [0,3) [3,6) [6,9)
    # are emitted with the golden counts; [9,12) is still open
    assert got == {0: 1, 3: 3, 6: 2}


def test_streaming_state_survives_micro_batches(spark, replay_dir):
    """applyInPandasWithState keeps per-key state across micro-batches:
    a count trigger fired at 10/20 sees the same history whether rows
    arrive in one batch or three (KeyedState.scala:62-74 contract)."""
    ev = fixtures.shopping_cart_events(spark, 25).withColumn("user_id", F.lit("K"))
    chunks = [  # 12 + 9 + 4 rows — uneven on purpose
        ev.filter(F.col("quantity") < 4),
        ev.filter((F.col("quantity") >= 4) & (F.col("quantity") < 8)),
        ev.filter(F.col("quantity") >= 8),
    ]
    _write_files(chunks, replay_dir)
    sdf = file_replay(spark, replay_dir, SHOPPING_CART_EVENT_SCHEMA)
    out = keyed_process(
        sdf, ["user_id"], CountTriggerProcessor(10, purge=False),
        "key string, fire_seq long, cnt_in_fire long, total_seen long",
        timeout="none", event_time_col="time", output_mode="append",
    )
    rows = run_to_memory(spark, out, _mem("ct")).collect()
    got = sorted((r["fire_seq"], r["cnt_in_fire"], r["total_seen"]) for r in rows)
    assert got == [(1, 10, 10), (2, 20, 20)]


def test_late_data_dropped_beyond_watermark(spark, replay_dir):
    """The reference's allowed-lateness contract
    (TimeBasedTransformations.scala:211-233): an event arriving after
    the watermark passed its window is DROPPED with a tight bound but
    KEPT with a slack one. Two replays, same data, only the bound
    differs."""
    import datetime as dt

    base = fixtures.START_TIME
    on_time = fixtures.shopping_cart_events(spark, 30)          # t = 0..29 s
    more = fixtures.shopping_cart_events(spark, 35).filter(
        F.col("time") >= base + dt.timedelta(seconds=30)
    )                                                           # t = 30..34 s
    late = fixtures.shopping_cart_events(spark, 1)              # t = 0 s again
    # Spark advances the watermark from batch N's data but enforces it
    # on batch N+1 (one-batch lag) — hence THREE files: the late event
    # arrives when the 27s watermark is actually in force.

    for delay, expect_late_kept in (("2 seconds", False), ("2 minutes", True)):
        d = os.path.join(replay_dir, delay.replace(" ", "_"))
        _write_files([on_time, more, late], d)
        sdf = with_event_time(
            file_replay(spark, d, SHOPPING_CART_EVENT_SCHEMA), "time", delay
        )
        win = (
            sdf.groupBy(F.window("time", "10 seconds"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("window.start").alias("ws"), "cnt")
        )
        rows = run_to_memory(
            spark, win, _mem("late"), output_mode="update"
        ).collect()
        # total counted events across updates for the first window
        first_window = [r["cnt"] for r in rows if r["ws"] == base]
        if expect_late_kept:
            # slack watermark: the late event lands in window 0 →
            # an update with cnt=11 (10 on-time + 1 late)
            assert max(first_window) == 11
        else:
            # tight watermark: window 0 final count stays 10
            assert max(first_window) == 10


def test_streaming_processing_time_timeout_fires(spark, replay_dir):
    """W-T3 in TRUE streaming: a key with buffered elements and no new
    data is invoked with hasTimedOut once its processing-time timer
    expires (the reference's idle-timeout trigger,
    WindowAssignersAndTriggers.scala:129-245). Key A gets 3 events in
    batch 1 then goes idle; key B's later arrival triggers the batch
    in which A's timer fires."""
    import time as _time

    from flink_essentials_spark.operators.triggers import (
        COUNT_FIRE_SCHEMA,
        TimedOutCountTriggerProcessor,
    )

    ev_a = fixtures.shopping_cart_events(spark, 3).withColumn(
        "user_id", F.lit("A")
    )
    ev_b = fixtures.shopping_cart_events(spark, 1).withColumn(
        "user_id", F.lit("B")
    )
    _write_files([ev_a], replay_dir)

    sdf = file_replay(spark, replay_dir, SHOPPING_CART_EVENT_SCHEMA)
    out = keyed_process(
        sdf, ["user_id"], TimedOutCountTriggerProcessor(10, 1500),
        COUNT_FIRE_SCHEMA, timeout="processing",
        event_time_col="time", output_mode="append",
    )
    name = _mem("pt")
    # NOTE: with ProcessingTimeTimeout the engine keeps running batches
    # to service timers, so processAllAvailable never settles — pace
    # the trigger and poll the sink instead.
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # B arrives only later; A's 1.5 s idle timer expires in between
        _time.sleep(3.0)
        ev_b.coalesce(1).write.mode("append").parquet(replay_dir)
        deadline = _time.time() + 45
        fired = []
        while _time.time() < deadline:
            fired = [
                (r["key"], r["cnt_in_fire"], r["total_seen"])
                for r in spark.table(name).collect()
            ]
            if fired:
                break
            _time.sleep(0.5)
        assert ("A", 3, 3) in fired
    finally:
        q.stop()


def test_streaming_interval_join_left_outer_null_emission(spark, replay_dir):
    """Stream-stream LEFT OUTER interval join (J3's outer extension):
    a left row with no right match within the time bound is held in
    state and emitted NULL-padded only once the watermark passes its
    join window — never earlier (it might still match), never dropped.
    Three batches: data, watermark-advancing sentinels on BOTH sides
    (the join watermark is the MIN across inputs), and one more to
    enforce the advance (the one-batch lag)."""
    import datetime as dt
    import os

    from flink_essentials_spark.operators.joins import interval_join
    from flink_essentials_spark.streaming.watermarks import with_event_time

    base = dt.datetime(2024, 1, 1)
    mk = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    far1, far2 = mk(86400 * 40), mk(86400 * 50)

    ldir, rdir = os.path.join(replay_dir, "l"), os.path.join(replay_dir, "r")
    # left: user 1 (will match) + user 2 (no right row at all)
    lbatches = [
        spark.createDataFrame(
            [(1, mk(10)), (2, mk(12))], "user_id long, lts timestamp"
        ),
        spark.createDataFrame([(-9, far1)], "user_id long, lts timestamp"),
        spark.createDataFrame([(-9, far2)], "user_id long, lts timestamp"),
    ]
    rbatches = [
        spark.createDataFrame([(1, mk(11))], "user_id long, rts timestamp"),
        spark.createDataFrame([(-8, far1)], "user_id long, rts timestamp"),
        spark.createDataFrame([(-8, far2)], "user_id long, rts timestamp"),
    ]
    _write_files(lbatches, ldir)
    _write_files(rbatches, rdir)
    left = with_event_time(
        file_replay(spark, ldir, "user_id long, lts timestamp",
                    files_per_trigger=1),
        "lts", "1 second",
    )
    right = with_event_time(
        file_replay(spark, rdir, "user_id long, rts timestamp",
                    files_per_trigger=1),
        "rts", "1 second",
    ).withColumnRenamed("user_id", "r_user")
    out = interval_join(
        left, right, "user_id", "r_user", "lts", "rts",
        "10 seconds", "10 seconds",
        lower_exclusive=False, upper_exclusive=False, how="left_outer",
    ).select("user_id", "lts", "rts")
    rows = run_to_memory(spark, out, _mem("loj")).collect()
    got = {
        (r["user_id"], r["rts"] is not None) for r in rows if r["user_id"] > 0
    }
    # user 1 matched inner; user 2 emitted NULL-padded by the watermark
    assert got == {(1, True), (2, False)}


def test_streaming_dropDuplicates_exactly_once_per_key(spark, replay_dir):
    """Streaming exact dedup: a sku replayed in two different
    micro-batches is emitted once (state store remembers keys)."""
    ev = fixtures.shopping_cart_events(spark, 10)
    _write_files([ev, ev], replay_dir)  # full duplicate second batch
    sdf = file_replay(spark, replay_dir, SHOPPING_CART_EVENT_SCHEMA)
    deduped = sdf.dropDuplicates(["sku"])
    rows = run_to_memory(spark, deduped, _mem("dd")).collect()
    assert len(rows) == 10


def test_generator_out_of_order_late_rows_dropped(spark):
    """S6 parity from the GENERATOR (no file replay): every 5th event is
    injected 60 s behind its emission position
    (ShoppingCartEventsGenerator.scala:104-123's extra-delay lesson).
    With a 10 s watermark over 10 s tumbling windows, on-time windows
    count 8 (not 10): the two injected-late rows per window land in a
    60 s-stale window, which is accepted only while the watermark is
    still unset/fresh (batches 0-1 — Spark enforces a new watermark one
    batch after advancing it) and DROPPED from batch 2 on."""
    import time as _time

    from flink_essentials_spark.sources.streaming import shopping_cart_source

    src = shopping_cart_source(
        spark,
        10,
        micro_batch=True,
        out_of_order_every=5,
        out_of_order_lag_secs=60,
    )
    win = (
        src.withWatermark("time", "10 seconds")
        .groupBy(F.window("time", "10 seconds"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.start").cast("long").alias("ws"), "cnt")
    )
    name = _mem("ooo")
    base = 1643760000  # 2022-02-02T00:00:00 UTC
    q = (
        win.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        got = {}
        while _time.time() < deadline:
            got = {r["ws"]: r["cnt"] for r in spark.table(name).collect()}
            if base in got and base + 10 in got:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    # batches 0-1 (values 0-19): late rows v=4,9 -> [base-60, base-50),
    # v=14,19 -> [base-50, base-40); both accepted (watermark still at
    # its initial/fresh value when they arrive)
    assert got.get(base - 60) == 2
    assert got.get(base - 50) == 2
    # from batch 2 on the watermark has advanced past the stale windows:
    # late rows are DROPPED (never appear anywhere) -> no window between
    # base-40 and base, and every on-time window counts 8 of 10
    assert not any(base - 40 <= w < base for w in got)
    assert got.get(base) == 8
    assert got.get(base + 10) == 8
    assert all(c <= 8 for w, c in got.items() if w >= base)


def test_streaming_interval_join_matches_across_micro_batches(spark, replay_dir):
    """Stream-stream interval join state: a purchase whose signup
    partner arrived in an EARLIER micro-batch still joins — the state
    store holds the other side across batches."""
    base = "2022-02-02 00:00:00"
    signups = spark.createDataFrame(
        [(1, 100, "signup", base)],
        "event_id long, user_id long, event_type string, ts_s string",
    ).select("event_id", "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    buys = spark.createDataFrame(
        [(2, 100, "purchase", "2022-02-02 00:05:00"),   # +5 min: joins
         (3, 100, "purchase", "2022-02-02 00:20:00")],  # +20 min: outside bound
        "event_id long, user_id long, event_type string, ts_s string",
    ).select("event_id", "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    _write_files([signups, buys], replay_dir)

    from flink_essentials_spark.operators.joins import interval_join

    schema = "event_id long, user_id long, event_type string, ts timestamp"
    su = (
        file_replay(spark, replay_dir, schema)
        .filter(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("signup_id"),
                F.col("user_id").alias("su"),
                F.col("ts").alias("signup_ts"))
        .withWatermark("signup_ts", "1 day")
    )
    bu = (
        file_replay(spark, replay_dir, schema)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 day")
    )
    out = interval_join(
        bu, su, "user_id", "su", "purchase_ts", "signup_ts",
        "10 minutes", "10 minutes",
        lower_exclusive=True, upper_exclusive=True,
    )
    rows = run_to_memory(spark, out.select("signup_id", "purchase_id"), _mem("sij")).collect()
    assert {(r["signup_id"], r["purchase_id"]) for r in rows} == {(1, 2)}


def test_watermark_dedup_state_expires_plain_dedup_does_not(spark, replay_dir):
    """dropDuplicatesWithinWatermark vs dropDuplicates: after the
    watermark passes a key's dedup window its state is EVICTED, so a
    far-later replica re-emits; plain dropDuplicates keeps state
    forever and suppresses it. (4 files: the watermark advance is
    enforced one batch late, and state eviction runs at batch END —
    two batches between the advance and the replica.)"""
    mk = lambda rows: spark.createDataFrame(
        rows, "k string, ts_s string"
    ).select("k", F.col("ts_s").cast("timestamp").alias("event_ts"))
    f1 = mk([("A", "2022-02-02 00:00:00")])
    f2 = mk([("B", "2022-02-02 03:00:00")])  # advances watermark to +2h
    f3 = mk([("C", "2022-02-02 03:00:00")])  # batch where eviction runs
    f4 = mk([("A", "2022-02-02 03:00:00")])  # A's 1h window long expired
    _write_files([f1, f2, f3, f4], replay_dir)
    schema = "k string, event_ts timestamp"

    wm_dedup = (
        file_replay(spark, replay_dir, schema)
        .withWatermark("event_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
    )
    got = [r["k"] for r in run_to_memory(spark, wm_dedup, _mem("wmd")).collect()]
    assert sorted(got) == ["A", "A", "B", "C"]  # A re-emitted after expiry

    plain = file_replay(spark, replay_dir, schema).dropDuplicates(["k"])
    got2 = [r["k"] for r in run_to_memory(spark, plain, _mem("pld")).collect()]
    assert sorted(got2) == ["A", "B", "C"]  # state never expires


def test_streaming_session_windows_emission_and_pushdown_trap(spark, tmp_path):
    """Session windows in append mode: (a) a session emits only after a
    LATER batch's watermark passes its end — far-future sentinel batches
    flush the tail; (b) the trap: filtering the sentinel key INSIDE the
    streaming plan pushes the filter below EventTimeWatermark, starving
    the watermark, and the last session then never emits. Pin both."""
    import datetime

    from flink_essentials_spark.sinks.sinks import run_to_memory
    from flink_essentials_spark.sources.streaming import file_replay

    D = datetime.datetime
    files = [
        [(1, D(2024, 1, 1, 0, 0, 0)), (1, D(2024, 1, 1, 0, 10, 0))],
        [(2, D(2024, 1, 2, 0, 0, 0))],
        [(-1, D(2024, 3, 1, 0, 0, 0))],
        [(-1, D(2024, 4, 1, 0, 0, 0))],
    ]
    replay = str(tmp_path / "replay")
    os.makedirs(replay)
    dfs = [
        spark.createDataFrame(rows, "user_id long, ts timestamp") for rows in files
    ]
    _write_files(dfs, replay)

    def build(filter_in_stream):
        stream = file_replay(
            spark, replay, "user_id long, ts timestamp", files_per_trigger=1
        ).withWatermark("ts", "1 second")
        win = (
            stream.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if filter_in_stream:
            win = win.filter(F.col("user_id") >= 0)
        win = win.select("user_id", "cnt")
        out = run_to_memory(
            spark, win, _mem("ssw"), output_mode="append"
        )
        if not filter_in_stream:
            out = out.filter(F.col("user_id") >= 0)
        return sorted((r["user_id"], r["cnt"]) for r in out.collect())

    # correct form: both real sessions emit (user 2's needed the sentinels)
    assert build(filter_in_stream=False) == [(1, 2), (2, 1)]
    # the trap, pinned: in-stream filter starves the watermark of the
    # sentinel rows and user 2's session is lost
    assert build(filter_in_stream=True) == [(1, 2)]


def test_capped_sessions_streaming_matches_batch(spark, replay_dir):
    """CappedSessionProcessor on the TRUE streaming path
    (applyInPandasWithState + EventTimeTimeout): time-ordered replay +
    two far-future sentinel batches (advance, then enforce+flush — the
    one-batch watermark lag); the emitted session set must equal the
    batch capped_sessions operator on the same events. Exercises both
    close paths: inline (gap/cap violated by a later element) and
    timer (idle session flushed when the watermark passes prev+gap)."""
    import datetime

    from flink_essentials_spark.operators.windows import (
        CappedSessionProcessor,
        capped_sessions,
    )

    base = datetime.datetime(2024, 1, 1)
    mk = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    rows = [(1, mk(s)) for s in range(0, 401, 40)] + [
        (2, mk(0)),
        (2, mk(30)),
        (2, mk(300)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    want = {
        (r["key"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in capped_sessions(df, "user_id", "ts", 60_000, 120_000).collect()
    }

    withms = df.withColumn("ts_ms", F.unix_millis("ts"))
    buckets = [
        withms.filter(F.col("ts") < mk(150)),
        withms.filter((F.col("ts") >= mk(150)) & (F.col("ts") < mk(350))),
        withms.filter(F.col("ts") >= mk(350)),
    ]
    ep = lambda d: int(  # noqa: E731
        mk(86400 * d).replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
    )
    sentinels = [
        spark.createDataFrame(
            [(-1, mk(86400 * d), ep(d))],
            "user_id long, ts timestamp, ts_ms long",
        )
        for d in (40, 50)
    ]
    _write_files(buckets + sentinels, replay_dir)
    sdf = with_event_time(
        file_replay(
            spark, replay_dir, "user_id long, ts timestamp, ts_ms long",
            files_per_trigger=1,
        ),
        "ts",
        "1 second",
    )
    out = keyed_process(
        sdf,
        ["user_id"],
        CappedSessionProcessor(60_000, 120_000),
        "key long, session_start_ms long, session_end_ms long, n_events long",
        timeout="event",
        event_time_col="ts",
        output_mode="append",
    )
    got = {
        (r["key"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in run_to_memory(spark, out, _mem("caps")).collect()
        if r["key"] >= 0
    }
    assert got == want


def test_dynamic_rules_refresh_per_micro_batch(spark, replay_dir, tmp_path):
    """Flink's broadcast-state pattern (a control stream updating rules
    applied to the data stream) in Spark form: foreachBatch re-reads
    the CURRENT rules snapshot per micro-batch — batch 0 scores with
    rules v1, batch 1 with rules v2 after the control plane commits a
    new version between batches (sinks.versioned gives the atomic
    rule swap)."""
    import os

    from flink_essentials_spark.sinks import versioned as V
    from flink_essentials_spark.sinks.sinks import for_each_batch
    from flink_essentials_spark.sources.streaming import file_replay

    rules_base = str(tmp_path / "rules")
    V.write_version(
        spark,
        rules_base,
        spark.createDataFrame([("a", 1), ("b", 2)], "k string, mult long"),
    )

    for i in range(2):
        sub = str(tmp_path / f"s{i}")
        spark.createDataFrame(
            [("a", 10 + i), ("b", 20 + i)], "k string, v long"
        ).coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                dst = os.path.join(replay_dir, f"{i:04d}.parquet")
                os.rename(os.path.join(sub, f), dst)
                os.utime(dst, (5000 + i, 5000 + i))

    stream = file_replay(spark, replay_dir, "k string, v long", files_per_trigger=1)
    seen = []

    def apply_rules(bdf, epoch):
        rules = V.read_current(spark, rules_base)
        out = (
            bdf.join(F.broadcast(rules), "k")
            .selectExpr("k", "v * mult AS scored")
            .collect()
        )
        seen.append(sorted((r["k"], r["scored"]) for r in out))
        if epoch == 0:  # control plane updates the rules mid-stream
            V.write_version(
                spark,
                rules_base,
                spark.createDataFrame(
                    [("a", 100), ("b", 200)], "k string, mult long"
                ),
            )

    q = for_each_batch(stream, apply_rules)
    q.processAllAvailable()
    q.stop()
    assert seen == [
        [("a", 10), ("b", 40)],          # rules v1: 10*1, 20*2
        [("a", 1100), ("b", 4200)],      # rules v2: 11*100, 21*200
    ]
