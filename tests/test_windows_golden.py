"""Golden window tests: the reference's own hand-derived expectations.

The 12-event StarCraft fixture and every expected count below come from
the reference's comment analysis (Windows.scala:52-65 fixture;
:101-111 tumbling, :249-287 sliding, :340-345 session,
:204-241 keyed), ported as data into fixtures.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_essentials_spark import fixtures
from flink_essentials_spark.operators import windows

def REG():
    return F.col("event_type") == "PlayerRegistered"


def _start_offsets(rows, start=fixtures.START_TIME):
    """window_start timestamp → integer second offset from fixture base."""
    return {
        int((r["window_start"] - start) / dt.timedelta(seconds=1)): r["cnt"]
        for r in rows
    }


def test_tumbling_3s_registration_counts(spark):
    df = fixtures.starcraft_events(spark)
    out = windows.windowed_count(df, windows.tumbling("event_time", "3 seconds"), [], REG())
    got = _start_offsets(r.asDict() for r in out.collect())
    # Windows.scala:101-111 — windows [0,3) [3,6) [6,9) [9,12): 1,3,2,0.
    # The zero-registration window EXISTS (it has online events).
    assert got == {0: 1, 3: 3, 6: 2, 9: 0}


def test_sliding_3s_1s_registration_counts(spark):
    df = fixtures.starcraft_events(spark)
    out = windows.windowed_count(
        df, windows.sliding("event_time", "3 seconds", "1 second"), [], REG()
    )
    got = _start_offsets(r.asDict() for r in out.collect())
    golden = dict(enumerate(fixtures.SLIDING_3S_1S_REGISTRATION_COUNTS))
    for start, cnt in golden.items():
        assert got.get(start, 0) == cnt, f"window start={start}"
    # windows past the golden range hold only online events → 0 registrations
    assert all(cnt == 0 for start, cnt in got.items() if start not in golden)


def test_keyed_tumbling_3s_result_count(spark):
    df = fixtures.starcraft_events(spark)
    out = windows.windowed_count(
        df, windows.tumbling("event_time", "3 seconds"), ["event_type"]
    )
    # Windows.scala:204-241: exactly 7 (window, event_type) results
    assert out.count() == fixtures.KEYED_TUMBLING_3S_RESULT_COUNT


def test_session_2s_counts_per_nickname(spark):
    df = fixtures.starcraft_events(spark)
    sessions = windows.window_agg(
        df,
        windows.session("event_time", "2 seconds"),
        ["nickname"],
        F.count(F.lit(1)).alias("events_in_session"),
    )
    per_nick = {
        r["nickname"]: r["n_sessions"]
        for r in sessions.groupBy("nickname")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .collect()
    }
    assert per_nick == fixtures.SESSION_2S_COUNTS_BY_NICK


def test_global_count_windows(spark):
    df = fixtures.starcraft_events(spark)
    out = windows.global_count_windows(df, "event_time", 10).collect()
    # 12 events, N=10 → one full bucket of 10, one partial of 2
    got = {r["window_seq"]: r["cnt"] for r in out}
    assert got == {0: 10, 1: 2}


def test_event_time_rerun_determinism(spark):
    """Reference TimeBasedTransformations.scala:180-209: event-time
    windows are a pure function of the data — input order must not
    matter."""
    df = fixtures.starcraft_events(spark)
    shuffled = df.orderBy(F.reverse(F.col("entity_id")), F.col("event_type").desc())
    win = lambda d: sorted(
        (r["window_start"], r["cnt"])
        for r in windows.windowed_count(
            d, windows.tumbling("event_time", "3 seconds"), [], REG()
        ).collect()
    )
    assert win(df) == win(shuffled)


def test_resample_forward_fill_grid_and_carry(spark):
    """Grid covers [min,max] buckets per key; gaps carry the previous
    value; leading gap impossible (grid starts at first observation)."""
    import datetime

    from flink_essentials_spark.operators.windows import resample_forward_fill

    D = datetime.datetime
    rows = [
        (1, D(2024, 1, 1, 5), 10.0),
        (1, D(2024, 1, 1, 9), 11.0),   # same bucket: max wins
        (1, D(2024, 1, 4, 1), 12.0),   # 2-day gap -> days 2,3 filled with 11
        (2, D(2024, 1, 2, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(
        (r["user_id"], r["bucket_ms"], r["value"], r["observed"])
        for r in resample_forward_fill(
            df, "user_id", "ts", "value", 86400000
        ).collect()
    )
    day = 86400000
    d0 = 19723 * day  # 2024-01-01 epoch-day
    assert out == [
        (1, d0, 11.0, True),
        (1, d0 + day, 11.0, False),
        (1, d0 + 2 * day, 11.0, False),
        (1, d0 + 3 * day, 12.0, True),
        (2, d0 + day, 5.0, True),
    ]


def _capped_ref(ts_list, gap, cap):
    """Brute-force reference for capped sessions."""
    out = []
    for t in sorted(ts_list):
        if out and t - out[-1][-1] <= gap and t - out[-1][0] <= cap:
            out[-1].append(t)
        else:
            out.append([t])
    return [(s[0], s[-1], len(s)) for s in out]


def test_capped_sessions_golden_and_cap_split(spark):
    import datetime

    from flink_essentials_spark.operators.windows import capped_sessions

    base = datetime.datetime(2024, 1, 1)
    mk = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    # key 1: steady drip 0,40,80,...,400 s with gap 60 s would be ONE
    # session; cap 120 s splits it
    rows = [(1, mk(s)) for s in range(0, 401, 40)] + [
        (2, mk(0)),
        (2, mk(30)),
        (2, mk(300)),  # gap split
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["key"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in capped_sessions(df, "user_id", "ts", 60_000, 120_000).collect()
    }
    base_ms = int(base.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    want = set()
    for k, ts_s in ((1, range(0, 401, 40)), (2, (0, 30, 300))):
        for s, e, n in _capped_ref([x * 1000 for x in ts_s], 60_000, 120_000):
            want.add((k, base_ms + s, base_ms + e, n))
    assert got == want


def test_capped_sessions_infinite_cap_equals_gap_only(spark):
    """Property (hypothesis): with cap=inf the operator degenerates to
    plain gap sessionization, matching the brute reference on random
    timestamp sets."""
    import datetime

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_essentials_spark.operators.windows import capped_sessions

    base = datetime.datetime(2024, 1, 1)

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=3600), min_size=1, max_size=40
        )
    )
    def check(seconds):
        rows = [
            (7, base + datetime.timedelta(seconds=s)) for s in set(seconds)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = sorted(
            (r["session_start_ms"], r["session_end_ms"], r["n_events"])
            for r in capped_sessions(
                df, "user_id", "ts", 90_000, 10**15
            ).collect()
        )
        base_ms = int(
            base.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
        )
        want = sorted(
            (base_ms + s, base_ms + e, n)
            for s, e, n in _capped_ref(
                [x * 1000 for x in set(seconds)], 90_000, 10**15
            )
        )
        assert got == want

    check()
