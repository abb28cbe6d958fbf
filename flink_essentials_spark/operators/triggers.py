"""Window firing policy: count triggers, purging, idle timeout, evictors.

Reference semantics:
- CountTrigger.of(N): FIRE (no purge) every N elements → each firing
  re-emits the cumulative window contents (10, then 20 —
  WindowAssignersAndTriggers.scala:44-90, TriggersAndEvictors.scala:57-80)
- PurgingTrigger: FIRE_AND_PURGE → each firing sees only the fresh N
  (WindowAssignersAndTriggers.scala:92-116)
- TimedOutCountTrigger(maxCount, timeoutMs): fire on count OR idle
  timeout, per-key ValueState + processing-time timer
  (WindowAssignersAndTriggers.scala:129-245)
- Evictor: keep only the last ``maxSize`` elements before the window
  function runs (TriggersAndEvictors.scala:242-290)

No Catalyst analog exists (SURVEY §4) — these are KeyedProcessor
programs over the stateful wrapper. Works on streaming frames (true
incremental firing across micro-batches) and batch frames (ordered
replay → the full deterministic firing history, used by golden tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_essentials_spark.operators.stateful import (
    Emitter,
    KeyedProcessor,
    State,
    keyed_process,
)

COUNT_FIRE_SCHEMA = (
    "key string, fire_seq long, cnt_in_fire long, total_seen long"
)


class CountTriggerProcessor(KeyedProcessor):
    """FIRE every ``count`` elements; purge=False re-emits cumulative
    contents (W-T1), purge=True clears the buffer each firing (W-T2)."""

    def __init__(self, count: int, *, purge: bool, value_col: str | None = None):
        self.count = count
        self.purge = purge
        self.value_col = value_col

    def on_element(self, key: tuple, row: dict, state: State, out: Emitter) -> None:
        buf = state.list_add("buf", row.get(self.value_col) if self.value_col else 1)
        total = state.get("total", 0) + 1
        state.put("total", total)
        should_fire = (
            len(buf) == self.count if self.purge else len(buf) % self.count == 0
        )
        if should_fire:
            fire_seq = state.get("fires", 0) + 1
            state.put("fires", fire_seq)
            out.emit(
                key=str(key[0]),
                fire_seq=fire_seq,
                cnt_in_fire=len(buf),
                total_seen=total,
            )
            if self.purge:
                state.put("buf", [])


class TimedOutCountTriggerProcessor(KeyedProcessor):
    """Fire on count OR idle timeout (W-T3/W-T5).

    Streaming mode uses ProcessingTimeTimeout (set a timer
    ``timeout_ms`` ahead on each element, exactly the reference's
    re-registration pattern, TriggersAndEvictors.scala:161-202); batch
    replay fires on event-time gaps, which is the deterministic
    equivalent of "stream went idle".
    """

    def __init__(self, max_count: int, timeout_ms: int):
        self.max_count = max_count
        self.timeout_ms = timeout_ms

    def _fire(self, key: tuple, state: State, out: Emitter, why: str) -> None:
        buf = state.list_get("buf")
        if not buf:
            return
        fire_seq = state.get("fires", 0) + 1
        state.put("fires", fire_seq)
        out.emit(
            key=str(key[0]),
            fire_seq=fire_seq,
            cnt_in_fire=len(buf),
            total_seen=state.get("total", 0),
        )
        state.put("buf", [])

    def on_element(self, key: tuple, row: dict, state: State, out: Emitter) -> None:
        buf = state.list_add("buf", 1)
        state.put("total", state.get("total", 0) + 1)
        if len(buf) >= self.max_count:
            self._fire(key, state, out, "count")
            state.clear_timer()
        else:
            # (re-)arm the idle timer relative to now
            state.register_timer(state.now_ms() + self.timeout_ms)

    def on_timer(self, key: tuple, state: State, out: Emitter) -> None:
        self._fire(key, state, out, "timeout")


class CountEvictorProcessor(KeyedProcessor):
    """CountTrigger + Evictor(max_size), both evictor placements of
    TriggersAndEvictors.scala:242-290:

    - ``run_before=True`` (evictBefore): trim to the last ``max_size``
      elements, THEN the window function sees the trimmed buffer —
      cnt_in_fire = len(kept).
    - ``run_before=False`` (evictAfter): the window function sees the
      FULL buffer — cnt_in_fire = len(buf) — and eviction trims state
      only for the next firing.
    """

    def __init__(self, count: int, max_size: int, *, run_before: bool = True):
        self.count = count
        self.max_size = max_size
        self.run_before = run_before

    def on_element(self, key: tuple, row: dict, state: State, out: Emitter) -> None:
        buf = state.list_add("buf", 1)
        total = state.get("total", 0) + 1
        state.put("total", total)
        if total % self.count == 0:
            kept = buf[-self.max_size :]
            fire_seq = state.get("fires", 0) + 1
            state.put("fires", fire_seq)
            out.emit(
                key=str(key[0]),
                fire_seq=fire_seq,
                cnt_in_fire=len(kept) if self.run_before else len(buf),
                total_seen=total,
            )
            state.put("buf", kept)


def count_trigger(
    df: DataFrame,
    keys: list[str],
    count: int,
    *,
    purge: bool = False,
    order_by: str | None = None,
    event_time_col: str | None = None,
) -> DataFrame:
    """Count-trigger firing history.

    Two physical strategies for one logical operator (Spark's own
    batch/streaming split): streaming runs the stateful processor
    (incremental, state across micro-batches); batch uses the
    closed-form window-function plan — fire k-th time at row_number
    k*count, cumulative count = rn (purge: fresh count) — which stays
    in Catalyst and scales to full-history replay. Equivalence of the
    two paths is asserted in tests (same fixture through both).
    """
    if not df.isStreaming and order_by is not None:
        # banded per-key sequence — no single-task per-key sort when
        # the key is a low-cardinality categorical (r10-verdict shape)
        from flink_essentials_spark.functions.timeseries import banded_rank

        return (
            banded_rank(df, list(keys), order_by, [], rank_col="__rn")
            .filter((F.col("__rn") % count) == 0)
            .select(
                F.col(keys[0]).cast("string").alias("key"),
                (F.col("__rn") / count).cast("long").alias("fire_seq"),
                (F.lit(count) if purge else F.col("__rn")).cast("long").alias(
                    "cnt_in_fire"
                ),
                F.col("__rn").cast("long").alias("total_seen"),
            )
        )
    proc = CountTriggerProcessor(count, purge=purge)
    return keyed_process(
        df, keys, proc, COUNT_FIRE_SCHEMA,
        order_by=order_by, event_time_col=event_time_col,
        timeout="none", output_mode="append",
    )


def timed_out_count_trigger(
    df: DataFrame,
    keys: list[str],
    max_count: int,
    timeout_ms: int,
    *,
    order_by: str | None = None,
    event_time_col: str | None = None,
) -> DataFrame:
    proc = TimedOutCountTriggerProcessor(max_count, timeout_ms)
    return keyed_process(
        df, keys, proc, COUNT_FIRE_SCHEMA,
        order_by=order_by, event_time_col=event_time_col,
        timeout="processing" if df.isStreaming else "none",
        output_mode="append",
    )


def count_evictor(
    df: DataFrame,
    keys: list[str],
    count: int,
    max_size: int,
    *,
    order_by: str | None = None,
    run_before: bool = True,
) -> DataFrame:
    """Count trigger + keep-last-``max_size`` evictor, both placements
    (TriggersAndEvictors.scala:242-290 parameterizes evictBefore /
    evictAfter; see CountEvictorProcessor).

    Batch closed form from the buffer recurrence
    ``buf_k = count + min(max_size, buf_{k-1})``, which solves to
    ``buf_k = min(count + max_size, k·count)``:

    - run-before: cnt_in_fire = min(max_size, k·count)
    - run-after:  cnt_in_fire = min(count + max_size, k·count)
    """
    if not df.isStreaming and order_by is not None:
        from flink_essentials_spark.functions.timeseries import banded_rank

        fire_seq = (F.col("__rn") / count).cast("long")
        cap = max_size if run_before else count + max_size
        cnt = F.least(F.lit(cap).cast("long"), fire_seq * count)
        return (
            banded_rank(df, list(keys), order_by, [], rank_col="__rn")
            .filter((F.col("__rn") % count) == 0)
            .select(
                F.col(keys[0]).cast("string").alias("key"),
                fire_seq.alias("fire_seq"),
                cnt.cast("long").alias("cnt_in_fire"),
                F.col("__rn").cast("long").alias("total_seen"),
            )
        )
    proc = CountEvictorProcessor(count, max_size, run_before=run_before)
    return keyed_process(
        df, keys, proc, COUNT_FIRE_SCHEMA,
        order_by=order_by, timeout="none", output_mode="append",
    )
