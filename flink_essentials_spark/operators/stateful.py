"""Keyed stateful processing: the KeyedProcessFunction analog.

Reference semantics (KeyedState.scala): per-key ValueState/ListState/
MapState (:65-312), ``state.clear()`` (:314-318), TTL (:326-348), and
event-time timers via ``registerEventTimeTimer`` + ``onTimer``
(:472-528). Fault-tolerance contract: state is keyed, survives
restart, restored per key (:62-74).

Spark-first mapping: ``groupBy(keys).applyInPandasWithState`` — keyed
state in the checkpointed state store, Arrow-batched user code,
timeouts as the timer mechanism. One wrapper, two modes:

- streaming: true incremental processing; state persists across
  micro-batches; ``GroupStateTimeout`` provides processing-time and
  event-time timers. Caveat: with ProcessingTimeTimeout the engine
  keeps planning micro-batches to service timers, so drive such
  queries with a paced trigger and poll the sink —
  ``processAllAvailable`` never settles.
- batch replay: the same processor class run over each key's rows in
  timestamp order via ``applyInPandas`` — state lives for the single
  pass and event-time timers fire deterministically between elements.
  This is how golden tests pin down semantics (the reference leans on
  event-time replay determinism, TimeBasedTransformations.scala:180-209).

Scale note: state is partitioned by key hash across executors exactly
like the reference's keyed state; the number of concurrent keys per
executor is bounded by the shuffle partitioning, and Arrow batching
keeps the Python boundary amortized.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterable, Iterator
from dataclasses import dataclass
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

STATE_SCHEMA = StructType([StructField("blob", BinaryType(), True)])

_TTL_PREFIX = "__ttl__"


@dataclass
class TtlConfig:
    """StateTtlConfig analog (KeyedState.scala:326-348).

    ``update_on_write`` mirrors OnCreateAndWrite; ``return_expired``
    mirrors ReturnExpiredIfNotCleanedUp (value still readable until the
    cleanup touches it).
    """

    ttl_ms: int
    update_on_read: bool = False
    return_expired: bool = False


class State:
    """Dict-backed per-key state with Value/List/Map ergonomics + TTL.

    Value/List/Map distinctions in Flink are descriptor types; here
    they are access idioms over one pickled dict per key (a single
    state-store column) — simpler, same observable semantics.
    """

    def __init__(self, data: dict[str, Any], now_ms: Callable[[], int]):
        self._data = data
        self._now_ms = now_ms
        # timer registry: SORTED list of outstanding timestamps. One
        # legacy '__timer__' scalar (pre-r6 checkpoints) migrates in.
        legacy = data.pop("__timer__", None)
        self._timers: list[int] = data.setdefault("__timers__", [])
        if legacy is not None and legacy not in self._timers:
            self._timers.append(legacy)
            self._timers.sort()
        self._dirty = False

    @property
    def timer_ts(self) -> int | None:
        """Earliest outstanding timer (None if none) — what the
        streaming wrapper arms GroupStateTimeout with."""
        return self._timers[0] if self._timers else None

    def now_ms(self) -> int:
        """Current time: wall clock in streaming, event time in batch replay."""
        return self._now_ms()

    # -- ValueState (KeyedState.scala:65-148)
    def get(self, name: str, default: Any = None, ttl: TtlConfig | None = None) -> Any:
        if name not in self._data:
            return default
        if ttl is not None:
            written = self._data.get(_TTL_PREFIX + name, 0)
            if self._now_ms() - written > ttl.ttl_ms:
                if not ttl.return_expired:
                    self._data.pop(name, None)
                    self._data.pop(_TTL_PREFIX + name, None)
                    self._dirty = True
                    return default
            elif ttl.update_on_read:
                self._data[_TTL_PREFIX + name] = self._now_ms()
                self._dirty = True
        return self._data[name]

    def put(self, name: str, value: Any, ttl: TtlConfig | None = None) -> None:
        self._data[name] = value
        if ttl is not None:
            self._data[_TTL_PREFIX + name] = self._now_ms()
        self._dirty = True

    # -- ListState (KeyedState.scala:159-221)
    def list_add(self, name: str, value: Any) -> list:
        lst = self._data.setdefault(name, [])
        lst.append(value)
        self._dirty = True
        return lst

    def list_get(self, name: str) -> list:
        return self._data.get(name, [])

    # -- MapState (KeyedState.scala:225-312)
    def map_put(self, name: str, k: Any, v: Any) -> None:
        self._data.setdefault(name, {})[k] = v
        self._dirty = True

    def map_get(self, name: str, k: Any, default: Any = None) -> Any:
        return self._data.get(name, {}).get(k, default)

    def map_entries(self, name: str) -> dict:
        return self._data.get(name, {})

    # -- clear (KeyedState.scala:314-318)
    def clear(self) -> None:
        self._data.clear()
        self._timers = self._data.setdefault("__timers__", [])
        self._dirty = True

    # -- timers (KeyedState.scala:472-528): a real per-key REGISTRY —
    # many outstanding timestamps, one on_timer firing per timestamp,
    # matching Flink's registerEventTimeTimer/registerProcessingTimeTimer
    # contract (and the native TWS backend's handle.registerTimer).
    def register_timer(self, ts_ms: int) -> None:
        """REPLACE-all idiom (the single-logical-timer re-arm pattern
        every trigger processor uses); ``add_timer`` accumulates."""
        self._timers.clear()
        self._timers.append(int(ts_ms))
        self._dirty = True

    def add_timer(self, ts_ms: int) -> None:
        """Flink registerEventTimeTimer semantics: accumulate; firing
        order is timestamp order; duplicate registration is a no-op."""
        ts = int(ts_ms)
        if ts not in self._timers:
            self._timers.append(ts)
            self._timers.sort()
            self._dirty = True

    def delete_timer(self, ts_ms: int) -> None:
        try:
            self._timers.remove(int(ts_ms))
            self._dirty = True
        except ValueError:
            pass

    def clear_timer(self) -> None:
        self._timers.clear()
        self._dirty = True

    def _pop_earliest_due(self, now_ms: int | None = None) -> int | None:
        """Remove and return the earliest timer (if due); wrappers call
        this in a loop so each timestamp fires exactly once."""
        if not self._timers:
            return None
        if now_ms is not None and self._timers[0] > now_ms:
            return None
        self._dirty = True
        return self._timers.pop(0)

    def _is_empty(self) -> bool:
        """True when the key holds no user state and no timers — the
        wrapper may drop the state-store entry."""
        return not self._timers and all(
            k == "__timers__" for k in self._data
        )


class Emitter:
    """Collects output rows from processor callbacks."""

    def __init__(self) -> None:
        self.rows: list[dict[str, Any]] = []

    def emit(self, **row: Any) -> None:
        self.rows.append(row)


class KeyedProcessor:
    """Subclass and override; the KeyedProcessFunction analog.

    ``on_element`` runs once per record in per-key order;
    ``on_timer`` runs when a registered timer fires (streaming:
    GroupStateTimeout; batch replay: simulated between elements and at
    end-of-input for event-time timers).
    """

    def on_element(self, key: tuple, row: dict, state: State, out: Emitter) -> None:
        raise NotImplementedError

    def on_timer(self, key: tuple, state: State, out: Emitter) -> None:  # noqa: B027
        pass


def _load_state_dict(group_state) -> dict:
    if group_state.exists:
        (blob,) = group_state.get
        if blob is not None:
            return pickle.loads(bytes(blob))
    return {}


def keyed_process(
    df: DataFrame,
    keys: list[str],
    processor: KeyedProcessor,
    output_schema: str | StructType,
    *,
    order_by: str | None = None,
    timeout: str = "none",  # none | processing | event
    event_time_col: str | None = None,
    output_mode: str = "append",
    backend: str = "auto",  # auto | tws | apply_in_pandas_with_state
) -> DataFrame:
    """Run a KeyedProcessor over a keyed (optionally streaming) frame.

    Streaming backends (``backend``):

    - ``"tws"`` — PySpark 4.1's native ``transformWithStateInPandas``
      (operators/stateful_tws.py): per-name Value/List/Map state
      variables, declarative TTL, a real multi-timer registry. Needs
      the protobuf runtime; raises an actionable error without it.
    - ``"apply_in_pandas_with_state"`` — the emulation below: pickled
      state dict + GroupStateTimeout armed with the earliest entry of
      the same multi-timer registry. Runs on any PySpark >= 3.4.
    - ``"auto"`` (default) — tws when its runtime dependency is
      present, else the emulation. This image lacks protobuf (see
      stateful_tws module docstring), so auto resolves to the
      emulation here; both backends present the identical State
      surface to the processor.

    Batch frames replay each key's rows in ``order_by`` order through
    the same processor, simulating event-time timers deterministically.
    """
    if df.isStreaming:
        if backend != "apply_in_pandas_with_state":
            from flink_essentials_spark.operators.stateful_tws import (
                keyed_process_tws,
                tws_available,
            )

            if backend == "tws" or tws_available():
                return keyed_process_tws(
                    df, keys, processor, output_schema,
                    timeout=timeout, event_time_col=event_time_col,
                    output_mode=output_mode,
                )
        return _keyed_process_streaming(
            df, keys, processor, output_schema, timeout, event_time_col, output_mode
        )
    return _keyed_process_batch(
        df, keys, processor, output_schema, order_by, event_time_col
    )


def _keyed_process_streaming(
    df: DataFrame,
    keys: list[str],
    processor: KeyedProcessor,
    output_schema: str | StructType,
    timeout: str,
    event_time_col: str | None,
    output_mode: str,
):
    timeout_conf = {
        "none": "NoTimeout",
        "processing": "ProcessingTimeTimeout",
        "event": "EventTimeTimeout",
    }[timeout]

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], group_state) -> Iterator[pd.DataFrame]:
        import time as _time

        data = _load_state_dict(group_state)
        state = State(data, now_ms=lambda: int(_time.time() * 1000))
        out = Emitter()
        if group_state.hasTimedOut:
            # GroupStateTimeout is armed with the EARLIEST registry
            # entry; when it fires, every timer due against the time
            # domain fires exactly once (pop-before-fire, mirroring
            # _keyed_process_batch) — a stale entry left in state
            # would re-arm every batch: ProcessingTimeTimeout
            # busy-loops a no-op timer forever, EventTimeTimeout calls
            # setTimeoutTimestamp at/behind the watermark and crashes.
            domain_now = (
                group_state.getCurrentWatermarkMs()
                if timeout == "event"
                else group_state.getCurrentProcessingTimeMs()
            )
            fired_any = False
            while state._pop_earliest_due(domain_now) is not None:
                fired_any = True
                processor.on_timer(key, state, out)
            if not fired_any and state._pop_earliest_due(None) is not None:
                # the engine says the armed timeout expired even though
                # the domain clock reads behind the target (batch
                # timestamps lag wall time) — honor it once rather
                # than re-arm a livelock
                processor.on_timer(key, state, out)
        else:
            # applyInPandasWithState may split one key's micro-batch
            # across chunks (maxRecordsPerBatch); concatenate before
            # sorting so on_element order is event-time order for the
            # whole batch, not per-chunk.
            chunks = list(pdfs)
            if chunks:
                pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
                if event_time_col is not None:
                    pdf = pdf.sort_values(event_time_col)
                for row in pdf.to_dict("records"):
                    processor.on_element(key, row, state, out)
        if state._is_empty():
            group_state.remove()
        else:
            group_state.update((pickle.dumps(data),))
            if state.timer_ts is not None:
                if timeout == "processing":
                    # a target already in the past still needs a valid
                    # (strictly positive) duration — fire next batch
                    group_state.setTimeoutDuration(
                        max(1, state.timer_ts - int(_time.time() * 1000))
                    )
                elif timeout == "event":
                    # a timer a processor registered at/behind the
                    # current watermark must still be armable — clamp
                    # one ms past it (fires next batch)
                    group_state.setTimeoutTimestamp(
                        max(
                            state.timer_ts,
                            group_state.getCurrentWatermarkMs() + 1,
                        )
                    )
        if out.rows:
            yield pd.DataFrame(out.rows)

    return df.groupBy(*keys).applyInPandasWithState(
        fn, output_schema, STATE_SCHEMA, output_mode, timeout_conf
    )


def _keyed_process_batch(
    df: DataFrame,
    keys: list[str],
    processor: KeyedProcessor,
    output_schema: str | StructType,
    order_by: str | None,
    event_time_col: str | None,
):
    ts_col = event_time_col or order_by

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if order_by is not None:
            pdf = pdf.sort_values(order_by, kind="stable")
        key = tuple(pdf.iloc[0][k] for k in keys)
        now_holder = {"ms": 0}
        data: dict[str, Any] = {}
        state = State(data, now_ms=lambda: now_holder["ms"])
        out = Emitter()
        for row in pdf.to_dict("records"):
            if ts_col is not None:
                row_ms = _to_ms(row[ts_col])
                # fire due event-time timers before this element —
                # each registered timestamp fires exactly once, in
                # timestamp order (pop-before-fire)
                while True:
                    fired = state._pop_earliest_due(row_ms)
                    if fired is None:
                        break
                    now_holder["ms"] = fired
                    processor.on_timer(key, state, out)
                now_holder["ms"] = row_ms
            processor.on_element(key, row, state, out)
        while True:
            # end-of-input: watermark → ∞, all pending timers fire
            fired = state._pop_earliest_due(None)
            if fired is None:
                break
            now_holder["ms"] = fired
            processor.on_timer(key, state, out)
        if not out.rows:
            return pd.DataFrame(columns=_schema_names(output_schema))
        return pd.DataFrame(out.rows)

    return df.groupBy(*keys).applyInPandas(fn, schema=output_schema)


def _to_ms(v: Any) -> int:
    if isinstance(v, pd.Timestamp):
        return v.value // 1_000_000
    if hasattr(v, "timestamp"):
        return int(v.timestamp() * 1000)
    return int(v)


def _schema_names(schema: str | StructType) -> list[str]:
    if isinstance(schema, StructType):
        return schema.names
    return [part.strip().split()[0] for part in str(schema).split(",")]


# ---------------------------------------------------------------------------
# Declarative equivalents: when the stateful logic is a pure aggregate,
# stay in Catalyst (the reference's own ValueState counter and MapState
# per-type counters ARE pure aggregates — KeyedState.scala:107-116,
# :386-470).
# ---------------------------------------------------------------------------


def running_count(df: DataFrame, keys: Iterable[str]) -> DataFrame:
    """ValueState event counter (KeyedState.scala:65-148) as an agg.

    Streaming: use output mode ``update`` for per-batch emission.
    """
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


class RunningCountProcessor(KeyedProcessor):
    """Minimal per-key stateful counter: emits (key, cum) for every
    element, cum = that key's running element count. The output
    multiset per key is {1..n_key} REGARDLESS of how the stream is
    micro-batched or ordered — which is what makes it the
    THROUGHPUT bench processor (queries.catalog
    q_streaming_state_throughput): zero algorithmic work, so its
    wall-clock is purely the stateful-path cost (state round-trip per
    key per batch + per-row python) at a pinned key count × batch
    count, the denominator any state-store/backend comparison (TWS vs
    applyInPandasWithState) needs."""

    def on_element(self, key, row, state, out):
        c = (state.get("c") or 0) + 1
        state.put("c", c)
        out.emit(key=key[0], cum=c)
