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
        self.timer_ts: int | None = data.get("__timer__")
        self._dirty = False

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
        self.timer_ts = None
        self._dirty = True

    # -- timers (KeyedState.scala:472-528; processing-time W-T3)
    def register_timer(self, ts_ms: int) -> None:
        """Event-time timer in event-time mode; timeout duration target
        in processing-time mode."""
        self.timer_ts = ts_ms
        self._data["__timer__"] = ts_ms
        self._dirty = True

    def clear_timer(self) -> None:
        self.timer_ts = None
        self._data.pop("__timer__", None)
        self._dirty = True


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
) -> DataFrame:
    """Run a KeyedProcessor over a keyed (optionally streaming) frame.

    Streaming frames go through ``applyInPandasWithState`` (true keyed
    state + GroupStateTimeout timers). Batch frames replay each key's
    rows in ``order_by`` order through the same processor, simulating
    event-time timers deterministically.
    """
    if df.isStreaming:
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
            # fire-once semantics (mirrors _keyed_process_batch's
            # clear_timer-before-on_timer): a stale '__timer__' left in
            # state would re-arm every batch — ProcessingTimeTimeout
            # busy-loops a no-op timer forever, EventTimeTimeout calls
            # setTimeoutTimestamp at/behind the watermark and crashes.
            state.clear_timer()
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
        if not data and state.timer_ts is None:
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
                    group_state.setTimeoutTimestamp(state.timer_ts)
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
                # fire due event-time timers before this element
                while state.timer_ts is not None and state.timer_ts <= row_ms:
                    now_holder["ms"] = state.timer_ts
                    state.clear_timer()
                    processor.on_timer(key, state, out)
                now_holder["ms"] = row_ms
            processor.on_element(key, row, state, out)
        if state.timer_ts is not None:
            # end-of-input: watermark → ∞, pending timers fire
            now_holder["ms"] = state.timer_ts
            state.clear_timer()
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
