"""Deterministic test fixtures ported from the reference repo.

These are DATA (timestamps, nicknames, expected counts), not code: the
reference derives expected window outputs by hand in comments and we
assert the same numbers as golden tests (reference Windows.scala:49-65
fixture; expected outputs at Windows.scala:101-111, 249-287, 340-345).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from flink_essentials_spark.schemas import (
    CATALOG_EVENT_SCHEMA,
    LINES_SCHEMA,
    SERVER_EVENT_SCHEMA,
    SHOPPING_CART_EVENT_SCHEMA,
)

START_TIME = dt.datetime(2022, 2, 2, 0, 0, 0)  # 2022-02-02T00:00:00Z (UTC)

# Deterministic stand-ins for the reference's random player UUIDs
# (identity only matters via the entity_id key).
_PLAYERS = {
    "bob": "00000000-0000-0000-0000-000000000001",
    "sam": "00000000-0000-0000-0000-000000000002",
    "rob": "00000000-0000-0000-0000-000000000003",
    "alice": "00000000-0000-0000-0000-000000000004",
    "mary": "00000000-0000-0000-0000-000000000005",
    "carl": "00000000-0000-0000-0000-000000000006",
}

# (nickname, event_type, offset_seconds) — reference Windows.scala:52-65
_STARCRAFT_EVENTS = [
    ("bob", "PlayerRegistered", 2),
    ("bob", "PlayerOnline", 2),
    ("sam", "PlayerRegistered", 3),
    ("sam", "PlayerOnline", 4),
    ("rob", "PlayerRegistered", 4),
    ("alice", "PlayerRegistered", 4),
    ("mary", "PlayerRegistered", 6),
    ("mary", "PlayerOnline", 6),
    ("carl", "PlayerRegistered", 8),
    ("rob", "PlayerOnline", 10),
    ("alice", "PlayerOnline", 10),
    ("carl", "PlayerOnline", 11),
]

# Golden expectations, from the reference's own comment-derived analysis:
TUMBLING_3S_REGISTRATION_COUNTS = [1, 3, 2, 0]  # Windows.scala:101-111
SLIDING_3S_1S_REGISTRATION_COUNTS = [1, 2, 4, 3, 3, 1, 2, 1, 1, 0]  # :249-287
SESSION_2S_COUNTS_BY_NICK = {  # Windows.scala:340-345
    "bob": 1,
    "sam": 1,
    "mary": 1,
    "rob": 2,
    "alice": 2,
    "carl": 2,
}
KEYED_TUMBLING_3S_RESULT_COUNT = 7  # Windows.scala:204-241


def starcraft_events(spark: SparkSession) -> DataFrame:
    """The 12-event windowing fixture (reference Windows.scala:49-65)."""
    rows = []
    for nick, etype, offset in _STARCRAFT_EVENTS:
        pid = _PLAYERS[nick]
        rows.append(
            (
                START_TIME + dt.timedelta(seconds=offset),
                etype,
                pid,
                nick,
                None,
                None,
                None,
                None,
                None,
                f"player|{pid}|{nick}",
            )
        )
    return spark.createDataFrame(rows, SERVER_EVENT_SCHEMA)


# ---------------------------------------------------------------------------
# Shopping-cart / catalog event generators, deterministic batch form.
# The reference generates these from a SourceFunction with sleeps
# (ShoppingCartEventsGenerator.scala:43-83, 104-123); our deterministic
# replay variant pre-generates rows (event time = base + id seconds,
# same shape) for file-replay streaming tests and batch parity tests.
# ---------------------------------------------------------------------------

_CART_USERS = ["Bob", "Alice", "Sam", "Tom", "Rob"]  # reference :159


def _sku(i: int, prefix: str = "") -> str:
    return f"{prefix}{i:08d}-0000-0000-0000-000000000000"


def shopping_cart_events(
    spark: SparkSession,
    n: int = 100,
    *,
    generate_removed: bool = False,
    sku_prefix: str = "",
    base_time: dt.datetime = START_TIME,
) -> DataFrame:
    """Deterministic AddToShoppingCart/RemovedFromShoppingCart stream.

    Mirrors the observable shape of the reference generator
    (ShoppingCartEventsGenerator.scala:63-76): user from a fixed pool,
    quantity 0..9, event time monotonically increasing one second per id.
    """
    rows = []
    for i in range(n):
        etype = (
            "RemovedFromShoppingCartEvent"
            if generate_removed and i % 3 == 2
            else "AddToShoppingCartEvent"
        )
        rows.append(
            (
                etype,
                _CART_USERS[i % len(_CART_USERS)],
                _sku(i, sku_prefix),
                i % 10,
                base_time + dt.timedelta(seconds=i),
            )
        )
    return spark.createDataFrame(rows, SHOPPING_CART_EVENT_SCHEMA)


def catalog_events(
    spark: SparkSession, n: int = 100, *, base_time: dt.datetime = START_TIME
) -> DataFrame:
    """Deterministic ProductDetailsViewed stream (reference :166-191)."""
    rows = [
        (
            _CART_USERS[(i + 1) % len(_CART_USERS)],
            base_time + dt.timedelta(seconds=i),
            _sku(10_000 + i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, CATALOG_EVENT_SCHEMA)


# --- Word-count lines (reference Playground.scala:13-15) --------------------
WORDCOUNT_LINES = [
    "To be, or not to be: that is the question:",
    "Whether 'tis nobler in the mind to suffer",
    "The slings and arrows of outrageous fortune,",
    "Or to take arms against a sea of troubles,",
]


def wordcount_lines(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(s,) for s in WORDCOUNT_LINES], LINES_SCHEMA)
