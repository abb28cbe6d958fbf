"""Multi-stream operators: union, window join, interval join, connect.

Reference semantics (HandlingMultipleStreams.scala):
- union: merge same-type streams, no order guarantee (:49-85)
- window join: equi-key pairs that fall in the SAME tumbling window (:87-129)
- interval join (keyed): θ-join on time proximity, b.time−lower < a.time
  < b.time+upper, bounds exclusive in the demo (:131-210, bounds :178-180)
- connect + CoProcess: two heterogeneous streams, one keyed operator,
  shared state (:212-286); CoMap/CoFlatMap stateless variants (:288-329)

Spark-first: all joins are DataFrame joins (stream-stream joins need
watermarks on both sides; time-interval join is the documented
Structured Streaming pattern). ``connect`` becomes tag+union into one
schema — the columnar encoding of a sum type — optionally followed by
a stateful keyed operator (operators/stateful.py).

Scale note: both window and interval joins shuffle once on the equi
key; the window/time predicate rides along as a post-shuffle filter
(or join key for the window bucket). Small-side joins should be
broadcast by the caller (F.broadcast) or AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def union_streams(*dfs: DataFrame) -> DataFrame:
    """Union same-schema streams by column name (J1)."""
    assert dfs, "need at least one stream"
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def window_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    window_size: str,
) -> DataFrame:
    """Pairs with equal keys in the same tumbling window (J2).

    Inner join on (key, window-bucket): the window expression is
    computed on each side BEFORE the join, so this is a plain equi-join
    — one shuffle per side on (key, window), no θ-predicate blow-up.
    Output: left.*, right.* (right key/ts deduped), window_start/end.
    """
    lw = left.withColumn("__w", F.window(left_ts, window_size))
    rw = right.withColumn("__w", F.window(right_ts, window_size))
    joined = lw.alias("l").join(
        rw.alias("r"),
        (F.col(f"l.{left_key}") == F.col(f"r.{right_key}"))
        & (F.col("l.__w") == F.col("r.__w")),
        "inner",
    )
    right_cols = [
        F.col(f"r.{c}").alias(f"r_{c}" if c in left.columns else c)
        for c in right.columns
    ]
    return joined.select(
        F.col("l.__w.start").alias("window_start"),
        F.col("l.__w.end").alias("window_end"),
        *[F.col(f"l.{c}") for c in left.columns],
        *right_cols,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "2 seconds",
    upper: str = "2 seconds",
    *,
    lower_exclusive: bool = True,
    upper_exclusive: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Keyed time-proximity join (J3): emit (a, b) where
    ``b.ts − lower (<|≤) a.ts (<|≤) b.ts + upper``.

    The reference demo uses exclusive bounds both sides
    (HandlingMultipleStreams.scala:178-180). Convention caveat: Flink's
    ``between(lowerBound, upperBound)`` is left-relative and signed —
    it constrains ``right.ts ∈ [left.ts+lower, left.ts+upper]`` (a lag
    is expressed as a negative lowerBound). This API instead takes two
    non-negative widths around the right timestamp, constraining
    ``left.ts ∈ (right.ts−lower, right.ts+upper)``. The two agree for
    symmetric bounds (the reference demo's ±2s); for asymmetric
    intervals, Flink's ``between(-a, b)`` is this function's
    ``lower=b, upper=a`` seen from the left side — i.e. the roles of
    the two widths swap when you change which side is the anchor.

    In streaming, both inputs
    must carry watermarks; the same expression then bounds state
    retention (Spark evicts join state past watermark+interval).
    ``how`` extends beyond the reference's inner join: left_outer /
    right_outer / full_outer are supported batch AND streaming — in
    streaming, unmatched rows emit only once the watermark passes their
    join window (they may stay pending at end-of-replay, the same
    no-more-data caveat as the last open window).
    """
    lo_op = "__gt__" if lower_exclusive else "__ge__"
    hi_op = "__lt__" if upper_exclusive else "__le__"
    l_ts = F.col(f"l.{left_ts}")
    r_ts = F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{left_key}") == F.col(f"r.{right_key}"))
        & getattr(l_ts, lo_op)(r_ts - F.expr(f"INTERVAL {lower}"))
        & getattr(l_ts, hi_op)(r_ts + F.expr(f"INTERVAL {upper}"))
    )
    return left.alias("l").join(right.alias("r"), cond, how)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    *,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` on the same key (a training-data staple:
    join events to the most recent dimension snapshot).
    ``direction="forward"`` flips the bound: the EARLIEST right row
    with ``right.ts >= left.ts`` (e.g. next price tick, next
    checkpoint) — same union+window plan over a descending time order.

    Scale-first plan: NOT an inequality join (which explodes into a
    per-key cross product). Tag both sides, union, then one window
    pass ordered by (ts, side) taking ``last(payload, ignorenulls)`` —
    a single hash shuffle on the key + per-partition sort, linear in
    rows. Right rows at exactly left.ts match (<= bound): side order
    puts right before left at equal ts.

    Output: left.* + payload_cols (NULL when no right row precedes;
    ``how='inner'`` drops those).

    Contract: ``payload_cols`` must be non-null on the right side —
    ``last(..., ignorenulls)`` carries each column independently, so a
    NULL inside a payload column would mix values from different right
    rows. Pre-aggregate or fill the right side first.

    Determinism: when multiple right rows share the same (key, ts), the
    carried payload is the one with the greatest ``xxhash64(payload)``
    — an arbitrary but stable total order, so results are identical
    run-to-run and partition-layout-independent. Pre-aggregate to
    unique (key, ts) if you need a semantically meaningful winner.
    """
    lt = left.select(
        F.lit(1).alias("__side"),
        F.col(left_key).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(0).cast("long").alias("__tb"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    rt = right.select(
        F.lit(0).alias("__side"),
        F.col(right_key).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.xxhash64(*[F.col(c) for c in payload_cols]).alias("__tb"),
        F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    from pyspark.sql import Window as W

    if direction == "backward":
        order = [F.asc("__ts"), F.asc("__side"), F.asc("__tb")]
    elif direction == "forward":
        # descending time: the nearest FOLLOWING right row is the last
        # non-null above; right (side 0) before left at equal ts keeps
        # the >= bound inclusive
        order = [F.desc("__ts"), F.asc("__side"), F.asc("__tb")]
    else:
        raise ValueError(f"unknown direction {direction!r}")
    w = (
        W.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "__side",
        "__l",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__p_{c}")
            for c in payload_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col("__l.*"), *[F.col(f"__p_{c}").alias(c) for c in payload_cols]
    )
    if how == "inner":
        out = out.filter(F.col(payload_cols[0]).isNotNull())
    return out


def connect(
    left: DataFrame,
    right: DataFrame,
    *,
    left_tag: str = "left",
    right_tag: str = "right",
    tag_col: str = "src",
) -> DataFrame:
    """ConnectedStreams analog (J4): tag + union into one schema.

    Columns present on only one side become NULL on the other — the
    flat encoding of the two-variant sum type. Follow with
    ``stateful.keyed_process`` for CoProcessFunction shared-state
    logic, or plain per-tag expressions for CoMap/CoFlatMap (J5).
    """
    l_cols = dict(zip(left.columns, left.schema.fields))
    r_cols = dict(zip(right.columns, right.schema.fields))
    all_cols = list(dict.fromkeys([*left.columns, *right.columns]))

    def pad(df: DataFrame, have: dict, tag: str) -> DataFrame:
        other = r_cols if tag == left_tag else l_cols
        sel = [F.lit(tag).alias(tag_col)]
        for c in all_cols:
            if c in have:
                sel.append(F.col(c))
            else:
                sel.append(F.lit(None).cast(other[c].dataType).alias(c))
        return df.select(*sel)

    return pad(left, l_cols, left_tag).unionByName(pad(right, r_cols, right_tag))


def co_map(
    left: DataFrame,
    right: DataFrame,
    left_exprs: list[Column],
    right_exprs: list[Column],
) -> DataFrame:
    """CoMapFunction (J5): per-stream map into a common output type,
    then union — semantically identical since CoMap shares no state
    (HandlingMultipleStreams.scala:288-329)."""
    return left.select(*left_exprs).unionByName(right.select(*right_exprs))


def co_flat_map(
    left: DataFrame,
    right: DataFrame,
    left_fn,
    right_fn,
) -> DataFrame:
    """CoFlatMapFunction (J5): per-stream 1→N expansion into a common
    output schema, then union (HandlingMultipleStreams.scala:288-329).
    Each ``fn: DataFrame -> DataFrame`` maps its side to the shared
    schema — use ``explode``/``posexplode`` (or transform.flat_map) for
    the 1→N part. CoFlatMap shares no state across the two streams, so
    map-each-then-union is semantically identical, and each side's
    expansion stays a narrow (shuffle-free) operation."""
    lo, ro = left_fn(left), right_fn(right)
    return lo.unionByName(ro)


def validity_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Change-log → SCD2 dimension: per key, each observed state gets a
    half-open validity interval ``[valid_from_ms, valid_to_ms)`` (NULL
    valid_to on the current state). This BUILDS the snapshot table
    that :func:`as_of_join` consumes — together they are the
    slowly-changing-dimension pattern of a feature/training pipeline.

    Requires unique (key, ts) rows — pre-aggregate the log first (same
    contract as as_of_join's right side). One hash shuffle on the key
    + per-partition sort; ``lead()`` is a frame-free window, so no
    buffering beyond the sort.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(key_col),
        *payload_cols,
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("valid_from_ms"),
    )
    return base.withColumn(
        "valid_to_ms",
        F.lead("valid_from_ms").over(
            W.partitionBy(key_col).orderBy("valid_from_ms")
        ),
    )
