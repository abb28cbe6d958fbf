"""Multi-stream operator goldens (reference HandlingMultipleStreams.scala)
on the deterministic cart/catalog fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_essentials_spark import fixtures
from flink_essentials_spark.operators import joins


def test_union_merges_streams(spark):
    a = fixtures.shopping_cart_events(spark, 10, sku_prefix="a-")
    b = fixtures.shopping_cart_events(spark, 7, sku_prefix="b-")
    out = joins.union_streams(a, b)
    assert out.count() == 17
    assert out.schema == a.schema


def test_window_join_same_bucket_pairs(spark):
    """J2: cart × catalog pairs with same user in the same 10 s window."""
    carts = fixtures.shopping_cart_events(spark, 20)
    views = fixtures.catalog_events(spark, 20)
    out = joins.window_join(
        carts, views, "user_id", "user_id", "time", "time", "10 seconds"
    )
    # independent check: brute-force over collected rows
    cs = carts.collect()
    vs = views.collect()
    bucket = lambda t: int(t.timestamp()) // 10
    expected = sum(
        1
        for c in cs
        for v in vs
        if c["user_id"] == v["user_id"] and bucket(c["time"]) == bucket(v["time"])
    )
    assert out.count() == expected > 0


def test_interval_join_bounds_exclusive(spark):
    """J3 golden (HandlingMultipleStreams.scala:178-180): exclusive
    ±2 s bounds; verified against a brute-force θ-join."""
    carts = fixtures.shopping_cart_events(spark, 15)
    views = fixtures.catalog_events(spark, 15)
    out = joins.interval_join(
        carts, views, "user_id", "user_id", "time", "time",
        "2 seconds", "2 seconds",
    )
    cs, vs = carts.collect(), views.collect()
    two = dt.timedelta(seconds=2)
    expected = sum(
        1
        for c in cs
        for v in vs
        if c["user_id"] == v["user_id"]
        and v["time"] - two < c["time"] < v["time"] + two
    )
    assert out.count() == expected > 0
    # inclusive bounds, against its own brute-force oracle (the fixture
    # has no pair exactly on the ±2 s boundary, so craft one: shift one
    # view to land exactly 2 s after a matching cart event)
    shifted = views.withColumn("time", F.col("time") + F.expr("INTERVAL 3 seconds"))
    excl = joins.interval_join(
        carts, shifted, "user_id", "user_id", "time", "time",
        "2 seconds", "2 seconds",
    ).count()
    incl = joins.interval_join(
        carts, shifted, "user_id", "user_id", "time", "time",
        "2 seconds", "2 seconds", lower_exclusive=False, upper_exclusive=False,
    ).count()
    cs2 = carts.collect()
    vs2 = shifted.collect()
    expected_excl = sum(
        1 for c in cs2 for v in vs2
        if c["user_id"] == v["user_id"] and v["time"] - two < c["time"] < v["time"] + two
    )
    expected_incl = sum(
        1 for c in cs2 for v in vs2
        if c["user_id"] == v["user_id"]
        and v["time"] - two <= c["time"] <= v["time"] + two
    )
    assert excl == expected_excl
    assert incl == expected_incl
    assert incl > excl  # boundary pairs exist by construction


def test_interval_join_left_outer(spark):
    """Outer extension of J3: every left row appears; unmatched ones
    carry NULL right columns."""
    carts = fixtures.shopping_cart_events(spark, 15)
    views = fixtures.catalog_events(spark, 4)  # few right rows → unmatched lefts
    out = joins.interval_join(
        carts, views, "user_id", "user_id", "time", "time",
        "2 seconds", "2 seconds", how="left_outer",
    )
    rows = out.select(
        F.col("l.sku").alias("sku"), F.col("r.product_id").alias("product_id")
    ).collect()
    assert len({r["sku"] for r in rows}) == 15  # all left rows present
    assert any(r["product_id"] is None for r in rows)
    inner = joins.interval_join(
        carts, views, "user_id", "user_id", "time", "time",
        "2 seconds", "2 seconds",
    ).count()
    assert sum(1 for r in rows if r["product_id"] is not None) == inner


def test_connect_tags_and_pads_schemas(spark):
    """J4: heterogeneous streams → one tagged schema, NULL-padded."""
    carts = fixtures.shopping_cart_events(spark, 5)
    views = fixtures.catalog_events(spark, 3)
    out = joins.connect(carts, views, left_tag="cart", right_tag="view")
    assert out.count() == 8
    by_tag = {r["src"]: r for r in out.collect()}
    assert by_tag["cart"]["sku"] is not None and by_tag["view"]["sku"] is None
    assert by_tag["view"]["product_id"] is not None
    assert set(out.columns) == {"src", *carts.columns, *views.columns}


def test_co_map_common_output(spark):
    """J5: per-stream map to a common type, then union."""
    carts = fixtures.shopping_cart_events(spark, 5)
    views = fixtures.catalog_events(spark, 3)
    out = joins.co_map(
        carts, views,
        [F.concat(F.lit("cart of "), "user_id").alias("desc")],
        [F.concat(F.lit("view by "), "user_id").alias("desc")],
    )
    descs = [r["desc"] for r in out.collect()]
    assert len(descs) == 8
    assert any(d.startswith("cart of ") for d in descs)
    assert any(d.startswith("view by ") for d in descs)


def test_co_flat_map_one_to_n(spark):
    """J5 flatMap form: per-stream 1→N expansion to a common schema,
    then union (HandlingMultipleStreams.scala:288-329)."""
    carts = fixtures.shopping_cart_events(spark, 5)
    views = fixtures.catalog_events(spark, 3)
    out = joins.co_flat_map(
        carts,
        views,
        lambda d: d.select(F.explode(F.split("sku", "-")).alias("tok")),
        lambda d: d.select(F.col("product_id").alias("tok")),
    )
    toks = [r["tok"] for r in out.collect()]
    assert len(toks) == 5 * 5 + 3  # each sku splits into 5 segments


def test_interval_join_asymmetric_bounds_convention(spark):
    """Pins the documented convention: lower/upper are widths around
    the RIGHT timestamp — left.ts ∈ (right.ts − lower, right.ts + upper)
    — which for asymmetric widths differs from Flink's signed
    left-relative between() (see interval_join docstring)."""
    left = spark.createDataFrame(
        [(i, "k", f"2022-02-02 00:00:{i:02d}") for i in range(30)],
        "lid long, k string, ts_s string",
    ).select("lid", "k", F.col("ts_s").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(100, "k", "2022-02-02 00:00:10")],
        "rid long, k string, ts_s string",
    ).select("rid", "k", F.col("ts_s").cast("timestamp").alias("rts"))
    out = joins.interval_join(
        left, right, "k", "k", "lts", "rts", "3 seconds", "8 seconds"
    ).select("lid").collect()
    # left.ts ∈ (10−3, 10+8) exclusive = seconds 8..17
    assert sorted(r["lid"] for r in out) == list(range(8, 18))


def test_as_of_join_deterministic_on_right_ts_ties(spark):
    """ADVICE fix pin: multiple right rows sharing (key, ts) carry a
    deterministic winner (greatest xxhash64 of the payload) — identical
    across runs AND partitionings."""
    left = spark.createDataFrame(
        [(1, "k", "2022-02-02 00:00:10")], "lid long, k string, ts_s string"
    ).select("lid", "k", F.col("ts_s").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(i, "k", "2022-02-02 00:00:05", f"payload_{i}") for i in range(20)],
        "rid long, k string, ts_s string, pv string",
    ).select("rid", "k", F.col("ts_s").cast("timestamp").alias("rts"), "pv")

    def run(r):
        rows = joins.as_of_join(
            left, r, "k", "k", "lts", "rts", payload_cols=["pv"]
        ).collect()
        assert len(rows) == 1
        return rows[0]["pv"]

    first = run(right)
    for variant in (right.repartition(7), right.orderBy(F.desc("rid")), right):
        assert run(variant) == first


def test_as_of_join_forward_matches_brute_force(spark):
    """Forward direction: each left row gets the EARLIEST right row at
    or after its ts (inclusive bound), NULL/dropped when none follows —
    verified against a python brute force on a random fixture."""
    import random

    rng = random.Random(7)
    lrows = [(i, rng.choice("ab"), rng.randint(0, 100)) for i in range(60)]
    rrows = [(100 + i, rng.choice("ab"), rng.randint(0, 100)) for i in range(25)]
    # unique (key, ts) on the right so the match is semantically unique
    seen = set()
    rrows = [r for r in rrows if not ((r[1], r[2]) in seen or seen.add((r[1], r[2])))]
    left = spark.createDataFrame(lrows, "lid long, k string, ts long").select(
        "lid", "k", F.timestamp_seconds("ts").alias("lts")
    )
    right = spark.createDataFrame(rrows, "rid long, k string, ts long").select(
        "rid", "k", F.timestamp_seconds("ts").alias("rts"), F.col("ts").alias("rv")
    )
    got = {
        r["lid"]: r["rv"]
        for r in joins.as_of_join(
            left, right, "k", "k", "lts", "rts", ["rv"],
            direction="forward", how="left",
        ).collect()
    }
    for lid, k, lts in lrows:
        following = [rv for _, rk, rv in rrows if rk == k and rv >= lts]
        exp = min(following) if following else None
        assert got[lid] == exp, (lid, k, lts)
    # equal-ts inclusivity, explicitly
    left1 = spark.createDataFrame([(1, "k", 50)], "lid long, k string, ts long").select(
        "lid", "k", F.timestamp_seconds("ts").alias("lts")
    )
    right1 = spark.createDataFrame([(2, "k", 50)], "rid long, k string, ts long").select(
        "rid", "k", F.timestamp_seconds("ts").alias("rts"), F.col("ts").alias("rv")
    )
    out = joins.as_of_join(
        left1, right1, "k", "k", "lts", "rts", ["rv"], direction="forward"
    ).collect()
    assert len(out) == 1 and out[0]["rv"] == 50
