"""Fluent Stream API: full pipelines through the public surface only."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from flink_essentials_spark import fixtures
from flink_essentials_spark.api import Stream
from flink_essentials_spark.operators.windows import session, tumbling
from flink_essentials_spark.schemas import SERVER_EVENT_SCHEMA


def test_fluent_windowed_pipeline_matches_golden(spark):
    """from_collection → filter → key_by → window → count == the
    reference's keyed tumbling analysis (7 results)."""
    rows = [tuple(r) for r in fixtures.starcraft_events(spark).collect()]
    out = (
        Stream.from_collection(spark, rows, SERVER_EVENT_SCHEMA)
        .key_by("event_type")
        .window(tumbling("event_time", "3 seconds"))
        .count()
        .collect()
    )
    assert len(out) == fixtures.KEYED_TUMBLING_3S_RESULT_COUNT


def test_fluent_session_pipeline(spark):
    rows = [tuple(r) for r in fixtures.starcraft_events(spark).collect()]
    sessions = (
        Stream.from_collection(spark, rows, SERVER_EVENT_SCHEMA)
        .key_by("nickname")
        .window(session("event_time", "2 seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
        .df.groupBy("nickname")
        .count()
    )
    got = {r["nickname"]: r["count"] for r in sessions.collect()}
    assert got == fixtures.SESSION_2S_COUNTS_BY_NICK


def test_fluent_interval_join_and_partitioning(spark):
    carts = Stream(fixtures.shopping_cart_events(spark, 10)).partition_by(
        "user_id", num_partitions=4
    )
    views = Stream(fixtures.catalog_events(spark, 10))
    out = carts.interval_join(
        views, "user_id", "user_id", "time", "time", "2 seconds", "2 seconds"
    )
    assert out.df.count() > 0


def test_fluent_as_of_join(spark):
    left = Stream(fixtures.shopping_cart_events(spark, 10))
    right = Stream(
        fixtures.catalog_events(spark, 10).select(
            "user_id", "time", F.col("product_id").alias("last_viewed")
        )
    )
    out = left.as_of_join(
        right, "user_id", "user_id", "time", "time", ["last_viewed"]
    ).df
    rows = out.collect()
    assert rows and set(out.columns) >= {"user_id", "sku", "last_viewed"}


def test_fluent_sink_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out")
    s = Stream.from_sequence(spark, 1, 50)
    from flink_essentials_spark.sinks.sinks import write_csv

    write_csv(s.df, path, single_file=True)
    import glob

    files = glob.glob(path + "/part-*")
    assert len(files) == 1  # sink parallelism 1 → single file (K2)
    back = spark.read.csv(path).count()
    assert back == 50


def test_fluent_streaming_pipeline(spark, tmp_path):
    """Stream API end-to-end on the streaming path: file replay →
    event time → keyed window agg → memory sink."""
    ev = fixtures.starcraft_events(spark)
    d = str(tmp_path / "replay")
    ev.coalesce(1).write.parquet(d)
    out = (
        Stream.from_file_replay(spark, d, SERVER_EVENT_SCHEMA)
        .with_event_time("event_time", "500 milliseconds")
        .key_by("event_type")
        .window(tumbling("event_time", "3 seconds"))
        .count()
        .run_to_memory(spark, "fluent_stream", output_mode="complete")
    )
    assert out.count() == fixtures.KEYED_TUMBLING_3S_RESULT_COUNT


def test_write_text_single_file(spark, tmp_path):
    from flink_essentials_spark.sinks.sinks import write_text

    path = str(tmp_path / "txt")
    df = Stream.from_elements(spark, "a", "b", "c").df
    write_text(df, path, single_file=True)
    import glob

    assert len(glob.glob(path + "/part-*")) == 1
    assert sorted(r["value"] for r in spark.read.text(path).collect()) == ["a", "b", "c"]


def test_driver_entry_contract(spark):
    """__spark_entry__.entry/queries/oracle_sql: the driver's smoke gate."""
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() > 0
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert len(qs) >= 49
    assert set(oracles) <= set(qs)


def test_sql_interface_over_registered_views(spark):
    """The pure-SQL entry point: register the tables as views and run
    ANSI SQL through spark.sql — Catalyst treats it identically to the
    DataFrame plans (same optimized query)."""
    from flink_essentials_spark.tables import register_views

    register_views(spark, "/root/testdata/sf0.001")
    out = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem WHERE l_quantity < 10
        GROUP BY l_returnflag
        """
    ).collect()
    assert out and all(r["n"] > 0 for r in out)


def test_generator_sources_shapes(spark):
    """Rate-backed deterministic generators (S5/S6): schema parity with
    the batch fixtures; every field a pure function of the counter."""
    from flink_essentials_spark.sources.streaming import (
        catalog_source,
        shopping_cart_source,
    )

    cart = shopping_cart_source(spark, 10, generate_removed=True)
    assert cart.isStreaming
    assert [f.name for f in cart.schema.fields] == [
        "event_type", "user_id", "sku", "quantity", "time",
    ]
    cat = catalog_source(spark, 10)
    assert cat.isStreaming
    assert [f.name for f in cat.schema.fields] == ["user_id", "time", "product_id"]


def test_observed_batch_metrics_free_of_extra_pass(spark):
    from pyspark.sql import functions as F

    from flink_essentials_spark.metrics import observed

    df = spark.range(0, 1000).select(
        F.col("id"), F.when(F.col("id") % 100 == 0, None).otherwise(F.col("id")).alias("k")
    )
    df2, obs = observed(
        df,
        n_rows=F.count(F.lit(1)),
        null_keys=F.sum(F.col("k").isNull().cast("long")),
    )
    assert df2.count() == 1000
    got = obs.get
    assert got == {"n_rows": 1000, "null_keys": 10}


def test_observed_stream_metrics_per_batch(spark, tmp_path):
    import os
    import uuid

    from pyspark.sql import functions as F

    from flink_essentials_spark.metrics import observed_stream
    from flink_essentials_spark.sources.streaming import file_replay

    d = tmp_path / "obs"
    d.mkdir()
    for i in range(2):
        sub = str(tmp_path / f"s{i}")
        spark.range(i * 10, i * 10 + 10).selectExpr("id AS v").coalesce(
            1
        ).write.parquet(sub)
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                dst = str(d / f"{i:04d}.parquet")
                os.rename(os.path.join(sub, f), dst)
                os.utime(dst, (2000 + i, 2000 + i))
    stream = observed_stream(
        file_replay(spark, str(d), "v long", files_per_trigger=1),
        "quality",
        n_rows=F.count(F.lit(1)),
        max_v=F.max("v"),
    )
    name = "obs_" + uuid.uuid4().hex[:8]
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    per_batch = [
        p["observedMetrics"]["quality"]
        for p in (q.recentProgress or [])
        if p.get("observedMetrics", {}).get("quality")
    ]
    q.stop()
    assert {(m["n_rows"], m["max_v"]) for m in per_batch} == {(10, 9), (10, 19)}
