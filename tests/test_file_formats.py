"""File-format source breadth: CSV / JSON-lines / text round-trips
through the public Stream API, and a JSON micro-batch replay through
the streaming path (file_replay fmt='json')."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_essentials_spark.api import Stream


def test_csv_round_trip(spark, tmp_path):
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    path = str(tmp_path / "csv")
    df.write.option("header", True).mode("overwrite").csv(path)
    back = Stream.from_csv(
        spark, path, "k long, v double", header=True
    ).df
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [
        (i, float(i * 2)) for i in range(50)
    ]


def test_json_round_trip(spark, tmp_path):
    df = spark.range(30).select(
        F.col("id").alias("k"),
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("name"),
        F.array(F.col("id"), F.col("id") + 1).alias("xs"),
    )
    path = str(tmp_path / "json")
    df.write.mode("overwrite").json(path)
    back = Stream.from_json(spark, path, "k long, name string, xs array<long>").df
    rows = {r["k"]: (r["name"], list(r["xs"])) for r in back.collect()}
    assert rows == {i: (f"doc-{i}", [i, i + 1]) for i in range(30)}


def test_text_source(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    got = sorted(
        r["value"] for r in Stream.from_text(spark, str(tmp_path)).df.collect()
    )
    assert got == ["alpha", "beta", "gamma"]


def test_json_file_replay_streams_per_batch(spark, tmp_path):
    """JSON-lines replayed as a stream: one file per micro-batch,
    final aggregated state equals the batch aggregate."""
    import uuid

    from flink_essentials_spark.sinks.sinks import run_to_memory
    from flink_essentials_spark.sources.streaming import file_replay

    d = tmp_path / "replay"
    d.mkdir()
    for i, mt in enumerate([(1, 100), (2, 200)]):
        f = d / f"part-{i}.json"
        with open(f, "w") as fh:
            for k in range(5):
                fh.write(json.dumps({"batch": i, "v": k}) + "\n")
        os.utime(f, (mt[1], mt[1]))  # strictly increasing mtimes
    stream = file_replay(
        spark, str(d), "batch int, v long", files_per_trigger=1, fmt="json"
    )
    out = run_to_memory(
        spark,
        stream.groupBy("batch").agg(F.sum("v").alias("s")),
        "jr_" + uuid.uuid4().hex[:8],
        output_mode="complete",
    )
    assert sorted((r["batch"], r["s"]) for r in out.collect()) == [(0, 10), (1, 10)]


def test_compact_files_preserves_content_and_hits_target(spark, tmp_path):
    """compact_files: content identical row-for-row (full-row hash sum),
    file count collapses to ceil(total/target), in-place rename keeps
    the directory path stable."""
    from flink_essentials_spark.sinks.sinks import compact_files

    path = str(tmp_path / "frag")
    # 40 tiny files (the streaming-sink fragmentation shape)
    spark.range(0, 4000).selectExpr(
        "id", "id * 7 AS v", "concat('row', id) AS s"
    ).repartition(40).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 30

    def content_sig(p):
        df = spark.read.parquet(p)
        return (
            df.count(),
            df.agg(
                F.sum(F.pmod(F.xxhash64("id", "v", "s"), F.lit(2**31))).alias("h")
            ).first()["h"],
        )

    before = content_sig(path)
    total = sum(
        os.stat(os.path.join(path, f)).st_size
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    stats = compact_files(spark, path, target_bytes=total // 4 + 1)
    assert content_sig(path) == before
    assert stats["files_before"] == n_before
    assert stats["files_after"] == stats["target_files"] == 4
    import glob

    assert not glob.glob(path + ".precompact-*")


def test_compact_files_to_new_path(spark, tmp_path):
    from flink_essentials_spark.sinks.sinks import compact_files

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(0, 100).repartition(10).write.parquet(src)
    stats = compact_files(spark, src, target_bytes=10**12, out_path=dst)
    assert stats["files_after"] == 1
    assert spark.read.parquet(dst).count() == 100
    # source untouched
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 10


def test_compact_files_rejects_partitioned_layout(spark, tmp_path):
    from pyspark.sql import functions as F2

    from flink_essentials_spark.sinks.sinks import compact_files, write_partitioned

    path = str(tmp_path / "parted")
    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v")
    )
    write_partitioned(df, path, "k")
    import pytest

    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_files(spark, path, target_bytes=10**6)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC write→read preserves content, and a filter reaches the ORC
    scan as a pushed predicate (the format keeps the parquet path's
    pushdown property)."""
    from flink_essentials_spark.sources.batch import read_orc

    path = str(tmp_path / "orc")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("v")
    )
    df.write.orc(path)
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert (
        back.agg(F.sum("v").alias("s")).first()["s"]
        == df.agg(F.sum("v").alias("s")).first()["s"]
    )
    plan = back.filter(F.col("k") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "k" in plan.split("PushedFilters:")[1][:80]


def test_upsert_parquet_replaces_and_appends(spark, tmp_path):
    """Keyed merge: matched keys replaced with the update's values, new
    keys appended, untouched rows byte-identical, backup dir cleaned."""
    import glob

    from flink_essentials_spark.sinks.sinks import upsert_parquet

    path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v long"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "b2", 200), (4, "d", 40)], "k long, name string, v long"
    )
    stats = upsert_parquet(spark, path, updates, ["k"])
    assert stats == {
        "rows_before": 3,
        "rows_updated": 1,
        "rows_inserted": 1,
        "rows_after": 4,
    }
    got = {
        r["k"]: (r["name"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {1: ("a", 10), 2: ("b2", 200), 3: ("c", 30), 4: ("d", 40)}
    assert not glob.glob(path + ".preupsert-*")


def test_json_malformed_records_permissive_vs_failfast(spark, tmp_path):
    """Ingest robustness: PERMISSIVE mode quarantines malformed JSON
    lines into _corrupt_record instead of failing the scan; FAILFAST
    surfaces the bad line as an error — both behaviors a 100 TB ingest
    relies on (you cannot re-crawl a bad shard mid-job)."""
    import pytest

    p = tmp_path / "mixed.json"
    p.write_text(
        '{"k": 1, "v": "ok"}\n'
        "{not json at all\n"
        '{"k": 3, "v": "fine"}\n'
    )
    schema = "k long, v string, _corrupt_record string"
    good = spark.read.schema(schema).option("mode", "PERMISSIVE").json(
        str(p)
    )
    rows = good.collect()
    assert {r["k"] for r in rows if r["k"] is not None} == {1, 3}
    assert sum(r["_corrupt_record"] is not None for r in rows) == 1
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        spark.read.schema("k long, v string").option(
            "mode", "FAILFAST"
        ).json(str(p)).collect()


def test_streaming_cdc_apply_via_foreachbatch_upsert(spark, tmp_path):
    """CDC-apply: a stream of keyed updates merged into a parquet
    dimension per micro-batch (for_each_batch + upsert_parquet) —
    later batches override earlier ones, final state = sequential
    merge. The foreachBatch epoch id makes the apply idempotent per
    batch; mtime-ordered replay pins batch order."""
    import os

    from flink_essentials_spark.sinks.sinks import for_each_batch, upsert_parquet
    from flink_essentials_spark.sources.streaming import file_replay

    dim = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, v long"
    ).write.parquet(dim)

    replay = tmp_path / "updates"
    replay.mkdir()
    batches = [[(2, 21), (3, 30)], [(3, 31), (4, 40)]]
    for i, rows in enumerate(batches):
        sub = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, "k long, v long").coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                dst = str(replay / f"{i:04d}.parquet")
                os.rename(os.path.join(sub, f), dst)
                os.utime(dst, (1000 + i, 1000 + i))
    stream = file_replay(spark, str(replay), "k long, v long", files_per_trigger=1)
    q = for_each_batch(
        stream, lambda bdf, epoch: upsert_parquet(spark, dim, bdf, ["k"])
    )
    q.processAllAvailable()
    q.stop()
    got = {r["k"]: r["v"] for r in spark.read.parquet(dim).collect()}
    assert got == {1: 10, 2: 21, 3: 31, 4: 40}


def test_erase_keys_removes_all_matching_rows(spark, tmp_path):
    """Right-to-be-forgotten: every row for the erased keys is gone,
    everything else byte-identical, backup cleaned up."""
    import glob

    from flink_essentials_spark.sinks.sinks import erase_keys

    path = str(tmp_path / "events")
    spark.createDataFrame(
        [(u, i, f"payload-{u}-{i}") for u in range(5) for i in range(10)],
        "user_id long, seq long, payload string",
    ).write.parquet(path)
    to_erase = spark.createDataFrame([(1,), (3,)], "user_id long")
    stats = erase_keys(spark, path, to_erase, ["user_id"])
    assert stats == {"rows_before": 50, "rows_erased": 20, "rows_after": 30}
    back = spark.read.parquet(path)
    assert back.filter(F.col("user_id").isin(1, 3)).count() == 0
    assert back.count() == 30
    assert not glob.glob(path + ".preerase-*")


def test_versioned_store_snapshots_rollback_and_crash_safety(spark, tmp_path):
    """Versioned store: committed-pointer reads, time travel, instant
    rollback, vacuum retention — and crash safety: a fully-written but
    UNCOMMITTED version directory is invisible to readers."""
    import os

    import pytest

    from flink_essentials_spark.sinks import versioned as V

    base = str(tmp_path / "tbl")
    v1 = V.write_version(spark, base, spark.range(0, 10).selectExpr("id AS v"))
    v2 = V.write_version(spark, base, spark.range(0, 20).selectExpr("id AS v"))
    assert (v1, v2) == (1, 2)
    assert V.read_current(spark, base).count() == 20
    assert V.read_version(spark, base, 1).count() == 10  # time travel

    # crash simulation: data dir appears without a pointer commit
    spark.range(0, 99).selectExpr("id AS v").write.parquet(
        os.path.join(base, "v=3")
    )
    assert V.read_current(spark, base).count() == 20  # still v2
    # the next writer skips past the orphan (no overwrite of v=3)
    v4 = V.write_version(spark, base, spark.range(0, 5).selectExpr("id AS v"))
    assert v4 == 4 and V.read_current(spark, base).count() == 5

    V.rollback(base, 1)
    assert V.read_current(spark, base).count() == 10
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, base, 9)

    removed = V.vacuum(base, keep=1)
    # committed v1 must survive even though it is old
    assert 1 not in removed
    assert V.read_current(spark, base).count() == 10


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    """Two incremental refreshes must equal the one-shot aggregate over
    the concatenated history — for count, sum, min and max — and each
    refresh commits a readable snapshot (time-travelable)."""
    from flink_essentials_spark.functions.incremental import refresh_rollup
    from flink_essentials_spark.sinks import versioned as V

    base = str(tmp_path / "rollup")
    b1 = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 10)], "k string, v long"
    )
    b2 = spark.createDataFrame(
        [("a", 3), ("b", 2), ("c", 7)], "k string, v long"
    )
    aggs = {
        "n": ("count", None),
        "total": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    v1 = refresh_rollup(spark, base, b1, ["k"], aggs)
    v2 = refresh_rollup(spark, base, b2, ["k"], aggs)
    assert (v1, v2) == (1, 2)

    got = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in V.read_current(spark, base).collect()
    }
    full = b1.unionByName(b2)
    want = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in full.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want
    # snapshot 1 is still the batch-1-only rollup
    snap1 = {r["k"]: r["n"] for r in V.read_version(spark, base, 1).collect()}
    assert snap1 == {"a": 2, "b": 1}


def test_streaming_snapshot_ingestion_via_versioned_store(spark, tmp_path):
    """foreachBatch + versioned store: every micro-batch commits an
    immutable snapshot (running rollup), readers always see a complete
    committed version, and history stays time-travelable per batch."""
    import os

    from flink_essentials_spark.functions.incremental import refresh_rollup
    from flink_essentials_spark.sinks import versioned as V
    from flink_essentials_spark.sinks.sinks import for_each_batch
    from flink_essentials_spark.sources.streaming import file_replay

    base = str(tmp_path / "snap")
    replay = tmp_path / "in"
    replay.mkdir()
    batches = [[("a", 1), ("b", 2)], [("a", 10), ("c", 3)]]
    for i, rows in enumerate(batches):
        sub = str(tmp_path / f"s{i}")
        spark.createDataFrame(rows, "k string, v long").coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                dst = str(replay / f"{i:04d}.parquet")
                os.rename(os.path.join(sub, f), dst)
                os.utime(dst, (3000 + i, 3000 + i))
    stream = file_replay(spark, str(replay), "k string, v long", files_per_trigger=1)
    aggs = {"n": ("count", None), "total": ("sum", "v")}
    q = for_each_batch(
        stream, lambda bdf, epoch: refresh_rollup(spark, base, bdf, ["k"], aggs)
    )
    q.processAllAvailable()
    q.stop()
    assert V.list_versions(base) == [1, 2]
    cur = {r["k"]: (r["n"], r["total"]) for r in V.read_current(spark, base).collect()}
    assert cur == {"a": (2, 11), "b": (1, 2), "c": (1, 3)}
    snap1 = {r["k"]: (r["n"], r["total"]) for r in V.read_version(spark, base, 1).collect()}
    assert snap1 == {"a": (1, 1), "b": (1, 2)}
