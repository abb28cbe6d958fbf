"""Schema-drift hardening for the testdata load path.

Round 2 lost ALL driver signal to one silent physical-type change
(events.ts: int64 TIMESTAMP(NANOS) -> timestamp[us]). These tests pin:

1. load_tables normalizes events.ts to identical epoch-ms values for
   every physical encoding the driver has emitted (or could): int64
   nanos, timestamp[us] naive (-> TIMESTAMP_NTZ), timestamp[us] UTC
   (-> TIMESTAMP).
2. An unsupported ts type, a missing column, and a wrong-kinded column
   each fail at load with ONE actionable TableSchemaError naming the
   table/column/type -- not a confusing AnalysisException downstream.
"""

from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flink_essentials_spark.tables import (
    TABLE_NAMES,
    TableSchemaError,
    load_tables,
)

SF_SRC = "/root/testdata/sf0.001"

# Three instants with sub-ms-distinct micros to prove truncation parity.
_EPOCH_US = [1_700_000_000_123_456, 1_700_000_111_000_001, 1_700_086_400_999_999]
_EXPECTED_MS = [us // 1000 for us in _EPOCH_US]


def _synth_sf_dir(tmp_path, events_table: pa.Table, name: str) -> str:
    """Build an sf dir: symlink the 9 real tables, write custom events."""
    d = tmp_path / name
    d.mkdir()
    for t in TABLE_NAMES:
        if t == "events":
            continue
        os.symlink(os.path.join(SF_SRC, f"{t}.parquet"), d / f"{t}.parquet")
    pq.write_table(events_table, d / "events.parquet")
    return str(d)


def _events_arrays(ts_array: pa.Array) -> pa.Table:
    n = len(ts_array)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


def _loaded_epoch_ms(spark, sf_dir: str) -> list[int]:
    df = load_tables(spark, sf_dir)["events"]
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    rows = (
        df.orderBy("event_id")
        .select((F.unix_micros("ts") / 1000).cast("long").alias("ms"))
        .collect()
    )
    return [r.ms for r in rows]


@pytest.mark.parametrize(
    "arrow_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["int64-nanos", "us-naive-ntz", "us-utc"],
)
def test_event_ts_normalizes_across_physical_types(spark, tmp_path, arrow_type):
    if arrow_type.unit == "ns":
        vals = pa.array([us * 1000 for us in _EPOCH_US], arrow_type)
    else:
        vals = pa.array(_EPOCH_US, pa.timestamp("us")).cast(arrow_type)
    sf_dir = _synth_sf_dir(tmp_path, _events_arrays(vals), f"sf-{arrow_type.unit}-{arrow_type.tz}")
    assert _loaded_epoch_ms(spark, sf_dir) == _EXPECTED_MS


def test_unsupported_ts_type_raises_actionable(spark, tmp_path):
    bad = _events_arrays(pa.array(["2024-01-01"] * 3))  # string ts
    sf_dir = _synth_sf_dir(tmp_path, bad, "sf-bad-ts")
    with pytest.raises(TableSchemaError, match=r"events.*ts.*string"):
        load_tables(spark, sf_dir)


def test_missing_column_raises_actionable(spark, tmp_path):
    tbl = _events_arrays(pa.array(_EPOCH_US, pa.timestamp("us")))
    tbl = tbl.drop_columns(["user_id"])
    sf_dir = _synth_sf_dir(tmp_path, tbl, "sf-missing-col")
    with pytest.raises(TableSchemaError, match=r"events.*missing column 'user_id'"):
        load_tables(spark, sf_dir)


def test_wrong_kind_column_raises_actionable(spark, tmp_path):
    tbl = _events_arrays(pa.array(_EPOCH_US, pa.timestamp("us")))
    idx = tbl.schema.get_field_index("value")
    tbl = tbl.set_column(idx, "value", pa.array(["x"] * len(tbl)))
    sf_dir = _synth_sf_dir(tmp_path, tbl, "sf-wrong-kind")
    with pytest.raises(TableSchemaError, match=r"events.*value.*string"):
        load_tables(spark, sf_dir)


def test_real_testdata_loads_clean(spark):
    t = load_tables(spark, SF_SRC)
    assert set(t) == set(TABLE_NAMES)
    assert t["events"].schema["ts"].dataType.simpleString() == "timestamp"


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema drift across data drops — the 100 TB ingest reality: a
    directory whose older files lack a column added later must read as
    ONE table with mergeSchema, nulls where the column didn't exist,
    and still prune/push filters normally."""
    import os

    from pyspark.sql import functions as F

    path = str(tmp_path / "drops")
    spark.range(0, 50).selectExpr("id", "id * 2 AS v").write.parquet(path)
    spark.range(50, 100).selectExpr(
        "id", "id * 2 AS v", "concat('s', id % 3) AS source"
    ).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "source"}
    assert merged.count() == 100
    # old rows surface the new column as null
    assert merged.filter(F.col("source").isNull()).count() == 50
    got = merged.filter(F.col("source") == "s0").agg(F.count("*")).first()[0]
    assert got == sum(1 for i in range(50, 100) if i % 3 == 0)
