"""Oracle type-hygiene gate.

The driver's value hash is TYPED: a DuckDB HUGEINT / decimal128 column
(the silent result type of SUM(BIGINT), integer window sums, and bare
numeric literals like `3.0`) hash-mismatches against Spark's bigint /
double even when every value agrees — the sole red row of round 3
(pack_sequences) was exactly this.  This test runs EVERY registry
oracle through DuckDB -> Arrow at sf0.001 and fails on any decimal
column that leaks into hashed output, so the bug class can't recur.

No SparkSession needed — DuckDB only.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from flink_essentials_spark.tables import TABLE_NAMES, table_path

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'")
    return c


def test_no_oracle_emits_decimal_columns(con):
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        schema = con.sql(sql).fetch_arrow_table().schema
        bad = {f.name: str(f.type) for f in schema if "decimal" in str(f.type)}
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting DuckDB decimal/HUGEINT columns (wrap in "
        f"CAST(... AS BIGINT/DOUBLE)): {offenders}"
    )
