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


@pytest.fixture(scope="module")
def con_sf001():
    """sf0.01 views — the SF the driver hashes at, and therefore the SF
    where a 0-row oracle means a vacuous green row."""
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{table_path('/root/testdata/sf0.01', t)}'"
        )
    return c


def test_head50_output_schemas_are_atomic(con):
    """The external driver's canonicalizer sorts result rows through
    pandas before hashing; a list/struct/map column raises
    ``TypeError: unhashable type`` and REDDENS the row even when the
    math is exact — the sole red driver row of round 9
    (random_projection, array<double> proj).  Every driver-visible
    (head-50) query must therefore emit only atomic columns; complex
    types belong in tail rows, whose stringifying local checker copes.
    DuckDB-side check is sufficient: oracle and Spark schemas must
    match anyway, so a complex Spark column with a scalar oracle is
    caught by the ordinary hash gate."""
    oracles = entrymod.oracle_sql()
    head = list(entrymod.queries())[:50]
    offenders = {}
    for name in head:
        sql = oracles.get(name)
        if sql is None:  # rows-only driver check; no pandas canon path
            continue
        schema = con.sql(f"SELECT * FROM ({sql}) LIMIT 0").fetch_arrow_table().schema
        bad = {
            f.name: str(f.type)
            for f in schema
            if any(t in str(f.type) for t in ("list", "struct", "map"))
        }
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "head-50 (driver-visible) queries emitting complex-typed columns "
        f"(scalar-ize or demote below the tail marker): {offenders}"
    )


def test_no_vacuous_oracles_at_driver_sf(con_sf001):
    """A 0-row oracle passes the hash gate trivially (empty == empty)
    and verifies nothing — the r4 verdict found three such rows
    (contamination, as_of_join_forward, idle_customers). Every registry
    oracle must return >=1 row at the driver's sf0.01, or be explicitly
    allowlisted in tools/check_correctness.ZERO_ROW_ALLOWED."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import ZERO_ROW_ALLOWED

    vacuous = []
    for name, sql in entrymod.oracle_sql().items():
        if name in ZERO_ROW_ALLOWED:
            continue
        n = con_sf001.sql(f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
        if n == 0:
            vacuous.append(name)
    assert not vacuous, f"vacuous oracles (0 rows at sf0.01): {vacuous}"
