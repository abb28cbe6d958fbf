"""The vacuous-oracle guard in tools/check_correctness.py must RED-FLAG
a query whose oracle returns 0 rows — empty-equals-empty hashes green on
the driver, so the local gate is the only place the bug class can be
caught mechanically (r4 verdict #1)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

import check_correctness as cc  # noqa: E402


class _FakeEntry:
    """Minimal __spark_entry__ stand-in: one query whose Spark result
    and DuckDB oracle are both EMPTY with identical schema — the exact
    shape that used to pass silently."""

    @staticmethod
    def queries():
        return {
            "empty_q": lambda spark, sf_dir: spark.range(0).select(
                F.col("id").alias("x")
            )
        }

    @staticmethod
    def oracle_sql():
        return {"empty_q": "SELECT CAST(1 AS BIGINT) AS x WHERE 1 = 0"}


def test_guard_flags_synthetic_zero_row_oracle(spark, monkeypatch, capsys):
    monkeypatch.setattr(cc, "entrymod", _FakeEntry)
    monkeypatch.setattr(cc, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    monkeypatch.setattr(
        sys, "argv", ["check_correctness.py", "--only", "empty_q"]
    )
    rc = cc.main()
    out = capsys.readouterr().out
    assert rc == 1
    assert "VACUOUS" in out


def test_guard_allowlist_lets_intended_empties_pass(
    spark, monkeypatch, capsys
):
    monkeypatch.setattr(cc, "entrymod", _FakeEntry)
    monkeypatch.setattr(cc, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    monkeypatch.setattr(cc, "ZERO_ROW_ALLOWED", frozenset({"empty_q"}))
    monkeypatch.setattr(
        sys, "argv", ["check_correctness.py", "--only", "empty_q"]
    )
    rc = cc.main()
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS empty_q" in out


def test_registry_has_no_duplicate_names():
    """A duplicate registry name silently SHADOWS the earlier entry in
    ALL_QUERIES (dict by name — latest wins), so the earlier row stops
    being checked while still looking registered (the r12 textrank
    near-miss: a re-implementation landed beside the r6 row and only
    the per-gate count mismatch exposed it). Mechanized: _REGISTRY
    names must be unique."""
    import collections

    from flink_essentials_spark.queries.catalog import ALL_QUERIES, _REGISTRY

    dupes = [
        n
        for n, c in collections.Counter(q.name for q in _REGISTRY).items()
        if c > 1
    ]
    assert not dupes, dupes
    assert len(ALL_QUERIES) == len(_REGISTRY)
