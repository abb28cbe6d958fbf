"""Change-data-capture ingestion: a change log (upsert/delete ops with
event time) materializes into table STATE — the lakehouse MERGE
workload, on plain parquet.

Two layers:

- :func:`cdc_latest` — compact a change batch to its LATEST op per key
  (a keyed window; the batch's internal history collapses before any
  store I/O).
- :func:`cdc_apply` — merge that compacted batch into a parquet store:
  matched keys are replaced (or removed, when the latest op is a
  delete), new keys append. Same crash-safe two-rename swap as
  sinks.upsert_parquet, PLUS entry-time recovery of an interrupted
  swap: a crash between the two renames leaves the pre-merge state in
  a ``.precdc-*`` sibling and nothing at ``path`` — on the next apply
  that sibling is renamed back before the missing-path first-create
  branch can reinitialize the store from a single batch. APPLY IS
  IDEMPOTENT: re-applying the same batch reproduces the same state
  (latest-per-key replacement has no additive component), so
  at-least-once foreachBatch replays are safe with no epoch
  bookkeeping — unlike SUM-merging rollups.

At 100 TB: partition the store on a key prefix and run the same merge
per affected partition; with a table format, MERGE INTO is this exact
plan. The batch side shuffles once on the key; the store side is a
rewrite of affected partitions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def cdc_latest(
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Latest change per key: deterministic total order via
    ``order_cols`` DESC (include enough columns to break event-time
    ties; fully identical rows are interchangeable)."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    return (
        changes.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def cdc_state(
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """One-shot materialization: the state a fully-applied change log
    produces — latest op per key, delete survivors dropped. This is
    the BATCH truth that incremental :func:`cdc_apply` loops must
    reproduce (pinned by the streaming e2e test)."""
    return cdc_latest(changes, keys, order_cols, op_col).filter(
        F.col(op_col) != delete_op
    )


def cdc_apply(
    spark,
    path: str,
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> dict:
    """Merge one change batch into the parquet store at ``path``
    (created if absent): compact the batch to latest-per-key, drop
    every matched key from the current state, then add back the
    non-delete survivors. Crash-safe two-rename swap with entry-time
    recovery of an interrupted swap; idempotent under re-application
    of the same batch.

    Returns {"rows_before", "rows_after", "keys_changed"}."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    orphans = sorted(
        glob.glob(path.rstrip("/") + ".precdc-*"), key=os.path.getmtime
    )
    if orphans:
        if os.path.isdir(path):
            # the swap completed before the crash — the live dir is the
            # merged state; the orphans are dead pre-merge copies
            for o in orphans:
                shutil.rmtree(o)
        else:
            # crashed BETWEEN the two renames: the newest orphan IS the
            # pre-merge state. Restore it so this (replayed) batch
            # merges into real prior state instead of taking the
            # first-create branch and silently dropping history.
            os.rename(orphans[-1], path)
            for o in orphans[:-1]:
                shutil.rmtree(o)

    latest = cdc_latest(changes, keys, order_cols, op_col)
    survivors = latest.filter(F.col(op_col) != delete_op)

    if not os.path.isdir(path):
        survivors.write.mode("errorifexists").parquet(path)
        n = spark.read.parquet(path).count()
        return {"rows_before": 0, "rows_after": n, "keys_changed": n}

    current = spark.read.parquet(path)
    touched = latest.select(*keys).distinct()
    kept = current.join(touched, keys, "left_anti")
    merged = kept.unionByName(survivors.select(*current.columns))
    dest = tempfile.mkdtemp(prefix="cdc_", dir=os.path.dirname(path.rstrip("/")))
    merged.write.mode("overwrite").parquet(dest)
    n_before = current.count()
    n_after = spark.read.parquet(dest).count()
    n_keys = touched.count()
    old = path.rstrip("/") + ".precdc-" + _uuid.uuid4().hex[:8]
    os.rename(path, old)
    os.rename(dest, path)
    shutil.rmtree(old)
    return {
        "rows_before": n_before,
        "rows_after": n_after,
        "keys_changed": n_keys,
    }


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot comparison — the data-diff / regression-audit
    primitive: one FULL OUTER join on the key classifies every key as
    added / removed / changed / unchanged by null-pattern and value
    comparison. One shuffle on the key; output is key + change_kind +
    both sides' compared values (null on the missing side)."""
    b = before.select(
        *keys, *[F.col(c).alias(f"b_{c}") for c in compare_cols]
    )
    a = after.select(
        *keys, *[F.col(c).alias(f"a_{c}") for c in compare_cols]
    )
    j = b.join(a, keys, "full_outer")
    b_present = F.col(f"b_{compare_cols[0]}").isNotNull()
    a_present = F.col(f"a_{compare_cols[0]}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"b_{c}").eqNullSafe(F.col(f"a_{c}"))
        same = eq if same is None else (same & eq)
    kind = (
        F.when(~b_present & a_present, "added")
        .when(b_present & ~a_present, "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return j.select(*keys, kind.alias("change_kind"),
                    *[f"b_{c}" for c in compare_cols],
                    *[f"a_{c}" for c in compare_cols])
