"""Sinks (reference §2.2).

- text/CSV files (K1/K2) → DataFrame writers; single-file = coalesce(1)
  (the reference's sink-parallelism-1 behavior, BuiltIn.scala:116-123)
- StreamingFileSink + rolling policy (K3) → file sink + checkpoint;
  rolling = one file per micro-batch partition; exactly-once via the
  sink manifest + checkpoint (the guarantee BuiltIn.scala:69-71 asks for)
- print (K5) → console sink; executeAndCollect (K6) → memory sink
- addSink(fn) (K4) → foreachBatch
"""

from __future__ import annotations

import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def to_console(sdf: DataFrame, *, output_mode: str = "append", **options):
    return (
        sdf.writeStream.outputMode(output_mode).format("console").options(**options).start()
    )


def to_memory(
    sdf: DataFrame,
    name: str,
    *,
    output_mode: str = "append",
    checkpoint: str | None = None,
):
    """executeAndCollect analog: results land in table ``name``."""
    w = sdf.writeStream.outputMode(output_mode).format("memory").queryName(name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()


def run_to_memory(
    spark: SparkSession, sdf: DataFrame, name: str, *, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming frame to completion synchronously (bounded
    sources / file replay) and return the materialized result table.

    The checkpoint (offsets/commit logs + state-store deltas, fsynced
    every micro-batch) goes on fast scratch storage and is removed as
    soon as the query stops — a bounded replay never resumes, so the
    checkpoint's only job is to exist while the query runs (guide §6;
    FES_SCRATCH_DIR overrides the root)."""
    import shutil

    from flink_essentials_spark.scratch import scratch_dir

    ckpt = scratch_dir("fes_ckpt_")
    q = to_memory(sdf, name, output_mode=output_mode, checkpoint=ckpt)
    try:
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def to_files(
    sdf: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    checkpoint: str | None = None,
    output_mode: str = "append",
    **options,
):
    """Fault-tolerant rolling file sink (K3)."""
    ckpt = checkpoint or tempfile.mkdtemp(prefix="fes_ckpt_")
    return (
        sdf.writeStream.outputMode(output_mode)
        .format(fmt)
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .options(**options)
        .start()
    )


def for_each_batch(sdf: DataFrame, fn: Callable[[DataFrame, int], None], *, checkpoint: str | None = None):
    """addSink(fn) analog (K4) with exactly-once batch ids."""
    writer = sdf.writeStream.foreachBatch(fn)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def write_text(df: DataFrame, path: str, *, single_file: bool = False, mode: str = "overwrite"):
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).text(path)


def write_csv(df: DataFrame, path: str, *, single_file: bool = False, mode: str = "overwrite", **options):
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).options(**options).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    *keys: str,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Bucketed (and bucket-sorted) table layout — the co-located join
    strategy at 100 TB: two tables written with the SAME bucket count
    and keys join with NO shuffle exchange on either side (and with
    ``sort=True``, no sort either; plan-audited in tests/test_plans.py).
    Bucket pruning also serves point lookups on the bucket key.

    Parquet + metastore bucketing via ``bucketBy``/``sortBy``
    ``saveAsTable``; pass ``path`` to write an external table at a
    specific location. Returns the re-read table (reading through the
    catalog is what carries the bucket metadata into the join planner).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return df.sparkSession.table(table)


def write_partitioned(
    df: DataFrame, path: str, *keys: str, mode: str = "overwrite"
) -> DataFrame:
    """Hive-style partitioned parquet layout (``key=value`` directories)
    — the scan-elimination strategy at 100 TB: a filter on a partition
    key prunes to the matching directories at PLANNING time, so a query
    over one day/source/language reads that slice and nothing else
    (plan-audited in tests/test_plans.py: PartitionFilters in the scan,
    pruned partition count in the plan, zero non-matching files read).
    Complements write_bucketed: partition on low-cardinality
    scan-eliminating keys, bucket on high-cardinality join keys.

    Returns the re-read DataFrame (partition discovery runs on read).
    """
    df.write.format("parquet").mode(mode).partitionBy(*keys).save(path)
    return df.sparkSession.read.parquet(path)


def compact_files(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> dict:
    """Small-file compaction — the maintenance op every long-running
    100 TB ingest needs: streaming/micro-batch sinks leave thousands of
    KB-sized parquet files whose per-file open/footer cost dominates
    scans and whose count explodes driver memory on listing. Rewrites a
    parquet directory into ``ceil(total_bytes / target_bytes)`` files
    of ~``target_bytes`` each.

    Sizing comes from driver-side file metadata (os.stat over the
    listing — no Spark job); the rewrite itself is one distributed
    read→repartition→write. Content is preserved row-for-row (verified
    by tests via full-row hash), only the physical layout changes.
    In-place (``out_path=None``) writes to a temp sibling then swaps via
    two renames — crash-SAFE rather than atomic: a crash between the
    renames leaves the original intact under a unique
    ``<path>.precompact-*`` name (nothing is deleted until the swap
    completes), and the unique suffix means a retry never collides with
    a leftover from a previous crash.

    Hive-partitioned layouts (key=value subdirectories) are rejected
    with an actionable error: compacting one flattens the partition
    columns into the data files and destroys pruning — compact each
    partition directory individually instead.

    Returns {"files_before", "files_after", "bytes", "target_files"}.
    """
    import math
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    entries = [e for e in os.listdir(path) if not e.startswith(("_", "."))]
    part_dirs = [
        e for e in entries if "=" in e and os.path.isdir(os.path.join(path, e))
    ]
    if part_dirs:
        raise ValueError(
            f"{path} is hive-partitioned ({part_dirs[0]}, ...): compact each "
            "partition directory individually — compacting the root would "
            "flatten the partition columns and destroy pruning"
        )
    # size/count the SAME file set spark.read.parquet will ingest —
    # every non-hidden regular file, suffixed or not (a directory with
    # unsuffixed data files previously summed to total=0 → n_out=1 and
    # misleading stats)
    files = [
        p
        for f in entries
        if os.path.isfile(p := os.path.join(path, f))
    ]
    total = sum(os.stat(f).st_size for f in files)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    in_place = out_path is None
    dest = (
        tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(path.rstrip("/")))
        if in_place
        else out_path
    )
    # repartition(n) is a round-robin full shuffle: even output sizes,
    # which is the point of compaction (coalesce would skip the shuffle
    # but inherit whatever skew the input files have)
    df.repartition(n_out).write.mode("overwrite").parquet(dest)
    if in_place:
        old = path.rstrip("/") + ".precompact-" + _uuid.uuid4().hex[:8]
        os.rename(path, old)
        os.rename(dest, path)
        shutil.rmtree(old)
    out_dir = path if in_place else dest
    out_files = [
        f
        for f in os.listdir(out_dir)
        if not f.startswith(("_", "."))
        and os.path.isfile(os.path.join(out_dir, f))
    ]
    return {
        "files_before": len(files),
        "files_after": len(out_files),
        "bytes": total,
        "target_files": n_out,
    }


def upsert_parquet(
    spark, path: str, updates: DataFrame, keys: list[str]
) -> dict:
    """Keyed upsert (MERGE) into a plain-parquet directory — the
    dimension-refresh primitive when no table format (Iceberg/Delta)
    is available: rows whose key matches an update are replaced, new
    keys are appended.

    Parquet files are immutable, so this is a rewrite-merge: current
    left-anti updates (drops stale versions) ∪ updates, written to a
    temp sibling and swapped with the same crash-safe two-rename
    protocol as compact_files. At 100 TB, partition the layout on a
    key prefix and upsert only the affected partition directories —
    the full-directory rewrite here IS the per-partition unit of that
    plan.

    Contract: ``updates`` must be key-unique (pre-aggregate a CDC
    stream to latest-per-key first) — the updated/inserted split in
    the returned stats assumes one update row per key.

    Returns {"rows_before", "rows_updated", "rows_inserted",
    "rows_after"}.
    """
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    current = spark.read.parquet(path)
    upd_keys = updates.select(*keys).distinct()
    kept = current.join(upd_keys, keys, "left_anti")
    merged = kept.unionByName(updates.select(*current.columns))
    dest = tempfile.mkdtemp(
        prefix="upsert_", dir=os.path.dirname(path.rstrip("/"))
    )
    merged.write.mode("overwrite").parquet(dest)
    n_before = current.count()
    n_after = spark.read.parquet(dest).count()
    n_upd = updates.count()
    old = path.rstrip("/") + ".preupsert-" + _uuid.uuid4().hex[:8]
    os.rename(path, old)
    os.rename(dest, path)
    shutil.rmtree(old)
    return {
        "rows_before": n_before,
        "rows_updated": n_before + n_upd - n_after,
        "rows_inserted": n_after - n_before,
        "rows_after": n_after,
    }


def erase_keys(
    spark, path: str, keys_df: DataFrame, key_cols: list[str]
) -> dict:
    """Keyed erasure — the right-to-be-forgotten / takedown primitive:
    rewrite a parquet directory WITHOUT any row matching the given key
    set (left-anti join), using the same crash-safe two-rename swap as
    upsert_parquet. At 100 TB: partition the layout on (a prefix of)
    the erasure key and rewrite only affected partitions; with a table
    format, use its delete API — this is the plain-parquet unit both
    reduce to.

    Returns {"rows_before", "rows_erased", "rows_after"}.
    """
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    current = spark.read.parquet(path)
    kept = current.join(
        keys_df.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    dest = tempfile.mkdtemp(prefix="erase_", dir=os.path.dirname(path.rstrip("/")))
    kept.write.mode("overwrite").parquet(dest)
    n_before = current.count()
    n_after = spark.read.parquet(dest).count()
    old = path.rstrip("/") + ".preerase-" + _uuid.uuid4().hex[:8]
    os.rename(path, old)
    os.rename(dest, path)
    shutil.rmtree(old)
    return {
        "rows_before": n_before,
        "rows_erased": n_before - n_after,
        "rows_after": n_after,
    }
