"""Versioned parquet store — the minimal table-format core (snapshot
isolation, time travel, instant rollback) on plain files:

    base/
      v=1/ ... parquet ...
      v=2/ ...
      _CURRENT        <- one line: the committed version number

Writers write a COMPLETE new version directory, then commit by
atomically replacing the _CURRENT pointer (os.replace of a same-dir
temp file — atomic on POSIX). Readers resolve the pointer first, so
they only ever see fully-written versions: a crash mid-write leaves an
orphan directory and an untouched pointer, never a torn table.
Rollback is a pointer update; old versions stay readable (time travel)
until vacuumed.

At 100 TB this is exactly the commit protocol the real table formats
(Iceberg/Delta) implement with manifests instead of directories — the
unit operations (append-as-new-version, pointer swap, snapshot read)
map one-to-one, so pipelines written against this API port directly.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def _read_pointer(base: str) -> int | None:
    p = os.path.join(base, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def _commit_pointer(base: str, version: int) -> None:
    fd, tmp = tempfile.mkstemp(prefix="._CURRENT.", dir=base)
    with os.fdopen(fd, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(base, _POINTER))  # atomic commit


def list_versions(base: str) -> list[int]:
    if not os.path.isdir(base):
        return []
    out = []
    for e in os.listdir(base):
        if e.startswith("v=") and os.path.isdir(os.path.join(base, e)):
            out.append(int(e[2:]))
    return sorted(out)


def write_version(
    spark: SparkSession, base: str, df: DataFrame, epoch_id: int | None = None
) -> int:
    """Write ``df`` as the next version and commit it. Returns the new
    version number. The data directory is complete before the pointer
    moves, so concurrent readers never see a partial table.

    ``epoch_id`` tags the version with its source micro-batch BEFORE
    the pointer swap (an ``_epoch`` metadata file — underscore-prefixed,
    so parquet readers ignore it): the atomic pointer commit then
    covers data AND provenance together, which is what makes
    at-least-once foreachBatch replays detectable
    (:func:`committed_epoch`)."""
    os.makedirs(base, exist_ok=True)
    cur = _read_pointer(base) or 0
    new = max([cur] + list_versions(base)) + 1
    df.write.mode("errorifexists").parquet(os.path.join(base, f"v={new}"))
    if epoch_id is not None:
        with open(os.path.join(base, f"v={new}", "_epoch"), "w") as f:
            f.write(str(int(epoch_id)))
    _commit_pointer(base, new)
    return new


def committed_epoch(base: str) -> int | None:
    """The epoch tag of the CURRENTLY COMMITTED version (None when the
    store is empty or the version carries no tag). A replayed batch
    compares its epoch against this: equal ⇒ the merge already
    committed and must be skipped; a crash before the pointer swap
    leaves the previous tag in place ⇒ the replay re-applies."""
    cur = _read_pointer(base)
    if cur is None:
        return None
    p = os.path.join(base, f"v={cur}", "_epoch")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def read_current(spark: SparkSession, base: str) -> DataFrame:
    cur = _read_pointer(base)
    if cur is None:
        raise FileNotFoundError(f"{base}: no committed version ({_POINTER} missing)")
    return read_version(spark, base, cur)


def read_version(spark: SparkSession, base: str, version: int) -> DataFrame:
    """Time travel: read an explicit committed snapshot."""
    path = os.path.join(base, f"v={version}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"{base}: version {version} does not exist")
    return spark.read.parquet(path)


def rollback(base: str, version: int) -> None:
    """Instant rollback: point _CURRENT at an older version (data is
    untouched — the bad version stays inspectable until vacuum)."""
    if version not in list_versions(base):
        raise FileNotFoundError(f"{base}: version {version} does not exist")
    _commit_pointer(base, version)


def vacuum(base: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` versions (never the committed
    one). Returns the removed version numbers."""
    cur = _read_pointer(base)
    versions = list_versions(base)
    removable = [v for v in versions[:-keep] if v != cur] if keep else [
        v for v in versions if v != cur
    ]
    for v in removable:
        shutil.rmtree(os.path.join(base, f"v={v}"))
    return removable
