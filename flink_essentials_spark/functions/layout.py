"""Multi-dimensional data layout: Z-order (Morton) keys.

The 100 TB problem this solves: a table sorted by ONE column skips
files/row-groups only for predicates on that column; a box predicate
over two columns (user range × value range) scans everything sorted
the wrong way. Interleaving the bit-planes of both columns (Morton
order) makes file min/max ranges tight in BOTH dimensions, so plain
parquet footer stats prune 2-D boxes — the technique behind Delta/
Iceberg OPTIMIZE ZORDER, reduced here to its engine-level core:
compute the key, range-partition-sort by it, let statistics do the
rest (measured in tests/test_plans.py: a 2-D box touches ~4x fewer
files than a 1-D sort of the same data).

Key construction is EXACT integer arithmetic (scale each column to
[0, 2^bits) by integer division against known bounds, then interleave
bits), emitted as one SQL expression string valid in both Spark and
DuckDB — the oracle recomputes every key (``zorder_keys`` row).
Bounds come from the caller (parquet footers / dimension metadata —
the load_tables discipline), never from a hidden full scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(expr: str, lo, hi, bits: int, intdiv: str) -> str:
    span = f"((({hi}) - ({lo})) + 1)"
    return f"((({expr}) - ({lo})) * {1 << bits}) {intdiv} {span}"


def morton_sql(
    a_expr: str,
    a_bounds: tuple,
    b_expr: str,
    b_bounds: tuple,
    bits: int = 8,
    intdiv: str = "div",
) -> str:
    """The Morton-key expression as SQL text. ``intdiv`` is the only
    engine difference: Spark spells integer division ``div``, DuckDB
    ``//`` — same semantics for the non-negative operands produced
    here (both truncate toward zero). Each scaled coordinate occupies
    ``bits`` bit-planes; plane j of a lands at key bit 2j, of b at
    2j+1. Bounds may be integer literals or SQL expressions (e.g.
    column names of a broadcast one-row bounds aggregate — the
    idle_customers scalar pattern — so both engines derive bounds
    in-query)."""
    sa = _scaled(a_expr, *a_bounds, bits, intdiv)
    sb = _scaled(b_expr, *b_bounds, bits, intdiv)
    terms = []
    for j in range(bits):
        terms.append(f"((({sa}) >> {j}) & 1) * {1 << (2 * j)}")
        terms.append(f"((({sb}) >> {j}) & 1) * {1 << (2 * j + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def morton_key(
    a_expr: str,
    a_bounds: tuple,
    b_expr: str,
    b_bounds: tuple,
    bits: int = 8,
) -> Column:
    """Spark column for the same Morton key (see :func:`morton_sql`)."""
    return F.expr(morton_sql(a_expr, a_bounds, b_expr, b_bounds, bits, "div"))


def write_zordered(
    df: DataFrame,
    path: str,
    key: Column,
    n_files: int,
    *,
    mode: str = "overwrite",
) -> None:
    """Lay a frame out in Z-order: range-partition by the key (files
    own contiguous key ranges → tight per-file min/max in BOTH
    interleaved dimensions), sort within each partition (tight
    row-group stats inside files), write plain parquet. At cluster
    scale ``n_files`` is the target file count (size-budgeted); the
    skipping benefit needs no table format — footer statistics
    suffice, as the layout test proves by counting candidate files
    for a 2-D box under Z-order vs a 1-D sort."""
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def hilbert_levels(bits: int):
    """The per-level constants of the 2-D Hilbert xy→d walk (the
    classic public-domain formulation, e.g. Hamilton 2006 tech report
    / Warren's Hacker's Delight treatment): at level s = 2^k the cell
    quadrant (rx, ry) contributes s²·q with q = 0,1,3,2 for
    (rx,ry) = (0,0),(0,1),(1,0),(1,1) — the Gray-code visit order —
    and the frame is reflected+swapped for the next level when
    ry = 0. Shared by the Spark column builder and the SQL oracle so
    both engines run the identical integer recurrence."""
    return [1 << k for k in reversed(range(bits))]


def hilbert_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Hilbert-curve layout key over two pre-scaled non-negative
    integer coordinates in [0, 2^bits) — the locality-preserving
    alternative to :func:`morton_key`: consecutive keys are ALWAYS
    Manhattan-adjacent cells (no Z-order jumps), so contiguous
    key-range files own even tighter 2-D boxes. Pure integer
    when/reflect/swap arithmetic per bit level; no UDF, no shuffle.

    The reflect+swap recurrence references both coordinates several
    times per level, so the INLINE expression tree grows ~4^bits —
    measured fine through bits=6 and pathological past it (bits=8
    stalls analysis). For finer grids use :func:`hilbert_cells` and a
    broadcast join: the whole curve is a dimension-sized table
    (2^(2·bits) rows — 65k at bits=8), which is the layout you want
    at cluster scale anyway (one hash lookup per row, no codegen
    monster)."""
    d = F.lit(0).cast("long")
    for s in hilbert_levels(bits):
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        q = (
            F.when((rx == 0) & (ry == 0), F.lit(0))
            .when(rx == 0, F.lit(1))
            .when(ry == 1, F.lit(2))
            .otherwise(F.lit(3))
        )
        d = d + F.lit(s * s).cast("long") * q
        nx = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)
        ).otherwise(x)
        ny = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)
        ).otherwise(y)
        x, y = nx, ny
    return d


def hilbert_sql_ctes(
    source_select: str, id_cols: str, x_expr: str, y_expr: str, bits: int = 8
) -> str:
    """DuckDB/ANSI oracle twin of :func:`hilbert_key` as a chain of
    per-level CTEs (linear text size; inlining the recurrence would
    grow exponentially). ``source_select`` must project ``id_cols``
    plus the scaled coordinates as ``x`` and ``y``. Returns the full
    WITH clause; the caller SELECTs ``{id_cols}, hkey`` from ``lvl0``.
    """
    cte = f"WITH lvl{bits} AS (\n  {source_select}\n)"
    for s in hilbert_levels(bits):
        k = s.bit_length() - 1  # s = 2^k; this CTE consumes lvl{k+1}
        cte += f""", lvl{k} AS (
  SELECT {id_cols},
         d + {s * s} * CASE WHEN rx = 0 AND ry = 0 THEN 0
                            WHEN rx = 0 THEN 1
                            WHEN ry = 1 THEN 2 ELSE 3 END AS d,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - y ELSE y END)
              ELSE x END AS x,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - x ELSE x END)
              ELSE y END AS y
  FROM (
    SELECT {id_cols}, {'0' if k == bits - 1 else 'd'} AS d, x, y,
           CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
           CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
    FROM lvl{k + 1}
  )
)"""
    return cte


def hilbert_cells(spark, bits: int = 8) -> DataFrame:
    """The full 2-D Hilbert curve as a (cell_x, cell_y, hkey)
    DataFrame — 2^(2·bits) rows, built with a vectorized numpy run of
    the same per-level recurrence :func:`hilbert_key` unrolls (and the
    SQL oracle re-derives independently via :func:`hilbert_sql_ctes`).
    Broadcast-join it on the scaled coordinates to key a fact table:
    at bits=8 the table is 65,536 rows (~1.5 MB broadcast), far under
    any broadcast threshold, and the probe side never shuffles."""
    import numpy as np
    import pandas as pd

    n = 1 << bits
    x = np.repeat(np.arange(n, dtype=np.int64), n)
    y = np.tile(np.arange(n, dtype=np.int64), n)
    cx, cy = x.copy(), y.copy()
    d = np.zeros(n * n, dtype=np.int64)
    for s in hilbert_levels(bits):
        rx = ((cx & s) > 0).astype(np.int64)
        ry = ((cy & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # reflect+swap where ry == 0
        refl = (ry == 0) & (rx == 1)
        cx2 = np.where(refl, s - 1 - cx, cx)
        cy2 = np.where(refl, s - 1 - cy, cy)
        swap = ry == 0
        cx, cy = np.where(swap, cy2, cx2), np.where(swap, cx2, cy2)
    return spark.createDataFrame(
        pd.DataFrame({"cell_x": x, "cell_y": y, "hkey": d})
    )


def rendezvous_shard(
    df, key_col: str, n_shards: int = 8, salt: str = "hrw"
):
    """Rendezvous / highest-random-weight sharding (Thaler &
    Ravishankar 1998 — the consistent-placement scheme behind cache
    routing and shard maps): key k goes to argmax_s hash(s, k) over
    the shard list. Adding or removing a shard remaps ONLY the keys
    whose argmax was that shard (~1/n of keys move, vs ~all for
    mod-n) — the property that matters when a 100 TB corpus gains a
    shard and you cannot afford to rewrite every file; pinned by the
    minimal-disruption test.

    Scan-stage only: explode the bounded shard list per row, one
    groupBy(key) max(struct(h, s)) argmax — no join, no window over
    data. The md5 weights are the repo's cross-engine hash, so the
    whole assignment is under exact oracle. Returns df plus a
    ``shard`` column."""
    from pyspark.sql import functions as F

    hv = lambda s: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}"),
                    F.lit(str(s)),
                    F.lit(":"),
                    F.col(key_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    best = F.greatest(
        *[F.struct(hv(s).alias("h"), F.lit(s).alias("s")) for s in range(n_shards)]
    ) if n_shards > 1 else F.struct(hv(0).alias("h"), F.lit(0).alias("s"))
    return df.withColumn("shard", best.getField("s"))
