"""Order-statistics analytics over unbounded tables.

First member: the 2-D skyline / Pareto front (Börzsönyi, Kossmann &
Stocker 2001, "The Skyline Operator" — ICDE) under MAX/MAX dominance.
The naive formulation is a dominance self-join (quadratic, and a
BroadcastNestedLoopJoin in any engine); the scale-safe form used here
is the repo's banded two-phase prefix pattern (token_budget_select):
band by x, resolve strictly-greater-x maxima with a KEYED range-frame
window inside each band plus a suffix-max over the ~bands-sized band
aggregate — every data-sized window keyed, the only partitionless
window runs over the bounded band table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def pareto_front(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    n_bands: int = 32,
) -> DataFrame:
    """Skyline under MAX/MAX dominance over integer coordinates:
    a point is dominated iff some other point is >= in both dims and
    > in at least one; the front is everything not dominated. Exact
    tie semantics: coincident duplicates do not dominate each other
    (both stay on the front).

    Decomposition (all exact integer arithmetic):
      dominated(p) = [max y among x' > p.x] >= p.y
                  OR [max y among x' = p.x] > p.y
    The first max splits into within-band (keyed window, RANGE frame
    starting 1 following on x) and higher-bands (suffix max over the
    n_bands-row aggregate, broadcast back); the second is a keyed
    (band, x) window. Returns the front rows (id, x, y).
    """
    p = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    bounds = p.agg(F.max("x").alias("mx"))
    banded = p.crossJoin(F.broadcast(bounds)).select(
        "pid",
        "x",
        "y",
        F.floor((F.col("x") * n_bands) / (F.col("mx") + 1)).alias("band"),
    )
    in_band = (
        W.partitionBy("band")
        .orderBy("x")
        .rangeBetween(1, W.unboundedFollowing)
    )
    same_x = W.partitionBy("band", "x")
    staged = banded.select(
        "pid",
        "x",
        "y",
        "band",
        F.max("y").over(in_band).alias("maxy_in_band_gt"),
        F.max("y").over(same_x).alias("maxy_same_x"),
    )
    # suffix max over the bounded band aggregate (allowlisted
    # partitionless window: <= n_bands rows by construction)
    band_stats = banded.groupBy("band").agg(F.max("y").alias("band_max"))
    suffix = band_stats.select(
        "band",
        F.max("band_max")
        .over(W.orderBy("band").rowsBetween(1, W.unboundedFollowing))
        .alias("maxy_higher_bands"),
    )
    joined = staged.join(F.broadcast(suffix), "band")
    maxy_gt = F.greatest(
        F.coalesce("maxy_in_band_gt", F.lit(-(1 << 62))),
        F.coalesce("maxy_higher_bands", F.lit(-(1 << 62))),
    )
    return (
        joined.filter(
            ~((maxy_gt >= F.col("y")) | (F.col("maxy_same_x") > F.col("y")))
        )
        .select(F.col("pid").alias(id_col), "x", "y")
    )
