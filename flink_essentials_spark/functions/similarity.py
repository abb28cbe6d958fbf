"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — query side broadcast, one pass
over the corpus, per-partition partial top-k via the rank window (AQE
handles the final shuffle; at 100 TB, swap the window for a
per-partition heap via mapInPandas if the candidate set explodes).

Scale path: LSH bucketing — random-hyperplane signs (SimHash for
vectors) bucket the corpus; queries probe only their bucket. An IVF
variant (k-means coarse quantizer) is the classic alternative; the
hyperplane version needs no training pass, so it ships first.

All hot-path vector math is Arrow-batched BLAS (mapInPandas /
applyInPandas): per-pair scoring (``_batch_cosine``), all-pairs verify
(block matmul) and bucket assignment (plane matmul). Results round to
6 decimals, which both numpy and DuckDB (list_dot_product) reproduce
exactly for the oracles; the Column-expression ``dot`` fold remains
for tiny fixed-size uses only.
"""

from __future__ import annotations

import functools as _functools
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from flink_essentials_spark.routing import single_task_ok

# Deterministic pseudo-random hyperplanes: component j of plane p is
# derived from a fixed integer hash — reproducible anywhere, no RNG.
_HP_P = 1073741789


def _hp_component(p: int, j: int) -> float:
    # simple LCG-ish mix → value in [-0.5, 0.5)
    v = (1103515245 * (p * 977 + j * 31 + 12345) + 12345) % _HP_P
    return v / _HP_P - 0.5


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two array<double> columns.

    Higher-order folds run interpreted (outside codegen) — fine for a
    handful of rows (hyperplane_bucket's fixed planes), wrong for the
    per-pair hot path. Joined (query, corpus) scoring goes through
    ``_batch_cosine`` (Arrow + BLAS) instead.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _batch_cosine(scored: DataFrame) -> DataFrame:
    """Vectorized cosine over a joined (query_id, neighbor_id, qv, cv)
    frame: per Arrow batch, one row-wise einsum dot over float64
    matrices — the BLAS path for per-pair scoring (the interpreted
    ``cosine`` fold is ~10× slower per element at scale). Identical to
    the fold at round-6; stays fully lazy/distributed."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.array(pdf["qv"].tolist(), dtype=np.float64)
            C = np.array(pdf["cv"].tolist(), dtype=np.float64)
            s = np.einsum("ij,ij->i", Q, C) / (
                np.linalg.norm(Q, axis=1) * np.linalg.norm(C, axis=1)
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(dtype=np.int64),
                    "cos_sim": np.round(s, 6),
                }
            )

    return scored.mapInPandas(gen, "query_id long, neighbor_id long, cos_sim double")


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
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = _batch_cosine(
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def auto_blocks(
    n_rows: int, rows_per_block: int = 4096, parallelism: int | None = None
) -> int:
    """Block count for :func:`cosine_all_pairs` from a known row count.

    Two constraints, take the max:

    - memory: ``ceil(n / rows_per_block)`` bounds each block-pair task
      at two blocks of ≤``rows_per_block`` vectors plus a
      ``rows_per_block²`` similarity matrix (134 MB of doubles at 4096)
      — executor-safe at any corpus size;
    - parallelism: the smallest B with B(B+1)/2 ≥ the core count, so a
      corpus that fits one memory-sized block still fans out across the
      cluster instead of running as ONE serial task (r5 sweep at
      sf0.1/2000 vecs: B=1 → 1.32 s, B=4..12 → 0.88-0.91 s; flat in
      between, so the exact B is uncritical). Capped at n/64 so tiny
      inputs keep BLAS-efficient block sizes; shuffle volume O(n·B)
      keeps B from being sized any larger than the two constraints
      need.
    """
    if parallelism is None:
        from flink_essentials_spark.session import _cpus

        parallelism = _cpus()
    mem_blocks = -(-n_rows // rows_per_block)
    par_blocks = 1
    while par_blocks * (par_blocks + 1) // 2 < parallelism:
        par_blocks += 1
    return max(1, min(max(mem_blocks, par_blocks), max(1, n_rows // 64)))


def cosine_all_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup verify).

    Distributed block-nested-loop — NO driver-side collect anywhere.
    Rows hash into ``num_blocks`` blocks; a tiny broadcast block-pair
    index (i ≤ j) replicates each block to the ~num_blocks pairs it
    participates in; each (i, j) group normalizes its two row blocks
    and multiplies them with one BLAS matmul inside applyInPandas,
    emitting surviving pairs canonically ordered (vec_a < vec_b).
    Exact: identical to the naive quadratic form at round-6 (tested
    across block counts). Shuffle volume is O(n · num_blocks); per-task
    memory is two blocks of n/num_blocks vectors — size num_blocks so
    that fits an executor. Compute stays inherently quadratic (this is
    exact all-pairs); the sub-quadratic candidate path is
    hyperplane_bucket / minhash-LSH.

    Size ``num_blocks`` with :func:`auto_blocks` when the input row
    count is known (parquet footers — no Spark job, keeps plan
    construction lazy): a corpus that fits one block then runs as ONE
    task with zero replication, so the block machinery costs nothing
    when it isn't needed.
    """
    spark = df.sparkSession
    rows = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).cast("int").alias("__blk"),
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    index = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)],
        "i int, j int",
    )
    # side 0 = the row's block plays the i role; side 1 = the j role.
    # The diagonal group (i == j) gets side 0 only and computes its own
    # upper triangle; a cross pair {x, y} lands exactly once, in group
    # (min(blk), max(blk)).
    side_a = rows.join(F.broadcast(index), index["i"] == rows["__blk"]).select(
        "i", "j", F.lit(0).alias("__side"), "__id", "__v"
    )
    side_b = rows.join(
        F.broadcast(index.filter(F.col("i") != F.col("j"))),
        index["j"] == rows["__blk"],
    ).select("i", "j", F.lit(1).alias("__side"), "__id", "__v")

    def verify(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        a = pdf[pdf["__side"] == 0]
        if not len(a):
            return empty
        ids_a = a["__id"].to_numpy(dtype=np.int64)
        A = np.array(a["__v"].tolist(), dtype=np.float64)
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        if int(pdf["i"].iloc[0]) == int(pdf["j"].iloc[0]):
            S = np.round(An @ An.T, 6)
            ai, bi = np.nonzero((S >= threshold) & (ids_a[:, None] < ids_a[None, :]))
            return pd.DataFrame(
                {"vec_a": ids_a[ai], "vec_b": ids_a[bi], "cos_sim": S[ai, bi]}
            )
        b = pdf[pdf["__side"] == 1]
        if not len(b):
            return empty
        ids_b = b["__id"].to_numpy(dtype=np.int64)
        B = np.array(b["__v"].tolist(), dtype=np.float64)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        S = np.round(An @ Bn.T, 6)
        ai, bi = np.nonzero(S >= threshold)
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids_a[ai], ids_b[bi]),
                "vec_b": np.maximum(ids_a[ai], ids_b[bi]),
                "cos_sim": S[ai, bi],
            }
        )

    return (
        side_a.unionByName(side_b)
        .groupBy("i", "j")
        .applyInPandas(verify, "vec_a long, vec_b long, cos_sim double")
    )


def hyperplane_bucket(
    df: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH bucket id: sign bits against ``num_planes`` fixed hyperplanes.

    Near-identical vectors land in the same bucket with high
    probability; search cost drops from O(corpus) to O(bucket).
    Vectorized: the plane matrix is built once per partition and the
    whole Arrow batch is one BLAS matmul + sign-bit pack — replacing
    ``num_planes`` interpreted per-row folds (the hot-path trap this
    module documents on ``dot``)."""
    from pyspark.sql.types import LongType, StructField, StructType

    def gen(batches):
        import numpy as np

        P = np.array(
            [[_hp_component(p, j) for j in range(dim)] for p in range(num_planes)],
            dtype=np.float64,
        )
        for pdf in batches:
            out = pdf.copy()
            if len(pdf):
                M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                bits = (M @ P.T >= 0).astype(np.int64)
                out["bucket"] = (bits << np.arange(num_planes)).sum(axis=1)
            else:
                out["bucket"] = np.array([], dtype=np.int64)
            yield out

    out_schema = StructType(df.schema.fields + [StructField("bucket", LongType())])
    return df.mapInPandas(gen, out_schema)


def _footer_row_estimate(df, max_footers: int = 256) -> int | None:
    """Approximate row count of a file-backed frame from parquet
    footers — driver-side pyarrow metadata (~ms/footer), NEVER a Spark
    job (a ``count()`` here is a full corpus scan before training even
    starts). Reads at most ``max_footers`` footers and extrapolates by
    the mean; at that file count the estimate only feeds a sampling
    fraction, so extrapolation error is harmless. Returns None for
    frames with no file lineage (in-memory test frames)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    paths = []
    for f in files:
        p = f[len("file:"):] if f.startswith("file:") else f
        if not p.endswith(".parquet") or not os.path.exists(p):
            return None
        paths.append(p)
    if not paths:
        return None
    import pyarrow.parquet as pq

    sampled = paths[:max_footers]
    rows = sum(pq.ParquetFile(p).metadata.num_rows for p in sampled)
    return int(rows * len(paths) / len(sampled))


def _train_ivf_centers(
    corpus_v, n_cells: int, train_rows_per_cell: int, approx_rows: int | None = None
):
    """Seeded numpy Lloyd's k-means over a sample capped at
    train_rows_per_cell × n_cells rows — the ONLY driver
    materialization in the IVF path, bounded by construction.

    Sample sizing never runs a Spark job on file-backed corpora: the
    row count comes from ``approx_rows`` (caller metadata, e.g.
    ``tables.table_rows``) or parquet footers of the frame's own input
    files. ``count()`` remains only as the fallback for in-memory
    frames, which are small by construction."""
    import numpy as np

    cap = train_rows_per_cell * n_cells
    n = approx_rows if approx_rows is not None else _footer_row_estimate(corpus_v)
    if n is None:
        n = corpus_v.count()
    if n > cap:
        # slight over-sample absorbs footer-estimate error; the
        # deterministic trim below restores the exact cap
        train = corpus_v.sample(min(1.0, 1.2 * cap / n), seed=42)
    else:
        train = corpus_v
    X = np.array([r["cv"] for r in train.select("cv").collect()], dtype=np.float64)
    if len(X) > cap:
        X = X[:cap]
    if len(X) < n_cells:
        # pathological under-sample (estimate far off): re-collect a
        # BOUNDED slice rather than train degenerate centers. limit()
        # keeps the driver materialization capped even if the corpus is
        # huge and the footer estimate was arbitrarily wrong (r6
        # verdict: the previous full-corpus collect() fallback was
        # unbounded at scale).
        X = np.array(
            [r["cv"] for r in corpus_v.select("cv").limit(cap).collect()],
            dtype=np.float64,
        )
        if len(X) < n_cells:
            raise ValueError(
                f"IVF training needs >= {n_cells} rows; corpus has {len(X)}"
            )

    rng = np.random.default_rng(42)
    centers = X[rng.choice(len(X), size=n_cells, replace=False)]
    for _ in range(8):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        for c in range(n_cells):
            members = X[lab == c]
            if len(members):
                centers[c] = members.mean(axis=0)
    return centers


def _assign_cells(corpus_v, centers):
    import numpy as np

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf["cv"].tolist(), dtype=np.float64)
            # SAME algebraic form as the oracle's assignment ORDER BY —
            # (v·v − 2 v·c) + c·c, not the ½||c||² matmul shortcut — so
            # both engines rank the same operand values to within
            # summation-order ulps (r7 ADVICE: forms differing by more
            # than accumulation order can flip a near-tie)
            D = ((M * M).sum(axis=1)[:, None] - 2.0 * (M @ centers.T)) + (
                centers * centers
            ).sum(axis=1)
            out = pdf[["neighbor_id", "cv"]].copy()
            out["cell"] = D.argmin(axis=1).astype(np.int32)
            yield out

    return corpus_v.mapInPandas(
        assign, "neighbor_id long, cv array<double>, cell int"
    )


def ivf_assign(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_rows_per_cell: int = 256,
    approx_rows: int | None = None,
):
    """Public IVF cell assignment: (corpus rows + ``cell`` column,
    trained centers). This is the 100 TB layout step made executable
    rather than aspirational: write the result partitioned by ``cell``
    (sinks.write_partitioned) and an ``n_probe``-cell query becomes a
    partition-pruned scan that never opens the other cells' files —
    plan-audited in tests/test_plans.py. The centers come back so the
    probe side can pick its cells driver-side (n_cells × dim floats)."""
    corpus_v = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    centers = _train_ivf_centers(
        corpus_v, n_cells, train_rows_per_cell, approx_rows=approx_rows
    )
    return _assign_cells(corpus_v, centers), centers


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_rows_per_cell: int = 256,
    approx_rows: int | None = None,
) -> DataFrame:
    """IVF approximate top-k (the inverted-file coarse quantizer of
    Jégou et al., "Product quantization for nearest neighbor search",
    TPAMI 2011 — without the PQ residual codes): seeded k-means cells,
    each query probes its ``n_probe`` nearest cells only.

    The classic trained-ANN layout: search cost drops from O(corpus)
    to O(n_probe/n_cells · corpus). ``n_probe == n_cells`` degenerates
    to exhaustive search and must equal cosine_topk exactly (tested —
    full probe covers every cell regardless of where the centroids
    trained).

    Training: seeded Lloyd's k-means in numpy over a sample capped at
    ``train_rows_per_cell × n_cells`` rows — the ONLY driver
    materialization, bounded by construction regardless of corpus size
    (an iterative MLlib fit costs a full Spark job per pass; on a
    capped sample the driver loop is strictly faster and deterministic).
    Cell ASSIGNMENT of the full corpus is one distributed BLAS pass
    (mapInPandas against the broadcast centroids). At 100 TB store
    ``cell`` as a partition column so probes become partition-pruned
    scans.
    """
    import numpy as np

    if n_probe >= n_cells:
        # Full probe visits every cell no matter where the centroids
        # landed — the result is DEFINED to equal exhaustive search
        # (pinned by test_ivf_full_probe_equals_exact). Skip the
        # count/sample/Lloyd/assign jobs entirely and run the exact
        # scorer: ~5 Spark jobs and 8 driver k-means iterations saved,
        # identical output, at any corpus size. (Small-corpus partial
        # probe intentionally does NOT delegate: that would silently
        # turn approximate recall into exact recall and the partial-
        # probe containment semantics would go untested.)
        return cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)

    spark = corpus.sparkSession
    corpus_v = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    centers = _train_ivf_centers(
        corpus_v, n_cells, train_rows_per_cell, approx_rows=approx_rows
    )
    assigned = _assign_cells(corpus_v, centers)
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
    scored = _batch_cosine(
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
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
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        "bucket",
    )
    qb = hyperplane_bucket(queries, num_planes, dim, vec_col).select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = _batch_cosine(
        F.broadcast(qb)
        .join(
            cb,
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", "qv", "cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Per-dimension scalar quantization to ``levels`` integer codes
    (byte/uint8 range by default: 0..254 — NOT signed int8) — the storage play that turns a 100 TB
    float corpus into ~1/4 the bytes before ANN indexing: per dimension
    the GLOBAL [min, max] becomes the codebook, each value maps to
    ``floor((v - lo) * (levels-1) / (hi - lo) + 0.5)``, and the max
    absolute reconstruction error per vector is emitted alongside the
    codes. Every arithmetic step applies identical IEEE ops to
    identical operands, so codes AND the error doubles are bit-exact
    cross-engine — no rounding tolerance anywhere.

    Plan shape: one posexplode + groupBy(dim) produces a DIMENSION-
    sized codebook (64 rows for d=64) that broadcasts back onto the
    exploded values; re-assembly is a groupBy(vec) of (dim, code)
    structs sorted in-array. Two narrow shuffles total (dim-sized and
    vector-sized), no Python, no driver collect."""
    vals = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val"),
    )
    book = vals.groupBy("dim").agg(
        F.min("val").alias("lo"), F.max("val").alias("hi")
    )
    span = F.col("hi") - F.col("lo")
    code = F.when(span == 0, F.lit(0)).otherwise(
        F.floor((F.col("val") - F.col("lo")) * (levels - 1) / span + 0.5)
    ).cast("int")
    recon = F.when(span == 0, F.col("lo")).otherwise(
        F.col("lo") + F.col("code") * span / (levels - 1)
    )
    coded = (
        vals.join(F.broadcast(book), "dim")
        .withColumn("code", code)
        .withColumn("err", F.abs(F.col("val") - recon))
    )
    return (
        coded.groupBy("__id")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "code"))).alias("__dc"),
            F.max("err").alias("max_err"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.array_join(
                F.transform(F.col("__dc"), lambda s: s["code"].cast("string")), ","
            ).alias("codes"),
            "max_err",
        )
    )


def source_centroid_cosines(
    docs: DataFrame,
    emb: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Domain-shift diagnostics: per-group embedding centroid, then the
    pairwise cosine between group centroids — the quick answer to "is
    crawl B just crawl A again?" at the distribution level (the
    per-document answer is the near-dup path).

    Plan: one posexplode to (group, dim, value) — the shuffle key is
    (group, dim), so centroid computation is fully parallel and never
    materializes a vector per group in one task; centroid components
    round to 6 (mean accumulation order differs per engine) and the
    pair cosine is computed FROM the rounded components (identical
    inputs → identical outputs) with one dim-keyed self-join bounded by
    groups², then rounded again."""
    joined = emb.join(
        docs.select(F.col(id_col).alias(vec_id_col), F.col(group_col).alias("g")),
        vec_id_col,
    )
    dims = (
        joined.select(
            "g",
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v"),
        )
        .groupBy("g", "dim")
        .agg(F.round(F.avg("v"), 6).alias("c"))
    )
    a = dims.select(F.col("g").alias("source_a"), "dim", F.col("c").alias("ca"))
    b = dims.select(F.col("g").alias("source_b"), "dim", F.col("c").alias("cb"))
    return (
        a.join(b, "dim")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.sum(F.col("ca") * F.col("cb"))
                / (
                    F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                    * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
                ),
                6,
            ).alias("centroid_cos")
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half): Jégou et al.,
# "Product quantization for nearest neighbor search", TPAMI 2011.
# ---------------------------------------------------------------------------


def pq_train(
    corpus: DataFrame,
    m_sub: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    train_cap: int = 4096,
    approx_rows: int | None = None,
):
    """Train PQ codebooks: the vector is split into ``m_sub``
    contiguous subvectors and each subspace gets its own ``n_codes``-
    center seeded k-means — memory per vector drops from d floats to
    ``m_sub`` small ints (32x at d=64, m=8, 16 codes) while distances
    stay computable from the codes alone (``pq_topk``). Training
    follows the IVF discipline: a bounded driver sample sized from
    parquet footers (never a count job), seeded numpy Lloyd's.
    Returns ``codebooks`` shaped (m_sub, n_codes, d//m_sub)."""
    import numpy as np

    corpus_v = corpus.select(F.col(vec_col).cast("array<double>").alias("cv"))
    n = approx_rows if approx_rows is not None else _footer_row_estimate(corpus_v)
    if n is None:
        n = corpus_v.count()
    if n > train_cap:
        train = corpus_v.sample(min(1.0, 1.2 * train_cap / n), seed=42)
    else:
        train = corpus_v
    X = np.array([r["cv"] for r in train.collect()], dtype=np.float64)
    if len(X) > train_cap:
        X = X[:train_cap]
    if len(X) < n_codes:
        # pathological under-sample (footer estimate far off): bounded
        # re-collect, mirroring _train_ivf_centers — rng.choice with
        # replace=False would raise on a short sample (r6 advice).
        X = np.array(
            [r["cv"] for r in corpus_v.limit(train_cap).collect()],
            dtype=np.float64,
        )
        if len(X) < n_codes:
            raise ValueError(
                f"PQ training needs >= {n_codes} rows; corpus has {len(X)}"
            )
    d = X.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    dsub = d // m_sub
    rng = np.random.default_rng(42)
    books = np.empty((m_sub, n_codes, dsub))
    for m in range(m_sub):
        S = X[:, m * dsub : (m + 1) * dsub]
        centers = S[rng.choice(len(S), size=n_codes, replace=False)]
        for _ in range(8):
            d2 = ((S[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            lab = d2.argmin(axis=1)
            for c in range(n_codes):
                members = S[lab == c]
                if len(members):
                    centers[c] = members.mean(axis=0)
        books[m] = centers
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector its ``m_sub`` nearest-codebook-entry codes —
    one distributed BLAS pass against the broadcast codebooks (the
    tiny (m·k·dsub) array rides the closure). Output
    (neighbor_id, codes array<int>): the 100 TB ANN layout stores
    THIS instead of raw vectors."""
    import numpy as np

    books = codebooks
    m_sub, n_codes, dsub = books.shape

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(M), m_sub), dtype=np.int32)
            for m in range(m_sub):
                S = M[:, m * dsub : (m + 1) * dsub]
                # oracle's expanded form (s·s − 2 s·e) + e·e, argmin
                D = ((S * S).sum(axis=1)[:, None] - 2.0 * (S @ books[m].T)) + (
                    books[m] * books[m]
                ).sum(axis=1)
                codes[:, m] = D.argmin(axis=1)
            out = pdf[[id_col]].copy()
            out.columns = ["neighbor_id"]
            out["codes"] = list(codes)
            yield out

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, "neighbor_id long, codes array<int>"
    )


def pq_reconstruct(codes, codebooks):
    """Decode codes back to the quantized vector (numpy, test/audit
    helper): concat of the selected codebook entries."""
    import numpy as np

    m_sub, _, dsub = codebooks.shape
    return np.concatenate(
        [codebooks[m][codes[m]] for m in range(m_sub)]
    )


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, a
    (m_sub × n_codes) lookup table of partial squared distances to
    every codebook entry is built driver-side (tiny), broadcast, and
    each code row scores as m_sub TABLE LOOKUPS + a sum — no float
    vector is ever touched on the corpus side. By construction
    ADC(q, codes) == ||q − reconstruct(codes)||² exactly (the
    decomposition is algebraic, pinned by test), so ranking equals
    exact search over the QUANTIZED corpus; quantization error is the
    only approximation (measured recall test). Scale shape: corpus
    scan of int codes, broadcast LUTs, per-query top-k via window."""
    import numpy as np

    books = codebooks
    m_sub, n_codes, dsub = books.shape
    q_rows = queries.select(id_col, vec_col).collect()
    luts = {}
    for r in q_rows:
        qv = np.asarray(list(r[1]), dtype=np.float64)
        lut = np.empty((m_sub, n_codes))
        for m in range(m_sub):
            qs = qv[m * dsub : (m + 1) * dsub]
            # oracle's expanded form (q·q − 2 q·e) + e·e — the rounded
            # adc_dist must agree with DuckDB at the round(,6) boundary
            # to summation-order ulps, so both sides evaluate the same
            # operands in the same association
            lut[m] = ((qs @ qs) - 2.0 * (books[m] @ qs)) + (
                books[m] * books[m]
            ).sum(axis=1)
        luts[int(r[0])] = lut

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf["neighbor_id"].to_numpy()
            for qid, lut in luts.items():
                # gather: Σ_m lut[m, code_m] per row
                dist = lut[np.arange(m_sub)[None, :], C].sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(ids), qid, dtype=np.int64),
                        "neighbor_id": ids,
                        "adc_dist": dist,
                    }
                )

    scored = codes_df.mapInPandas(
        score, "query_id long, neighbor_id long, adc_dist double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rk")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the two halves composed — coarse k-means cells (ivf_topk's
# quantizer) + product-quantized RESIDUALS searched by ADC within the
# probed cells only. This is the billion-scale ANN configuration of
# Jégou et al., "Product quantization for nearest neighbor search",
# TPAMI 2011 (IVFADC, §5): search cost drops to
# O(n_probe/n_cells · corpus) AND the per-vector memory drops from
# d floats to m_sub bytes-ish codes; raw vectors are never shuffled
# or stored in the index.
# ---------------------------------------------------------------------------


def _lloyd_subspaces(X, m_sub: int, n_codes: int, iters: int = 8):
    """Seeded per-subspace Lloyd's k-means over a driver sample
    (numpy). Shared by pq_train and ivfpq residual training."""
    import numpy as np

    d = X.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    dsub = d // m_sub
    rng = np.random.default_rng(42)
    books = np.empty((m_sub, n_codes, dsub))
    for m in range(m_sub):
        S = X[:, m * dsub : (m + 1) * dsub]
        centers = S[rng.choice(len(S), size=n_codes, replace=False)]
        for _ in range(iters):
            d2 = ((S[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            lab = d2.argmin(axis=1)
            for c in range(n_codes):
                members = S[lab == c]
                if len(members):
                    centers[c] = members.mean(axis=0)
        books[m] = centers
    return books


def _first_vectors_by_id(corpus_v, n: int):
    """The n lowest-id vectors as a numpy array — the deterministic,
    cross-engine-reproducible 'sample init / zero Lloyd iterations'
    training used by the oracle-checked registry row (a DuckDB oracle
    cannot run k-means; random-sample init IS the standard k-means
    seed, so this is the t=0 point of the same algorithm). Bounded
    driver materialization: exactly n rows."""
    import numpy as np

    rows = corpus_v.orderBy("neighbor_id").limit(n).collect()
    if len(rows) < n:
        raise ValueError(f"need >= {n} rows for deterministic init")
    return np.array([r["cv"] for r in rows], dtype=np.float64)


def _ivfpq_assign(X, centers):
    """Nearest cell + residual per row. Distances use the oracle's own
    expanded form (v·v − 2 v·c) + c·c — not the ½||c||² matmul
    shortcut — so a near-tie ranks identically in both engines; argmin
    ties -> lowest cell, matching the oracle's ORDER BY d2, cell."""
    D = ((X * X).sum(axis=1)[:, None] - 2.0 * (X @ centers.T)) + (
        centers * centers
    ).sum(axis=1)
    cells = D.argmin(axis=1)
    return X - centers[cells], cells


def ivfpq_index(
    corpus: DataFrame,
    n_cells: int = 16,
    m_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_rows_per_cell: int = 256,
    pq_train_cap: int = 4096,
    deterministic_init: bool = False,
    approx_rows: int | None = None,
):
    """Build the IVF-PQ index: returns ``(codes_df, centers, books)``
    where ``codes_df`` is (neighbor_id, cell, codes array<int>) — the
    100 TB layout stores THIS, partitioned by ``cell`` (raw vectors
    dropped; ~m_sub small ints per vector), and a probe becomes a
    partition-pruned scan of ``n_probe`` directories (plan-audited in
    tests/test_plans.py). ``centers``/``books`` are tiny numpy arrays
    the caller keeps driver-side (or re-derives — training is seeded).

    Index construction (all distributed, one Arrow/BLAS pass each):
      1. coarse quantizer: ``n_cells`` k-means centers (bounded driver
         sample, seeded Lloyd's — or, with ``deterministic_init``, the
         ``n_cells`` lowest-id vectors: sample init, zero iterations,
         reproducible by the DuckDB oracle);
      2. every corpus vector is assigned its nearest cell and reduced
         to the RESIDUAL v − c(cell) — residuals are what PQ encodes
         (Jégou §5: residual energy ≪ vector energy, so the same code
         budget buys far lower quantization error);
      3. per-subspace codebooks over residuals (``m_sub`` × ``n_codes``),
         trained on a bounded sample (or lowest-id residuals under
         ``deterministic_init``);
      4. one encode pass → (neighbor_id, cell, codes).
    """
    import numpy as np

    corpus_v = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    if deterministic_init:
        centers = _first_vectors_by_id(corpus_v, n_cells)
    else:
        centers = _train_ivf_centers(
            corpus_v, n_cells, train_rows_per_cell, approx_rows=approx_rows
        )
    dim = centers.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub

    # --- residual PQ codebooks (driver-side, bounded)
    if deterministic_init:
        R0, _ = _ivfpq_assign(_first_vectors_by_id(corpus_v, n_codes), centers)
        books = np.stack(
            [R0[:, m * dsub : (m + 1) * dsub] for m in range(m_sub)]
        )
    else:
        n = (
            approx_rows
            if approx_rows is not None
            else _footer_row_estimate(corpus_v)
        )
        if n is None:
            n = corpus_v.count()
        if n > pq_train_cap:
            train = corpus_v.sample(min(1.0, 1.2 * pq_train_cap / n), seed=42)
        else:
            train = corpus_v
        X = np.array(
            [r["cv"] for r in train.select("cv").collect()], dtype=np.float64
        )
        if len(X) > pq_train_cap:
            X = X[:pq_train_cap]
        if len(X) < n_codes:
            X = np.array(
                [r["cv"] for r in corpus_v.select("cv").limit(pq_train_cap).collect()],
                dtype=np.float64,
            )
            if len(X) < n_codes:
                raise ValueError(
                    f"IVF-PQ training needs >= {n_codes} rows; corpus has {len(X)}"
                )
        R, _ = _ivfpq_assign(X, centers)
        books = _lloyd_subspaces(R, m_sub, n_codes)

    codes_df = ivfpq_encode(corpus, centers, books, id_col=id_col, vec_col=vec_col)
    return codes_df, centers, books


def ivfpq_encode(
    vectors: DataFrame,
    centers,
    books,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against a FIXED trained index (centers + books):
    one distributed Arrow/BLAS pass → (neighbor_id, cell, codes).
    This is the index-maintenance primitive — newly arriving vectors
    encode and APPEND to the cell-partitioned code store without
    retraining or touching existing rows (streaming e2e pinned in
    tests); quantizers retrain on a schedule, not per batch."""
    import numpy as np

    m_sub, n_codes, dsub = books.shape
    corpus_v = vectors.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf["cv"].tolist(), dtype=np.float64)
            R, cells = _ivfpq_assign(M, centers)
            codes = np.empty((len(M), m_sub), dtype=np.int32)
            for m in range(m_sub):
                S = R[:, m * dsub : (m + 1) * dsub]
                # oracle's expanded form (r·r − 2 r·e) + e·e, argmin
                D = ((S * S).sum(axis=1)[:, None] - 2.0 * (S @ books[m].T)) + (
                    books[m] * books[m]
                ).sum(axis=1)
                codes[:, m] = D.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cell": cells.astype("int32"),
                    "codes": list(codes),
                }
            )

    return corpus_v.mapInPandas(
        enc, "neighbor_id long, cell int, codes array<int>"
    )


def _probe_residuals(q_rows, centers, n_probe):
    """Per-query probe list + residual payload for :func:`ivfpq_search`:
    for each query, its ``n_probe`` nearest cells (stable argsort, ties
    by cell id) and the d-dim residual against each probed centroid.
    The residual dict is what ships to executors — d doubles per probe,
    NOT the (m_sub × n_codes) LUT, so the payload is independent of the
    PQ codebook size (pinned by test_ivfpq_residual_payload_bounded)."""
    import numpy as np

    residuals = {}
    probe_rows = []
    for r in q_rows:
        qid = int(r[0])
        qv = np.asarray(list(r[1]), dtype=np.float64)
        # oracle's expanded probe ordering (q·q − 2 q·c) + c·c
        d2 = ((qv @ qv) - 2.0 * (centers @ qv)) + (centers * centers).sum(
            axis=1
        )
        for cell in np.argsort(d2, kind="stable")[:n_probe]:
            cell = int(cell)
            residuals[(qid, cell)] = qv - centers[cell]
            probe_rows.append((qid, cell))
    return residuals, probe_rows


def ivfpq_search(
    codes_df: DataFrame,
    centers,
    books,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC search over an ``ivfpq_index`` (stored or in-flight): each
    query picks its ``n_probe`` nearest cells driver-side (centers are
    tiny), builds one (m_sub × n_codes) LUT of partial squared
    distances PER PROBED CELL from the query's residual in that cell,
    and every code row in a probed cell scores as m_sub table lookups
    + a sum. Corpus-side work is a scan of int codes in the probed
    cells only — no float vector is touched; when ``codes_df`` is read
    from a cell-partitioned store, the cell filter is partition
    pruning and the un-probed cells' files are never opened.

    Output (query_id, neighbor_id, adc_dist, rk) — same shape as
    pq_topk; on unit-norm embeddings the L2 ranking is the cosine
    ranking (recall-floor vs exact cosine pinned in tests).

    LUTs are NOT built driver-side: the driver ships only each query's
    d-dim residual per probed cell (an ``sc.broadcast``, torrent-
    distributed once per executor — not a per-task pickled closure),
    and each worker derives the (m_sub × n_codes) LUT from the
    broadcast codebooks on first use (microseconds of numpy, memoized
    per task). Payload per probe is d doubles, independent of
    m_sub × n_codes — a 100k-query batch at d=64/n_probe=8 ships
    ~410 MB of residuals where the 8×256 LUTs would be ~13 GB."""
    import numpy as np

    m_sub, n_codes, dsub = books.shape
    spark = codes_df.sparkSession
    q_rows = queries.select(id_col, vec_col).collect()
    residuals, probe_rows = _probe_residuals(q_rows, centers, n_probe)
    bc = spark.sparkContext.broadcast((books, residuals))
    probes = spark.createDataFrame(probe_rows, "query_id long, cell int")
    # STATIC filter on the union of probed cells: on a cell-partitioned
    # store this is planning-time partition pruning (the un-probed
    # cells' files are never opened — pinned by test_plans); the
    # broadcast join alone would rely on dynamic partition pruning
    # kicking in, which Spark may decline for small in-memory dims.
    probed_cells = sorted({cell for _, cell in probe_rows})
    pruned = codes_df.filter(F.col("cell").isin(probed_cells))

    def score(batches):
        import pandas as pd

        w_books, w_res = bc.value
        lut_cache = {}

        def lut_for(key):
            lut = lut_cache.get(key)
            if lut is None:
                qr = w_res[key]
                lut = np.empty((m_sub, n_codes))
                for m in range(m_sub):
                    qs = qr[m * dsub : (m + 1) * dsub]
                    # oracle's expanded form (r·r − 2 r·e) + e·e (see
                    # pq_topk: rounded adc_dist parity at the round(,6)
                    # boundary needs identical operands/association)
                    lut[m] = ((qs @ qs) - 2.0 * (w_books[m] @ qs)) + (
                        w_books[m] * w_books[m]
                    ).sum(axis=1)
                lut_cache[key] = lut
            return lut

        for pdf in batches:
            if not len(pdf):
                continue
            for (qid, cell), g in pdf.groupby(["query_id", "cell"]):
                lut = lut_for((int(qid), int(cell)))
                C = np.array(g["codes"].tolist(), dtype=np.int64)
                dist = lut[np.arange(m_sub)[None, :], C].sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(g), qid, dtype=np.int64),
                        "neighbor_id": g["neighbor_id"].to_numpy(),
                        "adc_dist": dist,
                    }
                )

    scored = (
        F.broadcast(probes)
        .join(pruned, "cell")
        .select("query_id", "cell", "neighbor_id", "codes")
        .mapInPandas(score, "query_id long, neighbor_id long, adc_dist double")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rk")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    m_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_rows_per_cell: int = 256,
    pq_train_cap: int = 4096,
    deterministic_init: bool = False,
    approx_rows: int | None = None,
) -> DataFrame:
    """IVF-PQ (IVFADC) approximate top-k in one call:
    :func:`ivfpq_index` + :func:`ivfpq_search`. See those for the
    index layout and the ADC search shape."""
    codes_df, centers, books = ivfpq_index(
        corpus,
        n_cells=n_cells,
        m_sub=m_sub,
        n_codes=n_codes,
        id_col=id_col,
        vec_col=vec_col,
        train_rows_per_cell=train_rows_per_cell,
        pq_train_cap=pq_train_cap,
        deterministic_init=deterministic_init,
        approx_rows=approx_rows,
    )
    return ivfpq_search(
        codes_df, centers, books, queries, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )


def ivfpq_topk_refined(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 4,
    n_cells: int = 16,
    n_probe: int = 2,
    m_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_rows_per_cell: int = 256,
    pq_train_cap: int = 4096,
    deterministic_init: bool = False,
    approx_rows: int | None = None,
) -> DataFrame:
    """IVF-PQ with EXACT re-ranking (Jégou §5.3 refinement — the
    standard production configuration): the ADC search produces a
    shortlist of ``rerank × k`` candidates per query from codes alone,
    then ONLY those candidate ids join back to the raw vectors for an
    exact cosine re-score and the final top-``k``. The expensive float
    vectors are touched for k·rerank rows per query instead of the
    whole corpus — at 100 TB that's a point-lookup-sized semi-join
    against the vector store, and recall strictly improves because the
    quantization error no longer orders the final list (pinned by
    test: recall(refined) ≥ recall(ADC))."""
    shortlist = ivfpq_topk(
        corpus,
        queries,
        k=k * rerank,
        n_cells=n_cells,
        n_probe=n_probe,
        m_sub=m_sub,
        n_codes=n_codes,
        id_col=id_col,
        vec_col=vec_col,
        train_rows_per_cell=train_rows_per_cell,
        pq_train_cap=pq_train_cap,
        deterministic_init=deterministic_init,
        approx_rows=approx_rows,
    ).select("query_id", "neighbor_id")
    c = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = _batch_cosine(
        shortlist.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", "qv", "cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def semantic_dedup(
    corpus: DataFrame,
    eps: float = 0.3,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "far",
    train_rows_per_cell: int = 256,
    deterministic_init: bool = False,
    approx_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication in embedding space — cluster with k-means, then
    within each cluster greedily drop any member whose cosine
    similarity to a HIGHER-PRIORITY member reaches ``eps``.

    Priority is the paper's ordering: members sort by similarity to
    their cluster centroid (``keep="far"`` keeps low-centroid-sim
    examples first — the configuration the paper found best preserves
    diversity; ``keep="near"`` keeps prototypical examples first),
    ties broken by id. A member is a duplicate iff its max cosine to
    any EARLIER member in that order is >= ``eps`` — exactly the
    upper-triangular-max formulation of the reference implementation,
    independent of whether the earlier member was itself dropped.

    Scale shape: the quadratic pairwise step never leaves a cluster —
    k-means (bounded driver sample, see :func:`_train_ivf_centers`)
    splits the corpus into ``n_cells`` cells, one distributed BLAS
    assignment pass (:func:`_assign_cells`), then ONE applyInPandas
    task per cell computes its chunked Gram matrix (1024-row strips,
    so peak memory is strip × cell, not cell²). Size ``n_cells`` ≈
    corpus/target_cell so a cell fits an executor — the same knob the
    paper runs at web scale. Cross-cluster near-dups are invisible by
    construction (the paper's accepted approximation; raise
    ``n_cells`` quality via more Lloyd iterations, or catch the
    residue with the exact :func:`cosine_all_pairs` on the survivors).

    Returns one row per input: (id, cell, cent_sim, max_prior_sim,
    is_dup) — ``cent_sim`` doubles as the D4/prototypicality curation
    score. All similarities round to 6 (DuckDB-reproducible); with
    ``deterministic_init`` the WHOLE pipeline (centers = lowest-id
    vectors, zero Lloyd iterations = k-means' t=0) is under full SQL
    oracle in the registry (Q_SEMANTIC_DEDUP_SQL).
    """
    import numpy as np

    if keep not in ("far", "near"):
        raise ValueError(f"keep must be 'far' or 'near', got {keep!r}")
    corpus_v = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    if deterministic_init:
        centers = _first_vectors_by_id(corpus_v, n_cells)
    else:
        centers = _train_ivf_centers(
            corpus_v, n_cells, train_rows_per_cell, approx_rows=approx_rows
        )
    assigned = _assign_cells(corpus_v, centers)
    cnorms = np.linalg.norm(centers, axis=1)
    far = keep == "far"

    def dedup_cell(pdf):
        import pandas as pd

        cell = int(pdf["cell"].iloc[0])
        ids = pdf["neighbor_id"].to_numpy(np.int64)
        M = np.array(pdf["cv"].tolist(), dtype=np.float64)
        # dot-then-divide, the oracle's exact cosine form
        # dot(a,b)/(sqrt(dot(a,a))·sqrt(dot(b,b))) — NOT normalize-then-
        # dot, which evaluates different FP operands and could disagree
        # at a round(,6) boundary (r7 ADVICE)
        norms = np.linalg.norm(M, axis=1)
        cs = np.round((M @ centers[cell]) / (norms * cnorms[cell]), 6)
        order = np.lexsort((ids, cs if far else -cs))
        Mo, ids_o, cs_o, norms_o = M[order], ids[order], cs[order], norms[order]
        n = len(ids_o)
        mx = np.full(n, -np.inf)
        for s in range(0, n, 1024):
            e = min(s + 1024, n)
            S = np.round(
                (Mo[s:e] @ Mo[:e].T)
                / (norms_o[s:e, None] * norms_o[None, :e]),
                6,
            )
            S = np.where(
                np.arange(e)[None, :] < np.arange(s, e)[:, None], S, -np.inf
            )
            mx[s:e] = S.max(axis=1)
        seen = np.isfinite(mx)
        return pd.DataFrame(
            {
                id_col: ids_o,
                "cell": np.int32(cell),
                "cent_sim": cs_o,
                # None (not NaN) where no prior member exists — Spark
                # NULL, matching the oracle's LEFT-JOIN-no-match
                "max_prior_sim": [float(v) if f else None for v, f in zip(mx, seen)],
                "is_dup": seen & (mx >= eps),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        dedup_cell,
        f"{id_col} long, cell int, cent_sim double, "
        "max_prior_sim double, is_dup boolean",
    )


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 16,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection, Achlioptas 2003
    "Database-friendly random projections" (the ±1 variant): project
    d-dim vectors to k dims through a deterministic sign matrix
    R[j][i] = ±1 derived from the cross-engine md5 bit of
    ``rp:i:j``, scaled by 1/sqrt(k) — with k a perfect square the
    scale is an exact dyadic rational, and every projected coordinate
    is an ORDER-PINNED left fold over the input dims, so both engines
    produce bit-identical doubles with no rounding anywhere.

    The matrix lives in ONE broadcast row (k·d signs — bytes, not a
    driver-side collect); each row's projection is k ordered folds in
    the scan stage, no shuffle at all. At cluster scale this is the
    dimensionality-reduction front of the ANN stack (project → then
    IVF/LSH the short vectors); squared norms ride along so the JL
    distortion is itself observable in the output."""
    root = k**0.5
    if root != int(root):
        raise ValueError("k must be a perfect square for the exact scale")
    sign = lambda i, j: 1 - 2 * F.conv(
        F.substring(
            F.md5(F.concat(F.lit("rp:"), i.cast("string"), F.lit(":"), j.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long").bitwiseAND(F.lit(1))
    rmat = df.sparkSession.range(1).select(
        F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda j: F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: sign(i, j).cast("double"),
            ),
        ).alias("R")
    )
    v = F.col(vec_col).cast("array<double>")
    fold = lambda terms: F.aggregate(
        terms, F.lit(0.0), lambda acc, x: acc + x
    )
    proj = F.transform(
        F.sequence(F.lit(1), F.lit(k)),
        lambda j: fold(
            F.zip_with(
                v,
                F.element_at(F.col("R"), j),
                lambda a, r: a * r,
            )
        )
        / F.lit(float(int(root))),
    )
    n2 = lambda arr: fold(F.zip_with(arr, arr, lambda a, b: a * b))
    return df.crossJoin(F.broadcast(rmat)).select(
        F.col(id_col),
        proj.alias("proj"),
        n2(v).alias("n2_orig"),
        n2(proj).alias("n2_proj"),
    )


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 10_000,
) -> DataFrame:
    """EXACT distributed Gram-matrix accumulation G = XᵀX over the
    embedding corpus — the second-moment primitive behind PCA,
    covariance, ridge regression and whitening at 100 TB (the full-d
    sibling of pca_features' closed-form 2-D case): vectors quantize
    to integers (floor(v·scale) — float→double is exact, one double
    multiply, floor; identical in both engines), so every entry of G
    is an exact BIGINT and the oracle reproduces it bit-for-bit.

    Scale shape — the blocked-BLAS map-side combine: each Arrow batch
    contributes a d×d numpy int64 QᵀQ block; one partial matrix per
    PARTITION ships (d(d+1)/2 rows — KBs), and a single bounded
    groupBy sums blocks. The data-sized table never shuffles and no
    (row × d²) explode ever materializes — that form survives only as
    the independent DuckDB oracle formulation. Eigendecomposition of
    the returned 64×64 is a driver-side afterthought (the bounded
    argmax pattern). Returns (i, j, s) for the upper triangle,
    1-indexed."""
    import numpy as np
    import pandas as pd

    d = int(dim)

    def gram(batches):
        acc = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            m = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            q = np.floor(m * float(scale)).astype(np.int64)
            acc += q.T @ q
        iu = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": (iu[0] + 1).astype("int64"),
                "j": (iu[1] + 1).astype("int64"),
                "s": acc[iu],
            }
        )

    return (
        df.select(F.col(vec_col).cast("array<double>").alias("__v"))
        .mapInPandas(gram, "i long, j long, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )


def _knn_hubness_single_task(
    df: DataFrame,
    kk: int,
    id_col: str,
    vec_col: str,
    levels: int,
    sample_hex: int | None,
) -> DataFrame:
    """Bounded single-task twin of :func:`knn_hubness`: identical
    full-corpus codebook and quantization arithmetic (IEEE-identical
    numpy elementwise chain), identical md5-digit sampling, exact
    top-k by the same composite (dot·2²¹ − id) key (all keys distinct
    — ids are unique — so the k-NN SET is unique and selection order
    is irrelevant to the N_k counts), and the identical pinned-double
    moment/skewness expression tree. Pinned equal by test."""
    lv = int(levels)

    def work(batches):
        import hashlib

        import math

        import numpy as np
        import pandas as pd

        ids_l, v_l = [], []
        for pdf in batches:
            if not len(pdf):
                continue
            ids_l.append(pdf["__id"].to_numpy(np.int64))
            v_l.append(np.array(pdf["__v"].tolist(), dtype=np.float64))
        if not ids_l:
            return
        ids = np.concatenate(ids_l)
        v = np.vstack(v_l)
        assert ids.max(initial=0) < (1 << 21), "knn_hubness: ids >= 2^21"
        lo = v.min(axis=0)
        hi = v.max(axis=0)
        span = hi - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((v - lo) * float(lv - 1) / span + 0.5)
        q[:, span == 0] = 0.0
        if sample_hex is not None:
            thr = "0123456789abcdefg"[int(sample_hex)]
            keep = np.array(
                [
                    hashlib.md5(str(int(i)).encode()).hexdigest()[31] < thr
                    for i in ids
                ]
            )
            ids, q = ids[keep], q[keep]
        n = len(ids)
        if not n:
            return
        take = min(kk, n - 1)
        nk = np.zeros(n, dtype=np.int64)
        ch = 2048
        for s in range(0, n, ch):
            e = min(s + ch, n)
            D = q[s:e] @ q.T
            comp = D.astype(np.int64) * (1 << 21) - ids[None, :]
            comp[np.arange(e - s), np.arange(s, e)] = (
                np.iinfo(np.int64).min // 2
            )
            if take > 0:
                top = np.argpartition(comp, -take, axis=1)[:, -take:]
                nk += np.bincount(top.ravel(), minlength=n)
        sx = int(nk.sum())
        sxx = int((nk * nk).sum())
        sxxx = int((nk * nk * nk).sum())
        nd = float(n)
        mu = float(sx) / nd
        m2 = float(sxx) / nd - mu * mu
        m3 = float(sxxx) / nd - 3.0 * mu * (float(sxx) / nd) + 2.0 * mu * mu * mu
        skew = m3 / (m2 * math.sqrt(m2))
        yield pd.DataFrame(
            {
                "n_vecs": [np.int64(n)],
                "k": [np.int64(kk)],
                "max_nk": [np.int64(nk.max())],
                "n_zero": [np.int64((nk == 0).sum())],
                "skew": [skew],
            }
        )

    e = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    return e.coalesce(1).mapInPandas(
        work, "n_vecs long, k long, max_nk long, n_zero long, skew double"
    )


def knn_hubness(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
    num_blocks: int = 8,
    sample_hex: int | None = None,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """Hubness audit of the embedding space (Radovanović, Nanopoulos &
    Ivanović, JMLR 2010, "Hubs in space: popular nearest neighbors in
    high-dimensional data"): N_k(x) = how often x appears in other
    points' exact k-nearest-neighbor lists; a heavily right-skewed N_k
    distribution (hubs + antihubs) is the known high-dimensional
    failure mode that silently degrades ANN recall and k-NN dedup —
    the ANN-HEALTH self-eval beside lsh_recall's retrieval check.

    Exactness: neighbors rank by the integer dot product of the
    per-dimension scalar-quantized codes (the quantize_embeddings
    formula verbatim — the space the stored index actually searches),
    ties broken by neighbor id, so the k-NN lists, every N_k count and
    the final moments are exact integers; the skewness
    g1 = m3 / (m2·sqrt(m2)) builds its central moments in DOUBLE from
    the exact BIGINT raw sums (Σx, Σx², Σx³ — the trend_lines deny
    lesson) with a pinned sqrt.

    Scale shape: the cosine_all_pairs block discipline — rows hash
    into ``num_blocks`` blocks, a broadcast block-pair index fans each
    block to its ~B pairs, each (i, j) task computes one exact BLAS
    block matmul (float64 is exact here: dots ≤ d·(levels-1)² < 2^53)
    and emits only per-vector PER-BLOCK top-k partials (≤ B·k rows per
    vector); the global top-k merges bounded candidate lists, never
    the matrix. Requires ids < 2^21 (asserted task-side) for the
    composite (dot, id) sort key. Returns one row:
    (n_vecs, k, max_nk, n_zero, skew).

    ``sample_hex`` (0..16) is the SUBQUADRATIC form for corpora where
    even blocked exact all-pairs is too much (the 100 TB audit shape):
    the quantization codebook still comes from the FULL corpus (the
    space the stored index actually searches — one linear pass), then
    the audit keeps only vectors whose md5(id) last hex digit is
    < ``sample_hex`` (a deterministic ~sample_hex/16 uniform sample;
    the calibration_eval split discipline — never id%m, which aliases
    generator strides) and measures hubness of the sampled subspace:
    the quadratic work shrinks by (sample_hex/16)². ``sample_hex=16``
    keeps everything and is pinned equal to the exact form in tests;
    the standard subsampled-hubness estimator otherwise
    (Radovanović §6 uses exactly this design).

    ``n_rows_hint`` (footer-derived, driver-side) under
    ``EPS_SINGLE_TASK_ROWS`` routes to the bounded single-task twin
    (r14); the blocked path below is the above-bound shape."""
    if single_task_ok(n_rows_hint, EPS_SINGLE_TASK_ROWS):
        return _knn_hubness_single_task(
            df, int(k), id_col, vec_col, levels, sample_hex
        )
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    kk = int(k)
    vals = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "dim", "val"
        ),
    )
    book = vals.groupBy("dim").agg(
        F.min("val").alias("lo"), F.max("val").alias("hi")
    )
    span = F.col("hi") - F.col("lo")
    code = (
        F.when(span == 0, F.lit(0))
        .otherwise(
            F.floor(
                (F.col("val") - F.col("lo")) * (levels - 1) / span + 0.5
            )
        )
        .cast("int")
    )
    q = (
        vals.join(F.broadcast(book), "dim")
        .withColumn("code", code)
        .groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "code"))),
                lambda s: s["code"],
            ).alias("__q")
        )
    )
    if sample_hex is not None:
        # single-ASCII-char comparison is engine-identical; index 16
        # of the extended alphabet ('g') keeps every hex digit
        thr = "0123456789abcdefg"[int(sample_hex)]
        q = q.filter(
            F.substring(F.md5(F.col("__id").cast("string")), 32, 1)
            < F.lit(thr)
        )
    rows = q.select(
        F.pmod(F.xxhash64(F.col("__id")), F.lit(num_blocks))
        .cast("int")
        .alias("__blk"),
        "__id",
        "__q",
    )
    index = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)],
        "i int, j int",
    )
    side_a = rows.join(F.broadcast(index), index["i"] == rows["__blk"]).select(
        "i", "j", F.lit(0).alias("__side"), "__id", "__q"
    )
    side_b = rows.join(
        F.broadcast(index.filter(F.col("i") != F.col("j"))),
        index["j"] == rows["__blk"],
    ).select("i", "j", F.lit(1).alias("__side"), "__id", "__q")

    def topk_rows(ids_a, ids_b, D, exclude_self):
        assert ids_b.max(initial=0) < (1 << 21), "knn_hubness: ids >= 2^21"
        comp = D.astype(np.int64) * (1 << 21) - ids_b[None, :]
        if exclude_self:
            eq = ids_a[:, None] == ids_b[None, :]
            comp[eq] = np.iinfo(np.int64).min // 2
        take = min(kk, comp.shape[1])
        order = np.argsort(-comp, axis=1)[:, :take]
        r = np.repeat(ids_a, take)
        c = order.ravel()
        return pd.DataFrame(
            {
                "vec": r,
                "nb": ids_b[c],
                "dot": D[
                    np.repeat(np.arange(len(ids_a)), take), c
                ].astype(np.int64),
            }
        )

    def partial(pdf):
        empty = pd.DataFrame(
            {
                "vec": pd.Series(dtype="int64"),
                "nb": pd.Series(dtype="int64"),
                "dot": pd.Series(dtype="int64"),
            }
        )
        a = pdf[pdf["__side"] == 0]
        if not len(a):
            return empty
        ids_a = a["__id"].to_numpy(dtype=np.int64)
        A = np.array(a["__q"].tolist(), dtype=np.float64)
        if int(pdf["i"].iloc[0]) == int(pdf["j"].iloc[0]):
            D = A @ A.T
            return topk_rows(ids_a, ids_a, D, exclude_self=True)
        b = pdf[pdf["__side"] == 1]
        if not len(b):
            return empty
        ids_b = b["__id"].to_numpy(dtype=np.int64)
        B = np.array(b["__q"].tolist(), dtype=np.float64)
        D = A @ B.T
        return pd.concat(
            [
                topk_rows(ids_a, ids_b, D, exclude_self=False),
                topk_rows(ids_b, ids_a, D.T, exclude_self=False),
            ]
        )

    partials = (
        side_a.unionByName(side_b)
        .groupBy("i", "j")
        .applyInPandas(partial, "vec long, nb long, dot long")
    )
    knn = partials.groupBy("vec").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct((-F.col("dot")).alias("nd"), "nb"))
            ),
            1,
            kk,
        ).alias("__top")
    )
    counts = (
        knn.select(F.explode("__top").alias("s"))
        .select(F.col("s.nb").alias("__id"))
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    nk = q.select("__id").join(counts, "__id", "left").select(
        F.coalesce(F.col("__c"), F.lit(0)).cast("long").alias("x")
    )
    m = nk.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("sxxx"),
        F.max("x").alias("max_nk"),
        F.count_if(F.col("x") == 0).alias("n_zero"),
    )
    nd = F.col("n_vecs").cast("double")
    mu = F.col("sx").cast("double") / nd
    m2 = F.col("sxx").cast("double") / nd - mu * mu
    m3 = (
        F.col("sxxx").cast("double") / nd
        - F.lit(3.0) * mu * (F.col("sxx").cast("double") / nd)
        + F.lit(2.0) * mu * mu * mu
    )
    return m.select(
        "n_vecs",
        F.lit(kk).cast("long").alias("k"),
        "max_nk",
        "n_zero",
        (m3 / (m2 * F.sqrt(m2))).alias("skew"),
    )


def lloyd_step(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    dim: int = 64,
    scale: int = 10000,
) -> DataFrame:
    """ONE exact Lloyd iteration (Lloyd 1957/IEEE-IT 1982, "Least
    squares quantization in PCM") over the QUANTIZED embedding corpus
    — the actual k-means step the ANN index family (IVF cells, PQ
    codebooks) implicitly depends on but never ran under oracle.
    Assignment distances are exact BIGINTs via the gram_matrix
    quantize-floor discipline (q = FLOOR(double(v)·scale) is
    IEEE-identical in numpy, Spark SQL and DuckDB), so the argmin AND
    its tie-break (first minimum = lowest cluster id, numpy argmin ==
    the oracle's MIN(cid) over d2 = min) are cross-engine safe — the
    near-tie ulp risk that deferred this operator is eliminated by
    integer distances rather than documented around. Init = the k
    lowest-id vectors (the _first_vectors_by_id t=0 discipline).

    Returns one row per (cluster, dim): n (cluster size), s (exact
    BIGINT coordinate sum), c_new = s/n (ONE division of exact
    operands — the updated centroid coordinate), inertia (exact
    BIGINT within-cluster squared-distance sum). Clusters whose seed
    duplicates a lower seed can assign empty and emit nothing — in
    both engines identically.

    Scale shape: centroids are a BOUNDED driver collect (k rows)
    broadcast into one Arrow map pass (int64 matmul over the pair
    axis — never a per-row python loop); the update is one groupBy
    over exploded quantized dims and the inertia one groupBy over the
    assignment — two scan-stage aggregates, no joins wider than the
    k-row broadcast."""
    import numpy as np
    import pandas as pd

    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(rows) < k:
        raise ValueError(f"lloyd_step needs >= {k} rows")
    c = np.floor(
        np.array([r[vec_col] for r in rows], dtype=np.float64) * float(scale)
    ).astype(np.int64)
    if c.shape[1] != dim:
        raise ValueError(
            f"lloyd_step: dim={dim} but vectors have {c.shape[1]} "
            "components"
        )
    cnorm = (c * c).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            x = np.array(
                [np.asarray(v) for v in pdf[vec_col]], dtype=np.float64
            )
            q = np.floor(x * float(scale)).astype(np.int64)
            d2 = (
                (q * q).sum(axis=1)[:, None] - 2 * (q @ c.T) + cnorm[None, :]
            )
            cid = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "cid": cid.astype("int64"),
                    "d2": d2[np.arange(len(cid)), cid],
                }
            )

    a = corpus.select(id_col, vec_col).mapInPandas(
        assign, "vec_id long, cid long, d2 long"
    )
    e = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.transform(
                F.col(vec_col).cast("array<double>"),
                lambda x: F.floor(x * F.lit(float(scale))).cast("long"),
            )
        ).alias("pos", "qv"),
    ).select("vec_id", (F.col("pos") + 1).alias("dim"), "qv")
    upd = (
        e.join(a.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "dim")
        .agg(F.sum("qv").alias("s"))
    )
    inert = a.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n"), F.sum("d2").alias("inertia")
    )
    return upd.join(inert, "cid").select(
        F.col("cid").alias("cluster"),
        "dim",
        "n",
        "s",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("c_new"),
        "inertia",
    )


def euclid_eps_pairs(
    df: DataFrame,
    eps2: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
    num_blocks: int = 8,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """All pairs with EXACT quantized squared euclidean distance
    ≤ ``eps2`` — the eps-graph generator density clustering rides in
    embedding space (the euclidean sibling of
    :func:`cosine_all_pairs`, same distributed block-nested-loop: no
    driver collect, rows hash into ``num_blocks`` blocks, a broadcast
    block-pair index replicates each block to its ~num_blocks (i, j)
    groups, one matmul per group). Distances are exact BIGINTs via
    the gram_matrix quantize-floor discipline (q = FLOOR(double(v) ·
    scale), int64 BLAS; per-term magnitudes ≤ dim·scale² keep every
    product inside int64), so a DuckDB list-arithmetic oracle
    reproduces the pair set bit for bit. Emits canonically ordered
    (vec_a < vec_b, d2); symmetrize at the consumer if a directed
    neighborhood view is needed.

    ``n_rows_hint`` (footer-derived, driver-side) under
    ``EPS_SINGLE_TASK_ROWS`` routes to the bounded single-task twin
    (r14); the blocked path below is the above-bound shape."""
    if single_task_ok(n_rows_hint, EPS_SINGLE_TASK_ROWS):
        return _euclid_eps_pairs_single_task(
            df, eps2, id_col, vec_col, scale
        )
    spark = df.sparkSession
    rows = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks))
        .cast("int")
        .alias("__blk"),
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    index = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)],
        "i int, j int",
    )
    side_a = rows.join(F.broadcast(index), index["i"] == rows["__blk"]).select(
        "i", "j", F.lit(0).alias("__side"), "__id", "__v"
    )
    side_b = rows.join(
        F.broadcast(index.filter(F.col("i") != F.col("j"))),
        index["j"] == rows["__blk"],
    ).select("i", "j", F.lit(1).alias("__side"), "__id", "__v")
    lim = int(eps2)
    sc = float(scale)

    def verify(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "d2": pd.Series(dtype="int64"),
            }
        )
        a = pdf[pdf["__side"] == 0]
        if not len(a):
            return empty
        ids_a = a["__id"].to_numpy(dtype=np.int64)
        qa = np.floor(
            np.array(a["__v"].tolist(), dtype=np.float64) * sc
        ).astype(np.int64)
        na = (qa * qa).sum(axis=1)
        if int(pdf["i"].iloc[0]) == int(pdf["j"].iloc[0]):
            d2 = na[:, None] - 2 * (qa @ qa.T) + na[None, :]
            ai, bi = np.nonzero(
                (d2 <= lim) & (ids_a[:, None] < ids_a[None, :])
            )
            return pd.DataFrame(
                {"vec_a": ids_a[ai], "vec_b": ids_a[bi], "d2": d2[ai, bi]}
            )
        b = pdf[pdf["__side"] == 1]
        if not len(b):
            return empty
        ids_b = b["__id"].to_numpy(dtype=np.int64)
        qb = np.floor(
            np.array(b["__v"].tolist(), dtype=np.float64) * sc
        ).astype(np.int64)
        nb = (qb * qb).sum(axis=1)
        d2 = na[:, None] - 2 * (qa @ qb.T) + nb[None, :]
        ai, bi = np.nonzero(d2 <= lim)
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids_a[ai], ids_b[bi]),
                "vec_b": np.maximum(ids_a[ai], ids_b[bi]),
                "d2": d2[ai, bi],
            }
        )

    return (
        side_a.unionByName(side_b)
        .groupBy("i", "j")
        .applyInPandas(verify, "vec_a long, vec_b long, d2 long")
    )


# Corpus-size bound under which the eps-pair generators run as ONE
# Arrow task (the q-digest / kmeans_pp bounded-single-task
# discipline). 8192 rows × 64 dims keeps the all-pairs distance
# matrix chunkable in ~100 MB slabs and the serial matmul around a
# gigaflop; above it the distributed block/bucket machinery runs
# unchanged — the 100 TB shape. r14 motivation: at sf0.1 (2000
# vectors) the blocked all-pairs pays ~num_blocks× row replication +
# an applyInPandas shuffle, and the LSH path ships n·T key rows
# through a self-join plus every candidate pair through two
# vector-payload joins (~650 MB of array bytes for a 1 MB corpus —
# guide §8's heavy-payload anti-pattern) — all pure overhead at this
# size.
EPS_SINGLE_TASK_ROWS = 8192


def _euclid_eps_pairs_single_task(
    df: DataFrame, eps2: int, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    """Bounded single-task twin of :func:`euclid_eps_pairs`: the same
    floor-quantization and exact integer distances, one float64 BLAS
    matmul in row chunks (every partial sum is an exact integer far
    below 2^53, so the float64 path is bit-identical to the blocked
    int64 path — the gram_matrix discipline), canonical a < b by id.
    Pinned equal to the distributed member by test."""
    lim, sc = int(eps2), float(scale)

    def work(batches):
        import numpy as np
        import pandas as pd

        ids_l, q_l = [], []
        for pdf in batches:
            if not len(pdf):
                continue
            ids_l.append(pdf["__id"].to_numpy(np.int64))
            q_l.append(
                np.floor(
                    np.array(pdf["__v"].tolist(), dtype=np.float64) * sc
                ).astype(np.int64)
            )
        if not ids_l:
            return
        ids = np.concatenate(ids_l)
        qf = np.vstack(q_l).astype(np.float64)
        n2 = (qf * qf).sum(axis=1)
        out_a, out_b, out_d = [], [], []
        ch = 2048
        for s in range(0, len(qf), ch):
            e = min(s + ch, len(qf))
            d2 = n2[s:e, None] - 2.0 * (qf[s:e] @ qf.T) + n2[None, :]
            ai, bi = np.nonzero(
                (d2 <= lim) & (ids[s:e, None] < ids[None, :])
            )
            if len(ai):
                out_a.append(ids[s + ai])
                out_b.append(ids[bi])
                out_d.append(d2[ai, bi].astype(np.int64))
        if out_a:
            yield pd.DataFrame(
                {
                    "vec_a": np.concatenate(out_a),
                    "vec_b": np.concatenate(out_b),
                    "d2": np.concatenate(out_d),
                }
            )

    return (
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .coalesce(1)
        .mapInPandas(work, "vec_a long, vec_b long, d2 long")
    )


@_functools.lru_cache(maxsize=8)
def simhash_signs(num_tables: int, bits: int, dim: int, seed: str = "eps"):
    """md5-derandomized ±1 sign matrix for :func:`simhash_eps_pairs` —
    shape (num_tables·bits, dim), entry (t, l, j) = +1 iff the last hex
    digit of md5(f"{seed}:{t}:{l}:{j}") < 8. hashlib MD5 and SQL md5()
    agree byte for byte, so an oracle regenerates the identical matrix
    with ``substr(md5(...), 32, 1)`` — no RNG, no shipped constants.

    Memoized (r14): the matrix is a pure function of its arguments and
    the default schedule costs ~200k driver-side md5 calls (~0.3 s)
    PER QUERY INVOCATION otherwise. Callers must not mutate the
    returned array."""
    import hashlib

    import numpy as np

    s = np.empty((num_tables * bits, dim), dtype=np.int64)
    for t in range(num_tables):
        for l in range(bits):
            base = f"{seed}:{t}:{l}:"
            row = t * bits + l
            for j in range(dim):
                h = hashlib.md5((base + str(j)).encode()).hexdigest()
                s[row, j] = 1 if int(h[-1], 16) < 8 else -1
    return s


def _simhash_eps_pairs_single_task(
    df: DataFrame,
    eps2: int,
    id_col: str,
    vec_col: str,
    scale: int,
    num_tables: int,
    bits: int,
    dim: int,
    seed: str,
) -> DataFrame:
    """Bounded single-task twin of :func:`simhash_eps_pairs`: the
    identical sign matrix and bucket keys (float64 matmul —
    projections are exact integers far below 2^53, so signs match the
    int64 path bit for bit), evaluated in the INTERSECTION form: the
    output is by definition {pairs with d2 ≤ eps2} ∩ {pairs sharing a
    (table, key) bucket in ≥ 1 table}, so under the single-task bound
    we compute the exact eps-pairs with one chunked BLAS pass (the
    euclid twin's shape) and test bucket collision per SURVIVING pair
    (keys[a] == keys[b] any-table) — never enumerating the ~0.3·n²
    candidate pairs the bucket walk materializes (r14: that walk +
    np.unique + a 640k×dim gather was ~3 s at sf0.1; this form is
    ~0.3 s). Identical pair set; pinned equal to the distributed
    member by test."""
    S = simhash_signs(num_tables, bits, dim, seed)
    T, L, sc, lim = int(num_tables), int(bits), float(scale), int(eps2)

    def work(batches):
        import numpy as np
        import pandas as pd

        ids_l, q_l = [], []
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if x.shape[1] != S.shape[1]:
                raise ValueError(
                    f"simhash_eps_pairs: dim={S.shape[1]} but vectors "
                    f"have {x.shape[1]} components"
                )
            ids_l.append(pdf[id_col].to_numpy(np.int64))
            q_l.append(np.floor(x * sc).astype(np.int64))
        if not ids_l:
            return
        ids = np.concatenate(ids_l)
        q = np.vstack(q_l)
        n = len(q)
        proj = q.astype(np.float64) @ S.T.astype(np.float64)
        # pack sign bits via a float64 dot with power-of-two weights:
        # keys < 2^bits are exact in float64, and the dot is ~14×
        # faster than an int64 broadcast shift+sum over (n, T, L)
        # (r14 measurement: 0.15 s vs 2.1 s at n=2000, T=300, L=10)
        keys = (
            (proj >= 0).reshape(n, T, L).astype(np.float64)
            @ (2.0 ** np.arange(L))
        ).astype(np.int64)
        qf = q.astype(np.float64)
        n2 = (qf * qf).sum(axis=1)
        out_a, out_b, out_d = [], [], []
        ch = 2048
        for s in range(0, n, ch):
            e = min(s + ch, n)
            d2 = n2[s:e, None] - 2.0 * (qf[s:e] @ qf.T) + n2[None, :]
            ri, ci = np.nonzero(
                (d2 <= lim) & (ids[s:e, None] < ids[None, :])
            )
            if not len(ri):
                continue
            collide = (keys[s + ri] == keys[ci]).any(axis=1)
            if collide.any():
                ri, ci = ri[collide], ci[collide]
                out_a.append(ids[s + ri])
                out_b.append(ids[ci])
                out_d.append(d2[ri, ci].astype(np.int64))
        if out_a:
            yield pd.DataFrame(
                {
                    "vec_a": np.concatenate(out_a),
                    "vec_b": np.concatenate(out_b),
                    "d2": np.concatenate(out_d),
                }
            )

    return (
        df.select(id_col, vec_col)
        .coalesce(1)
        .mapInPandas(work, "vec_a long, vec_b long, d2 long")
    )


def simhash_eps_pairs(
    df: DataFrame,
    eps2: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
    num_tables: int = 300,
    bits: int = 10,
    dim: int = 64,
    seed: str = "eps",
    n_rows_hint: int | None = None,
) -> DataFrame:
    """SUBQUADRATIC eps-pair generator: sign-LSH candidate buckets
    (Charikar STOC 2002 hyperplane signs, md5-derandomized) followed by
    EXACT int64 distance verification — the scale-path sibling of
    :func:`euclid_eps_pairs` (whose blocked BLAS is O(n²) work by
    construction). Contract-compatible: emits canonical
    (vec_a < vec_b, d2) with exact quantized squared distances, and the
    output is a SUBSET of the exact member's pairs (identical d2 on
    every emitted pair — containment is structural, only recall is
    approximate).

    Per table t of ``num_tables``, a vector's bucket key packs ``bits``
    sign bits of ±1 projections of the quantized vector (int64 matmul,
    exact); a pair is a candidate iff it shares a (table, key) bucket
    in ANY table, then candidates are verified against ``eps2``
    exactly. Plan shape: the key table is n·T rows feeding ONE banded
    equi-self-join (the MinHash-LSH band-bucket shape) — never an
    all-pairs block replication; verification is linear in candidates.

    Asymptotics: fixed (bits, num_tables) give a constant per-pair
    collision probability, so for a growing corpus the classic LSH
    schedule applies — bits ~ log n, num_tables ~ n^ρ with
    ρ = ln p1/ln p2 < 1. The defaults are calibrated on the synthetic
    embeddings table, which is near-ISOTROPIC (flat covariance
    spectrum, eps at the 1.3% distance percentile with contrast ratio
    ≈ 1.27 — per-bit match 0.59 vs 0.50, measured ρ ≈ 0.76): measured
    recall ≈ 0.85 of exact eps-edges at ≈ 0.32 candidate fraction
    (sf0.1). Real embedding corpora are far more clusterable; the
    recall self-eval (``ann_eps_recall``) reports the realized figure
    per corpus — the lsh_recall discipline.

    ``n_rows_hint`` (footer-derived, driver-side) under
    ``EPS_SINGLE_TASK_ROWS`` routes to the bounded single-task twin
    (r14: kills the n·T key self-join and the candidate×vector-payload
    joins at bench scale); the banded-join path below is the
    above-bound shape."""
    import numpy as np
    import pandas as pd

    if single_task_ok(n_rows_hint, EPS_SINGLE_TASK_ROWS):
        return _simhash_eps_pairs_single_task(
            df, eps2, id_col, vec_col, scale, num_tables, bits, dim, seed
        )
    S = simhash_signs(num_tables, bits, dim, seed)
    T, L, sc, lim = int(num_tables), int(bits), float(scale), int(eps2)

    def gen_keys(batches):
        pow2 = 2.0 ** np.arange(L)  # keys < 2^L: exact in float64
        tbl = np.arange(T, dtype=np.int32)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if x.shape[1] != S.shape[1]:
                raise ValueError(
                    f"simhash_eps_pairs: dim={S.shape[1]} but vectors "
                    f"have {x.shape[1]} components"
                )
            q = np.floor(x * sc).astype(np.int64)
            proj = q.astype(np.float64) @ S.T.astype(np.float64)
            # float-dot bit packing (the single-task twin's form):
            # ~14× faster than an int64 broadcast shift+sum
            key = (
                (proj >= 0).reshape(len(q), T, L).astype(np.float64) @ pow2
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "__id": np.repeat(
                        pdf[id_col].to_numpy(np.int64), T
                    ),
                    "tb": np.tile(tbl, len(q)),
                    "key": key.ravel(),
                }
            )

    keys = df.select(id_col, vec_col).mapInPandas(
        gen_keys, "__id long, tb int, key long"
    )
    cand = (
        keys.select("tb", "key", F.col("__id").alias("__ida"))
        .join(
            keys.select("tb", "key", F.col("__id").alias("__idb")),
            ["tb", "key"],
        )
        .filter(F.col("__ida") < F.col("__idb"))
        .select("__ida", "__idb")
        .distinct()
    )
    v = df.select(
        F.col(id_col).cast("long").alias("__vid"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    joined = (
        cand.join(v.withColumnRenamed("__vid", "__ida"), "__ida")
        .withColumnRenamed("__v", "__va")
        .join(
            v.withColumnRenamed("__vid", "__idb").withColumnRenamed(
                "__v", "__vb"
            ),
            "__idb",
        )
    )

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            qa = np.floor(
                np.array(pdf["__va"].tolist(), dtype=np.float64) * sc
            ).astype(np.int64)
            qb = np.floor(
                np.array(pdf["__vb"].tolist(), dtype=np.float64) * sc
            ).astype(np.int64)
            d2 = ((qa - qb) * (qa - qb)).sum(axis=1)
            m = d2 <= lim
            ia = pdf["__ida"].to_numpy(np.int64)[m]
            ib = pdf["__idb"].to_numpy(np.int64)[m]
            yield pd.DataFrame(
                {"vec_a": ia, "vec_b": ib, "d2": d2[m]}
            )

    return joined.mapInPandas(verify, "vec_a long, vec_b long, d2 long")


def kmeanspp_seeds(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
    seed_tag: str = "kpp",
):
    """Deterministic k-means++ D² seeding (Arthur & Vassilvitskii,
    SODA 2007) — md5-derandomized so a SQL oracle replays the exact
    selection: round r draws u_x from the first 13 hex digits of
    md5(f"{seed_tag}:{r}:{id}") (52 bits — exactly representable),
    and the classic Gumbel/exponential-race key ln(u)/D²(x) makes
    "sample one point with probability ∝ D²" an ARGMAX — the
    weighted_reservoir discipline with real-valued weights: ln(u)/w
    maximization is distribution-identical to D²-proportional
    sampling, and every operand is cross-engine deterministic
    (u exact integer, D² exact int64, one correctly-rounded division,
    libm ln — python math.log mirrors DuckDB ln bit for bit; ties
    break on the smaller id). Round 0 is the uniform draw (argmax
    u alone). Points at D² = 0 (duplicates of a chosen seed) carry
    weight 0 and are excluded, so seeds are always distinct vectors.

    Returns the ordered list [(seed_id, q_vector int64)] — bounded by
    k, the lloyd_step driver-collect discipline. Each round is ONE
    scan-stage Arrow pass emitting a per-batch argmax (one row per
    Arrow batch), so the driver reduces ~num_partitions candidates,
    never the corpus."""
    import hashlib
    import math

    import numpy as np
    import pandas as pd

    sc = float(scale)
    chosen: list[tuple[int, np.ndarray]] = []
    for r in range(k):
        seeds = (
            np.array([q for _, q in chosen], dtype=np.int64)
            if chosen
            else None
        )
        tag = f"{seed_tag}:{r}:"

        def best(batches, seeds=seeds, tag=tag, rnd=r):
            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf[id_col].to_numpy(np.int64)
                q = np.floor(
                    np.array(pdf[vec_col].tolist(), dtype=np.float64) * sc
                ).astype(np.int64)
                u = np.array(
                    [
                        int(
                            hashlib.md5(
                                (tag + str(int(i))).encode()
                            ).hexdigest()[:13],
                            16,
                        )
                        for i in ids
                    ],
                    dtype=np.int64,
                )
                if seeds is None:
                    key = u.astype(np.float64)
                else:
                    d2 = (
                        (q * q).sum(axis=1)[:, None]
                        - 2 * (q @ seeds.T)
                        + (seeds * seeds).sum(axis=1)[None, :]
                    ).min(axis=1)
                    ok = d2 > 0
                    if not ok.any():
                        continue
                    ids, q, u, d2 = ids[ok], q[ok], u[ok], d2[ok]
                    key = np.array(
                        [
                            math.log((int(h) + 0.5) / 4503599627370496.0)
                            / float(int(w))
                            for h, w in zip(u, d2)
                        ]
                    )
                # per-batch argmax; ties -> smaller id (stable lexsort)
                i = np.lexsort((ids, -key))[0]
                yield pd.DataFrame(
                    {
                        "key": [key[i]],
                        "cid": [int(ids[i])],
                        "q": [q[i].tolist()],
                    }
                )

        cands = (
            corpus.select(id_col, vec_col)
            .mapInPandas(best, "key double, cid long, q array<bigint>")
            .collect()
        )
        if not cands:
            raise ValueError(
                f"kmeanspp_seeds: corpus exhausted at round {r} (< {k} "
                "distinct vectors)"
            )
        win = max(cands, key=lambda c: (c.key, -c.cid))
        chosen.append((int(win.cid), np.array(win.q, dtype=np.int64)))
    return chosen


# Row bound under which the WHOLE seeding+Lloyd pipeline runs as ONE
# Arrow task (the _kruskal_finish / q-digest bounded-single-task
# discipline): 2^18 rows × 64 int64 dims ≈ 128 MB of quantized matrix
# per task. Below it, the 8 sequential seeding jobs + per-iteration
# assign/update jobs (~11 Spark jobs, each a full Arrow worker round
# trip) are pure scheduling overhead over a corpus one numpy task
# handles in milliseconds; above it, the distributed rounds run
# unchanged — the 100 TB path.
KMEANS_SINGLE_TASK_ROWS = 262_144


def _kmeans_pp_single_task(
    corpus: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    scale: int,
    seed_tag: str,
    dim_hint: int | None,
) -> DataFrame:
    """Bounded single-task k-means++ + Lloyd: replays the EXACT
    distributed recurrence (kmeanspp_seeds' per-round Gumbel-race
    argmax, assign_frame's guarded int64 distances, update_frame's
    exact count/sum update) over the whole corpus in one Arrow task.
    Every operand is identical — int64 matmuls and sums are
    order-free, per-element float keys/distances are the same
    correctly-rounded doubles, arg-ties break on the same (key desc,
    id asc) order — so the emitted stats are row-for-row identical to
    the multi-job path (pinned by test and the unchanged oracle)."""
    sc = float(scale)

    def work(batches):
        import hashlib
        import math

        import numpy as np
        import pandas as pd

        ids_l, q_l = [], []
        for pdf in batches:
            if not len(pdf):
                continue
            ids_l.append(pdf[id_col].to_numpy(np.int64))
            q_l.append(
                np.floor(
                    np.array(pdf[vec_col].tolist(), dtype=np.float64) * sc
                ).astype(np.int64)
            )
        if not ids_l:
            raise ValueError(
                "kmeanspp_seeds: corpus exhausted at round 0 (< "
                f"{k} distinct vectors)"
            )
        ids = np.concatenate(ids_l)
        q = np.vstack(q_l)
        if dim_hint is not None and q.shape[1] != dim_hint:
            raise ValueError(
                f"kmeans_pp_stats: dim_hint={dim_hint} but vectors "
                f"have {q.shape[1]} components"
            )
        # --- k-means++ seeding (kmeanspp_seeds recurrence) ---
        chosen_ids: list[int] = []
        chosen_q: list[np.ndarray] = []
        for r in range(k):
            tag = f"{seed_tag}:{r}:"
            u = np.array(
                [
                    int(
                        hashlib.md5((tag + str(int(i))).encode()).hexdigest()[
                            :13
                        ],
                        16,
                    )
                    for i in ids
                ],
                dtype=np.int64,
            )
            if not chosen_ids:
                sel_ids, key = ids, u.astype(np.float64)
                sel_q = q
            else:
                seeds = np.array(chosen_q, dtype=np.int64)
                d2 = (
                    (q * q).sum(axis=1)[:, None]
                    - 2 * (q @ seeds.T)
                    + (seeds * seeds).sum(axis=1)[None, :]
                ).min(axis=1)
                ok = d2 > 0
                if not ok.any():
                    raise ValueError(
                        f"kmeanspp_seeds: corpus exhausted at round {r} "
                        f"(< {k} distinct vectors)"
                    )
                sel_ids, sel_q = ids[ok], q[ok]
                key = np.array(
                    [
                        math.log((int(h) + 0.5) / 4503599627370496.0)
                        / float(int(w))
                        for h, w in zip(u[ok], d2[ok])
                    ]
                )
            i = np.lexsort((sel_ids, -key))[0]
            chosen_ids.append(int(sel_ids[i]))
            chosen_q.append(sel_q[i])
        S = np.array(chosen_q, dtype=np.int64)
        N = np.ones(k, dtype=np.int64)

        def assign(S, N):
            n2 = (N * N).astype(np.float64)
            dist = np.empty((len(q), k), dtype=np.float64)
            for j in range(k):
                diff = N[j] * q - S[j][None, :]
                m = int(np.abs(diff).max(initial=0))
                lim = int((float(2**63 - 1) / diff.shape[1]) ** 0.5)
                if m > lim:
                    raise ValueError(
                        "kmeans_pp_stats: |n_j*q - s_j| = "
                        f"{m} > {lim} would overflow int64 in the "
                        f"{diff.shape[1]}-term distance sum — "
                        "shrink `scale` (cluster too large for "
                        "this quantization)"
                    )
                dist[:, j] = (diff * diff).sum(axis=1).astype(
                    np.float64
                ) / n2[j]
            return dist.argmin(axis=1)  # first minimum = lowest j

        def update(S, N):
            cid = assign(S, N)
            S2, N2 = S.copy(), N.copy()
            for j in range(k):
                m = cid == j
                if m.any():
                    S2[j] = q[m].sum(axis=0)
                    N2[j] = int(m.sum())
            return cid, S2, N2

        for _ in range(iters - 1):
            _, S, N = update(S, N)
        cid, S_f, N_f = update(S, N)
        out = []
        for j in range(k):
            if not (cid == j).any():
                continue  # update_frame's inner join: empty clusters
            for d in range(q.shape[1]):
                out.append(
                    (
                        j,
                        chosen_ids[j],
                        d + 1,
                        int(N_f[j]),
                        int(S_f[j, d]),
                        float(S_f[j, d]) / float(N_f[j]),
                    )
                )
        yield pd.DataFrame(
            out,
            columns=["cluster", "seed_id", "dim", "n", "s", "c_new"],
        )

    return corpus.select(id_col, vec_col).coalesce(1).mapInPandas(
        work,
        "cluster long, seed_id int, dim int, n long, s long, c_new double",
    )


def kmeans_pp_stats(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
    seed_tag: str = "kpp",
    dim_hint: int | None = None,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """COMPLETE k-means under oracle: :func:`kmeanspp_seeds` D²
    seeding followed by ``iters`` EXACT Lloyd iterations with
    rational centroids — the multi-iteration member the r13 one-step
    lloyd_step deferred. Centroid state is the exact integer pair
    (n_j, s_jd); a point's distance to centroid j is
    double(A_j) / double(n_j²) with A_j = Σ_d (n_j·q_d − s_jd)² — A_j
    an exact int64: |n_j·q_d − s_jd| ≤ 2·n_j·scale·|v|max, so the
    64-term sum stays < 2^63 while every element is ≤
    √((2^63−1)/dim) ≈ 3.8e8 — about 3·10^4 rows per cluster at
    scale = 10^4 and unit-magnitude vectors (the assign worker
    GUARDS this bound and raises with a rescale hint rather than
    overflowing silently; shrink `scale` for bigger clusters). Both
    casts and the single division correctly rounded IEEE in numpy,
    Spark SQL and DuckDB — so the argmin AND its tie-break (first
    minimum = lowest cluster id) are cross-engine safe without any
    128-bit arithmetic. Iteration r's assignment broadcasts the k×d
    integer state (bounded driver collect, the lloyd_step
    discipline) into one Arrow pass; the update is one groupBy over
    exploded quantized dims. Empty clusters carry the previous
    centroid forward (both engines identically).

    Returns one row per (cluster, dim) of the LAST update: seed_id,
    n, s (exact BIGINTs), c_new = s/n (one division). Monotone
    inertia — Lloyd's convergence guarantee — is property-tested
    against an exact-Fraction reference implementation."""
    import numpy as np
    import pandas as pd

    if single_task_ok(n_rows_hint, KMEANS_SINGLE_TASK_ROWS):
        return _kmeans_pp_single_task(
            corpus, k, iters, id_col, vec_col, scale, seed_tag, dim_hint
        )
    seeds = kmeanspp_seeds(corpus, k, id_col, vec_col, scale, seed_tag)
    sc = float(scale)
    seed_ids = [s for s, _ in seeds]
    if dim_hint is not None and seeds[0][1].shape[0] != dim_hint:
        raise ValueError(
            f"kmeans_pp_stats: dim_hint={dim_hint} but vectors have "
            f"{seeds[0][1].shape[0]} components"
        )
    S = np.array([q for _, q in seeds], dtype=np.int64)  # k x d (sums)
    N = np.ones(k, dtype=np.int64)  # cluster sizes (seed = 1 point)

    def assign_frame(S, N):
        Sb, Nb = S.copy(), N.copy()

        def assign(batches):
            n2 = (Nb * Nb).astype(np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                q = np.floor(
                    np.array(pdf[vec_col].tolist(), dtype=np.float64) * sc
                ).astype(np.int64)
                dist = np.empty((len(q), len(Nb)), dtype=np.float64)
                for j in range(len(Nb)):
                    diff = Nb[j] * q - Sb[j][None, :]
                    m = int(np.abs(diff).max(initial=0))
                    lim = int((float(2**63 - 1) / diff.shape[1]) ** 0.5)
                    if m > lim:
                        raise ValueError(
                            "kmeans_pp_stats: |n_j*q - s_j| = "
                            f"{m} > {lim} would overflow int64 in the "
                            f"{diff.shape[1]}-term distance sum — "
                            "shrink `scale` (cluster too large for "
                            "this quantization)"
                        )
                    dist[:, j] = (diff * diff).sum(axis=1).astype(
                        np.float64
                    ) / n2[j]
                cid = dist.argmin(axis=1)  # first minimum = lowest j
                yield pd.DataFrame(
                    {
                        "vec_id": pdf[id_col].to_numpy(np.int64),
                        "cid": cid.astype(np.int64),
                    }
                )

        return corpus.select(id_col, vec_col).mapInPandas(
            assign, "vec_id long, cid long"
        )

    def update_frame(S, N):
        a = assign_frame(S, N)
        e = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.posexplode(
                F.transform(
                    F.col(vec_col).cast("array<double>"),
                    lambda x: F.floor(x * F.lit(sc)).cast("long"),
                )
            ).alias("pos", "qv"),
        ).select("vec_id", (F.col("pos") + 1).alias("dim"), "qv")
        return (
            e.join(a, "vec_id")
            .groupBy("cid", "dim")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("qv").alias("s"),
            )
        )

    for _ in range(iters - 1):
        upd = update_frame(S, N).collect()
        S2, N2 = S.copy(), N.copy()
        touched = set()
        for row in upd:
            j, d = int(row.cid), int(row.dim)
            S2[j, d - 1] = int(row.s)
            if j not in touched:
                N2[j] = int(row.n)
                touched.add(j)
        S, N = S2, N2

    sid = F.array(*[F.lit(int(s)) for s in seed_ids])
    return update_frame(S, N).select(
        F.col("cid").alias("cluster"),
        F.element_at(sid, F.col("cid").cast("int") + 1).alias("seed_id"),
        "dim",
        "n",
        "s",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias(
            "c_new"
        ),
    )
