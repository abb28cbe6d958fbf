"""Physical distribution knobs: partitioning, shuffle, parallelism.

Reference semantics (Partitions.scala): custom hash partitioner
(:54-151, incl. the all-to-one skew anti-pattern), random ``shuffle``
(:153-173), ``setParallelism`` (BuiltIn.scala:104-123), operator
chaining (:175-268).

Spark-first: hash routing is ``repartition(n, key)``; random is
round-robin ``repartition(n)``; chaining is whole-stage codegen
(automatic); skew is AQE skew-join + the salting helper below. The
reference's LESSON — a partitioner that routes everything to one task
destroys parallelism (Partitions.scala:104-129) — is exactly the skew
problem salt_key solves at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_by_key(df: DataFrame, *keys: str | Column, num_partitions: int | None = None) -> DataFrame:
    """partitionCustom(hash) analog (Partitions.scala:67-81)."""
    if num_partitions is None:
        return df.repartition(*keys)
    return df.repartition(num_partitions, *keys)


def shuffle_random(df: DataFrame, num_partitions: int) -> DataFrame:
    """Random redistribution (Partitions.scala:153-173) — round-robin."""
    return df.repartition(num_partitions)


def range_partition(df: DataFrame, num_partitions: int, *keys: str | Column) -> DataFrame:
    """Range partitioning — ordered output / sorted file layouts."""
    return df.repartitionByRange(num_partitions, *keys)


def single_file_sink(df: DataFrame) -> DataFrame:
    """Sink parallelism 1 (BuiltIn.scala:116-123): one output file."""
    return df.coalesce(1)


def partition_custom(df: DataFrame, route: Column, num_partitions: int) -> DataFrame:
    """Arbitrary ``partitionCustom`` routing (Partitions.scala:54-151):
    every row goes to partition ``route % num_partitions``, where
    ``route`` is ANY integer Column — including the reference's
    deliberate all-to-one skew demo (``F.lit(0)``, Partitions.scala:
    104-129, which destroys parallelism: the lesson, not a pattern).

    This is the RDD escape hatch SURVEY §2.8 names: the DataFrame API
    deliberately hides task placement (hash/range/round-robin cover the
    declarative cases above), so explicit routing drops to
    ``rdd.partitionBy`` with an identity-mod partitioner and rebuilds
    the frame WITHOUT a further shuffle (createDataFrame preserves RDD
    partitioning). Per-row Python routing — demo/teaching tool, not the
    100 TB hot path; use the declarative forms there.
    """
    cols = df.columns
    routed = df.withColumn("__route", route.cast("long"))
    rdd = (
        routed.rdd.map(lambda r: (r["__route"], tuple(r[c] for c in cols)))
        .partitionBy(num_partitions, lambda k: int(k) % num_partitions)
        .values()
    )
    return df.sparkSession.createDataFrame(rdd, df.schema)


def salt_key(df: DataFrame, key: str, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Split a hot key across ``buckets`` subkeys for two-phase aggs.

    groupBy(key, salt) partial → groupBy(key) final. Use when one key
    holds ≫ 1/parallelism of all rows; AQE skew-join covers the join
    case, this covers aggregation.
    """
    return df.withColumn(salt_col, F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(buckets)))


def salted_sum(
    df: DataFrame,
    keys: list[str],
    buckets: int,
    sums: dict[str, str],
    count_alias: str | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation: salt → partial sums per
    (key, salt) → final re-sum per key.

    ``sums`` maps input column → output alias (sum is re-aggregable;
    counts via ``count_alias``). Result is identical to the direct
    groupBy — only the shuffle distribution changes: a key holding
    half the table fans across ``buckets`` reducers instead of one.
    """
    salted = salt_key(df, keys[0], buckets)
    partial_aggs = [F.sum(c).alias(f"__s_{c}") for c in sums]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("__cnt"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"__s_{c}").alias(alias) for c, alias in sums.items()]
    if count_alias:
        final_aggs.append(F.sum("__cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Key-skew diagnosis — the measurement that decides between plain
    groupBy, salting, and AQE skew-join handling: per heavy key its
    row count, share of the table, and ratio to the MEDIAN key's count
    (the imbalance factor a 1000-executor shuffle actually feels).
    One count-by-key aggregate + a one-row median broadcast; top-N by
    (count desc, key) via TakeOrderedAndProject."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    stats = counts.agg(
        F.sum("n_rows").alias("total"),
        F.percentile("n_rows", F.lit(0.5)).alias("median_n"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total")).alias("share"),
            (F.col("n_rows") / F.col("median_n")).alias("x_median"),
        )
        .orderBy(F.desc("n_rows"), "key")
        .limit(top_n)
    )
