"""Data-quality expectations: declarative row-level rules with a
valid/quarantine split — the ingest gate every production pipeline
puts in front of a 100 TB table (Delta Live Tables' ``expect``,
Great Expectations' core, reduced to the engine-level primitive).

One pass, no UDFs: every rule is a Column predicate evaluated inside
codegen; a row's failed-rule list is a single array expression, so the
split costs one scan regardless of rule count. NULL discipline: a rule
that evaluates to NULL (e.g. ``value > 0`` on a NULL value) FAILS —
an expectation you cannot prove is an expectation violated, matching
the DLT contract (only ``cond <=> true`` passes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def failed_rules(rules: dict[str, Column]) -> Column:
    """Array of the names of every rule the row fails (empty = valid).
    ``F.when(cond, ...)`` takes its otherwise-branch for false AND for
    NULL, which is exactly the fail-on-unprovable contract."""
    return F.filter(
        F.array(
            *[
                F.when(cond, F.lit(None).cast("string")).otherwise(F.lit(name))
                for name, cond in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )


def validate(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantine): valid rows pass EVERY rule;
    quarantine rows carry ``failed_rules array<string>`` naming each
    violated expectation (the triage column a data steward works
    from). The two frames partition the input exactly (tested)."""
    marked = df.withColumn("__failed", failed_rules(rules))
    valid = marked.filter(F.size("__failed") == 0).drop("__failed")
    quarantine = marked.filter(F.size("__failed") > 0).withColumnRenamed(
        "__failed", "failed_rules"
    )
    return valid, quarantine


def violation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts + total rows — the monitoring series
    an expectations dashboard plots per ingest batch. One aggregate
    pass: each rule contributes a count_if, no join, no second scan."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count_if(~cond.eqNullSafe(True)).alias(f"fail_{name}")
            for name, cond in rules.items()
        ],
    )


def corpus_checksum(
    df: DataFrame,
    content_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Order-independent content fingerprint — the dataset-versioning /
    replica-verification primitive: two tables hold identical content
    (as multisets of rows over ``content_cols``) iff their checksums
    match, regardless of row order, partitioning, or engine. Per
    group: row count, a 60-bit md5-based XOR signature (XOR is
    commutative/associative → order-free, and overflow-free where a
    SUM of hashes would trip ANSI mode), and a bounded SUM signature
    (each term mod 2³², so 2^31 rows fit int64) that catches the
    duplicate-pair case XOR alone cancels. One aggregation pass, no
    shuffle beyond the groupBy.

    Row encoding: each column is length-prefixed (``len:value``) and
    NULL is tagged ``N`` — so ('a', NULL) vs (NULL, 'a'), NULL vs
    empty string, and values containing any would-be separator byte
    all encode distinctly (a plain concat_ws SKIPS nulls and a fixed
    separator shifts boundaries — both would break the iff claim).
    Every piece starts with a digit or ``N``, so the concatenation
    parses unambiguously.
    """
    row_repr = F.concat(
        *[
            F.coalesce(
                F.concat(
                    F.length(F.col(c).cast("string")).cast("string"),
                    F.lit(":"),
                    F.col(c).cast("string"),
                ),
                F.lit("N"),
            )
            for c in content_cols
        ]
    )
    h = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("long")
    # bit_xor has no Column-API aggregate helper — SQL expr over the
    # pre-computed hash column
    xor_sig = F.expr("bit_xor(__h)").alias("xor_sig")
    sum_sig = F.sum(F.pmod(F.col("__h"), F.lit(1 << 32))).alias("sum_sig")
    hashed = df.withColumn("__h", h)
    if group_cols:
        return hashed.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"), xor_sig, sum_sig
        )
    return hashed.agg(F.count(F.lit(1)).alias("n_rows"), xor_sig, sum_sig)


def fd_profile(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Approximate functional-dependency discovery for the declared
    column pairs — TANE's g3 error measure (Huhtala, Kärkkäinen,
    Porkka & Toivonen, "TANE: an efficient algorithm for discovering
    functional and approximate dependencies", Computer J. 1999): for
    each candidate lhs → rhs, g3 = the minimum number of rows that
    must be removed for the dependency to hold exactly = n − Σ_lhs
    max_rhs count(lhs, rhs). g3 = 0 means the FD holds; small g3/n
    flags a NEAR-dependency — the schema-inference / data-quality
    audit read (is this column derivable from that one, modulo dirty
    rows).

    Plan shape per pair: one (lhs, rhs) count aggregate, one lhs
    re-aggregate (map-side combinable, strictly smaller), one scalar
    fold — all exact BIGINT; pairs union into one frame. The lattice
    search of full TANE is driver-side candidate management over the
    same primitive; profiling declared pairs is the distributed core.
    Returns (lhs, rhs, n, n_groups, g3, holds)."""
    out = None
    for lhs, rhs in pairs:
        per = (
            df.groupBy(F.col(lhs).alias("__l"), F.col(rhs).alias("__r"))
            .agg(F.count(F.lit(1)).alias("__c"))
            .groupBy("__l")
            .agg(F.sum("__c").alias("__cnt"), F.max("__c").alias("__mx"))
            .agg(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.sum("__cnt").alias("n"),
                F.count(F.lit(1)).alias("n_groups"),
                (F.sum("__cnt") - F.sum("__mx")).alias("g3"),
                (F.sum("__cnt") == F.sum("__mx")).alias("holds"),
            )
        )
        out = per if out is None else out.unionByName(per)
    return out


import math as _math


def benford_audit(
    df: DataFrame, value_col: str, min_value: int = 1
) -> DataFrame:
    """Benford first-significant-digit audit (Newcomb 1881; Benford
    1938) — the classic fabricated-numbers screen for financial /
    telemetry columns: observed counts of leading digits 1-9 vs the
    Benford expectation n·log10(1+1/d), with each digit's chi-square
    contribution (obs − exp)²/exp.

    Parity: the leading digit is the first character of the integer's
    decimal string — no float log10 of the VALUE anywhere; the nine
    log10(1+1/d) constants are injected as repr() literals into both
    engines (the hll _lc_lut pattern), so exp and chi2_contrib are
    identical doubles built from exact BIGINT counts. One 9-ary
    groupBy, fully map-side-combinable; values below ``min_value``
    are excluded (zero/negatives have no leading digit).
    Returns (digit, obs, n, exp, chi2_contrib)."""
    from pyspark.sql import Window as W

    v = F.col(value_col).cast("long")
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    g = (
        df.filter(v >= int(min_value))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("obs"))
        .withColumn("n", F.sum("obs").over(W.partitionBy()))
    )
    p_lit = F.element_at(
        F.array(
            *[F.lit(float(repr(_math.log10(1 + 1 / d)))) for d in range(1, 10)]
        ),
        F.col("digit"),
    )
    exp = F.col("n").cast("double") * p_lit
    return g.select(
        "digit",
        "obs",
        "n",
        exp.alias("exp"),
        (
            (F.col("obs").cast("double") - exp)
            * (F.col("obs").cast("double") - exp)
            / exp
        ).alias("chi2_contrib"),
    )


def sql_benford_lut() -> str:
    """The identical repr() literals for the DuckDB oracle: a
    list-literal indexed by digit."""
    return (
        "["
        + ", ".join(repr(_math.log10(1 + 1 / d)) for d in range(1, 10))
        + "]"
    )
