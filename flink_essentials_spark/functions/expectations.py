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
