"""Element-wise transforms: map / flatMap / filter / process.

Reference semantics (BuiltIn.scala:57-65, 264-304;
RichFunctions.scala:35-66, 182-194): 1→1, 1→0..N, predicate keep,
and per-element processing with lifecycle hooks.

Spark-first translation: every 1→1/1→N transform that can be written
as a Column expression IS a Column expression (JVM-side, whole-stage
codegen — the fused "operator chain" the reference manually manages
via startNewChain, Partitions.scala:177-206, is free here). Arbitrary
Python logic takes the Arrow-batched ``mapInPandas`` path, never
row-at-a-time UDFs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnLike = Union[Column, str]


def map_columns(df: DataFrame, **named_exprs: Column) -> DataFrame:
    """1→1 map producing named output columns (MapFunction analog)."""
    return df.select(*[expr.alias(name) for name, expr in named_exprs.items()])


def with_columns(df: DataFrame, **named_exprs: Column) -> DataFrame:
    """1→1 map that keeps existing columns (RichMapFunction-style enrich)."""
    return df.withColumns(dict(named_exprs))


def flat_map_array(
    df: DataFrame, array_expr: Column, alias: str, *keep: str
) -> DataFrame:
    """1→0..N via an array expression + explode (FlatMapFunction analog).

    E.g. word split: ``flat_map_array(lines, F.split(F.lower("value"),
    r"\\W+"), "word")``; quantity expansion (RichFunctions.scala:182-194):
    ``flat_map_array(carts, F.array_repeat(F.col("sku"), F.col("quantity")),
    "sku")``. ``explode`` drops empty arrays — matching flatMap-of-empty.
    """
    return df.select(*keep, F.explode(array_expr).alias(alias))


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """Predicate keep (BuiltIn.scala:64-65). Pure Catalyst; pushes down."""
    return df.filter(predicate)


def process_batches(
    df: DataFrame,
    fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    output_schema,
    *,
    setup: Callable[[], object] | None = None,
    teardown: Callable[[object], None] | None = None,
) -> DataFrame:
    """ProcessFunction / RichFunction analog over Arrow batches.

    ``setup``/``teardown`` replicate the Rich* open()/close() lifecycle
    (RichFunctions.scala:78-152): setup runs once per partition before
    the first batch and its return value (the "open resource" — e.g. a
    connection) is passed to ``fn`` as a second argument; teardown runs
    after the last batch — the iterator form of ``mapInPandas`` gives
    exactly that hook structure.
    """
    if setup is None and teardown is None:
        return df.mapInPandas(fn, schema=output_schema)

    def wrapped(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = setup() if setup is not None else None
        try:
            yield from fn(it, ctx)
        finally:
            if teardown is not None:
                teardown(ctx)

    return df.mapInPandas(wrapped, schema=output_schema)


def fizzbuzz(df: DataFrame, n_col: str = "n") -> DataFrame:
    """The reference's map showcase (BuiltIn.scala:128-177): n → label.

    Pure case expression — stays inside codegen.
    """
    n = F.col(n_col)
    label = (
        F.when((n % 15) == 0, F.lit("FizzBuzz"))
        .when((n % 3) == 0, F.lit("Fizz"))
        .when((n % 5) == 0, F.lit("Buzz"))
        .otherwise(n.cast("string"))
    )
    return df.select(n.alias("n"), label.alias("output"))


def tokenize(text: Column) -> Column:
    """lower + split on non-word runs + drop empties.

    The reference's host-language tokenization
    (SocketTextStreamWordCount.scala:60: ``toLowerCase.split("\\W+")``)
    as a single vectorized expression.
    """
    return F.filter(F.split(F.lower(text), r"\W+"), lambda w: w != "")


def side_outputs(
    df: DataFrame,
    tags: dict[str, Column],
    *,
    main_tag: str = "main",
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Side outputs — one pass over the input routed to N named
    outputs. The reference mentions the pattern only in comments
    (RichFunctions.scala:245: "side outputs" as the escape hatch for
    multi-way emission); here it is a first-class operator: a row goes
    to the FIRST tag whose predicate matches, remaining rows to
    ``main_tag`` (Flink's default-output semantics).

    Spark has no multi-sink operator, so the tagged frame is computed
    once (``persist=True`` caches it — the right call when every
    output is consumed; pass False to let each output re-scan, the
    right call when outputs feed separate jobs anyway and the input is
    a cheap scan) and each output is a filter on the tag column —
    predicate evaluation happens ONCE per row either way.
    """
    if not tags:
        raise ValueError("side_outputs needs at least one tagged output")
    tag_col = None
    for name, pred in tags.items():
        tag_col = F.when(pred, F.lit(name)) if tag_col is None else tag_col.when(pred, F.lit(name))
    tagged = df.withColumn("__tag", tag_col.otherwise(F.lit(main_tag)))
    if persist:
        tagged = tagged.persist()
    outs = {name: tagged.filter(F.col("__tag") == name).drop("__tag") for name in tags}
    outs[main_tag] = tagged.filter(F.col("__tag") == main_tag).drop("__tag")
    return outs
