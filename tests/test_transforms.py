"""Element-wise transform goldens (reference BuiltIn.scala pipelines,
word count, fizzbuzz) through the public Stream API."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from flink_essentials_spark import fixtures
from flink_essentials_spark.api import Stream
from flink_essentials_spark.operators import transform
from flink_essentials_spark.operators.aggregate import word_count


def test_x10_duplicate_even_pipeline(spark):
    """The reference's checked-in artifact myDataStreamX10WithDuplicatesEven
    (BuiltIn.scala:53-75): fromElements(1,2,3,4) → ×10 → duplicate →
    keep even = 10,10,20,20,30,30,40,40."""
    out = (
        Stream.from_elements(spark, 1, 2, 3, 4)
        .map(v=F.col("value") * 10)
        .flat_map(F.array(F.col("v"), F.col("v")), "v")
        .filter(F.col("v") % 2 == 0)
        .collect()
    )
    assert sorted(r["v"] for r in out) == [10, 10, 20, 20, 30, 30, 40, 40]


def test_fizzbuzz_golden(spark):
    """BuiltIn.scala:128-177: 1..100, fizzbuzz, keep FizzBuzz rows."""
    fb = transform.fizzbuzz(Stream.from_sequence(spark, 1, 100).df)
    rows = fb.filter(F.col("output") == "FizzBuzz").collect()
    assert sorted(r["n"] for r in rows) == [15, 30, 45, 60, 75, 90]
    labels = {r["n"]: r["output"] for r in fb.collect()}
    assert labels[3] == "Fizz" and labels[5] == "Buzz" and labels[7] == "7"


def test_wordcount_matches_python_reference(spark):
    """EP2 word count over the Playground lines, vs a plain-Python
    re-implementation of the reference's toLowerCase.split("\\W+")."""
    expected = Counter(
        w
        for line in fixtures.WORDCOUNT_LINES
        for w in re.split(r"\W+", line.lower())
        if w
    )
    got = {
        r["word"]: r["cnt"]
        for r in word_count(fixtures.wordcount_lines(spark), "value").collect()
    }
    assert got == dict(expected)


def test_flatmap_quantity_expansion(spark):
    """RichFunctions.scala:182-194: one row per quantity unit."""
    df = fixtures.shopping_cart_events(spark, 10)
    out = df.select(
        "sku",
        F.explode(F.array_repeat(F.col("sku"), F.col("quantity"))).alias("unit"),
    )
    # quantities are i % 10 for i in 0..9 → total = 0+1+...+9 = 45
    assert out.count() == 45


def test_process_batches_rich_lifecycle(spark):
    """RichFunctions open/close (:78-152): per-partition setup/teardown
    around Arrow batches; logic = multiply by a 'connection'-provided
    factor."""
    calls = {"setup": 0}

    def setup():
        calls["setup"] += 1
        return {"factor": 2}

    def fn(batches, ctx):
        for pdf in batches:
            pdf["doubled"] = pdf["id"] * ctx["factor"]
            yield pdf[["doubled"]]

    out = transform.process_batches(
        spark.range(1, 101), fn, "doubled long", setup=setup
    )
    assert sorted(r["doubled"] for r in out.collect()) == [2 * i for i in range(1, 101)]


def test_side_outputs_first_match_and_default(spark):
    """Rows route to the FIRST matching tag; unmatched rows land on the
    main output; the three outputs partition the input exactly."""
    from flink_essentials_spark.operators.transform import side_outputs

    df = spark.range(0, 100).select(F.col("id"))
    outs = side_outputs(
        df,
        {
            "fizz": F.col("id") % 3 == 0,
            "buzz": F.col("id") % 5 == 0,  # multiples of 15 go to fizz
        },
    )
    fizz = {r["id"] for r in outs["fizz"].collect()}
    buzz = {r["id"] for r in outs["buzz"].collect()}
    main = {r["id"] for r in outs["main"].collect()}
    assert fizz == {i for i in range(100) if i % 3 == 0}
    assert buzz == {i for i in range(100) if i % 5 == 0 and i % 3 != 0}
    assert fizz | buzz | main == set(range(100))
    assert not (fizz & buzz) and not (fizz & main) and not (buzz & main)
