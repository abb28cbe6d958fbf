"""Fluent Corpus API: each step must equal calling the underlying
verified function directly, extra columns survive every step, and the
whole chain stays lazy (one plan, no step materializes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_essentials_spark.corpus import Corpus
from flink_essentials_spark.functions import dedup, text
from flink_essentials_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_steps_equal_direct_calls(spark):
    docs = load_tables(spark, SF_DIR)["documents"]

    # exact dedup step == exact_dedup keepers
    got = Corpus(docs).drop_exact_dups().ids()
    want = {
        r["keeper_id"] for r in dedup.exact_dedup(docs).collect()
    }
    assert got == want

    # near-dup step == survivors of the verified pair list
    got_nd = Corpus(docs).drop_near_dups(threshold=0.5).ids()
    losers = {
        r["doc_b"]
        for r in dedup.lsh_near_dup_pairs(docs, threshold=0.5).collect()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert got_nd == all_ids - losers

    # quality filter == direct threshold on quality_score
    got_q = Corpus(docs).quality_filter(min_score=0.3).ids()
    want_q = {
        r["doc_id"]
        for r in text.quality_score(docs).collect()
        if r["quality_score"] >= 0.3
    }
    assert got_q == want_q


def test_corpus_chain_preserves_columns_and_stays_lazy(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    chain = (
        Corpus(docs)
        .normalize()
        .drop_exact_dups()
        .drop_near_dups(threshold=0.5)
        .quality_filter(min_score=0.2)
    )
    # laziness: building the chain runs no job beyond what the
    # functions themselves may cache — the result is a DataFrame
    assert not chain.df.isStreaming
    assert set(docs.columns) <= set(chain.df.columns)
    rows = chain.df.collect()
    assert rows
    # every surviving row keeps its original source column value
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    for r in rows:
        assert r["source"] == src[r["doc_id"]]


def test_corpus_language_filter(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    got = Corpus(docs).language_filter(["en"]).ids()
    want = {
        r["doc_id"]
        for r in text.language_id(docs).collect()
        if r["lang_pred"] == "en"
    }
    assert got == want and got


def test_corpus_sample_and_pack_steps(spark):
    from flink_essentials_spark.functions import sampling, text as T

    docs = load_tables(spark, SF_DIR)["documents"]
    got = Corpus(docs).sample(0.25).ids()
    want = {r["doc_id"] for r in sampling.hash_sample(docs, 0.25).collect()}
    assert got == want and 0 < len(got) < docs.count()

    got_s = Corpus(docs).stratified_sample({"web": 0.5}, "source").ids()
    want_s = {
        r["doc_id"]
        for r in sampling.stratified_hash_sample(docs, {"web": 0.5}, "source").collect()
    }
    assert got_s == want_s

    spans = Corpus(docs).sample(0.25).pack(128)
    direct = T.pack_sequences(sampling.hash_sample(docs, 0.25), 128)
    assert sorted(map(tuple, spans.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_corpus_decontaminate_and_budget_select(spark):
    """decontaminate drops exactly the docs sharing a verbatim
    length->=window substring with the benchmark (stride-1: the
    mid-text insert IS found) and nothing else; budget_select keeps
    exactly the greedy per-source fill with the input schema."""
    from flink_essentials_spark.functions import sampling

    block = "this benchmark sentence is exactly forty"
    assert len(block) == 40
    docs = spark.createDataFrame(
        [
            (1, "clean document with entirely original text " + "a" * 20, "s"),
            (2, "prefix text " + block + " suffix text here", "s"),
            (3, "another clean one " + "b" * 40, "s"),
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame(
        [(1000, "benchmark item: " + block + " plus more")],
        "doc_id long, text string",
    )
    got = Corpus(docs).decontaminate(bench, window=40).ids()
    assert got == {1, 3}
    # extra columns survive
    assert "source" in Corpus(docs).decontaminate(bench, window=40).df.columns

    scored = docs.select(
        "doc_id", "source",
        F.length("text").cast("long").alias("n_toks"),
        (F.col("doc_id") / 10.0).alias("q"),
    )
    budgets = spark.createDataFrame([("s", 200)], "source string, budget long")
    got_b = Corpus(scored).budget_select(
        budgets, quality_col="q", tokens_col="n_toks"
    )
    direct = sampling.token_budget_select(
        scored, budgets, quality_col="q", tokens_col="n_toks"
    )
    assert got_b.ids() == {
        r["doc_id"] for r in direct.collect() if r["selected"]
    }
    assert sorted(got_b.df.columns) == sorted(scored.columns)


def test_corpus_vocabulary_terminals_equal_direct_calls(spark):
    """The r8 terminals (keywords / tokenize_wordpiece /
    tokenize_unigram / perplexity_buckets) are thin veneers: each
    equals the direct functions.text call on the wrapped frame, and
    each composes after a filter step (operating on survivors only)."""
    from flink_essentials_spark.corpus import Corpus
    from flink_essentials_spark.functions import text as t

    df = spark.createDataFrame(
        [
            (1, "data moves fast data wins", "web"),
            (2, "data moves fast", "web"),
            (3, "slow other words here", "books"),
            (4, "data data data", "books"),
        ],
        "doc_id long, text string, source string",
    )
    c = Corpus(df)
    assert sorted(c.keywords().collect()) == sorted(
        t.textrank_keywords(df).collect()
    )
    assert sorted(c.tokenize_wordpiece(min_freq=3).collect()) == sorted(
        t.wordpiece_encode_words(df, min_freq=3).collect()
    )
    assert sorted(c.tokenize_unigram(min_freq=3).collect()) == sorted(
        t.unigram_segment_words(df, min_freq=3).collect()
    )
    assert sorted(c.perplexity_buckets(2).collect()) == sorted(
        t.ccnet_buckets(df, n_buckets=2).collect()
    )
    # composes after filtering: survivors only feed the vocabulary
    survivors = c.sample(1.0)  # identity sample keeps the chain lazy
    filtered = Corpus(df.filter("doc_id != 4"))
    kw_all = {r["word"] for r in c.keywords().collect()}
    kw_f = {r["word"] for r in filtered.keywords().collect()}
    assert kw_f <= kw_all and survivors.count() == 4
