"""Named published quality-filter rulesets for pretraining corpora.

Two canonical filters every large-scale text pipeline runs, each as a
single scan-stage Column program (no shuffle, no UDF — the whole rule
set stays inside whole-stage codegen):

- :func:`gopher_quality` — the Gopher document-level heuristics
  (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A1).
- :func:`c4_clean` — the C4 line-level heuristics
  (Raffel et al. 2020, "Exploring the Limits of Transfer Learning
  with a Unified Text-to-Text Transformer", §2.2).

Cross-engine determinism discipline: every ratio is a SINGLE division
of exact integer operands (counts are pre-scaled so no intermediate
float mixes in — e.g. the symbol ratio divides ``3·#hash + 3·#ellipsis``
by ``3·n_words``), so a DuckDB oracle reproduces every column
bit-for-bit with no rounding. Threshold literals (0.1, 0.9, …) parse
to the identical double in both engines.

The reference repo has no corpus-filter stage (it is a Flink teaching
repo — SURVEY §0); these extend the engine's LLM-data layer alongside
functions/text.py's quality_score / repetition_stats.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_essentials_spark.operators.transform import tokenize

# Gopher's required-stopword check (Rae et al. 2021 A1.1): a document
# must contain at least 2 of these 8 words. NOTE: distinct from
# text.STOPWORDS (the scoring list) — this is the paper's fixed set.
GOPHER_REQUIRED_STOPWORDS = (
    "the",
    "be",
    "to",
    "of",
    "and",
    "that",
    "have",
    "with",
)

_TERMINAL = (".", "!", "?", '"', "'")


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens (raw, case-preserved) — Gopher counts 'words'
    by whitespace, keeping symbol tokens like '#' visible (the repo's
    tokenize() strips punctuation, which would hide them)."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))


def _nonempty_lines(text: Column) -> Column:
    return F.filter(
        F.split(text, "\n"), lambda l: F.trim(l) != F.lit("")
    )


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_required_stopwords: int = 2,
) -> DataFrame:
    """Gopher quality signals + pass flag per document (Rae et al.
    2021 Appendix A1): word-count band, mean word length band,
    symbol-to-word ratio ('#' and '...'), bullet-started and
    ellipsis-ended line ratios, alphabetic-word ratio, and the
    required-stopword count. ``gopher_pass`` is the conjunction.

    One scan, zero shuffles; every emitted double is one division of
    exact integers (bit-exact under the DuckDB oracle, no rounding).
    """
    text = F.col(text_col)
    toks = _ws_tokens(text)
    n_words = F.size(toks)
    # total in-word chars = chars minus whitespace runs (identical
    # regexp on both engines; avoids an interpreted fold over tokens)
    word_chars = F.length(F.regexp_replace(text, r"\s+", ""))
    mean_len = word_chars.cast("double") / n_words
    hash_cnt = F.length(text) - F.length(F.replace(text, F.lit("#")))
    ell3_cnt = F.length(text) - F.length(F.replace(text, F.lit("...")))
    # single division of exact ints: (3·#hash + 3·#ell) / (3·n_words)
    symbol_ratio = (hash_cnt * 3 + ell3_cnt).cast("double") / (n_words * 3)
    lines = _nonempty_lines(text)
    n_lines = F.size(lines)
    bullet_like = lambda l: (
        F.ltrim(l).startswith("- ")
        | F.ltrim(l).startswith("* ")
        | F.ltrim(l).startswith("•")
    )
    n_bullet = F.size(F.filter(lines, bullet_like))
    ell_line = lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith(
        "…"
    )
    n_ell_lines = F.size(F.filter(lines, ell_line))
    bullet_ratio = n_bullet.cast("double") / n_lines
    ellipsis_ratio = n_ell_lines.cast("double") / n_lines
    n_alpha = F.size(
        F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
    )
    alpha_ratio = n_alpha.cast("double") / n_words
    sw = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS])
    n_stop = F.size(F.array_intersect(tokenize(text), sw))
    out = df.select(
        id_col,
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        n_lines.alias("n_lines"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        n_stop.alias("n_required_stopwords"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_ratio") <= max_bullet_ratio)
        & (F.col("ellipsis_ratio") <= max_ellipsis_ratio)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("n_required_stopwords") >= min_required_stopwords),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in a terminal punctuation mark, have at least
    ``min_words_per_line`` words, and don't mention "javascript";
    drop the whole document if it contains a curly brace, the string
    "lorem ipsum", or fewer than ``min_sentences`` sentences across
    the kept lines. (The paper's badwords-list pass is out of scope —
    it is a licensing question, not an operator.)

    Emits per-doc counts, the drop flags, ``c4_keep``, and the md5 of
    the rebuilt kept text (order-preserved — the boilerplate-removal
    verification pattern). One scan, zero shuffles.
    """
    text = F.col(text_col)
    lines = _nonempty_lines(text)
    keep_line = lambda l: (
        F.rtrim(l).rlike(r"""[.!?"']$""")
        & (F.size(_ws_tokens(l)) >= min_words_per_line)
        & ~F.lower(l).contains("javascript")
    )
    kept = F.filter(lines, keep_line)
    kept_text = F.array_join(kept, "\n")
    n_sent = F.length(kept_text) - F.length(
        F.regexp_replace(kept_text, r"[.!?]", "")
    )
    has_brace = text.contains("{")
    has_lorem = F.lower(text).contains("lorem ipsum")
    out = df.select(
        id_col,
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        F.md5(kept_text).alias("clean_md5"),
    )
    return out.withColumn(
        "c4_keep",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_brace")
        & ~F.col("has_lorem"),
    )
