"""Text analysis for large-scale training-data pipelines.

Everything here is pure Column expressions (JVM-side, codegen) — at
100 TB these run inside the parquet scan stage with zero extra
shuffles. Cross-engine determinism (for DuckDB oracles) comes from
md5-based word hashing: identical hex in every engine, converted to
bigint via a 15-hex-digit prefix (< 2^60, no sign/overflow issues).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_essentials_spark.operators.transform import tokenize

# Tiny per-language marker sets (function words). An honest n-gram/
# stopword language-ID heuristic: score = marker hits, argmax wins,
# deterministic lexicographic tiebreak.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def word_hash(word: Column) -> Column:
    """Deterministic 60-bit word hash from the md5 hex prefix.

    Reproducible in any engine with md5 — the backbone of fingerprints,
    MinHash and SimHash below.
    """
    return F.conv(F.substring(F.md5(F.encode(word, "utf-8")), 1, 15), 16, 10).cast(
        "bigint"
    )


SQL_WORD_HASH = "(('0x' || substring(md5({w}), 1, 15)))::BIGINT"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting + basic shape stats per document."""
    toks = tokenize(F.col(text_col))
    return df.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


# GPT-2-style pre-tokenizer pattern (contractions, letter runs, digit
# runs, punctuation runs, each optionally space-prefixed) — the
# industry-standard first pass before BPE merges. RE2/Java-regex
# compatible so DuckDB oracles run the identical pattern.
BPE_SPLIT_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer (vs the whitespace
    tokens of token_stats): the unit that actually prices LLM training
    data. Pure regexp_extract_all — JVM-side, zero shuffles."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), 0)
    return df.select(
        id_col,
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_bpe_tokens"),
        F.round(
            F.length(text_col).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("chars_per_token"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score: length norm, stopword ratio, lexical
    diversity. Formula kept to integer-derived double arithmetic so any
    engine reproduces it bit-for-bit."""
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, sw))
    out = df.select(
        id_col,
        n_tok.alias("n_tokens"),
        (n_uniq.cast("double") / n_tok).alias("lexical_diversity"),
        (n_stop.cast("double") / n_tok).alias("stopword_kinds_ratio"),
    )
    return out.withColumn(
        "quality_score",
        F.round(
            F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0)) * 0.5
            + F.col("lexical_diversity") * 0.3
            + F.col("stopword_kinds_ratio") * 0.2,
            6,
        ),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID with deterministic argmax."""
    toks = tokenize(F.col(text_col))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias(
            f"score_{lang}"
        )
        for lang, ws in LANG_MARKERS.items()
    ]
    scored = df.select(id_col, *scores)
    # argmax with lexicographic tiebreak: pack (score, neg-ordinal) structs
    langs = sorted(LANG_MARKERS)
    best = F.greatest(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(-i).alias("o"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    return scored.select(
        id_col,
        *[f"score_{lang}" for lang in langs],
        F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("unknown")).alias(
            "lang_pred"
        ),
    )


# Char-bigram profiles per language — the classic n-gram language-ID
# heuristic (counts of characteristic bigrams, argmax). Kept tiny and
# exact so a SQL oracle reproduces it with replace()-count arithmetic.
LANG_BIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "ng", " a"),
    "de": ("ch", "ei", "en ", "de"),
    "es": ("ón", "ll", "os ", " el"),
    "fr": ("ou", "ai", "es ", " le"),
}


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of ``needle`` via the length/replace identity —
    portable to any SQL engine (no regex escaping concerns)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / len(needle)


def language_id_ngram(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Char-n-gram language ID: score = Σ occurrences of each language's
    characteristic bigrams, normalized by text length; deterministic
    argmax with lexicographic tiebreak. Complements the marker-word
    scorer in :func:`language_id`; both are pure Column expressions."""
    low = F.lower(F.col(text_col))
    langs = sorted(LANG_BIGRAMS)
    scores = {
        lang: sum(
            (_count_occurrences(low, g) for g in LANG_BIGRAMS[lang]),
            F.lit(0).cast("double"),
        )
        for lang in langs
    }
    scored = df.select(
        id_col,
        *[
            F.round(
                scores[lang] / F.greatest(F.length(low), F.lit(1)), 6
            ).alias(f"ngram_score_{lang}")
            for lang in langs
        ],
    )
    best = F.greatest(
        *[
            F.struct(
                F.col(f"ngram_score_{lang}").alias("s"),
                F.lit(-i).alias("o"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    return scored.select(
        id_col,
        *[f"ngram_score_{lang}" for lang in langs],
        F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("unknown")).alias(
            "lang_pred"
        ),
    )


ROLLING_B = 131
ROLLING_P = 2_147_483_647  # 2^31 - 1: keeps acc*B + h inside int64


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """ORDER-SENSITIVE document fingerprint: Karp-Rabin polynomial roll
    over the token-hash sequence, ``acc = (acc·B + h mod P) mod P``.
    Complements the order-insensitive XOR bag in :func:`fingerprint` —
    re-ordered text changes this one. Single fold, no shuffle."""
    toks = tokenize(F.col(text_col))
    hashed = F.transform(toks, lambda w: word_hash(w) % ROLLING_P)
    fp = F.aggregate(
        hashed,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * ROLLING_B + h) % ROLLING_P,
    )
    return df.select(
        id_col, fp.alias("rolling_fp"), F.size(toks).alias("n_tokens")
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive bag fingerprint: XOR of per-DISTINCT-token md5
    hashes + token count. Content-addressable doc identity for dedup
    pipelines; any engine reproduces it."""
    toks = F.array_distinct(tokenize(F.col(text_col)))
    hashed = F.transform(toks, word_hash)
    fp = F.aggregate(hashed, F.lit(0).cast("bigint"), lambda acc, h: acc.bitwiseXOR(h))
    return df.select(
        id_col,
        fp.alias("fingerprint"),
        F.size(toks).alias("n_unique_tokens"),
    )


# PII patterns — conservative constructs that parse identically in
# Java regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d \-]{7,}\d", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrub for training corpora: emails, IPv4 addresses and
    phone-like digit runs replaced by typed placeholders, with per-doc
    match counts. Pure Column expressions (regexp_replace /
    regexp_extract_all chains) — runs inside the scan stage, zero
    shuffles, linear at 100 TB. Patterns apply in declaration order
    (emails first, so their digits never re-match as phones)."""
    col = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(col, F.lit(pat), 0)).alias(f"n_{name}s")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = col
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(F.col(id_col), clean.alias("clean_text"), *counts)


URL_PATTERN = r"https?://[a-zA-Z0-9.-]+(?:/[^\s]*)?"


def url_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-domain URL statistics — the web-corpus audit op (source
    attribution, domain filtering/blocklists): extract every URL, strip
    to the host, aggregate count + distinct-document reach per domain.

    Extraction is a JVM regexp_extract_all inside the scan stage; the
    only shuffle is the per-domain aggregation (partial counts map-side;
    distinct-doc counting is the usual two-phase distinct). Domain
    cardinality follows a power law, but the heavy hitters are exactly
    the domains a blocklist audit wants, and count-distinct per key is
    bounded by corpus size — no skew mitigation needed beyond AQE."""
    col = F.col(text_col)
    urls = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(col, F.lit(URL_PATTERN), 0)).alias("url"),
    )
    domain = F.regexp_replace(
        F.regexp_replace(F.col("url"), r"^https?://", ""), r"[/:].*$", ""
    )
    return (
        urls.select(F.col(id_col), domain.alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )


def corpus_mixture(
    df: DataFrame, *keys: str, chars_col: str = "n_chars"
) -> DataFrame:
    """Corpus composition report — the mixture table a pretraining run
    is weighted by: per key-combination (language, source, ...) doc
    count, char volume, and share of the corpus. One groupBy; the
    grand total re-aggregates the per-group counts (a few hundred rows)
    rather than re-scanning the corpus, then broadcasts back."""
    keys = keys or ("lang", "source")
    per_group = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(chars_col).alias("sum_chars"),
    )
    totals = per_group.agg(
        F.sum("n_docs").alias("_t_docs"), F.sum("sum_chars").alias("_t_chars")
    )
    return per_group.crossJoin(F.broadcast(totals)).select(
        *keys,
        "n_docs",
        "sum_chars",
        (F.col("n_docs") / F.col("_t_docs")).alias("doc_share"),
        (F.col("sum_chars") / F.col("_t_chars")).alias("char_share"),
    )


def pack_sequences(
    df: DataFrame, seq_len: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard pretraining
    batching op: documents in ``id`` order form one continuous token
    stream cut into fixed ``seq_len`` bins; each doc reports its span
    (tokens_before, start_bin, start_offset, end_bin), with documents
    crossing bin boundaries as in GPT-style packing.

    The global stream position is NOT a partition-less window (that
    would be a single-task sort): rows are range-partitioned by id,
    per-partition cumulative sums run in parallel, and a tiny
    partition-offsets aggregate shifts them to global positions — the
    same scheme as the non-keyed global count window.
    """
    from pyspark.sql import Window as W

    toks = F.size(tokenize(F.col(text_col)))
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("n_tokens"))
    ranged = base.repartitionByRange("doc_id").withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        W.partitionBy("__pid")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    part = ranged.withColumn("__cum", F.sum("n_tokens").over(w))
    offsets = (
        part.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    before = F.col("__off") + F.col("__cum") - F.col("n_tokens")
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn("tokens_before", before.cast("long"))
        .select(
            "doc_id",
            "n_tokens",
            "tokens_before",
            F.floor(F.col("tokens_before") / seq_len).cast("long").alias("start_bin"),
            (F.col("tokens_before") % seq_len).cast("long").alias("start_offset"),
            F.floor(
                (F.col("tokens_before") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                / seq_len
            ).cast("long").alias("end_bin"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-token-budget training chunks with overlap — the context-
    window splitter every pretraining/RAG pipeline runs: chunk ``i``
    covers tokens ``[i*stride, i*stride + chunk_tokens)``; starts are
    every ``stride`` tokens while inside the document, so consecutive
    chunks overlap by ``chunk_tokens - stride``. Zero-token documents
    emit nothing. Output is (doc_id, chunk_idx, chunk_len, chunk_md5)
    — the md5 of the space-joined chunk text is engine-reproducible, so
    chunk identity (and chunk-level dedup downstream) is oracle-exact.

    Scale shape: pure Column expressions — tokenize + sequence +
    explode + slice run INSIDE the parquet scan stage, shuffle-free;
    output rows ≈ n_tokens/stride per doc, linear in corpus size."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokenize(F.col(text_col))
    d = df.select(
        id_col, toks.alias("__toks"), F.size(toks).alias("__n")
    ).filter(F.col("__n") > 0)
    starts = F.sequence(
        F.lit(0), ((F.col("__n") - 1) / F.lit(stride)).cast("int")
    )
    e = d.select(id_col, "__toks", F.explode(starts).alias("chunk_idx"))
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return e.select(
        id_col,
        "chunk_idx",
        F.size(chunk).alias("chunk_len"),
        F.md5(F.encode(F.array_join(chunk, " "), "utf-8")).alias("chunk_md5"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Top-k characteristic terms per group by a tf-idf score — the
    "what is this source about" audit. tf = total occurrences of the
    word in the group's documents; doc_freq = number of DOCUMENTS
    (corpus-wide) containing the word; score = tf * n_docs / doc_freq.
    The score stays cross-engine exact: an integer product divided once
    by an integer (no log), ties broken lexicographically.

    Scale shape: ONE explode feeding one (group, word, doc) aggregate;
    tf and doc_freq both derive from that compact table (doc_freq as a
    window sum over the vocabulary-sized rollup — a doc has exactly one
    group, so summing per-(group,word) doc counts over the word
    partition counts corpus-wide containing docs). Single scan of the
    corpus, no self-branch recompute — measured 1.6× faster than the
    two-branch explode at sf0.1. No quadratic step anywhere."""
    from pyspark.sql import Window

    toks = tokenize(F.col(text_col))
    words = df.select(
        F.col(id_col).alias("__doc"),
        F.col(group_col).alias("group_key"),
        F.explode(toks).alias("word"),
    )
    per_doc = words.groupBy("group_key", "word", "__doc").agg(
        F.count(F.lit(1)).alias("__c")
    )
    sw = per_doc.groupBy("group_key", "word").agg(
        F.sum("__c").alias("tf"), F.count(F.lit(1)).alias("__nd")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        sw.withColumn("doc_freq", F.sum("__nd").over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "group_key",
            "word",
            "tf",
            "doc_freq",
            ((F.col("tf") * F.col("__n_docs")).cast("double") / F.col("doc_freq")).alias(
                "score"
            ),
        )
    )

    w = Window.partitionBy("group_key").orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("group_key", "word", "tf", "doc_freq", "score", "rank")
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition signals for quality filtering (the boilerplate /
    spam detector every pretraining pipeline runs): fraction of
    duplicate lines, fraction of tokens inside duplicated word
    trigrams, and the most-repeated trigram's count. Pure Column
    expressions — scan-stage, shuffle-free."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != F.lit("")
    )
    n_lines = F.size(lines)
    n_uniq_lines = F.size(F.array_distinct(lines))
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    idx = F.when(n_tok >= 3, F.sequence(F.lit(0), n_tok - 3)).otherwise(
        F.array().cast("array<int>")
    )
    tris = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 3), " "))
    n_tri = F.size(tris)
    n_uniq_tri = F.size(F.array_distinct(tris))
    return df.select(
        id_col,
        n_lines.alias("n_lines"),
        F.when(n_lines > 0, (n_lines - n_uniq_lines).cast("double") / n_lines)
        .otherwise(F.lit(0.0))
        .alias("dup_line_ratio"),
        F.when(n_tri > 0, (n_tri - n_uniq_tri).cast("double") / n_tri)
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_ratio"),
    )


def length_outliers(
    df: DataFrame,
    z: float = 2.0,
    len_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Statistical length-outlier filter — the "too short / suspiciously
    long" pass of a quality pipeline: documents whose length sits more
    than ``z`` standard deviations from the corpus mean, with the
    z-score attached. Moments accumulate as exact integer sums (sum,
    sum-of-squares of an int column — < 2^63 up to ~10^15 total squared
    chars), convert to double ONCE, then mean/variance/sqrt apply the
    identical IEEE ops in any engine — so the emitted doubles are
    bit-exact under a DuckDB oracle with no rounding.

    Plan shape: one scalar aggregate broadcast back over the corpus
    (one-row BroadcastNestedLoopJoin — linear, the idle_customers
    pattern), then a scan-stage filter. Two passes over the column,
    zero wide shuffles."""
    stats = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(len_col).alias("__s"),
        F.sum(F.col(len_col) * F.col(len_col)).alias("__ss"),
    )
    mean = F.col("__s").cast("double") / F.col("__n")
    ex2 = F.col("__ss").cast("double") / F.col("__n")
    std = F.sqrt(ex2 - mean * mean)
    zscore = (F.col(len_col) - mean) / std
    return (
        df.crossJoin(F.broadcast(stats))
        .filter(F.abs(F.col(len_col) - mean) > F.lit(z) * std)
        .select(
            id_col,
            len_col,
            zscore.alias("z_score"),
        )
    )


def profile_columns(df: DataFrame, *cols: str) -> DataFrame:
    """Column-level data-quality profile — the audit a pipeline runs
    before training on a new drop: per column, non-null and exact
    distinct counts (counts only: engine-neutral by construction, so
    the oracle is exact; min/max stringification differs across engines
    for timestamps/doubles and is deliberately left out). One small
    aggregate per column, unioned — each is a map-side-partial count
    plus a two-phase distinct, all independent, so Spark schedules them
    as parallel stages over the same scan."""
    cols = cols or tuple(df.columns)
    spark = df.sparkSession
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.count(F.col(c)).alias("n_nonnull"),
                F.countDistinct(F.col(c)).alias("n_distinct"),
            ).select(F.lit(c).alias("col_name"), "n_nonnull", "n_distinct")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-distribution Shannon entropy per document — the
    classic perplexity proxy for quality filtering: machine-generated
    boilerplate and encoding garbage sit at the entropy extremes while
    natural prose clusters mid-range. H = -Σ p_c · log2(p_c) over the
    lowercased character histogram.

    Scale shape: one explode over characters (rows = total chars — the
    same volume the tokenizers already stream) + a (doc, char) count +
    a per-doc aggregate; all JVM-side. Entropy is rounded to 6 decimals
    because log2 is not IEEE-correctly-rounded across libms (the one
    place the media_features integer-exact contract can't apply); the
    DuckDB oracle rounds identically."""
    from pyspark.sql import Window

    chars = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.lower(F.col(text_col)), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    per_char = chars.groupBy("__doc", "ch").agg(F.count(F.lit(1)).alias("n"))
    p = F.col("n") / F.sum("n").over(Window.partitionBy("__doc"))
    return (
        per_char.withColumn("__term", p * F.log2(p))
        .groupBy("__doc")
        .agg(
            F.sum("n").alias("n_chars"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
            # 0.0 - x: normalizes the all-one-char doc's -0.0 to +0.0
            F.round(F.lit(0.0) - F.sum("__term"), 6).alias("entropy_bits"),
        )
        .select(
            F.col("__doc").alias(id_col), "n_chars", "n_distinct_chars", "entropy_bits"
        )
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 100,
) -> DataFrame:
    """Inverted-index build: (term, doc_freq, postings) — the retrieval
    substrate (BM25 / dedup-by-term / contamination lookup) built as a
    single corpus scan.

    Plan: scan-stage tokenize + array_distinct + explode (narrow), one
    groupBy(term) with collect_list → sort_array. Postings are capped
    at ``max_postings`` ids per term (sorted ascending, so the cap is
    deterministic): a stopword's full posting list at 100 TB is the
    corpus itself — production layouts shard postings into fixed-size
    blocks keyed (term, block_no); the cap is the one-block form while
    doc_freq keeps the true count. collect_list on a capped-output
    group is the one collection this engine allows per-key — for
    uncapped postings emit the exploded (term, doc_id) pairs
    themselves (that is the input to this groupBy) instead of a
    nested array.
    """
    toks = tokenize(F.col(text_col))
    pairs = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(toks)).alias("term"),
    )
    return pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_postings).alias(
            "postings"
        ),
    )


def linear_trend(
    df: DataFrame, x_col: str, y_col: str, group_col: str
) -> DataFrame:
    """Per-group least-squares fit + Pearson correlation of two INTEGER
    columns — the scaling-law / data-audit probe (does token count
    track char count per source? is a feature drifting with time
    bucket?) as a single-shuffle aggregate.

    Exact-parity construction: the five sufficient statistics
    (Σx, Σy, Σxy, Σx², Σy²) are integer sums (exact in any order,
    any engine, while they stay < 2^53 — at 100 TB pre-scale x/y or
    accumulate in decimal); slope/intercept/r are then a fixed dag of
    double ops on identical operands, so no rounding is needed
    anywhere. r's denominator multiplies the two sqrt'd deviations
    (sqrt is IEEE-correctly-rounded) instead of sqrt'ing their product,
    which would overflow int64.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num.cast("double") / dxx.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r = num.cast("double") / (
        F.sqrt(dxx.cast("double")) * F.sqrt(dyy.cast("double"))
    )
    return agg.select(
        F.col(group_col),
        F.col("n").alias("n_rows"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r.alias("pearson_r"),
    )


def bpe_merge_pairs(
    df: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """One BPE-training iteration: corpus-wide adjacent character-pair
    frequencies (weighted by word occurrence count) — the statistic a
    tokenizer trainer computes to pick its next merge. Iterating this
    with a merge-apply step IS BPE training; the single iteration is
    the oracle-able unit.

    Plan: tokenize + explode (scan-stage) → word-count groupBy (the
    heavy shuffle shrinks to the VOCABULARY, not the corpus) → pair
    explode over the vocab → pair-count groupBy → top-k via
    TakeOrderedAndProject with a deterministic (count desc, pair asc)
    order. Both groupBys are partial-aggregated; corpus size only
    enters through the first.
    """
    words = df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        wc.filter(F.length("word") >= 2)
        .select(
            "n",
            F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
            "word",
        )
        .select(F.expr("substring(word, i, 2)").alias("pair"), "n")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(top_k)
    )


NORMALIZED_SCHEMA = "doc_id long, text string, changed boolean"


def normalize_unicode(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", form: str = "NFC"
) -> DataFrame:
    """Unicode normalization (default NFC) — the canonicalization step
    that must run BEFORE any hash-based dedup: 'café' composed and
    'cafe'+combining-accent are different byte strings with identical
    rendering, so unnormalized corpora leak duplicates past every
    md5/minhash above.

    Python's unicodedata is the stdlib-only implementation (Spark has
    no built-in normalizer), so this is an Arrow-batched mapInPandas
    stage — vectorized str.normalize on the pandas block, never
    per-row Python UDF. Embarrassingly parallel, no shuffle.
    """
    import pandas as pd  # noqa: F401 (type context for the closure)

    def op(batches):
        for pdf in batches:
            norm = pdf[text_col].str.normalize(form)
            yield type(pdf)(
                {
                    "doc_id": pdf[id_col],
                    "text": norm,
                    "changed": norm != pdf[text_col],
                }
            )

    return df.select(id_col, text_col).mapInPandas(op, schema=NORMALIZED_SCHEMA)


def length_bucket_batches(
    df,
    tokens_col: str,
    batch_size: int,
    band_width: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch audit — the inference/training batching
    strategy that cuts padding waste: documents band by token length
    (band = n_tokens // band_width), rank within the band, and chunk
    into batches of ``batch_size``. Emits per-batch padding economics:
    ``padding_waste = n_rows * max_tokens - sum_tokens`` (the tokens a
    rectangular batch pads), all exact integer arithmetic.

    One banded window (partitioned — no global sort) + one groupBy;
    at scale the band is also the natural write-partition key."""
    from pyspark.sql import Window as W

    band = (F.col(tokens_col) / F.lit(band_width)).cast("long").alias("band")
    base = df.select(F.col(id_col), F.col(tokens_col).alias("n_tok"), band)
    rn = F.row_number().over(
        W.partitionBy("band").orderBy("n_tok", id_col)
    )
    batched = base.withColumn("batch_id", ((rn - 1) / F.lit(batch_size)).cast("long"))
    return batched.groupBy("band", "batch_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("n_tok").alias("max_tokens"),
        F.sum("n_tok").alias("sum_tokens"),
        (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok")).alias(
            "padding_waste"
        ),
    )


def remove_boilerplate_lines(
    df,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Line-level boilerplate removal — strip lines that appear
    verbatim in ≥ ``min_docs`` documents (nav bars, cookie banners,
    license footers), preserving the order of surviving lines. The
    line-granular complement of char_window_dups.

    Plan: posexplode lines (scan-stage), ONE groupBy(line) doc-count
    over distinct (doc, line), broadcast-size join back (boilerplate
    vocabulary is small by definition — lines above the bar), then a
    per-doc reassembly via sort_array(collect_list(struct(pos, line)))
    — grouping is by the original doc so the collect is bounded by one
    document's lines."""
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    freq = (
        lines.select("doc_id", "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    boiler = freq.filter(F.col("n_docs") >= min_docs).select(
        "line", F.lit(True).alias("is_boiler")
    )
    kept = (
        lines.join(F.broadcast(boiler), "line", "left")
        .filter(F.col("is_boiler").isNull())
        .select("doc_id", "pos", "line")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return rebuilt.join(totals, "doc_id").select(
        "doc_id",
        F.md5(F.encode(F.col("clean_text"), "utf-8")).alias("clean_md5"),
        "n_lines_kept",
        (F.col("n_lines") - F.col("n_lines_kept")).alias("n_removed"),
    )


def bigram_lm_score(
    df, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """KenLM-style quality signal without the external LM: train a
    word-bigram model on the corpus itself (one pass of counts), then
    score every document's average bigram log-probability
    ``mean log2 P(w_i | w_{i-1})`` with add-nothing MLE (every corpus
    bigram has nonzero count by construction — the model IS the
    corpus). Low scores flag machine-garbled / unnatural-word-order
    text; the cross-corpus variant (train on trusted, score crawl)
    just feeds two different frames.

    Plan: ONE tokenize pass feeds both the bigram count table and the
    per-doc bigram explode (vocabulary-bounded shuffles), then an
    equi-join doc-bigrams ⋈ LM and a per-doc mean. log2 of an exact
    integer ratio; the per-doc sum is rounded to 6 (libm log2 is not
    correctly-rounded — the char_entropy precedent)."""
    toks = tokenize(F.col(text_col))
    # bi/base feed multiple consumers with no ReusedExchange, but
    # checkpointing here is a NET LOSS (r15 A/B: none 1.05 s, both
    # 1.00 s on lm_score alone — yet ccnet_buckets pays the extra
    # serial materializations inside its own checkpoint build,
    # 1.38 -> 1.81 s). The tokenize re-runs are cheaper than the
    # blocking jobs; left uncheckpointed deliberately.
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("w"))
    bi = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.zip_with(
                    F.slice("w", 1, F.size("w") - 1),
                    F.slice("w", 2, F.size("w") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    uni = base.select("doc_id", F.explode("w").alias("word"))
    bi_counts = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_bi"))
    uni_counts = uni.groupBy("word").agg(F.count(F.lit(1)).alias("n_uni"))
    lm = bi_counts.withColumn(
        "prev", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    ).join(
        uni_counts.select(F.col("word").alias("prev"), "n_uni"), "prev"
    )
    scored = bi.join(lm.select("bigram", "n_bi", "n_uni"), "bigram")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.log2(F.col("n_bi").cast("double") / F.col("n_uni")))
            / F.count(F.lit(1)),
            6,
        ).alias("avg_log2_prob"),
    )


def pmi_pairs(
    df,
    min_doc_freq: int = 10,
    min_pair_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise mutual information over co-occurring term pairs —
    the collocation/phrase-mining statistic (tokenizer merge
    candidates, retrieval query expansion). PMI = log2(N·c_ab /
    (c_a·c_b)) over document-level co-occurrence.

    Scale bounds are explicit: the pair self-join runs over the
    FREQUENT vocabulary only (doc_freq ≥ ``min_doc_freq``), so the
    per-doc pair explosion is Σ k² with k = frequent terms per doc,
    not vocabulary²; ``min_pair_count`` prunes the long tail before
    the count table materializes. All counts are exact integers; the
    one log2 is rounded to 6 (libm, the char_entropy precedent)."""
    toks = tokenize(F.col(text_col))
    dt = df.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(toks)).alias("word")
    )
    freq = (
        dt.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_doc_freq)
    )
    ft = dt.join(F.broadcast(freq.select("word")), "word")
    a = ft.select("doc_id", F.col("word").alias("word_a"))
    b = ft.select("doc_id", F.col("word").alias("word_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_pair_count)
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    fa = freq.select(F.col("word").alias("word_a"), F.col("c").alias("c_a"))
    fb = freq.select(F.col("word").alias("word_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(fa), "word_a")
        .join(F.broadcast(fb), "word_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "word_a",
            "word_b",
            "c_ab",
            F.round(
                F.log2(
                    F.col("n_docs").cast("double")
                    * F.col("c_ab")
                    / (F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """Iterative BPE tokenizer TRAINING (Sennrich et al. 2016): start
    from character symbols, then repeat ``n_merges`` times: count
    adjacent symbol pairs corpus-wide, pick the most frequent pair
    (ties: lexicographic left, right — deterministic cross-engine),
    and merge it greedily left-to-right everywhere. Returns the merge
    TABLE (step, left_sym, right_sym, merged, n_occurrences) — the
    artifact a tokenizer ships; ``bpe_merge_pairs`` is this loop's
    single-iteration statistic.

    Scale shape: the corpus is scanned ONCE (word-count groupBy —
    the only corpus-sized shuffle); every iteration then runs on the
    VOCABULARY (distinct words + counts), which is orders of magnitude
    smaller and stays distributed: pair counts are a vocab-sized
    partial-agg shuffle, the argmax is a driver top-1 (one row), and
    the merge-apply is one Arrow-batched mapInPandas pass. The vocab
    is localCheckpoint()ed each iteration — iterative plans get no
    ReusedExchange across passes (fresh expr ids), so without it every
    iteration would replay the whole lineage including the corpus scan
    (the pagerank lesson). Greedy application uses the standard
    left-to-right non-overlapping rule (an 'aaa' run under merge (a,a)
    gives ['aa','a']), implemented as a fold that the DuckDB oracle
    replicates exactly via list_reduce.
    """
    from flink_essentials_spark.operators.transform import tokenize

    spark = df.sparkSession
    words = df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    vocab = wc.select(
        "n",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("symbols"),
    ).localCheckpoint()

    # Bounded-vocab fast path (the q-digest bounded-ladder
    # discipline): each distributed iteration costs two tiny jobs
    # (top-1 collect + checkpoint) of pure scheduling overhead once
    # the vocabulary is small — 8 merges measured 3.9 s at sf0.1 on a
    # ~31-word vocab vs ~1.3 s driver-side. When the DISTINCT-WORD
    # count table fits the driver (<= 65536 rows — the production
    # tokenizer-training cap regime), run the IDENTICAL greedy ladder
    # on the collected counts: same overlap-counted pair sums, same
    # (cnt DESC, left, right) tie-break, same left-to-right fold —
    # a pure execution-strategy switch, bit-identical output. At web
    # scale the distributed loop below takes over.
    # probe the SIZE first (cheap count on the checkpointed frame —
    # r11 advice: don't collect 65537 full symbol-array rows just to
    # learn the corpus is large-vocab)
    if vocab.count() <= 65536:
        head = vocab.collect()
        vpy = [(r["n"], list(r["symbols"])) for r in head]
        merges_py: list = []
        for step in range(1, n_merges + 1):
            cnt: dict = {}
            for n_w, sym in vpy:
                for p in zip(sym, sym[1:]):
                    cnt[p] = cnt.get(p, 0) + n_w
            if not cnt:
                break
            (a, b), c = min(
                cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges_py.append((step, a, b, a + b, int(c)))
            for idx, (n_w, sym) in enumerate(vpy):
                acc: list = []
                for x in sym:
                    if acc and acc[-1] == a and x == b:
                        acc[-1] = a + b
                    else:
                        acc.append(x)
                vpy[idx] = (n_w, acc)
        return spark.createDataFrame(
            merges_py,
            "step int, left_sym string, right_sym string, merged string, "
            "n_occurrences long",
        )

    merges = []
    for step in range(1, n_merges + 1):
        pairs = (
            vocab.filter(F.size("symbols") >= 2)
            .select(
                "n",
                F.explode(
                    F.sequence(F.lit(1), F.size("symbols") - 1)
                ).alias("i"),
                "symbols",
            )
            .select(
                F.element_at("symbols", F.col("i")).alias("left_sym"),
                F.element_at("symbols", F.col("i") + 1).alias("right_sym"),
                "n",
            )
        )
        best = (
            pairs.groupBy("left_sym", "right_sym")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["left_sym"], best[0]["right_sym"]
        merges.append((step, a, b, a + b, int(best[0]["cnt"])))

        def apply(batches, a=a, b=b):
            import pandas as pd

            for pdf in batches:
                out = []
                for syms in pdf["symbols"]:
                    acc = []
                    for x in syms:
                        if acc and acc[-1] == a and x == b:
                            acc[-1] = a + b
                        else:
                            acc.append(x)
                    out.append(acc)
                yield pd.DataFrame({"n": pdf["n"], "symbols": out})

        vocab = vocab.mapInPandas(
            apply, "n long, symbols array<string>"
        ).localCheckpoint()

    return spark.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, merged string, "
        "n_occurrences long",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge list (``bpe_train`` output order) and
    emit per-document token economics: n_words, n_chars (word chars —
    what the tokenizer actually sees), n_bpe_tokens after all merges,
    and chars_per_token. This is the train→ENCODE half of the
    tokenizer loop — the number every data pipeline budgets by.

    Scale shape: merges apply to the DISTINCT-WORD vocabulary, not the
    corpus — one Arrow-batched mapInPandas over distinct words runs
    the greedy fold once per (word, merge), then a word-level join
    (AQE-sized; the vocab side is tiny relative to the corpus) fans
    the per-word token counts back to documents for an integer
    groupBy. Corpus text is scanned once.
    """
    from flink_essentials_spark.operators.transform import tokenize

    doc_words = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word")
    )
    vocab = doc_words.select("word").distinct()

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            counts = []
            for w in pdf["word"]:
                syms = list(w)
                for a, b in merges:
                    acc = []
                    for x in syms:
                        if acc and acc[-1] == a and x == b:
                            acc[-1] = a + b
                        else:
                            acc.append(x)
                    syms = acc
                counts.append(len(syms))
            yield pd.DataFrame({"word": pdf["word"], "n_sym": counts})

    per_word = vocab.mapInPandas(enc, "word string, n_sym int")
    return (
        doc_words.join(per_word, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
        .select(
            id_col,
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            (
                F.col("n_chars").cast("double") / F.col("n_bpe_tokens")
            ).alias("chars_per_token"),
        )
    )



# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
# "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
# algorithm). Guarantee: any shared substring of length >= k + w - 1
# yields at least one shared selected fingerprint, while only ~2/(w+1)
# of all k-gram hashes are kept. Selection is the VALUE-min of each
# w-window of k-gram hashes — tie position doesn't affect the selected
# fingerprint SET, so plain min is exact and engine-neutral.
#
# Shape note: a per-row array formulation (transform over windows of a
# transform over grams) re-evaluates the inner gram expression per
# window — Catalyst inlines single-use aliases into lambda bodies, so
# the "materialize then slice" trick quadratics (measured: 370 s for
# 500 docs). The distributed form below explodes (pos, gram-hash) rows
# and takes the w-row running min with a window function — linear, one
# doc-keyed shuffle, and it handles a single 1 GB document (grams
# never sit in one array).
# ---------------------------------------------------------------------------


def _winnow_fp_rows(
    df: DataFrame, k: int, w: int, text_col: str, id_col: str
) -> DataFrame:
    """Distinct selected winnowing fingerprints as (doc_id, nh, h)
    rows; nh = k-gram count. Docs with no k-gram (< k canonical chars)
    drop out."""
    from pyspark.sql import Window as W

    clean = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    base = df.select(F.col(id_col).alias("doc_id"), clean.alias("clean")).select(
        "doc_id",
        "clean",
        F.greatest(F.length("clean") - (k - 1), F.lit(0)).alias("nh"),
    )
    rows = base.select(
        "doc_id",
        "nh",
        F.explode(
            F.when(
                F.col("nh") >= 1, F.sequence(F.lit(1), F.col("nh"))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
        F.col("clean"),
    ).select(
        "doc_id",
        "nh",
        "i",
        word_hash(F.col("clean").substr(F.col("i"), F.lit(k))).alias("h"),
    )
    win = W.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    sel = rows.withColumn("mh", F.min("h").over(win)).filter(
        # window START positions: 1..nh-w+1, or the single all-grams
        # window when nh < w (the running min at i=1 then spans all)
        (F.col("i") <= F.col("nh") - (w - 1)) | (F.col("i") == 1)
    )
    return sel.select("doc_id", "nh", F.col("mh").alias("h")).distinct()


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc winnowing fingerprint summary: distinct selected k-gram
    hashes counted and folded into an order-independent bit_xor
    signature. Text is canonicalized to lowercase [a-z0-9] (the
    paper's whitespace/punctuation-insensitive matching).

    Returns (doc_id, n_kgrams, n_windows, n_fingerprints, fp_xor).
    The doc-keyed window shuffle and the groupBy share the doc_id
    partitioning; docs too short for one k-gram drop out.
    """
    fps = _winnow_fp_rows(df, k, w, text_col, id_col)
    return (
        fps.groupBy("doc_id", "nh")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.expr("bit_xor(h)").alias("fp_xor"),
        )
        .select(
            "doc_id",
            F.col("nh").alias("n_kgrams"),
            F.greatest(
                F.col("nh") - (w - 1), F.least(F.col("nh"), F.lit(1))
            ).alias("n_windows"),
            "n_fingerprints",
            "fp_xor",
        )
    )


def winnowing_match_pairs(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Doc pairs sharing >= ``min_shared`` winnowing fingerprints —
    the MOSS near-dup/plagiarism detector. By the winnowing guarantee
    a shared substring of length >= k+w-1 canonical chars forces >= 1
    shared fingerprint, so min_shared=2 tolerates one chance collision.

    Scale shape: fingerprints equi-join on the hash (banded, never
    all-pairs — the LSH discipline); pair counts are a keyed groupBy.
    """
    fp = _winnow_fp_rows(df, k, w, text_col, id_col).select("doc_id", "h")
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )



def bm25_scores(
    df: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 relevance of every document to a fixed term set (Robertson
    et al., Okapi BM25; idf in the always-positive Lucene form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

    Plan: per-term tf columns are scan-stage array filters (no explode
    — terms are a bounded query set); N / avgdl / per-term df collapse
    into ONE scalar aggregate broadcast back over the corpus (the
    idle_customers one-row pattern). Per-term scores are added in
    FIXED left-to-right term order so both engines sum identical
    operands; ln() is libm (the lm_score precedent) so the final score
    is rounded to 6.

    Returns (doc_id, dl, tf_<term>..., bm25_score).
    """
    toks = tokenize(F.col(text_col))

    def _tf(term: str) -> Column:
        # NB: a lambda with a second (default) arg would change
        # F.filter's arity contract — the 2-arg form receives the
        # ELEMENT INDEX as its second parameter
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = df.select(
        id_col,
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf_{t}") for t in terms],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in terms
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + (F.lit(b) * F.col("dl").cast("double")) / avgdl
    )
    score = None
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
        )
        s = (idf * (tf * F.lit(k1 + 1.0))) / (tf + norm)
        score = s if score is None else score + s
    return joined.select(
        id_col,
        "dl",
        *[f"tf_{t}" for t in terms],
        F.round(score, 6).alias("bm25_score"),
    )


def bm25_multi(
    df: DataFrame,
    queries: list[tuple[str, list[str]]],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 relevance of every document to SEVERAL term-set queries in
    ONE corpus scan (the r10-verdict shared-ranking fix for
    rrf_fusion/ndcg_eval, which previously unioned one bm25_scores
    branch — one scan + one stats aggregate — per query): per-term tf
    columns for the UNION of all query terms are scan-stage array
    filters, N / avgdl / per-term df collapse into ONE scalar-aggregate
    broadcast, and each query's score adds its own terms in the same
    fixed left-to-right order as bm25_scores (identical float ops, so
    scores are bit-identical to the per-query oracle). The per-query
    rows unpivot via stack — no second scan, no union of scans.

    Returns (doc_id, query_id, bm25_score) — every doc appears once
    per query."""
    toks = tokenize(F.col(text_col))
    terms: list[str] = []
    for _, ts in queries:
        for t in ts:
            if t not in terms:
                terms.append(t)

    def _tf(term: str) -> Column:
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = df.select(
        id_col,
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf_{t}") for t in terms],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in terms
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + (F.lit(b) * F.col("dl").cast("double")) / avgdl
    )

    def _score(q_terms: list[str]) -> Column:
        score = None
        for t in q_terms:
            tf = F.col(f"tf_{t}").cast("double")
            idf = F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
                / (F.col(f"df_{t}") + F.lit(0.5))
            )
            s = (idf * (tf * F.lit(k1 + 1.0))) / (tf + norm)
            score = s if score is None else score + s
        return F.round(score, 6)

    scored = joined.select(
        id_col,
        *[_score(ts).alias(f"__s_{i}") for i, (_, ts) in enumerate(queries)],
    )
    pairs = ", ".join(f"'{qid}', __s_{i}" for i, (qid, _) in enumerate(queries))
    return scored.selectExpr(
        id_col,
        f"stack({len(queries)}, {pairs}) AS (query_id, bm25_score)",
    )


def zipf_fit(
    df: DataFrame,
    top_r: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve: OLS of
    ln(freq) on ln(rank) over the ``top_r`` most frequent words —
    the power-law audit (slope ~ -1 for natural language; a synthetic
    or template-heavy corpus shows up as a flat or broken slope).

    Scale shape: one tokenize explode + word groupBy, then
    ``orderBy().limit(top_r)`` (TakeOrderedAndProject — per-partition
    partial top-k, never a global sort or a partitionless window);
    ranks come from sorting the collected top-R array INSIDE the one
    summary row. The OLS sums fold over that array in rank order, so
    both engines add identical operands in identical order (ln is
    libm — the lm_score precedent — hence round(,6) on the emitted
    slope/intercept; the fold init 0.0+x1 == x1 bit-exactly, matching
    DuckDB's init-less list_reduce).

    Returns one row: (n_points, top_word, top_count, slope,
    intercept).
    """
    toks = tokenize(F.col(text_col))
    counts = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), "w").limit(top_r)
    one = top.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("cnt")).alias("nc"),
                    F.col("w").alias("w"),
                    F.col("cnt").alias("cnt"),
                )
            )
        ).alias("arr")
    )
    arr = F.col("arr")
    n = F.size(arr)
    idx = F.sequence(F.lit(1), n)

    def _fold(vals: Column) -> Column:
        return F.aggregate(
            vals, F.lit(0.0), lambda acc, x: acc + x
        )

    lnr = F.transform(idx, lambda i: F.log(i.cast("double")))
    lnf = F.transform(
        idx, lambda i: F.log(F.element_at(arr, i)["cnt"].cast("double"))
    )
    sums = one.select(
        n.alias("n_points"),
        F.element_at(arr, 1)["w"].alias("top_word"),
        F.element_at(arr, 1)["cnt"].alias("top_count"),
        _fold(lnr).alias("sx"),
        _fold(lnf).alias("sy"),
        _fold(F.zip_with(lnr, lnf, lambda a, b: a * b)).alias("sxy"),
        _fold(F.zip_with(lnr, lnr, lambda a, b: a * b)).alias("sxx"),
    )
    nd = F.col("n_points").cast("double")
    with_slope = sums.select(
        "n_points",
        "top_word",
        "top_count",
        "sx",
        "sy",
        (
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope_raw"),
    )
    return with_slope.select(
        "n_points",
        "top_word",
        "top_count",
        F.round("slope_raw", 6).alias("slope"),
        F.round(
            (F.col("sy") - F.col("slope_raw") * F.col("sx"))
            / F.col("n_points").cast("double"),
            6,
        ).alias("intercept"),
    )


def content_chunks(
    df: DataFrame,
    k: int = 8,
    mask_bits: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the Rabin-fingerprint boundary scheme
    of rsync / LBFS, Muthitacharoen et al. 2001): a chunk boundary
    falls after position ``i`` whenever the hash of the k chars ending
    at ``i`` is 0 mod 2^mask_bits — so an insertion shifts boundaries
    only LOCALLY and unchanged regions keep identical chunk hashes
    (the property fixed-window chunking lacks; avg chunk ~2^mask_bits
    chars). The pure form, no min/max clamps — those are stateful and
    break the locality guarantee at the clamp points.

    Distributed shape (the winnowing lesson — no per-row array
    re-evaluation): candidate positions explode to rows, boundary
    rows survive a scan-stage filter (~n/2^mask_bits of them), the
    end-of-doc sentinel unions in, and chunk extents come from a
    doc-keyed lag window; chunk text extraction joins back to the doc
    table on the same key. Docs shorter than one window emit one
    whole-doc chunk.

    Returns (doc_id, chunk_idx, start_pos, chunk_len, chunk_md5).
    """
    text = F.col(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        text.alias("__text"),
        F.length(text).alias("__n"),
    ).filter(F.col("__n") > 0)
    pos = base.select(
        "doc_id",
        "__text",
        F.explode(
            F.when(
                F.col("__n") >= k, F.sequence(F.lit(k), F.col("__n"))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    )
    h = word_hash(F.col("__text").substr(F.col("i") - (k - 1), F.lit(k)))
    bnd = pos.filter(h % (1 << mask_bits) == 0).select("doc_id", F.col("i").alias("endpos"))
    ends = bnd.unionByName(
        base.select("doc_id", F.col("__n").alias("endpos"))
    ).distinct()
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("endpos")
    extents = ends.select(
        "doc_id",
        "endpos",
        (F.lag("endpos", 1, 0).over(w) + 1).alias("start_pos"),
        F.row_number().over(w).alias("chunk_idx"),
    )
    return extents.join(base, "doc_id").select(
        "doc_id",
        "chunk_idx",
        "start_pos",
        (F.col("endpos") - F.col("start_pos") + 1).alias("chunk_len"),
        F.md5(
            F.encode(
                F.col("__text").substr(
                    F.col("start_pos"),
                    F.col("endpos") - F.col("start_pos") + 1,
                ),
                "utf-8",
            )
        ).alias("chunk_md5"),
    )


def ccnet_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_rows_hint: int | None = None,
) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): rank every document within its stratum by LM quality
    (here the corpus-self-trained bigram LM of
    :func:`bigram_lm_score` — CCNet's is a KenLM 5-gram; the pipeline
    is the algorithm) and split each stratum into ``n_buckets``
    equal-population buckets — bucket 0 = head (best), last = tail.
    Per-stratum bucketing is the point: it prevents one source's
    distribution from swallowing another's head.

    Ranking uses the ROUNDED score (cross-engine identical per the
    lm_score oracle) with doc-id tiebreak, so bucket assignment is
    deterministic on any engine; the bucket index is explicit floor
    division on both sides (the window_anomaly discipline). The rank
    is a BANDED rank (timeseries.banded_rank) — strata are
    low-cardinality, so a plain per-stratum row_number would sort each
    stratum's whole corpus in one task (the r10-verdict weak shape).
    """
    from flink_essentials_spark.functions.timeseries import banded_rank

    scores = bigram_lm_score(df, text_col=text_col, id_col=id_col)
    src = df.select(F.col(id_col).alias("doc_id"), strata_col)
    # banded_rank reads its input ~3x (bounds, band totals, final
    # window) and the input here is the WHOLE corpus-self-trained LM
    # scoring plan — without the cut it re-ran 3x (r14: 120 Exchange
    # in the tail plan; the ndcg_eval lesson)
    j = (
        scores.join(src, "doc_id")
        .withColumn("__nscore", -F.col("avg_log2_prob"))
        .localCheckpoint()
    )
    n_strat = j.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    ranked = (
        banded_rank(
            j,
            [strata_col],
            "__nscore",
            ["doc_id"],
            rank_col="__rk",
            # one row per document — the caller's footer hint applies
            n_rows_hint=n_rows_hint,
        )
        .join(F.broadcast(n_strat), strata_col)
        .select(
            "doc_id",
            strata_col,
            "avg_log2_prob",
            F.col("__rk").cast("int").alias("ppl_rank"),
            "__n",
        )
    )
    return ranked.select(
        "doc_id",
        strata_col,
        "avg_log2_prob",
        "ppl_rank",
        F.floor((F.lit(n_buckets) * (F.col("ppl_rank") - 1)) / F.col("__n"))
        .cast("int")
        .alias("bucket"),
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau 2004, "TextRank:
    Bringing Order into Texts"): build the corpus word co-occurrence
    graph — an undirected edge per ADJACENT token pair, weighted by
    corpus-wide occurrence count — and run fixed-iteration weighted
    PageRank over it (:func:`graph.pagerank`); a word's rank is its
    keyword salience. The classic unsupervised keyword extractor; at
    corpus scale the graph is vocabulary-sized, tiny next to the text
    that produced it.

    Scale shape: adjacent pairs are built INSIDE the scan stage
    (slice+zip on the token array — no positional self-join), so the
    only shuffles are the vocabulary-sized edge groupBy and the
    pagerank iterations, each linear in |E|. Self-loops (repeated
    adjacent words) are dropped per the paper's simple-graph
    convention; the unordered pair is canonicalized with
    least/greatest before counting, then symmetrized so no node
    dangles.
    """
    from flink_essentials_spark.functions.graph import pagerank
    from flink_essentials_spark.operators.transform import tokenize

    t = tokenize(F.col(text_col))
    pairs = F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.struct(
                F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    edges = (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        # the vocabulary-sized edge list feeds both union directions
        # AND the 3-round ladder re-reads it; materialize once, and
        # the count (~ms on the checkpointed frame) gates pagerank's
        # bounded single-task twin (string-id capable since r15)
        .localCheckpoint()
    )
    n_e = edges.count()
    ranks = pagerank(
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w"),
        iterations=iterations,
        damping=damping,
        weight_col="w",
        n_edges_hint=2 * n_e,
        symmetrize=True,
    )
    return ranks.select(
        F.col("node").alias("word"), F.round("rank", 6).alias("rank")
    )


def wordpiece_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1000,
    max_piece: int = 3,
) -> DataFrame:
    """Corpus-derived WordPiece vocabulary (Schuster & Nakajima 2012;
    the BERT tokenizer's greedy counterpart to BPE): every substring
    of length 2..max_piece whose occurrence-weighted corpus frequency
    reaches ``min_freq``, in BOTH positional forms — word-initial
    (``ab``) and continuation (``##ab``) — plus every single-character
    form unconditionally, which makes the greedy encoder total over
    the training corpus (no [UNK] on seen characters).

    Scale shape: substring enumeration runs over DISTINCT words
    weighted by their counts (the dictionary trick — corpus text is
    scanned once for the word histogram; piece stats never touch raw
    text again), so the explode is vocabulary-sized, not corpus-sized.
    Returns (piece, freq)."""
    from flink_essentials_spark.operators.transform import tokenize

    wc = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    def piece_lambda(L):
        # a ONE-parameter lambda: pyspark treats a second lambda
        # parameter as the element INDEX, so `lambda i, L=L` silently
        # rebinds L — the closure factory is the only safe capture
        def fn(i):
            sub = F.substring(F.col("w"), i, F.lit(L))
            return F.struct(
                F.when(i == 1, sub)
                .otherwise(F.concat(F.lit("##"), sub))
                .alias("piece")
            )

        return fn

    pieces = []
    for L in range(1, max_piece + 1):
        # guard: F.sequence(1, 0) generates DESCENDING [1, 0]
        idx = F.when(
            F.length("w") >= L,
            F.sequence(F.lit(1), F.length("w") - F.lit(L - 1)),
        ).otherwise(F.array().cast("array<int>"))
        pieces.append(F.transform(idx, piece_lambda(L)))
    subs = (
        wc.filter(F.length("w") >= 1)
        .select("n", F.explode(F.flatten(F.array(*pieces))).alias("p"))
        .groupBy(F.col("p.piece").alias("piece"))
        .agg(F.sum("n").alias("freq"))
    )
    return subs.filter(
        (F.col("freq") >= min_freq)
        | (F.length(F.regexp_replace("piece", "^##", "")) == 1)
    )


def wordpiece_encode_words(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1000,
    max_piece: int = 3,
) -> DataFrame:
    """Greedy longest-match-first WordPiece encoding of every DISTINCT
    corpus word against :func:`wordpiece_vocab` — the BERT tokenizer's
    encode step (match the longest vocab prefix, emit, continue with
    ``##`` continuation forms; an unmatched character emits ``[UNK]``
    and advances one). Encoding runs per distinct word (dictionary
    encoding — decode cost is one hash join back to the corpus, never
    a re-tokenization), with the vocabulary carried as a one-row
    broadcast array (the scalar-crossJoin pattern; no driver collect).

    The greedy scan is one F.aggregate fold over character positions
    with a (pos, emitted) struct accumulator — interpreted, but over
    vocabulary-sized input. Returns (word, n, pieces, n_pieces) with
    ``pieces`` space-joined."""
    from flink_essentials_spark.operators.transform import tokenize

    wc = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = wordpiece_vocab(
        df, text_col=text_col, min_freq=min_freq, max_piece=max_piece
    ).agg(F.collect_list("piece").alias("v"))

    def form(i, L):
        sub = F.col("w").substr(i, F.lit(L))
        return F.when(i == 1, sub).otherwise(F.concat(F.lit("##"), sub))

    def step(acc, i):
        branches = None
        for L in range(max_piece, 0, -1):
            cand = form(i, L)
            cond = (i + F.lit(L - 1) <= F.length("w")) & F.array_contains(
                F.col("v"), cand
            )
            nxt = F.struct(
                (i + F.lit(L)).alias("pos"),
                F.concat(acc["out"], cand, F.lit(" ")).alias("out"),
            )
            branches = (
                F.when(cond, nxt) if branches is None else branches.when(cond, nxt)
            )
        unk = F.struct(
            (i + F.lit(1)).alias("pos"),
            F.concat(acc["out"], F.lit("[UNK] ")).alias("out"),
        )
        return F.when(i != acc["pos"], acc).otherwise(branches.otherwise(unk))

    st = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.struct(F.lit(1).alias("pos"), F.lit("").alias("out")),
        step,
    )
    return wc.crossJoin(F.broadcast(vocab)).select(
        F.col("w").alias("word"),
        "n",
        F.trim(st["out"]).alias("pieces"),
        F.size(F.split(F.trim(st["out"]), " ")).alias("n_pieces"),
    )


def unigram_segment_words(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1000,
    max_piece: int = 3,
    max_word: int = 12,
) -> DataFrame:
    """Unigram-LM Viterbi segmentation (Kudo 2018, "Subword
    Regularization" — the SentencePiece objective): over the SAME
    corpus-derived piece vocabulary :func:`wordpiece_vocab` builds,
    find each distinct word's GLOBALLY optimal segmentation — minimum
    total piece cost — where WordPiece's greedy longest-prefix scan
    only finds a local one. Piece cost is the exact integer
    bit-length surprisal ``bitlen(total_freq) - bitlen(freq)`` (an
    integer-log2 -log p; bit lengths via base-2 string conversion, so
    both engines compute the identical integers — no floating log),
    and ties break by fewer pieces then lexicographic piece string, a
    total order.

    The DP is one F.aggregate fold over character positions whose
    accumulator is the best[0..i] array (Viterbi's table), with the
    vocabulary carried as a one-row broadcast MAP — per-word work is
    O(len·max_piece) with no join, the dictionary-encode shape that
    scales by distinct words. Words longer than ``max_word`` are
    excluded (the oracle unrolls one CTE level per position).
    Returns (word, n, cost, n_pieces, pieces)."""
    from flink_essentials_spark.operators.transform import tokenize

    INF = 10**9
    wc = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.length("w") <= max_word)
    )
    vocab = wordpiece_vocab(
        df, text_col=text_col, min_freq=min_freq, max_piece=max_piece
    ).agg(
        F.map_from_entries(F.collect_list(F.struct("piece", "freq"))).alias(
            "vm"
        ),
        F.sum("freq").alias("total"),
    )

    def bl(c):
        return F.length(F.conv(c.cast("string"), 10, 2))

    def form(i, L):
        sub = F.substring(F.col("w"), i - F.lit(L - 1), F.lit(L))
        return F.when(i - F.lit(L - 1) == 1, sub).otherwise(
            F.concat(F.lit("##"), sub)
        )

    bad = F.struct(
        F.lit(INF).alias("cost"), F.lit(INF).alias("np"), F.lit("~").alias("s")
    )

    def step(acc, i):
        cands = []
        for L in range(1, max_piece + 1):
            prev = F.element_at(acc, i - F.lit(L - 1))
            piece = form(i, L)
            freq = F.element_at(F.col("vm"), piece)
            cost = bl(F.col("total")) - bl(freq)
            cands.append(
                F.when(
                    (i >= L) & freq.isNotNull() & (prev["cost"] < F.lit(INF)),
                    F.struct(
                        (prev["cost"] + cost).alias("cost"),
                        (prev["np"] + 1).alias("np"),
                        F.concat(prev["s"], piece, F.lit(" ")).alias("s"),
                    ),
                ).otherwise(bad)
            )
        return F.array_append(acc, F.least(*cands))

    init = F.array(
        F.struct(F.lit(0).alias("cost"), F.lit(0).alias("np"), F.lit("").alias("s"))
    )
    dp = F.aggregate(F.sequence(F.lit(1), F.length("w")), init, step)
    return (
        wc.crossJoin(F.broadcast(vocab))
        .select("w", "n", F.element_at(dp, F.length("w") + 1).alias("b"))
        .select(
            F.col("w").alias("word"),
            "n",
            F.col("b.cost").alias("cost"),
            F.col("b.np").alias("n_pieces"),
            F.trim("b.s").alias("pieces"),
        )
    )


def kneser_ney_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1998's interpolated form — the smoothing KenLM
    ships): the production-grade upgrade of :func:`bigram_lm_score`'s
    MLE, redistributing discounted mass to a CONTINUATION prior
    (how many distinct contexts a word follows) instead of raw
    frequency:

        P(w2|w1) = max(c(w1 w2) - D, 0)/c(w1.)
                   + D·N1+(w1 •)/c(w1.) · N1+(• w2)/N1+(• •)

    with discount D = 3/4 — a RATIONAL, so scaling by 4·c(w1.)·N1+(••)
    makes numerator and denominator exact BIGINTs: both engines divide
    identical integers and log2 identical doubles (per-doc sums then
    round to 6, the bigram_lm_score/char_entropy libm contract).
    c(w1.) is the CONTEXT count (bigrams starting at w1), per the
    paper, not the unigram token count.

    Plan: one tokenize pass feeds the bigram explode; the model is
    three vocabulary-bounded aggregates (bigram counts, per-context
    count+distinct-continuations, per-word distinct-left-contexts)
    joined back onto doc bigrams — the bigram_lm_score shape plus two
    sketch-sized joins. Returns (doc_id, n_bigrams, avg_log2_pkn)."""
    toks = tokenize(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("w"))
    bi = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.zip_with(
                    F.slice("w", 1, F.size("w") - 1),
                    F.slice("w", 2, F.size("w") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    # bi feeds the model (via bc) AND the final per-doc scoring join —
    # differing consumers, no ReusedExchange (r15: X=17 reuse=0, the
    # tokenizer + bigram explode ran twice); typed feeds FOUR
    # consumers (ctx/left/nbt/lm), each of which would re-run the
    # corpus aggregate uncheckpointed. Both cuts are vocabulary- or
    # corpus-bounded one-pass materializations.
    bi = bi.localCheckpoint()
    bc = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_bi"))
    typed = bc.select(
        "bigram",
        "c_bi",
        F.split_part("bigram", F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part("bigram", F.lit(" "), F.lit(2)).alias("w2"),
    ).localCheckpoint()
    ctx = typed.groupBy("w1").agg(
        F.sum("c_bi").alias("c_ctx"),
        F.count(F.lit(1)).alias("n_cont"),
    )
    left = typed.groupBy("w2").agg(F.count(F.lit(1)).alias("n_left"))
    nbt = typed.agg(F.count(F.lit(1)).alias("n_types"))
    lm = (
        typed.join(ctx, "w1")
        .join(left, "w2")
        .crossJoin(F.broadcast(nbt))
        .select(
            "bigram",
            # P = [max(4c-3,0)·Nbt + 3·n_cont·n_left] / [4·c_ctx·Nbt]
            (
                F.greatest(4 * F.col("c_bi") - 3, F.lit(0)) * F.col("n_types")
                + 3 * F.col("n_cont") * F.col("n_left")
            ).alias("p_num"),
            (4 * F.col("c_ctx") * F.col("n_types")).alias("p_den"),
        )
    )
    scored = bi.join(lm, "bigram")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.log2(F.col("p_num").cast("double") / F.col("p_den")))
            / F.count(F.lit(1)),
            6,
        ).alias("avg_log2_pkn"),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    delta: int = 2,
    min_count: int = 3,
    threshold: float = 1.0,
) -> DataFrame:
    """word2phrase collocation mining (Mikolov et al. 2013,
    "Distributed representations of words and phrases and their
    compositionality" §4) — the phrase-detection pass an LLM-data
    pipeline runs before tokenizer training so "new york" becomes one
    unit: adjacent word pairs scored by the discounted PMI ratio

        score(a,b) = (count(ab) - delta) * N / (count(a) * count(b))

    where N = total tokens; ``delta`` discounts rare accidents, and
    ``score > threshold`` marks a phrase. The score is ONE division of
    exact BIGINT operands (products bounded: counts <= N, so each side
    < N^2 — int64-safe to corpora of ~3B tokens per shard; shard
    larger corpora before the ratio), so it is bit-identical
    cross-engine with zero rounding.

    Scale shape: bigram/unigram counting is scan-stage explode +
    groupBy (map-side combined); unigram counts join back on the
    vocabulary (vocabulary-sized, broadcast below the threshold —
    Zipf keeps word vocabularies in the millions regardless of corpus
    size); the one-row total-token aggregate rides a broadcast
    crossJoin (BNLJ — audited in the test_plans allowlist). Returns
    (w1, w2, n_ab, n_a, n_b, score, is_phrase) for pairs with
    ``n_ab >= min_count``."""
    toks = docs.select(tokenize(F.col(text_col)).alias("w"))
    uni = (
        toks.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n_uni"))
    )
    total = uni.agg(F.sum("n_uni").cast("long").alias("n_total"))
    bi = toks.select(
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.zip_with(
                    F.slice("w", 1, F.size("w") - 1),
                    F.slice("w", 2, F.size("w") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    pair_counts = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_count))
    )
    scored = (
        pair_counts.join(
            F.broadcast(uni.select(F.col("t").alias("w1"), F.col("n_uni").alias("n_a"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("t").alias("w2"), F.col("n_uni").alias("n_b"))),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_a",
            "n_b",
            (
                ((F.col("n_ab") - F.lit(int(delta))) * F.col("n_total"))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("score"),
        )
    )
    return scored.withColumn(
        "is_phrase", F.col("score") > F.lit(float(threshold))
    )


def ngrams_col(w: Column, n: int) -> Column:
    """Word n-grams as space-joined strings from a token array column
    (empty array when the doc has fewer than n tokens — guarded
    against the descending-F.sequence gotcha)."""
    L = F.size(w)
    return F.when(
        L >= n,
        F.transform(
            F.sequence(F.lit(1), L - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def vocab_richness(
    docs: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Vocabulary-richness estimators over word n-gram TYPES — the
    how-much-corpus-haven't-we-seen audit an LLM-data pipeline runs
    before deciding whether more crawling still buys new content:

    - Chao1 richness (Chao 1984): estimated TRUE number of n-gram
      types D + f1²/(2·f2), from the singleton/doubleton counts alone.
    - Good-Turing unseen mass (Good 1953): probability the next token
      is an unseen type, f1/N.

    Both are single divisions of exact BIGINT operands (counts of
    counts), so the estimators are bit-identical cross-engine. The
    frequency-of-frequencies profile is two chained counts — scan →
    groupBy(type) → one-row aggregate — fully map-side-combinable at
    any scale. Returns one row (n_tokens, vocab, f1, f2, chao1,
    p_unseen)."""
    toks = docs.select(tokenize(F.col(text_col)).alias("w"))
    g = (
        toks.select(F.explode(ngrams_col(F.col("w"), n)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return g.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.count_if(F.col("c") == 1).cast("long").alias("f1"),
        F.count_if(F.col("c") == 2).cast("long").alias("f2"),
    ).select(
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        (
            F.col("vocab").cast("double")
            + (F.col("f1") * F.col("f1")).cast("double")
            / (2 * F.col("f2"))
        ).alias("chao1"),
        (F.col("f1").cast("double") / F.col("n_tokens")).alias("p_unseen"),
    )


def mink_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_pct_num: int = 1,
    k_pct_den: int = 5,
) -> DataFrame:
    """Min-K% Prob membership score (Shi et al. 2023, "Detecting
    pretraining data from large language models") in integer-surprisal
    form: per document, the summed surprisal of its
    k = ceil(n·k_pct) HIGHEST-surprisal tokens under the corpus-self
    unigram model — the membership/contamination detector (a document
    whose least-likely tokens are still likely was probably seen).
    Token surprisal = bit-length(N div c_w), an exact integer (the
    unigram_segments cost idiom): the top-k sum is a BIGINT
    (tie-invariant — equal costs contribute equally regardless of
    rank order), the per-token average ONE division. Vocabulary joins
    broadcast (Zipf-bounded); ranking is a doc-keyed window. Returns
    (id, n_tokens, k, mink_cost, mink_avg)."""
    from pyspark.sql import Window as W

    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(tokenize(F.col(text_col))).alias("w"),
    )
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").cast("long").alias("n_total"))
    costed = (
        tok.join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "__id",
            F.length(F.bin(F.expr("n_total div c"))).cast("long").alias(
                "cost"
            ),
        )
    )
    kn, kd = int(k_pct_num), int(k_pct_den)
    ranked = costed.select(
        "__id",
        "cost",
        F.row_number()
        .over(W.partitionBy("__id").orderBy(F.desc("cost")))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("__id")).alias("n"),
    )
    return (
        ranked.groupBy("__id")
        .agg(
            F.max("n").alias("n_tokens"),
            F.expr(f"(max(n) * {kn} + {kd} - 1) div {kd}").alias("k"),
            F.sum(
                F.when(
                    F.col("rn") <= F.expr(f"(n * {kn} + {kd} - 1) div {kd}"),
                    F.col("cost"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("mink_cost"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "k",
            "mink_cost",
            (F.col("mink_cost").cast("double") / F.col("k")).alias(
                "mink_avg"
            ),
        )
    )


def canonical_url(url: Column) -> Column:
    """RFC 3986-style URL normalization as pure scan-stage Column ops
    — the variant-collapsing step before URL-level dedup / frequency
    counting in a web corpus (the same page arrives as HTTPS://Host:443
    /p#frag, https://host/p?utm_source=x, ...): lowercase scheme and
    host, drop default ports (80/http, 443/https), strip the fragment,
    normalize an empty path to '/', drop utm_* tracking parameters,
    and SORT the surviving query parameters. Everything is
    substring/array arithmetic inside whole-stage codegen — no UDF, no
    regex backtracking in the hot path."""
    u0 = F.substring_index(url, "#", 1)
    scheme = F.lower(F.substring_index(u0, "://", 1))
    tail = F.substring_index(u0, "://", -1)
    hostport = F.substring_index(tail, "/", 1)
    rest = F.substring(tail, F.length(hostport) + 1, F.lit(1 << 20))
    path = F.when(rest == "", F.lit("/")).otherwise(
        F.substring_index(rest, "?", 1)
    )
    qstr = F.when(
        F.instr(rest, "?") > 0,
        F.substring(rest, F.instr(rest, "?") + 1, F.lit(1 << 20)),
    ).otherwise(F.lit(""))
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.when(
        F.instr(hostport, ":") > 0, F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    keep_port = ~(
        (port == "")
        | ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
    )
    params = F.array_sort(
        F.filter(
            F.split(qstr, "&"),
            lambda p: (~p.startswith("utm_")) & (p != ""),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        qpart,
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    mask_bits: int = 6,
    max_len: int = 256,
) -> DataFrame:
    """Content-defined chunking (Muthitacharoen, Chen & Mazières,
    "A low-bandwidth network file system", SOSP 2001 — the LBFS
    boundary scheme every storage dedup system descends from): cut a
    document AFTER position p whenever the hash of the ``window``
    chars ending at p satisfies h ≡ mask (mod 2^mask_bits), expected
    chunk 2^mask_bits chars. Unlike chunk_documents' fixed stride,
    boundaries move WITH the content: inserting a byte shifts only
    the chunks that touch it — every later chunk re-aligns and its
    hash still matches, which is what makes chunk-level dedup robust
    to edits (the property test pins exactly this).

    Determinism/parity: the boundary decision uses the cross-engine
    md5-prefix integer of the literal window substring, so a DuckDB
    oracle reproduces every cut; oversized gaps split at fixed
    ``max_len`` offsets from the preceding cut — a stateless closed
    form, so no sequential pass exists anywhere (LBFS' min-size
    suppression IS sequential and is deliberately dropped; the
    window length already lower-bounds repeat cuts in practice).

    Scale shape: pure scan-stage array expressions per document (cut
    list → boundary pairs → sub-chunks), one explode to chunk rows,
    and ONE keyed exchange for the corpus-wide copy count per chunk
    hash. Returns (doc_id, start, len, chunk_md5, n_copies)."""
    from pyspark.sql import Window as W

    m = 1 << mask_bits
    mask = m - 1
    w = int(window)
    cuts = (
        f"CASE WHEN length(__t) >= {w} THEN "
        f"filter(transform(sequence(1, length(__t) - {w} + 1), i -> "
        f"IF(CAST(conv(substring(md5(substring(__t, i, {w})), 1, 15), 16, 10) "
        f"AS BIGINT) % {m} = {mask}, i + {w} - 1, -1)), e -> e > 0) "
        f"ELSE array() END"
    )
    bnds = (
        f"array_sort(array_distinct(concat(array(0), {cuts}, "
        f"array(length(__t)))))"
    )
    staged = (
        df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")
        )
        .filter(F.length("__t") > 0)
        .withColumn("__b", F.expr(bnds))
        .withColumn(
            "__pair",
            F.explode(
                F.arrays_zip(
                    F.slice("__b", 1, F.size("__b") - 1),
                    F.expr("slice(__b, 2, size(__b) - 1)"),
                )
            ),
        )
        .select(
            "doc_id",
            "__t",
            F.col("__pair")["0"].alias("__a"),
            F.col("__pair")["1"].alias("__z"),
        )
        .withColumn(
            "__j",
            F.explode(
                F.expr(f"sequence(0, (__z - __a - 1) div {int(max_len)})")
            ),
        )
        .select(
            "doc_id",
            (F.col("__a") + F.col("__j") * max_len + 1)
            .cast("long")
            .alias("start"),
            F.least(
                F.lit(max_len), F.col("__z") - F.col("__a") - F.col("__j") * max_len
            )
            .cast("long")
            .alias("len"),
            F.md5(F.expr("substring(__t, __a + __j * " + str(int(max_len)) + " + 1, "
                         f"least({int(max_len)}, __z - __a - __j * {int(max_len)}))"))
            .alias("chunk_md5"),
        )
    )
    return staged.withColumn(
        "n_copies",
        F.count(F.lit(1)).over(W.partitionBy("chunk_md5")).cast("long"),
    )


def _ac_automaton(patterns: list[str]):
    """Build the Aho–Corasick goto/fail/output automaton (Aho &
    Corasick 1975, "Efficient string matching: an aid to bibliographic
    search"). States are dict nodes; output lists carry pattern
    indices. Built once per worker from the broadcast pattern list —
    pattern sets are blocklist-sized (KBs), documents are not."""
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    fail = [0]
    for pi, p in enumerate(patterns):
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                fail.append(0)
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(pi)
    from collections import deque

    q = deque()
    for s in goto[0].values():
        fail[s] = 0
        q.append(s)
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
            out[s] = out[s] + out[fail[s]]
    return goto, fail, out


def blocklist_scan(
    df: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ONE-pass multi-pattern substring counting via Aho–Corasick
    (1975) — the blocklist/keyword scanner of a C4-style filtering
    pipeline: with P patterns, a regex-per-pattern scan costs P
    passes over 100 TB of text; the automaton costs one, independent
    of P. Counts EVERY occurrence (overlaps included — a match is
    recorded at each end position, the textbook semantics).

    The automaton builds per worker from the tiny broadcast pattern
    list; documents stream through mapInPandas Arrow batches and
    never shuffle. The DuckDB oracle counts matches position-by-
    position (substring equality at every start offset) — an
    independent formulation of the same semantics. Returns
    (doc_id, pattern, n_hits) for patterns with >= 1 hit."""
    import pandas as pd

    pats = list(patterns)

    def scan(batches):
        goto, fail, out = _ac_automaton(pats)
        for pdf in batches:
            ids, ps, ns = [], [], []
            for did, txt in zip(pdf["__id"], pdf["__t"]):
                counts = [0] * len(pats)
                s = 0
                for ch in str(txt):
                    while s and ch not in goto[s]:
                        s = fail[s]
                    s = goto[s].get(ch, 0)
                    for pi in out[s]:
                        counts[pi] += 1
                for pi, c in enumerate(counts):
                    if c:
                        ids.append(did)
                        ps.append(pats[pi])
                        ns.append(c)
            yield pd.DataFrame({"__id": ids, "pattern": ps, "n_hits": ns})

    staged = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__t")
    )
    id_t = staged.schema["__id"].dataType.simpleString()
    return staged.mapInPandas(
        scan, f"__id {id_t}, pattern string, n_hits long"
    ).withColumnRenamed("__id", id_col)


def heaps_fit(
    df: DataFrame,
    checkpoints: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth (Heaps 1978; Herdan 1960):
    V(n) ≈ K·n^β — distinct vocabulary grows as a power of corpus
    token count (β ≈ 0.4–0.6 for natural language; template spam shows
    up as a flat curve, id-like noise as β → 1). The growth-law
    sibling of zipf_fit's rank-frequency audit.

    Scale shape: document arrival rank is a BANDED global rank (no
    single-task sort), each word's FIRST-occurrence rank is one
    min-aggregate over the exploded tokens, and every checkpoint is a
    conditional aggregate — V(r) = words first seen within the first r
    docs, n(r) = tokens in those docs — so the whole curve costs two
    passes regardless of checkpoint count. OLS of ln V on ln n runs
    over the bounded checkpoint list with FIXED left-to-right adds
    (both engines sum identical operands in identical order; ln is
    libm, so the emitted slope/intercept round to 6 — the zipf_fit
    discipline). Returns one row: (n_points, n_last, v_last, slope,
    intercept).

    ``ngram`` sets the vocabulary UNIT (default 1 = words): a corpus
    with a small closed word list (synthetic/template text) saturates
    instantly — word n-grams restore a growing vocabulary, and the
    law is stated for any unit. n(r) counts the unit occurrences."""
    from flink_essentials_spark.functions.timeseries import banded_rank
    from flink_essentials_spark.operators.transform import tokenize

    cps = [int(r) for r in checkpoints]
    n = int(ngram)
    words = tokenize(F.col(text_col))
    if n == 1:
        units = words
    else:
        units = F.expr(
            f"CASE WHEN size(__ws) >= {n} THEN "
            f"transform(sequence(1, size(__ws) - {n - 1}), "
            f"i -> array_join(slice(__ws, i, {n}), ' ')) "
            f"ELSE array() END"
        )
    staged = (
        df.select(id_col, words.alias("__ws"))
        if n > 1
        else df.select(id_col, F.col(text_col))
    )
    # the tokenize(+n-gram) projection feeds the size table AND the
    # exploded token join — and banded_rank reads ITS input ~3x
    # (bounds, band totals, final window): uncheckpointed, the
    # tokenizer ran 4-5x (measured 10.8 s -> 1.9 s at sf0.1).
    # Materialize the token arrays once, and the tiny (id, ntok)
    # table once more so the banded rank never re-derives it.
    docs = staged.select(id_col, units.alias("__toks")).localCheckpoint()
    sized = docs.select(
        id_col, F.size("__toks").alias("__ntok")
    ).localCheckpoint()
    ranked = banded_rank(
        sized,
        [],
        id_col,
        [],
        rank_col="__rk",
        # sized is one row per document — the caller's footer hint
        n_rows_hint=n_rows_hint,
    ).localCheckpoint()  # feeds the token join AND the checkpoint aggs
    toks = docs.select(id_col, F.explode("__toks").alias("__w")).join(
        ranked.select(id_col, "__rk"), id_col
    )
    first = toks.groupBy("__w").agg(F.min("__rk").alias("__first"))
    v_aggs = first.agg(
        *[
            F.count_if(F.col("__first") <= r).alias(f"v{r}")
            for r in cps
        ]
    )
    n_aggs = ranked.agg(
        *[
            F.sum(F.when(F.col("__rk") <= r, F.col("__ntok")).otherwise(0))
            .alias(f"n{r}")
            for r in cps
        ]
    )
    one = v_aggs.crossJoin(F.broadcast(n_aggs))
    lnn = [F.log(F.col(f"n{r}").cast("double")) for r in cps]
    lnv = [F.log(F.col(f"v{r}").cast("double")) for r in cps]

    def chain(terms):
        s = terms[0]
        for t in terms[1:]:
            s = s + t
        return s

    m = float(len(cps))
    sx = chain(lnn)
    sy = chain(lnv)
    sxy = chain([a * b for a, b in zip(lnn, lnv)])
    sxx = chain([a * a for a in lnn])
    slope_raw = (F.lit(m) * sxy - sx * sy) / (F.lit(m) * sxx - sx * sx)
    return one.select(
        F.lit(len(cps)).cast("long").alias("n_points"),
        F.col(f"n{cps[-1]}").alias("n_last"),
        F.col(f"v{cps[-1]}").alias("v_last"),
        F.round(slope_raw, 6).alias("slope"),
        F.round((sy - slope_raw * sx) / F.lit(m), 6).alias("intercept"),
    )


def _lcs_batch(seqs_a: list, seqs_b: list) -> list:
    """Token-level LCS length for a batch of sequence pairs, DP
    vectorized ACROSS THE PAIR AXIS (the _dl_batch discipline —
    per-pair python DP is ~50× slower at eval-pair volumes): tokens
    are dictionary-encoded per batch (LCS only consults equality
    WITHIN a pair, so a batch-local vocabulary is layout-independent),
    sequences sentinel-padded with -1/-2 so pads never match, and the
    classic row DP runs i×j python loops over numpy P-vectors.
    Padded tail cells only propagate the running max, so the final
    [m] column is the exact LCS at every true length."""
    import numpy as np

    p = len(seqs_a)
    if p == 0:
        return []
    vocab: dict = {}

    def enc(t):
        return vocab.setdefault(t, len(vocab))

    n = max(len(s) for s in seqs_a)
    m = max(len(s) for s in seqs_b)
    ca = np.full((p, max(n, 1)), -1, dtype=np.int64)
    cb = np.full((p, max(m, 1)), -2, dtype=np.int64)
    for i, s in enumerate(seqs_a):
        for j, t in enumerate(s):
            ca[i, j] = enc(t)
    for i, s in enumerate(seqs_b):
        for j, t in enumerate(s):
            cb[i, j] = enc(t)
    prev = np.zeros((p, m + 1), dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.zeros((p, m + 1), dtype=np.int64)
        ai = ca[:, i - 1]
        for j in range(1, m + 1):
            eq = ai == cb[:, j - 1]
            np.maximum(prev[:, j], cur[:, j - 1], out=cur[:, j])
            np.maximum(cur[:, j], prev[:, j - 1] + eq, out=cur[:, j])
        prev = cur
    return prev[:, m].tolist()


def lcs_scores_batch(
    pairs: DataFrame, a_col: str, b_col: str, out_col: str = "lcs"
) -> DataFrame:
    """Longest-common-subsequence length between two token-array
    columns of PRE-PAIRED rows (the dl_scores_batch shape: pair
    volume is bounded upstream — here by the successor-pair mapping —
    so the Arrow comparator cost rides the pair table's partitioning
    with no extra shuffle). Rows are split by (next-pow2 |a|,
    next-pow2 |b|) length buckets so one long outlier doesn't inflate
    every short pair's P·n·m DP tensor. Appends ``out_col`` BIGINT;
    output depends only on pair values (layout-independent)."""

    def score(batches):
        for pdf in batches:
            pdf = pdf.copy()
            seq_a = [list(v) for v in pdf[a_col]]
            seq_b = [list(v) for v in pdf[b_col]]
            out = [0] * len(seq_a)
            buckets: dict = {}
            for i, (x, y) in enumerate(zip(seq_a, seq_b)):
                key = (
                    max(1, len(x) - 1).bit_length(),
                    max(1, len(y) - 1).bit_length(),
                )
                buckets.setdefault(key, []).append(i)
            for idxs in buckets.values():
                vals = _lcs_batch(
                    [seq_a[i] for i in idxs], [seq_b[i] for i in idxs]
                )
                for i, v in zip(idxs, vals):
                    out[i] = v
            pdf[out_col] = out
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema.fields
    )
    return pairs.mapInPandas(score, schema + f", {out_col} bigint")


def bleu2_scores(pairs: DataFrame, grams: DataFrame) -> DataFrame:
    """BLEU-2 readout (Papineni et al. 2002) from a per-doc gram-count
    table — the SHARED readout the one-shot query (q_bleu_pairs) and
    its streaming-maintained twin both drive (the ks_drift /
    welch_t_from_stats maintained-monitor contract): the sufficient
    state is exactly ``grams`` (doc_id, o ∈ {1,2}, g, c) — SUM-
    mergeable cells refresh_rollup can maintain per micro-batch — and
    ``pairs`` (doc_id, ref_id, c_len, r_len) with c_len ≥ 2. Clipped
    matches come from one (ref, gram)-keyed LEFT join per order; the
    totals t₁ = c_len, t₂ = c_len − 1 are length identities. Brevity
    penalty and the geometric mean evaluate exp/ln over correctly-
    rounded exact-integer ratios; bleu is rounded to 6 (the JVM-vs-
    libm last-ulp convention) while the exact BIGINT cells carry the
    full-precision signal."""

    def clipped(o: int, mname: str):
        cnt = grams.filter(F.col("o") == o).select("doc_id", "g", "c")
        cg = pairs.select("doc_id", "ref_id").join(cnt, "doc_id")
        rg = cnt.select(
            F.col("doc_id").alias("ref_id"), "g", F.col("c").alias("rc")
        )
        return (
            cg.join(rg, ["ref_id", "g"], "left")
            .groupBy("doc_id")
            .agg(
                F.sum(
                    F.least(F.col("c"), F.coalesce(F.col("rc"), F.lit(0)))
                ).alias(mname)
            )
        )

    j = (
        pairs.join(clipped(1, "m1"), "doc_id")
        .join(clipped(2, "m2"), "doc_id")
        .withColumn("t1", F.col("c_len"))
        .withColumn("t2", F.col("c_len") - 1)
    )
    cl, rl = F.col("c_len").cast("double"), F.col("r_len").cast("double")
    bp = F.when(F.col("c_len") >= F.col("r_len"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - rl / cl)
    )
    lp = F.log(
        F.col("m1").cast("double") / F.col("t1").cast("double")
    ) + F.log(F.col("m2").cast("double") / F.col("t2").cast("double"))
    bleu = F.when(
        (F.col("m1") == 0) | (F.col("m2") == 0), F.lit(0.0)
    ).otherwise(bp * F.exp(F.lit(0.5) * lp))
    return j.select(
        "doc_id", "ref_id", "c_len", "r_len", "m1", "t1", "m2", "t2",
        F.round(bleu, 6).alias("bleu"),
    )
