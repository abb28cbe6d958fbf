"""Fluent Corpus API — the LLM-training-data pipeline surface.

The same thin-veneer philosophy as :mod:`api` (Stream): every method
returns a new ``Corpus`` wrapping a new immutable DataFrame, each
delegating to the verified functions in :mod:`functions` — so a
pipeline reads as the sequence a data engineer whiteboards:

>>> (Corpus(docs)
...     .normalize()
...     .drop_exact_dups()
...     .drop_near_dups(threshold=0.8)
...     .quality_filter(min_score=0.3)
...     .df)

Nothing here adds semantics: each step is the documented operator,
equivalence-tested against calling the functions directly, and the
whole chain stays one lazy Catalyst plan (no step materializes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_essentials_spark.functions import dedup as _dedup
from flink_essentials_spark.functions import text as _text


class Corpus:
    """Wraps a documents DataFrame (``doc_id``, ``text``, + any other
    columns, which every step preserves by joining back on id)."""

    def __init__(self, df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.df = df
        self.id_col = id_col
        self.text_col = text_col

    def _wrap(self, df: DataFrame) -> "Corpus":
        return Corpus(df, self.id_col, self.text_col)

    # --- cleaning -----------------------------------------------------

    def normalize(self, form: str = "NFC") -> "Corpus":
        """Unicode-normalize the text column (NFC by default) — the
        canonicalization that must precede any hash-based dedup."""
        norm = _text.normalize_unicode(
            self.df, self.text_col, self.id_col, form
        ).select(
            F.col("doc_id").alias(self.id_col),
            F.col("text").alias("__norm_text"),
        )
        out = (
            self.df.drop(self.text_col)
            .join(norm, self.id_col)
            .withColumnRenamed("__norm_text", self.text_col)
        )
        return self._wrap(out)

    # --- dedup --------------------------------------------------------

    def drop_exact_dups(self) -> "Corpus":
        """Keep the lowest-id copy of every byte-identical text."""
        keepers = _dedup.exact_dedup(
            self.df, text_col=self.text_col, id_col=self.id_col
        ).select(F.col("keeper_id").alias(self.id_col))
        return self._wrap(self.df.join(keepers, self.id_col))

    def drop_near_dups(
        self,
        threshold: float = 0.8,
        n: int = 3,
        num_hashes: int = 16,
        bands: int = 4,
    ) -> "Corpus":
        """LSH near-dup removal: connected near-dup clusters keep their
        lowest id (pairs → union of non-keepers dropped). Banded
        MinHash candidates + exact-Jaccard verification — the
        sub-quadratic path."""
        pairs = _dedup.lsh_near_dup_pairs(
            self.df, n=n, num_hashes=num_hashes, bands=bands,
            threshold=threshold, text_col=self.text_col, id_col=self.id_col,
        )
        # drop the larger id of each verified pair; chains collapse to
        # the smallest id transitively across repeated pairs
        losers = pairs.select(F.col("doc_b").alias(self.id_col)).distinct()
        return self._wrap(self.df.join(losers, self.id_col, "left_anti"))

    # --- filtering ----------------------------------------------------

    def quality_filter(self, min_score: float = 0.3) -> "Corpus":
        """Keep documents whose composite quality score clears the
        floor (length, lexical diversity, stopword evidence)."""
        scores = _text.quality_score(
            self.df.select(
                F.col(self.id_col).alias("doc_id"),
                F.col(self.text_col).alias("text"),
            )
        ).filter(F.col("quality_score") >= min_score).select(
            F.col("doc_id").alias(self.id_col)
        )
        return self._wrap(self.df.join(scores, self.id_col))

    def language_filter(self, langs: list[str]) -> "Corpus":
        """Keep documents whose marker-based language prediction is in
        ``langs``."""
        pred = _text.language_id(
            self.df.select(
                F.col(self.id_col).alias("doc_id"),
                F.col(self.text_col).alias("text"),
            )
        ).filter(F.col("lang_pred").isin(langs)).select(
            F.col("doc_id").alias(self.id_col)
        )
        return self._wrap(self.df.join(pred, self.id_col))

    # --- terminal helpers --------------------------------------------

    def decontaminate(
        self, benchmark: DataFrame, window: int = 40
    ) -> "Corpus":
        """Drop every document sharing a verbatim length->=window
        substring with the ``benchmark`` table (same id/text columns;
        benchmark ids must not collide with corpus ids) — the
        eval-set decontamination step, at stride-1 fidelity
        (dedup.duplicate_spans over the union; a doc is contaminated
        iff it emits a span whose match can only be the benchmark
        when the corpus side was already exact-deduped — so run
        drop_exact_dups first, or accept corpus-internal dups also
        dropping, which is usually desired)."""
        both = self.df.select(
            F.col(self.id_col), F.col(self.text_col)
        ).unionByName(
            benchmark.select(
                F.col(self.id_col), F.col(self.text_col)
            )
        )
        flagged = (
            _dedup.duplicate_spans(
                both, window=window, text_col=self.text_col,
                id_col=self.id_col,
            )
            .select(F.col("doc_id").alias(self.id_col))
            .distinct()
        )
        return self._wrap(
            self.df.join(flagged, self.id_col, "left_anti")
        )

    def budget_select(
        self,
        budgets: DataFrame,
        quality_col: str,
        tokens_col: str,
        source_col: str = "source",
    ) -> "Corpus":
        """Keep each source's best documents up to its token budget
        (sampling.token_budget_select — banded two-phase prefix sum,
        every window keyed); the bookkeeping columns are dropped, the
        surviving rows keep the input schema."""
        from flink_essentials_spark.functions import sampling

        selected = sampling.token_budget_select(
            self.df, budgets, quality_col=quality_col,
            tokens_col=tokens_col, source_col=source_col,
            id_col=self.id_col,
        )
        return self._wrap(
            selected.filter(F.col("selected"))
            .drop("budget", "cum_tokens", "selected")
        )

    def count(self) -> int:
        return self.df.count()

    def ids(self, max_rows: int = 1_000_000) -> set:
        """Collect the id set to the DRIVER — a test/debug convenience,
        NOT a pipeline stage (the one otherwise-unbounded collect in
        the package, flagged by the r12 verdict). Guarded: raises once
        the corpus exceeds ``max_rows`` ids so nobody calls it on a
        100 TB corpus by accident; pipeline code should join against
        ``self.df.select(self.id_col)`` instead."""
        rows = self.df.select(self.id_col).limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise ValueError(
                f"Corpus.ids() would collect more than {max_rows} ids to "
                "the driver; use a join against df.select(id_col) instead "
                "(or raise max_rows explicitly if you really mean it)"
            )
        return {r[0] for r in rows}

    # --- sampling / packing ------------------------------------------

    def sample(self, rate: float) -> "Corpus":
        """Deterministic id-hash sample — a pure pushed-down filter,
        stable under reruns and repartitioning."""
        from flink_essentials_spark.functions import sampling

        return self._wrap(sampling.hash_sample(self.df, rate, self.id_col))

    def stratified_sample(
        self, rates: dict, strata_col: str
    ) -> "Corpus":
        """Per-stratum deterministic sampling (mixture weighting);
        unlisted strata drop."""
        from flink_essentials_spark.functions import sampling

        return self._wrap(
            sampling.stratified_hash_sample(
                self.df, rates, strata_col, self.id_col
            )
        )

    def pack(self, seq_len: int) -> DataFrame:
        """Terminal step: GPT-style concat-and-chunk packing spans for
        the surviving documents (returns the span table, not a Corpus —
        the output schema is spans, no longer documents)."""
        return _text.pack_sequences(
            self.df, seq_len, text_col=self.text_col, id_col=self.id_col
        )

    # --- vocabulary / salience terminals -------------------------------

    def keywords(self, iterations: int = 3, damping: float = 0.85) -> DataFrame:
        """Terminal step: TextRank keyword salience over the surviving
        corpus (functions.text.textrank_keywords) — (word, rank)."""
        return _text.textrank_keywords(
            self.df, text_col=self.text_col,
            iterations=iterations, damping=damping,
        )

    def tokenize_wordpiece(
        self, min_freq: int = 1000, max_piece: int = 3
    ) -> DataFrame:
        """Terminal step: greedy WordPiece encoding of every distinct
        surviving word against the corpus-derived vocabulary —
        (word, n, pieces, n_pieces)."""
        return _text.wordpiece_encode_words(
            self.df, text_col=self.text_col,
            min_freq=min_freq, max_piece=max_piece,
        )

    def tokenize_unigram(
        self, min_freq: int = 1000, max_piece: int = 3, max_word: int = 12
    ) -> DataFrame:
        """Terminal step: unigram-LM Viterbi segmentation (globally
        optimal) over the same vocabulary —
        (word, n, cost, n_pieces, pieces)."""
        return _text.unigram_segment_words(
            self.df, text_col=self.text_col,
            min_freq=min_freq, max_piece=max_piece, max_word=max_word,
        )

    def perplexity_buckets(self, n_buckets: int = 3) -> DataFrame:
        """Terminal step: CCNet per-source quality bucketing over the
        surviving corpus — (doc_id, source, avg_log2_prob, ppl_rank,
        bucket)."""
        return _text.ccnet_buckets(
            self.df, n_buckets=n_buckets, text_col=self.text_col,
            id_col=self.id_col,
        )
