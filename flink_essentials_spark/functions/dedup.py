"""Deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the part that matters at 100 TB):

- exact: hash-groupBy on a normalization key — one shuffle, map-side
  partial aggregation, no pairwise anything.
- n-gram Jaccard: shingle → explode → self-join **on shingle** → count
  common shingles per pair → Jaccard. Cost is Σ (docs per shingle)²,
  NOT docs² — acceptable when shingles are selective (use larger n or
  MinHash below when they aren't). Hot shingles are the skew risk:
  cap them (stop-shingle filtering) or move to LSH.
- MinHash+LSH: fixed-size signature per doc (one narrow pass), band →
  bucket-join — candidate pairs only where a band collides. This is
  the linear-ish path for near-dup at 100 TB; the Jaccard join then
  verifies candidates only.
- SimHash: one 60-bit fingerprint per doc; near-dup = small Hamming
  distance; bucket by bit-bands for sub-quadratic candidate generation.

All hashing is md5-derived (functions/text.py:word_hash), so a SQL
oracle reproduces every stage bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_essentials_spark.functions.text import word_hash
from flink_essentials_spark.operators.transform import tokenize

# MinHash family: h_i(x) = (A_i * (x mod P) + B_i) mod P. P < 2^30 so
# A_i * x stays far inside int64 (no overflow under ANSI arithmetic in
# Spark OR DuckDB). Parameters are data-independent constants.
MINHASH_P = 1073741789  # largest prime < 2^30
MINHASH_SEEDS = [(2 * i + 3, 7919 * (i + 1)) for i in range(16)]  # odd A_i


def normalize_text(text: Column) -> Column:
    """Normalization key for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups: per normalized text, the keeper (min id) and
    the duplicate count. One hash shuffle; at scale, group on
    md5(norm_text) to keep shuffle keys small."""
    return (
        df.groupBy(normalize_text(F.col(text_col)).alias("norm_text"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            "keeper_id",
            "n_copies",
            F.md5(F.encode(F.col("norm_text"), "utf-8")).alias("text_md5"),
        )
    )


def _shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles as strings."""
    toks = tokenize(text)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
        )
    )


def shingle_table(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, shingle) exploded + per-doc shingle count."""
    with_sh = df.select(
        F.col(id_col).alias("doc_id"), _shingles(F.col(text_col), n).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    return with_sh.select(
        "doc_id", "n_sh", F.explode("sh").alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard ≥ threshold.

    jaccard = |A∩B| / (|A|+|B|−|A∩B|), computed from one self-join on
    shingle (common counts) + the per-doc shingle sizes.
    """
    sh = shingle_table(df, n, text_col, id_col)
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        common.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature: for each seed i,
    min over shingles of (A_i * word_hash(shingle) + B_i) mod P.

    Computed as array expressions over the shingle array — one narrow
    pass, no explode, no shuffle.
    """
    seeds = MINHASH_SEEDS[:num_hashes]
    sh = _shingles(F.col(text_col), n)
    hashed = F.transform(sh, word_hash)

    def perm(A: int, B: int):
        # closure factory: PySpark infers lambda arity from the Python
        # signature, so default-arg captures would be read as 3-ary HOFs
        return lambda h: ((h % MINHASH_P) * A + B) % MINHASH_P

    sig = F.array(
        *[
            F.array_min(F.transform(hashed, perm(A, B))).alias(f"mh{i}")
            for i, (A, B) in enumerate(seeds)
        ]
    )
    return df.select(F.col(id_col).alias("doc_id"), sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: band the signature (bands × rows), join docs
    whose band signature collides, dedup pairs. At scale each band join
    is an equi-join on a compact key — linear-ish in candidates."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, n, num_hashes, text_col, id_col)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_sig"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash(
    df: DataFrame,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc SimHash over distinct tokens: bit b of the fingerprint is
    the majority vote of bit b across token hashes. Pure array
    expressions; one narrow pass."""
    toks = F.array_distinct(tokenize(F.col(text_col)))
    hashed = F.transform(toks, word_hash)

    def vote(b: int):
        mask = 1 << b
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    bit_votes = [
        F.aggregate(hashed, F.lit(0).cast("bigint"), vote(b)) for b in range(bits)
    ]
    fp = None
    for b, vote in enumerate(bit_votes):
        term = F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return df.select(
        F.col(id_col).alias("doc_id"), fp.cast("bigint").alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    bits: int = 32,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: band the fingerprint into max_hamming+1
    chunks (pigeonhole: any pair within distance k shares ≥1 exact
    chunk), equi-join per chunk, then verify the true distance."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    fps = simhash(df, bits, text_col, id_col)
    chunks = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), c * chunk_bits)
                    .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
