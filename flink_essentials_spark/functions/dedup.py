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

from pyspark.sql import Column, DataFrame, Window
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
    """Distinct word n-gram shingles as strings. Documents with fewer
    than ``n`` tokens yield an EMPTY set (matching the oracles' CASE
    guard) — the old sequence(0, -1) form fed slice a 0 start and blew
    up on any sub-n-token document."""
    toks = tokenize(text)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
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
    """Near-duplicate pairs by EXACT n-gram Jaccard ≥ threshold, via a
    prefix-filtered set-similarity join (PPJoin family — Xiao et al.,
    "Efficient similarity joins for near duplicate detection", WWW 2008).

    J(A,B) ≥ t requires overlap ≥ t·max(|A|,|B|), so under any global
    total order on shingles a qualifying pair must share one of each
    doc's first ``|S| − ⌈t·|S|⌉ + 1`` shingles. Join only those
    prefixes (candidate volume ≈ true pairs, not Σ hot-shingle C(df,2)),
    then verify candidates with an exact array intersection. Output is
    IDENTICAL to the naive full shingle self-join — the DuckDB oracle
    is the naive form and hash-matches. The global order is word_hash
    (frequency-agnostic; md5-collision odds at 250k shingles ~1e-8,
    and a collision could only ADD a candidate, never drop a pair).
    """
    sets_df = shingle_sets(df, n, text_col, id_col).cache()
    ordered = sets_df.select(
        "doc_id",
        F.array_sort(F.transform("sh", word_hash)).alias("hs"),
        F.size("sh").alias("n_sh"),
    )
    p_len = (
        F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold)) + 1
    ).cast("int")
    prefix = ordered.select(
        "doc_id", F.explode(F.slice("hs", F.lit(1), p_len)).alias("hsh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.hsh") == F.col("b.hsh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sets_df.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets_df.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        joined.select("doc_a", "doc_b", inter.alias("n_common"), jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def shingle_sets(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sh: array<string>) — the shared upstream of every
    shingle-based dedup op. Cache/persist the result when feeding more
    than one consumer (signatures + verify join)."""
    return df.select(
        F.col(id_col).alias("doc_id"), _shingles(F.col(text_col), n).alias("sh")
    )


def minhash_signatures(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature (Broder, "On the resemblance and
    containment of documents", 1997): for each seed i,
    min over shingles of (A_i * word_hash(shingle) + B_i) mod P.

    ``shingles_df`` (from :func:`shingle_sets`, possibly cached) lets a
    pipeline reuse one shingle computation across consumers.
    """
    seeds = MINHASH_SEEDS[:num_hashes]
    # explode → hash each distinct shingle ONCE → all minima in one
    # groupBy pass. The all-array-expression form re-evaluates the
    # tokenize→shingle→md5 chain per seed (Catalyst doesn't CSE inside
    # nested higher-order functions) and falls out of codegen; this
    # shape is also the scalable one (shuffle on doc_id, partial mins
    # map-side).
    sets_df = (
        shingles_df
        if shingles_df is not None
        else shingle_sets(df, n, text_col, id_col)
    )
    exploded = sets_df.select(
        "doc_id", F.explode(F.col("sh")).alias("shingle")
    ).select("doc_id", (word_hash(F.col("shingle")) % MINHASH_P).alias("h"))
    mins = exploded.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * A + B) % MINHASH_P).alias(f"mh{i}")
            for i, (A, B) in enumerate(seeds)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[f"mh{i}" for i in range(len(seeds))]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: band the signature (bands × rows), join docs
    whose band signature collides, dedup pairs. At scale each band join
    is an equi-join on a compact key — linear-ish in candidates."""
    sigs = minhash_signatures(
        df, n, num_hashes, text_col, id_col, shingles_df=shingles_df
    )
    # cached: both self-join legs; see ngram_jaccard_pairs
    banded = _banded(sigs, num_hashes, bands).cache()
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


def lsh_near_dup_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The production near-dup pipeline: LSH candidate generation, then
    exact Jaccard verification ON CANDIDATES ONLY.

    This is the 100 TB path — candidate count is driven by true
    near-dups (plus band false-positives), not by hot shingles, so the
    verify step joins a tiny pair list back to per-doc shingle sets and
    computes |A∩B| with array intersection. Recall < 1 by LSH
    construction (pairs missed by every band are not found); tests
    quantify it against ngram_jaccard_pairs.
    """
    # one shingle computation feeds BOTH the signature path and the
    # verify join — cached because three downstream legs consume it
    sets_df = shingle_sets(df, n, text_col, id_col).cache()
    cands = minhash_lsh_pairs(
        df, n, num_hashes, bands, text_col, id_col, shingles_df=sets_df
    )
    a = sets_df.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    b = sets_df.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    joined = cands.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        joined.select(
            "doc_a", "doc_b", inter.alias("n_common"), jac.alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc SimHash (Charikar, "Similarity estimation techniques
    from rounding algorithms", STOC 2002): bit b of the fingerprint is
    the majority vote of bit b across token hashes."""
    # explode → hash once per distinct token → 32 conditional-sum votes
    # in ONE groupBy pass (same rationale as minhash_signatures: the
    # per-bit array-fold form recomputes the hash chain per bit).
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("w"),
    ).select("doc_id", word_hash(F.col("w")).alias("h"))
    # bit-exploded form: one row per (doc, token, bit), then two tiny
    # aggregations. A single wide aggregate with `bits` vote columns is
    # algebraically identical but its generated code is enormous —
    # several SECONDS of janino compilation per plan; this shape keeps
    # whole-stage codegen small and constant in `bits`, trading it for
    # rows (cheap: narrow ints, map-side partial aggs).
    per_bit = (
        exploded.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
            F.col("h"),
        )
        .groupBy("doc_id", "b")
        .agg(
            # python wrappers require a literal shift amount; the SQL
            # functions take expressions
            F.sum(F.expr("shiftright(h, b) & 1")).alias("ones"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # majority vote (>0 in ±1 terms) ⟺ 2*ones > n; bit contributes 2^b
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("ones") * 2 > F.col("n"),
                F.expr("shiftleft(CAST(1 AS BIGINT), b)"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
        ).alias("simhash")
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
    # cache: both self-join legs — without this the tokenize→hash→
    # 32-vote groupBy chain runs twice (see ngram_jaccard_pairs)
    fps = simhash(df, bits, text_col, id_col).cache()
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


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination scan: (bench_id, doc_id, n_shared) for
    every corpus doc sharing at least one word n-gram with a benchmark
    doc (self-pairs excluded) — the pre-training hygiene check against
    eval leakage.

    Plan shape: both sides shingle-explode (narrow), one equi-join on
    the shingle keyed by a hash shuffle, then a grouped count. The
    benchmark side is tiny in practice — Spark broadcasts it and the
    corpus side never shuffles. At 100 TB substitute
    ``F.xxhash64(shingle)`` as the join key to shrink the exchange
    (string keys kept here for exact cross-engine oracle parity).
    """
    c = shingle_table(corpus, n, text_col, id_col).select("doc_id", "shingle")
    b = shingle_table(benchmark, n, text_col, id_col).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    return (
        b.join(c, "shingle")
        .filter(F.col("bench_id") != F.col("doc_id"))
        .groupBy("bench_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def source_overlap(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    gs_df: DataFrame | None = None,
) -> DataFrame:
    """Cross-source shingle-overlap matrix — the corpus-internal twin of
    ngram_contamination: for every pair of sources, how many distinct
    word n-grams they share and the exact Jaccard of their shingle
    sets. The audit that catches one web crawl re-ingesting another
    before both are weighted into a training mixture.

    Plan shape: shingles collapse to DISTINCT (group, shingle) pairs,
    then ONE groupBy(shingle) gathers each shingle's source set and
    explodes its in-set pairs — no self-join re-shuffle; a shingle
    appearing in a million docs contributes one row per source and at
    most (#sources choose 2) pair rows. Cost is Σ_shingle
    (#sources containing it)², independent of corpus size; per-source
    set sizes broadcast back onto the pair counts. Jaccard = shared /
    (n_a + n_b - shared) divides two exact integers once —
    bit-identical in any engine. (Measured ~30% faster than the
    equivalent shingle self-join at sf0.1; md5-hashing the shingle key
    costs more than the shuffle bytes it saves at this scale.)"""
    # the exploded-distinct pair table feeds TWO consumers (sizes and
    # the per-shingle source sets) — uncheckpointed, the shingle
    # explode + distinct shuffle ran twice (the heaps_fit lesson).
    # ``gs_df`` lets a caller that ALREADY has the distinct
    # (group, shingle) table (e.g. hll_set_ops, which also feeds the
    # same rows to the register builder) pass it in, so the corpus is
    # shingled once per query instead of once per consumer (guide
    # §2.4: two operations keyed the same way share one pass).
    gs = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
        .localCheckpoint()
        if gs_df is None
        else gs_df
    )
    sizes = gs.groupBy("g").agg(F.count(F.lit(1)).alias("n_sh"))
    by_shingle = gs.groupBy("shingle").agg(F.collect_set("g").alias("gset"))
    shared = (
        by_shingle.select(F.explode("gset").alias("source_a"), "gset")
        .select("source_a", F.explode("gset").alias("source_b"))
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.select(F.col("g").alias("source_a"), F.col("n_sh").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("g").alias("source_b"), F.col("n_sh").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


def fuzzy_match_blocked(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_name: str,
    right_id: str,
    right_name: str,
    block,
    max_distance: int = 1,
) -> DataFrame:
    """Blocked Levenshtein record linkage — the entity-resolution join
    (dirty crawl metadata → canonical records) a training-data pipeline
    runs before joining provenance tables.

    ``block`` is a Column→Column blocking function applied to each
    side's name; candidate pairs come from an EQUI-join on the block
    key, so cost is Σ_block |L_b|·|R_b| instead of |L|·|R| — the
    standard ER blocking bound. Distance uses Spark's bounded
    ``levenshtein(l, r, threshold)`` (banded DP, O(len·k) per pair,
    returns -1 past the bound) so mismatched candidates exit early;
    the plan stays one shuffle (hash join on the block key) + a
    scan-stage filter, no Python.
    """
    lt = left.select(
        F.col(left_id).alias(left_id if left_id != right_id else "left_id"),
        F.col(left_name).alias("__ln"),
        block(F.col(left_name)).alias("__blk"),
    )
    rt = right.select(
        F.col(right_id).alias(right_id if left_id != right_id else "right_id"),
        F.col(right_name).alias("__rn"),
        block(F.col(right_name)).alias("__blk"),
    )
    dist = F.levenshtein("__ln", "__rn", max_distance)
    return (
        lt.join(rt, "__blk")
        .withColumn("distance", dist)
        .filter(F.col("distance") >= 0)
        .drop("__blk", "__ln", "__rn")
    )


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric shingle containment — quote / subset-duplication
    detection: ``containment(a in b) = |sh(a) ∩ sh(b)| / |sh(a)|``,
    emitted for ordered pairs at or above ``threshold``. Jaccard misses
    a short document embedded verbatim in a long one (the union term
    swamps it); containment is the signal dedup pipelines use for
    quotation and boilerplate-inclusion cuts.

    Plan shape: one shingle equi-join (the same Σ docs-per-shingle²
    candidate bound as the Jaccard path), grouped shared-count carrying
    |sh(a)| on the key, one exact integer division — no Python, no
    second scan.
    """
    sh = shingle_table(df, n, text_col, id_col)
    a = sh.select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("n_sh").alias("n_a")
    )
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return shared.select(
        "doc_a",
        "doc_b",
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("n_a")).alias("containment"),
    ).filter(F.col("containment") >= threshold)


def char_window_dups(
    df: DataFrame,
    window: int = 40,
    stride: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication map — the memorization-removal /
    boilerplate signal: per document, how many of its fixed-length
    character windows also appear verbatim in ANOTHER document.

    Windows are strided (stride ``s``, not every offset) and aligned
    from the END of the text, so shared suffixes (the common real-world
    case: boilerplate, licenses, signatures appended to documents)
    coincide exactly across documents of different lengths. Strided
    windows are the linear-cost stand-in for the literature's
    suffix-array pass (every offset, s=1): a shared span ≥ window+s is
    guaranteed to produce at least one matching window pair under any
    alignment only at s=1 — at larger strides mid-text duplicates can
    be missed, which is the documented cost/recall trade.

    Plan: one scan-stage explode of ≤len/s windows per doc, md5-prefix
    int64 window keys (8-byte shuffle), one groupBy(window) doc-count,
    broadcast-free join back on the window key, one groupBy(doc).
    """
    L = F.length(F.col(text_col))
    n_win = F.when(
        L >= window, F.floor((L - window) / stride).cast("int") + 1
    ).otherwise(F.lit(0))
    idx = F.sequence(F.lit(0), n_win - 1)
    pos = L - window - F.col("i") * stride + 1
    win = F.expr(f"substring({text_col}, __p, {window})")
    wins = (
        df.select(F.col(id_col).alias("doc_id"), text_col, F.explode(idx).alias("i"))
        .withColumn("__p", pos)
        .select(
            "doc_id",
            F.conv(
                F.substring(F.md5(F.encode(win, "utf-8")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("whash"),
        )
        .distinct()
    )
    by_win = wins.groupBy("whash").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        wins.join(by_win, "whash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("n_docs") > 1).cast("long")).alias("n_dup_windows"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        (F.col("n_dup_windows").cast("double") / F.col("n_windows")).alias(
            "dup_ratio"
        ),
    )


def duplicate_spans(
    df: DataFrame,
    window: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicate-substring SPANS at stride 1 — the suffix-array
    member of the family (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): a position p in doc d is
    duplicated iff the length-``window`` substring starting at p
    appears verbatim in ANOTHER document, and overlapping/adjacent
    duplicated positions merge into maximal spans. Any cross-document
    match of length >= ``window`` contains a shared window at SOME
    stride-1 offset under every alignment — the guarantee
    :func:`char_window_dups`'s strided form trades away — so the spans
    are exactly the characters participating in such a match, which is
    what the paper's suffix array computes.

    Plan (no suffix array materialization, no string shuffle): the
    scan stage explodes one (pos, xxhash64(window)) pair per offset —
    16-byte rows, the text itself never leaves the scan; one
    groupBy(hash) finds hashes seen in >= 2 distinct docs; the
    surviving positions join back (8-byte key) and merge per doc via
    gaps-and-islands over a KEYED window (no global sort). Window
    equality is 64-bit-hash equality, the same contract as
    char_window_dups / source_overlap (collision odds ~ n²/2⁶⁴; the
    DuckDB oracle groups by the window STRING, so the gate itself
    cross-checks the hash grouping). Returns one row per maximal span:
    (doc_id, span_start, span_end, span_len, n_windows), 1-based
    inclusive character positions.
    """
    wins = _stride1_windows(df, window, text_col, id_col)
    shared = (
        wins.groupBy("whash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("whash")
    )
    # no distinct needed: wins is unique per (doc, pos) by construction
    # and shared is unique per hash — the join cannot duplicate
    dup_pos = wins.join(shared, "whash").select("doc_id", "pos")
    return _merge_spans(dup_pos, window)


def _stride1_windows(
    df: DataFrame, window: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, pos, whash) for every stride-1 window — the scan-stage
    explode both the batch and incremental span ops share; the text
    itself never leaves the scan."""
    L = F.length(F.col(text_col))
    idx = F.when(
        L >= window,
        F.sequence(F.lit(1), (L - window + 1).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__t"),
            F.explode(idx).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.xxhash64(F.expr(f"substring(__t, pos, {window})")).alias(
                "whash"
            ),
        )
    )


def _merge_spans(dup_pos: DataFrame, window: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated positions into maximal
    spans, per doc over a KEYED window (no global sort)."""
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    # merge [p, p+window) intervals: a new island starts when the gap
    # to the previous duplicated position exceeds the window length
    # (first row: NULL condition -> otherwise -> 1, both engines)
    brk = F.when(
        F.col("pos") - F.lag("pos").over(by_doc) <= window, F.lit(0)
    ).otherwise(F.lit(1))
    islands = dup_pos.withColumn("__brk", brk).withColumn(
        "__isl", F.sum("__brk").over(by_doc)
    )
    return (
        islands.groupBy("doc_id", "__isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(window - 1)).cast("long").alias("span_end"),
            (F.max("pos") + F.lit(window) - F.min("pos"))
            .cast("long")
            .alias("span_len"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "span_len", "n_windows")
    )


def incremental_duplicate_spans(
    new_docs: DataFrame,
    store_base: str,
    window: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    epoch_id: int | None = None,
    screen: bool = True,
) -> DataFrame | None:
    """INGEST-TIME exact substring decontamination — the incremental
    member of :func:`duplicate_spans` (the same shape
    :func:`lsh_incremental_pairs` gives LSH dedup): documents arrive
    in batches; each batch's duplicate spans are computed against the
    ACCUMULATED corpus plus the batch itself, at O(batch · matches)
    cost — prior text is never re-scanned, only its narrow
    (doc_id, whash) window-hash store is joined.

    CONTRACT (pinned by the e2e test): the spans returned for batch i
    equal ``duplicate_spans(all docs ingested through batch i)``
    restricted to batch i's docs. Earlier docs' spans against
    later-arriving text are by construction not re-emitted — the
    ingest-quarantine semantic (screen what ARRIVES), not a
    retroactive audit (run the batch op for that).

    EXACTLY-ONCE REPLAY: same per-epoch OVERWRITE protocol as the LSH
    store — pass foreachBatch's ``epoch_id`` and a replayed batch
    rewrites its own ``epoch=<id>`` directory while prior-state reads
    exclude it (replay-idempotence pinned).

    ``screen=False`` is the STORE-BUILD fast path (optimization guide
    §1.2: don't compute things you throw away): it ingests the batch's
    window hashes into the store and returns ``None``, skipping the
    span computation entirely — the shared-hash aggregate over the
    accumulated store, the position join and the gaps-and-islands
    window. A caller replaying historical batches only to seed the
    store (the decontamination bench shape) pays one explode + one
    distinct + one write per batch instead of the full screen. Store
    contents are byte-identical either way (pinned by test).
    """
    import os

    spark = new_docs.sparkSession
    wh_path = os.path.join(store_base, "window_hashes")

    wins_new = _stride1_windows(new_docs, window, text_col, id_col)
    # the persisted store needs only DISTINCT (doc, hash) membership —
    # positions stay batch-local
    store_new = wins_new.select("doc_id", "whash").distinct()
    if not screen:
        # build-only ingest: no second consumer, so no cache either
        if epoch_id is None:
            store_new.write.mode("append").parquet(wh_path)
        else:
            store_new.write.mode("overwrite").parquet(
                os.path.join(wh_path, f"epoch={int(epoch_id)}")
            )
        return None
    store_new = store_new.cache()

    prior = None
    if os.path.isdir(wh_path):
        parts = [
            os.path.join(wh_path, f)
            for f in sorted(os.listdir(wh_path))
            if f.endswith(".parquet")
        ]
        for d in sorted(os.listdir(wh_path)):
            full = os.path.join(wh_path, d)
            if not (d.startswith("epoch=") and os.path.isdir(full)):
                continue
            if epoch_id is not None and d == f"epoch={int(epoch_id)}":
                continue
            parts.append(full)
        if parts:
            prior = spark.read.schema("doc_id long, whash long").parquet(
                *parts
            )
    all_members = (
        store_new if prior is None else prior.unionByName(store_new)
    )
    shared = (
        all_members.groupBy("whash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("whash")
    )
    dup_pos = wins_new.join(shared, "whash").select("doc_id", "pos")
    spans = _merge_spans(dup_pos, window).localCheckpoint()
    if epoch_id is None:
        store_new.write.mode("append").parquet(wh_path)
    else:
        store_new.write.mode("overwrite").parquet(
            os.path.join(wh_path, f"epoch={int(epoch_id)}")
        )
    store_new.unpersist()
    return spans


def _banded(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Signature → (doc_id, band, band_sig) rows (the LSH bucket key)."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(
                        F.col("signature"), b * rows_per_band + 1, rows_per_band
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_sig"),
    )


def lsh_incremental_pairs(
    new_docs: DataFrame,
    store_base: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    epoch_id: int | None = None,
) -> DataFrame:
    """INCREMENTAL near-dup maintenance — the shape a 100 TB corpus
    actually runs dedup in: documents arrive in batches, and each
    batch does O(batch · collisions) work, never re-scanning the
    accumulated corpus text. The store keeps two O(corpus)-row but
    narrow tables: band signatures (bands rows × small int arrays per
    doc) and shingle sets (for exact verification); each call

      1. shingles + banded MinHash signatures for the NEW docs only,
      2. candidate pairs = new banded rows equi-joined against the
         ACCUMULATED banded rows (prior ∪ new) on (band, band_sig) —
         prior×prior pairs can never re-emit because one side is
         always new,
      3. exact-Jaccard verification of candidates against the
         accumulated shingle store, ``threshold`` filter,
      4. appends the new docs' rows to both store tables (plain
         parquet append here; swap for the versioned store / a table
         format for concurrent writers).

    Returns this batch's verified pairs, eagerly materialized BEFORE
    the state append so the verify join reads a consistent snapshot.
    The union of returned pairs across batches equals the one-shot
    :func:`lsh_near_dup_pairs` over the full corpus (pinned by the
    streaming e2e test), because a pair's later-arriving doc always
    sees the earlier doc's banded rows.

    EXACTLY-ONCE REPLAY: foreachBatch delivers at-least-once — a crash
    between the state append and the checkpoint commit REPLAYS the
    batch, and a blind append would then double every row. Pass the
    foreachBatch ``epoch_id`` and each batch's rows land in their own
    ``epoch=<id>`` directory written with OVERWRITE: a replay rewrites
    the same directory (idempotent), prior state excludes the replayed
    epoch, and the returned pairs are identical (pinned by the replay
    test)."""
    import os

    spark = new_docs.sparkSession
    sig_path = os.path.join(store_base, "band_sigs")
    sh_path = os.path.join(store_base, "shingles")

    def _dest(base: str) -> str:
        if epoch_id is None:
            return base
        return os.path.join(base, f"epoch={int(epoch_id)}")

    sets_new = shingle_sets(new_docs, n, text_col, id_col).cache()
    sigs_new = minhash_signatures(
        new_docs, n, num_hashes, text_col, id_col, shingles_df=sets_new
    )
    banded_new = _banded(sigs_new, num_hashes, bands).cache()

    def _maybe(path: str, schema: str) -> DataFrame | None:
        """Prior state = everything under ``path`` EXCEPT the current
        epoch's directory (a replayed epoch must not see its own
        earlier half-written rows). Supports flat legacy files and
        epoch= subdirectories side by side."""
        if not os.path.isdir(path):
            return None
        # legacy flat appends: list the FILES (passing the dir itself
        # would trigger partition discovery over the epoch= subdirs
        # and conflict with root-level data files)
        parts = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
        for d in sorted(os.listdir(path)):
            full = os.path.join(path, d)
            if not (d.startswith("epoch=") and os.path.isdir(full)):
                continue
            if epoch_id is not None and d == f"epoch={int(epoch_id)}":
                continue
            parts.append(full)
        if not parts:
            return None
        return spark.read.schema(schema).parquet(*parts)

    prior_banded = _maybe(sig_path, "doc_id long, band int, band_sig array<long>")
    prior_sets = _maybe(sh_path, "doc_id long, sh array<string>")
    all_banded = (
        banded_new if prior_banded is None
        else prior_banded.unionByName(banded_new)
    )
    all_sets = (
        sets_new if prior_sets is None else prior_sets.unionByName(sets_new)
    )

    a, b = banded_new.alias("a"), all_banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    sa = all_sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = all_sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    pairs = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", inter.alias("n_common"), jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .localCheckpoint()
    )
    if epoch_id is None:
        banded_new.write.mode("append").parquet(sig_path)
        sets_new.write.mode("append").parquet(sh_path)
    else:
        # per-epoch OVERWRITE: a replayed batch rewrites its own
        # directory instead of double-appending (exactly-once state)
        banded_new.write.mode("overwrite").parquet(_dest(sig_path))
        sets_new.write.mode("overwrite").parquet(_dest(sh_path))
    # release this batch's cache: pairs is already localCheckpoint()ed
    # and the state is on disk — without this, a long-running ingest
    # accumulates one cached batch per micro-batch in executor memory
    banded_new.unpersist()
    sets_new.unpersist()
    return pairs


def sw_score(
    s1: Column, s2: Column, match: int = 2, mismatch: int = -1, gap: int = -1
) -> Column:
    """Smith-Waterman LOCAL alignment score (Smith & Waterman 1981,
    "Identification of common molecular subsequences") between two
    short strings — the alignment-quality layer above
    :func:`fuzzy_match_blocked`'s edit distance: unlike Levenshtein it
    rewards the best matching REGION (shared substring with small
    edits) and ignores unrelated prefixes/suffixes, which is what
    ranks ER candidates whose names share a core but differ at the
    edges.

        H[i][j] = max(0, H[i-1][j-1] + s(a_i, b_j),
                         H[i-1][j] + gap, H[i][j-1] + gap)

    Implemented as a nested F.aggregate fold (row-by-row DP; the inner
    fold carries the left-cell dependency) — integer scores
    throughout, so the DuckDB oracle's nested list_reduce
    string-accumulator fold (the burst_detection/wordpiece pattern)
    replays it exactly. Higher-order folds run interpreted: use on
    BOUNDED strings over BLOCKED candidate pairs (names, titles,
    ids — the ER setting), never on document bodies."""
    n2 = F.length(s2)
    init = F.struct(
        F.array_repeat(F.lit(0), (n2 + 1).cast("int")).alias("row"),
        F.lit(0).alias("best"),
    )

    def outer(acc, ch):
        def inner(iacc, j):
            diag = F.element_at(acc["row"], j)
            up = F.element_at(acc["row"], j + 1)
            left = F.element_at(iacc, F.size(iacc))
            sc = F.when(
                F.substring(s2, j, F.lit(1)) == ch, F.lit(int(match))
            ).otherwise(F.lit(int(mismatch)))
            h = F.greatest(
                F.lit(0), diag + sc, up + F.lit(int(gap)),
                left + F.lit(int(gap)),
            )
            return F.concat(iacc, F.array(h))

        new_row = F.aggregate(
            F.sequence(F.lit(1), n2), F.array(F.lit(0)), inner
        )
        return F.struct(
            new_row.alias("row"),
            F.greatest(acc["best"], F.array_max(new_row)).alias("best"),
        )

    chars = F.transform(
        F.sequence(F.lit(1), F.length(s1)),
        lambda i: F.substring(s1, i, F.lit(1)),
    )
    return F.aggregate(chars, init, outer)["best"]


def sw_scores_batch(
    df: DataFrame,
    s1_col: str,
    s2_col: str,
    out_col: str = "sw",
    match: int = 2,
    mismatch: int = -1,
    gap: int = -1,
) -> DataFrame:
    """Vectorized Smith-Waterman over Arrow batches — the PRODUCTION
    path for :func:`sw_score`'s recurrence (same integers, pinned
    equal in tests): the DP loops run over the (short) string
    dimensions while numpy vectorizes across the BATCH of pairs, so
    per-pair cost is a few numpy ops instead of an interpreted
    Catalyst fold (measured at sf0.1, 15k blocked ER pairs: 102 s
    fold -> sub-second batch). Pairs arrive pre-blocked; the python
    stage only ever sees candidate pairs, never the roster
    cross-product."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            s1 = pdf[s1_col].fillna("").astype(str).to_numpy()
            s2 = pdf[s2_col].fillna("").astype(str).to_numpy()
            l1 = np.array([len(x) for x in s1])
            l2 = np.array([len(x) for x in s2])
            L1, L2 = (int(l1.max()) if len(l1) else 0), (
                int(l2.max()) if len(l2) else 0
            )
            B = len(pdf)
            a = np.zeros((B, L1), dtype=np.int32)
            b = np.zeros((B, L2), dtype=np.int32)
            for r in range(B):
                if l1[r]:
                    a[r, : l1[r]] = np.frombuffer(
                        s1[r].encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int32)
                if l2[r]:
                    b[r, : l2[r]] = np.frombuffer(
                        s2[r].encode("utf-32-le"), dtype=np.uint32
                    ).astype(np.int32)
            best = np.zeros(B, dtype=np.int64)
            prev = np.zeros((B, L2 + 1), dtype=np.int64)
            for i in range(1, L1 + 1):
                cur = np.zeros((B, L2 + 1), dtype=np.int64)
                row_ok = i <= l1
                for j in range(1, L2 + 1):
                    ok = row_ok & (j <= l2)
                    sc = np.where(a[:, i - 1] == b[:, j - 1], match, mismatch)
                    h = np.maximum(
                        0,
                        np.maximum(
                            prev[:, j - 1] + sc,
                            np.maximum(prev[:, j] + gap, cur[:, j - 1] + gap),
                        ),
                    )
                    cur[:, j] = np.where(ok, h, 0)
                np.maximum(best, cur.max(axis=1), out=best)
                prev = cur
            out = pdf.copy()
            out[out_col] = pd.Series(best, index=pdf.index)
            yield out

    return df.mapInPandas(run, out_schema)


def sorted_neighborhood(
    records: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood ER blocking (Hernández & Stolfo 1995, "The
    merge/purge problem for large databases"): sort all records by a
    fuzzy key, slide a width-``window`` window, and emit every pair
    inside it — the blocking-free candidate generator that catches
    near-dups equi-blocks split (a typo in the blocking prefix).

    Scale shape: the global rank uses the distributed range-sort +
    per-partition rank + partition-offset scheme (the
    global_count_windows pattern — no single-partition window over the
    data); pairs are then ONE equi-join on rank (each row joins to its
    ``window-1`` successors via an exploded delta), linear in n·window.
    The sort key is made total by (key, id), so ranks — and therefore
    the candidate set — are deterministic. Returns (id_a, key_a, id_b,
    key_b, rank_gap) with 1 <= rank_gap < window."""
    from pyspark.sql import Window as W

    base = records.select(
        F.col(id_col).alias("rid"), F.col(key_col).alias("k")
    )
    ranged = base.repartitionByRange(F.col("k"), F.col("rid"))
    part = ranged.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__rn",
        F.row_number().over(W.partitionBy("__pid").orderBy("k", "rid")),
    )
    offsets = (
        part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    ranked = (
        part.join(F.broadcast(offsets), "__pid")
        .select(
            "rid", "k", (F.col("__offset") + F.col("__rn")).alias("rk")
        )
        .localCheckpoint()  # both sides of the pair join read it
    )
    probes = ranked.select(
        F.col("rid").alias("id_a"),
        F.col("k").alias("key_a"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(window) - 1))
        ).alias("rank_gap"),
        F.col("rk"),
    ).select(
        "id_a", "key_a", "rank_gap", (F.col("rk") + F.col("rank_gap")).alias("rk2")
    )
    return probes.join(
        ranked.select(
            F.col("rid").alias("id_b"),
            F.col("k").alias("key_b"),
            F.col("rk").alias("rk2"),
        ),
        "rk2",
    ).select("id_a", "key_a", "id_b", "key_b", "rank_gap")


def soundex_code(col: Column) -> Column:
    """American Soundex phonetic key (Russell & Odell, US patents
    1261167/1435663, 1918/1922) — the classic phonetic BLOCKING key of
    record-linkage systems (Fellegi-Sunter implementations block on
    it): first letter + the first three consonant-class digits, equal
    for spelling variants that sound alike ("jain" == "join" == J500).

    This is the SIMPLIFIED variant in which H and W separate runs
    exactly like vowels (the standard's H/W-adjacency exception is
    dropped) — documented because both engines must agree, and they do
    by construction: the key is one translate() + six global
    digit-run collapses + zero-removal, an expression chain the DuckDB
    oracle replicates verbatim. Input must be alphabetic; scan-stage
    only, no shuffle."""
    u = F.upper(col)
    mapped = F.translate(
        u,
        "BFPVCGJKQSXZDTLMNRAEIOUYHW",
        "11112222222233455600000000",
    )
    for d in "123456":
        mapped = F.regexp_replace(mapped, d + "{2,}", d)
    tail = F.regexp_replace(F.substring(mapped, 2, 1000), "0", "")
    return F.concat(
        F.substring(u, 1, 1),
        F.substring(F.concat(tail, F.lit("000")), 1, 3),
    )


def _sql_soundex(expr: str) -> str:
    """The DuckDB replica of :func:`soundex_code` — identical chain."""
    s = f"translate(upper({expr}), 'BFPVCGJKQSXZDTLMNRAEIOUYHW', '11112222222233455600000000')"
    for d in "123456":
        s = f"regexp_replace({s}, '{d}{{2,}}', '{d}', 'g')"
    return (
        f"substring(upper({expr}), 1, 1) || "
        f"substring(regexp_replace(substring({s}, 2), '0', '', 'g') || '000', 1, 3)"
    )


def _jaro_winkler(s1: str, s2: str, p: float = 0.1, bt: float = 0.7) -> float:
    """Reference Jaro-Winkler (Jaro 1989, "Advances in record-linkage
    methodology"; Winkler 1990 prefix boost) — the record-linkage
    string comparator. Verified bit-identical to DuckDB's native
    jaro_winkler_similarity on transposition/prefix/empty vectors
    (the oracle is that INDEPENDENT implementation, not an arithmetic
    replica of this one)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3
    if j > bt:
        pl = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pl += 1
        j = j + pl * p * (1 - j)
    return j


def jw_scores_batch(
    pairs: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Jaro-Winkler similarity for PRE-BLOCKED candidate pairs, one
    python pass per Arrow batch (the sw_scores_batch shape: candidate
    volume is bounded by the upstream blocking join, so per-pair
    python cost is paid on candidates — never on the cross product).
    Appends ``jw`` (double). Use with blocked ER joins; at 100 TB the
    comparator cost rides the candidate table's existing partitioning
    with no extra shuffle."""
    import pandas as pd

    cols = pairs.columns

    def score(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["jw"] = [
                _jaro_winkler(a, b)
                for a, b in zip(pdf[a_col].astype(str), pdf[b_col].astype(str))
            ]
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema.fields
    )
    return pairs.mapInPandas(score, schema + ", jw double")


def _dl_batch(a_strs: list, b_strs: list) -> "list":
    """True (unrestricted) Damerau-Levenshtein distance for a BATCH of
    string pairs — the Lowrance & Wagner 1975 DP (Damerau 1964's
    metric: edits = insert / delete / substitute / transpose, with
    moves allowed between the transposed pair), computed over UTF-8
    BYTES (matching DuckDB's native damerau_levenshtein, the
    independent oracle). Vectorized ACROSS the pair axis: the i,j
    loops run over the padded max lengths (≤ max_len² python
    iterations) while every cell update is a numpy op over all P
    pairs — per-pair dict-based DP would be ~50× slower at ER
    candidate volumes. Padding uses sentinels 256 (left) / 257
    (right) that can never equal a real byte or each other, so padded
    rows/cols never pollute the valid region (the target cell
    d[la+1][lb+1] reads only cells and last-occurrence entries
    produced by real bytes). Memory contract: the DP tensor is
    P_chunk·(La+2)·(Lb+2)·4 bytes — the pair axis is CHUNKED so the
    tensor never exceeds ~256 MB whatever the Arrow batch size and
    string lengths (a full 10k-row batch of 256-byte strings would
    otherwise allocate ~2.7 GB per task)."""
    import numpy as np

    ab = [s.encode("utf-8") for s in a_strs]
    bb = [s.encode("utf-8") for s in b_strs]
    P = len(ab)
    if P == 0:
        return []
    la = np.fromiter((len(x) for x in ab), np.int64, P)
    lb = np.fromiter((len(x) for x in bb), np.int64, P)
    La, Lb = int(la.max()), int(lb.max())
    if La > 256 or Lb > 256:
        raise ValueError(
            f"_dl_batch: max string length {max(La, Lb)} exceeds the "
            "256-byte bound (the P×L² DP table memory contract) — "
            "truncate or block longer strings upstream"
        )
    cells = (La + 2) * (Lb + 2)
    chunk = max(1, (64 * 1024 * 1024) // cells)  # ~256 MB of int32
    if P > chunk:
        out: list = []
        for lo in range(0, P, chunk):
            out.extend(_dl_batch(a_strs[lo : lo + chunk], b_strs[lo : lo + chunk]))
        return out
    a = np.full((P, max(La, 1)), 256, np.int16)
    b = np.full((P, max(Lb, 1)), 257, np.int16)
    for p, s in enumerate(ab):
        if s:
            a[p, : len(s)] = np.frombuffer(s, np.uint8)
    for p, s in enumerate(bb):
        if s:
            b[p, : len(s)] = np.frombuffer(s, np.uint8)
    inf = La + Lb + 1
    d = np.zeros((P, La + 2, Lb + 2), np.int32)
    d[:, 0, :] = inf
    d[:, :, 0] = inf
    d[:, 1, 1:] = np.arange(Lb + 1, dtype=np.int32)[None, :]
    d[:, 1:, 1] = np.arange(La + 1, dtype=np.int32)[None, :]
    da = np.zeros((P, 258), np.int32)
    pidx = np.arange(P)
    for i in range(1, La + 1):
        db = np.zeros(P, np.int32)
        ai = a[:, i - 1]
        for j in range(1, Lb + 1):
            bj = b[:, j - 1]
            k = da[pidx, bj]
            l = db
            cost = (ai != bj).astype(np.int32)
            db = np.where(cost == 0, np.int32(j), db)
            trans = d[pidx, k, l] + (i - k - 1) + 1 + (j - l - 1)
            d[:, i + 1, j + 1] = np.minimum(
                np.minimum(d[:, i, j] + cost, trans),
                np.minimum(d[:, i + 1, j] + 1, d[:, i, j + 1] + 1),
            )
        da[pidx, ai] = i
    return d[pidx, la + 1, lb + 1].tolist()


def dl_scores_batch(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    out_col: str = "dl",
    on_overflow: str = "error",
) -> DataFrame:
    """Damerau-Levenshtein distance for PRE-BLOCKED candidate pairs
    (the jw_scores_batch shape: candidate volume is bounded by the
    upstream blocking join, so the python comparator cost is paid on
    candidates — never on a cross product; at 100 TB the scoring
    rides the candidate table's partitioning with no extra shuffle).
    Appends ``out_col`` (bigint).

    Rows are SPLIT BY LENGTH BUCKET (next power of two of the pair's
    max UTF-8 byte length) before the DP, so each _dl_batch call
    sizes its P·L² tensor from its own bucket's maxima — one 250-byte
    outlier no longer inflates every short pair's DP table in the
    batch (r11 advice). Pairs beyond the 256-byte DP contract:
    ``on_overflow="error"`` (default) raises the documented
    actionable error; ``"null"`` emits NULL for just those rows so
    one long outlier can't fail a whole scoring job — callers can
    filter/penalize nulls downstream. The batch DP is _dl_batch —
    transposition-aware true DL over UTF-8 bytes, matching DuckDB's
    native damerau_levenshtein bit-for-bit."""
    if on_overflow not in ("error", "null"):
        raise ValueError("dl_scores_batch: on_overflow must be error|null")

    def score(batches):
        for pdf in batches:
            pdf = pdf.copy()
            astr = pdf[a_col].astype(str).tolist()
            bstr = pdf[b_col].astype(str).tolist()
            out: list = [None] * len(astr)
            buckets: dict[int, list[int]] = {}
            for i, (x, y) in enumerate(zip(astr, bstr)):
                m = max(len(x.encode("utf-8")), len(y.encode("utf-8")))
                if m > 256:
                    if on_overflow == "error":
                        raise ValueError(
                            f"dl_scores_batch: pair byte length {m} "
                            "exceeds the 256-byte DP contract — pass "
                            "on_overflow='null' or truncate upstream"
                        )
                    continue  # stays NULL
                buckets.setdefault(max(1, m - 1).bit_length(), []).append(i)
            for idxs in buckets.values():
                vals = _dl_batch(
                    [astr[i] for i in idxs], [bstr[i] for i in idxs]
                )
                for i, v in zip(idxs, vals):
                    out[i] = v
            pdf[out_col] = out
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema.fields
    )
    return pairs.mapInPandas(score, schema + f", {out_col} bigint")
