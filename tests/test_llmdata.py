"""Training-data extension operators (SURVEY §2.11): dedup, similarity
search, text analysis, multimodal plumbing — property-style checks on
crafted fixtures plus the driver's sf0.001 tables."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_essentials_spark.functions import dedup, similarity, text
from flink_essentials_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),  # near dup of 0
        (3, "completely different text about spark engines"),
        (4, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
    ]


@pytest.fixture(scope="module")
def docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(spark, docs_df):
    kept = dedup.exact_dedup(docs_df).collect()
    ids = sorted(r["keeper_id"] for r in kept)
    assert ids == [0, 2, 3, 4]  # doc 1 folded into keeper 0
    copies = {r["keeper_id"]: r["n_copies"] for r in kept}
    assert copies[0] == 2 and copies[3] == 1


def test_ngram_jaccard_identical_docs_score_one(spark, docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, n=3, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.3 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_minhash_estimates_jaccard(spark, docs_df):
    """MinHash property: identical docs agree on every hash; near dups
    agree on most; unrelated docs on few."""
    sigs = {
        r["doc_id"]: r["signature"]
        for r in dedup.minhash_signatures(docs_df, n=3, num_hashes=16).collect()
    }
    agree = lambda a, b: sum(x == y for x, y in zip(sigs[a], sigs[b])) / 16
    assert agree(0, 1) == 1.0
    assert agree(0, 2) > agree(0, 3)


def test_lsh_pairs_subset_of_exact_with_perfect_precision(spark):
    """On the driver's documents table: every LSH+verify pair must also
    be an exact-Jaccard pair with the same score (precision 1.0 —
    the verify step guarantees it); recall is quantified."""
    t = load_tables(spark, SF_DIR)
    d = t["documents"]
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(d, n=3, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.lsh_near_dup_pairs(
            d, n=3, num_hashes=16, bands=4, threshold=0.5
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, jac in lsh.items():
        assert jac == exact[pair]
    recall = len(lsh) / len(exact) if exact else 1.0
    # 4 bands × 4 rows: sim 0.5 → band-hit prob 1-(1-0.5^4)^4 ≈ 0.23;
    # real dup pairs in the table are much more similar, so recall is
    # high — but it IS approximate, assert a sane floor not equality
    assert recall >= 0.6, f"LSH recall collapsed: {recall}"


def test_simhash_hamming_tracks_similarity(spark, docs_df):
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs_df).collect()}
    ham = lambda a, b: bin(fps[a] ^ fps[b]).count("1")
    assert ham(0, 1) == 0
    assert ham(0, 2) < ham(0, 3)


def test_cosine_topk_matches_numpy(spark):
    """Brute-force top-k vs a NumPy oracle on real embeddings."""
    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    queries = emb.orderBy("vec_id").limit(3)
    got = similarity.cosine_topk(emb, queries, k=5).collect()

    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["rk"], r["neighbor_id"], r["cos_sim"]))
    for qid, hits in by_query.items():
        qv = Mn[ids == qid][0]
        sims = Mn @ qv
        order = [
            int(i)
            for i in sorted(
                (i for i in range(len(ids)) if ids[i] != qid),
                key=lambda i: (-round(sims[i], 6), ids[i]),
            )[:5]
        ]
        got_ids = [nid for _, nid, _ in sorted(hits)]
        assert got_ids == [int(ids[i]) for i in order]
        for (_, nid, cs) in hits:
            np_cs = round(float(sims[ids == nid][0]), 6)
            assert math.isclose(cs, np_cs, abs_tol=1e-6)


def test_cosine_lsh_bucket_self_consistency(spark):
    """LSH variant: identical vectors share a bucket, results ⊆ brute
    force per query, scores identical where present."""
    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    queries = emb.orderBy("vec_id").limit(3)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.cosine_topk(emb, queries, k=50).collect()
    }
    approx = similarity.cosine_topk_lsh(emb, queries, k=5, num_planes=4).collect()
    assert approx, "LSH returned nothing — bucketing broken"
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["cos_sim"] == exact[key]


def test_ivf_full_probe_equals_exact(spark):
    """IVF with n_probe == n_cells is exhaustive search — must equal
    the brute-force top-k bit for bit; partial probe must be a subset
    of each query's probed-cell candidates with identical scores."""
    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    queries = emb.orderBy("vec_id").limit(3)
    exact = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    )
    full_probe = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"], r["cos_sim"])
        for r in similarity.ivf_topk(
            emb, queries, k=5, n_cells=8, n_probe=8
        ).collect()
    )
    assert full_probe == exact

    partial = similarity.ivf_topk(emb, queries, k=5, n_cells=8, n_probe=2).collect()
    assert partial
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.cosine_topk(emb, queries, k=500).collect()
    }
    for r in partial:
        assert exact_scores[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]


def test_pq_adc_identity_reconstruction_and_recall(spark):
    """Product quantization contract: (a) ADC distance computed from
    the lookup tables EQUALS ||q - reconstruct(codes)||² (algebraic
    identity — the approximation is quantization, never the scorer);
    (b) more codebook entries → lower reconstruction error;
    (c) PQ top-10 recall vs exact cosine top-10 clears a floor on the
    real embeddings table (8 subspaces × 16 codes at d=64 = 32x
    compression)."""
    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    books = similarity.pq_train(emb, m_sub=8, n_codes=16)
    codes_df = similarity.pq_encode(emb, books)
    queries = emb.orderBy("vec_id").limit(3)

    # (a) ADC == reconstructed distance, per (query, neighbor)
    got = similarity.pq_topk(codes_df, queries, books, k=5).collect()
    assert got
    codes_map = {r["neighbor_id"]: list(r["codes"]) for r in codes_df.collect()}
    qmap = {r["vec_id"]: np.asarray(list(r["embedding"])) for r in queries.collect()}
    for r in got:
        rec = similarity.pq_reconstruct(codes_map[r["neighbor_id"]], books)
        want = float(((qmap[r["query_id"]] - rec) ** 2).sum())
        assert abs(r["adc_dist"] - want) < 1e-9, r

    # (b) monotone reconstruction error in codebook size
    def recon_err(n_codes):
        b = similarity.pq_train(emb, m_sub=8, n_codes=n_codes)
        cdf = similarity.pq_encode(emb, b)
        rows = emb.join(cdf, emb["vec_id"] == cdf["neighbor_id"]).select(
            "embedding", "codes"
        ).collect()
        errs = [
            float(
                (
                    (np.asarray(list(r["embedding"]))
                     - similarity.pq_reconstruct(list(r["codes"]), b)) ** 2
                ).sum()
            )
            for r in rows[:200]
        ]
        return sum(errs) / len(errs)

    assert recon_err(32) < recon_err(4)

    # (c) recall@10 vs exact L2 over the same corpus
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }
    pq10 = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk(codes_df, queries, books, k=10).collect()
    }
    # cosine vs L2 rankings differ in principle; on this near-unit-norm
    # synthetic table they largely agree — require a reasonable overlap
    assert len(exact & pq10) / len(exact) >= 0.3, len(exact & pq10) / len(exact)


def test_ivfpq_recall_and_rank_contract(spark):
    """IVF-PQ composition (IVFADC): (a) recall@10 vs exact cosine
    clears a floor at a fine-codebook full-probe config (the residual
    quantization limit on this near-random synthetic table — real
    clustered corpora do far better); (b) ranks are contiguous 1..k
    with ADC distances nonnegative and nondecreasing in rank; (c) a
    partial probe returns only neighbors that full probe also scores
    identically (the probed-cell candidates score independently of
    how many other cells were probed)."""
    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    queries = emb.orderBy("vec_id").limit(5)
    exact = {}
    for r in similarity.cosine_topk(emb, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    full = similarity.ivfpq_topk(
        emb, queries, k=10, n_cells=8, n_probe=8, m_sub=32, n_codes=64
    ).collect()
    got = {}
    for r in full:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls

    per_q = {}
    for r in full:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        dists = [r["adc_dist"] for r in rows]
        assert all(d >= 0 for d in dists)
        assert dists == sorted(dists)

    # (c) same index seeds -> a partial probe's (query, neighbor) ADC
    # must equal the full probe's score for that same pair
    full_scores = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in similarity.ivfpq_topk(
            emb, queries, k=500, n_cells=8, n_probe=8, m_sub=32, n_codes=64
        ).collect()
    }
    partial = similarity.ivfpq_topk(
        emb, queries, k=10, n_cells=8, n_probe=2, m_sub=32, n_codes=64
    ).collect()
    assert partial
    for r in partial:
        assert full_scores[(r["query_id"], r["neighbor_id"])] == r["adc_dist"]


def test_ivfpq_refined_rerank_improves_recall(spark):
    """Exact re-ranking contract (Jégou §5.3): refined results carry
    TRUE cosine scores (cross-checked against cosine_topk's scoring of
    the same pairs), and recall@10 vs exact ground truth is at least
    the plain-ADC recall at identical index parameters — touching only
    rerank×k raw vectors per query."""
    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    queries = emb.orderBy("vec_id").limit(5)
    exact_top = {}
    exact_scores = {}
    for r in similarity.cosine_topk(emb, queries, k=500).collect():
        exact_scores[(r["query_id"], r["neighbor_id"])] = r["cos_sim"]
    for r in similarity.cosine_topk(emb, queries, k=10).collect():
        exact_top.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    kw = dict(n_cells=8, n_probe=4, m_sub=8, n_codes=16)
    adc = {}
    for r in similarity.ivfpq_topk(emb, queries, k=10, **kw).collect():
        adc.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    refined_rows = similarity.ivfpq_topk_refined(
        emb, queries, k=10, rerank=4, **kw
    ).collect()
    refined = {}
    for r in refined_rows:
        refined.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        # refined scores are the TRUE cosines
        assert r["cos_sim"] == exact_scores[(r["query_id"], r["neighbor_id"])]

    def recall(got):
        return sum(
            len(exact_top[q] & got.get(q, set())) / len(exact_top[q])
            for q in exact_top
        ) / len(exact_top)

    assert recall(refined) >= recall(adc), (recall(refined), recall(adc))


def test_ivfpq_residual_payload_bounded():
    """The search payload shipped to executors is the RESIDUAL dict
    (d doubles per probe), not per-query ADC LUTs: its pickled size
    must scale with n_queries × n_probe × d and stay independent of
    the PQ codebook size m_sub × n_codes — a 100k-query batch at the
    8×256 production codebook would otherwise ship ~13 GB of LUTs
    (r7 verdict #3). Worker-side LUT build correctness rides on the
    oracle rows (ivfpq_topk / ivfpq_refined, unchanged)."""
    import pickle

    import numpy as np

    rng = np.random.default_rng(7)
    d, n_q, n_probe = 64, 512, 4
    centers = rng.standard_normal((16, d))
    q_rows = [(i, rng.standard_normal(d).tolist()) for i in range(n_q)]
    residuals, probe_rows = similarity._probe_residuals(
        q_rows, centers, n_probe
    )
    assert len(probe_rows) == n_q * n_probe
    assert all(v.shape == (d,) for v in residuals.values())
    payload = len(pickle.dumps(residuals))
    # d doubles + key/dict overhead per probe; the 8x256 LUT would be
    # 2048 doubles per probe (~32x) — pin the residual-sized bound
    assert payload < n_q * n_probe * (8 * d + 200), payload
    # each residual must reconstruct the query against its probed cell
    for (qid, cell), r in list(residuals.items())[:16]:
        np.testing.assert_allclose(
            r + centers[cell], np.asarray(q_rows[qid][1]), atol=1e-12
        )


def test_ivf_training_runs_no_count_job(spark, monkeypatch):
    """At 100 TB a ``count()`` before k-means is a full corpus scan;
    training must size its sample from parquet footers of the corpus'
    own input files (driver-side metadata, no Spark job). Pinned by
    making every count() raise for the duration of the call — the
    partial-probe path (which actually trains) must still succeed."""
    from pyspark.sql import DataFrame

    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    queries = emb.orderBy("vec_id").limit(3).collect()
    qdf = spark.createDataFrame(queries, emb.schema)

    def _no_count(self):
        raise AssertionError("count() job in the IVF training path")

    monkeypatch.setattr(DataFrame, "count", _no_count)
    got = similarity.ivf_topk(emb, qdf, k=5, n_cells=8, n_probe=2).collect()
    assert got
    # the composed IVF-PQ trains BOTH quantizers — still no count job
    got2 = similarity.ivfpq_topk(emb, qdf, k=5, n_cells=8, n_probe=2).collect()
    assert got2


def test_cosine_all_pairs_blocked_matches_naive(spark):
    """Block-nested-loop all-pairs must equal the naive quadratic form
    exactly, for any block count (1 degenerates to single-group)."""
    t = load_tables(spark, SF_DIR)
    emb = t["embeddings"]
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([list(r[1]) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(Mn @ Mn.T, 6)
    exp = {
        (int(ids[a]), int(ids[b]), float(S[a, b]))
        for a in range(len(ids))
        for b in range(len(ids))
        if ids[a] < ids[b] and S[a, b] >= 0.35
    }
    assert exp, "fixture produced no pairs — threshold too high"
    for nb in (1, 3, 8):
        got = {
            (r["vec_a"], r["vec_b"], r["cos_sim"])
            for r in similarity.cosine_all_pairs(emb, 0.35, num_blocks=nb).collect()
        }
        assert got == exp, f"num_blocks={nb} diverged"


def test_cosine_all_pairs_no_driver_collect(spark):
    """Scale audit: building the all-pairs plan must NOT materialize the
    input (a driver-side collect would execute this poisoned stage)."""

    def boom(_it):
        raise RuntimeError("input materialized during plan construction")
        yield  # pragma: no cover

    base = spark.range(8).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    poisoned = base.mapInPandas(boom, "vec_id long, embedding array<double>")
    out = similarity.cosine_all_pairs(poisoned, 0.9)  # must not raise
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan


def test_hash_sampling_deterministic_and_partition_invariant(spark):
    """The defining property vs RNG sampling: identical keep-set across
    reruns AND across partitionings; per-stratum rates hold roughly."""
    from flink_essentials_spark.functions.sampling import (
        hash_sample,
        mixture_report,
        stratified_hash_sample,
    )

    t = load_tables(spark, SF_DIR)
    d = t["documents"]
    ids1 = sorted(r["doc_id"] for r in hash_sample(d, 0.3).select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in hash_sample(d.repartition(7), 0.3).select("doc_id").collect()
    )
    assert ids1 == ids2 and ids1
    assert abs(len(ids1) / d.count() - 0.3) < 0.1

    strat = stratified_hash_sample(
        d, {"src0": 1.0, "src1": 0.0}, strata_col="source"
    )
    srcs = {r["source"] for r in strat.select("source").distinct().collect()}
    assert srcs == {"src0"}  # rate-0 and unlisted strata dropped
    rep = {r["source"]: r["share"] for r in mixture_report(strat, "source").collect()}
    assert rep == {"src0": 1.0}


def test_token_stats_and_quality(spark, docs_df):
    stats = {r["doc_id"]: r for r in text.token_stats(docs_df).collect()}
    assert stats[0]["n_tokens"] == 9
    assert stats[0]["n_unique_tokens"] == 8  # 'the' twice
    q = {r["doc_id"]: r for r in text.quality_score(docs_df).collect()}
    assert 0 < q[0]["quality_score"] <= 1
    assert q[0]["lexical_diversity"] == 8 / 9


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is a friend of the dog and the bird"),
            (1, "der Hund und die Katze, das ist gut"),
            (2, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in text.language_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "unknown"}


def test_language_id_ngram_markers(spark):
    df = spark.createDataFrame(
        [
            (0, "the weather thing was rather thorough"),
            (1, "ich möchte nach München, das Wetter ist schön"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in text.language_id_ngram(df).collect()}
    assert got[0] == "en" and got[1] == "de"


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma alpha beta"), (2, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert fp[0] == fp[1] != fp[2]


def test_pack_sequences_contiguous_stream(spark):
    """Packing invariant: docs tile the token stream exactly — each
    doc's tokens_before equals the running total of all prior docs,
    and bin/offset fields are pure functions of the position."""
    t = load_tables(spark, SF_DIR)
    out = text.pack_sequences(t["documents"], 128).orderBy("doc_id").collect()
    assert out
    pos = 0
    for r in out:
        assert r["tokens_before"] == pos
        assert r["start_bin"] == pos // 128
        assert r["start_offset"] == pos % 128
        assert r["end_bin"] == (pos + max(r["n_tokens"], 1) - 1) // 128
        pos += r["n_tokens"]


def test_chunk_documents_boundaries_match_reference(spark):
    """Chunk starts/lengths/content vs an independent Python reference,
    including tail truncation and the zero-token doc emitting nothing."""
    import hashlib
    import re

    rows = [
        (0, " ".join(f"w{i}" for i in range(150))),   # 3 chunks of 64/64/54
        (1, " ".join(f"w{i}" for i in range(48))),     # 1 chunk, len 48
        (2, "one"),                                    # 1 chunk, len 1
        (3, "...!!!"),                                 # 0 tokens -> no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_len"], r["chunk_md5"])
        for r in text.chunk_documents(df, chunk_tokens=64, stride=48).collect()
    }
    exp = {}
    for did, t in rows:
        toks = [w for w in re.split(r"\W+", t.lower()) if w]
        for ci in range((max(len(toks), 1) - 1) // 48 + 1) if toks else []:
            chunk = toks[ci * 48 : ci * 48 + 64]
            exp[(did, ci)] = (
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )
    assert got == exp
    # overlap property: consecutive chunks share chunk_tokens - stride
    # tokens, so doc 0's chunk 1 starts at token 48 < chunk 0's end 64
    assert got[(0, 0)][0] == 64 and got[(0, 1)][0] == 64 and got[(0, 2)][0] == 54


def test_source_overlap_matches_set_arithmetic(spark):
    import re

    rows = [
        (0, "web", "alpha beta gamma delta"),
        (1, "web", "epsilon zeta eta"),
        (2, "books", "alpha beta gamma theta"),
        (3, "code", "iota kappa"),
        (4, "books", "epsilon zeta eta"),  # books shares a doc with web
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def shset(texts, n=3):
        out = set()
        for t in texts:
            toks = [w for w in re.split(r"\W+", t.lower()) if w]
            out |= {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        return out

    groups = {}
    for _, src, t in rows:
        groups.setdefault(src, []).append(t)
    sets = {g: shset(ts) for g, ts in groups.items()}
    got = {
        (r["source_a"], r["source_b"]): (r["n_shared"], r["n_a"], r["n_b"], r["jaccard"])
        for r in dedup.source_overlap(df, n=3).collect()
    }
    exp = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] & sets[b]:
                inter = len(sets[a] & sets[b])
                exp[(a, b)] = (
                    inter,
                    len(sets[a]),
                    len(sets[b]),
                    inter / (len(sets[a]) + len(sets[b]) - inter),
                )
    assert got == exp
    assert ("books", "web") in got  # the designed cross-source overlap


def test_tfidf_top_terms_scores_and_determinism(spark):
    rows = [
        (0, "web", "spark spark flink"),
        (1, "web", "spark duckdb"),
        (2, "books", "novel novel novel flink"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = text.tfidf_top_terms(df, k=2).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_key"], []).append(r)
    # web: spark tf=3 df=2 -> 3*3/2=4.5 ; duckdb tf=1 df=1 -> 3.0 ;
    #      flink tf=1 df=2 -> 1.5  => top2 = spark, duckdb
    web = {r["word"]: (r["tf"], r["doc_freq"], r["score"], r["rank"]) for r in by_group["web"]}
    assert web == {"spark": (3, 2, 4.5, 1), "duckdb": (1, 1, 3.0, 2)}
    # books: novel tf=3 df=1 -> 9.0 ; flink tf=1 df=2 -> 1.5
    books = {r["word"]: r["rank"] for r in by_group["books"]}
    assert books == {"novel": 1, "flink": 2}
    # rerun is bit-identical (deterministic tiebreak)
    assert sorted(map(tuple, out)) == sorted(
        map(tuple, text.tfidf_top_terms(df, k=2).collect())
    )


def test_length_outliers_matches_numpy(spark):
    lens = [100, 102, 98, 101, 99, 500, 3]  # two obvious outliers
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_chars long"
    )
    out = {r["doc_id"]: r["z_score"] for r in text.length_outliers(df, z=2.0).collect()}
    a = np.array(lens, dtype=np.float64)
    mean = a.sum() / len(a)
    std = math.sqrt((a * a).sum() / len(a) - mean * mean)
    exp = {
        i: (n - mean) / std
        for i, n in enumerate(lens)
        if abs(n - mean) > 2.0 * std
    }
    assert out == exp  # exact doubles, no tolerance
    # the 500-char doc inflates sigma enough that 3 chars stays inside 2σ
    assert set(out) == {5}


def test_quantize_embeddings_codes_and_error_bound(spark):
    rows = [
        (0, [0.0, 10.0, 5.0]),
        (1, [1.0, 10.0, -5.0]),
        (2, [0.5, 10.0, 0.0]),  # dim 1 is constant -> code 0, err 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in similarity.quantize_embeddings(df, levels=255).collect()}
    M = np.array([r[1] for r in rows], dtype=np.float64)
    lo, hi = M.min(axis=0), M.max(axis=0)
    for vid, vec in rows:
        codes = [int(c) for c in out[vid]["codes"].split(",")]
        assert len(codes) == 3 and all(0 <= c <= 254 for c in codes)
        errs = []
        for j, v in enumerate(vec):
            if hi[j] == lo[j]:
                assert codes[j] == 0
                errs.append(abs(v - lo[j]))
            else:
                span = hi[j] - lo[j]
                assert codes[j] == math.floor((v - lo[j]) * 254 / span + 0.5)
                errs.append(abs(v - (lo[j] + codes[j] * span / 254)))
                # quantization error is bounded by half a step
                assert errs[-1] <= span / 254 / 2 + 1e-12
        assert out[vid]["max_err"] == max(errs)  # exact doubles


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, "aab")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.char_entropy(df).collect()}
    assert got[0]["entropy_bits"] == 0.0          # one symbol
    assert got[1]["entropy_bits"] == 1.0          # two equiprobable
    assert got[2]["entropy_bits"] == 2.0          # four equiprobable
    h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert got[3]["entropy_bits"] == round(h, 6)
    assert got[3]["n_chars"] == 3 and got[3]["n_distinct_chars"] == 2
    # no negative zero leaks (the 0.0 - sum guard)
    assert math.copysign(1.0, got[0]["entropy_bits"]) == 1.0


def test_ngram_contamination_counts_and_self_pair_exclusion(spark):
    """Hand-built corpus with KNOWN shared 5-grams: the only LLM op that
    previously had neither a meaningful oracle nor a unit test (r4
    verdict #3). Doc 1 shares exactly one 5-gram with the benchmark
    doc, doc 2 is an exact copy (both its 5-grams shared), doc 3 is
    disjoint; the benchmark doc itself must NOT self-pair."""
    corpus = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta"),  # benchmark
            (1, "start alpha beta gamma delta epsilon end pad pad"),
            (2, "alpha beta gamma delta epsilon zeta"),  # exact dup
            (3, "completely unrelated words about nothing shared here"),
            (200, "another benchmark row with no overlap at all okay"),
        ],
        "doc_id long, text string",
    )
    bench = corpus.filter(F.col("doc_id") >= 100)
    got = {
        (r["bench_id"], r["doc_id"]): r["n_shared"]
        for r in dedup.ngram_contamination(corpus, bench, n=5).collect()
    }
    # doc 100 has 5-grams {abgde, bgdez}; doc 1 contains abgde only;
    # doc 2 contains both; doc 3 / doc 200 share none.
    assert got == {(100, 1): 1, (100, 2): 2}


def test_fuzzy_match_blocked_distances_and_blocking(spark):
    """Blocked Levenshtein linkage: in-block pairs within the bound
    match with exact distances; cross-block true matches are missed BY
    DESIGN (that is the blocking trade) and out-of-bound pairs return
    -1 from the banded levenshtein and are dropped."""
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "zzz ltd")], "lid long, lname string"
    )
    right = spark.createDataFrame(
        [(10, "acme corp"), (11, "acme korp"), (12, "acme xxxx"), (13, "zcme corp")],
        "rid long, rname string",
    )
    got = {
        (r["lid"], r["rid"]): r["distance"]
        for r in dedup.fuzzy_match_blocked(
            left, right, "lid", "lname", "rid", "rname",
            block=lambda c: F.substring(c, 1, 1), max_distance=2,
        ).collect()
    }
    # 13 ("zcme corp", distance 1 to "acme corp") is in block "z" — missed
    assert got == {(1, 10): 0, (1, 11): 1}


def test_inverted_index_postings_sorted_capped(spark):
    docs = spark.createDataFrame(
        [(3, "apple banana"), (1, "banana apple apple"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    got = {
        r["term"]: (r["doc_freq"], list(r["postings"]))
        for r in text.inverted_index(docs, max_postings=2).collect()
    }
    assert got["apple"] == (2, [1, 3])
    assert got["banana"] == (3, [1, 2])  # capped at 2 of 3, sorted
    assert got["cherry"] == (1, [2])


def test_weighted_sample_matches_manual_priorities(spark):
    """Selection must equal the manually computed bottom-k of
    md5-prefix-hash / weight — and be independent of partitioning."""
    import hashlib

    from flink_essentials_spark.functions.sampling import weighted_sample

    rows = [(i, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def u(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    want = sorted(rows, key=lambda r: (float(u(r[0])) / r[1], r[0]))[:10]
    got = [
        (r["doc_id"], r["w"])
        for r in weighted_sample(df, 10, "w", "doc_id")
        .orderBy("priority", "doc_id")
        .collect()
    ]
    assert got == want
    got_rep = [
        (r["doc_id"], r["w"])
        for r in weighted_sample(df.repartition(7), 10, "w", "doc_id")
        .orderBy("priority", "doc_id")
        .collect()
    ]
    assert got_rep == want


def test_containment_pairs_asymmetric(spark):
    """A short doc quoted verbatim inside a long one: containment of
    the short IN the long is 1.0; the reverse direction is far below
    and must not appear at the 0.8 bar."""
    short = "alpha beta gamma delta epsilon"
    long_ = (
        "the quick brown fox jumps over the lazy dog near the river "
        + short
        + " and then some completely different trailing content here"
    )
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "unrelated text with no overlap at all")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(df, n=3, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}


def test_linear_trend_matches_numpy(spark):
    import numpy as np

    rows = [("a", x, 3 * x + 7 + (x % 5)) for x in range(10, 60)] + [
        ("b", x, 100 - 2 * x + (x % 3)) for x in range(5, 40)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: (r["slope"], r["intercept"], r["pearson_r"])
        for r in text.linear_trend(df, "x", "y", "g").collect()
    }
    for g in ("a", "b"):
        xs = np.array([x for gg, x, _ in rows if gg == g], dtype=np.float64)
        ys = np.array([y for gg, _, y in rows if gg == g], dtype=np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(got[g][0] - slope) < 1e-9
        assert abs(got[g][1] - intercept) < 1e-9
        assert abs(got[g][2] - r) < 1e-12


def test_bpe_merge_pairs_hand_counts(spark):
    """'banana' x2 + 'bandana': pair counts computed by hand; weighting
    by word occurrences (not distinct words) must hold."""
    df = spark.createDataFrame(
        [(1, "banana banana"), (2, "bandana")], "doc_id long, text string"
    )
    got = {
        r["pair"]: r["n_occurrences"]
        for r in text.bpe_merge_pairs(df, top_k=10).collect()
    }
    # banana: ba an na an na -> ba:1 an:2 na:2 (x2 occurrences)
    # bandana: ba an nd da an na -> ba:1 an:2 nd:1 da:1 na:1
    assert got == {"an": 6, "na": 5, "ba": 3, "nd": 1, "da": 1}


def test_bpe_train_greedy_merges_golden(spark):
    """Hand-derived 3-round BPE training: pins (a) occurrence-weighted
    pair counts, (b) the lexicographic (left, right) tie-break, (c)
    GREEDY left-to-right merge application — an 'aaaa' run under merge
    (a,a) becomes [aa, aa], never [aa, a, a] — and (d) early stop when
    no pairs remain."""
    df = spark.createDataFrame(
        [(1, "aaaa aaaa ab"), (2, "aaaa ab ab")], "doc_id long, text string"
    )
    # vocab: aaaa x3 -> [a,a,a,a]; ab x3 -> [a,b]
    # round 1: (a,a)=9 vs (a,b)=3 -> merge (a,a); aaaa -> [aa,aa] (greedy)
    # round 2: (aa,aa)=3 vs (a,b)=3 tie -> 'a' < 'aa' -> merge (a,b)
    # round 3: (aa,aa)=3 -> merge; round 4: no pairs -> stop at 3 rows
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["n_occurrences"])
        for r in text.bpe_train(df, n_merges=8).orderBy("step").collect()
    ]
    assert got == [
        (1, "a", "a", "aa", 9),
        (2, "a", "b", "ab", 3),
        (3, "aa", "aa", "aaaa", 3),
    ]

    # encode with the trained merges: 'aaaa' -> [aa,aa] -> [aaaa] (1
    # token), 'ab' -> [ab] (1 token); per-doc integer economics
    merges = [(l, r) for _, l, r, _, _ in got]
    enc = {
        r["doc_id"]: (
            r["n_words"], r["n_chars"], r["n_bpe_tokens"],
            r["chars_per_token"],
        )
        for r in text.bpe_encode(df, merges).collect()
    }
    assert enc == {1: (3, 10, 3, 10 / 3), 2: (3, 8, 3, 8 / 3)}


def test_validity_intervals_half_open_chain(spark):
    """Intervals chain per key: each valid_to equals the next
    valid_from; the last state is open (NULL)."""
    import datetime

    from flink_essentials_spark.operators import joins

    rows = [
        (1, datetime.datetime(2024, 1, 1), 10.0),
        (1, datetime.datetime(2024, 1, 3), 11.0),
        (1, datetime.datetime(2024, 1, 7), 12.0),
        (2, datetime.datetime(2024, 2, 1), 99.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(
        (
            (r["user_id"], r["value"], r["valid_from_ms"], r["valid_to_ms"])
            for r in joins.validity_intervals(
                df, "user_id", "ts", ["value"]
            ).collect()
        )
    )
    ms = lambda d: int(d.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)  # noqa: E731
    d1, d3, d7 = (ms(datetime.datetime(2024, 1, x)) for x in (1, 3, 7))
    f1 = ms(datetime.datetime(2024, 2, 1))
    assert out == [
        (1, 10.0, d1, d3),
        (1, 11.0, d3, d7),
        (1, 12.0, d7, None),
        (2, 99.0, f1, None),
    ]


def test_normalize_unicode_composes_and_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "café"),          # e + combining acute -> é
            (2, "café"),           # already composed
            (3, "각"),  # Hangul jamo -> 각 (U+AC01)
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["changed"])
        for r in text.normalize_unicode(df).collect()
    }
    assert got[1] == ("café", True)
    assert got[2] == ("café", False)
    assert got[3] == ("각", True)


def test_char_window_dups_shared_suffix(spark):
    """Two docs with the same 50-char suffix share end-aligned windows;
    the unrelated doc stays at 0. Window 40, stride 5: offsets 0,5,10
    fit inside the 50-char shared suffix -> 3 dup windows each."""
    suffix = "x" * 15 + "X shared boilerplate suffix of fifty chars"[:35]
    assert len(suffix) == 50
    df = spark.createDataFrame(
        [
            (1, "a" * 30 + suffix),
            (2, "completely different front material here " + suffix),
            (3, "nothing shared with the others at all " + "z" * 40),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_windows"])
        for r in dedup.char_window_dups(df, window=40, stride=5).collect()
    }
    assert got[1][0] == 3 and got[2][0] == 3
    assert got[3][0] == 0


def test_duplicate_spans_stride1_guarantee_and_merge(spark):
    """The stride-1 member's contract (Lee et al. 2022): (a) a shared
    substring of length >= window is found at ANY alignment — here a
    60-char block sits MID-TEXT at different offsets in two docs, the
    case char_window_dups' end-aligned strided windows miss by
    construction; (b) overlapping duplicated windows merge into ONE
    maximal span whose bounds are exactly the shared block; (c) docs
    shorter than the window emit nothing and unrelated docs emit
    nothing."""
    block = "<<this sixty character duplicated block appears mid text!!>>"
    assert len(block) == 60
    df = spark.createDataFrame(
        [
            (1, "a" * 17 + block + "b" * 23),
            (2, "c" * 5 + block + "d" * 41),
            (3, "nothing shared with the others here at all " + "z" * 40),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.duplicate_spans(df, window=40).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_len"], r["n_windows"])
        )
    # one maximal span per spiked doc, exactly covering the block:
    # 60 - 40 + 1 = 21 stride-1 windows merge into [off+1, off+60]
    assert got[1] == [(18, 77, 60, 21)]
    assert got[2] == [(6, 65, 60, 21)]
    assert 3 not in got and 4 not in got
    # the strided end-aligned form misses this misaligned mid-text
    # repeat entirely (documented recall trade this member closes)
    strided = {
        r["doc_id"]: r["n_dup_windows"]
        for r in dedup.char_window_dups(df, window=40, stride=5).collect()
    }
    assert strided[1] == 0 and strided[2] == 0


def test_token_budget_select_banded_equals_naive(spark):
    """The banded two-phase prefix sum must equal the naive per-source
    global cumsum for every row — including quality TIES (same band by
    construction) and values exactly on a band boundary — and fill
    each budget greedily by (quality DESC, id). Fixture: two sources,
    hand-set qualities with a duplicated value and an exact boundary
    (8/32 = 0.25), budget = 10 tokens per source."""
    from pyspark.sql import Window

    from flink_essentials_spark.functions.sampling import token_budget_select

    rows = [
        # (doc_id, source, n_tokens, quality)
        (1, "a", 4, 0.9),
        (2, "a", 4, 0.25),   # exact band boundary at bands=32
        (3, "a", 4, 0.25),   # tie -> same band, id breaks the tie
        (4, "a", 4, 0.1),
        (5, "b", 6, 0.5),
        (6, "b", 6, 0.5),
        (7, "b", 6, 0.4),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long, quality double"
    )
    budgets = spark.createDataFrame(
        [("a", 10), ("b", 10)], "source string, budget long"
    )
    got = {
        r["doc_id"]: (r["cum_tokens"], r["selected"])
        for r in token_budget_select(df, budgets).collect()
    }
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = df.withColumn("ct", F.sum("n_tokens").over(w)).collect()
    assert len(got) == len(rows)
    for r in naive:
        assert got[r["doc_id"]] == (r["ct"], r["ct"] <= 10), r
    # greedy fill: a keeps docs 1,2 (8 tokens; doc 3 would exceed);
    # b keeps doc 5 only (6 tokens; doc 6 would exceed)
    assert {d for d, (_, s) in got.items() if s} == {1, 2, 5}


def test_curriculum_mix_interleave_ratio(spark):
    """Sorting by mix_key interleaves strata at the weight ratio: in
    any prefix of the sorted mix, stratum counts track 2:1 within one
    step."""
    from flink_essentials_spark.functions.sampling import curriculum_mix_key

    rows = [(i, "a" if i < 40 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(
        (
            (r["mix_key"], r["source"], r["doc_id"])
            for r in curriculum_mix_key(
                df, {"a": 2, "b": 1}, "source", "doc_id"
            ).collect()
        )
    )
    # first 20 docs of "b" and 40 of "a" interleave: per unit mix_key,
    # 2 a's and 1 b
    for n in (6, 15, 30):
        prefix = out[:n]
        na = sum(1 for _, s, _ in prefix if s == "a")
        nb = n - na
        assert abs(na - 2 * nb) <= 2, (n, na, nb)


def test_kfold_balanced_within_stratum(spark):
    from flink_essentials_spark.functions.sampling import kfold_assign

    rows = [(i, "a" if i % 3 else "b") for i in range(101)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = kfold_assign(df, 4, "g").collect()
    from collections import Counter

    for g in ("a", "b"):
        c = Counter(r["fold"] for r in out if r["g"] == g)
        assert set(c) == {0, 1, 2, 3}
        assert max(c.values()) - min(c.values()) <= 1  # balanced ±1
    # partition-invariance
    out2 = kfold_assign(df.repartition(13), 4, "g").collect()
    assert {(r["doc_id"], r["fold"]) for r in out} == {
        (r["doc_id"], r["fold"]) for r in out2
    }


def test_remove_boilerplate_preserves_order_and_uniques(spark):
    df = spark.createDataFrame(
        [
            (1, "keep one\nBOILER\nkeep two"),
            (2, "BOILER\nother text"),
            (3, "third doc\nBOILER"),
            (4, "unique only\nno shared lines"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_lines_kept"], r["n_removed"])
        for r in text.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert got == {1: (2, 1), 2: (1, 1), 3: (1, 1), 4: (2, 0)}
    # order preserved: doc 1 rebuilds to exactly the two kept lines
    import hashlib

    row = {
        r["doc_id"]: r["clean_md5"]
        for r in text.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert row[1] == hashlib.md5(b"keep one\nkeep two").hexdigest()


def test_bigram_lm_score_hand_computed(spark):
    """Tiny corpus with hand-computable MLE: P(b|a)=1 everywhere in a
    deterministic chain scores 0; a doc using a rare continuation
    scores below one using the common one."""
    import math

    df = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b c"),
            (3, "a b d"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_log2_prob"])
        for r in text.bigram_lm_score(df).collect()
    }
    # counts: a b ×3, b c ×2, b d ×1; unigrams a×3 b×3 c×2 d×1
    # doc1/2: (log2(3/3) + log2(2/3)) / 2 ; doc3: (log2(3/3)+log2(1/3))/2
    d12 = round((math.log2(1) + math.log2(2 / 3)) / 2, 6)
    d3 = round((math.log2(1) + math.log2(1 / 3)) / 2, 6)
    assert got == {1: (2, d12), 2: (2, d12), 3: (2, d3)}
    assert got[3][1] < got[1][1]


def test_funnel_requires_strict_order(spark, monkeypatch, tmp_path):
    """The funnel's defining semantics on a hand fixture: a user whose
    purchase precedes their first view does NOT convert; equal
    timestamps do NOT convert (strictly after); a properly ordered
    view→click→purchase user converts through all stages."""
    import datetime

    from flink_essentials_spark.queries import llmdata as L

    def ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # u1: proper order -> full conversion
        (1, "view", ts(1)), (1, "click", ts(2)), (1, "purchase", ts(3)),
        # u2: purchase BEFORE view -> stops after click
        (2, "purchase", ts(1)), (2, "view", ts(2)), (2, "click", ts(3)),
        # u3: click at the SAME instant as view -> strictly-after fails
        (3, "view", ts(5)), (3, "click", ts(5)),
        # u4: view only
        (4, "view", ts(1)),
    ]
    ev = spark.createDataFrame(
        [(u, e, t, 1.0) for u, e, t in rows],
        "user_id long, event_type string, ts timestamp, value double",
    )
    monkeypatch.setattr(
        L, "load_tables", lambda _spark, _sf: {"events": ev}
    )
    got = {
        r["stage"]: (r["n_users"], r["step_rate"])
        for r in L.q_funnel_conversion(spark, "ignored").collect()
    }
    assert got["1_view"] == (4, None)
    assert got["2_click"] == (2, 0.5)       # u1 and u2 (view ts2 < click ts3)
    assert got["3_purchase"] == (1, 0.5)    # only u1
