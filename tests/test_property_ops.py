"""Property-based invariants for the r8 algorithmic operators
(hypothesis): each op is compared EXACTLY against a brute-force
pure-Python reference on adversarial small inputs — tiny alphabets so
natural cross-doc repeats and island merges occur, boundary qualities
so band-edge ties occur. Example counts are small because every
example runs a Spark job; the point is adversarial shapes, not volume.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# --- duplicate_spans ---------------------------------------------------------


def _ref_duplicate_spans(texts: dict[int, str], window: int):
    """Brute-force reference: position p of doc d is duplicated iff
    text[p:p+window] occurs in ANOTHER doc; runs of positions with
    gaps <= window merge into (start, end, len, n_windows) spans
    (1-based inclusive, matching the operator's contract)."""
    wins: dict[str, set[int]] = {}
    for d, t in texts.items():
        for p in range(len(t) - window + 1):
            wins.setdefault(t[p : p + window], set()).add(d)
    spans = []
    for d, t in texts.items():
        dup = [
            p + 1
            for p in range(len(t) - window + 1)
            if len(wins[t[p : p + window]]) >= 2
        ]
        run: list[int] = []
        for p in dup + [None]:
            if run and (p is None or p - run[-1] > window):
                spans.append(
                    (d, run[0], run[-1] + window - 1,
                     run[-1] + window - run[0], len(run))
                )
                run = []
            if p is not None:
                run.append(p)
    return sorted(spans)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet="ab", min_size=0, max_size=60),
             min_size=2, max_size=4),
    st.text(alphabet="ab", min_size=10, max_size=20),
    st.data(),
)
def test_duplicate_spans_matches_bruteforce(spark, docs, block, data):
    """A shared block inserted at arbitrary offsets into two docs,
    over a 2-letter alphabet (so plenty of NATURAL repeats and island
    merges also occur): the operator's spans equal the brute-force
    reference exactly — every duplicated position found (stride-1
    guarantee), every merge boundary right."""
    from flink_essentials_spark.functions.dedup import duplicate_spans

    texts = {i + 1: t for i, t in enumerate(docs)}
    # spike the block into two distinct docs at arbitrary offsets
    for d in (1, 2):
        off = data.draw(st.integers(0, len(texts[d])), label=f"off{d}")
        texts[d] = texts[d][:off] + block + texts[d][off:]
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"],
         r["n_windows"])
        for r in duplicate_spans(df, window=8).collect()
    )
    assert got == _ref_duplicate_spans(texts, 8)


# --- token_budget_select -----------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(1, 9),
            st.sampled_from([0.0, 0.25, 0.5, 0.5, 0.75, 1.0]),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 40),
)
def test_token_budget_select_matches_greedy_reference(spark, rows, budget):
    """For arbitrary row sets — duplicate qualities, boundary values
    0.0/1.0 (band-edge), tiny budgets — the banded two-phase cumsum
    equals the greedy (quality DESC, id) fill per source, row for
    row."""
    from flink_essentials_spark.functions.sampling import (
        token_budget_select,
    )

    data = [
        (i + 1, src, toks, q) for i, (src, toks, q) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "doc_id long, source string, n_tokens long, quality double"
    )
    budgets = spark.createDataFrame(
        [("a", budget), ("b", budget)], "source string, budget long"
    )
    got = {
        r["doc_id"]: (r["cum_tokens"], r["selected"])
        for r in token_budget_select(df, budgets).collect()
    }
    ref = {}
    for src in {d[1] for d in data}:
        cum = 0
        for did, _, toks, _q in sorted(
            (d for d in data if d[1] == src), key=lambda d: (-d[3], d[0])
        ):
            cum += toks
            ref[did] = (cum, cum <= budget)
    assert got == ref


# --- damerau-levenshtein (batched DP) ---------------------------------------


def _ref_dl(a: str, b: str) -> int:
    """Scalar textbook Lowrance-Wagner 1975 true-DL reference (the
    dict-based form straight from the paper's recurrence), over UTF-8
    bytes to match the batched implementation's contract."""
    A, B = a.encode("utf-8"), b.encode("utf-8")
    la, lb = len(A), len(B)
    inf = la + lb + 1
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    da: dict[int, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k, l = da.get(B[j - 1], 0), db
            cost = 0 if A[i - 1] == B[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[A[i - 1]] = i
    return d[la + 1][lb + 1]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc", max_size=10),
            st.text(alphabet="abc", max_size=10),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dl_batch_matches_textbook_reference(pairs):
    """The numpy pair-batched DL equals the scalar textbook DP on
    adversarial tiny-alphabet pairs (transpositions and long shared
    runs occur constantly at |Σ|=3) — padding sentinels never leak
    into the valid region whatever the length mix in the batch."""
    from flink_essentials_spark.functions.dedup import _dl_batch

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    assert _dl_batch(a, b) == [_ref_dl(x, y) for x, y in pairs]


def test_dl_batch_known_vectors():
    """Published true-DL vectors: CA->ABC is 2 under unrestricted DL
    (the case that separates it from OSA's 3), plus transposition,
    empties, and multibyte UTF-8 (byte semantics)."""
    from flink_essentials_spark.functions.dedup import _dl_batch

    got = _dl_batch(
        ["CA", "ab", "abc", "", "kitten", "héllo", "same"],
        ["ABC", "ba", "ca", "abc", "sitting", "hello", "same"],
    )
    assert got == [2, 1, 2, 3, 3, 2, 0]


def test_dl_scores_batch_buckets_and_overflow(spark):
    """dl_scores_batch splits rows by length bucket before the DP
    (one long pair no longer sizes every short pair's tensor) and the
    on_overflow contract: 'null' leaves only the >256-byte rows NULL
    while short rows in the SAME batch still score; default 'error'
    raises (r11 advice)."""
    import pytest

    from flink_essentials_spark.functions.dedup import dl_scores_batch

    long_s = "x" * 300
    rows = [("CA", "ABC"), ("kitten", "sitting"), (long_s, "x"),
            ("a" * 200, "a" * 199), ("", "abc")]
    df = spark.createDataFrame(rows, "a string, b string").coalesce(1)
    got = {
        (r["a"][:8], r["b"][:8]): r["dl"]
        for r in dl_scores_batch(df, "a", "b", on_overflow="null").collect()
    }
    assert got[("CA", "ABC")] == 2
    assert got[("kitten", "sitting")] == 3
    assert got[(long_s[:8], "x")] is None
    assert got[("a" * 8, "a" * 8)] == 1
    assert got[("", "abc")] == 3
    with pytest.raises(Exception, match="256-byte"):
        dl_scores_batch(df, "a", "b").collect()


# --- louvain one-level mutual-best merge -------------------------------------


def _ref_louvain_merge(und_edges: dict[tuple[int, int], int]):
    """Brute-force reference for one synchronous mutual-best-merge
    sweep: undirected weighted edges {(u,v): w} with u<v, no
    self-loops. Returns (n_nodes, m2, n_pairs, dq_num, q0_num,
    q1_num, q1) with modularities scaled by (2m)^2."""
    adj: dict[int, dict[int, int]] = {}
    for (u, v), w in und_edges.items():
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w
    k = {u: sum(nb.values()) for u, nb in adj.items()}
    m2 = sum(k.values())
    best = {}
    for u, nb in adj.items():
        cands = [(m2 * w - k[u] * k[v], -v, v) for v, w in nb.items()]
        g, _, v = max(cands)
        if g > 0:
            best[u] = (v, g)
    pairs = [
        (u, v, g)
        for u, (v, g) in best.items()
        if u < v and best.get(v, (None, 0))[0] == u
    ]
    sum_gain = sum(g for _, _, g in pairs)
    sumk2 = sum(x * x for x in k.values())
    q1_num = 2 * sum_gain - sumk2
    return (
        len(adj),
        m2,
        len(pairs),
        2 * sum_gain,
        -sumk2,
        q1_num,
        q1_num / (m2 * m2),
    )


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        )
        .filter(lambda t: t[0] != t[1])
        .map(lambda t: (min(t), max(t))),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    )
)
def test_louvain_merge_matches_bruteforce(spark, und_edges):
    """louvain_merge_level against the brute-force sweep on adversarial
    tiny weighted graphs — pins the argmax tie-break, the positive-gain
    gate, the mutuality requirement, and the exact scaled-modularity
    arithmetic (incl. the n_pairs=0 COALESCE path)."""
    from flink_essentials_spark.functions.graph import louvain_merge_level

    rows = []
    for (u, v), w in und_edges.items():
        rows.append((u, v, w))
        rows.append((v, u, w))
    e = spark.createDataFrame(rows, "src long, dst long, cnt long")
    got = tuple(louvain_merge_level(e, "cnt").collect()[0])
    assert got == _ref_louvain_merge(und_edges)


def _ref_lcs(a, b):
    """Textbook LCS DP (CLRS 15.4), scalar."""
    m = len(b)
    prev = [0] * (m + 1)
    for x in a:
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            cur[j] = max(prev[j], cur[j - 1], prev[j - 1] + (x == b[j - 1]))
        prev = cur
    return prev[m]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from("abc"), max_size=12),
            st.lists(st.sampled_from("abc"), max_size=12),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_lcs_batch_matches_textbook_reference(pairs):
    """The pair-axis-vectorized LCS equals the scalar CLRS DP on
    tiny-alphabet token sequences (long shared runs + heavy repeats);
    the -1/-2 padding sentinels never match whatever the length mix,
    and empty sequences score 0."""
    from flink_essentials_spark.functions.text import _lcs_batch

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    assert _lcs_batch(a, b) == [_ref_lcs(x, y) for x, y in pairs]


def test_lcs_batch_known_vectors():
    """Hand vectors: classic CLRS example ABCBDAB/BDCABA -> 4, plus
    disjoint, identical, empty and repeat-heavy cases."""
    from flink_essentials_spark.functions.text import _lcs_batch

    got = _lcs_batch(
        [list("ABCBDAB"), list("abc"), list("xyz"), [], list("aaaa")],
        [list("BDCABA"), list("abc"), list("abc"), list("abc"), list("aa")],
    )
    assert got == [4, 3, 0, 0, 2]
