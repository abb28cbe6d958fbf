"""Connected components (functions/graph.py) vs an independent
union-find reference, plus convergence stress."""

from __future__ import annotations

import random

from flink_essentials_spark.functions.graph import connected_components


def _union_find_reference(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    return {n: root for root, members in comp.items() for n in members}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    expected = _union_find_reference(edges)
    for algo in ("propagation", "two-phase", "auto", "hybrid"):
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(df, algorithm=algo).collect()
        }
        # union-find roots are already min-of-component because unions
        # always parent the larger root under the smaller one
        assert got == expected, algo


def test_two_triangles_and_a_bridge(spark):
    _run(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)])


def test_disjoint_components(spark):
    _run(spark, [(5, 6), (7, 8), (9, 5), (100, 200)])


def test_long_chain_converges(spark):
    # path graph: worst case for label propagation (diameter rounds)
    _run(spark, [(i, i + 1) for i in range(30)])


def test_self_loops_become_singletons(spark):
    # a node whose ONLY edge is (x, x) is still a (singleton) cluster,
    # in BOTH algorithms; self-loops on connected nodes are no-ops
    _run(spark, [(1, 2), (7, 7), (2, 2)])


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        nodes = list(range(trial * 1000, trial * 1000 + 60))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(40)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _run(spark, edges)


def test_two_phase_beats_propagation_rounds_on_chain(spark):
    """The documented scale claim, measured: on a path graph the
    two-phase algorithm must converge in far fewer rounds than
    diameter-bound label propagation."""
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    s_prop, s_star = {}, {}
    a = connected_components(df, algorithm="propagation", stats=s_prop).collect()
    b = connected_components(df, algorithm="two-phase", stats=s_star).collect()
    assert {(r["node"], r["cluster_id"]) for r in a} == {
        (r["node"], r["cluster_id"]) for r in b
    }
    assert s_prop["rounds"] >= 29  # diameter-bound
    assert s_star["rounds"] <= 8   # O(log n)


def test_auto_escalates_on_deep_graph_and_stays_put_on_shallow(
    spark, monkeypatch
):
    """The default must be scale-safe WITHOUT taxing the common case.
    Under FES_FORCE_DISTRIBUTED (disabling the r15 bounded single-task
    route) the distributed behavior this test pins still holds: on a
    deep chain ``auto`` switches to two-phase over the
    label-contracted quotient and still matches union-find in far
    fewer total rounds than the diameter; on a shallow graph it
    finishes inside the propagation prefix and never contracts."""
    monkeypatch.setenv("FES_FORCE_DISTRIBUTED", "1")
    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "src long, dst long")
    s = {}
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df, algorithm="auto", stats=s).collect()
    }
    assert got == _union_find_reference(chain)
    assert s["switched"] is True
    assert s["rounds"] <= 12  # 4 prefix + O(log) quotient rounds, not 30

    shallow = [(1, 2), (2, 3), (10, 11)]
    df2 = spark.createDataFrame(shallow, "src long, dst long")
    s2 = {}
    got2 = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df2, algorithm="auto", stats=s2).collect()
    }
    assert got2 == _union_find_reference(shallow)
    assert s2["switched"] is False

    # without the override, a bounded edge set routes to the one-task
    # union-find and still matches the reference (r15)
    monkeypatch.delenv("FES_FORCE_DISTRIBUTED")
    s3 = {}
    got3 = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df, algorithm="auto", stats=s3).collect()
    }
    assert got3 == _union_find_reference(chain)
    assert s3.get("single_task") is True


def test_hybrid_two_phase_fallback_matches(spark):
    """hybrid with a tiny uf_bound must route through the two-phase
    finisher (contracted chain still exceeds the bound) and match the
    union-find reference — the 100 TB fallback path, exercised."""
    from flink_essentials_spark.functions.graph import _cc_hybrid

    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "src long, dst long")
    s = {}
    got = {
        r["node"]: r["cluster_id"]
        for r in _cc_hybrid(df, "src", "dst", 50, s, uf_bound=2).collect()
    }
    assert got == _union_find_reference(chain)
    assert s["hybrid"] == "two-phase"
    # contraction halves the chain before the finisher sees it
    assert s["contracted_edges"] < 30


def test_hits_hand_computed(spark):
    """Integer HITS vs hand-computed half-steps on a tiny directed
    bipartite graph (1,2,3 buy from 10,11,20): h0=1; a1 = in-degree;
    h1 = sum of adjacent a1; a2/h2 one more half-step each. Sinks keep
    hub 0, sources authority 0."""
    from flink_essentials_spark.functions.graph import hits

    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 20)], "src long, dst long"
    )
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, iterations=2).collect()
    }
    assert got == {
        1: (8, 0), 2: (5, 0), 3: (1, 0),
        10: (0, 5), 11: (0, 3), 20: (0, 1),
    }


def test_hits_overflow_guard_raises_before_iterating(spark):
    """The int64 bound maxdeg^(2·it) is ENFORCED (r9 ADVICE): a hub of
    degree 60k at 4 iterations (deg^8 ≈ 2^127) must raise an actionable
    ValueError up front, not an opaque ANSI overflow mid-query. The
    same graph at 1 iteration stays comfortably exact and must run."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from flink_essentials_spark.functions.graph import hits

    deg = 60_000
    df = spark.range(deg).select(
        F.lit(0).alias("src"), (F.col("id") + 1).alias("dst")
    )
    with _pytest.raises(ValueError, match="overflows int64"):
        hits(df, iterations=4)
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(df, iterations=1).collect()
    }
    assert got[0] == (deg, 0)
    assert got[1] == (0, 1)


def test_triangle_count_known_graphs(spark):
    """Degree-oriented triangle count vs hand-counted graphs: K4 has 4,
    a path has 0, a star hub has 0 (the case the naive wedge join
    explodes on), two triangles sharing an edge count 2; duplicate
    and reversed edges must not inflate."""
    from flink_essentials_spark.functions.graph import triangle_count

    def n_tri(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return triangle_count(df).first()["n_triangles"]

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert n_tri(k4) == 4
    assert n_tri([(i, i + 1) for i in range(6)]) == 0
    assert n_tri([(0, i) for i in range(1, 8)]) == 0          # star
    assert n_tri([(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)]) == 2
    # noise: duplicates, reversals, self-loops
    assert n_tri([(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)]) == 1


def test_pagerank_matches_numpy_reference(spark):
    """pagerank's join-agg plan must equal the dense numpy iteration of
    the same unnormalized update on a small weighted digraph."""
    import numpy as np
    from flink_essentials_spark.functions.graph import pagerank

    edges = [  # (src, dst, w) — includes asymmetric weights and a cycle
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (1, 0, 1.0),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=4, damping=0.85, weight_col="w").collect()
    }

    n, d = 3, 0.85
    W = np.zeros((n, n))
    for s, t, w in edges:
        W[s, t] = w
    P = W / W.sum(axis=1, keepdims=True)  # row-stochastic
    r = np.ones(n)
    for _ in range(4):
        r = (1 - d) + d * (r @ P)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])


def test_degree_assortativity_hand_computed(spark):
    """Assortativity vs hand math: a star is maximally DISassortative
    only with degree variance on both sides — on a directed 2-source
    graph with known degrees the exact moments and r pin against a
    python reference; a degree-regular graph has zero variance (NULL
    r via 0 denominator is avoided by construction here)."""
    import math

    from pyspark.sql import functions as F  # noqa: F401

    from flink_essentials_spark.functions.graph import degree_assortativity

    edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    outd = {}
    ind = {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    xs = [(outd[s], ind[d]) for s, d in edges]
    m = len(xs)
    sx = sum(x for x, _ in xs)
    sy = sum(y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs)
    syy = sum(y * y for _, y in xs)
    num = m * sxy - sx * sy
    denx = m * sxx - sx * sx
    deny = m * syy - sy * sy
    r = num / math.sqrt(float(denx) * float(deny))
    got = degree_assortativity(df).first()
    assert (got["m"], got["num"], got["denx"], got["deny"]) == (
        m, num, denx, deny,
    )
    assert got["assortativity"] == r


def test_hdbscan_core_matches_brute_force(spark):
    """hdbscan_core_2d against a python brute-force reference on a
    two-blob + noise layout: exact squared core distances (5th NN
    incl. self = 4th neighbor d²), mutual-reachability aggregates,
    and the eps-bound exclusions (sparse points have no core
    distance; points whose eps-ball holds no OTHER core-defined
    point emit no row)."""
    from flink_essentials_spark.functions.graph import hdbscan_core_2d

    pts = (
        [(i, 0 + dx, 10 + dy) for i, (dx, dy) in enumerate(
            [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (2, 2)]
        )]
        + [(10 + i, 30 + dx, 40 + dy) for i, (dx, dy) in enumerate(
            [(0, 0), (1, 1), (2, 0), (0, 2), (1, 0)]
        )]
        + [(99, 100, 100)]  # isolated noise
    )
    eps, k = 4, 5
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    got = {
        r["pid"]: (r["n_eps"], r["core2"], r["n_mr"], r["min_mr2"],
                   r["max_mr2"])
        for r in hdbscan_core_2d(df, "pid", "x", "y", eps=eps, k=k).collect()
    }

    def d2(a, b):
        return (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2

    nbrs = {
        p[0]: sorted(
            d2(p, q) for q in pts if q[0] != p[0] and d2(p, q) <= eps * eps
        )
        for p in pts
    }
    core = {
        pid: ds[k - 2] for pid, ds in nbrs.items() if len(ds) >= k - 1
    }
    want = {}
    for p in pts:
        if p[0] not in core:
            continue
        mrs = [
            max(core[p[0]], core[q[0]], d2(p, q))
            for q in pts
            if q[0] != p[0] and q[0] in core and d2(p, q) <= eps * eps
        ]
        if mrs:
            want[p[0]] = (
                len(nbrs[p[0]]), core[p[0]], len(mrs), min(mrs), max(mrs)
            )
    assert got == want
    assert 99 not in got and len(got) >= 8


def _kruskal_reference(edges):
    """Sequential Kruskal under the lexicographic (w, a, b) order —
    the independent formulation boruvka_mst's uniqueness argument is
    checked against (same pairing as the DuckDB fold oracle)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = []
    for a, b, w in sorted(edges, key=lambda t: (t[2], t[0], t[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            mst.append((a, b, w))
    comp = {n: find(n) for n in parent}
    return sorted(mst), comp


def test_boruvka_matches_kruskal_on_random_tied_graphs(spark):
    """boruvka_mst == sequential Kruskal edge-for-edge on random
    graphs with HEAVY weight ties (weights 1..6) — the unique-MSF
    theorem under the tuple order, the claim the oracle rides; comp
    labels must be the component min. Both execution paths are
    exercised: the default single-task finisher AND pure distributed
    rounds (uf_bound=0)."""
    from flink_essentials_spark.functions.graph import boruvka_mst

    rng = random.Random(131)
    for uf_bound in (4_000_000, 0):
        n = rng.randint(18, 32)
        d = {}
        for _ in range(n * 3):
            a, b = rng.sample(range(1, n + 1), 2)
            d[(min(a, b), max(a, b))] = rng.randint(1, 6)
        edges = [(a, b, w) for (a, b), w in d.items()]
        ref, comp = _kruskal_reference(edges)
        stats = {}
        rows = boruvka_mst(
            spark.createDataFrame(edges, "a long, b long, w long"),
            stats=stats,
            uf_bound=uf_bound,
        ).collect()
        assert sorted((r.a, r.b, r.w) for r in rows) == ref
        assert all(r.comp == comp[r.a] == comp[r.b] for r in rows)
        assert stats.get("single_task_finish", False) == (uf_bound > 0)


def test_boruvka_deep_pointer_chain(spark):
    """An ascending-weight path makes every component's min-edge
    pointer face the same way — the deepest pointer graph a round can
    produce; the distributed contraction (uf_bound=0 forces it) must
    still collapse it in O(log n) rounds."""
    from flink_essentials_spark.functions.graph import boruvka_mst

    edges = [(i, i + 1, i) for i in range(1, 26)]
    stats = {}
    rows = boruvka_mst(
        spark.createDataFrame(edges, "a long, b long, w long"),
        stats=stats,
        uf_bound=0,
    ).collect()
    assert sorted((r.a, r.b, r.w) for r in rows) == sorted(edges)
    assert {r.comp for r in rows} == {1}
    assert stats["rounds"] <= 6  # log2(26) rounds, not path length


def _condense_reference(mst_edges, m):
    """INDEPENDENT condensed-tree formulation: build the explicit
    single-linkage dendrogram bottom-up (Kruskal order), then walk it
    TOP-DOWN exactly as Campello et al. describe condensing — new
    clusters at true splits, fall-outs at false splits, death when
    both children are < m. hdbscan_condense runs a one-pass ASCENDING
    sweep instead; the two traversals must agree on every leaf
    cluster, member, fall-out level and stability."""
    import math

    parent = {}
    nodes = {}  # dendrogram: nid -> (w, left, right); points are ints

    def find(x):
        parent.setdefault(x, x)
        nodes.setdefault(x, None)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    top = {}  # root rep -> dendrogram node id
    seq = [0]
    for a, b, w in sorted(mst_edges, key=lambda t: (t[2], t[0], t[1])):
        ra, rb = find(a), find(b)
        nid = f"i{seq[0]}"
        seq[0] += 1
        nodes[nid] = (w, top.get(ra, ra), top.get(rb, rb))
        parent[max(ra, rb)] = min(ra, rb)
        top[min(ra, rb)] = nid

    def points(n):
        if not isinstance(n, str):
            return [n]
        _, l, r = nodes[n]
        return points(l) + points(r)

    clusters = []  # (birth_w or None, [(w_fall, pid), ...])

    def walk(n, ev):
        w, l, r = nodes[n]
        cl, cr = len(points(l)), len(points(r))
        if cl >= m and cr >= m:
            ev.append("SPLIT")  # internal: mark and stop this cluster
            for child in (l, r):
                child_ev = []
                clusters.append((w, child_ev))
                walk(child, child_ev)
        elif cl < m and cr < m:
            ev.extend((w, p) for p in points(n))
        else:
            small, big = (l, r) if cl < m else (r, l)
            ev.extend((w, p) for p in points(small))
            walk(big, ev)

    seen_roots = set()
    for x in list(parent):
        r = find(x)
        if r in seen_roots or r not in top:
            continue
        seen_roots.add(r)
        if len(points(top[r])) >= m:
            ev = []
            clusters.append((None, ev))
            walk(top[r], ev)
    out = {}
    for birth, ev in clusters:
        if "SPLIT" in ev:
            continue  # internal cluster -> its members are noise
        evs = sorted(ev)
        label = min(p for _, p in evs)
        lb = 0.0 if birth is None else 1.0 / math.sqrt(1.0 + birth)
        s = 0.0
        for w, _p in evs:
            s += 1.0 / math.sqrt(1.0 + w) - lb
        for w, p in evs:
            out[p] = (label, w, len(evs), s)
    return out


def test_hdbscan_condense_matches_descending_reference(spark):
    """Two-formulation proof for the condensed tree: the ascending
    one-pass sweep (hdbscan_condense) vs the textbook top-down walk
    of an explicitly built dendrogram, on random tied MSFs — labels,
    fall-out levels, member counts and BIT-EXACT stabilities."""
    from flink_essentials_spark.functions.graph import boruvka_mst, hdbscan_condense

    rng = random.Random(977)
    for m in (2, 3, 5):
        n = rng.randint(20, 34)
        d = {}
        for _ in range(n * 2):
            a, b = rng.sample(range(1, n + 1), 2)
            d[(min(a, b), max(a, b))] = rng.randint(1, 5)
        edges = [(a, b, w) for (a, b), w in d.items()]
        mst, _ = _kruskal_reference(edges)
        want = _condense_reference(mst, m)
        got = {
            r.pid: (r.label, r.w_fall, r.n_members, r.stability)
            for r in hdbscan_condense(
                boruvka_mst(
                    spark.createDataFrame(edges, "a long, b long, w long")
                ),
                m,
            ).collect()
        }
        assert got == want, m


def test_hdbscan_condense_two_clusters_hand_case(spark):
    """Two w=1 chains bridged at w=100, m=3: both sides are leaf
    clusters born at the bridge (λ_birth = 1/√101), every member
    falls at w=1 (λ = 1/√2), stability = 4 × (1/√2 − 1/√101)."""
    from flink_essentials_spark.functions.graph import boruvka_mst, hdbscan_condense

    edges = [(1, 2, 1), (2, 3, 1), (3, 4, 1),
             (10, 11, 1), (11, 12, 1), (12, 13, 1), (4, 10, 100)]
    rows = hdbscan_condense(
        boruvka_mst(spark.createDataFrame(edges, "a long, b long, w long")), 3
    ).collect()
    got = sorted((r.pid, r.label, r.w_fall, r.n_members, r.stability) for r in rows)
    import math

    s = 0.0
    for _ in range(4):
        s += 1.0 / math.sqrt(2.0) - 1.0 / math.sqrt(101.0)
    assert got == sorted(
        [(p, 1, 1, 4, s) for p in (1, 2, 3, 4)]
        + [(p, 10, 1, 4, s) for p in (10, 11, 12, 13)]
    )


def _glosh_reference(mst_edges, m):
    """Descending-walk GLOSH reference: build the dendrogram, walk it
    top-down tracking cluster PARENTAGE, then score each fall-out
    against its cluster's SUBTREE-minimum fall level (descendants
    included) — the independent traversal of the λ_max definition."""
    import math

    parent = {}
    nodes = {}

    def find(x):
        parent.setdefault(x, x)
        nodes.setdefault(x, None)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    top = {}
    seq = [0]
    for a, b, w in sorted(mst_edges, key=lambda t: (t[2], t[0], t[1])):
        ra, rb = find(a), find(b)
        nid = f"i{seq[0]}"
        seq[0] += 1
        nodes[nid] = (w, top.get(ra, ra), top.get(rb, rb))
        parent[max(ra, rb)] = min(ra, rb)
        top[min(ra, rb)] = nid

    def points(n):
        if not isinstance(n, str):
            return [n]
        _, l, r = nodes[n]
        return points(l) + points(r)

    clusters = []  # dicts: parent idx, leaf, events

    def walk(n, ci):
        w, l, r = nodes[n]
        cl, cr = len(points(l)), len(points(r))
        if cl >= m and cr >= m:
            clusters[ci]["leaf"] = False
            for child in (l, r):
                clusters.append({"parent": ci, "leaf": True, "events": []})
                walk(child, len(clusters) - 1)
        elif cl < m and cr < m:
            clusters[ci]["events"].extend((w, p) for p in points(n))
        else:
            small, big = (l, r) if cl < m else (r, l)
            clusters[ci]["events"].extend((w, p) for p in points(small))
            walk(big, ci)

    seen = set()
    for x in list(parent):
        rt = find(x)
        if rt in seen or rt not in top:
            continue
        seen.add(rt)
        if len(points(top[rt])) >= m:
            clusters.append({"parent": None, "leaf": True, "events": []})
            walk(top[rt], len(clusters) - 1)
    # subtree min fall level: fold each cluster's own min into every
    # ancestor (children were appended after parents, so reverse order
    # finalizes leaves first)
    minw = [min((w for w, _p in c["events"]), default=None) for c in clusters]
    for i in range(len(clusters) - 1, -1, -1):
        p = clusters[i]["parent"]
        if p is not None and minw[i] is not None:
            minw[p] = minw[i] if minw[p] is None else min(minw[p], minw[i])
    out = {}
    for i, c in enumerate(clusters):
        if not c["events"]:
            continue
        label = min(p for _w, p in c["events"])
        for w, p in c["events"]:
            lam_max = 1.0 / math.sqrt(1.0 + minw[i])
            lam_p = 1.0 / math.sqrt(1.0 + w)
            out[p] = (label, w, minw[i], int(c["leaf"]), 1.0 - lam_max / lam_p)
    return out


def test_hdbscan_glosh_matches_descending_reference(spark):
    """GLOSH scores from the ascending one-pass sweep equal the
    top-down parent-tracked reference on random tied MSFs — subtree
    λ_max propagation, labels, leaf flags and BIT-EXACT scores; noise
    shed from internal clusters must appear (leaf = 0 rows)."""
    from flink_essentials_spark.functions.graph import boruvka_mst, hdbscan_glosh

    rng = random.Random(4099)
    saw_internal = False
    for m in (2, 3, 4):
        n = rng.randint(22, 36)
        d = {}
        for _ in range(n * 2):
            a, b = rng.sample(range(1, n + 1), 2)
            d[(min(a, b), max(a, b))] = rng.randint(1, 5)
        edges = [(a, b, w) for (a, b), w in d.items()]
        mst, _ = _kruskal_reference(edges)
        want = _glosh_reference(mst, m)
        got = {
            r.pid: (r.label, r.w_fall, r.w_peak, r.leaf, r.score)
            for r in hdbscan_glosh(
                boruvka_mst(
                    spark.createDataFrame(edges, "a long, b long, w long")
                ),
                m,
            ).collect()
        }
        assert got == want, m
        saw_internal = saw_internal or any(v[3] == 0 for v in got.values())
    assert saw_internal  # the reference corpus exercised internal clusters


def test_optics_order_golden_forest(spark):
    """optics_order on a hand-built two-component forest: per
    component the walk is Prim from the root (= comp = min node) with
    the smallest (w, a, b) frontier edge admitted each step, ord =
    admission rank, root reach = -1. Component B's chain forces the
    frontier rule (the w=1 far edge must wait until its endpoint is
    reached)."""
    from flink_essentials_spark.functions.graph import optics_order

    # comp 1: star 1-(2,w5) 1-(3,w2) plus 3-(4,w9)
    # comp 10: chain 10-(11,w8)-(12,w1): the w=1 edge is NOT admissible
    # until 11 is visited, so order is 11 (reach 8) then 12 (reach 1)
    edges = [
        (1, 2, 5, 1),
        (1, 3, 2, 1),
        (3, 4, 9, 1),
        (10, 11, 8, 10),
        (11, 12, 1, 10),
    ]
    df = spark.createDataFrame(
        edges, "a long, b long, w long, comp long"
    )
    got = sorted(
        (r.pid, r.comp, r.ord, r.reach)
        for r in optics_order(df).collect()
    )
    want = sorted(
        [
            (1, 1, 0, -1),
            (3, 1, 1, 2),
            (2, 1, 2, 5),
            (4, 1, 3, 9),
            (10, 10, 0, -1),
            (11, 10, 1, 8),
            (12, 10, 2, 1),
        ]
    )
    assert got == want
