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
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    # union-find roots are already min-of-component because unions
    # always parent the larger root under the smaller one
    assert got == _union_find_reference(edges)


def test_two_triangles_and_a_bridge(spark):
    _run(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)])


def test_disjoint_components(spark):
    _run(spark, [(5, 6), (7, 8), (9, 5), (100, 200)])


def test_long_chain_converges(spark):
    # path graph: worst case for label propagation (diameter rounds)
    _run(spark, [(i, i + 1) for i in range(30)])


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        nodes = list(range(trial * 1000, trial * 1000 + 60))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(40)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _run(spark, edges)
