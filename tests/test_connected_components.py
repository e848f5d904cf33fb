"""Distributed connected components vs a single-threaded union-find oracle
(the classic check for the large-star/small-star formulation)."""

from __future__ import annotations

import random


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark):
    from document_ai_spark.operators.dedup import connected_components

    rng = random.Random(11)
    # several shapes: chains, stars, cliques, singleton pairs, random
    edges = set()
    for base in (0, 100, 200):
        chain = [base + i for i in range(12)]
        edges.update(zip(chain, chain[1:]))                    # long chain
    for hub in (300, 400):
        edges.update((hub, hub + i) for i in range(1, 9))      # stars
    clique = [500 + i for i in range(6)]
    edges.update((a, b) for a in clique for b in clique if a < b)
    edges.update((600 + 2 * i, 601 + 2 * i) for i in range(10))  # pairs
    for _ in range(150):                                        # random
        a, b = rng.randrange(700, 760), rng.randrange(700, 760)
        if a != b:
            edges.add((min(a, b), max(a, b)))

    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {
        r.id: r.component
        for r in connected_components(df).collect()
    }
    want = _union_find_components(sorted(edges))
    assert got == want


def test_resolve_duplicate_groups(spark):
    from document_ai_spark.operators.dedup import resolve_duplicate_groups

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    rows = {(r.id, r.component, r.is_canonical) for r in resolve_duplicate_groups(pairs).collect()}
    assert rows == {
        (1, 1, True), (2, 1, False), (3, 1, False),
        (10, 10, True), (11, 10, False),
        (20, 20, True), (21, 20, False), (22, 20, False),
    }
