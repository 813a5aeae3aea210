"""Connected components vs a driver-side union-find oracle, including
shapes the dedup data doesn't exercise (long chains, rings, isolates)."""

from __future__ import annotations

import pytest

import random

from kwwhat_spark.operators.graph import connected_components, dedup_keepers


def _union_find(edges):
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
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    want = _union_find(edges)
    # Default path: small graphs take the bounded-driver union-find.
    got = {r.node: r.component for r in connected_components(df, "a", "b").collect()}
    assert got == want
    # Distributed pointer-jumping path (the >threshold scale path),
    # forced by disabling the local closure.
    got_dist = {
        r.node: r.component
        for r in connected_components(df, "a", "b", local_max_edge_rows=0).collect()
    }
    assert got_dist == want


@pytest.mark.full
def test_chain_ring_and_triangles(spark):
    chain = [(i, i + 1) for i in range(0, 20)]          # diameter 20
    ring = [(100 + i, 100 + (i + 1) % 7) for i in range(7)]
    triangle = [(200, 201), (201, 202), (200, 202)]
    _check(spark, chain + ring + triangle)


@pytest.mark.full
def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_dedup_keepers_triangle_keeps_exactly_one(spark):
    # Pairwise "drop the higher id of each pair" would drop 2 and 3 AND
    # leave nothing correct to blame; closure keeps exactly min(cluster).
    pairs = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (10, 11)],
                                  "doc_a long, doc_b long")
    rows = dedup_keepers(pairs, "doc_a", "doc_b").collect()
    keepers = sorted(r.doc_id for r in rows if r.is_keeper)
    assert keepers == [1, 10]
    comps = {r.doc_id: r.component for r in rows}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_pagerank_quantized_star_graph(spark):
    from kwwhat_spark.operators.graph import pagerank_quantized

    # Star: node 0 at the center of 1..6 — highest rank, leaves all equal.
    edges = spark.createDataFrame([(0, i) for i in range(1, 7)], "a long, b long")
    ranks = {r["node"]: r["rank_q"] for r in pagerank_quantized(edges, "a", "b", iterations=5).collect()}
    assert len(ranks) == 7
    leaves = {ranks[i] for i in range(1, 7)}
    assert len(leaves) == 1, "symmetric leaves must have identical integer ranks"
    assert ranks[0] > ranks[1]
    total = sum(ranks.values())
    assert abs(total - 10**12) < 10**7, "mass drift should be bounded by floor shaving"


def test_pagerank_quantized_is_deterministic_across_runs(spark):
    from kwwhat_spark.operators.graph import pagerank_quantized

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 23) for i in range(40)], "a long, b long"
    ).filter("a != b")
    r1 = sorted(map(tuple, pagerank_quantized(edges, "a", "b", iterations=3).collect()))
    r2 = sorted(map(tuple, pagerank_quantized(edges.repartition(7), "a", "b", iterations=3).collect()))
    assert r1 == r2


def test_select_representatives_quality_policy(spark):
    from kwwhat_spark.operators.graph import select_representatives

    # Components {1,2,3} (chain) and {10,11}; scores make 3 the best in
    # the first cluster; 10 and 11 tie -> min id wins.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 12), (10, 7), (11, 7)], "doc_id long, score long"
    )
    rows = select_representatives(pairs, "doc_a", "doc_b", scores, "doc_id", "score").collect()
    keepers = sorted(r.doc_id for r in rows if r.is_keeper)
    assert keepers == [3, 10]
    comps = {r.doc_id: r.component for r in rows}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert len(rows) == 5


def test_select_representatives_string_ids(spark):
    # Regression: the keeper tie-break used -col(node), which casts
    # string ids to double -> null and silently marks nobody a keeper.
    from kwwhat_spark.operators.graph import select_representatives

    pairs = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c"), ("doc-x", "doc-y")],
        "doc_a string, doc_b string",
    )
    scores = spark.createDataFrame(
        [("doc-a", 5), ("doc-b", 9), ("doc-c", 12), ("doc-x", 7), ("doc-y", 7)],
        "doc_id string, score long",
    )
    rows = select_representatives(pairs, "doc_a", "doc_b", scores, "doc_id", "score").collect()
    keepers = sorted(r.doc_id for r in rows if r.is_keeper)
    assert keepers == ["doc-c", "doc-x"]  # best score; tie -> min id
    assert all(r.is_keeper is not None for r in rows)


def test_star_components_matches_union_find_on_random_buckets(spark):
    """star_components' root-contraction must equal plain union-find on
    the same star edge list. Buckets are random subsets with root =
    bucket min (the LSH shape: every member's root <= member), chained
    so clusters span multiple buckets; includes roots that never appear
    as members and pair-only buckets."""
    from kwwhat_spark.operators.graph import star_components

    rng = random.Random(11)
    edges = []
    for _ in range(40):
        members = rng.sample(range(120), rng.randrange(2, 7))
        r = min(members)
        edges += [(m, r) for m in members if m != r]
    edges = sorted(set(edges))
    df = spark.createDataFrame(edges, "doc long, root long")
    want = _union_find(edges)
    got = {r.node: r.component
           for r in star_components(df, "doc", "root").collect()}
    assert got == want
    got_dist = {
        r.node: r.component
        for r in star_components(df, "doc", "root", local_max_edge_rows=0).collect()
    }
    assert got_dist == want


def test_star_components_relabels_unseen_root_through_member_path(spark):
    """A root that is the minimum of every bucket it anchors never
    appears as a member, but a shared member can still pull it into a
    lower-rooted component — the union branch must carry its label."""
    from kwwhat_spark.operators.graph import star_components

    # bucket A = {5, 9} root 5; bucket B = {1, 9} root 1.
    # 9 connects 5 and 1; component min = 1, and 5 never appears as a
    # member row.
    edges = [(9, 5), (9, 1)]
    df = spark.createDataFrame(edges, "doc long, root long")
    got = {r.node: r.component
           for r in star_components(df, "doc", "root").collect()}
    assert got == {9: 1, 5: 1, 1: 1} == _union_find(edges)
