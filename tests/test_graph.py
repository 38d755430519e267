"""KG graph consumer operators (graph.py) vs sequential BFS/degree twins."""

import random
from collections import deque

from openie_with_entities_spark.graph import (
    khop_neighborhood,
    top_entities_by_degree,
)

DDL = (
    "src_entity string, predicate string, dst_entity string, "
    "n_mentions long, n_convs long, max_confidence double"
)

FIXTURE = [
    ("E1", "founded", "E2", 5, 3, 0.9),
    ("E1", "acquired", "E3", 2, 2, 0.8),
    ("E2", "partnered with", "E3", 1, 1, 0.7),
    ("E3", "located in", "E4", 4, 2, 0.95),
    ("E4", "part of", "E5", 1, 1, 0.6),
    ("E6", "ceo of", "E1", 3, 1, 0.85),
    ("E7", "married to", "E8", 2, 2, 0.75),
    ("E5", "refers to", "E5", 1, 1, 0.5),
]


def _bfs(edges, seed, k, undirected=True):
    adj = {}
    for s, _, d, *_ in edges:
        adj.setdefault(s, set()).add(d)
        if undirected:
            adj.setdefault(d, set()).add(s)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] == k:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_khop_fixture_neighborhood(spark):
    edges = spark.createDataFrame(FIXTURE, DDL)
    got = {
        (r.seed, r.entity): r.hop
        for r in khop_neighborhood(edges, ["E1", "E7"], k=2).collect()
    }
    want = {
        ("E1", "E1"): 0, ("E1", "E2"): 1, ("E1", "E3"): 1, ("E1", "E6"): 1,
        ("E1", "E4"): 2, ("E7", "E7"): 0, ("E7", "E8"): 1,
    }
    assert got == want


def test_khop_directed_follows_src_to_dst_only(spark):
    edges = spark.createDataFrame(FIXTURE, DDL)
    got = {
        (r.seed, r.entity): r.hop
        for r in khop_neighborhood(
            edges, ["E1"], k=3, undirected=False
        ).collect()
    }
    # E6→E1 is not reachable FROM E1 directed
    want = {
        ("E1", "E1"): 0, ("E1", "E2"): 1, ("E1", "E3"): 1,
        ("E1", "E4"): 2, ("E1", "E5"): 3,
    }
    assert got == want


def test_khop_k0_and_early_stop(spark):
    edges = spark.createDataFrame(FIXTURE, DDL)
    got = khop_neighborhood(edges, ["E7"], k=0).collect()
    assert [(r.seed, r.entity, r.hop) for r in got] == [("E7", "E7", 0)]
    # frontier exhausts before k: the isolated pair stops expanding at hop 1
    got = khop_neighborhood(edges, ["E7"], k=10).collect()
    assert {(r.entity, r.hop) for r in got} == {("E7", 0), ("E8", 1)}


def test_khop_matches_bfs_on_random_graph(spark):
    rng = random.Random(5)
    nodes = [f"N{i}" for i in range(40)]
    edges = [
        (rng.choice(nodes), "r", rng.choice(nodes), 1, 1, 0.5)
        for _ in range(120)
    ]
    df = spark.createDataFrame(edges, DDL).repartition(7)
    seeds = ["N0", "N7", "N13"]
    got = {
        (r.seed, r.entity): r.hop
        for r in khop_neighborhood(df, seeds, k=3).collect()
    }
    want = {
        (s, n): h for s in seeds for n, h in _bfs(edges, s, 3).items()
    }
    assert got == want


def test_degree_topk_weighted_with_tiebreak(spark):
    edges = spark.createDataFrame(FIXTURE, DDL)
    rows = top_entities_by_degree(edges, topk=5).collect()
    assert [(r.entity, r.out_deg, r.in_deg, r.degree) for r in rows] == [
        ("E1", 2, 1, 10),
        ("E3", 1, 2, 7),
        ("E2", 1, 1, 6),
        ("E4", 1, 1, 5),
        ("E5", 1, 2, 3),  # ties E6 at 3; entity asc keeps E5
    ]


def test_degree_topk_unweighted(spark):
    edges = spark.createDataFrame(FIXTURE, DDL)
    rows = top_entities_by_degree(edges, topk=3, weighted=False).collect()
    # self-loop E5→E5 counts on both ends: E5 is 3-incident like E1/E3
    assert [(r.entity, r.degree) for r in rows] == [
        ("E1", 3), ("E3", 3), ("E5", 3),
    ]
