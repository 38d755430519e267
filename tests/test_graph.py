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


# --- pagerank / triangle_counts vs sequential twins ------------------------

FIXTURE2 = [
    ("A", "r1", "B", 1, 1, 0.9),
    ("B", "r2", "C", 2, 1, 0.8),
    ("A", "r3", "C", 1, 1, 0.7),
    ("C", "r4", "D", 3, 2, 0.95),
    ("D", "r5", "A", 1, 1, 0.6),
    ("D", "r6", "E", 2, 1, 0.85),
    ("E", "r7", "C", 1, 1, 0.75),
    ("E", "r8", "F", 1, 1, 0.5),
    ("G", "r9", "G", 1, 1, 0.4),
    ("F", "r10", "A", 2, 1, 0.65),
]


def _pagerank_seq(edge_rows, n_iter=3, d=0.85):
    links = sorted({(s, t) for s, _, t, *_ in edge_rows})
    nodes = sorted({n for e in links for n in e})
    out = {}
    for s, _ in links:
        out[s] = out.get(s, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(n_iter):
        contrib = {n: 0.0 for n in nodes}
        for s, t in links:
            contrib[t] += rank[s] / out[s]
        rank = {n: (1 - d) + d * contrib[n] for n in nodes}
    return {n: round(r, 4) for n, r in rank.items()}


def _triangles_seq(edge_rows):
    und = {
        (min(s, t), max(s, t))
        for s, _, t, *_ in edge_rows
        if s != t
    }
    counts = {}
    und_l = sorted(und)
    for a, b in und_l:
        for b2, c in und_l:
            if b2 == b and b < c and (a, c) in und:
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    return counts


def test_pagerank_fixture(spark):
    from openie_with_entities_spark.graph import pagerank

    edges = spark.createDataFrame(FIXTURE2, DDL)
    got = {r.entity: r.rank for r in pagerank(edges, n_iter=3).collect()}
    assert got == _pagerank_seq(FIXTURE2)
    # dangling G (self-loop only, still has out-edge) keeps rank mass;
    # every node present exactly once
    assert sorted(got) == ["A", "B", "C", "D", "E", "F", "G"]


def test_pagerank_random_graph_matches_sequential(spark):
    rng = random.Random(77)
    nodes = [f"N{i}" for i in range(12)]
    edge_rows = [
        (rng.choice(nodes), "r", rng.choice(nodes), 1, 1, 0.5)
        for _ in range(40)
    ]
    edges = spark.createDataFrame(edge_rows, DDL)
    got = {r.entity: r.rank for r in pagerank_import(edges, n_iter=4).collect()}
    assert got == _pagerank_seq(edge_rows, n_iter=4)


def pagerank_import(edges, **kw):
    from openie_with_entities_spark.graph import pagerank

    return pagerank(edges, **kw)


def test_pagerank_zero_iter_is_uniform_one(spark):
    edges = spark.createDataFrame(FIXTURE2, DDL)
    got = {r.entity: r.rank for r in pagerank_import(edges, n_iter=0).collect()}
    assert set(got.values()) == {1.0}


def test_triangle_counts_fixture(spark):
    from openie_with_entities_spark.graph import triangle_counts

    edges = spark.createDataFrame(FIXTURE2, DDL)
    got = {r.entity: r.n_triangles for r in triangle_counts(edges).collect()}
    # triangles ABC, ACD, CDE; self-loop G and pendant chain excluded
    assert got == {"A": 2, "B": 1, "C": 3, "D": 2, "E": 1}
    assert got == _triangles_seq(FIXTURE2)


def test_triangle_counts_random_graph_matches_sequential(spark):
    from openie_with_entities_spark.graph import triangle_counts

    rng = random.Random(31)
    nodes = [f"N{i}" for i in range(10)]
    edge_rows = [
        (rng.choice(nodes), "r", rng.choice(nodes), 1, 1, 0.5)
        for _ in range(35)
    ]
    edges = spark.createDataFrame(edge_rows, DDL)
    got = {r.entity: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == _triangles_seq(edge_rows)


def test_triangle_counts_hub_skew(spark, steal_ratio):
    """Power-law skew defense: one hub of degree 20,000 (a guaranteed
    shape on a KG entity graph).  The naive a<b wedge join generates
    C(20000,2) ≈ 2×10⁸ wedges at the hub; degree orientation points every
    hub edge INTO the hub (its neighbors all rank lower), so the hub opens
    zero wedges and the job stays seconds, not minutes.  Counts are
    analytic: hub H + leaves L0..L19999, chain edges L_i–L_{i+1} for
    i<1000 — each chain edge closes exactly one triangle with H."""
    import time

    from openie_with_entities_spark.graph import triangle_counts
    from openie_with_entities_spark.noise import CLEAN_THRESHOLD

    n_leaves, n_chain = 20_000, 1_000
    star = spark.range(n_leaves).selectExpr(
        "'H' AS src_entity",
        "'r' AS predicate",
        "concat('L', id) AS dst_entity",
        "1L AS n_mentions",
        "1L AS n_convs",
        "0.5 AS max_confidence",
    )
    chain = spark.range(n_chain).selectExpr(
        "concat('L', id) AS src_entity",
        "'r' AS predicate",
        "concat('L', id + 1) AS dst_entity",
        "1L AS n_mentions",
        "1L AS n_convs",
        "0.5 AS max_confidence",
    )
    t0 = time.monotonic()
    got = {
        r.entity: r.n_triangles
        for r in triangle_counts(star.unionByName(chain)).collect()
    }
    wall = time.monotonic() - t0
    expected = {"H": n_chain, "L0": 1, f"L{n_chain}": 1}
    expected.update({f"L{i}": 2 for i in range(1, n_chain)})
    assert got == expected
    bound = 60.0 * (steal_ratio if steal_ratio > CLEAN_THRESHOLD else 1.0)
    assert wall < bound, (
        f"hub-skew triangles too slow: {wall:.1f}s (bound {bound:.0f}s at "
        f"steal ratio {steal_ratio:.2f})"
    )


def test_pagerank_tolerance_converges_to_fixed_point(spark, caplog):
    """runUntilConvergence twin: at eps=1e-6 the converged ranks equal a
    deep fixed-iteration run at the 4-dp output rounding, and the
    iteration count is logged (graph.py's driver-side delta check)."""
    import logging

    from openie_with_entities_spark.graph import pagerank

    edges = spark.createDataFrame(FIXTURE2, DDL)
    with caplog.at_level(logging.INFO, logger="openie_with_entities_spark.graph"):
        converged = {
            r.entity: r.rank for r in pagerank(edges, tol=1e-6).collect()
        }
    deep = {r.entity: r.rank for r in pagerank(edges, n_iter=120).collect()}
    assert converged == deep
    assert any("pagerank converged" in m for m in caplog.messages)
    # tol validation
    import pytest

    with pytest.raises(ValueError):
        pagerank(edges, tol=0.0)


def test_pagerank_tolerance_respects_max_iter(spark):
    from openie_with_entities_spark.graph import pagerank

    edges = spark.createDataFrame(FIXTURE2, DDL)
    # max_iter=2 cuts off before convergence → equals the 2-iter fixed run
    # (compared engine-vs-engine: the sequential twin can land on the other
    # side of a 4-dp rounding boundary from Spark's summation order)
    capped = {
        r.entity: r.rank
        for r in pagerank(edges, tol=1e-12, max_iter=2).collect()
    }
    fixed2 = {r.entity: r.rank for r in pagerank(edges, n_iter=2).collect()}
    assert capped == fixed2
    seq = _pagerank_seq(FIXTURE2, n_iter=2)
    assert capped.keys() == seq.keys()
    assert all(abs(capped[n] - seq[n]) <= 1e-4 for n in seq)


def _lpa_seq(edge_rows, n_iter):
    """Sequential twin: sync LPA, most-frequent neighbor label, tie -> min."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edge_rows:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n in adj:
            c = Counter(labels[m] for m in adj[n])
            top = max(c.values())
            new[n] = min(l for l, k in c.items() if k == top)
        labels = new
    return labels


def test_label_propagation_two_communities(spark):
    from openie_with_entities_spark.graph import label_propagation

    rows = [
        ("A", "p", "B", 1, 1, 1.0), ("B", "p", "C", 1, 1, 1.0),
        ("C", "p", "A", 1, 1, 1.0), ("D", "p", "E", 1, 1, 1.0),
        ("C", "p", "C", 1, 1, 1.0),  # self-loop: dropped
    ]
    edges = spark.createDataFrame(rows, DDL)
    got = {r.entity: r.community for r in label_propagation(edges, n_iter=4).collect()}
    seq = _lpa_seq([(r[0], r[2]) for r in rows], 4)
    assert got == seq
    # the triangle converges to its min id; the pair oscillates or settles
    assert got["A"] == got["B"] == got["C"] == "A"
    assert set(got) == {"A", "B", "C", "D", "E"}


def test_label_propagation_matches_sequential_on_random_graph(spark):
    import random

    from openie_with_entities_spark.graph import label_propagation

    random.seed(66)
    rows = [
        (f"N{random.randrange(40)}", "p", f"N{random.randrange(40)}", 1, 1, 1.0)
        for _ in range(120)
    ]
    edges = spark.createDataFrame(rows, DDL)
    for n_iter in (0, 1, 3):
        got = {
            r.entity: r.community
            for r in label_propagation(edges, n_iter=n_iter).collect()
        }
        assert got == _lpa_seq([(r[0], r[2]) for r in rows], n_iter), n_iter
    # partitioning invariance
    got1 = {
        r.entity: r.community
        for r in label_propagation(edges.repartition(1), n_iter=3).collect()
    }
    got13 = {
        r.entity: r.community
        for r in label_propagation(edges.repartition(13), n_iter=3).collect()
    }
    assert got1 == got13


def test_label_propagation_validation(spark):
    import pytest

    from openie_with_entities_spark.graph import label_propagation

    edges = spark.createDataFrame([("A", "p", "B", 1, 1, 1.0)], DDL)
    with pytest.raises(ValueError):
        label_propagation(edges, n_iter=-1)
