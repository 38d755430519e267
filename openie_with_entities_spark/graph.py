"""KG consumer queries over the materialized graph-edge table.

``canonicalize.materialize_graph`` emits the deduplicated weighted edge
table ``(src_entity, predicate, dst_entity, n_mentions, n_convs,
max_confidence)``; these operators are what a knowledge-graph user runs
against it (the reference stops at emitting triples — these are the
engine's first-class graph surface, sized for an entity-pair-bounded
table that is orders of magnitude smaller than the 10^12-turn input).

Scale shape:
  * ``khop_neighborhood`` — k bounded small (≤ a handful); each hop is ONE
    equi-join shuffle keyed on the frontier entity plus one anti-join on
    the visited set; the frontier/visited tables carry only
    (seed, entity, hop) ids, never text.  ``localCheckpoint`` cuts the
    per-hop lineage so plans stay flat.  Seeds are typically a small
    dimension → Spark broadcasts the first hop automatically under AQE.
  * ``top_entities_by_degree`` — stack both endpoints, one map-combinable
    groupBy, then sort-limit (TakeOrderedAndProject: per-partition top-k,
    no global sort).
  * ``pagerank`` — classic pregel shape: each iteration is ONE equi-join
    (ranks ⋈ out-edges on the source id) + ONE map-combinable groupBy on
    the destination id; the rank table carries (entity, rank) only.
    ``localCheckpoint`` per iteration cuts lineage so the plan stays flat
    at any iteration count.  Hot entities skew the dst-side aggregate, but
    partial aggregation absorbs it (contributions combine map-side).
  * ``triangle_counts`` — canonical a<b undirected edge set, then the
    standard two-join wedge-close: (a,b)⋈(b,c) with a<b<c semi-joined
    against the edge set.  Both joins key on entity ids; the a<b<c
    ordering means every triangle is generated exactly once.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame) -> DataFrame:
    a = edges.select(F.col("src_entity").alias("a"), F.col("dst_entity").alias("b"))
    return a.unionByName(
        edges.select(F.col("dst_entity").alias("a"), F.col("src_entity").alias("b"))
    ).distinct()


def khop_neighborhood(
    edges: DataFrame,
    seeds: DataFrame | Iterable[str],
    k: int = 2,
    undirected: bool = True,
) -> DataFrame:
    """BFS neighborhood: (seed, entity, hop) with hop = MINIMUM distance
    from the seed, hop 0 = the seed itself, expanded ``k`` hops.

    ``seeds`` is a one-column DataFrame (``seed``) or an iterable of
    entity ids.  ``undirected=False`` follows src→dst direction only."""
    if k < 0:
        raise ValueError("k must be >= 0")
    spark = edges.sparkSession
    if not isinstance(seeds, DataFrame):
        seeds = spark.createDataFrame([(s,) for s in seeds], "seed string")
    adj = (
        _undirected(edges)
        if undirected
        else edges.select(
            F.col("src_entity").alias("a"), F.col("dst_entity").alias("b")
        ).distinct()
    )
    frontier = seeds.select(
        "seed", F.col("seed").alias("entity"), F.lit(0).alias("hop")
    ).distinct()
    visited = frontier.localCheckpoint()
    frontier = visited
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(adj, frontier.entity == adj.a)
            .select("seed", F.col("b").alias("entity"))
            .distinct()
            .join(visited.select("seed", "entity"), ["seed", "entity"], "left_anti")
            .select("seed", "entity", F.lit(hop).alias("hop"))
        )
        nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def top_entities_by_degree(
    edges: DataFrame, topk: int = 10, weighted: bool = True
) -> DataFrame:
    """Top-k entities by (weighted) degree over the materialized graph:
    (entity, out_deg, in_deg, degree) where degree = Σ n_mentions over
    incident edges when ``weighted`` (self-loops count on both ends),
    else the incident-edge count.  Deterministic order: degree desc,
    entity asc (the tie-break makes the top-k reproducible)."""
    w = F.col("n_mentions") if weighted else F.lit(1)
    ends = edges.select(
        F.col("src_entity").alias("entity"),
        w.alias("w"),
        F.lit(1).alias("is_out"),
    ).unionByName(
        edges.select(
            F.col("dst_entity").alias("entity"),
            w.alias("w"),
            F.lit(0).alias("is_out"),
        )
    )
    deg = ends.groupBy("entity").agg(
        F.sum("is_out").alias("out_deg"),
        F.sum(1 - F.col("is_out")).alias("in_deg"),
        F.sum("w").alias("degree"),
    )
    return deg.orderBy(F.col("degree").desc(), F.col("entity").asc()).limit(topk)


def pagerank(
    edges: DataFrame, n_iter: int = 3, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank over the materialized graph, GraphX
    ``staticPageRank`` convention: every node starts at rank 1.0 and each
    iteration sets ``rank(v) = (1-d) + d * Σ_{u→v} rank(u)/outdeg(u)``
    (dangling mass leaks — ranks are NOT renormalized to sum to 1, exactly
    as GraphX's static variant).  Multi-edges collapse to one distinct
    (src, dst) link per direction; self-loops contribute to their own
    node.  Emits (entity, rank) rounded to 4 dp for engine-stable
    comparison.

    Scale shape: the rank table is (entity, double) — orders of magnitude
    below the edge table; each iteration shuffles only ids+doubles.  A
    fixed small ``n_iter`` (the production setting — rank orderings
    stabilize in a handful of iterations) bounds total cost at
    n_iter × (1 join + 1 agg)."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    links = (
        edges.select(
            F.col("src_entity").alias("src"), F.col("dst_entity").alias("dst")
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        links.select(F.col("src").alias("entity"))
        .unionByName(links.select(F.col("dst").alias("entity")))
        .distinct()
        .localCheckpoint()
    )
    out_deg = links.groupBy("src").agg(F.count("*").alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        contribs = (
            links.join(ranks, links.src == ranks.entity)
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("entity"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("entity")
            .agg(F.sum("contrib").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "entity", "left")
            .select(
                "entity",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("entity", F.round("rank", 4).alias("rank"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-entity triangle participation: (entity, n_triangles) for every
    entity on ≥1 triangle of the undirected simple graph (self-loops and
    edge direction discarded).  Canonical a<b edge set, wedges closed by
    joining (a,b)⋈(b,c) with a<b<c, then a semi-join back onto the edge
    set for the closing (a,c) edge — each triangle is generated exactly
    once, then contributes to all three corners."""
    und = (
        _undirected(edges)
        .where(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    ab = und.select(F.col("a"), F.col("b"))
    bc = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = und.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tris = (
        ab.join(bc, "b")
        .join(
            ac,
            (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
            "left_semi",
        )
        .select("a", "b", "c")
    )
    corners = (
        tris.select(F.col("a").alias("entity"))
        .unionByName(tris.select(F.col("b").alias("entity")))
        .unionByName(tris.select(F.col("c").alias("entity")))
    )
    return corners.groupBy("entity").agg(F.count("*").alias("n_triangles"))
