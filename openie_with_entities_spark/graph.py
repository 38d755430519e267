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
