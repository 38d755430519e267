"""KG consumer queries over the materialized graph-edge table.

``canonicalize.materialize_graph`` emits the deduplicated weighted edge
table ``(src_entity, predicate, dst_entity, n_mentions, n_convs,
max_confidence)``; these operators are what a knowledge-graph user runs
against it (the reference stops at emitting triples — these are the
engine's first-class graph surface, sized for an entity-pair-bounded
table that is orders of magnitude smaller than the 10^12-turn input).

Scale shape (shared discipline: every iterated join's STATIC big side —
adjacency / links / oriented edges — is ``repartition(join_key).persist()``
rather than localCheckpoint, because ``InMemoryRelation`` preserves
outputPartitioning where LogicalRDD does not: the big table shuffles ONCE,
and each iteration shuffles only the small iterating side.  The small
iterating tables still ``localCheckpoint`` per round to keep plans flat;
caches are released before return.  Plan evidence in PLANS.md Round-6):
  * ``khop_neighborhood`` — k bounded small (≤ a handful); each hop
    shuffles ONLY the frontier against the cached src-partitioned
    adjacency plus one anti-join on the visited set; frontier/visited
    carry only (seed, entity, hop) ids, never text.
  * ``top_entities_by_degree`` — stack both endpoints, one map-combinable
    groupBy, then sort-limit (TakeOrderedAndProject: per-partition top-k,
    no global sort).
  * ``pagerank`` — classic pregel shape: each iteration is ONE equi-join
    (cached src-partitioned links ⋈ checkpointed ranks) + ONE
    map-combinable groupBy on the destination id; out_deg aggregates
    exchange-free off the same cached partitioning, and the only
    per-iteration shuffle carries (entity, double).  Hot entities skew
    the dst-side aggregate, but partial aggregation absorbs it
    (contributions combine map-side).  Measured 2.3× vs the
    checkpoint-only form (1M-edge random graph, 5 iterations, local[8]).
  * ``label_propagation`` — deterministic sync LPA (most-frequent
    neighbor label, ties → smallest): per iteration one join against the
    cached adjacency + two map-combinable aggregates over (entity, label)
    pairs; same cached-static-side / checkpointed-small-side discipline.
  * ``triangle_counts`` — degree-oriented (compact-forward) wedge join:
    each undirected edge is directed from its lower-(degree, id) endpoint
    to the higher, and wedges open only at the minimum-rank corner.  Wedge
    volume is Σ outdeg², bounded by O(m·α) (α = arboricity) instead of the
    naive Σ d(b)² — on a power-law KG entity graph (hot entities are
    guaranteed) the hub's d² wedge blow-up is designed out while counts
    stay exactly identical.
"""

from __future__ import annotations

import logging
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)


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
    # static big side of every hop's join: partition by the join key once
    # and cache (InMemoryRelation keeps the partitioning; localCheckpoint
    # would lose it) so each hop shuffles only the frontier. count()
    # materializes eagerly — an UNexecuted cached AQE plan reports unknown
    # partitioning and the first hop would re-shuffle it anyway. k=0 never
    # probes the adjacency: skip the scan/shuffle/persist entirely.
    if k > 0:
        adj = adj.repartition("a").persist()
        adj.count()
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
    if k > 0:
        adj.unpersist()  # visited is localCheckpointed — no lineage into adj
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
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    tol: float | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """PageRank over the materialized graph, GraphX convention: every node
    starts at rank 1.0 and each iteration sets
    ``rank(v) = (1-d) + d * Σ_{u→v} rank(u)/outdeg(u)`` (dangling mass
    leaks — ranks are NOT renormalized to sum to 1, exactly as GraphX).
    Multi-edges collapse to one distinct (src, dst) link per direction;
    self-loops contribute to their own node.  Emits (entity, rank) rounded
    to 4 dp for engine-stable comparison.

    Two stopping modes, mirroring GraphX's staticPageRank /
    runUntilConvergence pair:
      * ``tol=None`` (default) — exactly ``n_iter`` iterations, the
        oracle-matched production setting.
      * ``tol=ε`` — iterate until ``max|Δrank| < ε`` (checked driver-side
        from a one-row max-abs-delta aggregate per iteration — the rank
        table is already localCheckpointed, so the extra pass is one tiny
        job) or ``max_iter``, whichever first; logs the iteration count.

    Scale shape: the rank table is (entity, double) — orders of magnitude
    below the edge table; each iteration shuffles only ids+doubles with a
    map-combinable aggregate, and ``localCheckpoint`` per iteration keeps
    the plan flat at any iteration count."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    if tol is not None and tol <= 0:
        raise ValueError("tol must be > 0")
    # The link table is the BIG side and is static across iterations:
    # hash-partition it by the join key ONCE and cache — InMemoryRelation
    # preserves outputPartitioning (localCheckpoint's LogicalRDD does
    # not), so every iteration's links⋈ranks join reuses the cached
    # layout and shuffles ONLY the (entity, rank) side. out_deg inherits
    # the same src partitioning, so its aggregate and join are
    # exchange-free too. Verified in PLANS.md (one Exchange per
    # iteration on the rank side, none on links).
    links = (
        edges.select(
            F.col("src_entity").alias("src"), F.col("dst_entity").alias("dst")
        )
        .distinct()
        .repartition("src")
        .persist()
    )
    links.count()  # eager: unexecuted cached plans report unknown partitioning
    nodes = (
        links.select(F.col("src").alias("entity"))
        .unionByName(links.select(F.col("dst").alias("entity")))
        .distinct()
        .repartition("entity")
        .persist()
    )
    nodes.count()  # eager, as links
    out_deg = links.groupBy("src").agg(F.count("*").alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    rounds = n_iter if tol is None else max_iter
    it = 0
    for it in range(1, rounds + 1):
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
        new_ranks = (
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
        if tol is not None:
            delta = (
                new_ranks.join(
                    ranks.select("entity", F.col("rank").alias("_prev")),
                    "entity",
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("_prev"))).alias("d"))
                .collect()[0].d
            )
            if delta is not None and delta < tol:
                ranks = new_ranks
                break
        ranks = new_ranks
    if tol is not None:
        _LOG.info("pagerank converged: %d iterations (tol=%g)", it, tol)
    out = ranks.select("entity", F.round("rank", 4).alias("rank"))
    # drop the cached static tables; the final ranks are localCheckpointed
    # (n_iter ≥ 1) or recomputable from lineage (n_iter = 0)
    links.unpersist()
    nodes.unpersist()
    return out


def label_propagation(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """Synchronous label-propagation community detection over the
    undirected materialized graph (the GraphX ``LabelPropagation`` shape,
    made DETERMINISTIC): every node starts labeled with its own id; each
    iteration relabels every node with the most frequent label among its
    neighbors, ties broken by the SMALLEST label (GraphX leaves the tie
    nondeterministic — this engine pins it so results are stable across
    partitionings and oracle-checkable). Emits (entity, community) after
    exactly ``n_iter`` sync rounds. Self-loops are dropped (a node's own
    label must not vote); isolated nodes cannot appear in an edge table.

    Scale shape: same discipline as pagerank — the undirected adjacency is
    cached hash-partitioned on the probe key once; per iteration the only
    shuffled payload is (entity, label) pairs through one map-combinable
    count and one argmax (min over (-count, label) structs, itself
    map-combinable). ``localCheckpoint`` per iteration keeps plans flat."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    und = (
        _undirected(edges)
        .where(F.col("a") != F.col("b"))
        # partition on the JOIN key: the per-iteration join probes und.b
        # against labels.entity, so the cached layout must be hash(b) —
        # cached hash(a) re-shuffled the full edge table every iteration
        # (round-6 verdict finding; plan test pins the fixed layout)
        .repartition("b")
        .persist()
    )
    und.count()  # eager: expose the cached partitioning (see pagerank)
    labels = (
        # und is symmetric, so column b spans the node set too — and the
        # init distinct reuses the cached hash(b) layout exchange-free
        und.select(F.col("b").alias("entity"))
        .distinct()
        .withColumn("label", F.col("entity"))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        votes = (
            und.join(labels, und.b == labels.entity)
            .groupBy("a", "label")
            .agg(F.count("*").alias("cnt"))
        )
        labels = (
            votes.groupBy("a")
            # min over (-cnt, label): highest count, then smallest label
            .agg(F.min(F.struct((-F.col("cnt")).alias("_neg"), F.col("label"))).alias("_best"))
            .select(F.col("a").alias("entity"), F.col("_best.label").alias("label"))
            .localCheckpoint()
        )
    out = labels.select("entity", F.col("label").alias("community"))
    und.unpersist()
    return out


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-entity triangle participation: (entity, n_triangles) for every
    entity on ≥1 triangle of the undirected simple graph (self-loops and
    edge direction discarded).

    Degree-oriented (compact-forward) enumeration: every undirected edge
    is directed from its lower-rank endpoint to the higher, where rank =
    (degree, id) — a total order, so the orientation is acyclic.  Each
    triangle then has exactly ONE corner with two out-edges (its minimum-
    rank node), so the wedge join (u→v)⋈(u→w) on u with rank(v)<rank(w),
    semi-joined against the oriented closing edge (v→w), generates every
    triangle exactly once.  Counts are identical to the naive a<b wedge
    join; wedge volume drops from Σ d(b)² to Σ outdeg² ≤ O(m·α) because
    out-degrees are arboricity-bounded — a hub of degree d contributes
    d²/4 wedges naively but only O(α²) oriented wedges, since almost all
    of its edges point INTO it (its neighbors rank lower)."""
    und = (
        _undirected(edges)
        .where(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ranked = und.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # both wedge sides join on src: partition the oriented edge set by src
    # once and cache (partitioning survives InMemoryRelation, not
    # localCheckpoint), so the wedge self-join is exchange-free on both
    # inputs — only the (v, w) closing semi-join shuffles
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    ).repartition("src").persist()
    oriented.count()  # eager: see pagerank — exposes the cached partitioning
    o1 = oriented.select(
        "src", F.col("dst").alias("v"), F.col("dst_deg").alias("dv")
    )
    o2 = oriented.select(
        "src", F.col("dst").alias("w"), F.col("dst_deg").alias("dw")
    )
    wedges = o1.join(o2, "src").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tris = wedges.join(closing, ["v", "w"], "left_semi").select(
        F.col("src").alias("u"), "v", "w"
    )
    # one explode, not a 3-way union of corner projections: the union form
    # plants the wedge join THREE times in the plan (once per branch),
    # tripling the most expensive stage unless exchange reuse saves it
    corners = tris.select(
        F.explode(F.array("u", "v", "w")).alias("entity")
    )
    out = (
        corners.groupBy("entity")
        .agg(F.count("*").alias("n_triangles"))
        # eager: the per-entity counts are tiny; materializing them here
        # lets the cached oriented edge set be released immediately
        .localCheckpoint()
    )
    oriented.unpersist()
    return out
