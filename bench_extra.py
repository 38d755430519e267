"""Round-7 extra benchmarks (bench.py is frozen for measurement — this file
holds the NEW evidence runs; results cited in OPTIMIZATION_r07.md):

  * graph-consumer 10x decade (VERDICT r6 "Next round" item 2):
    pagerank / label_propagation (post-fix) / triangle_counts /
    khop_neighborhood over deterministic power-law edge tables at 100k and
    1M edges (hub included by construction), same 32 cores — per-decade
    wall ratio <= 10 is the linear-scaling witness, exactly like
    BENCH_decade_r04 did for the document operators.
  * host-steal probes bracket the run (noise.py), same protocol as the
    round-6 scaling artifacts.

Usage: python bench_extra.py [out_json]   (default BENCH_decade_r07.json)
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from openie_with_entities_spark.noise import measure_steal
from openie_with_entities_spark.session import get_spark
from openie_with_entities_spark import graph


def powerlaw_edges(spark, n_edges: int, n_nodes: int):
    """Deterministic skewed edge table: dst ids are cubed-uniform (dense at
    low ids — node E0 is a guaranteed hub), src ids uniform. Derived purely
    from xxhash64 over a range, so the same table materializes at any
    parallelism."""
    ids = spark.range(n_edges)
    h1 = F.abs(F.xxhash64(F.col("id")))
    h2 = F.abs(F.xxhash64(F.col("id") * 2 + 1))
    u = (h2 % 100_000) / 100_000.0
    dst = F.floor(F.lit(n_nodes) * F.pow(u, F.lit(3.0))).cast("long")
    return ids.select(
        F.concat(F.lit("E"), (h1 % n_nodes).cast("string")).alias("src_entity"),
        F.lit("knows").alias("predicate"),
        F.concat(F.lit("E"), dst.cast("string")).alias("dst_entity"),
        F.lit(1.0).alias("confidence"),
        F.lit(1).alias("n_conversations"),
        (h1 % 3 + 1).cast("int").alias("n_mentions"),
    )


def timed_op(op, edges) -> float:
    """Wall of the WHOLE operator: the graph consumers drive their
    iterations eagerly (localCheckpoint per round), so the op() call does
    the work and the noop write forces whatever lazily remains."""
    t0 = time.monotonic()
    op(edges).write.mode("overwrite").format("noop").save()
    return round(time.monotonic() - t0, 2)


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "BENCH_decade_r07.json"
    spark = get_spark("bench_extra", cores=None)
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores * 3, numPartitions=cores * 3).mapInPandas(
        lambda it: it, "id long"
    ).count()
    probe_before = str(measure_steal())

    sizes = {"1x": 100_000, "10x": 1_000_000}
    tables = {}
    for tag, n in sizes.items():
        t = powerlaw_edges(spark, n, n // 10).localCheckpoint()
        tables[tag] = t

    ops = {
        "kg_pagerank_3it": lambda e: graph.pagerank(e, n_iter=3),
        "kg_lpa_3it": lambda e: graph.label_propagation(e, n_iter=3),
        "kg_triangles": lambda e: graph.triangle_counts(e),
        "kg_khop_k2": lambda e: graph.khop_neighborhood(
            e, ["E0", "E1", "E2"], k=2
        ),
    }
    results = {}
    for name, op in ops.items():
        secs = {}
        for tag, t in tables.items():
            spark.sparkContext.setJobDescription(f"{name}@{tag}")
            # min of 2: the box's neighbor noise produces 2-3x flukes
            secs[tag] = min(timed_op(op, t) for _ in range(2))
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "sec_1x": secs["1x"],
            "sec_10x": secs["10x"],
            "ratio": round(secs["10x"] / secs["1x"], 2),
            "edges_1x": sizes["1x"],
            "edges_10x": sizes["10x"],
        }
        print(name, results[name])

    probe_after = str(measure_steal())
    payload = {
        "cores": cores,
        "probe_before": probe_before,
        "probe_after": probe_after,
        "results": results,
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
