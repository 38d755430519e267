"""Similarity search over an embedding column (array<float>).

  * ``cosine_topk``      — brute-force exact top-k: queries × corpus with the
    dot product as a native higher-order-function expression (zip_with +
    aggregate, JVM codegen, no Python). Scale shape: broadcast the (small)
    query set against the (huge) corpus — one scan, no corpus shuffle.
  * ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH signs
    computed from deterministic per-dimension hash weights, equi-join on the
    bucket signature, exact re-rank inside buckets only.

Both rank by the cosine ROUNDED to 4 decimals with vec_id tiebreak, so
rankings are reproducible across engines and summation orders.
"""

from __future__ import annotations

import pandas as pd  # module level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    na = F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")
        )
    )
    return dot / (na * nb)


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """queries(q_id, q_vec) × embeddings(vec_id, embedding) → top-k rows
    (q_id, vec_id, cos_sim, rk)."""
    joined = embeddings.crossJoin(F.broadcast(queries)).select(
        "q_id",
        "vec_id",
        F.round(_cosine(F.col("q_vec"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


_LSH_WEIGHT_SEED = 12345  # fixed → identical hyperplanes on every worker


def _band_buckets_udf(n_bands: int, n_planes: int, dim: int):
    """Vectorized (Arrow-batched) band-bucket computation: ONE numpy matmul
    per batch projects every vector onto all n_bands·n_planes hyperplanes,
    then sign bits pack into per-band bucket ids.

    A pure-SQL formulation (aggregate/zip_with per plane) is possible but
    higher-order functions are evaluated interpreted per element — measured
    ~10× slower than the BLAS matmul at 48 planes × 64 dims. Weights come
    from a fixed-seed RNG, so buckets are deterministic across workers,
    partitions, and runs; the matrix is built ONCE in the UDF closure (it
    ships pickled with the task), not per Arrow batch."""
    import numpy as np

    # int64 bucket packing overflows at 63 sign bits; n_planes anywhere near
    # that is also far past useful bucket granularity (2^62 buckets)
    assert n_planes < 63, f"n_planes={n_planes} overflows int64 packing"
    w = np.random.RandomState(_LSH_WEIGHT_SEED).randn(dim, n_bands * n_planes)
    pack = 1 << np.arange(n_planes)

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ w) >= 0  # (batch, bands*planes)
        out = bits.reshape(len(m), n_bands, n_planes) @ pack  # (batch, bands)
        return pd.Series(list(out))

    return buckets


def _banded(df: DataFrame, vec_col: str, n_bands: int, n_planes: int, dim: int) -> DataFrame:
    """One row per (row, band) with that band's bucket id; bands use
    disjoint hyperplane sets (band b owns columns b·r .. b·r+r−1 of the
    weight matrix). A single-split local scan is first spread across cores
    (no-op on a properly-split corpus at scale)."""
    if vec_col == "embedding":  # corpus side only; query side is tiny
        from .docops import _spread

        df = _spread(df, "vec_id")
    buckets = _band_buckets_udf(n_bands, n_planes, dim)
    return df.select(
        *df.columns,
        F.posexplode(buckets(F.col(vec_col))).alias("band", "bucket"),
    )


def ann_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    n_bands: int = 16,
    n_planes: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Distinct (q_id, vec_id) candidate pairs: the OR-combination over
    bands — a pair is a candidate if ANY band buckets them together."""
    emb_b = _banded(embeddings, "embedding", n_bands, n_planes, dim)
    q_b = _banded(queries, "q_vec", n_bands, n_planes, dim)
    return (
        emb_b.join(F.broadcast(q_b), ["band", "bucket"])
        .select("q_id", "vec_id")
        .distinct()
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample: int = 4096,
    seed: int = 7,
):
    """Deterministic IVF coarse quantizer: spherical k-means on a bounded,
    deterministic HASH-PREDICATE sample, run driver-side in numpy.

    The sample collect is broadcast-regime by design — training a coarse
    quantizer needs thousands of points, not the corpus. The sample is
    every vec_id with pmod(xxhash64(vec_id), stride) = 0 where stride
    targets ``sample`` rows: content-unbiased even on corpora whose ids
    correlate with content (time-ordered ingests), unlike the previous
    lowest-vec_id slice. Rows sort by vec_id after collect, so whenever the
    whole corpus fits the sample budget the training set — and therefore
    every centroid — is bit-identical to the old formulation. n_centroids
    clamps to the sample size (k-means cannot seed more centroids than
    points). At 100 TB n_centroids grows to ~sqrt(corpus) per the usual
    IVF sizing. Lloyd iterations, seeded init, ties broken by index — the
    same centroids on every run and every cluster."""
    import numpy as np

    # no LIMIT: the hash-predicate set is already ~sample-sized in
    # expectation and a LIMIT over an unordered scan would be
    # nondeterministic; the collect stays bounded (≤ ~2·sample rows)
    stride = max(1, embeddings.count() // sample)
    rows = embeddings.where(
        F.pmod(F.xxhash64("vec_id"), F.lit(stride)) == 0
    ).collect()
    rows.sort(key=lambda r: r.vec_id)
    x = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n_centroids = min(n_centroids, len(x))
    rng = np.random.RandomState(seed)
    c = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return c


def _ivf_cells_udf(centroids, n_probe: int):
    """Arrow-batched assignment: one matmul per batch against the broadcast
    centroid matrix; returns each vector's top-n_probe cell ids."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def cells(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c.T
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32") for row in top])

    return cells


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids=None,
) -> DataFrame:
    """IVF approximate top-k: the corpus partitions into n_centroids cells
    (nearest centroid); each query probes its n_probe nearest cells and
    re-ranks exactly inside them. The scan-beating property: per query only
    ~n_probe/n_centroids of the corpus is touched, and the cell equi-join
    is hashable/salt-able like every other join in this engine."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_centroids)
    from .docops import _spread

    corpus_cells = _ivf_cells_udf(centroids, 1)
    query_cells = _ivf_cells_udf(centroids, n_probe)
    emb_c = _spread(embeddings, "vec_id").select(
        "vec_id", "embedding",
        F.element_at(corpus_cells(F.col("embedding")), 1).alias("cell"),
    )
    q_c = queries.select(
        "q_id", "q_vec",
        F.explode(query_cells(F.col("q_vec"))).alias("cell"),
    )
    scored = emb_c.join(F.broadcast(q_c), "cell").select(
        "q_id",
        "vec_id",
        F.round(_cosine(F.col("q_vec"), F.col("embedding")), 4).alias("cos_sim"),
    )
    dedup = scored.groupBy("q_id", "vec_id").agg(
        F.max("cos_sim").alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return dedup.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= k
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_bands: int = 16,
    n_planes: int = 12,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos_sim) with
    cosine ≥ threshold and vec_a < vec_b.

    Default path (the 100 TB shape): multi-band LSH self-join — pairs
    colliding in ANY band are candidates, exact cosine verifies. Defaults
    are tuned for the near-dup regime (θ ≈ 18° at cos 0.95 → p_plane ≈ 0.9
    → p_band = 0.9^12 ≈ 0.28 → 16-band recall ≈ 0.995, and ≥ 0.999 for the
    tighter pairs that dominate real near-dup corpora) while random pairs
    collide at only (1/2)^12 per band — at the sf0.1 corpus (2k vectors)
    that is ~8k candidate pairs where 8 planes produced ~125k, and the
    sizing rule below (n_planes ≈ log2(N / target_bucket_rows)) gives
    exactly 12 for N=2k. n_planes must keep growing with corpus size or
    per-bucket pair expansion goes quadratic: at 10⁹ vectors use r ≈ 24–28,
    where a cos-0.95 neighbor still collides per band at 0.9^r ≈ 0.05–0.08
    and recall comes from the band union (B ≈ 64 → ≥ 0.96).

    ``exact=True`` runs the brute-force all-pairs verification instead —
    the small-data oracle twin (this is what the DuckDB oracle replicates).
    """
    a, b = embeddings.alias("a"), embeddings.alias("b")
    if exact:
        pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    else:
        # one pass over the banded table: group each (band, bucket) into its
        # sorted member list, then a TWO-LEVEL generate — posexplode the
        # anchors, explode each anchor's tail slice — emits the C(m,2)
        # pairs per bucket. The previous banded self-join ran the Arrow
        # bucket UDF once per join side and paid two exchanges; a
        # flatten-all-pairs-into-one-array variant was rejected because a
        # degenerate hot bucket (m near-identical vectors) would
        # materialize all m²/2 structs in a single row — the nested
        # Generates stream pairs with O(m) memory per in-flight row.
        # Per-bucket m stays small when n_planes follows the log2(N)
        # sizing rule below; a corpus of near-identical vectors should use
        # exact=True (it IS one duplicate class).
        ab = _banded(embeddings, "embedding", n_bands, n_planes, dim)
        with_ids = (
            ab.groupBy("band", "bucket")
            .agg(F.array_sort(F.collect_set("vec_id")).alias("ids"))
            .where(F.size("ids") >= 2)
        )
        anchors = with_ids.select(
            "ids", F.posexplode("ids").alias("i", "id_a")
        )
        cand = (
            anchors.select(
                "id_a",
                F.explode(
                    F.slice(
                        "ids",
                        F.col("i") + 2,
                        F.greatest(F.size("ids") - F.col("i") - 1, F.lit(0)),
                    )
                ).alias("id_b"),
            )
            .distinct()
        )
        pairs = (
            cand.join(a, cand["id_a"] == F.col("a.vec_id"))
            .join(b, cand["id_b"] == F.col("b.vec_id"))
        )
    scored = pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(
            _cosine(F.col("a.embedding"), F.col("b.embedding")), 4
        ).alias("cos_sim"),
    )
    return scored.where(F.col("cos_sim") >= threshold)


def knn_join(
    embeddings: DataFrame,
    k: int = 5,
    n_bands: int = 16,
    n_planes: int = 3,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """kNN GRAPH construction: for every corpus vector, its k nearest
    neighbors by cosine — (src_id, dst_id, cos_sim, rk). The primitive
    under graph-based clustering/semantic-dedup of an embedding corpus.

    Default path: the banded-LSH bucket machinery (same hyperplanes and
    per-bucket in-row pair generation as embedding_neardup_pairs, at the
    wider top-k tuning of 16 bands × 3 planes) yields undirected candidate
    pairs; each pair scores once and MIRRORS into both directions before
    the per-source rank — so the join and the cosine work are half the
    directed pair count. ``exact=True`` is the brute-force twin (the
    small-data oracle): all ordered pairs, exact rank. Approximate-path
    recall is gated in tests like the other ANN operators; the plane count
    must grow with log2(N) exactly as documented on lsh_bucketed_topk."""
    a, b = embeddings.alias("a"), embeddings.alias("b")
    if exact:
        pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    else:
        ab = _banded(embeddings, "embedding", n_bands, n_planes, dim)
        with_ids = (
            ab.groupBy("band", "bucket")
            .agg(F.array_sort(F.collect_set("vec_id")).alias("ids"))
            .where(F.size("ids") >= 2)
        )
        anchors = with_ids.select(
            "ids", F.posexplode("ids").alias("i", "id_a")
        )
        cand = (
            anchors.select(
                "id_a",
                F.explode(
                    F.slice(
                        "ids",
                        F.col("i") + 2,
                        F.greatest(F.size("ids") - F.col("i") - 1, F.lit(0)),
                    )
                ).alias("id_b"),
            )
            .distinct()
        )
        pairs = (
            cand.join(a, cand["id_a"] == F.col("a.vec_id"))
            .join(b, cand["id_b"] == F.col("b.vec_id"))
        )
    scored = pairs.select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.round(
            _cosine(F.col("a.embedding"), F.col("b.embedding")), 4
        ).alias("cos_sim"),
    )
    directed = scored.unionByName(
        scored.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "cos_sim",
        )
    ).select(
        F.col("id_a").alias("src_id"), F.col("id_b").alias("dst_id"), "cos_sim"
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("cos_sim").desc(), F.col("dst_id")
    )
    return directed.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= k
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bands: int = 16,
    n_planes: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via MULTI-BAND random-hyperplane LSH: n_bands
    independent hash tables of n_planes bits each; candidates are the UNION
    of per-band bucket collisions (so one bucket miss no longer loses a
    neighbor — the single-table failure mode); exact cosine re-rank on the
    deduped candidate set.

    Tuning: a neighbor at angle θ collides in one band with
    p = (1−θ/π)^n_planes and is recalled with 1−(1−p)^n_bands; bucket count
    per band is 2^n_planes, so n_planes must grow with corpus size
    (≈ log2(N/target_bucket_rows)) and n_bands with the recall target. The
    defaults are tuned for the sandbox testdata, whose vectors are near-
    random (cos@10 ≈ 0.25 — ANN's adversarial case, recall forces wide
    OR-combination); on real clustered embedding corpora the same recall
    needs far fewer/narrower probes (see the clustered-corpus test).

    Scale shape: the corpus is scanned once into (band, bucket)-keyed rows,
    the tiny banded query set broadcasts, and the dedup+re-rank shuffle
    carries only (q_id, vec_id, cos) — never the corpus vectors."""
    emb_b = _banded(embeddings, "embedding", n_bands, n_planes, dim)
    q_b = _banded(queries, "q_vec", n_bands, n_planes, dim)
    scored = emb_b.join(F.broadcast(q_b), ["band", "bucket"]).select(
        "q_id",
        "vec_id",
        F.round(_cosine(F.col("q_vec"), F.col("embedding")), 4).alias("cos_sim"),
    )
    # a pair colliding in several bands scores identically each time →
    # max() dedups without re-shuffling vectors
    dedup = scored.groupBy("q_id", "vec_id").agg(
        F.max("cos_sim").alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return dedup.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= k
    )
