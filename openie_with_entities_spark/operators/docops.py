"""Large-scale training-data pipeline operators over a documents table
(doc_id, text, …): deduplication, text analysis, fingerprinting.

All hot paths are native Spark SQL expressions (whole-stage codegen; no
Python). Hashes are md5-based so the DuckDB oracle can reproduce them
bit-for-bit; at 100 TB you would swap md5 for xxhash64 (same structure,
cheaper hash) — the shuffle/agg shape is identical.

Scale notes per operator are in the docstrings; the unifying design is:
  * dedup = groupBy/aggregate on a deterministic key (map-side partial agg)
  * near-dup = candidate generation by shared bucket (shingle/minhash band)
    joined doc↔doc ONLY within buckets — never an all-pairs cross join
  * analysis = per-row projections, fully pushdown/codegen friendly
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = [
    "the", "a", "an", "of", "to", "and", "in", "is", "was", "it", "for",
    "on", "with", "as", "at", "by", "that", "this", "are", "be",
]

# BPE-ish token pattern: letter runs, digit runs, single other glyphs.
# Doubled backslash: this is interpolated into a Spark SQL string literal,
# whose parser processes escapes.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


# ----------------------------------------------------------------- analysis


def tokenize(col):
    return F.split(col, " ")


def text_stats(docs: DataFrame) -> DataFrame:
    """Integer-valued per-document stats (quality-scoring inputs)."""
    toks = tokenize(F.col("text"))
    n_punct = F.size(
        F.expr(r"regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0)")
    )
    n_digits = F.size(F.expr(r"regexp_extract_all(text, '[0-9]', 0)"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        n_punct.alias("n_punct"),
        n_digits.alias("n_digits"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword heuristics → keep/drop flag.

    One projection over one scan — all stats are per-row expressions, so a
    join/second scan would only add cost (and did, before this was
    flattened; see tests/test_plans.py::test_whole_stage_codegen)."""
    toks = tokenize(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.size(
        F.expr(r"regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0)")
    )
    enriched = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
    )
    return enriched.select(
        "doc_id",
        "n_tokens",
        "n_punct",
        "n_stop",
        F.round(F.col("n_punct") / F.col("n_tokens"), 4).alias("punct_ratio"),
        F.round(F.col("n_stop") / F.col("n_tokens"), 4).alias("stop_ratio"),
        (
            (F.col("n_tokens") >= 10)
            & (F.col("n_tokens") <= 100000)
            & (F.col("n_punct") / F.col("n_tokens") < 0.3)
        ).alias("keep"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language guess (n-gram-free heuristic: documents with
    enough English function words are 'en')."""
    toks = tokenize(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    ratio = F.round(n_stop / F.size(toks), 4)
    return docs.select(
        "doc_id",
        ratio.alias("stop_ratio"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias(
            "lang_guess"
        ),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return docs.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{BPE_TOKEN_RE}', 0)")).alias(
            "n_bpe_tokens"
        ),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Whitespace-normalized content fingerprint (md5)."""
    return docs.select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias("fp"),
    )


# -------------------------------------------------------------------- dedup


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: one aggregate, map-side combinable —
    the canonical first pass at 100 TB (shuffle keys are 32-byte hashes,
    not documents)."""
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def char_shingles(docs: DataFrame, k: int = 15) -> DataFrame:
    """Distinct character k-gram shingles per document."""
    return (
        docs.select(
            "doc_id",
            F.posexplode(
                F.expr(f"sequence(1, greatest(length(text) - {k - 1}, 1))")
            ).alias("_p", "i"),
            "text",
        )
        .select("doc_id", F.expr(f"substring(text, i, {k})").alias("shingle"))
        .distinct()
    )


def minhash_lsh_candidates(
    docs: DataFrame, k: int = 15, bands: int = 4
) -> DataFrame:
    """MinHash+LSH near-dup candidates.

    shingle → per-band min(md5(band||shingle)) signature → docs sharing a
    (band, signature) bucket become a candidate pair. The doc↔doc join is
    per-bucket (tiny groups), never all-pairs; at 100 TB the band count and
    k trade recall vs bucket size exactly as in the published LSH analyses.
    """
    sh = char_shingles(docs, k)
    # all band minima in ONE aggregation pass (no band-explode: 4× less
    # shuffle input than the naive explode-then-group formulation)
    sigs = (
        sh.groupBy("doc_id")
        .agg(
            *[
                F.min(
                    F.md5(F.concat_ws("|", F.lit(b), F.col("shingle")))
                ).alias(f"sig{b}")
                for b in range(bands)
            ]
        )
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"), F.col(f"sig{b}").alias("sig")
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bs"),
        )
        .select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 15, threshold: float = 0.5
) -> DataFrame:
    """Exact shingle-set Jaccard via PREFIX FILTERING (ppjoin-style).

    Two shingle sets with Jaccard ≥ t must share an element within each
    set's ⌊(1−t)·|S|⌋+1 smallest shingles (by any global order — we use
    md5, portable to the oracle). Candidate pairs therefore come from a
    self-join of the PREFIXES only, which prunes the near-all-pairs blowup
    that common shingles cause on repetitive text; intersections are then
    counted exactly, so the result is IDENTICAL to the brute-force
    formulation (the DuckDB oracle runs brute force — the driver's compare
    proves the equivalence every round).

    Prefix filtering only pays when (1−t) is small: at t=0.5 the prefix is
    half of every set and the extra candidate→intersection join costs more
    than it prunes (measured 5×), so low thresholds take the direct
    inverted-index join."""
    sh = char_shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    if threshold >= 0.7:
        w = Window.partitionBy("doc_id").orderBy(F.md5("shingle"), "shingle")
        prefix = (
            sh.withColumn("_rk", F.row_number().over(w))
            .join(sizes, "doc_id")
            .where(
                F.col("_rk")
                <= F.floor((1 - threshold) * F.col("n_sh")).cast("int") + 1
            )
            .select("doc_id", "shingle")
        )
        candidates = (
            prefix.alias("a")
            .join(
                prefix.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        inter = (
            candidates.join(sh.alias("a"), F.col("a.doc_id") == F.col("doc_a"))
            .join(
                sh.alias("b"),
                (F.col("b.doc_id") == F.col("doc_b"))
                & (F.col("b.shingle") == F.col("a.shingle")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        inter = (
            sh.alias("a")
            .join(
                sh.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count("*").alias("n_inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(docs: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """SimHash over whitespace tokens using xxhash64 bit votes.

    Native-SQL formulation: explode tokens, one row per (doc, bit) vote via
    the 64-bit token hash, majority per bit, reassemble the top
    ``prefix_bits`` as the bucket key. (xxhash64 is Spark-side only, so this
    operator is checked rows-only, not against the DuckDB oracle.)
    """
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bits = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(prefix_bits - 1))).alias("bit"),
        "h",
    ).withColumn(
        "vote",
        F.when(F.expr("(h >> bit) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
    )
    perbit = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return perbit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                F.lit(0)
            )
        ).alias("simhash_prefix")
    )
