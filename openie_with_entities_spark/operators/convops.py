"""Conversation-level corpus operators — the transcripts-table twins of the
document ops in docops.py.

An LLM conversation-tuning pipeline dedups/gates/packs whole conversations
(ordered multi-turn units keyed by conv_id), not individual turns: two
transcripts are duplicates when their ordered (role, text) turn sequences
match, quality is a property of the turn structure (both roles present,
alternation, length), and the packing unit for a context window is the
conversation. Every operator here reduces a transcript table
(conv_id, turn_idx, role, text, ...) to one row per conversation with ONE
conv_id shuffle — the same partitioning the extraction pipeline
(plans/pipeline.py) already uses, so at 100 TB these ops co-locate with it
for free.

Cross-engine determinism: conversation digests are md5 over a
turn-idx-ordered canonical string (DuckDB reproduces it with
string_agg ... ORDER BY); token counts are whitespace counts; floats
are rounded before any ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Canonical per-turn framing: md5(role) || md5(text), turns concatenated in
# turn_idx order. Fixed-width digests make the encoding injective for
# ARBITRARY turn text — including text containing tabs and newlines, which
# LLM transcript turns routinely do. (A delimiter framing like
# role<TAB>text<NL> collides: one turn 'hi\nassistant\tok' vs two turns
# ('user','hi'),('assistant','ok') canonicalize identically and exact-dedup
# would silently drop a non-duplicate conversation.)


def _turn_digest(t):
    """md5(role)||md5(text) for one collected turn struct — the injective
    canonical frame shared by conv_dedup_exact and prepare_conversations
    (and mirrored verbatim in the DuckDB oracles)."""
    return F.concat(
        F.md5(F.coalesce(t["role"], F.lit(""))),
        F.md5(F.coalesce(t["text"], F.lit(""))),
    )


def conv_text(transcripts: DataFrame, with_roles: bool = True) -> DataFrame:
    """One row per conversation: turn texts joined in turn_idx order.
    ``with_roles`` frames each turn as md5(role)||md5(text) (the
    dedup-canonical form, injective for arbitrary turn text); without, it
    is the plain space-joined surface text (the shingling form). Single
    conv_id shuffle, map-side combinable collect.

    Skew note: the collected row is bounded by conversation LENGTH, not
    corpus size — real transcript tables bound it upstream (and
    conv_quality's max_turn_tokens/n_turns gates enforce it here); a feed
    that can contain degenerate million-turn conversations should cap with
    ``F.slice`` after the sort or pre-filter on a turn-count aggregate
    before calling any conv-level operator."""
    ordered = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text"))
    )
    body = F.array_join(
        F.transform(
            ordered,
            lambda t: _turn_digest(t) if with_roles else t["text"],
        ),
        "" if with_roles else " ",
    )
    return transcripts.groupBy("conv_id").agg(
        body.alias("text"), F.count("*").alias("n_turns")
    )


def conv_dedup_exact(transcripts: DataFrame) -> DataFrame:
    """Exact conversation dedup: md5 over the role-framed ordered turn
    sequence → (conv_hash, keeper_conv_id, n_copies, n_turns). Two
    aggregates, both map-side combinable; shuffle keys are conv ids then
    32-byte hashes — never conversation bodies (the second aggregate's
    input is already one row per conversation)."""
    canon = conv_text(transcripts, with_roles=True)
    return (
        canon.select(F.md5("text").alias("conv_hash"), "conv_id", "n_turns")
        .groupBy("conv_hash")
        .agg(
            F.min("conv_id").alias("keeper_conv_id"),
            F.count("*").alias("n_copies"),
            F.min("n_turns").alias("n_turns"),
        )
    )


def conv_neardup_pairs(
    transcripts: DataFrame, k: int = 15, threshold: float = 0.5
) -> DataFrame:
    """Near-duplicate conversation pairs: exact shingle-set Jaccard ≥ t
    over each conversation's concatenated surface text — delegates to
    docops.ngram_jaccard_pairs (df-ordered prefix filter, hash-space
    verify), so the conversation variant inherits its hot-shingle defenses
    and its brute-force-equivalence guarantee. Emits (conv_a, conv_b,
    jaccard)."""
    from .docops import ngram_jaccard_pairs

    docs = conv_text(transcripts, with_roles=False).select(
        F.col("conv_id").alias("doc_id"), "text"
    )
    pairs = ngram_jaccard_pairs(docs, k=k, threshold=threshold)
    return pairs.select(
        F.col("doc_a").alias("conv_a"),
        F.col("doc_b").alias("conv_b"),
        "jaccard",
    )


def pack_conversations(
    transcripts: DataFrame, max_tokens: int = 2048, n_shards: int = 16
) -> DataFrame:
    """Sequence packing at conversation granularity: conversations pack
    greedily into ~max_tokens bins by cumulative whitespace-token count
    (turn texts + one separator token per turn boundary is the loader's
    serialization; counted as Σ turn tokens here). Sharded by the first
    hex digit of md5(conv_id) (``n_shards`` ≤ 16 → a digit prefix), so the
    packing window is per-shard — independent, parallel, never a global
    sort — mirroring docops.pack_sequences' per-source windows but for a
    table with no natural shard column. One shuffle: the window exchange
    doubles as the groupBy exchange (same key)."""
    if not 1 <= n_shards <= 16:
        raise ValueError("n_shards must be in [1, 16] (hex-digit sharding)")
    n = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    per_conv = transcripts.groupBy("conv_id").agg(
        F.sum(n).alias("n_tokens")
    )
    shard = (
        F.conv(F.substring(F.md5("conv_id"), 1, 1), 16, 10).cast("int")
        % n_shards
    )
    w = Window.partitionBy("shard").orderBy("conv_id")
    packed = per_conv.select(
        "conv_id", "n_tokens", shard.alias("shard")
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return packed.select(
        "conv_id",
        "shard",
        "n_tokens",
        F.floor(
            (F.col("cum_tokens") - F.col("n_tokens")) / max_tokens
        ).cast("long").alias("bin_id"),
    )


def prepare_conversations(
    transcripts: DataFrame,
    min_turns: int = 2,
    min_tokens: int = 16,
    max_turn_tokens: int = 8192,
) -> DataFrame:
    """The composed conversation-preparation pass a tuning pipeline runs —
    the transcripts twin of docops.prepare_corpus: keep conversations that
    pass the role-aware quality gates AND are their exact-duplicate
    group's keeper, then scrub PII from the surviving turn texts. Returns
    cleaned TRANSCRIPTS (turn granularity: conv_id, turn_idx, role,
    text_clean).

    Shape: ONE conv_id aggregate computes the canonical dedup hash and
    every quality signal together; the keeper window runs over the tiny
    conv-level table; survivors semi-join back to the turn table (plain
    equi-join on conv_id — AQE broadcasts it at small scale, shuffles at
    large, either is right). Exact duplicates have identical canonical
    text and therefore identical quality signals, so keeper-among-
    survivors ≡ keeper-among-all — the filter order cannot drop a group
    whose keeper failed a gate its copies passed."""
    from .docops import PII_EMAIL_RE, PII_PHONE_RE

    n = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    ordered = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text"))
    )
    canon = F.md5(F.array_join(F.transform(ordered, _turn_digest), ""))
    agg = transcripts.groupBy("conv_id").agg(
        canon.alias("conv_hash"),
        F.count("*").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias(
            "n_user"
        ),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
            "n_assistant"
        ),
        F.sum(n).alias("n_tokens"),
        F.max(n).alias("max_turn_tokens"),
    )
    quality = agg.where(
        (F.col("n_turns") >= min_turns)
        & (F.col("n_user") > 0)
        & (F.col("n_assistant") > 0)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("max_turn_tokens") <= max_turn_tokens)
    )
    w = Window.partitionBy("conv_hash").orderBy("conv_id")
    keepers = (
        quality.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .select("conv_id")
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return transcripts.join(keepers, "conv_id", "left_semi").select(
        "conv_id", "turn_idx", "role", scrubbed.alias("text_clean")
    )


def conv_quality(
    transcripts: DataFrame,
    min_turns: int = 2,
    min_tokens: int = 16,
    max_turn_tokens: int = 8192,
) -> DataFrame:
    """Role-aware conversation quality gates: a tuning example needs both
    sides of the dialogue present, enough substance, no monster turns, and
    a sane turn structure. Emits per-conv counters plus the composed
    ``keep`` verdict; ``n_role_repeats`` counts adjacent same-role turn
    pairs (a lag window per conv — the alternation signal, not a hard
    gate: tool-use transcripts legally repeat roles).

    One conv_id exchange total: the lag window partitions by conv_id and
    the aggregate reuses that partitioning."""
    n = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = transcripts.select(
        "conv_id", "turn_idx", "role", n.alias("n_tok")
    ).withColumn(
        "same_as_prev",
        (F.col("role") == F.lag("role").over(w)).cast("int"),
    )
    agg = turns.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias(
            "n_user_turns"
        ),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
            "n_assistant_turns"
        ),
        F.sum("n_tok").alias("n_tokens"),
        F.max("n_tok").alias("max_turn_tokens"),
        F.coalesce(F.sum("same_as_prev"), F.lit(0)).alias("n_role_repeats"),
    )
    keep = (
        (F.col("n_turns") >= min_turns)
        & (F.col("n_user_turns") > 0)
        & (F.col("n_assistant_turns") > 0)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("max_turn_tokens") <= max_turn_tokens)
    )
    return agg.withColumn("keep", keep)
