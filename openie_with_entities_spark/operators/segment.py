"""Turn → sentence segmentation (all native Catalyst column ops).

The reference consumes one-sentence-per-line files
(/root/reference/data.py:417-446); our input is multi-sentence transcript
turns, so segmentation becomes part of the engine: split the
whitespace-pre-tokenized turn text after sentence-terminator tokens,
``posexplode`` to one row per sentence, and normalize quotes
(/root/reference/data.py:429-432) into a separate column so the raw text can
be reassembled per turn (the per-turn text equality invariant). Scope of
that invariant: turns that are null/empty or consist only of separator
whitespace produce no sentence rows (they carry nothing to extract), and a
trailing separator space after the final terminator token is not preserved
— reassembly is exact for every turn with content, modulo that trailing
space. The corpus generator emits neither case with content to lose; the
equality test in tests/test_pipeline.py pins the invariant on real input.

The ≤100-token guard (/root/reference/data.py:284, counted including the 3
sentinel tokens the reference appends) becomes an ``eligible`` flag rather
than a hard filter, so reconstruction still sees every sentence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Split points: the single space following a standalone ., ! or ? token.
_SENT_BREAK = r"(?<= [.!?]) "
MAX_CORE_TOKENS = 97  # 100 minus the 3 reference sentinel tokens


def segment_turns(transcripts: DataFrame) -> DataFrame:
    """transcripts → sentences(conv_id, turn_idx, sent_idx, raw_text,
    text, n_tokens, eligible).

    ``raw_text`` joins back to the original turn text with a single space;
    ``text`` is quote-normalized and is what every downstream stage reads.
    """
    sents = (
        transcripts.where(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            "conv_id",
            "turn_idx",
            F.posexplode(F.split(F.col("text"), _SENT_BREAK)).alias(
                "sent_idx", "raw_text"
            ),
        )
        .where(F.col("raw_text") != "")
    )
    normalized = (
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("raw_text"), "’", "'"), "”", "''"
            ),
            "“",
            "''",
        )
    )
    return sents.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        "raw_text",
        normalized.alias("text"),
        # Python str.split() semantics (what the fused stage and the oracle
        # use): empty tokens from doubled/trailing spaces do NOT count —
        # F.size(F.split(x, ' ')) alone would count them and break the
        # fused≡modular invariant near the 97-token boundary.
        F.size(
            F.filter(F.split(F.col("raw_text"), " "), lambda t: t != "")
        ).alias("n_tokens"),
    ).withColumn("eligible", F.col("n_tokens") <= MAX_CORE_TOKENS)


def reassemble_turns(sentences: DataFrame) -> DataFrame:
    """Inverse of segment_turns for the equality invariant: group sentences
    back to (conv_id, turn_idx, text) in stable sent_idx order."""
    return (
        sentences.groupBy("conv_id", "turn_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sent_idx", "raw_text"))
                    ),
                    lambda s: s["raw_text"],
                ),
                " ",
            ).alias("text")
        )
    )
