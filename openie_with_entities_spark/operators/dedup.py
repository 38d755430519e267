"""Relational post-processing of extractions: cross-split dedup under the
original sentence and per-sentence top-k ranking.

  dedup_triples ≙ contains_extraction insert-time dedup pooled under the
                  original sentence (/root/reference/model.py:595-634) —
                  expressed as a deterministic keep-first window instead of
                  a driver-side dict, so the surviving duplicate is the one
                  the reference's sequential insertion order would keep.
  topk_triples  ≙ confidence-desc top-k per sentence
                  (/root/reference/metric.py:435-438).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SENT_KEY = ["conv_id", "turn_idx", "sent_idx"]


def dedup_triples(raw: DataFrame, order_cols: list | None = None) -> DataFrame:
    """Keep the first-inserted extraction per (sentence, extraction key):
    first by split order, then by depth order — the reference's insertion
    order. The key is the CONCATENATED "arg1 arg2 rel" string, exactly
    ``contains_extraction``'s equality (/root/reference/metric.py:251-256)
    and ``functions.decode.extraction_key`` — keying on the column TUPLE
    would keep boundary-shifted variants ("He likes"/"tea" vs
    "He"/"likes tea") that the reference, the fused stage, and the oracle
    all treat as one extraction. A plain ``dropDuplicates`` would be
    nondeterministic about which duplicate's confidence survives.

    ``order_cols`` overrides the insertion-order tiebreak (used by
    merge_extraction_sets to make file order the first key)."""
    order_cols = order_cols or ["split_idx", "ext_idx"]
    key = F.concat_ws(" ", "arg1", "arg2", "rel")
    w = Window.partitionBy(*SENT_KEY, key.alias("_k")).orderBy(*order_cols)
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def topk_triples(
    triples: DataFrame, k: int = 5, order_cols: list | None = None
) -> DataFrame:
    """Top-k extractions per original sentence by confidence (ties broken
    deterministically by insertion order; ``order_cols`` overrides the
    tiebreak columns)."""
    order_cols = order_cols or ["split_idx", "ext_idx"]
    w = Window.partitionBy(*SENT_KEY).orderBy(
        F.col("confidence").desc(), *order_cols
    )
    return (
        triples.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def neardedup_triples(triples: DataFrame) -> DataFrame:
    """Near-duplicate extraction filter — the reference's
    ``dedup_extractions`` (/root/reference/metric.py:259-295; note: the
    reference DISABLES it at the call site, metric.py:426-430 — we ship it
    as an opt-in operator for parity).

    Per sentence: pairwise SequenceMatcher ratio > 0.9 on the
    'args + pred' string drops the shorter (by distinct-word-count)
    extraction; pairs touching a conjunct word are exempt (coordination
    splits are legitimately similar). The exemption needs a ``conj_words``
    column (the split table carries it; a bare triples table does not —
    join it on before calling, or coordination-split extractions may be
    near-deduped away). Quadratic within a sentence, bounded by the
    ≤5-extractions-per-sentence guard → applyInPandas per sentence group,
    never distributed further."""
    import difflib

    import pandas as pd

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in triples.schema.fields)
    has_conj = "conj_words" in triples.columns

    def dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["split_idx", "ext_idx"]).reset_index(drop=True)
        # split-and-rejoin collapses whitespace, exactly the reference's
        # (' '.join(args) + ' ' + pred).split() → ' '.join(...) strings —
        # an empty arg2 must not leave a double space that shifts the
        # SequenceMatcher ratio around the 0.9 boundary
        strs = [
            " ".join(f"{r.arg1} {r.arg2} {r.rel}".split())
            for r in pdf.itertuples()
        ]
        conj_words = set()
        if has_conj:
            for cw in pdf["conj_words"]:
                if cw is not None:
                    conj_words.update(cw)
        doomed: set[int] = set()
        for i in range(len(strs)):
            for j in range(i + 1, len(strs)):
                if strs[i] == strs[j]:
                    doomed.add(i)
                    continue
                if any(c in strs[i] or c in strs[j] for c in conj_words):
                    continue
                if difflib.SequenceMatcher(None, strs[i], strs[j]).ratio() > 0.9:
                    li = len(set(strs[i].split()))
                    lj = len(set(strs[j].split()))
                    doomed.add(j if li > lj else i)
        keep = [i for i in range(len(strs)) if i not in doomed]
        return pdf.iloc[keep]

    return triples.groupBy(*SENT_KEY).applyInPandas(dedup_group, schema=schema)


# \p{L}\p{N}_ ≈ the reference's PYTHON \w (unicode-aware); Java's bare \w
# is ASCII-only and would strip accented predicate letters ('café' →
# 'caf'), merging distinct predicates. DuckDB oracles spell the same
# class with '[^\p{L}\p{N}_\s]' + the 'g' flag.
PREDICATE_NORM_RE = r"[^\p{L}\p{N}_\s]"


def normalize_predicate(col="rel"):
    """P15 predicate normalization
    (/root/reference/scripts/pubmed_analysis.py:22-31): lowercase,
    punctuation-stripped. SHARED by predicate_frequency and
    canonicalize.materialize_graph so graph-edge predicates can never
    drift from the P15 stats."""
    return F.trim(F.lower(F.regexp_replace(col, PREDICATE_NORM_RE, "")))


def predicate_frequency(triples: DataFrame) -> DataFrame:
    """Normalized-predicate frequency ranking: rel → count desc (see
    normalize_predicate)."""
    return (
        triples.groupBy(normalize_predicate().alias("predicate"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "predicate")
    )


def merge_extraction_sets(a: DataFrame, b: DataFrame, k: int = 5) -> DataFrame:
    """Union two extraction tables, dedup by extraction identity, re-rank —
    the reference's merge_output_files flow
    (/root/reference/utils/merge_output_files.py:13-85)."""
    # first-FILE-wins: without a source ordinal, a duplicate present in
    # both inputs with identical (split_idx, ext_idx) would tie in the
    # keep-first window and survive nondeterministically (with whichever
    # confidence partition order produced)
    merged = a.withColumn("_src", F.lit(0)).unionByName(
        b.withColumn("_src", F.lit(1)), allowMissingColumns=True
    )
    order = ["_src", "split_idx", "ext_idx"]
    return topk_triples(
        dedup_triples(merged, order_cols=order), k, order_cols=order
    ).drop("_src")
