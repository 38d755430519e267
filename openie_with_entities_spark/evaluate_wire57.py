"""WiRe57-style evaluation — the second benchmark scorer in the CaRB
harness (/root/reference/carb/wire57_evaluation.py).

Semantics re-expressed (not ported):

  * input format ≙ ``process_allennlp_format`` (wire57_evaluation.py:40-87):
    tab-separated lines, ``sent \\t pred \\t arg1 \\t arg2`` (4 fields) or
    ``sent \\t conf \\t pred \\t arg1 \\t arg2`` (5 fields, confidence
    unused); lines with <4 fields skipped.  ``.``-only tokens are dropped
    from the arg word lists but NOT from the relation
    (wire57_evaluation.py:66-80).  Lines with >5 fields are skipped here —
    the reference leaves pred/sub/obj unassigned for them (falls through
    both branches at :56-62 and silently reuses the PREVIOUS line's
    values), which is undefined behaviour we do not reproduce.
  * ``tuple_match`` (wire57_evaluation.py:249-283): per part (arg1, rel,
    arg2), count predicted words appearing in the gold word list; any part
    with predicted words but zero overlap — or empty predicted words
    against non-empty gold — voids the pair; else precision =
    Σmatch/Σ|pred words| and recall = Σmatch/Σ|gold words|.
  * ``aggregate_scores_greedily`` (wire57_evaluation.py:180-207): greedy
    1-1 matching by descending pair F1 (first-encountered wins ties, in
    gold-then-prediction file order); sentence precision denominator =
    #predictions, recall denominator = #gold tuples.
  * ``eval_system`` (wire57_evaluation.py:109-136): corpus P/R are the
    ratios of summed numerators to summed denominators over GOLD sentences
    only (predictions for unknown sentences are ignored); F1 = harmonic
    mean (wire57_evaluation.py:144-148).

Spark shape: the quadratic gold×pred matching is per-sentence and tiny, so
it runs inside one ``applyInPandas`` group keyed by sentence — one shuffle
on the sentence key, then a single map-combinable global sum.  At corpus
scale the group size is bounded by extractions-per-sentence, never by
corpus size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TUPLE_COLS = ["line_no", "sentence", "rel", "arg1", "arg2"]


def read_wire57_tab(spark: SparkSession, path: str) -> DataFrame:
    """Scan the wire57 tab format into (line_no, sentence, rel, arg1, arg2).

    ``line_no`` is the 1-based file line number — the greedy matcher is
    order-dependent, so tuple order within a sentence must equal the
    reference's ``readlines()`` order (same zipWithIndex pattern as
    sources.readers.numbered_lines)."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    lines = spark.createDataFrame(
        rdd.map(lambda t: (t[1] + 1, t[0])), "line_no bigint, value string"
    )
    # mirror Python str.strip() (spaces AND tabs), then tab-split
    p = F.split(F.regexp_replace("value", r"^\s+|\s+$", ""), "\t")
    parts = lines.select("line_no", p.alias("p")).where(
        F.size("p").between(4, 5)
    )
    is5 = F.size("p") == 5
    off = F.when(is5, F.lit(1)).otherwise(F.lit(0))
    return parts.select(
        "line_no",
        F.element_at("p", 1).alias("sentence"),
        F.element_at("p", F.lit(2) + off).alias("rel"),
        F.element_at("p", F.lit(3) + off).alias("arg1"),
        F.element_at("p", F.lit(4) + off).alias("arg2"),
    )


def _arg_words(s: str) -> list[str]:
    # wire57_evaluation.py:66-80 — drop '.' tokens from arg word lists
    return [w for w in (s or "").split() if w != "."]


def _tuple_words(rel: str, arg1: str, arg2: str) -> tuple[list[str], ...]:
    return _arg_words(arg1), (rel or "").split(), _arg_words(arg2)


def _f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if (p + r) else 0.0


def _tuple_match(pt, gt):
    """→ (prec, rec) or None; wire57_evaluation.py:249-283 (membership
    count, NOT multiset removal — a predicted word repeated n times counts
    n times if present in gold, exactly as the reference's
    ``sum(1 for w in predicted_words if w in gold_words)``)."""
    prec_num = prec_den = rec_num = rec_den = 0
    for pw, gw in zip(pt, gt):
        if not pw:
            if gw:
                return None
            continue
        matching = sum(1 for w in pw if w in gw)
        if matching == 0:
            return None
        prec_num += matching
        prec_den += len(pw)
        rec_num += matching
        rec_den += len(gw)
    if rec_den == 0 or prec_den == 0:
        return None
    return prec_num / prec_den, rec_num / rec_den


def _greedy_sentence_scores(gold: list, preds: list) -> tuple[float, int, float, int]:
    """→ (prec_num, prec_den, rec_num, rec_den) for one sentence
    (aggregate_scores_greedily, wire57_evaluation.py:180-207)."""
    scores = [[_tuple_match(pt, gt) for pt in preds] for gt in gold]
    used_g: set[int] = set()
    used_p: set[int] = set()
    prec_sum = rec_sum = 0.0
    while True:
        best, bi, bj = 0.0, None, None
        for i, row in enumerate(scores):
            if i in used_g:
                continue
            for j, s in enumerate(row):
                if j in used_p or s is None:
                    continue
                f = _f1(*s)
                if f > best:
                    best, bi, bj = f, i, j
        if best == 0.0:
            break
        used_g.add(bi)
        used_p.add(bj)
        prec_sum += scores[bi][bj][0]
        rec_sum += scores[bi][bj][1]
    return prec_sum, len(preds), rec_sum, len(gold)


_SENT_SCHEMA = (
    "sentence string, prec_num double, prec_den long, "
    "rec_num double, rec_den long"
)


def wire57_sentence_scores(gold: DataFrame, preds: DataFrame) -> DataFrame:
    """Per-sentence greedy match scores. Inputs carry
    (line_no, sentence, rel, arg1, arg2) — :func:`read_wire57_tab` output
    or any DataFrame with those columns.  Sentences absent from ``gold``
    contribute nothing (eval_system iterates gold only,
    wire57_evaluation.py:113-118)."""
    tagged = gold.select(
        *TUPLE_COLS, F.lit(True).alias("is_gold")
    ).unionByName(preds.select(*TUPLE_COLS, F.lit(False).alias("is_gold")))

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("line_no", kind="mergesort")
        g = pdf[pdf["is_gold"]]
        if g.empty:  # prediction-only sentence: ignored
            return pd.DataFrame(
                columns=["sentence", "prec_num", "prec_den", "rec_num", "rec_den"]
            )
        p = pdf[~pdf["is_gold"]]
        gold_t = [
            _tuple_words(r.rel, r.arg1, r.arg2) for r in g.itertuples()
        ]
        pred_t = [
            _tuple_words(r.rel, r.arg1, r.arg2) for r in p.itertuples()
        ]
        pn, pden, rn, rden = _greedy_sentence_scores(gold_t, pred_t)
        return pd.DataFrame(
            [
                {
                    "sentence": pdf["sentence"].iloc[0],
                    "prec_num": pn,
                    "prec_den": pden,
                    "rec_num": rn,
                    "rec_den": rden,
                }
            ]
        )

    return tagged.groupBy("sentence").applyInPandas(score_group, _SENT_SCHEMA)


def wire57_scores(gold: DataFrame, preds: DataFrame) -> DataFrame:
    """Corpus-level wire57 P/R/F1 — one row:
    (n_sentences, prec_num, prec_den, rec_num, rec_den, precision, recall,
    f1).  The final reduce is a single map-combinable aggregate; only one
    row reaches the driver."""
    per_sent = wire57_sentence_scores(gold, preds)
    agg = per_sent.agg(
        F.count("*").alias("n_sentences"),
        F.sum("prec_num").alias("prec_num"),
        F.sum("prec_den").alias("prec_den"),
        F.sum("rec_num").alias("rec_num"),
        F.sum("rec_den").alias("rec_den"),
    )
    prec = F.when(
        F.col("prec_den") > 0, F.col("prec_num") / F.col("prec_den")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("rec_den") > 0, F.col("rec_num") / F.col("rec_den")
    ).otherwise(F.lit(0.0))
    withpr = agg.withColumn("precision", prec).withColumn("recall", rec)
    f1 = F.when(
        (F.col("precision") + F.col("recall")) > 0,
        2
        * F.col("precision")
        * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    ).otherwise(F.lit(0.0))
    return withpr.select(
        "n_sentences",
        F.round("prec_num", 4).alias("prec_num"),
        "prec_den",
        F.round("rec_num", 4).alias("rec_num"),
        "rec_den",
        F.round("precision", 4).alias("precision"),
        F.round("recall", 4).alias("recall"),
        F.round(f1, 4).alias("f1"),
    )


def wire57_eval_files(
    spark: SparkSession, gold_path: str, system_path: str
) -> DataFrame:
    """File-level entry point ≙ wire57_evaluation.main (the
    ``--gold``/``--system`` CLI)."""
    return wire57_scores(
        read_wire57_tab(spark, gold_path), read_wire57_tab(spark, system_path)
    )
