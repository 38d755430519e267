"""CaRB evaluation over DataFrames — the acceptance gate (P/R ≥ 0.95).

Re-expresses the reference's benchmark semantics:

  * ``linient_tuple_match`` / ``binary_linient_tuple_match``
    ≙ /root/reference/carb/matcher.py:188-263, 328-358 (the default matcher,
    /root/reference/metric.py:383-385)
  * ``sentence_contributions`` ≙ the per-sentence part of Benchmark.compare
    (/root/reference/carb/carb.py:62-314): greedy 1-1 precision match,
    single-max ('sm') recall, per-confidence-threshold accumulation
  * ``carb_pr`` distributes per-sentence scoring with applyInPandas and
    reduces the threshold curves with a native aggregate; only the tiny
    final PR curve reaches the driver.

The inner gold×pred matching is quadratic and order-dependent — it stays
per-sentence inside one pandas group on purpose (never distributed further).
"""

from __future__ import annotations

from copy import copy
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMS_OF_BE = ("be", "is", "am", "are", "was", "were", "been", "being")
SAID_VERBS = ("said", "told", "added", "adds", "says")


@dataclass
class Ext:
    pred: str
    args: list[str]
    confidence: float = 1.0


def linient_tuple_match(ref: Ext, ex: Ext) -> list[float]:
    """Word-multiset precision/recall over (rel, arg1, arg2, …); zero-match
    on the relation or a missing first/second arg voids the pair."""
    prec_num = prec_den = rec_num = rec_den = 0

    predicted = ex.pred.split()
    gold = ref.pred.split()
    prec_den += len(predicted)
    rec_den += len(gold)
    matching = 0
    for w in gold:
        if w in predicted:
            matching += 1
            predicted.remove(w)
    if "be" in predicted and any(f in gold for f in FORMS_OF_BE):
        matching += 1
        predicted.remove("be")
    if matching == 0:
        return [0.0, 0.0]
    prec_num += matching
    rec_num += matching

    for i, ref_arg in enumerate(ref.args):
        gold = ref_arg.split()
        rec_den += len(gold)
        if len(ex.args) <= i:
            if i < 2:
                return [0.0, 0.0]
            continue
        predicted = [w for w in ex.args[i].split() if w != "."]
        prec_den += len(predicted)
        matching = 0
        for w in gold:
            if w in predicted:
                matching += 1
                predicted.remove(w)
        prec_num += matching
        rec_num += matching

    return [
        prec_num / prec_den if prec_den else 0.0,
        rec_num / rec_den if rec_den else 0.0,
    ]


def _fold_binary(e: Ext) -> Ext:
    if len(e.args) >= 2:
        e2 = copy(e)
        e2.args = [e.args[0], " ".join(e.args[1:])]
        return e2
    return e


def binary_linient_tuple_match(ref: Ext, ex: Ext) -> list[float]:
    """Args folded to two; for said-type gold relations also try the
    arg-swapped match and keep the (lexicographic) max."""
    r, e = _fold_binary(ref), _fold_binary(ex)
    straight = linient_tuple_match(r, e)
    if not any(v in ref.pred for v in SAID_VERBS):
        return straight
    if len(ex.args) >= 2:
        e = copy(ex)
        e.args = [" ".join(ex.args[1:]), ex.args[0]]
    reverse = linient_tuple_match(r, e)
    return max(straight, reverse)


# --------------------------------------------------------------------------
# Per-sentence threshold contributions
# --------------------------------------------------------------------------


def sentence_contributions(
    gold: list[Ext], preds: list[Ext], thresholds: list[float]
) -> np.ndarray:
    """(num_conf, 4) array of [prec_num, prec_den, rec_num, rec_den] for one
    sentence at each confidence cutoff."""
    scores = [[binary_linient_tuple_match(g, p) for p in preds] for g in gold]
    out = np.zeros((len(thresholds), 4))
    for c, th in enumerate(thresholds):
        idx = [j for j, p in enumerate(preds) if p.confidence >= th]
        out[c, 3] = len(gold)
        out[c, 1] = len(idx)
        if not idx or not gold:
            continue
        # recall: each gold row matched by its best surviving prediction
        out[c, 2] = sum(max(row[j][1] for j in idx) for row in scores)
        # precision: greedy global 1-1 assignment by best precision score
        taken_g: set[int] = set()
        taken_p: set[int] = set()
        for _ in range(min(len(gold), len(idx))):
            best, bi, bj = -1.0, -1, -1
            for i in range(len(gold)):
                if i in taken_g:
                    continue
                for j in idx:
                    if j in taken_p:
                        continue
                    if scores[i][j][0] > best:
                        best, bi, bj = scores[i][j][0], i, j
            taken_g.add(bi)
            taken_p.add(bj)
            out[c, 0] += best
    return out


@dataclass
class CarbResult:
    auc: float
    optimal_f1: float
    zero_conf_precision: float
    zero_conf_recall: float
    zero_conf_f1: float
    curve: list[tuple[float, float, float]] = field(default_factory=list)


def carb_pr(
    gold_df: DataFrame,
    pred_df: DataFrame,
    key_cols: list[str] | None = None,
) -> CarbResult:
    """Distributed CaRB compare. ``gold_df``/``pred_df`` need ``key_cols``
    (default [sent_key]) plus arg1/rel/arg2 (+ confidence, extra_args on
    either side, optional)."""
    key_cols = key_cols or ["sent_key"]
    spark = gold_df.sparkSession

    if "confidence" not in pred_df.columns:
        # the docstring's "confidence … optional" contract: default 1.0,
        # matching fold()'s per-row fallback
        pred_df = pred_df.withColumn("confidence", F.lit(1.0))
    thresholds = sorted(
        r[0]
        for r in pred_df.select("confidence").distinct().collect()
        if r[0] is not None
    )
    if not thresholds:
        return CarbResult(0.0, 0.0, 0.0, 0.0, 0.0)
    b_thresholds = spark.sparkContext.broadcast(thresholds)

    def fold(g: pd.DataFrame) -> list[Ext]:
        out = []
        for r in g.itertuples():
            args = [r.arg1, r.arg2]
            extra = getattr(r, "extra_args", None)
            if extra is not None and len(extra):
                args += list(extra)
            out.append(Ext(r.rel, args, getattr(r, "confidence", 1.0)))
        return out

    gold_marked = gold_df.withColumn("_side", F.lit("g"))
    pred_marked = pred_df.withColumn("_side", F.lit("p"))
    both = gold_marked.unionByName(pred_marked, allowMissingColumns=True)

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        gold = fold(pdf[pdf["_side"] == "g"])
        preds = fold(pdf[pdf["_side"] == "p"])
        if not gold:  # predictions on non-gold sentences are ignored
            return pd.DataFrame(
                {"c": pd.Series(dtype="int64"), "pn": [], "pd_": [], "rn": [], "rd": []}
            )
        contrib = sentence_contributions(gold, preds, b_thresholds.value)
        return pd.DataFrame(
            {
                "c": range(len(b_thresholds.value)),
                "pn": contrib[:, 0],
                "pd_": contrib[:, 1],
                "rn": contrib[:, 2],
                "rd": contrib[:, 3],
            }
        )

    sums = (
        both.groupBy(*key_cols)
        .applyInPandas(
            score_group, schema="c long, pn double, pd_ double, rn double, rd double"
        )
        .groupBy("c")
        .agg(
            F.sum("pn").alias("pn"),
            F.sum("pd_").alias("pd_"),
            F.sum("rn").alias("rn"),
            F.sum("rd").alias("rd"),
        )
        .orderBy("c")
        .collect()
    )

    if not sums:
        # every group was prediction-only (empty gold slice): the reference
        # returns zeros here (carb.py catches the empty-curve ValueError)
        return CarbResult(0.0, 0.0, 0.0, 0.0, 0.0)
    precs = [r.pn / r.pd_ if r.pd_ > 0 else 1.0 for r in sums]
    recs = [r.rn / r.rd if r.rd > 0 else 0.0 for r in sums]
    f1s = [2 * p * r / (p + r) if p + r > 0 else 0.0 for p, r in zip(precs, recs)]

    # trapezoid AUC over the PR curve with the (r=0, p=1) anchor
    pts = sorted(zip(recs + [0.0], precs + [1.0]))
    trapz = getattr(np, "trapezoid", np.trapz)
    auc = float(trapz([p for _, p in pts], [r for r, _ in pts]))
    return CarbResult(
        auc=round(auc, 4),
        optimal_f1=round(max(f1s), 4) if f1s else 0.0,
        zero_conf_precision=round(precs[0], 4),
        zero_conf_recall=round(recs[0], 4),
        zero_conf_f1=round(f1s[0], 4),
        curve=list(zip(thresholds, precs, recs)),
    )
