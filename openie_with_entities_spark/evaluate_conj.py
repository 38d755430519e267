"""Conjunction-boundary evaluation (Shimbo criteria) over DataFrames —
the engine's version of the reference's conjunction P/R/F1
(/root/reference/metric.py:19-67, 155-190, 298-377).

Coordinations are rows (sent_key, cc, spans:array<struct<s:int,e:int>>);
predicted and gold coordinations pair on (sent_key, cc) and match under
four criteria:

  whole — the overall span (first begin, last end) agrees
  outer — the first and last conjunct agree
  inner — the two conjuncts adjacent to the cc agree
  exact — every conjunct agrees

Each criterion yields precision = matches/|pred|, recall = matches/|gold|.
All computed in one join + one aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ConjScores:
    n_pred: int
    n_gold: int
    whole: tuple[float, float, float]
    outer: tuple[float, float, float]
    inner: tuple[float, float, float]
    exact: tuple[float, float, float]


def _prf(matches: int, n_pred: int, n_gold: int) -> tuple[float, float, float]:
    p = matches / n_pred if n_pred else 0.0
    r = matches / n_gold if n_gold else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return (round(p, 4), round(r, 4), round(f, 4))


def _inner_pair(spans, cc):
    """The conjunct just before and just after the cc index. Both sides use
    try_element_at: ANSI mode is ON (Spark 4 default) and a malformed/
    external gold row with no conjunct before or after the cc must compare
    as null, not abort the evaluation job."""
    before = F.filter(spans, lambda s: s["e"] < cc)
    after = F.filter(spans, lambda s: s["s"] > cc)
    return F.struct(
        F.try_element_at(before, F.lit(-1)).alias("l"),
        F.try_element_at(after, F.lit(1)).alias("r"),
    )


def evaluate_conjunctions(pred: DataFrame, gold: DataFrame) -> ConjScores:
    # persist for the duration of the call: the counts + the join would
    # otherwise re-run each side's (model-labeling) lineage twice
    pred = pred.persist()
    gold = gold.persist()

    p = pred.select(
        "sent_key",
        "cc",
        F.array_sort("spans").alias("p_spans"),
    )
    g = gold.select(
        "sent_key",
        "cc",
        F.array_sort("spans").alias("g_spans"),
    )
    j = p.join(g, ["sent_key", "cc"], "inner")

    whole = (
        (F.element_at("p_spans", 1)["s"] == F.element_at("g_spans", 1)["s"])
        & (F.element_at("p_spans", -1)["e"] == F.element_at("g_spans", -1)["e"])
    )
    outer = (
        (F.element_at("p_spans", 1) == F.element_at("g_spans", 1))
        & (F.element_at("p_spans", -1) == F.element_at("g_spans", -1))
    )
    inner = _inner_pair(F.col("p_spans"), F.col("cc")) == _inner_pair(
        F.col("g_spans"), F.col("cc")
    )
    exact = F.col("p_spans") == F.col("g_spans")

    # ONE action for counts + criteria (round 7): the two side counts and
    # the join aggregate are tiny one-row results — crossJoining them into
    # a single collect removes two driver round-trips per evaluation (the
    # persisted inputs still compute once each inside the one job)
    row = (
        j.agg(
            F.sum(whole.cast("long")).alias("whole"),
            F.sum(outer.cast("long")).alias("outer"),
            F.sum(inner.cast("long")).alias("inner"),
            F.sum(exact.cast("long")).alias("exact"),
        )
        .crossJoin(pred.agg(F.count("*").alias("n_pred")))
        .crossJoin(gold.agg(F.count("*").alias("n_gold")))
        .collect()[0]
    )
    n_pred, n_gold = row.n_pred, row.n_gold
    pred.unpersist()
    gold.unpersist()

    return ConjScores(
        n_pred=n_pred,
        n_gold=n_gold,
        whole=_prf(row.whole or 0, n_pred, n_gold),
        outer=_prf(row.outer or 0, n_pred, n_gold),
        inner=_prf(row.inner or 0, n_pred, n_gold),
        exact=_prf(row.exact or 0, n_pred, n_gold),
    )


def coordinations_df(splits_source: DataFrame) -> DataFrame:
    """Extract a coordinations DataFrame (sent_key, cc, spans) from the conj
    stage over sentences — convenience for evaluation pipelines."""
    from pyspark.sql import functions as F

    from .extract.labeler import conj_label_matrix
    from .functions.decode import SENTINELS, decode_coordinations

    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {"sent_key": [], "cc": [], "spans": [], "seps": []}
            for key, text in zip(pdf["sent_key"], pdf["text"]):
                tokens = text.split() + SENTINELS
                for cc, coord in decode_coordinations(
                    conj_label_matrix(tokens)
                ).items():
                    if coord is None:
                        continue
                    out["sent_key"].append(key)
                    out["cc"].append(cc)
                    out["spans"].append(
                        [{"s": s, "e": e} for (s, e) in coord.spans]
                    )
                    out["seps"].append(list(coord.seps))
            if out["sent_key"]:  # empty float64 cols can't cast to struct
                yield pd.DataFrame(out)

    return splits_source.mapInPandas(
        run,
        schema="sent_key string, cc int, spans array<struct<s:int,e:int>>, "
        "seps array<int>",
    )
