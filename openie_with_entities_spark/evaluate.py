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
# Matcher variants — the rest of the reference CLI surface
# (/root/reference/carb/carb.py:480-505 selects among these; the default,
# binary_linient_tuple_match, is above). Tuple matchers return [prec, rec];
# binary matchers return bool (normalized by _as_pr where a P/R pair is
# needed).
# --------------------------------------------------------------------------

# The NLTK English stopword list (public domain) + ASCII punctuation — the
# exact set matcher.py:385 builds; embedded because nltk's downloader is
# not available in this environment.
STOPWORDS_EN = frozenset(
    """i me my myself we our ours ourselves you you're you've you'll you'd
    your yours yourself yourselves he him his himself she she's her hers
    herself it it's its itself they them their theirs themselves what which
    who whom this that that'll these those am is are was were be been being
    have has had having do does did doing a an the and but if or because as
    until while of at by for with about against between into through during
    before after above below to from up down in out on off over under again
    further then once here there when where why how all any both each few
    more most other some such no nor not only own same so than too very s t
    can will just don don't should should've now d ll m o re ve y ain aren
    aren't couldn couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't
    haven haven't isn isn't ma mightn mightn't mustn mustn't needn needn't
    shan shan't shouldn shouldn't wasn wasn't weren weren't won won't wouldn
    wouldn't""".split()
) | frozenset("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")

BLEU_THRESHOLD = 0.4  # matcher.py:381
LEXICAL_THRESHOLD = 0.5  # matcher.py:382


def _bow(e: Ext) -> str:
    """Extraction.bow (/root/reference/carb/oie_readers/extraction.py:113):
    pred and args space-joined."""
    return " ".join([e.pred] + e.args)


def _words(s: str, ignore_stopwords: bool, ignore_case: bool) -> list[str]:
    if ignore_case:
        s = s.lower()
    ws = s.split(" ")
    if ignore_stopwords:
        ws = [w for w in ws if w.lower() not in STOPWORDS_EN]
    return ws


def bow_match(
    ref: Ext, ex: Ext, ignore_stopwords: bool = True, ignore_case: bool = True
) -> bool:
    """Exact lexical bag-of-words match (matcher.py:10-29)."""
    return sorted(_words(_bow(ref), ignore_stopwords, ignore_case)) == sorted(
        _words(_bow(ex), ignore_stopwords, ignore_case)
    )


def pred_match(
    ref: Ext, ex: Ext, ignore_stopwords: bool = True, ignore_case: bool = True
) -> bool:
    """Ordered word-list equality on the predicate alone
    (matcher.py:31-49)."""
    return _words(ref.pred, ignore_stopwords, ignore_case) == _words(
        ex.pred, ignore_stopwords, ignore_case
    )


def arg_match(ref: Ext, ex: Ext) -> bool:
    """--exactMatch → Matcher.argMatch (carb.py:486, matcher.py:51-72).
    Reference quirk kept bit-for-bit: it iterates the CHARACTERS of the
    space-joined arg strings in a double loop, so coverage is
    Σ_c count_ref(c)·count_ex(c) / len(ref_chars) — it can exceed 1 and is
    really a character-frequency correlation, not word overlap. The only
    divergence: an empty reference arg string returns False here instead of
    raising ZeroDivisionError."""
    from collections import Counter

    s_ref = " ".join(ref.args)
    s_ex = " ".join(ex.args)
    if not s_ref:
        return False
    cr, ce = Counter(s_ref), Counter(s_ex)
    count = sum(n * ce[c] for c, n in cr.items())
    return count / len(s_ref) > LEXICAL_THRESHOLD


def lexical_match(ref: Ext, ex: Ext) -> bool:
    """matcher.py:114-133: word-pair product coverage over bow() words
    (duplicates multiply, same quirk family as arg_match but word-level)."""
    s_ref = _bow(ref).split(" ")
    s_ex = _bow(ex).split(" ")
    if not s_ref:
        return False
    count = sum(1 for w1 in s_ref for w2 in s_ex if w1 == w2)
    return count / len(s_ref) > LEXICAL_THRESHOLD


def _sentence_bleu(ref_words: list[str], hyp_words: list[str]) -> float:
    """Sentence BLEU with nltk's defaults (uniform 4-gram weights, no
    smoothing — any zero n-gram precision zeroes the score — and the
    standard brevity penalty), reimplemented because nltk is not in this
    environment. Matches nltk.translate.bleu_score.sentence_bleu for the
    single-reference case matcher.py:109-112 uses."""
    import math
    from collections import Counter

    p_ns = []
    for n in range(1, 5):
        hyp_ngrams = Counter(
            tuple(hyp_words[i : i + n]) for i in range(len(hyp_words) - n + 1)
        )
        ref_ngrams = Counter(
            tuple(ref_words[i : i + n]) for i in range(len(ref_words) - n + 1)
        )
        total = sum(hyp_ngrams.values())
        if total == 0:
            return 0.0
        overlap = sum(min(c, ref_ngrams[g]) for g, c in hyp_ngrams.items())
        p_ns.append(overlap / total)
    if min(p_ns) == 0.0:
        return 0.0
    log_sum = sum(0.25 * math.log(p) for p in p_ns)
    if len(hyp_words) >= len(ref_words):
        bp = 1.0
    else:
        bp = math.exp(1 - len(ref_words) / len(hyp_words))
    return bp * math.exp(log_sum)


def bleu_match(ref: Ext, ex: Ext) -> bool:
    """matcher.py:107-112: sentence BLEU over bow() > 0.4."""
    return _sentence_bleu(_bow(ref).split(" "), _bow(ex).split(" ")) > BLEU_THRESHOLD


def tuple_match(ref: Ext, ex: Ext) -> list[float]:
    """--strictMatch → Matcher.tuple_match (carb.py:495-496,
    matcher.py:136-185). Vs linient_tuple_match: no be-form credit, no
    '.'-token drop, and ANY zero-overlap part (pred, arg1 or arg2) voids
    the pair. The reference returns literal False there; folded to
    [0, 0] — every call site treats them identically (both falsy, both
    zero credit)."""
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
        predicted = ex.args[i].split()
        prec_den += len(predicted)
        matching = 0
        for w in gold:
            if w in predicted:
                matching += 1
                predicted.remove(w)
        if matching == 0 and i < 2:
            return [0.0, 0.0]
        prec_num += matching
        rec_num += matching

    return [
        prec_num / prec_den if prec_den else 0.0,
        rec_num / rec_den if rec_den else 0.0,
    ]


def binary_tuple_match(ref: Ext, ex: Ext) -> list[float]:
    """--binaryMatch (carb.py:480-481, matcher.py:362-377): args folded to
    two, then the strict tuple match."""
    return tuple_match(_fold_binary(ref), _fold_binary(ex))


def simple_tuple_match(ref: Ext, ex: Ext) -> list[float]:
    """--simpleMatch (carb.py:483-484, matcher.py:346-310 region): both
    sides folded to two args, per-part multiset overlap with NO
    zero-overlap void (missing pred args just stop the loop). The
    reference folds IN PLACE, mutating the caller's extractions so every
    later matcher call sees two-arg tuples — an aliasing bug of the same
    family e4_binarize documents; not reproduced (we fold copies). Unlike
    _fold_binary, the reference folds UNCONDITIONALLY, so a 1-arg
    extraction becomes [arg0, ''] and the empty part still walks the loop
    (penalizing precision against a 2-arg other side) — kept."""

    def fold(e: Ext) -> Ext:
        e2 = copy(e)
        e2.args = [e.args[0], " ".join(e.args[1:])] if e.args else []
        return e2

    r, e = fold(ref), fold(ex)
    prec_num = prec_den = rec_num = rec_den = 0

    predicted = e.pred.split()
    gold = r.pred.split()
    prec_den += len(predicted)
    rec_den += len(gold)
    matching = 0
    for w in gold:
        if w in predicted:
            matching += 1
            predicted.remove(w)
    prec_num += matching
    rec_num += matching

    for i, ref_arg in enumerate(r.args):
        gold = ref_arg.split()
        rec_den += len(gold)
        if len(e.args) <= i:
            break
        predicted = e.args[i].split()
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


BERT_SCORE_F1_THRESHOLD = 0.5

# injectable scorer: fn(cands: list[str], refs: list[str]) -> list[float]
# (F1 per pair). Tests plug a deterministic stand-in; production plugs
# bert_score. Module-level singleton so the model loads once per worker —
# the same pattern as the neural extraction backend (extract/backends).
_BERT_SCORER = None


def set_bert_scorer(fn) -> None:
    """Install (or clear, with None) the pairwise F1 scorer used by
    :func:`bert_score_match`."""
    global _BERT_SCORER
    _BERT_SCORER = fn


def _load_bert_scorer():
    """Try the real bert-score package; None when absent (this sandbox)."""
    try:
        from bert_score import score as _bs  # noqa: PLC0415
    except ImportError:
        return None

    def scorer(cands: list[str], refs: list[str]) -> list[float]:
        _, _, f1 = _bs(cands, refs, lang="en", verbose=False)
        return [float(v) for v in f1]

    return scorer


def _flat(e: Ext) -> str:
    return " ".join([e.args[0] if e.args else "", e.pred, *e.args[1:]]).strip()


def bert_score_match(ref: Ext, ex: Ext) -> bool:
    """--bertscoreMatch: the reference CLI selects
    ``Matcher.bert_score_match`` (carb.py:498-499) but matcher.py never
    defines it — the flag AttributeErrors in the reference itself, so the
    semantics are defined HERE: BERTScore F1 between the flattened
    ``arg1 rel arg2 …`` strings, binary at ``BERT_SCORE_F1_THRESHOLD``.
    The scorer is a dependency seam: the bert-score package when
    importable, else whatever :func:`set_bert_scorer` installed, else
    NotImplementedError (no model in this sandbox)."""
    scorer = _BERT_SCORER or _load_bert_scorer()
    if scorer is None:
        raise NotImplementedError(
            "bert_score_match needs the bert-score package or an injected "
            "scorer (set_bert_scorer); neither is available"
        )
    return scorer([_flat(ex)], [_flat(ref)])[0] >= BERT_SCORE_F1_THRESHOLD


MATCHERS: dict[str, object] = {
    # name → callable; tuple matchers return [prec, rec], binary bool.
    # Names follow the reference CLI flags (carb.py:480-505).
    "binary": binary_tuple_match,
    "simple": simple_tuple_match,
    "exact": arg_match,
    "pred": pred_match,
    "lexical": lexical_match,
    "strict": tuple_match,
    "bleu": bleu_match,
    "bow": bow_match,  # matcher.py:10 (not CLI-wired in the reference)
    "bertscore": bert_score_match,
    "binary_linient": binary_linient_tuple_match,
}


def get_matcher(name: str | None):
    """CLI-style selector; None/unknown-default mirrors carb.py:504-505
    falling through to binary_linient_tuple_match."""
    if name is None:
        return binary_linient_tuple_match
    try:
        return MATCHERS[name]
    except KeyError:
        raise ValueError(
            f"unknown matcher {name!r}; one of {sorted(MATCHERS)}"
        ) from None


def _as_pr(score) -> list[float]:
    """Normalize a matcher result to [prec, rec]: binary matchers count as
    full credit on match, zero otherwise."""
    if isinstance(score, bool):
        return [1.0, 1.0] if score else [0.0, 0.0]
    return score


# --------------------------------------------------------------------------
# Per-sentence threshold contributions
# --------------------------------------------------------------------------


def sentence_contributions(
    gold: list[Ext],
    preds: list[Ext],
    thresholds: list[float],
    matcher=binary_linient_tuple_match,
    strategy: str = "sm",
) -> np.ndarray:
    """(num_conf, 4) array of [prec_num, prec_den, rec_num, rec_den] for one
    sentence at each confidence cutoff. ``matcher`` is any MATCHERS entry;
    binary (bool) matchers score full/zero credit per pair. ``strategy``:
    'sm' (default — each gold credited by its best surviving prediction,
    carb.py:208-212) or 'ss' (--single_match, carb.py:242-269 — recall via
    the same greedy 1-1 assignment precision uses, so one prediction can
    credit at most one gold)."""
    if strategy not in ("sm", "ss"):
        raise ValueError(f"strategy must be 'sm' or 'ss', got {strategy!r}")
    scores = [[_as_pr(matcher(g, p)) for p in preds] for g in gold]
    out = np.zeros((len(thresholds), 4))
    for c, th in enumerate(thresholds):
        idx = [j for j, p in enumerate(preds) if p.confidence >= th]
        out[c, 3] = len(gold)
        out[c, 1] = len(idx)
        if not idx or not gold:
            continue
        if strategy == "sm":
            # recall: each gold row matched by its best surviving prediction
            out[c, 2] = sum(max(row[j][1] for j in idx) for row in scores)
        else:
            # 'ss': greedy global 1-1 assignment by best recall score
            taken_gr: set[int] = set()
            taken_pr: set[int] = set()
            for _ in range(min(len(gold), len(idx))):
                best, bi, bj = -1.0, -1, -1
                for i in range(len(gold)):
                    if i in taken_gr:
                        continue
                    for j in idx:
                        if j in taken_pr:
                            continue
                        if scores[i][j][1] > best:
                            best, bi, bj = scores[i][j][1], i, j
                taken_gr.add(bi)
                taken_pr.add(bj)
                out[c, 2] += best
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


def carb_sentence_scores(
    gold_df: DataFrame,
    pred_df: DataFrame,
    key_cols: list[str] | None = None,
    matcher: str | None = None,
    strategy: str = "sm",
) -> DataFrame:
    """Per-sentence CaRB breakdown for error analysis — the engine's
    surface for the reference's per-sentence CaRB driver
    (/root/reference/carb/single.py:25-96: run the compare one sentence's
    extractions at a time and record that sentence's optimal-F1 point,
    then stamp its optimal confidence back onto every extraction).

    One row per GOLD sentence:
    (key_cols…, n_gold, n_pred, precision, recall, f1, optimal_f1,
    optimal_conf) where precision/recall/f1 are the zero-threshold scores
    (every prediction kept — carb.py's confidence=0 point) and
    optimal_f1/optimal_conf is the best F1 over that sentence's own
    confidence cutoffs plus the lowest cutoff achieving it (the value
    single.py:63-86 writes back as the new confidence).  Sentences with no
    predictions score precision 1.0 (empty-denominator convention, as
    ``carb_pr``), recall 0, optimal_conf NULL.  Prediction-only sentences
    are ignored (compare iterates gold, carb.py:193-199).

    Divergence from single.py, by design: recall denominators cover only
    THIS sentence's gold rows (the error-analysis form), not the full
    benchmark — single.py's per-call ``b.compare`` carries every other
    gold sentence as unmatched recall mass, which makes its per-sentence
    numbers depend on corpus size.

    Same distribution shape as ``carb_pr``: one applyInPandas over the
    sentence key; the quadratic gold×pred match never leaves the group."""
    key_cols = key_cols or ["sent_key"]
    match_fn = get_matcher(matcher)
    if strategy not in ("sm", "ss"):
        raise ValueError(f"strategy must be 'sm' or 'ss', got {strategy!r}")
    if "confidence" not in pred_df.columns:
        pred_df = pred_df.withColumn("confidence", F.lit(1.0))
    pred_df = pred_df.withColumn("confidence", F.round("confidence", 4))

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
    key_types = {f.name: f.dataType.simpleString() for f in gold_df.schema.fields}
    schema = (
        ", ".join(f"{c} {key_types[c]}" for c in key_cols)
        + ", n_gold long, n_pred long, precision double, recall double, "
        "f1 double, optimal_f1 double, optimal_conf double"
    )
    empty_cols = key_cols + [
        "n_gold", "n_pred", "precision", "recall", "f1",
        "optimal_f1", "optimal_conf",
    ]

    def score_group(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gold = fold(pdf[pdf["_side"] == "g"])
        preds = fold(pdf[pdf["_side"] == "p"])
        if not gold:
            return pd.DataFrame(columns=empty_cols)
        row = dict(zip(key_cols, keys))
        row["n_gold"], row["n_pred"] = len(gold), len(preds)
        thresholds = sorted({p.confidence for p in preds})
        if not thresholds:
            row.update(
                precision=1.0, recall=0.0, f1=0.0,
                optimal_f1=0.0, optimal_conf=None,
            )
            return pd.DataFrame([row])
        contrib = sentence_contributions(
            gold, preds, thresholds, matcher=match_fn, strategy=strategy
        )
        precs = np.where(contrib[:, 1] > 0, contrib[:, 0] / contrib[:, 1], 1.0)
        recs = np.where(contrib[:, 3] > 0, contrib[:, 2] / contrib[:, 3], 0.0)
        denom = precs + recs
        f1s = np.where(denom > 0, 2 * precs * recs / np.where(denom > 0, denom, 1.0), 0.0)
        best = int(np.argmax(f1s))  # ties → lowest cutoff, np.argmax-first
        row.update(
            precision=round(float(precs[0]), 4),
            recall=round(float(recs[0]), 4),
            f1=round(float(f1s[0]), 4),
            optimal_f1=round(float(f1s[best]), 4),
            optimal_conf=float(thresholds[best]),
        )
        return pd.DataFrame([row])

    return both.groupBy(*key_cols).applyInPandas(score_group, schema)


def stamp_optimal_confidence(
    gold_df: DataFrame,
    pred_df: DataFrame,
    key_cols: list[str] | None = None,
    matcher: str | None = None,
    strategy: str = "sm",
) -> DataFrame:
    """The live OUTPUT of the reference's per-sentence CaRB driver
    (/root/reference/carb/single.py:80-89): every extraction's confidence
    is replaced by its sentence's optimal confidence (the lowest cutoff
    achieving that sentence's best F1, from
    :func:`carb_sentence_scores`), so a downstream consumer can threshold
    uniformly at any value and keep exactly each sentence's optimal set.

    Predictions whose sentence has no gold (single.py feeds them through
    ``b.compare`` too, where they score a degenerate all-zero curve) are
    stamped 0.0 — the engine's explicit convention for the same
    degenerate case. The stamp join broadcasts the per-sentence scores:
    one row per gold sentence, orders of magnitude below the extraction
    table."""
    key_cols = key_cols or ["sent_key"]
    scores = carb_sentence_scores(
        gold_df, pred_df, key_cols, matcher=matcher, strategy=strategy
    )
    stamp = F.broadcast(
        scores.select(*key_cols, F.col("optimal_conf").alias("_opt"))
    )
    return (
        pred_df.join(stamp, key_cols, "left")
        .withColumn("confidence", F.coalesce("_opt", F.lit(0.0)))
        .drop("_opt")
    )


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
    matcher: str | None = None,
    strategy: str = "sm",
) -> CarbResult:
    """Distributed CaRB compare. ``gold_df``/``pred_df`` need ``key_cols``
    (default [sent_key]) plus arg1/rel/arg2 (+ confidence, extra_args on
    either side, optional). ``matcher`` selects a MATCHERS variant by CLI
    name (default binary_linient_tuple_match, the reference default);
    ``strategy`` is 'sm' or 'ss' (--single_match) — see
    sentence_contributions."""
    key_cols = key_cols or ["sent_key"]
    match_fn = get_matcher(matcher)
    if strategy not in ("sm", "ss"):
        raise ValueError(f"strategy must be 'sm' or 'ss', got {strategy!r}")
    spark = gold_df.sparkSession

    if "confidence" not in pred_df.columns:
        # the docstring's "confidence … optional" contract: default 1.0,
        # matching fold()'s per-row fallback
        pred_df = pred_df.withColumn("confidence", F.lit(1.0))
    # Quantize confidences to 4 dp BEFORE the distinct: the threshold list
    # (and the O(#thresholds) per-sentence contribution array) is collected
    # to the driver, so on a corpus with near-unique float confidences it
    # must stay bounded (≤ 20001 cutoffs) rather than grow with the data.
    # The reference emits confidences at 2 dp (data.py:571-584 '%.02f'), so
    # 4 dp is exact for reference-shaped inputs; survivor sets at each
    # cutoff are computed against the same quantized values, keeping the
    # curve self-consistent.
    pred_df = pred_df.withColumn("confidence", F.round("confidence", 4))
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
        contrib = sentence_contributions(
            gold, preds, b_thresholds.value, matcher=match_fn,
            strategy=strategy,
        )
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
