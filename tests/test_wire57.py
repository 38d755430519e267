"""Wire57 evaluation (evaluate_wire57) vs an independent sequential twin.

The twin below is a straight re-derivation of the published scoring rules
(word-overlap tuple match + greedy-by-F1 1-1 aggregation,
/root/reference/carb/wire57_evaluation.py) kept deliberately separate from
the operator's code paths, so agreement is a two-implementation check."""

import os

import pytest

from openie_with_entities_spark.evaluate_wire57 import (
    read_wire57_tab,
    wire57_eval_files,
    wire57_scores,
    wire57_sentence_scores,
)

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "wire57")


# ------------------------------------------------------------------ twin


def _twin_words(rel, a1, a2):
    return (
        [w for w in a1.split() if w != "."],
        rel.split(),
        [w for w in a2.split() if w != "."],
    )


def _twin_match(pt, gt):
    pn = pdn = rn = rdn = 0
    for pw, gw in zip(pt, gt):
        if not pw:
            if gw:
                return None
            continue
        m = sum(1 for w in pw if w in gw)
        if m == 0:
            return None
        pn, pdn, rn, rdn = pn + m, pdn + len(pw), rn + m, rdn + len(gw)
    if pdn == 0 or rdn == 0:
        return None
    return pn / pdn, rn / rdn


def _twin_f1(p, r):
    return 2 * p * r / (p + r) if p + r else 0.0


def _twin_sentence(gold, preds):
    scores = [[_twin_match(p, g) for p in preds] for g in gold]
    used_g, used_p, ps, rs = set(), set(), 0.0, 0.0
    while True:
        best, bi, bj = 0.0, None, None
        for i, row in enumerate(scores):
            if i in used_g:
                continue
            for j, s in enumerate(row):
                if j not in used_p and s and _twin_f1(*s) > best:
                    best, bi, bj = _twin_f1(*s), i, j
        if best == 0.0:
            break
        used_g.add(bi)
        used_p.add(bj)
        ps += scores[bi][bj][0]
        rs += scores[bi][bj][1]
    return ps, len(preds), rs, len(gold)


# ------------------------------------------------------------------ tests


def test_reader_parses_4_and_5_field_lines(spark):
    rows = read_wire57_tab(spark, os.path.join(FIX, "system.txt")).collect()
    assert [r.line_no for r in rows] == [1, 2, 3, 4]  # 'bad line' skipped
    five = rows[0]
    assert (five.rel, five.arg1, five.arg2) == ("sat on", "The cat", "the mat")
    four = rows[1]
    assert (four.rel, four.arg1, four.arg2) == ("on", "cat", "mat .")


def test_fixture_scores_match_hand_derivation(spark):
    row = wire57_eval_files(
        spark, os.path.join(FIX, "gold.txt"), os.path.join(FIX, "system.txt")
    ).collect()[0]
    assert row.n_sentences == 3
    assert (row.prec_num, row.prec_den) == (2.6667, 3)
    assert (row.rec_num, row.rec_den) == (2.5, 4)
    assert (row.precision, row.recall, row.f1) == (0.8889, 0.625, 0.7339)


def test_prediction_only_sentences_ignored(spark):
    gold = spark.createDataFrame(
        [(1, "s1", "likes", "A", "B")],
        "line_no long, sentence string, rel string, arg1 string, arg2 string",
    )
    preds = spark.createDataFrame(
        [(1, "s1", "likes", "A", "B"), (2, "sX", "r", "x", "y")],
        "line_no long, sentence string, rel string, arg1 string, arg2 string",
    )
    rows = wire57_sentence_scores(gold, preds).collect()
    assert len(rows) == 1 and rows[0].sentence == "s1"
    # the sX prediction never reaches any denominator
    assert rows[0].prec_den == 1


def test_zero_overlap_and_empty_parts_void_the_pair(spark):
    ddl = "line_no long, sentence string, rel string, arg1 string, arg2 string"
    gold = spark.createDataFrame([(1, "s", "likes", "A", "B")], ddl)
    preds = spark.createDataFrame(
        [(1, "s", "hates", "A", "B"),   # rel overlap 0 → void
         (2, "s", "likes", "", "B")],   # empty pred arg1 vs non-empty gold → void
        ddl,
    )
    r = wire57_sentence_scores(gold, preds).collect()[0]
    assert (r.prec_num, r.rec_num) == (0.0, 0.0)
    assert (r.prec_den, r.rec_den) == (2, 1)


def test_matches_sequential_twin_on_random_corpus(spark):
    import random

    rng = random.Random(57)
    vocab = ["alpha", "beta", "gamma", "delta", ".", "x", "y", "of", "the"]

    def rand_part():
        return " ".join(rng.choices(vocab, k=rng.randint(0, 4)))

    ddl = "line_no long, sentence string, rel string, arg1 string, arg2 string"
    gold_rows, pred_rows, ln = [], [], 0
    for s in range(25):
        sent = f"sent{s}"
        for _ in range(rng.randint(1, 4)):
            ln += 1
            gold_rows.append((ln, sent, rand_part(), rand_part(), rand_part()))
        for _ in range(rng.randint(0, 4)):
            ln += 1
            pred_rows.append((ln, sent, rand_part(), rand_part(), rand_part()))
    gold = spark.createDataFrame(gold_rows, ddl)
    preds = spark.createDataFrame(pred_rows, ddl)

    # sequential twin
    from collections import defaultdict

    gd, pdx = defaultdict(list), defaultdict(list)
    for _, s, r, a1, a2 in sorted(gold_rows):
        gd[s].append(_twin_words(r, a1, a2))
    for _, s, r, a1, a2 in sorted(pred_rows):
        pdx[s].append(_twin_words(r, a1, a2))
    pn = pdn = rn = rdn = 0.0
    for s, g in gd.items():
        a, b, c, d = _twin_sentence(g, pdx.get(s, []))
        pn, pdn, rn, rdn = pn + a, pdn + b, rn + c, rdn + d
    want_p = pn / pdn if pdn else 0.0
    want_r = rn / rdn if rdn else 0.0

    # partitioning must not change the (line_no-ordered) greedy outcome
    got = wire57_scores(gold.repartition(7), preds.repartition(5)).collect()[0]
    assert got.n_sentences == len(gd)
    assert got.precision == pytest.approx(want_p, abs=1e-4)
    assert got.recall == pytest.approx(want_r, abs=1e-4)


def test_empty_predictions_give_zero_precision_denominator(spark):
    ddl = "line_no long, sentence string, rel string, arg1 string, arg2 string"
    gold = spark.createDataFrame([(1, "s", "likes", "A", "B")], ddl)
    preds = spark.createDataFrame([], ddl)
    row = wire57_scores(gold, preds).collect()[0]
    assert (row.prec_den, row.rec_den) == (0, 1)
    assert (row.precision, row.recall, row.f1) == (0.0, 0.0, 0.0)
