"""Unit tests for the CaRB matcher + compare semantics
(/root/reference/carb/matcher.py:188-263, 328-358; carb/carb.py:62-314)."""

import numpy as np

from openie_with_entities_spark.evaluate import (
    Ext,
    binary_linient_tuple_match,
    linient_tuple_match,
    sentence_contributions,
)


class TestLinientMatch:
    def test_exact(self):
        g = Ext("founded", ["Ada", "Acme"])
        p = Ext("founded", ["Ada", "Acme"])
        assert linient_tuple_match(g, p) == [1.0, 1.0]

    def test_zero_rel_match_voids_pair(self):
        g = Ext("founded", ["Ada", "Acme"])
        p = Ext("acquired", ["Ada", "Acme"])
        assert linient_tuple_match(g, p) == [0.0, 0.0]

    def test_be_form_matching(self):
        g = Ext("is", ["Ada", "chairman"])
        p = Ext("be", ["Ada", "chairman"])
        assert linient_tuple_match(g, p)[0] > 0

    def test_missing_second_arg_voids(self):
        g = Ext("founded", ["Ada", "Acme"])
        p = Ext("founded", ["Ada"])
        assert linient_tuple_match(g, p) == [0.0, 0.0]

    def test_partial_precision(self):
        g = Ext("founded", ["Ada", "Acme"])
        p = Ext("founded", ["Ada Lovelace", "Acme"])
        prec, rec = linient_tuple_match(g, p)
        # pred words: founded(1) + Ada,Lovelace(2) + Acme(1) = 4; matched 3
        assert prec == 0.75 and rec == 1.0

    def test_dot_tokens_ignored_in_pred_args(self):
        g = Ext("r", ["a", "b"])
        p = Ext("r", ["a .", "b ."])
        assert linient_tuple_match(g, p) == [1.0, 1.0]


class TestBinaryMatch:
    def test_folds_extra_args(self):
        g = Ext("moved", ["Ada", "to", "Paris"])
        p = Ext("moved", ["Ada", "to Paris"])
        assert binary_linient_tuple_match(g, p) == [1.0, 1.0]

    def test_said_reversal(self):
        g = Ext("said", ["growth is strong", "Ada"])
        p = Ext("said", ["Ada", "growth is strong"])
        rev = binary_linient_tuple_match(g, p)
        assert rev == [1.0, 1.0]


class TestCompare:
    def test_greedy_one_to_one(self):
        gold = [Ext("r", ["a", "b"]), Ext("r", ["c", "d"])]
        preds = [Ext("r", ["a", "b"], 0.9), Ext("r", ["c", "d"], 0.5)]
        contrib = sentence_contributions(gold, preds, [0.5, 0.9])
        # threshold 0.5: both preds in, both match perfectly
        np.testing.assert_allclose(contrib[0], [2.0, 2, 2.0, 2])
        # threshold 0.9: one pred; precision 1/1; recall per gold row =
        # 1 (exact) + 1/3 (rel word matches, args don't — partial credit,
        # the reference's single-max semantics)
        np.testing.assert_allclose(contrib[1], [1.0, 1, 1 + 1 / 3, 2])

    def test_empty_preds(self):
        gold = [Ext("r", ["a", "b"])]
        contrib = sentence_contributions(gold, [], [0.5])
        np.testing.assert_allclose(contrib[0], [0, 0, 0, 1])


def test_carb_pr_empty_gold_and_missing_confidence(spark):
    """Prediction-only input returns zeros (reference carb.py behavior),
    and a pred_df without a confidence column gets the documented 1.0
    default instead of an unresolved-column error."""
    from openie_with_entities_spark.evaluate import carb_pr

    ddl = "sent_key string, arg1 string, rel string, arg2 string"
    gold = spark.createDataFrame([], ddl)
    pred = spark.createDataFrame([("s1", "a", "r", "b")], ddl)
    r = carb_pr(gold, pred)
    assert (r.zero_conf_precision, r.zero_conf_recall, r.auc) == (0.0, 0.0, 0.0)

    gold2 = spark.createDataFrame([("s1", "a", "r", "b")], ddl)
    r2 = carb_pr(gold2, pred)
    assert r2.zero_conf_f1 == 1.0
