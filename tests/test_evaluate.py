"""Unit tests for the CaRB matcher + compare semantics
(/root/reference/carb/matcher.py:188-263, 328-358; carb/carb.py:62-314)."""

import numpy as np
import pytest

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


def test_carb_pr_threshold_list_bounded_on_unique_confidences(spark):
    """The threshold list (collected to the driver) must stay bounded on a
    corpus with near-unique float confidences: 10⁵ distinct 8-dp values
    quantize to ≤ 10001 4-dp cutoffs. Reference-shaped inputs (2-dp
    confidences, data.py:571-584) are unaffected by the quantization."""
    from openie_with_entities_spark.evaluate import carb_pr

    ddl = "sent_key string, arg1 string, rel string, arg2 string"
    gold = spark.createDataFrame(
        [("g0", "ada", "founded", "acme")], ddl
    )
    # 100k predictions with distinct high-precision confidences on
    # non-gold sentences (ignored by scoring, but they all feed the
    # threshold distinct) + a handful on the gold sentence
    from pyspark.sql import functions as F

    big = spark.range(100_000).select(
        F.lit("junk_sentence").alias("sent_key"),
        F.lit("a").alias("arg1"),
        F.lit("r").alias("rel"),
        F.lit("b").alias("arg2"),
        (F.col("id") / 100_000.0 * 0.99999999 + 0.3e-8).alias("confidence"),
    )
    on_gold = spark.createDataFrame(
        [("g0", "ada", "founded", "acme")], ddl
    ).withColumn("confidence", F.lit(0.87654321))
    r = carb_pr(gold, big.unionByName(on_gold))
    assert 0 < len(r.curve) <= 10_001
    assert r.zero_conf_recall == 1.0  # the gold sentence is fully matched

    def test_strict_no_be_credit_and_no_dot_drop(self):
        from openie_with_entities_spark.evaluate import tuple_match

        # linient gives be↔is credit; strict must not
        assert tuple_match(Ext("is", ["Bob", "chairman"]), Ext("be", ["Bob", "chairman"])) == [0.0, 0.0]
        # strict keeps '.' tokens in precision denominators
        got = tuple_match(Ext("r", ["a", "b"]), Ext("r", ["a", "b ."]))
        assert got == [3 / 4, 1.0]

    def test_strict_zero_overlap_arg_voids(self):
        from openie_with_entities_spark.evaluate import tuple_match

        assert tuple_match(Ext("r", ["x", "b"]), Ext("r", ["y", "b"])) == [0.0, 0.0]
        # extra (i >= 2) args with zero overlap do NOT void
        got = tuple_match(Ext("r", ["a", "b", "zz"]), Ext("r", ["a", "b", "qq"]))
        assert got == [3 / 4, 3 / 4]

    def test_binary_folds_then_strict(self):
        from openie_with_entities_spark.evaluate import binary_tuple_match

        got = binary_tuple_match(
            Ext("r", ["a", "b", "c"]), Ext("r", ["a", "b c"])
        )
        assert got == [1.0, 1.0]

    def test_simple_no_void_and_unconditional_fold(self):
        from openie_with_entities_spark.evaluate import simple_tuple_match

        # zero pred overlap still scores the args
        assert simple_tuple_match(
            Ext("praised", ["Eve", "T"]), Ext("visited", ["Eve", "T"])
        ) == [2 / 3, 2 / 3]
        # 1-arg ref folds to [arg0, '']; ex's extra args still counted
        ref, ex = Ext("r", ["a"]), Ext("r", ["a", "bbb"])
        assert simple_tuple_match(ref, ex) == [2 / 3, 1.0]
        assert ref.args == ["a"]  # no in-place mutation (reference bug not kept)

    def test_bow_and_pred_stopword_handling(self):
        from openie_with_entities_spark.evaluate import bow_match, pred_match

        # stopword-only predicates become empty lists → trivially equal
        assert pred_match(Ext("is", ["x"]), Ext("be", ["x"]))
        assert not pred_match(Ext("ran", ["x"]), Ext("walked", ["x"]))
        assert bow_match(Ext("is", ["Bob", "chairman"]), Ext("be", ["chairman", "Bob"]))
        assert not bow_match(Ext("r", ["Bob"]), Ext("r", ["Alice"]))

    def test_arg_match_char_correlation_quirk(self):
        from openie_with_entities_spark.evaluate import arg_match

        # char-frequency product: disjoint char sets → 0 → False
        assert not arg_match(Ext("r", ["zzz"]), Ext("r", ["qqq"]))
        # heavy char overlap → True even for different words
        assert arg_match(Ext("r", ["Eve Turing"]), Ext("r", ["Eve Turing"]))
        assert not arg_match(Ext("r", [""]), Ext("r", ["x"]))  # guarded, not ZeroDivision

    def test_lexical_boundary_is_strict_gt(self):
        from openie_with_entities_spark.evaluate import lexical_match

        # exactly 0.5 coverage (1 of 2 bow words) must NOT match
        assert not lexical_match(Ext("met", ["zzz"]), Ext("met", ["qqq"]))
        assert lexical_match(Ext("met", ["Ada"]), Ext("met", ["Ada", "x"]))

    def test_bleu_nltk_default_semantics(self):
        from openie_with_entities_spark.evaluate import _sentence_bleu, bleu_match

        # identical but < 4 words → no 4-grams → 0 (nltk no-smoothing quirk)
        assert _sentence_bleu(["a", "b", "c"], ["a", "b", "c"]) == 0.0
        words = "the tech giant acme corp bought beta inc".split()
        assert _sentence_bleu(words, words) == 1.0
        # brevity penalty: hyp shorter than ref shrinks the score
        assert 0.0 < _sentence_bleu(words, words[:6]) < 1.0
        assert bleu_match(Ext("bought", ["the tech giant Acme Corp", "Beta Inc"]),
                          Ext("bought", ["the tech giant Acme Corp", "Beta Inc"]))

    def test_get_matcher_and_carb_pr_variant(self, spark):
        import pytest

        from openie_with_entities_spark.evaluate import carb_pr, get_matcher

        assert get_matcher(None).__name__ == "binary_linient_tuple_match"
        assert get_matcher("strict").__name__ == "tuple_match"
        with pytest.raises(ValueError):
            get_matcher("nope")
        with pytest.raises(NotImplementedError):
            get_matcher("bertscore")(Ext("r", ["a"]), Ext("r", ["a"]))

        ddl = "sent_key string, arg1 string, rel string, arg2 string, confidence double"
        gold = spark.createDataFrame([("s1", "Bob", "is", "chair", 1.0)], ddl)
        pred = spark.createDataFrame([("s1", "Bob", "be", "chair", 0.9)], ddl)
        # default (linient) credits be↔is; strict scores it zero
        assert carb_pr(gold, pred).zero_conf_f1 == 1.0
        assert carb_pr(gold, pred, matcher="strict").zero_conf_f1 == 0.0
        # a binary matcher runs through the same path with 0/1 credit
        assert carb_pr(gold, pred, matcher="pred").zero_conf_f1 == 1.0


class TestSingleMatchStrategy:
    """--single_match ('ss'): recall via greedy 1-1 (carb.py:242-269)."""

    def test_ss_caps_recall_at_one_gold_per_pred(self):
        import numpy as np

        gold = [Ext("founded", ["Ada", "Acme"]),
                Ext("founded", ["Ada", "Acme Corp"])]
        preds = [Ext("founded", ["Ada", "Acme"], 0.9)]
        sm = sentence_contributions(gold, preds, [0.9], strategy="sm")
        ss = sentence_contributions(gold, preds, [0.9], strategy="ss")
        np.testing.assert_allclose(sm[0], [1.0, 1.0, 1.75, 2.0])
        np.testing.assert_allclose(ss[0], [1.0, 1.0, 1.0, 2.0])

    def test_strategy_validation_and_carb_pr(self, spark):
        import pytest

        from openie_with_entities_spark.evaluate import carb_pr

        with pytest.raises(ValueError):
            sentence_contributions([], [], [0.5], strategy="xx")
        ddl = "sent_key string, arg1 string, rel string, arg2 string, confidence double"
        gold = spark.createDataFrame(
            [("s1", "Ada", "founded", "Acme", 1.0),
             ("s1", "Ada", "founded", "Acme Corp", 1.0)], ddl)
        pred = spark.createDataFrame(
            [("s1", "Ada", "founded", "Acme", 0.9)], ddl)
        with pytest.raises(ValueError):
            carb_pr(gold, pred, strategy="nope")
        assert carb_pr(gold, pred).zero_conf_recall == 0.875
        assert carb_pr(gold, pred, strategy="ss").zero_conf_recall == 0.5


class TestBertScoreSeam:
    def test_unavailable_raises(self):
        import openie_with_entities_spark.evaluate as ev

        ev.set_bert_scorer(None)
        with pytest.raises(NotImplementedError):
            ev.bert_score_match(Ext("likes", ["A", "B"]), Ext("likes", ["A", "B"]))

    def test_injected_scorer_drives_binary_match(self):
        import openie_with_entities_spark.evaluate as ev

        def scorer(cands, refs):
            return [1.0 if c == r else 0.1 for c, r in zip(cands, refs)]

        ev.set_bert_scorer(scorer)
        try:
            same = Ext("likes", ["A", "B"])
            assert ev.bert_score_match(same, Ext("likes", ["A", "B"])) is True
            assert ev.bert_score_match(Ext("hates", ["C"]), same) is False
            # composes with the threshold machinery like any binary matcher
            contrib = ev.sentence_contributions(
                [same], [Ext("likes", ["A", "B"], 0.9)], [0.0],
                matcher=ev.bert_score_match,
            )
            assert contrib[0].tolist() == [1.0, 1.0, 1.0, 1.0]
            assert ev.get_matcher("bertscore") is ev.bert_score_match
        finally:
            ev.set_bert_scorer(None)


class TestCarbSentenceScores:
    """Per-sentence CaRB breakdown (/root/reference/carb/single.py:25-96)."""

    def _frames(self, spark):
        ddl = (
            "sent_key string, arg1 string, rel string, arg2 string, "
            "confidence double"
        )
        gold = spark.createDataFrame(
            [
                ("s1", "Ada", "founded", "Acme", 1.0),
                ("s2", "Eve", "visited", "Paris", 1.0),
            ],
            ddl,
        )
        pred = spark.createDataFrame(
            [
                ("s1", "Ada", "founded", "Acme", 0.9),
                ("s1", "Ada", "visited", "Paris", 0.4),
                ("s3", "Bob", "likes", "tea", 0.8),
            ],
            ddl,
        )
        return gold, pred

    def test_breakdown_fixture(self, spark):
        from openie_with_entities_spark.evaluate import carb_sentence_scores

        gold, pred = self._frames(spark)
        rows = {r.sent_key: r for r in carb_sentence_scores(gold, pred).collect()}
        # prediction-only s3 dropped; one row per gold sentence
        assert sorted(rows) == ["s1", "s2"]
        s1 = rows["s1"]
        assert (s1.n_gold, s1.n_pred) == (1, 2)
        assert (s1.precision, s1.recall, s1.f1) == (0.5, 1.0, 0.6667)
        # optimal point: cutoff 0.9 keeps only the exact match → f1 1.0
        assert (s1.optimal_f1, s1.optimal_conf) == (1.0, 0.9)
        s2 = rows["s2"]
        assert (s2.n_gold, s2.n_pred) == (1, 0)
        assert (s2.precision, s2.recall, s2.f1) == (1.0, 0.0, 0.0)
        assert s2.optimal_f1 == 0.0 and s2.optimal_conf is None

    def test_corpus_f1_consistent_with_carb_pr(self, spark):
        """Summing the per-sentence zero-threshold numerators reproduces
        carb_pr's zero-conf corpus point on the same fixture."""
        from openie_with_entities_spark.evaluate import carb_pr

        gold, pred = self._frames(spark)
        # carb_pr on gold-keyed sentences only (s3 ignored there too)
        r = carb_pr(gold, pred)
        assert (r.zero_conf_precision, r.zero_conf_recall) == (0.5, 0.5)

    def test_strategy_and_validation(self, spark):
        from openie_with_entities_spark.evaluate import carb_sentence_scores

        gold = spark.createDataFrame(
            [
                ("s1", "Ada", "founded", "Acme", 1.0),
                ("s1", "Ada", "founded", "Acme Corp", 1.0),
            ],
            "sent_key string, arg1 string, rel string, arg2 string, "
            "confidence double",
        )
        pred = spark.createDataFrame(
            [("s1", "Ada", "founded", "Acme", 0.9)],
            "sent_key string, arg1 string, rel string, arg2 string, "
            "confidence double",
        )
        sm = carb_sentence_scores(gold, pred).collect()[0]
        ss = carb_sentence_scores(gold, pred, strategy="ss").collect()[0]
        assert sm.recall == 0.875 and ss.recall == 0.5
        with pytest.raises(ValueError):
            carb_sentence_scores(gold, pred, strategy="bogus")

    def test_stamp_optimal_confidence(self, spark):
        """single.py:80-89 live output: each prediction's confidence is
        replaced by its sentence's optimal confidence; pred-only sentences
        stamp the degenerate 0.0."""
        from openie_with_entities_spark.evaluate import stamp_optimal_confidence

        gold, pred = self._frames(spark)
        rows = {
            (r.sent_key, r.arg1, r.rel, r.arg2): r.confidence
            for r in stamp_optimal_confidence(gold, pred).collect()
        }
        assert rows == {
            ("s1", "Ada", "founded", "Acme"): 0.9,
            ("s1", "Ada", "visited", "Paris"): 0.9,
            ("s3", "Bob", "likes", "tea"): 0.0,
        }

