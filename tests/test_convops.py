"""Conversation-level corpus ops (operators/convops.py)."""

import pyspark.sql.functions as F
import pytest

from openie_with_entities_spark.operators.convops import (
    conv_dedup_exact,
    conv_neardup_pairs,
    conv_quality,
    conv_text,
    pack_conversations,
)

DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _tr(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, None, None) for (c, i, r, t) in rows], DDL
    )


@pytest.fixture
def convs(spark):
    return _tr(
        spark,
        [
            # c1 and c2: identical ordered (role, text) sequences → duplicates
            ("c1", 0, "user", "hello there"),
            ("c1", 1, "assistant", "hi , how can I help ?"),
            ("c2", 0, "user", "hello there"),
            ("c2", 1, "assistant", "hi , how can I help ?"),
            # c3: same texts, different ROLE on turn 1 → NOT a duplicate
            ("c3", 0, "user", "hello there"),
            ("c3", 1, "user", "hi , how can I help ?"),
            # c4: same texts, different ORDER → NOT a duplicate
            ("c4", 0, "user", "hi , how can I help ?"),
            ("c4", 1, "assistant", "hello there"),
        ],
    )


class TestConvText:
    def test_orders_by_turn_idx_regardless_of_input_order(self, spark):
        t = _tr(spark, [("c", 2, "user", "three"), ("c", 0, "user", "one"),
                        ("c", 1, "assistant", "two")])
        row = conv_text(t, with_roles=False).collect()[0]
        assert row.text == "one two three"
        assert row.n_turns == 3
        framed = conv_text(t, with_roles=True).collect()[0]
        # canonical frame: md5(role)||md5(text) per turn, turn_idx order
        import hashlib

        def h(s):
            return hashlib.md5(s.encode()).hexdigest()

        assert framed.text == "".join(
            h(r) + h(x)
            for r, x in [("user", "one"), ("assistant", "two"), ("user", "three")]
        )


class TestConvDedup:
    def test_role_and_order_sensitive(self, spark, convs):
        out = conv_dedup_exact(convs).collect()
        assert len(out) == 3  # {c1,c2}, {c3}, {c4}
        by_keeper = {r.keeper_conv_id: r for r in out}
        assert by_keeper["c1"].n_copies == 2
        assert by_keeper["c3"].n_copies == 1
        assert by_keeper["c4"].n_copies == 1
        assert all(r.n_turns == 2 for r in out)

    def test_framing_is_injective(self, spark):
        # ("ab","c") vs ("a","bc") must not collide in the canonical string
        t = _tr(spark, [("x", 0, "user", "ab"), ("x", 1, "user", "c"),
                        ("y", 0, "user", "a"), ("y", 1, "user", "bc")])
        assert conv_dedup_exact(t).count() == 2

    def test_framing_injective_for_multiline_turn_text(self, spark):
        # LLM transcript turns routinely contain tabs and newlines: one
        # turn whose text embeds 'assistant\tok' after a newline must NOT
        # collide with the two-turn conversation it imitates under a
        # delimiter framing (the md5-per-turn frame is width-fixed, so no
        # concat collision is possible for ANY text)
        t = _tr(
            spark,
            [
                ("one_turn", 0, "user", "hi\nassistant\tok"),
                ("two_turns", 0, "user", "hi"),
                ("two_turns", 1, "assistant", "ok"),
            ],
        )
        assert conv_dedup_exact(t).count() == 2


class TestConvNeardup:
    def test_finds_planted_near_duplicate_conversation(self, spark):
        base = "the quick brown fox jumps over the lazy dog near the river bank today"
        variant = base.replace("today", "yesterday")
        other = "completely unrelated text about spark shuffle partitioning and skew handling"
        t = _tr(spark, [
            ("a", 0, "user", base), ("a", 1, "assistant", base),
            ("b", 0, "user", base), ("b", 1, "assistant", variant),
            ("z", 0, "user", other), ("z", 1, "assistant", other),
        ])
        pairs = {(r.conv_a, r.conv_b): r.jaccard
                 for r in conv_neardup_pairs(t, threshold=0.5).collect()}
        assert ("a", "b") in pairs
        assert pairs[("a", "b")] >= 0.5
        assert not any("z" in p for p in pairs)


class TestPackConversations:
    def test_bins_respect_cumulative_budget(self, spark, convs):
        out = pack_conversations(convs, max_tokens=8, n_shards=1).collect()
        rows = sorted(out, key=lambda r: r.conv_id)
        # one shard → conv_id order; each conv has 9 tokens (2+7)
        assert [r.conv_id for r in rows] == ["c1", "c2", "c3", "c4"]
        assert all(r.n_tokens == 9 for r in rows)
        assert [r.bin_id for r in rows] == [0, 1, 2, 3]
        assert all(r.shard == 0 for r in rows)

    def test_sharding_is_deterministic_and_bounded(self, spark, convs):
        out = pack_conversations(convs, n_shards=4).collect()
        assert all(0 <= r.shard < 4 for r in out)
        again = pack_conversations(convs, n_shards=4).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))
        with pytest.raises(ValueError):
            pack_conversations(convs, n_shards=17)


class TestConvQuality:
    def test_role_gates_and_repeats(self, spark):
        long = " ".join(["tok"] * 20)
        t = _tr(spark, [
            # good: both roles, alternating, enough tokens
            ("g", 0, "user", long), ("g", 1, "assistant", long),
            # monologue: user only → keep=False
            ("m", 0, "user", long), ("m", 1, "user", long),
            # too short → keep=False
            ("s", 0, "user", "hi"), ("s", 1, "assistant", "yo"),
            # repeats counted but tool turns don't break the keep gate
            ("r", 0, "user", long), ("r", 1, "tool", long),
            ("r", 2, "tool", long), ("r", 3, "assistant", long),
        ])
        by_id = {r.conv_id: r for r in conv_quality(t).collect()}
        assert by_id["g"].keep and by_id["g"].n_role_repeats == 0
        assert not by_id["m"].keep and by_id["m"].n_role_repeats == 1
        assert not by_id["s"].keep
        r = by_id["r"]
        assert r.keep and r.n_role_repeats == 1
        assert (r.n_user_turns, r.n_assistant_turns, r.n_turns) == (1, 1, 4)

    def test_single_turn_conv_has_zero_repeats(self, spark):
        t = _tr(spark, [("solo", 0, "user", "just one turn here now ok")])
        row = conv_quality(t).collect()[0]
        assert row.n_role_repeats == 0 and not row.keep


def test_one_shuffle_plan(spark, convs):
    """conv_quality's window + aggregate must reuse ONE conv_id exchange."""
    plan = conv_quality(convs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1


class TestPrepareConversations:
    def test_composed_gates_dedup_and_scrub(self, spark):
        from openie_with_entities_spark.operators.convops import (
            prepare_conversations,
        )

        long = " ".join(["tok"] * 20)
        t = _tr(spark, [
            # duplicate pair: only the min conv_id survives
            ("a1", 0, "user", long), ("a1", 1, "assistant", "mail a@b.co ok"),
            ("a2", 0, "user", long), ("a2", 1, "assistant", "mail a@b.co ok"),
            # user-only monologue: dropped by the role gate
            ("m", 0, "user", long), ("m", 1, "user", long),
            # too short: dropped
            ("s", 0, "user", "hi"), ("s", 1, "assistant", "yo"),
            # good unique conversation with a phone number
            ("u", 0, "user", long), ("u", 1, "assistant", "call +1 (415) 555-0100 now"),
        ])
        out = prepare_conversations(t).collect()
        by_conv = {}
        for r in out:
            by_conv.setdefault(r.conv_id, []).append(r)
        assert set(by_conv) == {"a1", "u"}
        texts = {r.text_clean for r in by_conv["a1"]}
        assert any("<EMAIL>" in x for x in texts)
        assert not any("a@b.co" in x for x in texts)
        assert any("<PHONE>" in r.text_clean for r in by_conv["u"])
        # turn granularity preserved
        assert sorted(r.turn_idx for r in by_conv["a1"]) == [0, 1]


def test_conv_ops_partitioning_invariant(spark, convs):
    """Conversation-level outputs must be identical under any input
    partitioning — the same determinism bar the kg checksum holds. Windows
    order on unique keys and aggregates sort before hashing, so a 7-way
    repartition must change nothing."""
    from openie_with_entities_spark.operators.convops import (
        conv_dedup_exact,
        conv_quality,
        pack_conversations,
        prepare_conversations,
    )

    shuffled = convs.repartition(7)
    for op in (conv_dedup_exact, conv_quality,
               lambda t: pack_conversations(t, n_shards=4),
               prepare_conversations):
        a = sorted(map(tuple, op(convs).collect()))
        b = sorted(map(tuple, op(shuffled).collect()))
        assert a == b, op
