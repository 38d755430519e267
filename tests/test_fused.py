"""Fused production path ≡ modular pipeline (triples AND entity links)."""

import pytest
from pyspark.sql import functions as F

from openie_with_entities_spark.corpus import alias_dict, generate_transcripts
from openie_with_entities_spark.plans.pipeline import build_kg, build_kg_fused

KEY = ["conv_id", "turn_idx", "sent_idx", "split_idx", "ext_idx"]
VALUE_COLS = [
    "arg1", "rel", "arg2", "confidence",
    "arg1_entity_id", "arg1_ner_type",
    "arg2_entity_id", "arg2_ner_type",
]


@pytest.fixture(scope="module")
def both(spark):
    t = generate_transcripts(spark, 50).cache()
    t.count()
    alias = alias_dict(spark)
    modular = build_kg(t, alias, partitions=8).linked_triples
    fused = build_kg_fused(t, alias, partitions=8)
    return modular, fused


def _rows(df):
    return {
        tuple(r[c] for c in KEY + VALUE_COLS)
        for r in df.select(*KEY, *VALUE_COLS).collect()
    }


def test_fused_equals_modular(both):
    modular, fused = both
    m, f = _rows(modular), _rows(fused)
    assert m, "no triples produced"
    assert m == f, (
        f"only-modular={list(m - f)[:3]} only-fused={list(f - m)[:3]}"
    )


def test_fused_mention_counts(both):
    modular, fused = both
    # n_mentions: fused reports 0 where modular reports null; compare with
    # coalesce
    def counts(df):
        return {
            tuple(r[c] for c in KEY): (r.n1 or 0, r.n2 or 0)
            for r in df.select(
                *KEY,
                F.coalesce("arg1_n_mentions", F.lit(0)).alias("n1"),
                F.coalesce("arg2_n_mentions", F.lit(0)).alias("n2"),
            ).collect()
        }

    assert counts(modular) == counts(fused)


def test_fused_memo_replays_instances_across_batches(spark):
    """Round-7 memoization witness: a corpus that is mostly REPEATED
    sentence texts (forced across multiple Arrow batches in one task) must
    produce row-for-row what the sequential (unmemoized) oracle produces
    per instance, and the stage counters must count per INSTANCE, not per
    distinct sentence."""
    import datetime as dt

    from openie_with_entities_spark.corpus import alias_dict
    from openie_with_entities_spark.extract.fused import fused_extract_stage
    from openie_with_entities_spark.linking import dictionary_surfaces
    from openie_with_entities_spark.oracle import reference_triples
    from openie_with_entities_spark.plans.metrics import (
        FUSED_COUNTERS,
        StageCounters,
    )

    texts = [
        "Ada Lovelace founded Acme Corp .",   # entity-linking rows
        "Ada Lovelace founded Acme Corp .",   # exact repeat
        "Grace Hopper , Alan Turing and Ken Thompson visited Paris .",
        "the quarterly report was finished on time .",  # no-entity filler
    ]
    n_turns = 5000  # > one 4096-row Arrow batch → cross-batch memo reuse
    ts = dt.datetime(2025, 1, 1)
    rows = [
        ("c%05d" % (i // 4), i % 4, "user", texts[i % 4], None, ts)
        for i in range(n_turns)
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    counters = StageCounters(spark, "fused_memo_test", FUSED_COUNTERS)
    out = fused_extract_stage(
        t, dictionary_surfaces(alias_dict(spark)), partitions=1,
        counters=counters,
    ).collect()

    expected_one = reference_triples(
        [("k", 0, texts[0]), ("k", 1, texts[1]), ("k", 2, texts[2]),
         ("k", 3, texts[3])]
    )
    per_turn = {}
    for r in expected_one:
        per_turn.setdefault(r["turn_idx"], []).append(
            (r["arg1"], r["rel"], r["arg2"], r["confidence"])
        )
    got = {}
    for r in out:
        got.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.arg1, r.rel, r.arg2, r.confidence)
        )
    assert len(got) == sum(1 for _, ti, *_ in rows if per_turn.get(ti))
    for (conv_id, ti), triples in got.items():
        assert sorted(triples) == sorted(per_turn[ti]), (conv_id, ti)
    # counters count instances: 5000 sentences in, one split row per
    # non-coordination sentence + 3 per coordination sentence
    tot = counters.snapshot()
    assert tot["turns_in"] == n_turns
    assert tot["sentences_in"] == n_turns
    n_coord = len([i for i in range(n_turns) if i % 4 == 2])
    assert tot["splits_out"] == (n_turns - n_coord) + 3 * n_coord
