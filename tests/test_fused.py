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
