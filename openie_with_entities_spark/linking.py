"""Entity linking: mention surfaces ⋈ alias/surface-form dictionary.

The reference's closest logic is the PER→ORG pair filter and the
entity-ending-object rewrite (/root/reference/scripts/pubmed_analysis.py:57-84,
scripts/baselines.py:50-88); the engine generalizes this to a dictionary
join, the north rule's hot spot at 10^12 turns:

  * ``link_mentions`` (default): ``broadcast(alias)`` — the dictionary is a
    dimension table; no shuffle of the (huge) mention side at all.
  * ``link_mentions_salted``: when the dictionary outgrows broadcast, both
    sides shuffle — and a handful of hot surface forms ("Acme Corp",
    boilerplate tool text) would make single reducers the stragglers. The
    dictionary side is replicated NSALT× and the probe side salted with a
    deterministic hash, bounding any reducer's share of a hot key to 1/NSALT.
    (AQE skew-join is also on, but salting works even within one key.)

Disambiguation: highest ``prior`` wins per (mention, surface) — expressed as
a max_by aggregation rather than a window so the salted join's output never
needs a second global shuffle on the full mention key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MENTION_KEY = [
    "conv_id", "turn_idx", "sent_idx", "split_idx", "ext_idx",
    "arg_pos", "begin_word",
]


def _pick_best(joined: DataFrame) -> DataFrame:
    """One entity per mention: max prior, entity_id as deterministic tiebreak."""
    return joined.groupBy(*MENTION_KEY).agg(
        F.first("mention").alias("mention"),
        F.first("surface_norm").alias("surface_norm"),
        F.first("end_word").alias("end_word"),
        F.max(
            F.struct(F.col("prior"), F.col("entity_id"), F.col("canonical_name"), F.col("ner_type"))
        ).alias("_best"),
    ).select(
        *MENTION_KEY,
        "mention",
        "surface_norm",
        "end_word",
        F.col("_best.entity_id").alias("entity_id"),
        F.col("_best.canonical_name").alias("canonical_name"),
        F.col("_best.ner_type").alias("ner_type"),
        F.col("_best.prior").alias("prior"),
    )


def link_mentions(mentions: DataFrame, alias: DataFrame) -> DataFrame:
    """Broadcast equi-join on the normalized surface form."""
    joined = mentions.join(
        F.broadcast(alias),
        mentions["surface_norm"] == alias["surface_form"],
        "inner",
    ).drop("surface_form")
    return _pick_best(joined)


def link_mentions_salted(
    mentions: DataFrame, alias: DataFrame, n_salt: int = 16
) -> DataFrame:
    """Skew-proof shuffle join: replicate the dictionary across n_salt
    buckets, salt the probe side deterministically, join on (surface, salt)."""
    salted_alias = alias.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    salted_mentions = mentions.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64("conv_id", "turn_idx", "sent_idx", "split_idx", "ext_idx"),
            F.lit(n_salt),
        ).cast("int"),
    )
    joined = salted_mentions.join(
        salted_alias,
        (salted_mentions["surface_norm"] == salted_alias["surface_form"])
        & (salted_mentions["_salt"] == salted_alias["_salt"]),
        "inner",
    ).drop("_salt").drop("surface_form")
    return _pick_best(joined)


def link_triples(
    triples: DataFrame, linked_mentions: DataFrame
) -> DataFrame:
    """Annotate triples with the linked entity per argument (the first
    mention of each arg wins, mirroring 'exactly one entity' semantics of
    /root/reference/scripts/pubmed_analysis.py:61-77)."""
    per_arg = (
        linked_mentions.groupBy(
            "conv_id", "turn_idx", "sent_idx", "split_idx", "ext_idx", "arg_pos"
        )
        .agg(
            F.min_by(
                F.struct("entity_id", "canonical_name", "ner_type"), F.col("begin_word")
            ).alias("ent"),
            F.count("*").alias("n_linked_mentions"),
        )
    )
    key = ["conv_id", "turn_idx", "sent_idx", "split_idx", "ext_idx"]
    a1 = per_arg.where("arg_pos = 1").select(
        *key,
        F.col("ent.entity_id").alias("arg1_entity_id"),
        F.col("ent.ner_type").alias("arg1_ner_type"),
        F.col("n_linked_mentions").alias("arg1_n_mentions"),
    )
    a2 = per_arg.where("arg_pos = 2").select(
        *key,
        F.col("ent.entity_id").alias("arg2_entity_id"),
        F.col("ent.ner_type").alias("arg2_ner_type"),
        F.col("n_linked_mentions").alias("arg2_n_mentions"),
    )
    return triples.join(a1, key, "left").join(a2, key, "left")


def per_org_pairs(linked_triples: DataFrame) -> DataFrame:
    """The reference's PER→ORG extraction filter
    (/root/reference/scripts/pubmed_analysis.py:57-84): keep triples whose
    subject is exactly one PER mention and object exactly one ORG mention."""
    return linked_triples.where(
        (F.col("arg1_n_mentions") == 1)
        & (F.col("arg2_n_mentions") == 1)
        & (F.col("arg1_ner_type") == "PER")
        & (F.col("arg2_ner_type") == "ORG")
    )


def snap_objects(triples: DataFrame, alias: DataFrame) -> DataFrame:
    """Entity-ending-object rewrite (/root/reference/scripts/baselines.py:50-88):
    when the object ends with a dictionary entity, move the prefix into the
    relation and snap the object to the entity's canonical name."""
    canon = F.broadcast(
        alias.select("surface_form", "canonical_name").dropDuplicates(
            ["surface_form"]
        )
    )
    obj_norm = F.lower(F.regexp_replace(F.col("arg2"), r"[^\w\s]", ""))
    joined = triples.join(
        canon,
        obj_norm.endswith(F.col("surface_form")) & (F.col("surface_form") != ""),
        "left",
    )
    # keep the longest matching suffix per triple
    key = ["conv_id", "turn_idx", "sent_idx", "split_idx", "ext_idx"]
    best = joined.groupBy(*key).agg(
        F.max(
            F.struct(F.length("surface_form").alias("l"), F.col("surface_form"), F.col("canonical_name"))
        ).alias("_m")
    ).select(*key, F.col("_m.surface_form").alias("_sf"), F.col("_m.canonical_name").alias("_cn"))
    out = triples.join(best, key, "left")
    prefix = F.trim(
        F.expr(
            "substring(arg2, 1, length(arg2) - length(_sf))"
        )
    )
    snapped = (F.col("_sf").isNotNull()) & (F.length("_sf") > 0)
    return out.select(
        *triples.columns,
        F.when(snapped & (prefix != ""), F.concat_ws(" ", "rel", prefix))
        .otherwise(F.col("rel"))
        .alias("rel_snapped"),
        F.when(snapped, F.col("_cn")).otherwise(F.col("arg2")).alias("arg2_snapped"),
    )


def violation_counters(linked_triples: DataFrame) -> DataFrame:
    """Constraint-violation counters c1–c4
    (/root/reference/scripts/violations.py:48-110) as one aggregate over the
    linked triples — the pipeline's quality metrics (north-rule counters):
      c1: extraction has no entity in either argument
      c2: an argument contains more than one entity mention
      c3: (proxy) relation text contains a dictionary entity surface
      c4: an entity is split across arguments — here: both args link to the
          same entity_id."""
    t = linked_triples
    return t.agg(
        F.count("*").alias("n_extractions"),
        F.sum(
            (
                F.col("arg1_entity_id").isNull()
                & F.col("arg2_entity_id").isNull()
            ).cast("long")
        ).alias("c1_no_entity_in_args"),
        F.sum(
            (
                (F.coalesce("arg1_n_mentions", F.lit(0)) > 1)
                | (F.coalesce("arg2_n_mentions", F.lit(0)) > 1)
            ).cast("long")
        ).alias("c2_multi_entity_arg"),
        F.sum(
            (
                F.col("arg1_entity_id").isNotNull()
                & (F.col("arg1_entity_id") == F.col("arg2_entity_id"))
            ).cast("long")
        ).alias("c4_entity_split_across_args"),
    )
