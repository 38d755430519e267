"""E4: binarize n-ary extractions (/root/reference/carb/carb.py:316-342).

An extraction with args [a1, a2, a3, …] becomes:
  (a1, rel, a2)
  (a1, rel + ' ' + a2 [+ ' ' + prep], aN-without-leading-prep)   for N ≥ 3

Native formulation: explode the extra args, prepend the a2 context to the
relation, move a leading preposition from the arg into the relation.

Fidelity note: the reference's loop reuses one mutable object for every
emitted row (carb.py:322-340), so under its optional --binary flag all rows
of an extraction alias the LAST variant. That is an aliasing bug, not a
semantic choice (the default evaluation path folds args inside the matcher
instead, matcher.py:328-340); this operator implements the intended
semantics and documents the divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREPS = [
    "above", "across", "against", "along", "among", "around", "at",
    "before", "behind", "below", "beneath", "beside", "between", "by",
    "for", "from", "in", "into", "near", "of", "off", "on", "to",
    "toward", "under", "upon", "with", "within",
]


def binarize_extractions(df: DataFrame) -> DataFrame:
    """df(…, arg1, rel, arg2, extra_args:array<string>) → binary rows with
    an ``ext_variant`` ordinal (0 = the base (a1, rel, a2) row)."""
    passthrough = [
        c for c in df.columns if c not in ("arg1", "rel", "arg2", "extra_args")
    ]
    base = df.select(
        *passthrough, "arg1", "rel", "arg2", F.lit(0).alias("ext_variant")
    )
    extras = df.where(F.size(F.coalesce("extra_args", F.array())) > 0).select(
        *passthrough,
        "arg1",
        "rel",
        "arg2",
        F.posexplode("extra_args").alias("_i", "_extra"),
    )
    words = F.split(F.col("_extra"), " ")
    first = F.lower(F.element_at(words, 1))
    has_prep = first.isin(PREPS)
    new_rel = F.concat_ws(
        " ",
        F.col("rel"),
        F.col("arg2"),
        F.when(has_prep, F.element_at(words, 1)),
    )
    new_arg2 = F.when(
        has_prep, F.array_join(F.slice(words, 2, 100000), " ")
    ).otherwise(F.col("_extra"))
    folded = extras.select(
        *passthrough,
        "arg1",
        new_rel.alias("rel"),
        new_arg2.alias("arg2"),
        (F.col("_i") + 1).alias("ext_variant"),
    )
    return base.unionByName(folded)
