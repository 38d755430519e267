"""End-to-end KG-construction pipeline: the engine's equivalent of
``python run.py --mode splitpredict --task oie`` (/root/reference/run.py:162-245,
README.md:62), as one declarative DataFrame DAG.

    transcripts → segment → conj-split → oie → dedup → rank → triples
                                   └→ mentions → link → canonicalize ┘

Each arrow is either native Spark SQL or one of the mapInPandas stages; the
whole DAG has at most two shuffles before linking (the conv_id repartition
in front of the conj stage — skipped since round 7 when the input scan
already feeds every core — and the dedup/rank window aggregate).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extract.stages import conj_split_stage, oie_stage
from ..operators.dedup import dedup_triples, topk_triples
from ..operators.segment import segment_turns


@dataclass
class PipelineResult:
    sentences: DataFrame
    splits: DataFrame
    raw_triples: DataFrame
    triples: DataFrame


@dataclass
class KGResult:
    triples: DataFrame
    mentions: DataFrame
    linked_triples: DataFrame


def extract_triples(
    transcripts: DataFrame,
    partitions: int | None = None,
    top_k: int | None = None,
    backend=None,
) -> PipelineResult:
    """Run segmentation → splitting → extraction → dedup (+ optional top-k).

    ``backend``: labeling backend (extract.backends) shared by the conj and
    OIE stages; None = the deterministic sandbox backend."""
    sentences = segment_turns(transcripts)
    splits = conj_split_stage(sentences, partitions=partitions, backend=backend)
    raw = oie_stage(splits, backend=backend)
    triples = dedup_triples(raw)
    if top_k is not None:
        triples = topk_triples(triples, top_k)
    return PipelineResult(sentences, splits, raw, triples)


def build_kg(
    transcripts: DataFrame,
    alias: DataFrame,
    partitions: int | None = None,
) -> KGResult:
    """Extraction + entity linking with an explicit materialization barrier.

    ``triples`` feeds BOTH sides of the link join (mention detection and the
    annotate join); without a barrier Catalyst recomputes the whole
    extraction DAG once per consumer — measured 2× the work. In production
    the barrier is the per-stage checkpoint table (plans.checkpoint); here a
    persist() gives the same cut. OWNERSHIP: the persisted handle is
    returned as ``KGResult.triples`` and is NEVER unpersisted here — a
    caller looping over many corpora in one session must call
    ``result.triples.unpersist()`` when done or cached barriers accumulate
    in executor storage (evicted only by LRU)."""
    from ..extract.mentions import detect_mentions
    from ..linking import link_mentions, link_triples

    res = extract_triples(transcripts, partitions=partitions)
    triples = res.triples.persist()
    mentions = detect_mentions(triples)
    linked = link_triples(triples, link_mentions(mentions, alias))
    return KGResult(triples=triples, mentions=mentions, linked_triples=linked)


def build_kg_fused(
    transcripts: DataFrame,
    alias: DataFrame,
    partitions: int | None = None,
    backend=None,
) -> DataFrame:
    """Production/bench path: ONE mapInPandas pass over raw turns
    (segment + conj + OIE + dedup + mention summary fused) and map-literal
    linking — at most one shuffle (the conv_id repartition, skipped when
    the input scan already feeds every core) in the whole job.
    Result is identical to build_kg's linked_triples minus the
    n_mentions-null nuance (fused reports 0 where the modular left join
    reports null for mention-less args).
    """
    from ..extract.fused import fused_extract_stage
    from ..linking import dictionary_surfaces, link_triples_inline

    triples = fused_extract_stage(
        transcripts, dictionary_surfaces(alias), partitions=partitions,
        backend=backend,
    )
    return link_triples_inline(triples, alias)
