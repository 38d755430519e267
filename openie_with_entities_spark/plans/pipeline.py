"""End-to-end KG-construction pipeline: the engine's equivalent of
``python run.py --mode splitpredict --task oie`` (/root/reference/run.py:162-245,
README.md:62), as one declarative DataFrame DAG.

    transcripts → segment → conj-split → oie → dedup → rank → triples
                                   └→ mentions → link → canonicalize ┘

Each arrow is either native Spark SQL or one of the mapInPandas stages; the
whole DAG has exactly two shuffles before linking (the conv_id repartition in
front of the conj stage, and the dedup/rank window aggregate).
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


def extract_triples(
    transcripts: DataFrame,
    partitions: int | None = None,
    top_k: int | None = None,
) -> PipelineResult:
    """Run segmentation → splitting → extraction → dedup (+ optional top-k)."""
    sentences = segment_turns(transcripts)
    splits = conj_split_stage(sentences, partitions=partitions)
    raw = oie_stage(splits)
    triples = dedup_triples(raw)
    if top_k is not None:
        triples = topk_triples(triples, top_k)
    return PipelineResult(sentences, splits, raw, triples)
