"""Fused extraction stage: segmentation + conj-split + OIE + per-sentence
dedup + mention linking summary in ONE mapInPandas pass over raw turns.

The modular stages (segment.py, stages.py, mentions.py) exist for parity
testing and for deployments where the conj and OIE models run on different
hardware pools. At 100 TB the dominant costs besides the model forward
passes are (a) rows crossing the JVM↔Python Arrow channel and (b) shuffles
between stages. Fusing the per-sentence pipeline:

  * feeds TURNS through Arrow (2-3× fewer rows than sentences, ~5× fewer
    than split sentences) and emits only flat triple rows — no nested
    structs;
  * performs the reference's insert-order extraction dedup
    (/root/reference/model.py:595-634) in-UDF (all splits of a sentence are
    computed together), removing the window-dedup shuffle;
  * reduces the job to AT MOST one shuffle: the explicit conv_id
    repartition — and since round 7 even that is skipped when the input
    scan already feeds every core (see stages._partition_for_inference).

Equivalence with the modular path is asserted by tests/test_fused.py.

Batched-model note: a neural backend calls the conj model once per Arrow
batch, expands splits, then calls the OIE model once on the expanded batch —
the same two batched forward passes as the reference's two predict() loops,
just colocated.

Linking summary: the stage takes the (broadcast-sized, deduplicated)
dictionary SURFACE SET and emits, per argument, the first dictionary-matched
mention surface and the matched-mention count; entity resolution stays
JVM-side (map-literal / broadcast join) in linking.link_triples_inline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.decode import (
    SENTINELS,
    decode_coordinations,
    decode_extractions,
    extraction_key,
    normalize_quotes,
    split_by_coordinations,
)
from ..oracle import MAX_WORDS_WITH_SENTINELS, segment_text
from .backends import DeterministicBackend
from .mentions import _spans, normalize_surface
from .stages import _partition_for_inference, _strip_sentinels

FUSED_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, split_idx int, ext_idx int, "
    "arg1 string, rel string, arg2 string, confidence double, "
    "arg1_surface string, arg1_n_mentions int, "
    "arg2_surface string, arg2_n_mentions int"
)

# Per-TASK memo bounds (round 7). The extraction result of a sentence is a
# pure function of its TEXT — the reference itself pools all work per
# sentence text (its ``mapping``/``all_predictions`` dicts,
# /root/reference/run.py:163-204, model.py:609-634) — so within one task
# each distinct sentence is labeled/decoded/link-summarized ONCE and every
# further instance replays the memoized rows. The memos live inside the
# mapInPandas ``run`` closure: born and garbage-collected with the task,
# never shared across tasks or runs (every bench/oracle invocation
# recomputes from its inputs). Caps bound worker memory on adversarial
# corpora; an over-cap sentence is simply computed without being stored.
_SENT_MEMO_CAP = 100_000
_LINK_MEMO_CAP = 200_000


def _link_summary(text: str, surfaces: frozenset[str]) -> tuple[str | None, int]:
    """(first dictionary-matched mention surface, matched count) for one arg."""
    tokens = text.split()
    first = None
    n = 0
    for (s, e) in _spans(tokens):
        surf = normalize_surface(" ".join(tokens[s : e + 1]))
        if surf in surfaces:
            n += 1
            if first is None:
                first = surf
    return first, n


def fused_extract_stage(
    transcripts: DataFrame,
    surfaces: frozenset[str],
    partitions: int | None = None,
    counters=None,
    backend=None,
) -> DataFrame:
    """turns → deduped triples with per-arg link summaries.

    At most TWO backend calls per Arrow batch — conj labels for the batch's
    NEW distinct sentences, then OIE labels for their split sentences — the
    same two batched forward passes as the reference's predict loops,
    colocated. Distinct-sentence memoization (round 7): extraction is a pure
    function of the sentence text, and the reference pools exactly this way
    (text-keyed ``mapping`` dicts), so repeated sentences — boilerplate,
    fillers, quoted turns — cost one dict probe instead of a model call.
    The memo is task-local (see _SENT_MEMO_CAP above): results replay
    row-identically, counters included.

    ``counters``: optional plans.metrics.StageCounters (FUSED_COUNTERS set)
    incremented per Arrow batch — one accumulator update per batch, not per
    row."""
    backend = backend or DeterministicBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # task-lifetime memos (never outlive the task — see _SENT_MEMO_CAP)
        memo: dict[str, tuple[list[tuple], int, int]] = {}
        link_memo: dict[str, tuple[str | None, int]] = {}

        def link(text: str) -> tuple[str | None, int]:
            r = link_memo.get(text)
            if r is None:
                r = _link_summary(text, surfaces)
                if len(link_memo) < _LINK_MEMO_CAP:
                    link_memo[text] = r
            return r

        for pdf in batches:
            n_sent = n_long = n_splits = n_ext = n_dedup = 0
            out: dict[str, list] = {k: [] for k in (
                "conv_id", "turn_idx", "sent_idx", "split_idx", "ext_idx",
                "arg1", "rel", "arg2", "confidence",
                "arg1_surface", "arg1_n_mentions",
                "arg2_surface", "arg2_n_mentions",
            )}
            # pass 1: segment + length-guard every turn; queue sentences the
            # memo has not seen (batch-first-occurrence order, so backend
            # call order stays deterministic)
            instances: list = []  # (conv_id, turn_idx, sent_idx, text)
            new_texts: list[str] = []
            token_lists: list[list[str]] = []
            queued: set[str] = set()
            for conv_id, turn_idx, turn_text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                for sent_idx, raw in enumerate(segment_text(turn_text)):
                    n_sent += 1
                    text = normalize_quotes(raw)
                    tokens = text.split() + SENTINELS
                    if len(tokens) > MAX_WORDS_WITH_SENTINELS:
                        n_long += 1
                        continue
                    instances.append((conv_id, turn_idx, sent_idx, text))
                    if text not in memo and text not in queued:
                        queued.add(text)
                        new_texts.append(text)
                        token_lists.append(tokens)
            # one conj-model call for the batch's new distinct sentences
            matrices = backend.conj_batch(token_lists) if token_lists else []
            # expand coordinations into split sentences
            split_meta: list = []  # (sent row id, split_idx)
            split_tokens: list[list[str]] = []
            for row_id, (tokens, matrix) in enumerate(
                zip(token_lists, matrices)
            ):
                coords = decode_coordinations(matrix)
                split_texts, _cw, _ = split_by_coordinations(coords, tokens)
                splits = [_strip_sentinels(t) for t in split_texts] or [
                    new_texts[row_id]
                ]
                for split_idx, split in enumerate(splits):
                    split_meta.append((row_id, split_idx))
                    split_tokens.append(split.split() + SENTINELS)
            # one OIE-model call for all splits of those sentences
            labeled = backend.oie_batch(split_tokens) if split_tokens else []
            # decode + per-sentence insert-order dedup + link summary into
            # per-sentence row templates (the memo payload)
            fresh: dict[str, tuple[list[tuple], int, int]] = {}
            t_rows: list[list[tuple]] = [[] for _ in new_texts]
            t_splits = [0] * len(new_texts)
            t_dedup = [0] * len(new_texts)
            seen_for: int = -1
            seen: set[str] = set()
            for (row_id, split_idx), stoks, (rows, confs) in zip(
                split_meta, split_tokens, labeled
            ):
                if row_id != seen_for:
                    seen_for, seen = row_id, set()
                t_splits[row_id] += 1
                for ext_idx, (arg1, rel, arg2, conf) in enumerate(
                    decode_extractions(rows, stoks, confs)
                ):
                    key = extraction_key(arg1, arg2, rel)
                    if key in seen:
                        t_dedup[row_id] += 1
                        continue
                    seen.add(key)
                    s1, n1 = link(arg1)
                    s2, n2 = link(arg2)
                    t_rows[row_id].append(
                        (split_idx, ext_idx, arg1, rel, arg2, conf,
                         s1, n1, s2, n2)
                    )
            for row_id, text in enumerate(new_texts):
                entry = (t_rows[row_id], t_splits[row_id], t_dedup[row_id])
                fresh[text] = entry
                if len(memo) < _SENT_MEMO_CAP:
                    memo[text] = entry
            # pass 2: replay the per-sentence template for every instance —
            # row order and counter totals identical to the unmemoized loop
            for conv_id, turn_idx, sent_idx, text in instances:
                tmpl = memo.get(text)
                if tmpl is None:
                    tmpl = fresh[text]
                rows_t, nsp, ndd = tmpl
                n_splits += nsp
                n_dedup += ndd
                n_ext += len(rows_t)
                for (split_idx, ext_idx, arg1, rel, arg2, conf,
                     s1, n1, s2, n2) in rows_t:
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["sent_idx"].append(sent_idx)
                    out["split_idx"].append(split_idx)
                    out["ext_idx"].append(ext_idx)
                    out["arg1"].append(arg1)
                    out["rel"].append(rel)
                    out["arg2"].append(arg2)
                    out["confidence"].append(conf)
                    out["arg1_surface"].append(s1)
                    out["arg1_n_mentions"].append(n1)
                    out["arg2_surface"].append(s2)
                    out["arg2_n_mentions"].append(n2)
            if counters is not None:
                counters.add("turns_in", len(pdf))
                counters.add("sentences_in", n_sent)
                counters.add("sentences_too_long", n_long)
                counters.add("splits_out", n_splits)
                counters.add("extractions_out", n_ext)
                counters.add("extractions_deduped", n_dedup)
            yield pd.DataFrame(out)

    turns = transcripts.where(
        F.col("text").isNotNull() & (F.col("text") != "")
    ).select("conv_id", "turn_idx", "text")
    return _partition_for_inference(turns, "text", partitions).mapInPandas(
        run, schema=FUSED_SCHEMA
    )
