"""The two heavy mapInPandas stages: conjunction splitting and OIE
extraction.

Stage contract (the reference's batch loop, re-expressed for Spark):

  conj stage  ≙ conj-model predict + coordination decode + split
               (/root/reference/run.py:162-232, model.py:656-690)
  oie stage   ≙ oie-model predict + triple decode + insert-time dedup
               (/root/reference/run.py:229-236, model.py:603-639)

Both stages:
  * are repartitioned by hash(conv_id) first — the explicit shuffle the
    north rule requires, and the ONLY shuffle before the final aggregate;
  * sort within partitions by token count (the reference's bucket-by-length
    batching, /root/reference/data.py:469-472) so a batched neural backend
    pads minimally;
  * run per-Arrow-batch with NO per-row Python outside the batch loop —
    swapping the rule-based labeler for a tokenizer+model call keeps the
    same structure (the model handle would be a per-worker singleton, the
    reference's module-level pattern at /root/reference/data.py:28).

All keys travel as columns; the reference's driver-side ``mapping`` /
``conj_word_mapping`` dicts (/root/reference/run.py:163-204) do not exist.
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
    split_by_coordinations,
)
from .backends import DeterministicBackend

SPLIT_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, split_idx int, "
    "n_splits int, split_text string, conj_words array<string>"
)

TRIPLE_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, split_idx int, ext_idx int, "
    "arg1 string, rel string, arg2 string, confidence double"
)


def _strip_sentinels(text: str) -> str:
    """Recover the clean sentence from a sentinel-suffixed one — the
    reference's orig-sentence recovery (/root/reference/model.py:613)."""
    return text.split("[unused1]")[0].strip()


def _partition_for_inference(df: DataFrame, text_col: str, partitions: int | None) -> DataFrame:
    """Explicit conv_id-hash repartition with a PINNED partition count.

    The count must be explicit: AQE's coalescing optimizes for shuffle-block
    size and would shrink a text-sized corpus to a handful of partitions —
    correct for IO-bound SQL, disastrous for a CPU-bound model stage (7 of
    32 cores busy, measured). Inference stages are compute-bound, so
    parallelism follows cores (×3 for stragglers), not bytes — but the
    shuffle exists to FIX a parallelism deficit, not as a ritual (round 7,
    guide §2.4: remove shuffles outright where the input is already
    partitioned well enough):

      * input already has ≥ cores partitions (any healthy production scan —
        thousands of splits at 100 TB) → NO shuffle at all; the stage maps
        over the scan splits and only the per-partition length sort runs.
        Extraction is per-row, so placement never changes results.
      * tiny input (few scan splits) → repartition, but only to 4× the
        input's split count instead of cores×3: a 20-conv resume contract
        was paying 96 near-empty Python-worker round trips.
      * explicit ``partitions`` or a streaming source (no probe available)
        → the caller-pinned / cores×3 hash repartition, as before.

    The input-split probe is a plan→RDD conversion, no job.
    """
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism * 3
        if not df.isStreaming:
            cores = df.sparkSession.sparkContext.defaultParallelism
            try:
                in_splits = df.rdd.getNumPartitions()
            except Exception:  # pragma: no cover - exotic plans
                in_splits = None
            if in_splits and in_splits >= cores:
                # enough parallelism already — skip the shuffle entirely
                return df.sortWithinPartitions(
                    F.size(F.split(F.col(text_col), " "))
                )
            if in_splits:
                partitions = max(min(partitions, in_splits * 4), 1)
    out = df.repartition(partitions, F.col("conv_id"))
    if out.isStreaming:  # sort unsupported on streams; batches are small
        return out
    return out.sortWithinPartitions(F.size(F.split(F.col(text_col), " ")))


def conj_split_stage(
    sentences: DataFrame,
    partitions: int | None = None,
    backend=None,
    with_indices: bool = False,
) -> DataFrame:
    """sentences → one row per split sentence.

    A sentence with no (splittable) coordination yields itself as its single
    split (split_idx 0, n_splits 1) — the identity-mapping case of
    /root/reference/run.py:183-186.

    ``backend``: a labeling backend (extract.backends); the conj model runs
    ONCE per Arrow batch, the reference's batched predict loop shape.

    ``with_indices`` appends two columns the S8 labels sink needs —
    ``split_indices`` (ascending original-token positions of this split's
    tokens, the reference's ``sentences_indices[i][j]``,
    /root/reference/run.py:163-204) and ``n_orig_tokens`` (token count of
    the original sentence, sentinels excluded); the identity split maps to
    range(n_orig_tokens) exactly like run.py:255-257.
    """
    backend = backend or DeterministicBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # task-local distinct-sentence memo (same rationale and bound as
        # extract.fused: splitting is a pure function of the text, and the
        # reference pools per sentence text)
        from .fused import _SENT_MEMO_CAP

        memo: dict[str, tuple] = {}

        for pdf in batches:
            out: dict[str, list] = {
                "conv_id": [], "turn_idx": [], "sent_idx": [],
                "split_idx": [], "n_splits": [], "split_text": [],
                "conj_words": [],
            }
            if with_indices:
                out["split_indices"] = []
                out["n_orig_tokens"] = []
            # batch the conj call over the batch's NEW distinct sentences;
            # ``new`` covers every non-memoized text of the batch, so the
            # batch-local dict always resolves (over-cap entries simply
            # are not carried to the next batch)
            fresh: dict[str, tuple] = {}
            new = [t for t in dict.fromkeys(pdf["text"]) if t not in memo]
            if new:
                token_lists = [t.split() + SENTINELS for t in new]
                matrices = backend.conj_batch(token_lists)
                for text, tokens, matrix in zip(new, token_lists, matrices):
                    coords = decode_coordinations(matrix)
                    texts, conj_words, idx_lists = split_by_coordinations(
                        coords, tokens
                    )
                    n_clean = len(tokens) - len(SENTINELS)
                    if texts:
                        splits = [_strip_sentinels(t) for t in texts]
                        clean_idx = [
                            [i for i in sorted(s) if i < n_clean]
                            for s in idx_lists
                        ]
                    else:
                        splits = [text]
                        clean_idx = [list(range(n_clean))]
                    entry = (splits, conj_words, clean_idx, n_clean)
                    fresh[text] = entry
                    if len(memo) < _SENT_MEMO_CAP:
                        memo[text] = entry
            for conv_id, turn_idx, sent_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["sent_idx"], pdf["text"]
            ):
                hit = memo.get(text)
                if hit is None:
                    hit = fresh[text]
                splits, conj_words, clean_idx, n_clean = hit
                for k, s in enumerate(splits):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["sent_idx"].append(sent_idx)
                    out["split_idx"].append(k)
                    out["n_splits"].append(len(splits))
                    out["split_text"].append(s)
                    out["conj_words"].append(conj_words)
                    if with_indices:
                        out["split_indices"].append(clean_idx[k])
                        out["n_orig_tokens"].append(n_clean)
            yield pd.DataFrame(out)

    schema = SPLIT_SCHEMA
    if with_indices:
        schema += ", split_indices array<int>, n_orig_tokens int"
    eligible = sentences.where(F.col("eligible")).select(
        "conv_id", "turn_idx", "sent_idx", "text"
    )
    return _partition_for_inference(eligible, "text", partitions).mapInPandas(
        run, schema=schema
    )


def oie_stage(
    splits: DataFrame, partitions: int | None = None, backend=None
) -> DataFrame:
    """split sentences → raw extractions (pre global dedup/ranking).

    Insert-time dedup WITHIN one split sentence (first depth wins) happens
    here, exactly like the reference's per-sentence loop; cross-split dedup
    under the original sentence is a separate relational operator
    (see operators.dedup). ``backend``: one OIE-model call per Arrow batch.
    """
    backend = backend or DeterministicBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # task-local distinct-split-sentence memo: label + decode once per
        # distinct split text (same rationale/bound as extract.fused)
        from .fused import _SENT_MEMO_CAP

        memo: dict[str, list] = {}

        for pdf in batches:
            out: dict[str, list] = {
                "conv_id": [], "turn_idx": [], "sent_idx": [],
                "split_idx": [], "ext_idx": [], "arg1": [], "rel": [],
                "arg2": [], "confidence": [],
            }
            fresh: dict[str, list] = {}
            new = [
                t for t in dict.fromkeys(pdf["split_text"]) if t not in memo
            ]
            if new:
                token_lists = [t.split() + SENTINELS for t in new]
                labeled = backend.oie_batch(token_lists)
                for text, tokens, (rows, confs) in zip(
                    new, token_lists, labeled
                ):
                    exts = list(decode_extractions(rows, tokens, confs))
                    fresh[text] = exts
                    if len(memo) < _SENT_MEMO_CAP:
                        memo[text] = exts
            for conv_id, turn_idx, sent_idx, split_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["sent_idx"],
                pdf["split_idx"], pdf["split_text"],
            ):
                exts = memo.get(text)
                if exts is None:  # ``new`` covered every non-memoized text
                    exts = fresh[text]
                for j, (arg1, rel, arg2, conf) in enumerate(exts):
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["sent_idx"].append(sent_idx)
                    out["split_idx"].append(split_idx)
                    out["ext_idx"].append(j)
                    out["arg1"].append(arg1)
                    out["rel"].append(rel)
                    out["arg2"].append(arg2)
                    out["confidence"].append(conf)
            yield pd.DataFrame(out)

    narrow = splits.select(
        "conv_id", "turn_idx", "sent_idx", "split_idx", "split_text"
    )
    # Already partitioned by conv_id from the conj stage — no new shuffle
    # unless the caller asks for a different width.
    if partitions:
        narrow = _partition_for_inference(narrow, "split_text", partitions)
    return narrow.mapInPandas(run, schema=TRIPLE_SCHEMA)


OIE_LABELS_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, split_idx int, "
    "depth int, labels array<int>"
)


def oie_labels_stage(
    splits: DataFrame, partitions: int | None = None, backend=None
) -> DataFrame:
    """split sentences (with indices — conj_split_stage(with_indices=True))
    → per-extraction TRAINING-LABEL rows over the ORIGINAL sentence's token
    positions: the S8 labels-sink projection of
    /root/reference/run.py:246-291 (get_labels).

    Reference semantics preserved exactly:
      * depths stop at the first all-zero prediction (run.py:276-277);
      * an extraction is kept iff its split-side prediction carries an ARG1
        or REL label anywhere — INCLUDING on sentinel tokens, where the
        rel_case marker lives (run.py:287-288 checks ``prediction``, not the
        scattered labels);
      * split labels scatter onto original positions via the sorted index
        list, unmapped positions stay NONE (run.py:281-283);
      * label ids stay raw here — the sink maps {4→ARG2, 5→NONE} at render
        time (run.py:247), so LOC/TIME survive for other consumers.
    """
    backend = backend or DeterministicBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.formats import project_labels_to_original

        for pdf in batches:
            out: dict[str, list] = {
                "conv_id": [], "turn_idx": [], "sent_idx": [],
                "split_idx": [], "depth": [], "labels": [],
            }
            token_lists = [t.split() + SENTINELS for t in pdf["split_text"]]
            labeled = backend.oie_batch(token_lists)
            for conv_id, turn_idx, sent_idx, split_idx, idxs, n_orig, (rows, _confs) in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["sent_idx"],
                pdf["split_idx"], pdf["split_indices"], pdf["n_orig_tokens"],
                labeled,
            ):
                for depth, pred in enumerate(rows):
                    if sum(pred) == 0:
                        break
                    if 1 not in pred and 2 not in pred:
                        continue
                    out["conv_id"].append(conv_id)
                    out["turn_idx"].append(turn_idx)
                    out["sent_idx"].append(sent_idx)
                    out["split_idx"].append(split_idx)
                    out["depth"].append(depth)
                    out["labels"].append(
                        project_labels_to_original(
                            list(pred), sorted(int(i) for i in idxs), int(n_orig)
                        )
                    )
            if out["conv_id"]:  # empty object cols can't cast to array<int>
                yield pd.DataFrame(out)

    narrow = splits.select(
        "conv_id", "turn_idx", "sent_idx", "split_idx", "split_text",
        "split_indices", "n_orig_tokens",
    )
    if partitions:
        narrow = _partition_for_inference(narrow, "split_text", partitions)
    return narrow.mapInPandas(run, schema=OIE_LABELS_SCHEMA)
