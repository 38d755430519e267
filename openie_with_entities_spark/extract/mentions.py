"""Entity mention detection over triple arguments (the NER stage).

The reference runs flair NER over extraction subjects/objects in batches of
256 (/root/reference/scripts/pubmed_analysis.py:57-58, scripts/violations.py:42-45)
and over sentences for training features (/root/reference/data.py:34-74). The
engine expresses this as one mapInPandas stage over the triples table: a
deterministic capitalized-run detector stands in for flair (same contract —
batched text in, typed spans out); a neural backend replaces only the inner
``_spans`` function with a per-worker-singleton tagger call.

Overlapping spans are skipped, keeping the first (the reference's
"Texas-Louisiana problem" handling, /root/reference/data.py:54-66) — runs
found by this detector are disjoint by construction, so the skip is a no-op
here but the contract is preserved for neural backends.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_WORD_STOP = frozenset(
    [".", ",", "!", "?", ";", ":", "''", "'", "``", "(", ")"]
)

MENTION_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, split_idx int, ext_idx int, "
    "arg_pos int, mention string, surface_norm string, begin_word int, "
    "end_word int"
)

_NORM_RE = re.compile(r"[^\w\s]")


def normalize_surface(s: str) -> str:
    """lower + strip punctuation (/root/reference/scripts/pubmed_analysis.py:22-25)."""
    return _NORM_RE.sub("", s.lower()).strip()


def _spans(tokens: list[str]) -> list[tuple[int, int]]:
    """Maximal runs of capitalized tokens (≥1), the deterministic NER."""
    spans = []
    start = None
    for i, t in enumerate(tokens):
        capital = bool(t) and t not in _WORD_STOP and t[:1].isupper()
        if capital and start is None:
            start = i
        elif not capital and start is not None:
            spans.append((start, i - 1))
            start = None
    if start is not None:
        spans.append((start, len(tokens) - 1))
    return spans


def detect_mentions(triples: DataFrame, span_fn=None) -> DataFrame:
    """triples → one row per (arg, mention span).

    ``span_fn(tokens) -> [(begin_word, end_word)]`` is the NER seam: the
    default is the deterministic capitalized-run detector; a real backend
    (flair SequenceTagger / spaCy pipeline, the reference's data.py:28,80)
    passes a callable that tags the batch's texts and maps entity char
    offsets back to word spans — tests/test_real_models.py exercises both
    when the libraries are present. The callable is pickled into the
    mapInPandas closure, so heavyweight models should lazy-init a
    per-worker singleton inside it (extract.neural.load_backend pattern)
    rather than capture the model object."""
    span_fn = span_fn or _spans

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "conv_id": [], "turn_idx": [], "sent_idx": [],
                "split_idx": [], "ext_idx": [], "arg_pos": [],
                "mention": [], "surface_norm": [], "begin_word": [],
                "end_word": [],
            }
            for row in pdf.itertuples():
                for arg_pos, text in ((1, row.arg1), (2, row.arg2)):
                    tokens = text.split()
                    taken_until = -1
                    for (s, e) in span_fn(tokens):
                        if s <= taken_until:  # overlap skip (contract)
                            continue
                        taken_until = e
                        mention = " ".join(tokens[s : e + 1])
                        out["conv_id"].append(row.conv_id)
                        out["turn_idx"].append(row.turn_idx)
                        out["sent_idx"].append(row.sent_idx)
                        out["split_idx"].append(row.split_idx)
                        out["ext_idx"].append(row.ext_idx)
                        out["arg_pos"].append(arg_pos)
                        out["mention"].append(mention)
                        out["surface_norm"].append(normalize_surface(mention))
                        out["begin_word"].append(s)
                        out["end_word"].append(e)
            yield pd.DataFrame(out)

    cols = [
        "conv_id", "turn_idx", "sent_idx", "split_idx", "ext_idx",
        "arg1", "arg2",
    ]
    return triples.select(*cols).mapInPandas(run, schema=MENTION_SCHEMA)
