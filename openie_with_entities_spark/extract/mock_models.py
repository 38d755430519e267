"""Deterministic mock DepthModels: one-hot scores reproducing the rule
labelers through the neural control flow. Used by tests and by sandbox runs
of the NeuralBackend (workers must be able to import these, so they live in
the package, not under tests/)."""

from __future__ import annotations

from .labeler import conj_label_matrix, oie_label_matrix
from .neural import DepthModel


def _one_hot(labels: list[int]) -> list[list[float]]:
    return [[8.0 if l == lab else 0.0 for l in range(6)] for lab in labels]


class LabelerMock(DepthModel):
    """OIE scores = one-hot of the deterministic rule labeler's depth rows —
    lets the full neural control flow be checked against the engine's
    oracle-verified decode path."""

    def score_depth(self, batch, depth, prev_labels):
        out = []
        for e in batch:
            rows, _ = oie_label_matrix(e.words)
            labels = rows[depth] if depth < len(rows) else [0] * len(e.words)
            out.append(_one_hot(labels))
        return out


class ConjLabelerMock(DepthModel):
    """Conjunction scores = one-hot of the deterministic conj labeler."""

    def score_depth(self, batch, depth, prev_labels):
        out = []
        for e in batch:
            rows = conj_label_matrix(e.words)
            labels = rows[depth] if depth < len(rows) else [0] * len(e.words)
            out.append(_one_hot(labels))
        return out


def fake_wordpiece_tokenizer(word: str) -> list[int]:
    """Deterministic tokenizer stand-in: one wordpiece per 4 chars, ids
    derived from the word's bytes."""
    return [1000 + b for b in word.encode()[:12:4]]
