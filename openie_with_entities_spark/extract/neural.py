"""Neural labeling backend: the production implementation of the labeler
contract, driving the reference's BERT checkpoints inside the same
mapInPandas stages as the deterministic backend.

Not runnable in this sandbox (torch/transformers are not installed and the
checkpoints are not shipped) — the module import-gates cleanly and documents
the exact integration points:

  * per-worker singleton model (the reference's module-level tagger pattern,
    /root/reference/data.py:28): loaded lazily on first batch, reused for
    the worker's lifetime; checkpoint path distributed via
    ``spark-submit --files`` or an object-store path.
  * batch-level inference: one tokenizer call + one forward per Arrow batch
    (re-chunked to ``model_batch_size``), per-depth early exit at the batch
    level exactly as /root/reference/model.py:180-188.
  * output contract identical to extract.labeler: per-sentence label matrix
    (depths × tokens) + per-depth confidences
    (= exp(mean of max log-probs over non-NONE words),
    /root/reference/model.py:201-209).
"""

from __future__ import annotations

from dataclasses import dataclass

_IMPORT_ERROR: Exception | None = None
try:  # pragma: no cover - not installed in this sandbox
    import torch  # noqa: F401
    import transformers  # noqa: F401

    HAS_TORCH = True
except Exception as e:  # pragma: no cover
    HAS_TORCH = False
    _IMPORT_ERROR = e

_WORKER_MODELS: dict[str, object] = {}  # per-python-worker singletons


@dataclass
class NeuralConfig:
    checkpoint_path: str
    model_str: str = "bert-base-cased"
    task: str = "oie"  # or "conj"
    model_batch_size: int = 32
    max_depth: int = 5
    device: str = "cpu"


def _require_torch() -> None:
    if not HAS_TORCH:
        raise NotImplementedError(
            "neural backend needs torch+transformers (not installed in this "
            f"sandbox; import error: {_IMPORT_ERROR!r}). The deterministic "
            "backend (extract.labeler) drives the same stages."
        )


def get_model(cfg: NeuralConfig):
    """Lazy per-worker singleton — called inside the mapInPandas body."""
    _require_torch()
    key = f"{cfg.task}:{cfg.checkpoint_path}"
    if key not in _WORKER_MODELS:  # pragma: no cover
        import torch
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(cfg.model_str, use_fast=True)
        state = torch.load(cfg.checkpoint_path, map_location=cfg.device)
        _WORKER_MODELS[key] = (tok, state)
    return _WORKER_MODELS[key]


def neural_label_matrices(
    sentences: list[str], cfg: NeuralConfig
) -> list[tuple[list[list[int]], list[float]]]:
    """Batched labeling for a list of (sentinel-suffixed) sentences.

    Production body (pseudocode, verified against the reference flow):
        tok, model = get_model(cfg)
        for chunk in chunks(sentences, cfg.model_batch_size):
            enc = tok(chunk, is_split_into_words=False, ...)
            for depth in range(cfg.max_depth):       # label-embedding feedback
                logits = model(enc, depth)
                if no_valid_extraction(logits): break  # batch-level early exit
        return per-sentence (label_matrix, confidences)
    """
    _require_torch()
    raise NotImplementedError(  # pragma: no cover
        "checkpoints not shipped in this sandbox"
    )
