"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (byte-histogram features) stands in. The
Spark-side plumbing — schema, batch shape, partition sizing — is real and
tested; swapping the fake for PIL/torchvision changes only the inner
function.

Scale notes: binary payloads dominate partition size, so the stage
repartitions by a size-aware key first (``spark.sql.files.maxPartitionBytes``
governs the scan; the explicit repartition governs the UDF stage), and the
feature output drops the payload column immediately so downstream stages
never shuffle bytes they don't need.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState(i)
                kind = ["image", "audio", "video"][i % 3]
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": rng.bytes(256 + (i % 128)),
                        "width": 32 + i % 64 if kind == "image" else None,
                        "height": 32 + i % 48 if kind == "image" else None,
                        "duration_ms": 1000 + i * 7 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(4).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Real decoder hook — not available in this container."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg — not installed; "
            "use fake=True for the deterministic stand-in"
        )
    # deterministic fake: 16-bin byte histogram, L1-normalized (null
    # payloads featurize as empty bytes → the zero vector)
    arr = np.frombuffer(payload if payload is not None else b"", dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return hist / max(hist.sum(), 1.0)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Batched feature extraction; payload column dropped on output.

    Per-kind dispatch seam: the fake byte-histogram doubles as the feature
    stand-in for EVERY kind (the payload bytes are the only signal the
    sandbox has); a real upgrade swaps each kind's branch for its decoder
    (PIL / torchaudio / pyav) without touching the batch plumbing. Null
    payloads featurize as empty bytes instead of crashing the stage —
    MEDIA_SCHEMA declares payload nullable."""

    def feature_of(kind: str, payload) -> list:
        p = payload if payload is not None else b""
        if fake:
            return decode_image(p, fake=True).tolist()
        raise NotImplementedError(  # pragma: no cover - real-decoder seam
            f"real {kind} feature extraction requires the {kind} decoder"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                feature_of(k, p)
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.repartition("media_id").mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Real resize hook — needs PIL; the deterministic fake nearest-neighbor
    samples the payload down to width·height bytes (same batch shape and
    size contract as a real thumbnailer)."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL — not installed; use fake=True"
        )
    n = max(width * height, 1)
    arr = np.frombuffer(payload if payload is not None else b"", dtype=np.uint8)
    if len(arr) == 0:  # truncated/empty blob → empty thumbnail, not a crash
        return b""
    idx = (np.arange(n) * len(arr)) // n
    return arr[idx].tobytes()


def resize_images(
    media: DataFrame, width: int = 8, height: int = 8, fake: bool = True
) -> DataFrame:
    """Batched thumbnailing of image rows; non-images pass through
    untouched rows are DROPPED (resize is an image op). Output payload is
    the thumbnail — downstream shuffles carry width·height bytes, not the
    original."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            yield pd.DataFrame(
                {
                    "media_id": img["media_id"],
                    "payload": [
                        resize_image(p, width, height, fake=fake)
                        for p in img["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.repartition("media_id").mapInPandas(
        run, schema="media_id long, payload binary, width int, height int"
    )


def sample_frames(
    media: DataFrame, every_ms: int = 500, max_frames: int = 8, fake: bool = True
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled timestamp
    (0, every_ms, 2·every_ms, … up to duration_ms, capped at max_frames).
    The fake decoder slices a deterministic window of the payload per
    frame; a real decoder (pyav/ffmpeg) swaps in behind the same row
    contract. Frames explode row counts, so the stage emits only the frame
    bytes + typed metadata — never the source payload."""
    if not fake:
        raise NotImplementedError(
            "video decode requires pyav/ffmpeg — not installed; use fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            vid = pdf[pdf["kind"] == "video"]
            for mid, payload, dur in zip(
                vid["media_id"], vid["payload"], vid["duration_ms"]
            ):
                # nullable metadata: unknown duration samples the t=0 frame
                # only; a null payload slices as empty bytes
                payload = payload if payload is not None else b""
                dur = 0 if pd.isna(dur) else int(dur)
                n = min(dur // every_ms + 1, max_frames)
                for k in range(n):
                    lo = (k * len(payload)) // max(n, 1)
                    hi = ((k + 1) * len(payload)) // max(n, 1)
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": k,
                            "t_ms": k * every_ms,
                            "frame_payload": bytes(payload[lo:hi]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "t_ms", "frame_payload"],
            )

    return media.repartition("media_id").mapInPandas(
        run,
        schema="media_id long, frame_idx int, t_ms int, frame_payload binary",
    )


def feature_fingerprints(media: DataFrame, fake: bool = True) -> DataFrame:
    """Contract-friendly projection of ``extract_features``: every output
    column is a sortable scalar (the driver's canonicalizer sorts all
    columns, and array cells are unhashable in pandas). The feature vector
    survives as ``feature_fp`` = md5 of its 4-dp JSON rendering, plus
    ``feature_dim``/``feature_l1`` as numeric summaries — enough for a
    stable cross-run identity check without shipping the array."""
    feats = extract_features(media, fake=fake)
    rounded = F.transform(
        F.col("feature"), lambda x: F.round(x.cast("double"), 4)
    )
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.md5(F.to_json(rounded)).alias("feature_fp"),
        F.size("feature").alias("feature_dim"),
        F.round(
            F.aggregate(rounded, F.lit(0.0), lambda s, x: s + x), 4
        ).alias("feature_l1"),
    )
