"""Custom stateful streaming operator: per-conversation running aggregates
with applyInPandasWithState.

Tracks, per conv_id, the running turn count and max turn_idx seen — the
streaming analog of per-conversation progress/lineage. (NoTimeout: in a
long-running deployment you would add an event-time timeout keyed to the
watermark to emit a final `closed` row and drop state; with availableNow
backfills a processing-time timeout keeps the trigger alive waiting for
expirations — measured — so the default stays timeout-free.)

This is the engine's demonstration of Spark's arbitrary-stateful-streaming
surface (SURVEY §2.6 lists it as engine-side capability; the reference is
batch-only).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turns_seen long, max_turn_idx int, closed boolean"
)
STATE_SCHEMA = "turns_seen long, max_turn_idx int"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (conv_id,) = key
    turns, max_idx = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        turns += len(pdf)
        # nullable turn_idx: an all-null batch makes .max() NaN and
        # int(NaN) would kill the stream — count the rows, skip the index
        idx = pdf["turn_idx"].dropna()
        if len(idx):
            max_idx = max(max_idx, int(idx.max()))
    state.update((turns, max_idx))
    yield pd.DataFrame(
        [{"conv_id": conv_id, "turns_seen": turns, "max_turn_idx": max_idx, "closed": False}]
    )


def conversation_progress(stream: DataFrame) -> DataFrame:
    """Streaming transcripts → running per-conversation progress rows."""
    return (
        stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
