"""Custom stateful streaming operator via applyInPandasWithState:
running per-key document statistics with explicit state.

The operator keeps, per user/domain key, a running (n_events,
sum_value_cents, last_ts) state across micro-batches and emits one
updated row per key per batch — the building block for "documents seen
per domain so far" style curation counters that outlive any single
micro-batch (something windowed aggs can't express without retraction).

State is a single tuple per key (bounded memory); a processing-time
timeout expires idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, sum_cents long, last_ts timestamp"
OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_cents long, last_ts timestamp"
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, cents, last_ts = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
        m = pdf["ts"].max()
        last_ts = m if last_ts is None or m > last_ts else last_ts
    state.update((n, cents, last_ts))
    state.setTimeoutDuration(3600 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_cents": [cents],
            "last_ts": [last_ts],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming frame in → one updated stats row per key per batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
