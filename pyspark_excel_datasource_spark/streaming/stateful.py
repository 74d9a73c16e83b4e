"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's streaming layer carries no state at all beyond a seen-files
set (reference ``connector.py:211-213``); this module shows the engine-side
pattern for arbitrary keyed state: a running per-user aggregate whose state
(count + exact value cents) survives across micro-batches and is updated
incrementally — the building block for sessionization, CDC folds, and
online feature accumulation at scale (state lives in the state store,
partitioned by key; each micro-batch touches only keys with new data).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, exact integer cents) per user across batches."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream → per-user running totals.

    Works on a streaming DataFrame (state store backed); the exact-cents
    accumulation keeps totals integer-deterministic regardless of batch
    boundaries.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
