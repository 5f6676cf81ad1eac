"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9): streaming exact dedup — emit each key's first-seen event
only, with per-key state surviving across micro-batches. This is the
streaming twin of the batch dedup-keep-first (W5) and the scale pattern
for exactly-once-ish ingest of a 100 TB event firehose.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "dedup_key string, first_ts timestamp, n_duplicates long"
STATE_SCHEMA = "first_ts timestamp, n_seen long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_prev = 0
    first_ts = None
    if state.exists:
        first_ts, n_prev = state.get
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values("ts")
    n_new = len(batch)
    is_first_sighting = first_ts is None
    if is_first_sighting:
        first_ts = batch["ts"].iloc[0]
    state.update((first_ts, n_prev + n_new))
    if is_first_sighting:
        yield pd.DataFrame(
            {
                "dedup_key": [key[0]],
                "first_ts": [first_ts],
                "n_duplicates": [n_new - 1],
            }
        )


def streaming_dedup_first(events: DataFrame, key_col: str = "dedup_key") -> DataFrame:
    """First-seen-only stream: one output row per new key, state keeps
    (first_ts, n_seen) per key. Works under both batch-ish AvailableNow
    triggers and continuous micro-batches."""
    return events.groupBy(key_col).applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
