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


# --- TTL dedup: the streaming form of queries/streaming.py::st8 -----------
#
# Per (user_id, event_type), an event is suppressed when it arrives
# within TTL of the PREVIOUS event of that key (kept or suppressed —
# the chaining/burst semantics). State is one microsecond timestamp
# per live key; each micro-batch sorts its own rows, and the chain is
# correct whenever the source delivers micro-batches in event-time
# order (the test feeds time-split files; production fronts this with
# a watermark/reorder stage). The batch twin st8_ttl_dedup computes
# the identical kept set declaratively — tests assert set equality.

TTL_OUTPUT_SCHEMA = (
    "user_id long, event_type string, kept_event_id long, kept_us long"
)
TTL_STATE_SCHEMA = "last_us long"


def make_ttl_fn(ttl_us: int):
    def _ttl_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last_us,) = state.get if state.exists else (None,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["us", "event_id"])
        kept_ids, kept_us = [], []
        for us, eid in zip(batch["us"], batch["event_id"]):
            us = int(us)
            if last_us is None or us - last_us > ttl_us:
                kept_ids.append(int(eid))
                kept_us.append(us)
            last_us = us
        state.update((last_us,))
        if kept_ids:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(kept_ids),
                    "event_type": [key[1]] * len(kept_ids),
                    "kept_event_id": kept_ids,
                    "kept_us": kept_us,
                }
            )

    return _ttl_fn


def streaming_ttl_dedup(events: DataFrame, ttl_us: int) -> DataFrame:
    """TTL-chained dedup over a stream of (user_id, event_type,
    event_id, us): emits each burst's opening event as it arrives;
    state is one BIGINT per live key."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        make_ttl_fn(ttl_us),
        outputStructType=TTL_OUTPUT_SCHEMA,
        stateStructType=TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
