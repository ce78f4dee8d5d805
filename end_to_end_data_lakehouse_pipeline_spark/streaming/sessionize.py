"""Custom stateful streaming operator: gap-based sessionization.

The reference has no stateful stream processing (ST6: state lives in Delta
+ batch MERGE). This is the capability upgrade SURVEY.md §2.8 names:
``applyInPandasWithState`` — Spark's arbitrary-stateful-operator API —
maintaining one open session per user and emitting a session row when an
event gap exceeds the threshold.

Scale shape: state is partitioned by the group key across executors and
checkpointed by the state store; each micro-batch ships only that batch's
events (Arrow batches) plus O(1) state per live key. Nothing here is
per-event Python except inside vectorized pandas frames.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

# state: open-session accumulator, timestamps as epoch micros (int64 keeps
# Arrow/pandas round-trips exact and tz-free)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events(user_id, ts, value) -> closed sessions per user.

    A session closes when the next event for the user arrives more than
    ``gap_minutes`` after the previous one; the still-open session stays
    in state across micro-batches.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        events_us: list[tuple[int, float]] = []
        for pdf in pdfs:
            ts_us = (pdf["ts"].astype("int64") // 1000).to_list()  # ns -> us
            events_us.extend(zip(ts_us, pdf["value"].to_list()))
        events_us.sort()

        if state.exists:
            start_us, last_us, n_events, total_value = state.get
        else:
            start_us, last_us, n_events, total_value = None, None, 0, 0.0

        closed: list[tuple[int, int, int, float]] = []
        for ts_us, value in events_us:
            if last_us is not None and ts_us - last_us > gap_us:
                closed.append((start_us, last_us, n_events, total_value))
                start_us, n_events, total_value = ts_us, 0, 0.0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n_events += 1
            total_value += value

        state.update((start_us, last_us, n_events, total_value))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                    "n_events": [n for _, _, n, _ in closed],
                    "total_value": [v for _, _, _, v in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
