"""Custom stateful streaming operator: event sessionization.

The reference has no streaming surface (SURVEY §2.9); this is the
beyond-reference stateful-operator pattern the engine exposes for training
-data pipelines: ``applyInPandasWithState`` with per-key session state,
gap-based session closure, and processing-time timeouts.

Batch twin ``sessionize_batch`` (window over event gaps) defines the exact
semantics; the streaming operator must converge to it on a closed input —
that equivalence is the test contract.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", IntegerType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("end_us", LongType(), True),
        StructField("n", IntegerType(), True),
        StructField("total", DoubleType(), True),
    ]
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_minutes``.  Pure window
    functions — the semantic reference for the stateful operator."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    flagged = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "_session_idx", F.sum("_new_session").over(w)
    )
    return (
        sessioned.groupBy("user_id", "_session_idx")
        .agg(
            F.min(F.col("ts").cast("timestamp")).alias("session_start"),
            F.max(F.col("ts").cast("timestamp")).alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .drop("_session_idx")
    )


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    gap_us = 30 * 60 * 1_000_000
    (user_id,) = key

    if state.hasTimedOut:
        if state.exists:
            start_us, end_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )
        return

    events = pd.concat(list(pdfs)).sort_values("ts")
    ts_us = events["ts"].astype("int64") // 1000  # ns -> us
    values = events["value"].to_numpy()

    closed: list[tuple[int, int, int, float]] = []
    if state.exists:
        start_us, end_us, n, total = state.get
    else:
        start_us, end_us, n, total = None, None, 0, 0.0

    for t, v in zip(ts_us, values):
        t = int(t)
        if start_us is None:
            start_us, end_us, n, total = t, t, 1, float(v)
        elif t - end_us > gap_us:
            closed.append((start_us, end_us, n, total))
            start_us, end_us, n, total = t, t, 1, float(v)
        else:
            end_us, n, total = t, n + 1, total + float(v)

    state.update((start_us, end_us, n, total))
    state.setTimeoutDuration(60_000)  # close open sessions after idle

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [c[3] for c in closed],
            }
        )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming sessionization over a (user_id, ts, value) stream."""
    typed = events_stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    return typed.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
