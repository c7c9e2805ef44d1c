"""Stream-stream event-time interval joins (attribution shape).

The reference has no streaming plane (§2.9); this is part of the repo's
beyond-reference streaming surface: join two event streams on a key AND an
event-time interval (the "attribute each purchase to clicks in the last N
minutes" shape), with watermarks bounding the join state on BOTH sides —
the canonical Structured Streaming state-cleanup contract: a click older
than (purchase watermark − interval) can never match again and is evicted.

The same builder serves batch DataFrames unchanged (withWatermark is a
no-op in batch), so the stream==batch convergence test runs one code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join right rows whose timestamp falls in
    ``[left_ts - lookback, left_ts)`` for the same key.

    Column contract: caller renames timestamp columns to distinct names
    (``l_ts`` / ``r_ts``) and prefixes payload columns; the join emits one
    row per matching pair (append-safe in streaming — no aggregation, so
    any downstream rollup happens per micro-batch or in batch mode).

    Scale shape: streaming state is bounded by watermark + interval; in
    batch Catalyst plans the same predicate as an equi-join on the key
    with the time range as a post-filter residual — one shuffle per side.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (rw[right_ts] < F.col(left_ts))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
