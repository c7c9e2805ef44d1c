"""Streaming frequent-items sketch: sharded Misra–Gries state.

The batch sketch (operators/sketches.py) summarizes a bounded corpus; a
stream needs STATE.  Misra–Gries is a decrement-counter sketch, so the
state per shard is one bounded counter table — but a single global table
would funnel every term through one task.  Terms are therefore hash-
SHARDED (a term lives in exactly one shard), each shard keeps its own
MG table of ``cap`` counters via ``applyInPandasWithState``, and the
read side merges the latest per-shard summaries.

Sharding strengthens the classic bound: shard s sees n_s terms, so for
a term t routed to s,  true(t) − est(t) <= deficit_s <= n_s/(cap+1)
<= N/(cap+1) — any term with global count above N/(cap+1) is guaranteed
present in its shard's table, across ANY micro-batch arrival order
(state carries counters + accumulated deficit between batches).

Each batch every updated shard emits its full summary stamped with the
monotone ``n_seen``; the read side keeps the latest stamp per shard
(update-semantics over an append sink, same recipe as the trending
top-k merge sink).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SUMMARY_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("term", StringType(), False),
        StructField("est", LongType(), False),
        StructField("n_seen", LongType(), False),
        StructField("deficit", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("terms", ArrayType(StringType()), True),
        StructField("ests", ArrayType(LongType()), True),
        StructField("deficit", LongType(), True),
        StructField("n_seen", LongType(), True),
    ]
)

_CAP = 50  # MG counters per shard; module-level so the state fn pickles it


def _mg_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (shard,) = key
    if state.hasTimedOut:  # no timeout configured; defensive
        return
    if state.exists:
        terms, ests, deficit, n_seen = state.get
        counters = dict(zip(terms, [int(e) for e in ests]))
        deficit, n_seen = int(deficit), int(n_seen)
    else:
        counters, deficit, n_seen = {}, 0, 0

    for pdf in pdfs:
        n_seen += len(pdf)
        for t, c in pdf["term"].value_counts().items():
            counters[t] = counters.get(t, 0) + int(c)
        while len(counters) > _CAP:
            m = min(counters.values())
            deficit += m
            counters = {t: c - m for t, c in counters.items() if c > m}

    state.update(
        (list(counters), [counters[t] for t in counters], deficit, n_seen)
    )
    if counters:
        yield pd.DataFrame(
            {
                "shard": [int(shard)] * len(counters),
                "term": list(counters),
                "est": list(counters.values()),
                "n_seen": [n_seen] * len(counters),
                "deficit": [deficit] * len(counters),
            }
        )


def freq_stream(terms_stream: DataFrame, n_shards: int = 16) -> DataFrame:
    """Streaming heavy-hitter summaries over a (term) stream: one MG
    counter table per hash shard, full summary re-emitted per updated
    shard stamped with the monotone n_seen."""
    sharded = terms_stream.select(
        F.col("term").cast("string").alias("term"),
        F.pmod(F.xxhash64("term"), F.lit(n_shards)).cast("int").alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _mg_fn,
        outputStructType=SUMMARY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_candidates(summaries: DataFrame) -> DataFrame:
    """Read-side merge of the append sink: keep each shard's latest
    summary (max n_seen), yielding the current (term, est) candidate
    set — every term above N/(cap+1) is guaranteed present."""
    return (
        summaries.withColumn("_mx", F.max("n_seen").over(Window.partitionBy("shard")))
        .filter(F.col("n_seen") == F.col("_mx"))
        .select("term", "est")
    )
