"""Stateful streaming exact-dedup: emit each document the FIRST time its
normalized fingerprint is seen; suppress every later duplicate.

The batch twin ``dedup_first_seen_batch`` (hash-groupBy keep-min) defines
the semantics; the streaming operator converges to it on a closed input —
processed in one micro-batch the outputs are identical, and across many
micro-batches the emitted fingerprint set is identical with the kept doc
being the first to ARRIVE (append mode cannot retract an already-emitted
doc when a smaller id shows up later; that ordering sensitivity is the
documented contract, mirrored by the tests).

State per fingerprint is 12 bytes (kept id + dup count); keys are md5
strings, hash-partitioned across the state store.  For an UNBOUNDED corpus
both scale knobs are wired here, not just documented:

* ``ttl_minutes``: processing-time state TTL
  (GroupStateTimeout.ProcessingTimeTimeout + setTimeoutDuration on every
  update) — a fingerprint idle longer than the TTL is EVICTED, so state
  size plateaus at the distinct-fingerprint rate per TTL window instead of
  growing with the corpus.  The documented trade-off: a duplicate arriving
  after its original's eviction is re-emitted (bounded-window dedup — the
  standard unbounded-corpus contract).
* ``rocksdb_state_conf()``: the session conf that swaps the in-memory
  HDFS-backed store for RocksDB so state spills to local disk
  (spark.sql.streaming.stateStore.providerClass).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("fingerprint", StringType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("kept_doc_id", LongType(), True),
        StructField("n_dupes", IntegerType(), True),
    ]
)


def dedup_first_seen_batch(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch twin: one row per fingerprint, keeping the smallest doc_id.
    Single hash shuffle on the 16-byte fingerprint (same plan as
    dedup.dedup_exact)."""
    from geocube_spark.functions.text import normalized_md5

    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            normalized_md5(F.col(text_col)).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fingerprint")
    )


def _make_dedup_fn(ttl_ms: int | None):
    def _dedup_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (fp,) = key
        if ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL with no new duplicates: evict.  A later
            # arrival of this fingerprint re-enters as first-seen.
            state.remove()
            return
        ids = pd.concat(list(pdfs))["doc_id"]
        n = int(len(ids))
        if state.exists:
            kept, dupes = state.get
            state.update((kept, dupes + n))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # activity resets the TTL
            return  # all duplicates: emit nothing
        kept = int(ids.min())
        state.update((kept, n - 1))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"doc_id": [kept], "fingerprint": [fp]})

    return _dedup_fn


# module-level default keeps the no-TTL closure picklable by reference
_dedup_fn = _make_dedup_fn(None)


def rocksdb_state_conf() -> dict[str, str]:
    """Session conf for a disk-backed state store — required before the
    state outgrows executor heap on an unbounded corpus.  Apply at session
    build or via spark.conf.set BEFORE the query starts."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        # bound RocksDB memory usage across all state store instances
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
    }


def dedup_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    ttl_minutes: float | None = None,
) -> DataFrame:
    """Streaming first-seen dedup over a (doc_id, text) stream.

    ``ttl_minutes`` turns on processing-time state eviction (see module
    docstring); None keeps state forever (bounded corpora only)."""
    from geocube_spark.functions.text import normalized_md5

    typed = docs_stream.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        normalized_md5(F.col(text_col)).alias("fingerprint"),
    )
    ttl_ms = None if ttl_minutes is None else max(1, int(ttl_minutes * 60_000))
    return typed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn if ttl_ms is None else _make_dedup_fn(ttl_ms),
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
