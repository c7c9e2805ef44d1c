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
strings, hash-partitioned across the state store.  At 100 TB cadence the
state store must be RocksDB-backed
(spark.sql.streaming.stateStore.providerClass) and long-idle fingerprints
aged out with a timeout if the corpus is unbounded — both deployment
knobs, not plan changes.
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


def _dedup_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    ids = pd.concat(list(pdfs))["doc_id"]
    n = int(len(ids))
    if state.exists:
        kept, dupes = state.get
        state.update((kept, dupes + n))
        return  # all duplicates: emit nothing
    kept = int(ids.min())
    state.update((kept, n - 1))
    yield pd.DataFrame({"doc_id": [kept], "fingerprint": [fp]})


def dedup_stream(docs_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming first-seen dedup over a (doc_id, text) stream."""
    from geocube_spark.functions.text import normalized_md5

    typed = docs_stream.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        normalized_md5(F.col(text_col)).alias("fingerprint"),
    )
    return typed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
