"""Job/task lifecycle as Structured Streaming + batch state transitions.

The reference's asynchrony is a state machine over a message queue
(job.go:28-57 states, cmd/consolidater/main.go:117-170 queue loop).  Parity
does not require streaming (SURVEY §2.9), but the natural Spark surface is:

- a ``tasks`` parquet/Delta table as the queue (append = enqueue)
- a Structured Streaming reader over it with ``foreachBatch`` applying the
  handler idempotently (the reference's retry/requeue semantics fall out of
  replayable micro-batches)
- windowed event aggregation with watermarks for the events table

This module provides both the streaming wiring and the batch-mode state
transition used by tests (same function, same semantics).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# state machine arcs (job.go:28-57, 350-641) — batch parity subset
_TRANSITIONS = {
    ("NEW", "ok"): "CREATED",
    ("CREATED", "ok"): "CONSOLIDATIONINPROGRESS",
    ("CONSOLIDATIONINPROGRESS", "ok"): "CONSOLIDATIONDONE",
    ("CONSOLIDATIONDONE", "ok"): "CONSOLIDATIONINDEXED",
    ("CONSOLIDATIONINDEXED", "ok"): "CONSOLIDATIONEFFECTIVE",
    ("CONSOLIDATIONINPROGRESS", "error"): "CONSOLIDATIONRETRYING",
    ("CONSOLIDATIONRETRYING", "ok"): "CONSOLIDATIONINPROGRESS",
    ("NEW", "cancel"): "CANCELLED",
    ("CREATED", "cancel"): "ABORTED",
    ("CONSOLIDATIONINPROGRESS", "cancel"): "ABORTED",
}


def advance_job_state(state: str, event: str) -> str:
    nxt = _TRANSITIONS.get((state, event))
    if nxt is None:
        raise ValueError(f"illegal transition {state} --{event}-->")
    return nxt


def task_counters(tasks: DataFrame) -> DataFrame:
    """A10: per-job task-state counters via pivot (job.go:772-800)."""
    return (
        tasks.groupBy("job_id")
        .pivot("state", ["NEW", "PENDING", "DONE", "FAILED", "CANCELLED"])
        .count()
        .na.fill(0)
    )


def stream_events_windowed(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Structured Streaming windowed aggregation over the events table:
    event-time tumbling windows with late-data watermarking.  readStream over
    a parquet directory, so the same query runs against a live landing zone.
    """
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    # watermarks require TIMESTAMP (tz-aware); parquet NTZ columns are cast
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def run_task_queue_stream(
    spark: SparkSession,
    tasks_path: str,
    handler: Callable[[DataFrame, int], None],
    checkpoint: str,
):
    """The queue loop: stream new task rows, apply handler per micro-batch.
    Idempotent handlers + checkpointing reproduce the reference's retry
    semantics (main.go:131-147) without a broker."""
    schema = spark.read.parquet(tasks_path).schema
    stream = spark.readStream.schema(schema).parquet(tasks_path)
    return (
        stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
