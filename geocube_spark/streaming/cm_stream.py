"""Streaming count-min sketch build.

The contrast with the Misra–Gries stream (freq_stream.py) is the point:
MG is a DECREMENT sketch, so streaming it needs custom per-shard state
(applyInPandasWithState carrying counters + deficit).  Count-min is
purely ADDITIVE — sketch(A ∪ B) = sketch(A) + sketch(B) cell by cell
(proven in tests/test_sketches_cm.py) — so its streaming build is a
NATIVE streaming aggregation: the same ``countmin_cells`` plan run over
a streaming frame, with Spark's own state store holding exactly the
d×w counter cells.  State is bounded at d×w rows FOREVER, regardless of
stream length or term cardinality; complete-mode output re-emits the
tiny matrix every trigger and point queries join the latest snapshot.

No new operator code is required — that is the design win of picking a
mergeable sketch — so this module only re-exports the batch builder
under its streaming name and documents the contract the stream==batch
test (tests/test_streaming_ops.py::TestStreamingCountMin) pins down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from geocube_spark.operators.sketches import CM_DEPTH, CM_WIDTH, countmin_cells


def countmin_stream(
    terms: DataFrame, d: int = CM_DEPTH, w: int = CM_WIDTH, term_col: str = "term"
) -> DataFrame:
    """``terms``: a STREAMING frame with a term column.  Returns the
    streaming cells aggregate — write with outputMode("complete") (the
    result is at most d*w rows) or "update" for incremental sinks."""
    return countmin_cells(terms, d, w, term_col)
