"""Mergeable frequent-items sketch (Misra–Gries / lossy-counting family).

Finding every term with frequency above N/k without shuffling the full
term stream: each Arrow batch is summarized locally by exact counts MINUS
the batch's deficit floor(n_batch/(k+1)) (Manku–Motwani lossy-count
pruning — the vectorized equivalent of Misra–Gries decrements), then the
tiny summaries merge by summation.  Guarantees, preserved under merge:

  * est(t) <= true(t)                                (only undercounts)
  * true(t) - est(t) <= sum_i n_i/(k+1) <= N/k       (bounded deficit)

so any term with true count > N/k has est > 0 and MUST appear in the
merged candidate set — no false negatives above the threshold, the
property the registered query's oracle asserts as a theorem.  The full
term stream never shuffles: only per-batch summaries (<= a few k rows
each) reach the merge aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SUMMARY_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("est", LongType(), False),
    ]
)


def frequent_items_summaries(
    terms: DataFrame, k: int, term_col: str = "term"
) -> DataFrame:
    """Per-batch lossy-count summaries of the term stream: exact batch
    counts minus floor(n_batch/(k+1)), zero-pruned."""

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            counts = pdf[term_col].value_counts()
            deficit = n // (k + 1)
            est = counts - deficit
            est = est[est > 0]
            yield pd.DataFrame(
                {"term": est.index.astype(str), "est": est.values.astype("int64")}
            )

    return terms.select(F.col(term_col).cast("string").alias(term_col)).mapInPandas(
        run, _SUMMARY_SCHEMA
    )


def heavy_hitter_candidates(
    terms: DataFrame, k: int, term_col: str = "term"
) -> DataFrame:
    """(term, est): merged candidate set.  Every term whose true count
    exceeds N/k is guaranteed present; est never exceeds the true count
    and undershoots by at most N/k."""
    return (
        frequent_items_summaries(terms, k, term_col)
        .groupBy("term")
        .agg(F.sum("est").cast("long").alias("est"))
    )
