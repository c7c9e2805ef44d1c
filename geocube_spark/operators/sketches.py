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

from geocube_spark.functions.text import md5_bucket

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


# ------------------------------------------------------------- count-min

# Cormode & Muthukrishnan 2005: a d x w counter matrix; every occurrence
# increments one counter per row (seeded bucket hash), a point query reads
# the MIN of its d counters.  est >= true always (counters only add);
# est - true <= eN with probability 1 - (1/2)^d for w = 2/e.  The sketch
# state is FIXED (d*w cells) no matter the term cardinality — the property
# that makes it the 100 TB path where an exact per-term groupBy would
# shuffle billions of distinct keys.  Bucket hashes use the portable md5
# recipe, so the DuckDB oracle rebuilds the identical matrix and the
# estimates (overcounts included) match exactly.

CM_DEPTH = 3
CM_WIDTH = 256


def countmin_cells(
    terms: DataFrame, d: int = CM_DEPTH, w: int = CM_WIDTH, term_col: str = "term"
) -> DataFrame:
    """Build the sketch: (seed, bucket, c) with exactly d*w live cells at
    most.  One shuffle of d tiny rows per occurrence into d*w groups —
    map-side partial aggregation collapses them to d*w rows per task
    before the exchange."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed")
    return (
        terms.select(F.col(term_col).alias("term"), seeds)
        .select("seed", md5_bucket(F.col("term"), F.col("seed"), w).alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_accuracy(
    terms: DataFrame,
    d: int = CM_DEPTH,
    w: int = CM_WIDTH,
    top: int = 20,
    term_col: str = "term",
) -> DataFrame:
    """Heavy terms (top ``top`` by exact count) with their count-min
    estimates: (term, true_cnt, est_cnt, overcount).  The exact side is
    the verification companion; the sketch side is the scale path."""
    cells = countmin_cells(terms, d, w, term_col)
    truth = (
        terms.groupBy(F.col(term_col).alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "term")
        .limit(top)
    )
    seeds = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed")
    probes = truth.select("term", "true_cnt", seeds).select(
        "term",
        "true_cnt",
        "seed",
        md5_bucket(F.col("term"), F.col("seed"), w).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("term", "true_cnt")
        .agg(F.min("c").cast("long").alias("est_cnt"))
        .select(
            "term",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("true_cnt"), "term")
    )


def countmin_accuracy_sql(
    terms_sql: str,
    d: int = CM_DEPTH,
    w: int = CM_WIDTH,
    top: int = 20,
) -> str:
    """DuckDB twin over a ``terms_sql`` relation exposing a ``term``
    column; rebuilds the same d x w matrix cell-for-cell."""
    from geocube_spark.functions.text import md5_bucket_sql

    seeds = "(SELECT unnest([" + ",".join(str(i) for i in range(d)) + "]) AS seed) s"
    bucket = md5_bucket_sql("term", "seed", w)
    return f"""
    WITH terms AS ({terms_sql}),
    cells AS (
        SELECT seed, {bucket} AS bucket, CAST(count(*) AS BIGINT) AS c
        FROM terms, {seeds} GROUP BY 1, 2
    ),
    truth AS (
        SELECT term, CAST(count(*) AS BIGINT) AS true_cnt
        FROM terms GROUP BY term
        ORDER BY true_cnt DESC, term LIMIT {top}
    ),
    probes AS (
        SELECT term, true_cnt, seed, {bucket} AS bucket FROM truth, {seeds}
    )
    SELECT p.term, p.true_cnt, CAST(min(c.c) AS BIGINT) AS est_cnt,
           CAST(min(c.c) - p.true_cnt AS BIGINT) AS overcount
    FROM probes p JOIN cells c ON p.seed = c.seed AND p.bucket = c.bucket
    GROUP BY p.term, p.true_cnt
    ORDER BY p.true_cnt DESC, p.term
    """
