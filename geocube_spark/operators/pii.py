"""PII detection / redaction over document tables (LLM-pipeline op).

Training-data curation scrubs personally-identifiable information before
anything else touches the corpus.  This operator is a pure narrow map —
JVM-side ``regexp_count`` / ``regexp_replace`` only, no UDF, no shuffle —
so at 100 TB it rides whole-stage codegen at scan speed and composes with
any upstream filter pushdown (the regex evaluation is the bottleneck, not
the plan).

Patterns are written in the common subset of Java regex (Spark) and RE2
(DuckDB) so the SQL oracle twin evaluates the identical automaton:
no backreferences, no lookaround, ``\\b`` word boundaries only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# class name -> (pattern, replacement) — ORDER MATTERS for redaction:
# emails first (their local part can contain digits that phone/id patterns
# would otherwise nibble), then phones, IPs, SSN-style ids.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?\d{1,3}-\d{3}-\d{4}", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts on the ORIGINAL text (counts are computed
    before any redaction so classes don't shadow each other)."""
    return {
        name: F.regexp_count(text, F.lit(pattern)).cast("long")
        for name, pattern, _ in PII_PATTERNS
    }

def pii_redact_column(text: Column) -> Column:
    """Sequentially replace every PII class (PII_PATTERNS order)."""
    out = text
    for _, pattern, replacement in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Append per-class count columns (``n_email`` ...) and a fully
    redacted text column.  Narrow map: no shuffle, no Python in the hot
    path; scales to any corpus the scan itself scales to."""
    counts = pii_counts(F.col(text_col))
    out = df
    for name, col in counts.items():
        out = out.withColumn(f"n_{name}", col)
    return out.withColumn(out_col, pii_redact_column(F.col(text_col)))


# ------------------------------------------------------------ k-anonymity

# Full-domain generalization (Samarati 2001 / Sweeney 2002): coarsen the
# quasi-identifier columns through a fixed ladder of generalization levels
# until every published group holds at least k rows; groups that stay
# smaller at the coarsest level are SUPPRESSED.  Global recoding — one
# level applies to the whole release — is the classic baseline every
# k-anonymity system defines itself against, and it is purely relational:
# one groupBy per ladder level (each a shrinking-cardinality aggregate),
# a min() over group sizes, and a CASE on the chosen level.  At 100 TB
# each level pass is a map-side-combined count over at most |QI-domain|
# groups; levels are few and fixed.


def k_anonymity_report(
    events: DataFrame,
    k: int,
    levels: list[tuple[str, Column]],
) -> DataFrame:
    """``levels``: (name, qi_expr) from finest to coarsest; each qi_expr
    maps a row to its quasi-identifier group key at that level.  Returns
    one row PER LEVEL: (level, level_name, n_groups, n_small_groups,
    min_group_size, n_suppressed_rows, chosen) — ``chosen`` marks the
    finest level whose every group reaches k (or the coarsest level,
    where the sub-k groups' rows count as suppressed)."""
    per_level = []
    for idx, (name, expr) in enumerate(levels):
        g = events.select(expr.alias("qi")).groupBy("qi").agg(
            F.count(F.lit(1)).alias("n")
        )
        per_level.append(
            g.agg(
                F.lit(idx).alias("level"),
                F.lit(name).alias("level_name"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum((F.col("n") < k).cast("int")).cast("long").alias("n_small_groups"),
                F.min("n").cast("long").alias("min_group_size"),
                F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
                .cast("long")
                .alias("n_suppressed_rows"),
            )
        )
    stacked = per_level[0]
    for frame in per_level[1:]:
        stacked = stacked.unionByName(frame)
    from pyspark.sql import Window

    # chosen = the finest fully-anonymous level, else the coarsest ladder
    # rung (publishing with suppression)
    w = Window.partitionBy()
    ok_min = F.min(F.when(F.col("n_small_groups") == 0, F.col("level"))).over(w)
    last = F.max("level").over(w)
    return (
        stacked.withColumn(
            "chosen",
            (F.col("level") == F.coalesce(ok_min, last)).cast("int"),
        )
        .orderBy("level")
    )


def k_anonymity_report_sql(
    k: int, levels: list[tuple[str, str]], table: str = "events"
) -> str:
    """DuckDB twin over the same ladder of SQL qi expressions."""
    sel = []
    for idx, (name, expr) in enumerate(levels):
        sel.append(f"""
        SELECT {idx} AS level, '{name}' AS level_name,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN n < {k} THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
               CAST(min(n) AS BIGINT) AS min_group_size,
               CAST(sum(CASE WHEN n < {k} THEN n ELSE 0 END) AS BIGINT) AS n_suppressed_rows
        FROM (SELECT {expr} AS qi, count(*) AS n FROM {table} GROUP BY 1)
        """)
    union = " UNION ALL ".join(sel)
    return f"""
    WITH lv AS ({union})
    SELECT level, level_name, n_groups, n_small_groups, min_group_size,
           n_suppressed_rows,
           CAST(CASE WHEN level = coalesce(
               (SELECT min(level) FROM lv WHERE n_small_groups = 0),
               (SELECT max(level) FROM lv)) THEN 1 ELSE 0 END AS INT) AS chosen
    FROM lv ORDER BY level
    """
