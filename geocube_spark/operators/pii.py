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
