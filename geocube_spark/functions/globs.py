"""Glob-pattern -> SQL LIKE translation.

Semantics mirror the reference's parseLike (interface/database/pg/pg.go:241-277,
unit table pg_test.go:15-26):

- ``*`` -> ``%``        (any run)
- ``?`` -> ``_``        (any single char)
- literal ``%`` and ``_`` in the user pattern are escaped
- a trailing ``(?i)`` requests case-insensitive matching (ILIKE)
- a pattern with no wildcard collapses to plain equality
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LikeSpec:
    pattern: str
    op: str  # "eq" | "like" | "ilike"


def glob_to_like(glob: str) -> LikeSpec:
    """Translate a user glob into (sql_pattern, operator)."""
    case_insensitive = glob.endswith("(?i)")
    if case_insensitive:
        glob = glob[: -len("(?i)")]

    out = []
    has_wildcard = False
    for ch in glob:
        if ch == "*":
            out.append("%")
            has_wildcard = True
        elif ch == "?":
            out.append("_")
            has_wildcard = True
        elif ch in ("%", "_"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    pattern = "".join(out)

    if not has_wildcard:
        # no wildcard: equality on the ORIGINAL text (escapes undone)
        return LikeSpec(glob, "ieq" if case_insensitive else "eq")
    return LikeSpec(pattern, "ilike" if case_insensitive else "like")


def like_filter(col: Column, glob: str) -> Column:
    """Column predicate applying a translated glob."""
    spec = glob_to_like(glob)
    if spec.op == "eq":
        return col == spec.pattern
    if spec.op == "ieq":
        return F.lower(col) == spec.pattern.lower()
    if spec.op == "like":
        return col.like(spec.pattern)
    return col.ilike(spec.pattern)


def like_sql(col_name: str, glob: str) -> str:
    """The same predicate as an ANSI-SQL fragment (for oracle parity)."""
    spec = glob_to_like(glob)
    esc = spec.pattern.replace("'", "''")
    if spec.op == "eq":
        return f"{col_name} = '{esc}'"
    if spec.op == "ieq":
        return f"lower({col_name}) = '{esc.lower()}'"
    if spec.op == "like":
        return f"{col_name} LIKE '{esc}'"
    return f"{col_name} ILIKE '{esc}'"
