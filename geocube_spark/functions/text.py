"""Text-analysis kernels for the training-data pipeline operators.

All hot-path functions are pure Column expressions (JVM-side, codegen'd) so
they scale to 100 TB of documents without Python in the loop; each has a
DuckDB SQL twin for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword lists for the n-gram/stopword language heuristic.  Tiny by design:
# language ID at scale is a ratio of indicator-token hits, all computed with
# built-in string functions.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count. SQL twin: len(regexp_split_to_array(trim(x),'\\s+'))"""
    return F.size(F.split(F.trim(col), r"\s+"))


def token_count_sql(c: str) -> str:
    return f"len(regexp_split_to_array(trim({c}), '\\s+'))"


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: count of word-piece matches (letter runs,
    digit runs, single punctuation) — a deterministic proxy for tokenizer
    counts usable as a budget estimator."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def bpe_ish_token_count_sql(c: str) -> str:
    return f"len(regexp_extract_all({c}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of non-alnum/non-space characters — quality signal."""
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return punct / F.greatest(F.length(col), F.lit(1))


def punct_ratio_sql(c: str) -> str:
    return (
        f"length(regexp_replace({c}, '[A-Za-z0-9\\s]', '', 'g'))"
        f" / greatest(length({c}), 1)"
    )


def _in_markers(markers: list[str]):
    """1-arg HOF lambda factory: token ∈ marker set via array_contains."""
    arr = F.array(*[F.lit(m) for m in markers])
    return lambda t: F.array_contains(arr, t)


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """stopword hits / token count for one language's marker set."""
    markers = LANG_MARKERS[lang]
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    hits = F.size(F.filter(toks, _in_markers(markers)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio_sql(c: str, lang: str = "en") -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    toks = f"regexp_split_to_array(lower(trim({c})), '\\s+')"
    return (
        f"len(list_filter({toks}, t -> t IN ({markers})))"
        f" / greatest(len({toks}), 1)"
    )


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: length norm + low punctuation +
    mean-word-length sanity.  Deterministic, SQL-expressible."""
    n_chars = F.length(col)
    length_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(5.0), F.lit(1.0))
    mean_word = n_chars / F.greatest(token_count(col), F.lit(1))
    word_term = F.when((mean_word >= 3) & (mean_word <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_term + punct_term + word_term) / F.lit(3.0)


def quality_score_sql(c: str) -> str:
    n = f"length({c})"
    toks = token_count_sql(c)
    punct = punct_ratio_sql(c)
    mean_word = f"({n} / greatest({toks}, 1))"
    return (
        f"(least({n} / 500.0, 1.0)"
        f" + (1.0 - least(({punct}) * 5.0, 1.0))"
        f" + (CASE WHEN {mean_word} >= 3 AND {mean_word} <= 10 THEN 1.0 ELSE 0.5 END)"
        f") / 3.0"
    )


def lang_guess(col: Column) -> Column:
    """Heuristic language ID: argmax of marker-token hit counts, 'und' when
    no marker hits.  Entirely built-in functions (F.split/filter/size)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    scores = [
        (lang, F.size(F.filter(toks, _in_markers(markers))))
        for lang, markers in LANG_MARKERS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # first language (in insertion order) achieving the max wins ties —
    # iterate reversed so earlier langs override later ones
    for lang, score in reversed(scores):
        result = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(result)
    return result


def lang_guess_sql(c: str) -> str:
    toks = f"regexp_split_to_array(lower(trim({c})), '\\s+')"
    score = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(score.values())})"
    whens = " ".join(
        f"WHEN {score[lang]} = __best AND __best > 0 THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    # DuckDB lacks lambda-closure reuse; inline via a scalar subquery-free CASE
    inlined = " ".join(
        f"WHEN {score[lang]} = {best} AND {best} > 0 THEN '{lang}'" for lang in LANG_MARKERS
    )
    _ = whens
    return f"CASE {inlined} ELSE 'und' END"


def fingerprint64(col: Column) -> Column:
    """Document fingerprint: xxhash64 of normalized text (lowercase,
    whitespace-collapsed).  Spark-native 64-bit hash; used for exact-dup
    detection where md5 strings would double the shuffle width."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(normalized)


def normalized_md5(col: Column) -> Column:
    """Portable fingerprint (md5 hex) of normalized text — matches DuckDB's
    md5() for oracle-checked dedup queries."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def normalized_md5_sql(c: str) -> str:
    return f"md5(regexp_replace(lower(trim({c})), '\\s+', ' ', 'g'))"
