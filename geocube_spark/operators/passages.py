"""Duplicated-passage detection: positional word k-grams shared across the
corpus, merged into per-document spans.

The passage-level sibling of document dedup ("Deduplicating Training Data
Makes Language Models Better", Lee et al. 2022 — exact substring dedup):
instead of dropping whole near-duplicate documents, find the SPANS that are
verbatim-repeated anywhere in the corpus (boilerplate headers, license
blocks, quoted chain mail) so curation can cut or down-weight them.

Plan shape (no driver paths, nothing quadratic):

1. positional k-grams: one map-side explode — O(total tokens) rows of
   (doc_id, pos, xxhash64(gram)); the gram itself never shuffles, only the
   8-byte hash;
2. global frequency: hash-shuffle on the gram hash (map-side partial
   counts), keep hashes with count >= min_count;
3. duplicated positions: semi join of the gram stream against the
   duplicated-hash set (equi join on the hash, AQE handles hot boilerplate
   hashes);
4. spans: per-doc gaps-and-islands (pos - row_number() over pos is
   constant within a run of consecutive duplicated positions) — one
   window partitioned by doc_id, then one groupBy for span bounds.

Token positions are 1-based; a span's token extent is
[start_pos, end_pos + k - 1] so overlapping k-grams merge into one span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geocube_spark.operators.retrieval import tokens_expr, tokens_sql


def positional_kgram_hashes(
    docs: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, gram_hash) for every word k-gram occurrence — NOT
    distinct (positions matter).  Documents shorter than k tokens emit one
    truncated gram at pos 1, mirroring the shingle helpers.

    Two-level hashing: each token is xxhash64'd ONCE, then the gram hash
    is xxhash64 over the k-long slice of token hashes (Spark's hash
    functions accept arrays).  Hashing 8 longs instead of rebuilding an
    8-word string per position is ~7× faster end-to-end at sf0.1 —
    identical equality semantics (the oracle compares gram TEXT, so any
    behavioral drift would hash-mismatch).

    NULL-text documents are dropped: xxhash64(NULL) is the constant seed,
    which would make every null doc a mutual "duplicate" of the others,
    while SQL's NULL gram joins nothing — both engines skip them instead."""
    toks = tokens_expr(F.col(text_col))
    hashed = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("th"),
    )
    n = F.greatest(F.size(F.col("th")) - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.xxhash64(F.slice(F.col("th"), i, k)),
    )
    return hashed.select(
        "doc_id",
        F.posexplode(grams).alias("pos0", "gram_hash"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram_hash")


def duplicated_passage_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated spans: (doc_id, span_start, span_end,
    n_grams) where every k-gram starting in [span_start, span_end - k + 1]
    occurs >= min_count times corpus-wide."""
    grams = positional_kgram_hashes(docs, k, text_col, id_col)
    dup_hashes = (
        grams.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("gram_hash")
    )
    dup = grams.join(dup_hashes, "gram_hash", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup.withColumn("island", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .drop("island")
    )


def duplicated_passage_report(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document accounting: how much of each doc is corpus-duplicated
    passage material.  Docs with no duplicated span are omitted (join the
    corpus back for zeros if needed)."""
    spans = duplicated_passage_spans(docs, k, min_count, text_col, id_col)
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("n_dup_tokens"),
            F.max(F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("longest_span"),
        )
        .orderBy("doc_id")
    )


def duplicated_passage_report_sql(
    k: int = 8,
    min_count: int = 2,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of duplicated_passage_report — same tokenization
    (tokens_sql), gram text instead of hash (count equality is what
    matters), same gaps-and-islands span merge."""
    toks = tokens_sql(text_col)
    return f"""
    WITH base AS (
        SELECT CAST({id_col} AS BIGINT) AS doc_id, {toks} AS t FROM {table}
        WHERE {text_col} IS NOT NULL
    ),
    g AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               array_to_string(t[u.i : u.i + {k - 1}], ' ') AS gram
        FROM base,
             UNNEST(range(1, greatest(len(t) - {k - 1}, 1) + 1)) AS u(i)
    ),
    duph AS (
        SELECT gram FROM g GROUP BY gram HAVING count(*) >= {min_count}
    ),
    dup AS (
        SELECT g.doc_id, g.pos FROM g JOIN duph ON g.gram = duph.gram
    ),
    isl AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM dup
    ),
    spans AS (
        SELECT doc_id, min(pos) AS span_start,
               max(pos) + {k - 1} AS span_end,
               count(*) AS n_grams
        FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(span_end - span_start + 1) AS BIGINT) AS n_dup_tokens,
           CAST(max(span_end - span_start + 1) AS BIGINT) AS longest_span
    FROM spans GROUP BY doc_id ORDER BY doc_id
    """
