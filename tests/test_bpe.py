"""Distributed BPE training/apply: hand-computed merge vectors, greedy
non-overlap semantics, and DuckDB oracle parity on the real corpus."""

from __future__ import annotations

import os

import pytest

from geocube_spark.operators.bpe import bpe_apply, bpe_train, bpe_train_sql

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


class TestBPETrain:
    def test_hand_computed_merges(self, spark):
        # words: 'aa' x2, 'ab' x1 -> round 1 merges (a,a) n=2; round 2 (a,b) n=1
        df = spark.createDataFrame(
            [(1, "aa aa ab")], "doc_id long, text string"
        )
        rows = sorted(
            bpe_train(df, n_merges=2).collect(), key=lambda r: r["merge_rank"]
        )
        assert [(r["pair"], r["merged"], r["n_occurrences"]) for r in rows] == [
            ("a a", "aa", 2),
            ("a b", "ab", 1),
        ]

    def test_greedy_nonoverlapping_pair_count_after_merge(self, spark):
        # 'aaa': spaced 'a a a' has TWO adjacent (a,a) pairs (naive count);
        # after the merge the word becomes [aa, a] (greedy left-to-right),
        # so round 2's best pair must be ('aa', 'a'), NOT ('a','a') again.
        df = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
        rows = sorted(
            bpe_train(df, n_merges=2).collect(), key=lambda r: r["merge_rank"]
        )
        assert rows[0]["pair"] == "a a"
        assert rows[0]["n_occurrences"] == 4  # naive adjacency: 2 per word
        assert rows[1]["pair"] == "aa a"

    def test_tie_break_lexicographic(self, spark):
        # 'ab' and 'cd' both appear once: pairs (a,b) and (c,d) tie at 1;
        # lexicographically smaller pair wins
        df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
        rows = bpe_train(df, n_merges=1).collect()
        assert rows[0]["pair"] == "a b"

    def test_matches_duckdb_oracle_on_corpus(self, spark, duck):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = {
            r["merge_rank"]: (r["pair"], r["merged"], r["n_occurrences"])
            for r in bpe_train(docs, n_merges=3).collect()
        }
        want = {
            rk: (p, m, n)
            for rk, p, m, n in duck.sql(bpe_train_sql(n_merges=3)).fetchall()
        }
        assert got == want


class TestBPEApply:
    def test_apply_learned_merges(self, spark):
        df = spark.createDataFrame([(1, "aab aaab")], "doc_id long, text string")
        out = bpe_apply(df, [("a", "a"), ("a", "b")]).collect()[0]
        # 'aab' -> [aa, b] ((a,b) can't fire: tail is the merged 'aa');
        # 'aaab' -> greedy (a,a) gives [aa, a, b], then (a,b) -> [aa, ab]
        assert out["tokens"] == ["aa", "b", "aa", "ab"]
        assert out["n_tokens"] == 4

    def test_apply_no_merges_is_chars(self, spark):
        df = spark.createDataFrame([(1, "hi yo")], "doc_id long, text string")
        out = bpe_apply(df, []).collect()[0]
        assert out["tokens"] == ["h", "i", "y", "o"]

    def test_roundtrip_reduces_token_count(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
        merges = [
            (r["pair"].split(" ")[0], r["pair"].split(" ")[1])
            for r in sorted(
                bpe_train(docs, n_merges=3).collect(),
                key=lambda r: r["merge_rank"],
            )
        ]
        before = bpe_apply(docs, []).agg({"n_tokens": "sum"}).collect()[0][0]
        after = bpe_apply(docs, merges).agg({"n_tokens": "sum"}).collect()[0][0]
        assert after < before
