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


class TestBPEPropertyVsReference:
    def _reference_bpe(self, word_counts, n_merges):
        """Straight-line reference implementation (Sennrich alg. 1, pure
        Python): naive adjacent-pair counts, (count desc, pair asc)
        argmax, greedy left-to-right merge."""
        vocab = {tuple(w): c for w, c in word_counts.items()}
        merges = []
        for _ in range(n_merges):
            pairs = {}
            for syms, c in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] = pairs.get((a, b), 0) + c
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append((best, pairs[best]))
            new_vocab = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best
                    ):
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
            vocab = new_vocab
        return merges

    def test_random_corpora_match_reference(self, spark):
        import random

        from geocube_spark.operators.bpe import bpe_train

        rng = random.Random(17)
        for trial in range(3):
            words = [
                "".join(rng.choice("ab c") for _ in range(rng.randint(1, 6))).replace(" ", "")
                for _ in range(40)
            ]
            words = [w for w in words if w]
            text = " ".join(words)
            counts = {}
            for w in words:
                counts[w] = counts.get(w, 0) + 1
            want = self._reference_bpe(counts, 4)
            df = spark.createDataFrame([(1, text)], "doc_id long, text string")
            got = sorted(
                bpe_train(df, n_merges=4).collect(),
                key=lambda r: r["merge_rank"],
            )
            assert len(got) == len(want), (trial, text)
            for row, ((p1, p2), n) in zip(got, want):
                assert row["pair"] == f"{p1} {p2}", (trial, text)
                assert row["n_occurrences"] == n, (trial, text)
