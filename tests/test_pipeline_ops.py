"""Beyond-reference pipeline operators: dedup family, similarity search,
text analysis, multimodal plumbing, streaming."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.operators import dedup as dd
from geocube_spark.operators import multimodal as mm
from geocube_spark.operators import similarity as sim
from geocube_spark.streaming.jobs import task_counters


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different text about spark engines"),
        (4, "  The Quick  Brown Fox jumps over the lazy dog  "),  # normalized dup of 0
        (5, "another unrelated document mentioning nothing similar"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


class TestExactDedup:
    def test_groups(self, docs):
        groups = dd.exact_duplicates(docs).collect()
        assert len(groups) == 1
        assert groups[0]["doc_ids"] == [0, 1, 4]

    def test_keep_first(self, docs):
        kept = dd.dedup_exact(docs)
        ids = sorted(r["doc_id"] for r in kept.collect())
        assert ids == [0, 2, 3, 5]


class TestMinHash:
    def test_near_dups_found(self, docs):
        out = dd.minhash_near_duplicates(docs, threshold=0.5, num_hashes=32, bands=16)
        pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
        # 0/1/4 identical after normalization; 2 is one word off
        assert (0, 1) in pairs and (0, 4) in pairs and (1, 4) in pairs
        assert (0, 2) in pairs or (2, 4) in pairs or (1, 2) in pairs
        assert not any(3 in p or 5 in p for p in pairs)

    def test_jaccard_exact_on_identical(self, docs):
        out = dd.minhash_near_duplicates(docs, threshold=0.99)
        exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
        assert exact[(0, 1)] == 1.0

    def test_signature_deterministic(self, docs):
        s1 = dd.minhash_signatures(docs).collect()
        s2 = dd.minhash_signatures(docs).collect()
        assert {r["doc_id"]: r["signature"] for r in s1} == {
            r["doc_id"]: r["signature"] for r in s2
        }


class TestNgramJaccard:
    def test_identical_docs_score_one(self, docs):
        out = dd.ngram_jaccard_pairs(docs, threshold=0.9)
        pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
        assert pairs[(0, 1)] == 1.0 and pairs[(0, 4)] == 1.0

    def test_threshold_excludes(self, docs):
        out = dd.ngram_jaccard_pairs(docs, threshold=0.3)
        assert not any(
            3 in (r["doc_a"], r["doc_b"]) or 5 in (r["doc_a"], r["doc_b"])
            for r in out.collect()
        )


class TestSimHash:
    def test_identical_same_fingerprint(self, docs):
        fp = {r["doc_id"]: r["simhash"] for r in dd.simhash_fingerprints(docs).collect()}
        assert fp[0] == fp[1] == fp[4]

    def test_near_dup_small_hamming(self, docs):
        out = dd.simhash_near_duplicates(docs, max_hamming=16, prefix_bits=4)
        pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
        assert pairs.get((0, 1)) == 0

    def test_rotated_lsh_equals_all_pairs(self, docs):
        """Pigeonhole: 4 disjoint 16-bit blocks catch every pair with
        Hamming <= 3, so the LSH must EQUAL the exact quadratic join."""
        lsh = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in dd.simhash_near_duplicates(docs, max_hamming=3).collect()
        }
        exact = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in dd.simhash_all_pairs(docs, max_hamming=3).collect()
        }
        assert lsh == exact and len(exact) >= 3  # 0/1/4 at hamming 0

    def test_all_pairs_blocking_complete(self, spark):
        """Every unordered pair meets in exactly one block pair regardless
        of block count (no pair lost or duplicated by the decomposition)."""
        rows = [(i, f"shared prefix words here variant {i % 4}") for i in range(40)]
        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        for nb in (1, 3, 8):
            got = sorted(
                (r["doc_a"], r["doc_b"])
                for r in dd.simhash_all_pairs(docs, max_hamming=64, num_blocks=nb).collect()
            )
            assert len(got) == 40 * 39 // 2
            assert len(set(got)) == len(got)


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        rng = np.random.RandomState(7)
        base = rng.standard_normal(8)
        rows = [(0, base.tolist(), 0)]
        for i in range(1, 30):
            noise = rng.standard_normal(8) * (0.05 if i < 5 else 1.5)
            rows.append((i, (base + noise).tolist(), i % 3))
        return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")

    def test_brute_force_topk_matches_numpy(self, emb):
        rows = emb.orderBy("vec_id").collect()
        mat = np.array([r["embedding"] for r in rows])
        q = mat[0]
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        want = list(np.argsort(-sims)[:5])
        got = [
            r["vec_id"]
            for r in sim.brute_force_topk(emb, q.tolist(), k=5).collect()
        ]
        assert got == want

    def test_all_pairs_exact_matches_bruteforce(self, emb):
        out = sim.embedding_all_pairs_exact(emb, threshold=0.9)
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        rows = emb.orderBy("vec_id").collect()
        mat = np.array([r["embedding"] for r in rows])
        n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = n @ n.T
        want = {
            (i, j)
            for i in range(len(rows))
            for j in range(i + 1, len(rows))
            if sims[i, j] >= 0.9
        }
        assert got == want

    def test_lsh_topk_contains_close_neighbours(self, emb):
        q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        got = {r["vec_id"] for r in sim.lsh_topk(emb, list(q), k=5, bits=4).collect()}
        # the 4 tight neighbours (i=1..4, small noise) share the bucket
        assert 0 in got
        assert len(got & {1, 2, 3, 4}) >= 2

    def test_near_dup_multiprobe_recall(self, emb):
        """Multi-probe is a strict superset of the plain bucket join, has no
        false positives, and at probe radius 1 both-sides it must find every
        pair whose buckets differ in <= 2 bits — verified vs brute force."""
        plain = {
            (r["id_a"], r["id_b"])
            for r in sim.embedding_near_duplicates(emb, threshold=0.9, bits=4).collect()
        }
        mp = {
            (r["id_a"], r["id_b"])
            for r in sim.embedding_near_duplicates(
                emb, threshold=0.9, bits=4, multiprobe=1
            ).collect()
        }
        assert plain <= mp
        rows = emb.orderBy("vec_id").collect()
        mat = np.array([r["embedding"] for r in rows])
        nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = nrm @ nrm.T
        # the operator's documented sieve extends 5.1e-7 below the threshold
        # (membership is decided on the 6-dp-rounded cosine downstream)
        true_pairs = {
            (i, j)
            for i in range(len(rows))
            for j in range(i + 1, len(rows))
            if sims[i, j] >= 0.9 - 5.1e-7
        }
        assert mp <= true_pairs  # cosine-verified: no false positives
        # bucket-distance <= 2 pairs are guaranteed caught
        from geocube_spark.operators.similarity import (
            lsh_bucket_expr,
            random_hyperplanes,
        )

        planes = random_hyperplanes(8, 4, 42)
        buckets = {
            r["vec_id"]: r["b"]
            for r in emb.select(
                "vec_id", lsh_bucket_expr(F.col("embedding"), planes).alias("b")
            ).collect()
        }
        for i, j in true_pairs:
            if bin(buckets[i] ^ buckets[j]).count("1") <= 2:
                assert (i, j) in mp

    def test_pairwise_topk_join(self, emb):
        queries = emb.filter(F.col("vec_id") < 2)
        out = sim.pairwise_topk_join(queries, emb, k=3).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == {0, 1}
        for rows in by_q.values():
            assert len(rows) == 3
            scores = [r["score"] for r in rows]
            assert scores == sorted(scores, reverse=True)


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            ("m0", "image", b"payload-zero", (16, 16, 3, None, None, "fake")),
            ("m1", "image", b"payload-one", (32, 16, 3, None, None, "fake")),
            ("m2", "image", b"payload-zero", (16, 16, 3, None, None, "fake")),  # dup payload
        ]
        return spark.createDataFrame(
            rows,
            "media_id STRING, kind STRING, payload BINARY, "
            "meta STRUCT<width:INT,height:INT,channels:INT,sample_rate:INT,duration_ms:INT,codec:STRING>",
        )

    def test_feature_extraction_shape_and_determinism(self, media):
        out1 = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
        out2 = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
        assert len(out1["m0"]) == 16  # 4×4 pooled grid
        assert out1 == out2  # deterministic fake decoder
        assert out1["m0"] == out1["m2"]  # same payload -> same features

    def test_resize_plumbing(self, media):
        out = {r["media_id"]: r for r in mm.resize_images(media, 8, 8).collect()}
        assert all(len(r["px"]) == 64 for r in out.values())
        assert out["m1"]["width"] == 8

    def test_exact_media_dedup(self, media):
        groups = mm.media_dedup_exact(media).collect()
        assert len(groups) == 1
        assert groups[0]["media_ids"] == ["m0", "m2"]

    def test_set_decoder_hook_pil_signature(self, spark):
        """Install a real-library-shaped decoder (bytes -> ndarray, like a
        PIL/np.load wrapper), assert the pipeline consumes its output, and
        restore the default fake."""
        import io

        import numpy as np

        def npy_decoder(payload: bytes, meta: dict) -> np.ndarray:
            # a real decoder's exact shape: parse the byte stream, ignore
            # (or cross-check) the metadata struct
            return np.load(io.BytesIO(payload))

        arr = np.zeros((8, 8, 3))
        arr[:4, :, :] = 255.0  # top half white -> pooled rows split 255/0
        buf = io.BytesIO()
        np.save(buf, arr)
        media = spark.createDataFrame(
            [("n0", "image", bytearray(buf.getvalue()), None)],
            "media_id STRING, kind STRING, payload BINARY, "
            "meta STRUCT<width:INT,height:INT,channels:INT,sample_rate:INT,"
            "duration_ms:INT,codec:STRING>",
        )
        mm.set_decoder(npy_decoder)
        try:
            [row] = mm.extract_features(media).collect()
            assert row["feature"][:8] == [255.0] * 8  # top two pooled rows
            assert row["feature"][8:] == [0.0] * 8
        finally:
            mm.set_decoder(mm._default_decode)

    def test_real_decoder_stub_raises(self):
        with pytest.raises(NotImplementedError):
            mm.real_decoder_stub(b"x", {})

    def test_video_frame_sampling(self, spark):
        rows = [
            ("v0", "video", b"clip-a", (16, 16, 3, None, 3500, "fake")),
            ("v1", "video", b"clip-b", (16, 16, 3, None, 900, "fake")),
            ("i0", "image", b"still", (16, 16, 3, None, None, "fake")),
        ]
        media = spark.createDataFrame(
            rows,
            "media_id STRING, kind STRING, payload BINARY, "
            "meta STRUCT<width:INT,height:INT,channels:INT,sample_rate:INT,duration_ms:INT,codec:STRING>",
        )
        out = mm.sample_frames(media, every_ms=1000).collect()
        by_id: dict[str, list] = {}
        for r in out:
            by_id.setdefault(r["media_id"], []).append(r)
        assert "i0" not in by_id  # images don't fan out
        assert len(by_id["v0"]) == 4  # ceil(3500/1000)
        assert len(by_id["v1"]) == 1
        v0 = sorted(by_id["v0"], key=lambda r: r["frame_idx"])
        assert [r["t_ms"] for r in v0] == [0, 1000, 2000, 3000]
        assert all(len(r["feature"]) == 16 for r in v0)
        # frames differ (per-frame decode seed), run is deterministic
        assert v0[0]["feature"] != v0[1]["feature"]
        again = [
            r["feature"]
            for r in sorted(
                (x for x in mm.sample_frames(media, every_ms=1000).collect() if x["media_id"] == "v0"),
                key=lambda r: r["frame_idx"],
            )
        ]
        assert again == [r["feature"] for r in v0]


class TestStreaming:
    def test_task_counters(self, spark, fixture_dir):
        tasks = spark.read.parquet(f"{fixture_dir}/tasks.parquet")
        out = {r["job_id"]: r for r in task_counters(tasks).collect()}
        total = sum(
            r["NEW"] + r["PENDING"] + r["DONE"] + r["FAILED"] + r["CANCELLED"]
            for r in out.values()
        )
        assert total == tasks.count()

    def test_windowed_stream_matches_batch(self, spark, fixture_dir, tmp_path):
        """Structured Streaming windowed agg == the equivalent batch agg."""
        from geocube_spark.streaming.jobs import stream_events_windowed

        # fixture 'jobs' table has creation_ts; reuse events-shaped data: write
        # a tiny events dir from the records fixture
        src = spark.read.parquet(f"{fixture_dir}/records.parquet").select(
            F.col("id").alias("event_id"),
            F.col("datetime").alias("ts"),
            F.lit(1).alias("user_id"),
            F.element_at("tags", "CONSTELLATION").alias("event_type"),
            F.lit(1.0).alias("value"),
        ).filter(F.col("event_type").isNotNull())
        path = str(tmp_path / "events_stream")
        src.write.parquet(path)

        stream_df = stream_events_windowed(spark, path, window="24 hours", watermark="48 hours")
        q = (
            stream_df.writeStream.format("memory")
            .queryName("win_agg")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT sum(n_events) AS n FROM win_agg").first()["n"]
        assert got == src.count()


class TestIVF:
    def test_ivf_topk_recall_vs_bruteforce(self, spark):
        rng = np.random.RandomState(11)
        # 4 well-separated clusters of 25 vectors
        centers = rng.standard_normal((4, 16)) * 10
        rows = []
        for i in range(100):
            c = i % 4
            rows.append((i, (centers[c] + rng.standard_normal(16) * 0.3).tolist(), c))
        emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
        q = rows[0][1]
        exact = [r["vec_id"] for r in sim.brute_force_topk(emb, q, k=10).collect()]
        approx = [
            r["vec_id"]
            for r in sim.ivf_topk(emb, q, k=10, n_clusters=4, nprobe=1).collect()
        ]
        # same cluster -> full recall on well-separated data
        assert set(approx) == set(exact)

    def test_centroids_deterministic(self, spark):
        rng = np.random.RandomState(3)
        emb = spark.createDataFrame(
            [(i, rng.standard_normal(8).tolist(), 0) for i in range(50)],
            "vec_id LONG, embedding ARRAY<DOUBLE>, label INT",
        )
        c1 = sim.kmeans_centroids(emb, 4)
        c2 = sim.kmeans_centroids(emb, 4)
        assert c1 == c2


class TestSkewUtils:
    def test_salted_count_matches_plain(self, spark):
        from geocube_spark.operators.skew import salted_count

        df = spark.range(10000).withColumn("k", (F.col("id") % 3).cast("string"))
        plain = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
        salted = {r["k"]: r["n"] for r in salted_count(df, ["k"]).collect()}
        assert plain == salted

    def test_salted_join_matches_plain(self, spark):
        from geocube_spark.operators.skew import salted_join

        fact = spark.range(5000).withColumn("k", (F.col("id") % 4).cast("string"))
        dim = spark.createDataFrame(
            [(str(i), f"v{i}") for i in range(4)], "k STRING, v STRING"
        )
        plain = fact.join(dim, "k").count()
        assert salted_join(fact, dim, "k").count() == plain


class TestPIIRedaction:
    """operators/pii.py: JVM-regex PII scrub (no UDF, no shuffle)."""

    def test_counts_and_redaction(self, spark):
        from geocube_spark.operators.pii import pii_redact

        df = spark.createDataFrame(
            [
                (1, "mail a.b+c@x-corp.io and call +44-207-1234 now"),
                (2, "server at 10.0.255.3, owner ssn 078-05-1120"),
                (3, "clean text, no identifiers here"),
                (4, "two mails: a@b.co c@d.org and ip 1.2.3.4"),
            ],
            "doc_id int, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in pii_redact(df).collect()
        }
        assert (rows[1]["n_email"], rows[1]["n_phone"]) == (1, 1)
        assert rows[1]["redacted"] == "mail [EMAIL] and call [PHONE] now"
        assert (rows[2]["n_ip"], rows[2]["n_ssn"]) == (1, 1)
        assert rows[2]["redacted"] == "server at [IP], owner ssn [SSN]"
        assert rows[3]["redacted"] == rows[3]["text"]
        assert all(rows[3][f"n_{c}"] == 0 for c in ("email", "phone", "ip", "ssn"))
        assert rows[4]["n_email"] == 2 and rows[4]["n_ip"] == 1
        assert rows[4]["redacted"] == "two mails: [EMAIL] [EMAIL] and ip [IP]"

    def test_no_python_in_plan(self, spark):
        from geocube_spark.operators.pii import pii_redact

        df = spark.createDataFrame([(1, "x@y.zz")], "doc_id int, text string")
        plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestSQ8Quantization:
    """operators/similarity.py SQ8: 8-bit scalar-quantized ANN with exact
    rescore — the FAISS/ScaNN SQ8 recipe as DataFrame ops."""

    def _emb(self, spark):
        from pyspark.sql import functions as F

        return spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )

    def test_codes_bounded_and_reconstruction(self, spark):
        import numpy as np

        from geocube_spark.operators.similarity import (
            sq8_dequant_expr,
            sq8_quantize,
            sq8_stats,
        )
        from pyspark.sql import functions as F

        emb = self._emb(spark)
        dim = len(emb.first()["embedding"])
        mins, scales = sq8_stats(emb, dim)
        coded = sq8_quantize(emb, mins, scales)
        rows = coded.select(
            "embedding",
            "codes",
            sq8_dequant_expr(F.col("codes"), mins, scales).alias("approx"),
        ).collect()
        for r in rows:
            # offset-stored signed tinyint: one byte per element on disk
            assert all(-128 <= c <= 127 for c in r["codes"])
            err = np.abs(np.array(r["approx"]) - np.array(r["embedding"]))
            # reconstruction error bounded by half a quantization step
            assert (err <= np.array(scales) * 0.5 + 1e-12).all()

    def test_topk_recovers_exact(self, spark):
        from geocube_spark.operators.similarity import (
            brute_force_topk,
            sq8_topk,
        )
        from pyspark.sql import functions as F

        emb = self._emb(spark)
        q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
        got = [(r["vec_id"], round(r["score"], 6)) for r in
               sq8_topk(emb, list(q), k=10, expand=4).collect()]
        want = [(r["vec_id"], round(r["score"], 6)) for r in
                brute_force_topk(emb, list(q), k=10).collect()]
        assert got == want

    def test_rescore_is_broadcast_semi_join(self, spark):
        from geocube_spark.operators.similarity import sq8_topk
        from pyspark.sql import functions as F

        emb = self._emb(spark)
        q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        plan = sq8_topk(emb, list(q), k=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan


class TestMatryoshka:
    def test_full_prefix_recovers_exact(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.operators.similarity import (
            brute_force_topk,
            matryoshka_topk,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        q = list(emb.filter(F.col("vec_id") == 2).first()["embedding"])
        # prefix_dim = full dim: the prefilter IS the exact ranking
        got = [(r["vec_id"], round(r["score"], 6)) for r in
               matryoshka_topk(emb, q, k=8, prefix_dim=len(q)).collect()]
        want = [(r["vec_id"], round(r["score"], 6)) for r in
                brute_force_topk(emb, q, k=8).collect()]
        assert got == want

    def test_recall_monotone_in_prefix(self, spark):
        from pyspark.sql import functions as F

        from geocube_spark.operators.similarity import (
            brute_force_topk,
            matryoshka_candidates,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
        rec = {}
        for d in (16, 64):
            cand = {r["vec_id"] for r in
                    matryoshka_candidates(emb, q, 40, d).collect()}
            rec[d] = len(cand & exact)
        assert rec[64] == 10  # full-dim prefix always contains the exact set
        assert rec[16] <= rec[64]


class TestJpegMediaDecode:
    def test_real_jpeg_payload_decodes_for_real(self, spark):
        """A genuine JPEG byte stream in the payload column is decoded by
        the in-repo codec (content-routed default), not the fake: the
        pooled features must match the actual image's block means."""
        import numpy as np

        from geocube_spark.operators import multimodal as mm
        from geocube_spark.sources.jpeg import encode_jpeg

        img = np.zeros((16, 16), np.uint8)
        img[:8, :] = 200  # top half bright
        payload = encode_jpeg(img, 95)
        media = spark.createDataFrame(
            [("j0", "image", bytearray(payload),
              (16, 16, 1, None, None, "jpeg"))],
            "media_id STRING, kind STRING, payload BINARY, "
            "meta STRUCT<width:INT,height:INT,channels:INT,sample_rate:INT,"
            "duration_ms:INT,codec:STRING>",
        )
        [row] = mm.extract_features(media, pool=4).collect()
        feats = np.array(row["feature"]).reshape(4, 4)
        # constant halves survive JPEG exactly (DC-only blocks)
        assert np.allclose(feats[:2], 200.0)
        assert np.allclose(feats[2:], 0.0)


class TestPerceptualHash:
    def _media(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "media_id STRING, kind STRING, payload BINARY, "
            "meta STRUCT<width:INT,height:INT,channels:INT,sample_rate:INT,"
            "duration_ms:INT,codec:STRING>",
        )

    def test_reencoded_jpeg_same_dhash(self, spark):
        """The same image re-encoded at different JPEG qualities collides
        on dHash — the re-encoded-duplicate case exact sha1 dedup misses."""
        import numpy as np

        from geocube_spark.operators import multimodal as mm
        from geocube_spark.sources.jpeg import encode_jpeg

        x = np.linspace(10, 240, 64)
        img = np.clip(np.round(np.add.outer(x, x * 0.3)), 0, 255).astype(np.uint8)
        rows = [
            ("q95", "image", bytearray(encode_jpeg(img, 95)), None),
            ("q75", "image", bytearray(encode_jpeg(img, 75)), None),
            ("other", "image",
             bytearray(encode_jpeg(img.T.copy(), 95)), None),
        ]
        groups = mm.media_near_duplicates(self._media(spark, rows)).collect()
        assert len(groups) == 1
        assert groups[0]["media_ids"] == ["q75", "q95"]

    def test_ahash_and_dhash_hex_shape(self, spark):
        import numpy as np

        from geocube_spark.operators import multimodal as mm
        from geocube_spark.sources.jpeg import encode_jpeg

        img = np.clip(
            np.round(np.add.outer(np.linspace(0, 255, 32), np.zeros(32))), 0, 255
        ).astype(np.uint8)
        media = self._media(
            spark, [("m", "image", bytearray(encode_jpeg(img, 90)), None)]
        )
        for method in ("ahash", "dhash"):
            [row] = mm.perceptual_hash(media, method).collect()
            assert len(row["phash"]) == 16
            int(row["phash"], 16)  # valid hex

    def test_bad_method_raises(self, spark):
        import pytest as _pytest

        from geocube_spark.operators import multimodal as mm

        with _pytest.raises(ValueError):
            mm.perceptual_hash(self._media(spark, []), "md5")


class TestLeakageSafeSplit:
    """Component-aware split: no near-dup cluster may straddle splits, the
    assignment is deterministic, and singletons spread across all splits."""

    @pytest.fixture(scope="class")
    def assigned(self, spark, docs):
        from geocube_spark.operators.dedup import ngram_jaccard_pairs
        from geocube_spark.operators.pipeline import leakage_safe_split

        pairs = ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5)
        return leakage_safe_split(docs, pairs).cache()

    def test_no_component_spans_two_splits(self, assigned):
        spans = (
            assigned.groupBy("component")
            .agg(F.countDistinct("split").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        assert spans == 0

    def test_total_and_determinism(self, assigned, docs, spark):
        from geocube_spark.operators.dedup import ngram_jaccard_pairs
        from geocube_spark.operators.pipeline import leakage_safe_split

        assert assigned.count() == docs.count()
        again = leakage_safe_split(
            docs, ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5)
        )
        assert {tuple(r) for r in assigned.collect()} == {
            tuple(r) for r in again.collect()
        }

    def test_all_three_splits_nonempty_and_train_majority(self, spark):
        # the 6-doc class fixture is too small to populate every shard;
        # the real corpus must spread ~80/10/10
        from geocube_spark.operators.dedup import ngram_jaccard_pairs
        from geocube_spark.operators.pipeline import leakage_safe_split

        corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = leakage_safe_split(
            corpus, ngram_jaccard_pairs(corpus, shingle_k=3, threshold=0.5)
        )
        counts = {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > counts["val"] + counts["test"]

    def test_near_dup_pair_lands_same_split(self, spark):
        # two literal near-dup docs + distinct fillers: the pair must be
        # in ONE split whatever the hash says
        from geocube_spark.operators.dedup import ngram_jaccard_pairs
        from geocube_spark.operators.pipeline import leakage_safe_split

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [(0, base), (1, base + " extra")] + [
            (i, f"unique text number {i} with words w{i} x{i} y{i} z{i}")
            for i in range(2, 12)
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        out = leakage_safe_split(
            d, ngram_jaccard_pairs(d, shingle_k=3, threshold=0.5)
        )
        got = {r["doc_id"]: r["split"] for r in out.collect()}
        assert got[0] == got[1]
