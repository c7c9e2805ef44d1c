"""Persisted IVF index: partition-pruned probes, parity with on-the-fly IVF."""

import os

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators import similarity as sim

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivf") / "index")
    sim.ivf_build_index(emb, p, n_clusters=4)
    return p


def test_index_layout(index_path):
    # cluster is a physical partition directory, centroids in the sidecar
    subdirs = [d for d in os.listdir(index_path) if d.startswith("cluster=")]
    assert subdirs, os.listdir(index_path)
    cents = sim.ivf_load_centroids(index_path)
    assert len(cents) == 4 and len(cents[0]) > 0


def test_probe_is_partition_pruned(spark, index_path):
    cents = sim.ivf_load_centroids(index_path)
    qv = list(cents[0])
    df = sim.ivf_topk_indexed(spark, index_path, qv, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the probe must land in the scan's PartitionFilters (directory pruning
    # before IO), not in a post-scan Filter over all partitions
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m and "cluster" in m[0], plan
    probed = sim.probe_clusters(cents, qv, 2)
    for c in probed:
        assert str(c) in m[0], (probed, m[0])
    # and the pruned scan returns exactly the rows of the probed directories
    n_probed = (
        spark.read.parquet(index_path)
        .filter(F.col("cluster").isin(probed))
        .count()
    )
    per_dir = sum(
        spark.read.parquet(f"{index_path}/cluster={c}").count() for c in probed
    )
    assert n_probed == per_dir


def test_indexed_matches_on_the_fly(spark, emb, index_path):
    cents = sim.ivf_load_centroids(index_path)
    qrow = emb.filter(F.col("vec_id") == 0).first()
    qv = list(qrow["embedding"])
    a = sim.ivf_topk_indexed(spark, index_path, qv, k=10, nprobe=2).collect()
    b = sim.ivf_topk(emb, qv, k=10, nprobe=2, centroids=cents).collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in a] == [
        (r["vec_id"], round(r["score"], 9)) for r in b
    ]


class TestIncrementalAppend:
    @pytest.fixture(scope="class")
    def appended_index(self, spark, emb, tmp_path_factory):
        p = str(tmp_path_factory.mktemp("ivf_app") / "index")
        first = emb.filter(F.col("vec_id") % 2 == 0)
        rest = emb.filter(F.col("vec_id") % 2 == 1)
        sim.ivf_build_index(first, p, n_clusters=4)
        sim.ivf_append(rest, p)
        return p

    def test_append_lands_in_existing_partitions(self, spark, appended_index, emb):
        total = spark.read.parquet(appended_index).count()
        assert total == emb.count()
        subdirs = [
            d for d in os.listdir(appended_index) if d.startswith("cluster=")
        ]
        assert len(subdirs) <= 4  # no new partition values invented

    def test_sidecar_records_append_and_freezes_quantizer(
        self, spark, appended_index, emb
    ):
        side = sim.ivf_load_sidecar(appended_index)
        assert side["meta"]["appends"] == 1
        # appending again bumps the counter, centroids unchanged
        cents_before = side["centroids"]
        extra = emb.filter(F.col("vec_id") < 0)  # empty append is legal
        sim.ivf_append(extra, appended_index)
        side2 = sim.ivf_load_sidecar(appended_index)
        assert side2["meta"]["appends"] == 2
        assert side2["centroids"] == cents_before

    def test_appended_probe_matches_on_the_fly(self, spark, appended_index, emb):
        cents = sim.ivf_load_centroids(appended_index)
        qv = list(emb.filter(F.col("vec_id") == 1).first()["embedding"])
        a = sim.ivf_topk_indexed(spark, appended_index, qv, k=10, nprobe=2).collect()
        b = sim.ivf_topk(emb, qv, k=10, nprobe=2, centroids=cents).collect()
        assert [(r["vec_id"], round(r["score"], 9)) for r in a] == [
            (r["vec_id"], round(r["score"], 9)) for r in b
        ]

    def test_assignment_consistency_after_append(self, spark, appended_index):
        """Every stored row sits in the partition its vector assigns to
        under the frozen quantizer — append did not scramble placement."""
        cents = sim.ivf_load_centroids(appended_index)
        df = spark.read.parquet(appended_index)
        mismatch = (
            df.withColumn(
                "want", sim.ivf_assign_udf(cents)(F.col("embedding"))
            )
            .filter(F.col("want") != F.col("cluster"))
            .count()
        )
        assert mismatch == 0

    def test_drift_report_shape(self, spark, appended_index, emb):
        rep = sim.ivf_drift_report(spark, appended_index).collect()
        assert sum(r["n_rows"] for r in rep) == emb.count()
        assert all(r["mean_dist"] >= 0 for r in rep)
        assert all(r["max_dist"] >= r["mean_dist"] for r in rep)


class TestPartitionPrunedParser:
    """_scan_partition_pruned must parse the filter's literal set — bare
    digit substring matching false-passes via attribute ids."""

    def test_attribute_id_digits_do_not_false_pass(self):
        from geocube_spark.registry import _scan_partition_pruned

        plan = "FileSourceScan ... PartitionFilters: [cluster#125 IN (0,3,5)], ..."
        assert _scan_partition_pruned(plan, [0, 3]) == 1
        assert _scan_partition_pruned(plan, [0, 3, 5]) == 1
        # '1' and '2' appear in 'cluster#125' but are NOT pruned-to values
        assert _scan_partition_pruned(plan, [1]) == 0
        assert _scan_partition_pruned(plan, [2, 0]) == 0

    def test_empty_or_missing_filters_fail(self):
        from geocube_spark.registry import _scan_partition_pruned

        assert _scan_partition_pruned("no partition filters here", [0]) == 0
        assert (
            _scan_partition_pruned("Scan ... PartitionFilters: [], ...", [0]) == 0
        )

    def test_real_plan_still_passes(self, spark, index_path):
        from geocube_spark.registry import _scan_partition_pruned

        cents = sim.ivf_load_centroids(index_path)
        qv = list(cents[0])
        df = sim.ivf_topk_indexed(spark, index_path, qv, k=5, nprobe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        probe = sim.probe_clusters(cents, qv, 2)
        assert _scan_partition_pruned(plan, probe) == 1


class TestProductQuantization:
    """PQ (Jégou 2011): codebook shapes, encode determinism, ADC accuracy
    vs numpy reconstruction, and the topk plan (codes prefilter + exact
    broadcast rescore, no BNLJ)."""

    @pytest.fixture(scope="class")
    def books(self, emb):
        return sim.pq_train(emb, 64, m=8, ks=16)

    def test_codebook_shapes(self, books):
        assert len(books) == 8
        assert all(len(b) == 16 for b in books)
        assert all(len(c) == 8 for b in books for c in b)

    def test_train_is_deterministic(self, emb, books):
        import numpy as np

        again = sim.pq_train(emb, 64, m=8, ks=16)
        assert np.allclose(np.asarray(books), np.asarray(again))

    def test_encode_codes_in_range(self, emb, books):
        rows = (
            emb.withColumn("codes", sim.pq_encode_udf(books)(F.col("embedding")))
            .select("codes")
            .collect()
        )
        assert all(len(r["codes"]) == 8 for r in rows)
        assert all(0 <= c < 16 for r in rows for c in r["codes"])

    def test_adc_matches_numpy_reconstruction(self, spark, emb, books):
        """The JVM-side ADC fold must equal cosine(query, decoded vector)
        computed in numpy from the same codes — same LUT math, ~1e-9."""
        import numpy as np

        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        coded = emb.withColumn("codes", sim.pq_encode_udf(books)(F.col("embedding")))
        got = {
            r["vec_id"]: r["a"]
            for r in coded.select(
                "vec_id",
                sim.pq_adc_cosine_expr(F.col("codes"), q, books).alias("a"),
            ).collect()
        }
        B = np.asarray(books)  # (m, ks, dsub)
        qv = np.asarray(q)
        for r in coded.select("vec_id", "codes").collect():
            rec = np.concatenate([B[j, c] for j, c in enumerate(r["codes"])])
            want = float(qv @ rec / (np.linalg.norm(qv) * np.linalg.norm(rec)))
            assert abs(got[r["vec_id"]] - want) < 1e-9

    def test_topk_recovers_exact_with_margin(self, emb):
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        exact = [r["vec_id"] for r in sim.brute_force_topk(emb, q, k=10).collect()]
        got = [
            r["vec_id"]
            for r in sim.pq_topk(emb, q, k=10, m=32, ks=64, expand=8).collect()
        ]
        assert got == exact

    def test_topk_plan_broadcasts_candidates_no_bnlj(self, emb):
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        out = sim.pq_topk(emb, q, k=10, m=8, ks=16, expand=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the ONLY BNLJ allowed is the benign 1-row query-vector attach
        # (with_broadcast_arrays); candidate ids must broadcast-HASH-join
        assert plan.count("BroadcastNestedLoopJoin") <= 1
        assert "CartesianProduct" not in plan

    def test_guards(self, emb):
        with pytest.raises(ValueError):
            sim.pq_train(emb, 64, m=7)  # 64 % 7 != 0
        with pytest.raises(ValueError):
            sim.pq_train(emb, 64, m=8, ks=200)  # > tinyint range

    def test_adc_udf_path_matches_literal_path(self, spark, emb, books):
        """Closure-shipped ADC (production codebooks) must score identically
        to the literal JVM fold."""
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        coded = emb.withColumn("codes", sim.pq_encode_udf(books)(F.col("embedding")))
        lit = {
            r["vec_id"]: r["a"]
            for r in coded.select(
                "vec_id", sim.pq_adc_cosine_expr(F.col("codes"), q, books).alias("a")
            ).collect()
        }
        udf = {
            r["vec_id"]: r["a"]
            for r in coded.select(
                "vec_id", sim.pq_adc_cosine_udf(q, books)(F.col("codes")).alias("a")
            ).collect()
        }
        assert all(abs(lit[v] - udf[v]) < 1e-9 for v in lit)

    def test_fused_adc_matches_two_step_path(self, spark, emb, books):
        """The single-pass encode+ADC scorer (pq_adc_fused_udf, used by the
        big-codebook candidate scan) must score bit-identically to the
        two-step encode-then-ADC pipeline it replaces."""
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        coded = emb.withColumn("codes", sim.pq_encode_udf(books)(F.col("embedding")))
        two_step = {
            r["vec_id"]: r["a"]
            for r in coded.select(
                "vec_id", sim.pq_adc_cosine_udf(q, books)(F.col("codes")).alias("a")
            ).collect()
        }
        fused = {
            r["vec_id"]: r["a"]
            for r in emb.select(
                "vec_id",
                sim.pq_adc_fused_udf(q, books)(F.col("embedding")).alias("a"),
            ).collect()
        }
        assert set(fused) == set(two_step)
        assert all(fused[v] == two_step[v] for v in fused)  # bit-identical

    def test_shared_sample_matrix_matches_self_sampling(self, emb):
        """Training from a caller-provided _deterministic_sample_matrix
        (the ivfpq_topk one-sample path) must produce exactly the
        centroids/codebooks each trainer derives by sampling itself."""
        mat = sim._deterministic_sample_matrix(emb, "embedding", 100_000, 42)
        assert sim.kmeans_centroids(emb, 4) == sim.kmeans_centroids(
            emb, 4, sample_matrix=mat
        )
        assert sim.pq_train(emb, 64, m=8, ks=16) == sim.pq_train(
            emb, 64, m=8, ks=16, sample_matrix=mat
        )

    def test_big_codebook_plan_stays_small(self, emb):
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        out = sim.pq_topk(emb, q, k=10, m=32, ks=64, expand=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert len(plan.encode()) < 40_000  # LUTs shipped by closure, not literals


def test_pq_train_distributed_bit_identical(spark):
    # the executor-distributed per-subspace training must reproduce the
    # driver loop's codebooks EXACTLY (same slices, seeds, numpy ops;
    # float64 round-trips Arrow unchanged)
    import numpy as np

    rng = np.random.RandomState(7)
    mat = rng.rand(300, 16)
    anchor = spark.range(1)  # session carrier; sample_matrix supplies data
    a = sim.pq_train(anchor, 16, m=4, ks=8, sample_matrix=mat, distribute=False)
    b = sim.pq_train(anchor, 16, m=4, ks=8, sample_matrix=mat, distribute=True)
    assert a == b
