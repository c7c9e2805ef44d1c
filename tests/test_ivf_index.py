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
