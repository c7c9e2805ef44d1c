"""D8 hydrology, IDW interpolation, histogram matching, QA masking:
structural invariants beyond the registered oracle queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.operators.hydrology import (
    d8_flow_direction,
    flow_accumulation,
    flow_summary,
)
from geocube_spark.operators.interpolate import idw_grid


@pytest.fixture(scope="module")
def dem(spark):
    # 8x8 tiled DEM: each tile drains diagonally to its local (0,0) pit
    return spark.range(4096).select(
        (F.col("id") % 64).cast("int").alias("i"),
        (F.col("id") / 64).cast("int").alias("j"),
        ((F.col("id") % 64) % 8 + F.floor(F.col("id") / 64) % 8)
        .cast("double")
        .alias("z"),
    )


class TestD8:
    def test_one_edge_per_non_pit(self, dem):
        edges = d8_flow_direction(dem)
        n_cells = dem.count()
        n_edges = edges.count()
        n_pits = n_cells - edges.select("i", "j").distinct().count()
        assert n_edges == n_cells - n_pits  # exactly one out-edge each
        assert n_pits == 64  # one pit per 8x8 tile

    def test_edges_go_downhill(self, dem):
        edges = d8_flow_direction(dem)
        z2 = dem.select(
            F.col("i").alias("to_i"), F.col("j").alias("to_j"), F.col("z").alias("nz")
        )
        uphill = (
            edges.join(dem, ["i", "j"])
            .join(z2, ["to_i", "to_j"])
            .filter(F.col("nz") >= F.col("z"))
            .count()
        )
        assert uphill == 0

    def test_accumulation_conserves_mass(self, dem):
        # every cell drains to exactly one pit (functional graph, acyclic),
        # so the pits' accumulations partition the grid: they sum to 4096.
        # This invariant — NOT the oracle, which replays the same round
        # count — is what catches an under-iterated fixpoint (rounds=7
        # looked converged but the cross-tile boundary hop makes the
        # longest path 8).
        edges = d8_flow_direction(dem)
        acc = flow_accumulation(dem, edges, rounds=8)
        pit_total = (
            acc.join(edges, ["i", "j"], "left_anti").agg(F.sum("acc")).collect()[0][0]
        )
        assert pit_total == 4096

    def test_under_iterated_fixpoint_detected(self, dem):
        edges = d8_flow_direction(dem)
        a7 = flow_accumulation(dem, edges, rounds=7)
        short = (
            a7.join(edges, ["i", "j"], "left_anti").agg(F.sum("acc")).collect()[0][0]
        )
        assert short < 4096  # 7 rounds is NOT enough on this DEM

    def test_fixpoint_reached(self, dem):
        edges = d8_flow_direction(dem)
        a8 = flow_accumulation(dem, edges, rounds=8)
        a9 = flow_accumulation(dem, edges, rounds=9)
        diff = (
            a8.withColumnRenamed("acc", "a")
            .join(a9, ["i", "j"])
            .filter(F.col("a") != F.col("acc"))
            .count()
        )
        assert diff == 0

    def test_summary_shape(self, dem):
        rows = flow_summary(dem, tile=8, rounds=8).collect()
        assert len(rows) == 64
        assert sum(r["n_pits"] for r in rows) == 64
        assert all(r["n_cells"] == 64 for r in rows)


class TestIDW:
    def _cells(self, spark):
        return spark.range(4).select(
            F.col("id").cast("int").alias("ci"),
            F.lit(0).cast("int").alias("cj"),
            (10.0 * F.col("id")).alias("cx"),
            F.lit(0.0).alias("cy"),
        )

    def test_exact_hit_short_circuits(self, spark):
        pts = spark.createDataFrame(
            [(0.0, 0.0, 7.0), (1.0, 0.0, 100.0)], "x double, y double, val double"
        )
        out = {r["ci"]: r["idw"] for r in idw_grid(pts, self._cells(spark), 5.0).collect()}
        assert out[0] == 7.0  # station sits ON the cell centre

    def test_radius_excludes(self, spark):
        pts = spark.createDataFrame([(0.0, 0.0, 7.0)], "x double, y double, val double")
        rows = idw_grid(pts, self._cells(spark), 5.0).collect()
        # only cell 0 (d=0) is within radius 5; cells at 10/20/30 drop
        assert [r["ci"] for r in rows] == [0]

    def test_weighted_mean_between_two_stations(self, spark):
        pts = spark.createDataFrame(
            [(9.0, 0.0, 0.0), (11.0, 0.0, 10.0)], "x double, y double, val double"
        )
        rows = {r["ci"]: r["idw"] for r in idw_grid(pts, self._cells(spark), 5.0).collect()}
        assert rows[1] == pytest.approx(5.0)  # equidistant -> midpoint


class TestHistogramMatch:
    def test_self_match_is_identity(self, spark):
        from geocube_spark.operators.algebra import histogram_match

        tiles = spark.createDataFrame(
            [(0, 0, [float(v % 7) for v in range(49)])],
            "block_x int, block_y int, px array<double>",
        )
        out = histogram_match(tiles, tiles, src_bins=7, ref_bins=7).collect()[0]
        assert out["px_matched"] == out["px"]


class TestQAMask:
    def test_counts_add_up(self, spark):
        from geocube_spark.operators.algebra import qa_mask_summary

        tiles = spark.createDataFrame(
            [(0, 0, [1.0, 2.0, 3.0, 4.0], [0, 8, 16, 32])],
            "block_x int, block_y int, px array<double>, qa array<bigint>",
        )
        r = qa_mask_summary(tiles).collect()[0]
        assert (r["n_cloud"], r["n_shadow"], r["n_snow"]) == (1, 1, 1)
        assert r["n_clear"] == 1 and r["clear_sum"] == 1


class TestRandomizedInvariants:
    """Seeded-random property sweeps: the invariants must hold on ANY
    input, not just the analytic fixtures."""

    def test_flow_mass_conservation_random_dem(self, spark):
        # integer DEM with values 0..9: a flow path strictly descends z,
        # so its length is bounded by 9 hops -> rounds=10 is the fixpoint
        import numpy as np

        for seed in (5, 23):
            rng = np.random.RandomState(seed)
            z = rng.randint(0, 10, size=(12, 12))
            rows = [
                (int(i), int(j), float(z[i, j]))
                for i in range(12)
                for j in range(12)
            ]
            cells = spark.createDataFrame(rows, "i int, j int, z double")
            edges = d8_flow_direction(cells)
            acc = flow_accumulation(cells, edges, rounds=10)
            pit_total = (
                acc.join(edges, ["i", "j"], "left_anti")
                .agg(F.sum("acc"))
                .collect()[0][0]
            )
            assert pit_total == 144, f"seed {seed}: mass not conserved"

    def test_idw_is_convex_combination(self, spark):
        # without an exact hit, the interpolate lies within the value range
        # of the contributing stations
        import numpy as np

        for seed in (7, 41):
            rng = np.random.RandomState(seed)
            pts = [
                (float(x), float(y), float(v))
                for x, y, v in zip(
                    rng.uniform(0.3, 19.7, 15),
                    rng.uniform(0.3, 19.7, 15),
                    rng.uniform(-50, 50, 15),
                )
            ]
            points = spark.createDataFrame(pts, "x double, y double, val double")
            cells = spark.range(16).select(
                F.col("id").cast("int").alias("ci"),
                F.lit(0).cast("int").alias("cj"),
                (1.25 + 1.25 * F.col("id")).alias("cx"),
                F.lit(10.0).alias("cy"),
            )
            lo, hi = min(p[2] for p in pts), max(p[2] for p in pts)
            for r in idw_grid(points, cells, radius=30.0).collect():
                assert lo - 1e-6 <= r["idw"] <= hi + 1e-6

    def test_histogram_match_cdf_dominance_random(self, spark):
        """For every src bin b, the matched ref bin u is the SMALLEST with
        CDF_ref(u) >= CDF_src(b) — checked against a numpy recomputation
        on random distributions."""
        import numpy as np

        from geocube_spark.operators.algebra import histogram_match

        for seed in (13, 29):
            rng = np.random.RandomState(seed)
            src_v = rng.randint(0, 16, 400).astype(float)
            ref_v = rng.randint(0, 12, 300).astype(float)
            src = spark.createDataFrame(
                [(0, 0, src_v.tolist())], "block_x int, block_y int, px array<double>"
            )
            ref = spark.createDataFrame(
                [(0, 0, ref_v.tolist())], "block_x int, block_y int, px array<double>"
            )
            out = histogram_match(src, ref, src_bins=16, ref_bins=12).collect()[0]
            cs = np.cumsum(np.bincount(src_v.astype(int), minlength=16)) / len(src_v)
            cr = np.cumsum(np.bincount(ref_v.astype(int), minlength=12)) / len(ref_v)
            for v, m in zip(out["px"], out["px_matched"]):
                b, u = int(v), int(m)
                assert cr[u] >= cs[b] - 1e-12, f"seed {seed}: not dominated"
                if u > 0:
                    assert cr[u - 1] < cs[b] + 1e-12, f"seed {seed}: not minimal"
