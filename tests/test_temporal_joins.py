"""As-of join and bucketed range join vs straightforward references."""

from __future__ import annotations

import pytest

from geocube_spark.operators.asof import as_of_join, range_join_buckets


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [("u1", 100, "L1"), ("u1", 250, "L2"), ("u2", 50, "L3"), ("u3", 10, "L4")],
        "user STRING, lts LONG, lid STRING",
    )
    right = spark.createDataFrame(
        [("u1", 90, "R1", 1.0), ("u1", 200, "R2", 2.0), ("u1", 240, "R3", 3.0),
         ("u2", 50, "R4", 4.0)],
        "user STRING, rts LONG, rid STRING, v DOUBLE",
    )
    return left, right


class TestAsOf:
    def test_backward_matches(self, sides):
        left, right = sides
        out = {
            r["lid"]: (r["asof_rid"], r["asof_v"])
            for r in as_of_join(
                left, right, "user", "lts", "rts", ["rid", "v"]
            ).collect()
        }
        assert out["L1"] == ("R1", 1.0)  # 90 <= 100, newest
        assert out["L2"] == ("R3", 3.0)  # 240 <= 250 beats 200
        assert out["L3"] == ("R4", 4.0)  # equal ts included (<=)
        assert out["L4"] == (None, None)  # no prior right row

    def test_forward_matches(self, sides):
        left, right = sides
        out = {
            r["lid"]: (r["asof_rid"], r["asof_v"])
            for r in as_of_join(
                left, right, "user", "lts", "rts", ["rid", "v"], direction="forward"
            ).collect()
        }
        assert out["L1"] == ("R2", 2.0)  # oldest rts >= 100 is 200
        assert out["L2"] == (None, None)  # nothing at/after 250
        assert out["L3"] == ("R4", 4.0)  # equal ts included (>=)
        assert out["L4"] == (None, None)  # u3 has no right rows

    def test_null_payload_field_preserved(self, sides):
        # a NULL field inside the matched right row must stay NULL — not be
        # back-filled from an older right row (single-struct carry)
        left, right = sides
        spark = left.sparkSession
        right2 = spark.createDataFrame(
            [("u1", 90, "R1", 1.0), ("u1", 240, "R3", None)],
            "user STRING, rts LONG, rid STRING, v DOUBLE",
        )
        out = {
            r["lid"]: (r["asof_rid"], r["asof_v"])
            for r in as_of_join(
                left, right2, "user", "lts", "rts", ["rid", "v"]
            ).collect()
        }
        assert out["L2"] == ("R3", None)  # matched R3; its NULL v preserved

    def test_bad_direction_raises(self, sides):
        left, right = sides
        with pytest.raises(ValueError):
            as_of_join(left, right, "user", "lts", "rts", ["rid"], direction="sideways")


class TestRangeJoin:
    def test_interval_pairs_match_naive(self, sides):
        left, right = sides
        out = {
            (r["lid"], r["r_rid"])
            for r in range_join_buckets(
                left, right, "user", "lts", "rts", lower=0.0, upper=100.0,
                payload_cols=["rid"],
            ).collect()
        }
        # naive reference: rts in [lts, lts+100]
        l_rows = left.collect()
        r_rows = right.collect()
        want = {
            (lr["lid"], rr["rid"])
            for lr in l_rows
            for rr in r_rows
            if lr["user"] == rr["user"] and lr["lts"] <= rr["rts"] <= lr["lts"] + 100
        }
        assert out == want
        assert ("L1", "R2") in out  # 200 within [100, 200]

    def test_negative_window(self, sides):
        left, right = sides
        out = {
            (r["lid"], r["r_rid"])
            for r in range_join_buckets(
                left, right, "user", "lts", "rts", lower=-50.0, upper=0.0,
                payload_cols=["rid"],
            ).collect()
        }
        l_rows, r_rows = left.collect(), right.collect()
        want = {
            (lr["lid"], rr["rid"])
            for lr in l_rows
            for rr in r_rows
            if lr["user"] == rr["user"] and lr["lts"] - 50 <= rr["rts"] <= lr["lts"]
        }
        assert out == want

    def test_bad_interval_raises(self, sides):
        left, right = sides
        with pytest.raises(ValueError):
            range_join_buckets(left, right, "user", "lts", "rts", 5.0, 5.0, ["rid"])


class TestInterpolateGaps:
    """Linear gap filling per series: interior interpolation, edge
    fills, all-null series, and the partitioned-window plan."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k string, t long, v double")

    def test_interior_linear(self, spark):
        from geocube_spark.operators.timeseries import interpolate_gaps

        rows = [("a", 0, 10.0), ("a", 10, None), ("a", 40, 40.0)]
        out = {r["t"]: r["filled"] for r in
               interpolate_gaps(self._df(spark, rows), ["k"], "t", "v").collect()}
        assert out[10] == 10.0 + (40.0 - 10.0) * (10 - 0) / (40 - 0)  # 17.5

    def test_edge_fills_and_all_null(self, spark):
        from geocube_spark.operators.timeseries import interpolate_gaps

        rows = [("a", 0, None), ("a", 1, 5.0), ("a", 2, None),
                ("b", 0, None), ("b", 1, None)]
        out = {(r["k"], r["t"]): r["filled"] for r in
               interpolate_gaps(self._df(spark, rows), ["k"], "t", "v").collect()}
        assert out[("a", 0)] == 5.0   # backfill
        assert out[("a", 2)] == 5.0   # forward fill
        assert out[("b", 0)] is None and out[("b", 1)] is None

    def test_plan_partitioned_window_no_global_sort(self, spark):
        from geocube_spark.operators.timeseries import interpolate_gaps

        rows = [("a", 0, 1.0), ("b", 1, None)]
        plan = (
            interpolate_gaps(self._df(spark, rows), ["k"], "t", "v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "hashpartitioning(k" in plan
        assert "rangepartitioning" not in plan.lower()


class TestTemporalTrend:
    """Mann-Kendall S + Theil-Sen slope over block time layers."""

    def _tiles(self, spark, series_by_px, t_vals):
        # one 2x2 block; series_by_px: 4 lists of len(t_vals)
        rows = [
            (0, 0, float(t), [float(series_by_px[k][ti]) for k in range(4)])
            for ti, t in enumerate(t_vals)
        ]
        return spark.createDataFrame(
            rows, "block_x int, block_y int, t double, px array<double>"
        )

    def test_monotonic_and_flat_and_gaps(self, spark):
        from geocube_spark.operators.mosaic import temporal_trend

        series = [
            [1, 2, 3, 4, 5],     # strictly up: S = 10, slope = 1
            [5, 4, 3, 2, 1],     # strictly down: S = -10, slope = -1
            [7, 7, 7, 7, 7],     # flat: S = 0, slope = 0
            [2, 0, 4, 0, 8],     # nodata gaps at t=1,3: obs (0,2,4)
        ]
        out = temporal_trend(
            self._tiles(spark, series, [0, 1, 2, 3, 4]),
            time_col="t",
            nodata=0.0,
            block=2,
        ).collect()[0]
        assert out["n_px"] == 4
        assert out["n_trendable"] == 4
        # S: 10 - 10 + 0 + 3 (three valid up-pairs in the gapped series)
        assert out["sum_s"] == 3
        assert out["n_pos"] == 2 and out["n_neg"] == 1
        # slopes: 1, -1, 0, median(1, 1.5, 2) = 1.5  -> sum*24 = 36
        assert out["slope24_sum"] == (1 - 1 + 0 + 1.5) * 24

    def test_single_observation_not_trendable(self, spark):
        from geocube_spark.operators.mosaic import temporal_trend

        series = [[3, 0], [0, 0], [1, 2], [0, 5]]
        out = temporal_trend(
            self._tiles(spark, series, [0, 1]),
            time_col="t",
            nodata=0.0,
            block=2,
        ).collect()[0]
        # only pixel 2 has two valid observations
        assert out["n_trendable"] == 1
        assert out["sum_s"] == 1 and out["slope24_sum"] == 24.0

    def test_even_pair_count_interpolates_like_sql_median(self, spark):
        from geocube_spark.operators.mosaic import temporal_trend

        # 4 observations -> 6 pairs; drop one obs to nodata -> 3 valid
        # obs -> 3 pairs (odd); keep all 4 -> 6 pairs (even, interpolate)
        series = [[0, 2, 3, 9], [1, 1, 1, 1], [1, 1, 1, 1], [1, 1, 1, 1]]
        out = temporal_trend(
            self._tiles(spark, series, [0, 1, 2, 3]),
            time_col="t",
            nodata=-1.0,
            block=2,
        ).collect()[0]
        # slopes of px0: 2,1.5,3,1,3.5,6 sorted -> median (2+3)/2 = 2.5
        assert out["slope24_sum"] == 2.5 * 24 + 0 + 0 + 0
