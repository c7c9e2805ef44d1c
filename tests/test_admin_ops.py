"""Admin operations: TidyDB, UpdateDatasets (impact + apply),
DeleteDatasets with managed-container GC, DownloadCube, grid dispatch,
catalog writers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.geometry import rect_wkb
from geocube_spark.operators.admin import (
    delete_datasets,
    get_cube_from_metadatas,
    update_datasets,
    update_datasets_impact,
)
from geocube_spark.operators.cover import cover_for_layout
from geocube_spark.plans.find_datasets import DatasetFilters
from geocube_spark.sources.catalog import (
    Catalog,
    make_aoi_rows,
    tidy_catalog,
    validate_dmapping,
    validate_record_name,
)


class TestCatalogWriters:
    def test_aoi_dedup_by_hash(self):
        a = rect_wkb(0, 0, 1, 1)
        b = rect_wkb(0, 0, 1, 1)
        c = rect_wkb(0, 0, 2, 2)
        rows = make_aoi_rows([a, b, c])
        assert len(rows) == 2  # identical geometry deduped (record.go:33-58)
        assert rows[0]["id"] != rows[1]["id"]
        # deterministic ids: same geometry -> same uuid5
        again = make_aoi_rows([a])
        assert again[0]["id"] == rows[0]["id"]

    def test_commit_failure_leaves_old_version_visible(self, spark, tmp_path, monkeypatch):
        # the commit (os.link of the commit file) is the ONLY visibility
        # point; if it fails the previous version must stay current and the
        # orphaned snapshot must never be readable
        import os

        cat = Catalog(spark, str(tmp_path))
        cat.write("t", spark.range(5).toDF("id"))
        real_link = os.link

        def failing(src, dst):
            if ".tmp_commit_t_" in str(src):
                raise OSError("injected commit failure")
            return real_link(src, dst)

        monkeypatch.setattr(os, "link", failing)
        with pytest.raises(OSError, match="injected"):
            cat.write("t", spark.range(9).toDF("id"))
        monkeypatch.undo()
        assert cat.read("t").count() == 5  # previous version intact
        cat.write("t", spark.range(2).toDF("id"))  # next write still works
        assert cat.read("t").count() == 2

    def test_crash_between_snapshot_and_commit(self, spark, tmp_path, monkeypatch):
        # hard-kill simulation: the snapshot parquet is fully written but the
        # process dies before the commit file appears.  Readers must see the
        # old version with NO heal dance (the round-1/2 rename-pair layout
        # had a window where the table was missing), and the next successful
        # write must still land
        import os

        cat = Catalog(spark, str(tmp_path))
        cat.write("t", spark.range(7).toDF("id"))

        def crash(src, dst):
            raise KeyboardInterrupt("kill -9")  # simulated hard kill

        monkeypatch.setattr(os, "link", crash)
        with pytest.raises(KeyboardInterrupt):
            cat.write("t", spark.range(11).toDF("id"))
        monkeypatch.undo()
        # no recovery step, no .bak: the old version is simply still current
        assert cat.exists("t")
        assert cat.read("t").count() == 7
        cat.write("t", spark.range(3).toDF("id"))
        assert cat.read("t").count() == 3

    def test_concurrent_commit_conflict_retries(self, spark, tmp_path):
        # os.link put-if-absent is the optimistic-concurrency gate: simulate
        # a racing writer by pre-creating the version-2 commit file; the
        # writer must detect EEXIST and land at version 3 without clobbering
        import json
        import os

        cat = Catalog(spark, str(tmp_path))
        cat.write("t", spark.range(4).toDF("id"))  # version 1
        rival_snap = f"{tmp_path}/_data/t/v2_rival000"
        spark.range(6).toDF("id").write.parquet(rival_snap)
        with open(f"{tmp_path}/_log/t/{2:020d}.json", "w") as fh:
            json.dump({"version": 2, "dir": "v2_rival000", "ts": 0}, fh)
        cat.write("t", spark.range(8).toDF("id"))  # must commit as version 3
        assert cat.read("t").count() == 8
        versions = sorted(os.listdir(f"{tmp_path}/_log/t"))
        assert versions == [f"{3:020d}.json"]  # superseded commits GC'd

    def test_legacy_bare_table_and_bak_heal(self, spark, tmp_path):
        # pre-commit-log catalogs: a bare {name}.parquet is readable as
        # version 0, a crashed old-style swap (.bak only) heals, and the
        # first committed write supersedes and removes the legacy files
        import os

        spark.range(7).toDF("id").write.parquet(f"{tmp_path}/t.parquet")
        cat = Catalog(spark, str(tmp_path))
        assert cat.exists("t") and cat.read("t").count() == 7
        os.rename(f"{tmp_path}/t.parquet", f"{tmp_path}/t.parquet.bak")
        assert cat.exists("t")  # healed from .bak
        assert cat.read("t").count() == 7
        cat.write("t", spark.range(4).toDF("id"))
        assert cat.read("t").count() == 4
        assert not os.path.exists(f"{tmp_path}/t.parquet")
        assert not os.path.exists(f"{tmp_path}/t.parquet.bak")

    def test_record_name_validation(self):
        validate_record_name("S2A_MSIL1C_2018:tile-31")
        with pytest.raises(ValueError):
            validate_record_name("bad name with spaces")

    @pytest.mark.parametrize(
        "patch",
        [
            {"min_value": 5.0, "max_value": 1.0},
            {"real_min_value": 2.0, "real_max_value": 1.0},
            {"exponent": 0.0},
            {"dtype": "Bool"},  # reserved/unsupported (datatype.go:16 comment)
        ],
    )
    def test_dmapping_validation(self, patch):
        dm = {
            "dtype": "Int16", "no_data": 0.0, "min_value": 0.0, "max_value": 100.0,
            "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
        }
        dm.update(patch)
        with pytest.raises(ValueError):
            validate_dmapping(dm)

    def test_tidy_catalog(self, spark, fixture_dir, tmp_path):
        cat = Catalog(spark, str(tmp_path))
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet").limit(50)
        cat.write("datasets", datasets)
        for t in ("records", "aoi", "containers"):
            cat.write(t, spark.read.parquet(f"{fixture_dir}/{t}.parquet"))
        n_records_before = cat.read("records").count()
        dry = tidy_catalog(cat, dry_run=True)
        assert cat.read("records").count() == n_records_before  # dry run: no write
        removed = tidy_catalog(cat)
        # limiting datasets orphans some records/containers -> nonzero cleanup
        assert removed["records"] > 0
        assert removed["containers"] > 0
        assert removed == dry
        # the prune was persisted (reference TidyDB really deletes) ...
        assert cat.read("records").count() == n_records_before - removed["records"]
        # ... and tidy is idempotent: a second pass finds nothing to remove
        assert tidy_catalog(cat) == {"records": 0, "aoi": 0, "containers": 0}


class TestUpdateDatasets:
    def test_impact_groups_by_mapping(self, spark, fixture_dir):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        impact = update_datasets_impact(datasets, DatasetFilters(status="ACTIVE", order=False))
        rows = impact.collect()
        assert sum(r["n_datasets"] for r in rows) == datasets.filter(
            F.col("status") == "ACTIVE"
        ).count()
        assert len(rows) >= 2  # several distinct mappings in fixtures

    def test_apply_update(self, spark, fixture_dir):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        new_dm = {
            "dtype": "Float32", "no_data": -1.0, "min_value": 0.0, "max_value": 1.0,
            "real_min_value": 0.0, "real_max_value": 1.0, "exponent": 1.0,
        }
        flt = DatasetFilters(status="TODELETE", order=False)
        out = update_datasets(datasets, flt, new_dm)
        assert out.count() == datasets.count()  # row-preserving
        changed = out.filter(
            (F.col("status") == "TODELETE") & (F.col("dmapping.no_data") == -1.0)
        ).count()
        assert changed == datasets.filter(F.col("status") == "TODELETE").count()
        untouched = out.filter(
            (F.col("status") != "TODELETE") & (F.col("dmapping.no_data") == -1.0)
        ).count()
        assert untouched == 0


class TestDeleteDatasets:
    def test_delete_with_container_gc(self, spark, fixture_dir):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        containers = spark.read.parquet(f"{fixture_dir}/containers.parquet")
        flt = DatasetFilters(status="INACTIVE", order=False)
        survivors, dead = delete_datasets(datasets, containers, flt)
        n_doomed = datasets.filter(F.col("status") == "INACTIVE").count()
        assert survivors.count() == datasets.count() - n_doomed
        # every GC'd container is managed and has no surviving dataset
        dead_uris = {r["uri"] for r in dead.collect()}
        live_uris = {r["container_uri"] for r in survivors.collect()}
        assert dead_uris.isdisjoint(live_uris)
        managed = {
            r["uri"] for r in containers.filter(F.col("managed")).collect()
        }
        assert dead_uris <= managed


class TestDownloadCube:
    def test_cube_from_caller_metadata(self, spark, fixture_dir):
        tiles = spark.read.parquet(f"{fixture_dir}/tiles.parquet").filter(F.col("level") == 0)
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        records = spark.read.parquet(f"{fixture_dir}/records.parquet")
        meta = (
            datasets.filter(F.col("dmapping.no_data") == -32768.0)
            .join(
                records.select(F.col("id").alias("record_id"), F.col("datetime").alias("record_datetime")),
                "record_id",
            )
            .select("container_uri", "record_id", "record_datetime")
        )
        cube = get_cube_from_metadatas(meta, tiles, nodata=-32768.0)
        rows = cube.collect()
        assert len(rows) == 4 and all(len(r["px"]) == 4096 for r in rows)


class TestGridDispatch:
    def test_dispatch_all_grids(self, spark, fixture_dir):
        layouts = {r["name"]: r for r in spark.read.parquet(f"{fixture_dir}/layouts.parquet").collect()}
        cells = spark.read.parquet(f"{fixture_dir}/cells.parquet")
        rects = [(-165.0, -38.0, -150.0, -20.0)]

        regular = cover_for_layout(spark, layouts["regular_256"], rects)
        assert regular.count() > 0

        single = cover_for_layout(spark, layouts["singlecell"], rects)
        ox, oy, w, h = single
        assert w > 0 and h > 0

        # mgrs_like has resolution=10 and no subgrid -> per newCustomGrid
        # (customgrid.go:44-54) the cover recurses with a singlecell subgrid:
        # one tile per intersected cell, URI cellID/originX/originY/w/h
        custom = cover_for_layout(spark, layouts["mgrs_like"], rects, cells)
        rows = custom.collect()
        assert len(rows) == 25
        for r in rows:
            cell_id, ox, oy, w, h = r["cell_uri"].split("/")
            assert cell_id == r["cell_id"]
            assert float(ox) == pytest.approx(r["origin_x"], abs=1e-3)
            assert float(oy) == pytest.approx(r["origin_y"], abs=1e-3)
            assert int(w) == r["width"] > 0 and int(h) == r["height"] > 0

    def test_custom_without_cells_raises(self, spark, fixture_dir):
        layouts = {r["name"]: r for r in spark.read.parquet(f"{fixture_dir}/layouts.parquet").collect()}
        with pytest.raises(ValueError):
            cover_for_layout(spark, layouts["mgrs_like"], [(0.0, 0.0, 1.0, 1.0)], None)


class TestCustomSubgrid:
    """CustomGrid.Covers subgrid recursion (customgrid.go:70-108)."""

    RECTS = [(-165.0, -38.0, -150.0, -20.0)]

    def test_regular_subgrid_orientation(self, spark, fixture_dir):
        """Row index counts y-DOWN from oy (regulargrid.go:120-121:
        pixToCRS = Translation(ox,oy) * Scale(res,-res)); southern-
        hemisphere cells therefore get positive j."""
        from geocube_spark.operators.cover import cover_custom_subgrid

        cells = spark.read.parquet(f"{fixture_dir}/cells.parquet")
        out = cover_custom_subgrid(
            self.RECTS, cells.filter("grid = 'mgrs_like'"),
            {"subgrid": "regular", "resolution": "1000", "cell_size": "256"},
        ).collect()
        assert len(out) > 25  # genuinely recursed, not one row per cell
        span = 256 * 1000.0
        for r in out:
            assert r["cell_uri"] == f"{r['cell_id']}/{r['i']}/{r['j']}"
            assert r["j"] >= 0  # negative northings -> j counts down from oy=0
            # tile rect consistent with the (i, j) indices
            assert r["tile_xmin"] == pytest.approx(r["i"] * span)
            assert r["tile_ymax"] == pytest.approx(-r["j"] * span)

    def test_resolution_implies_singlecell(self, spark, fixture_dir):
        """customgrid.go:44-54: no 'subgrid' parameter + 'resolution' ->
        subgrid = singlecell."""
        from geocube_spark.operators.cover import cover_custom_subgrid

        cells = spark.read.parquet(f"{fixture_dir}/cells.parquet")
        out = cover_custom_subgrid(
            self.RECTS, cells.filter("grid = 'mgrs_like'"), {"resolution": "10"}
        ).collect()
        assert len(out) == 25
        ids = {r["cell_id"] for r in out}
        assert len(ids) == 25  # exactly one singlecell tile per custom cell

    def test_singlecell_matches_reference_formula(self, spark, fixture_dir):
        """Singlecell tile = bbox of the PROJECTED intersection corners
        (singlecellgrid.go:62-80: transform ring vertices, take bounds,
        origin = top-left, sizes = math.Round(extent/res))."""
        import math

        from geocube_spark.functions.crs import transform_points
        from geocube_spark.operators.cover import cover_custom, cover_custom_subgrid

        cells = spark.read.parquet(f"{fixture_dir}/cells.parquet").filter(
            "grid = 'mgrs_like'"
        )
        inter = {r["id"]: r for r in cover_custom(self.RECTS, cells).collect()}
        out = cover_custom_subgrid(self.RECTS, cells, {"resolution": "10"}).collect()
        assert set(inter) == {r["cell_id"] for r in out}
        for r in out:
            ref = inter[r["cell_id"]]
            x0, y0, x1, y1 = ref["isect_bounds"]
            import numpy as np

            px, py = transform_points(
                4326, ref["srid"],
                np.array([x0, x1, x1, x0]), np.array([y0, y0, y1, y1]),
            )
            bx0, bx1 = round(px.min(), 3), round(px.max(), 3)
            by0, by1 = round(py.min(), 3), round(py.max(), 3)
            assert r["origin_x"] == pytest.approx(bx0, abs=1e-9)
            assert r["origin_y"] == pytest.approx(by1, abs=1e-9)
            assert r["width"] == int(math.floor(abs(bx1 - bx0) / 10.0 + 0.5))
            assert r["height"] == int(math.floor(abs(by1 - by0) / 10.0 + 0.5))

    def test_missing_params_raise(self, spark, fixture_dir):
        from geocube_spark.operators.cover import cover_custom_subgrid

        cells = spark.read.parquet(f"{fixture_dir}/cells.parquet")
        with pytest.raises(ValueError, match="subgrid.*or.*resolution"):
            cover_custom_subgrid(self.RECTS, cells, {})
        with pytest.raises(ValueError, match="unknown subgrid"):
            cover_custom_subgrid(self.RECTS, cells, {"subgrid": "hex", "resolution": "1"})


class TestPurgePendingDeletions:
    """Storage-GC manifest consumer (filesystem strategy semantics,
    interface/storage/filesystem/strategy_test.go: delete ok, second
    delete errors unless IgnoreNotFound, bulk with holes)."""

    def test_bulk_delete_with_holes(self, spark, tmp_path):
        import os

        from geocube_spark.operators.admin import purge_pending_deletions

        files = []
        for i in range(20):
            p = tmp_path / f"dead_{i}.tif"
            p.write_bytes(b"x")
            files.append(str(p))
        for p in files[5:10]:  # pre-remove a hole, like the reference test
            os.remove(p)
        manifest = spark.createDataFrame(
            [(f"file://{p}",) for p in files] + [("s3://bucket/far.tif",)],
            "uri string",
        )
        got = {r["uri"]: r["status"] for r in purge_pending_deletions(manifest).collect()}
        assert sum(s == "deleted" for s in got.values()) == 15
        assert sum(s == "missing" for s in got.values()) == 5
        assert got["s3://bucket/far.tif"] == "unsupported"
        assert all(not os.path.exists(p) for p in files)

    def test_missing_raises_without_ignore(self, spark, tmp_path):
        from pyspark.errors.exceptions.captured import PythonException

        from geocube_spark.operators.admin import purge_pending_deletions

        manifest = spark.createDataFrame(
            [(f"file://{tmp_path}/never_existed.tif",)], "uri string"
        )
        with pytest.raises(PythonException, match="No such file"):
            purge_pending_deletions(manifest, ignore_not_found=False).collect()
