"""find_datasets / find_records / cube-plan correctness vs a DuckDB oracle
over the deterministic fixture tables."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from geocube_spark.plans.cube import get_cube_headers, group_by_record, merge_tags
from geocube_spark.plans.find_datasets import DatasetFilters, find_datasets
from geocube_spark.plans.find_records import RecordFilters, find_records


@pytest.fixture(scope="module")
def fx(spark, fixture_dir):
    return {
        "datasets": spark.read.parquet(f"{fixture_dir}/datasets.parquet"),
        "records": spark.read.parquet(f"{fixture_dir}/records.parquet"),
        "aoi": spark.read.parquet(f"{fixture_dir}/aoi.parquet"),
        "tiles": spark.read.parquet(f"{fixture_dir}/tiles.parquet"),
    }


@pytest.fixture(scope="module")
def fduck(fixture_dir):
    con = duckdb.connect()
    for t in ("aoi", "records", "datasets", "tiles", "jobs", "tasks"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fixture_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def ids(df, col="id"):
    return sorted(r[col] for r in df.select(col).collect())


class TestFindDatasets:
    def test_status_filter(self, fx, fduck):
        out = find_datasets(fx["datasets"], None, DatasetFilters(status="ACTIVE", order=False))
        expect = fduck.sql("SELECT count(*) c FROM datasets WHERE status='ACTIVE'").fetchone()[0]
        assert out.count() == expect

    def test_time_range_and_order(self, fx, fduck):
        flt = DatasetFilters(
            time_from=datetime(2018, 2, 1), time_to=datetime(2018, 4, 1), status="ACTIVE"
        )
        out = find_datasets(fx["datasets"], fx["records"], flt)
        got = [r["id"] for r in out.select("id", "record_datetime", "record_id").collect()]
        expect = [
            r[0]
            for r in fduck.sql(
                """
                SELECT d.id FROM datasets d JOIN records r ON d.record_id = r.id
                WHERE d.status='ACTIVE'
                  AND r.datetime >= TIMESTAMP '2018-02-01'
                  AND r.datetime <= TIMESTAMP '2018-04-01'
                ORDER BY r.datetime, r.id, d.id
                """
            ).fetchall()
        ]
        assert sorted(got) == sorted(expect)
        # W1 order: datetime then record id (our output may tie-break
        # differently inside a record; compare the (datetime, record) chain)
        times = [r["record_datetime"] for r in out.select("record_datetime").collect()]
        assert times == sorted(times)

    def test_tag_filters(self, fx, fduck):
        flt = DatasetFilters(status=None, tags={"CONSTELLATION": "SENTINEL2", "ORBIT": ""}, order=False)
        out = find_datasets(fx["datasets"], fx["records"], flt)
        expect = fduck.sql(
            """
            SELECT count(*) FROM datasets d JOIN records r ON d.record_id = r.id
            WHERE r.tags['CONSTELLATION'][1] = 'SENTINEL2'
              AND list_contains(map_keys(r.tags), 'ORBIT')
            """
        ).fetchone()[0]
        assert out.count() == expect

    def test_tag_glob(self, fx, fduck):
        flt = DatasetFilters(status=None, tags={"CONSTELLATION": "SENTINEL*"}, order=False)
        out = find_datasets(fx["datasets"], fx["records"], flt)
        expect = fduck.sql(
            """
            SELECT count(*) FROM datasets d JOIN records r ON d.record_id = r.id
            WHERE r.tags['CONSTELLATION'][1] LIKE 'SENTINEL%'
            """
        ).fetchone()[0]
        assert out.count() == expect

    def test_record_name_glob(self, fx, fduck):
        flt = DatasetFilters(status=None, record_name_glob="S2A_00000?", order=False)
        out = find_datasets(fx["datasets"], fx["records"], flt)
        expect = fduck.sql(
            r"""
            SELECT count(*) FROM datasets d JOIN records r ON d.record_id = r.id
            WHERE r.name LIKE 'S2A\_00000_' ESCAPE '\'
            """
        ).fetchone()[0]
        assert out.count() == expect

    def test_container_uri_globs(self, fx, fduck):
        flt = DatasetFilters(
            status=None, container_uri_globs=["file:///synth/1*.tif", "file:///synth/2.tif"],
            order=False,
        )
        out = find_datasets(fx["datasets"], None, flt)
        expect = fduck.sql(
            r"""
            SELECT count(*) FROM datasets
            WHERE container_uri LIKE 'file:///synth/1%.tif' ESCAPE '\'
               OR container_uri = 'file:///synth/2.tif'
            """
        ).fetchone()[0]
        assert out.count() == expect

    def test_spatial_two_phase(self, fx, fduck):
        rect = (0.0, -40.0, 5.0, -20.0)
        flt = DatasetFilters(status=None, extent=rect, refine_srid=4326, order=False)
        out = find_datasets(fx["datasets"], None, flt)
        # oracle: bbox arithmetic (rect fixtures make bbox == exact shape);
        # interior-intersects = strict inequalities for same-SRID shapes
        expect = fduck.sql(
            f"""
            SELECT count(*) FROM datasets
            WHERE bbox.xmin <= {rect[2]} AND bbox.xmax >= {rect[0]}
              AND bbox.ymin <= {rect[3]} AND bbox.ymax >= {rect[1]}
              AND (shape_srid != 4326 OR
                   (bbox.xmin < {rect[2]} AND bbox.xmax > {rect[0]}
                    AND bbox.ymin < {rect[3]} AND bbox.ymax > {rect[1]}))
            """
        ).fetchone()[0]
        assert out.count() == expect

    def test_pagination(self, fx):
        flt = DatasetFilters(status=None, limit=10, offset=5)
        p0 = find_datasets(fx["datasets"], fx["records"], flt).collect()
        flt2 = DatasetFilters(status=None, limit=15, offset=0)
        p1 = find_datasets(fx["datasets"], fx["records"], flt2).collect()
        assert [r["id"] for r in p0] == [r["id"] for r in p1[5:15]]

    def test_locked_by_job(self, fx, fduck):
        out = find_datasets(fx["datasets"], None, DatasetFilters(status=None, locked_by_job_id="job-0", order=False))
        expect = fduck.sql("SELECT count(*) FROM datasets WHERE locked_by_job_id='job-0'").fetchone()[0]
        assert out.count() == expect


class TestFindRecords:
    def test_name_and_time(self, fx, fduck):
        flt = RecordFilters(name_glob="S2A_*", time_to=datetime(2018, 3, 1))
        out = find_records(fx["records"], None, flt)
        expect = fduck.sql(
            r"""SELECT count(*) FROM records
            WHERE name LIKE 'S2A\_%' ESCAPE '\' AND datetime <= TIMESTAMP '2018-03-01'"""
        ).fetchone()[0]
        assert out.count() == expect

    def test_aoi_join(self, fx, fduck):
        flt = RecordFilters(aoi_extent=(-170.0, -40.0, -160.0, 0.0), order=False)
        out = find_records(fx["records"], fx["aoi"], flt)
        expect = fduck.sql(
            """
            SELECT count(*) FROM records r JOIN aoi a ON r.aoi_id = a.id
            WHERE a.bbox.xmin <= -160.0 AND a.bbox.xmax >= -170.0
              AND a.bbox.ymin <= 0.0 AND a.bbox.ymax >= -40.0
            """
        ).fetchone()[0]
        assert out.count() == expect


class TestCubePlan:
    def test_group_by_record(self, fx, fduck):
        d = find_datasets(fx["datasets"], fx["records"], DatasetFilters())
        grouped = group_by_record(d)
        rows = grouped.collect()
        expect = fduck.sql(
            """
            SELECT d.record_id, count(*) n FROM datasets d JOIN records r ON d.record_id=r.id
            WHERE d.status='ACTIVE' GROUP BY d.record_id
            """
        ).fetchall()
        assert {r["record_id"]: r["n_datasets"] for r in rows} == {a: b for a, b in expect}
        # slice order is (datetime, record_id)
        keys = [(r["record_datetime"], r["record_id"]) for r in rows]
        assert keys == sorted(keys)

    def test_group_by_record_groups_order(self, fx):
        recs = [r["id"] for r in fx["records"].select("id").limit(6).collect()]
        groups = [[recs[4], recs[1]], [recs[0]], [recs[2], recs[3], recs[5]]]
        d = find_datasets(fx["datasets"], fx["records"], DatasetFilters(status=None))
        out = get_cube_headers(fx["datasets"], fx["records"], DatasetFilters(status=None), groups)
        rows = out.collect()
        assert [r["group_idx"] for r in rows] == [0, 1, 2]
        # in-group order preserved via member_idx sort (hard part #5)
        g0 = rows[0]["members"]
        assert [m["member_idx"] for m in g0] == sorted(m["member_idx"] for m in g0)
        _ = d

    def test_merge_tags(self, spark):
        df = spark.createDataFrame(
            [
                (1, [{"A": "x", "B": "y"}, {"A": "x", "B": "z"}]),
            ],
            "g INT, tags_list ARRAY<MAP<STRING,STRING>>",
        )
        out = merge_tags(df).collect()[0]["merged_tags"]
        # A agrees -> kept; B diverges -> suffixed per source index (A6)
        assert out["A"] == "x"
        assert out["B.0"] == "y" and out["B.1"] == "z"
        assert "B" not in out


class TestHeadersOnlyCube:
    def test_end_to_end(self, fx):
        flt = DatasetFilters(
            status="ACTIVE",
            time_from=datetime(2018, 1, 1),
            time_to=datetime(2018, 6, 1),
            tags={"CONSTELLATION": "SENTINEL2"},
            extent=(-170.0, -40.0, -150.0, 10.0),
        )
        out = get_cube_headers(fx["datasets"], fx["records"], flt)
        rows = out.collect()
        assert len(rows) > 0
        assert all(r["n_datasets"] >= 1 for r in rows)
        keys = [(r["record_datetime"], r["record_id"]) for r in rows]
        assert keys == sorted(keys)


class TestCatalogCompaction:
    """Catalog.compact: small-files rewrite through the commit log."""

    def test_compact_reduces_files_preserves_rows(self, spark, tmp_path):
        from geocube_spark.sources.catalog import Catalog

        cat = Catalog(spark, str(tmp_path))
        df = spark.range(1000).withColumnRenamed("id", "k")
        # accrete a fragmented snapshot: 16 part files for 1000 tiny rows
        cat.write("frag", df.repartition(16))
        stats = cat.compact("frag")
        assert stats["files_before"] == 16
        assert stats["files_after"] == 1
        out = cat.read("frag")
        assert out.count() == 1000
        assert {r["k"] for r in out.collect()} == set(range(1000))

    def test_compact_noop_when_already_compact(self, spark, tmp_path):
        from geocube_spark.sources.catalog import Catalog

        cat = Catalog(spark, str(tmp_path))
        cat.write("tiny", spark.range(10).coalesce(1))
        v_before = cat._current("tiny")[0]
        stats = cat.compact("tiny")
        assert stats["files_after"] == stats["files_before"]
        # no new version published for a no-op
        assert cat._current("tiny")[0] == v_before

    def test_compact_missing_table_raises(self, spark, tmp_path):
        import pytest as _pytest

        from geocube_spark.sources.catalog import Catalog

        with _pytest.raises(FileNotFoundError):
            Catalog(spark, str(tmp_path)).compact("nope")


class TestTimeTravel:
    """Catalog version retention: Delta-style read(version=) / history()."""

    def test_read_past_versions(self, spark, tmp_path):
        from geocube_spark.sources.catalog import Catalog

        cat = Catalog(spark, str(tmp_path), retain_versions=3)
        for n in (10, 20, 30):
            cat.write("t", spark.range(n).coalesce(1))
        assert cat.read("t").count() == 30
        assert cat.read("t", version=2).count() == 20
        assert cat.read("t", version=1).count() == 10

    def test_gc_beyond_horizon_raises(self, spark, tmp_path):
        from geocube_spark.sources.catalog import Catalog

        cat = Catalog(spark, str(tmp_path), retain_versions=2)
        for n in (1, 2, 3, 4):
            cat.write("t", spark.range(n).coalesce(1))
        # versions 1 and 2 are beyond the 2-version horizon: swept
        with pytest.raises(FileNotFoundError, match="retained"):
            cat.read("t", version=1)
        assert cat.read("t", version=3).count() == 3
        assert cat.read("t", version=4).count() == 4

    def test_retained_snapshot_dirs_survive_age_sweep(self, spark, tmp_path, monkeypatch):
        import os
        import time as _time

        from geocube_spark.sources.catalog import Catalog

        cat = Catalog(spark, str(tmp_path), retain_versions=2)
        cat.write("t", spark.range(5).coalesce(1))
        # age the v1 snapshot dir past the orphan-sweep threshold
        ddir = cat._data_dir("t")
        for entry in os.listdir(ddir):
            old = _time.time() - 7200
            os.utime(f"{ddir}/{entry}", (old, old))
        cat.write("t", spark.range(6).coalesce(1))
        # v1 is RETAINED (horizon = 2): the age sweep must not eat it
        assert cat.read("t", version=1).count() == 5

    def test_history_newest_first(self, spark, tmp_path):
        from geocube_spark.sources.catalog import Catalog

        cat = Catalog(spark, str(tmp_path), retain_versions=4)
        for n in (1, 2, 3):
            cat.write("t", spark.range(n).coalesce(1))
        hist = cat.history("t").collect()
        assert [r["version"] for r in hist] == [3, 2, 1]
        assert all(r["dir"].startswith("v") for r in hist)

    def test_default_retention_keeps_only_current(self, spark, tmp_path):
        from geocube_spark.sources.catalog import Catalog

        cat = Catalog(spark, str(tmp_path))  # retain_versions=1
        cat.write("t", spark.range(1).coalesce(1))
        cat.write("t", spark.range(2).coalesce(1))
        with pytest.raises(FileNotFoundError):
            cat.read("t", version=1)
        assert cat.read("t").count() == 2


class TestSmallWriteCoalesce:
    """Provably-small snapshot writes land as ONE part file (guide §6);
    explicit caller layouts are never overridden."""

    def _parts(self, cat, name):
        import os

        path = cat._current(name)[1]
        return sum(
            f.endswith(".parquet")
            for _dp, _dn, fns in os.walk(path)
            for f in fns
        )

    def test_small_estimable_write_is_one_file(self, spark, tmp_path):
        from geocube_spark.functions.localdf import values_df
        from geocube_spark.sources.catalog import Catalog

        cat = Catalog(spark, str(tmp_path))
        cat.write("small", values_df(spark, [(1,), (2,), (3,)], ["v"]))
        assert self._parts(cat, "small") == 1
        assert {r["v"] for r in cat.read("small").collect()} == {1, 2, 3}

    def test_explicit_repartition_layout_is_kept(self, spark, tmp_path):
        from geocube_spark.sources.catalog import Catalog

        cat = Catalog(spark, str(tmp_path))
        cat.write("pinned", spark.range(64).repartition(4))
        assert self._parts(cat, "pinned") == 4
