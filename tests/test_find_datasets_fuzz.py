"""Property-based fuzz of the FindDatasets predicate COMBINATIONS.

Ten rounds of per-predicate oracle queries cover each filter alone; the
composable joinClause surface (reference pg.go:279-308) is where a rare
*combination* could still hide a bug — e.g. a record-side filter silently
changing the dataset-side join's null handling.  Hypothesis draws ~200
random ``DatasetFilters`` (status × instance ids × record ids × job lock ×
URI globs × time range × tag predicates × name glob × bbox), runs the real
Spark plan, and compares the returned dataset-id multiset against a
generated DuckDB WHERE clause over the same parquet — semantics derived
independently from the reference's SQL, not from plans/find_datasets.py.

Scope notes: ``order=False`` and no pagination (ties make paginated
comparisons nondeterministic; W1/L1 have dedicated order-asserted
queries), and no F8 exact refine (geometry-kernel parity has its own
golden tests) — the coarse F7 bbox IS fuzzed.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geocube_spark.plans.find_datasets import DatasetFilters, find_datasets

TAG_KEYS = ["CONSTELLATION", "ORBIT", "PROC", "NOPE"]
TAG_VALUES = ["SENTINEL1", "SENTINEL2", "L1C", "L2A", "ASC", "DESC",
              "SENTINEL*", "L?C", "", "MISSING"]
URI_GLOBS = ["file:///synth/*", "*synth*", "file:///synth/1?.tif",
             "file:///synth/7.tif", "nope://*"]
NAME_GLOBS = ["S2A_*", "S2A_0001*", "*_00000?", "NOPE*"]
T0 = datetime(2018, 1, 1)


def _glob_to_like(g: str) -> str:
    # the fuzz pool contains no %, _ or escapes by construction
    return g.replace("*", "%").replace("?", "_")


@st.composite
def filters(draw):
    f: dict = {"order": False}
    f["status"] = draw(st.sampled_from(
        [None, "ACTIVE", "INACTIVE", "TODELETE"]))
    if draw(st.booleans()):
        f["instance_ids"] = draw(st.lists(
            st.integers(0, 11), min_size=1, max_size=3, unique=True))
    if draw(st.booleans()):
        f["record_idx"] = draw(st.lists(
            st.integers(0, 210), min_size=1, max_size=8, unique=True))
    if draw(st.booleans()):
        f["locked_by_job_id"] = "job-0"
    if draw(st.booleans()):
        f["container_uri_globs"] = draw(st.lists(
            st.sampled_from(URI_GLOBS), min_size=1, max_size=2, unique=True))
    if draw(st.booleans()):
        f["time_from"] = T0 + timedelta(days=draw(st.integers(-5, 220)))
    if draw(st.booleans()):
        f["time_to"] = T0 + timedelta(days=draw(st.integers(-5, 220)))
    if draw(st.booleans()):
        f["tags"] = {
            draw(st.sampled_from(TAG_KEYS)): draw(st.sampled_from(TAG_VALUES))
        }
    if draw(st.booleans()):
        f["record_name_glob"] = draw(st.sampled_from(NAME_GLOBS))
    if draw(st.booleans()):
        xmin = draw(st.floats(-181, 179, allow_nan=False))
        ymin = draw(st.floats(-41, 10, allow_nan=False))
        f["extent"] = (xmin, ymin,
                       xmin + draw(st.floats(0.1, 30, allow_nan=False)),
                       ymin + draw(st.floats(0.1, 20, allow_nan=False)))
    return f


class TestFindDatasetsFuzz:
    @pytest.fixture(scope="class")
    def env(self, spark, fixture_dir):
        datasets = spark.read.parquet(f"{fixture_dir}/datasets.parquet")
        records = spark.read.parquet(f"{fixture_dir}/records.parquet")
        datasets.persist().count()
        records.persist().count()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW d AS SELECT * FROM "
            f"read_parquet('{fixture_dir}/datasets.parquet')"
        )
        con.execute(
            f"CREATE VIEW r AS SELECT * FROM "
            f"read_parquet('{fixture_dir}/records.parquet')"
        )
        rec_ids = [
            row[0] for row in
            con.sql("SELECT DISTINCT record_id FROM d ORDER BY 1").fetchall()
        ]
        inst_ids = [
            row[0] for row in
            con.sql("SELECT DISTINCT instance_id FROM d ORDER BY 1").fetchall()
        ]
        yield datasets, records, con, rec_ids, inst_ids
        datasets.unpersist()
        records.unpersist()

    def _oracle_sql(self, f: dict, rec_ids, inst_ids) -> str:
        where = ["TRUE"]
        if f.get("status") is not None:
            where.append(f"d.status = '{f['status']}'")
        if f.get("instance_ids"):
            ids = ", ".join(
                f"'{inst_ids[i % len(inst_ids)]}'" for i in f["instance_ids"])
            where.append(f"d.instance_id IN ({ids})")
        if f.get("record_idx"):
            ids = ", ".join(
                f"'{rec_ids[i % len(rec_ids)]}'" for i in f["record_idx"])
            where.append(f"d.record_id IN ({ids})")
        if f.get("locked_by_job_id"):
            where.append(f"d.locked_by_job_id = '{f['locked_by_job_id']}'")
        if f.get("container_uri_globs"):
            ors = " OR ".join(
                f"d.container_uri LIKE '{_glob_to_like(g)}'"
                for g in f["container_uri_globs"])
            where.append(f"({ors})")
        if f.get("extent"):
            xmin, ymin, xmax, ymax = f["extent"]
            where.append(
                f"NOT (d.bbox.xmax < {xmin!r} OR d.bbox.xmin > {xmax!r} "
                f"OR d.bbox.ymax < {ymin!r} OR d.bbox.ymin > {ymax!r})"
            )
        join = ""
        needs_records = (
            f.get("time_from") is not None or f.get("time_to") is not None
            or f.get("tags") or f.get("record_name_glob") is not None
        )
        if needs_records:
            join = "JOIN r ON d.record_id = r.id"
            if f.get("time_from") is not None:
                where.append(f"r.datetime >= TIMESTAMP '{f['time_from']}'")
            if f.get("time_to") is not None:
                where.append(f"r.datetime <= TIMESTAMP '{f['time_to']}'")
            for k, v in (f.get("tags") or {}).items():
                if v == "":
                    where.append(f"len(map_extract(r.tags, '{k}')) > 0")
                elif "*" in v or "?" in v:
                    where.append(
                        f"coalesce(map_extract(r.tags, '{k}')[1], '') "
                        f"LIKE '{_glob_to_like(v)}'"
                    )
                else:
                    where.append(
                        f"coalesce(map_extract(r.tags, '{k}')[1], '') = '{v}'"
                    )
            if f.get("record_name_glob") is not None:
                where.append(
                    f"r.name LIKE '{_glob_to_like(f['record_name_glob'])}'")
        return (
            f"SELECT d.id FROM d {join} WHERE "
            + " AND ".join(where) + " ORDER BY d.id"
        )

    # default trimmed 200 -> 40 so the suite fits the driver's verify
    # window (derandomized: the same leading examples every run); the full
    # sweep stays one env var away (weekly cadence):
    #   SPARK_GRAFT_FUZZ_EXAMPLES=200 pytest tests/test_find_datasets_fuzz.py
    @settings(
        max_examples=int(__import__("os").environ.get(
            "SPARK_GRAFT_FUZZ_EXAMPLES", "40")),
        deadline=None, derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(f=filters())
    def test_combination_matches_duckdb(self, env, f):
        datasets, records, con, rec_ids, inst_ids = env
        kwargs = dict(f)
        if "instance_ids" in kwargs:
            kwargs["instance_ids"] = [
                inst_ids[i % len(inst_ids)] for i in kwargs["instance_ids"]]
        if "record_idx" in kwargs:
            kwargs["record_ids"] = [
                rec_ids[i % len(rec_ids)] for i in kwargs.pop("record_idx")]
        flt = DatasetFilters(**kwargs)
        got = sorted(
            r["id"]
            for r in find_datasets(datasets, records, flt).select("id").collect()
        )
        expected = [
            row[0]
            for row in con.sql(self._oracle_sql(f, rec_ids, inst_ids)).fetchall()
        ]
        assert got == expected, f"filters={f}"
