"""Materialized views over the commit-log catalog.

The catalog gives tables Delta-style versioned commits (sources/
catalog.py); a materialized view is a derived table whose commit record
additionally pins THE EXACT VERSIONS of its upstream tables at build
time.  Freshness is then a pure metadata comparison — recorded dep
versions vs current ones — with no data read, no fingerprint scan:

    create:   mv_deps = {dep: current_version(dep)} stored in the commit
    check:    stale  <=>  any dep's current version != recorded version
    refresh:  rebuild + re-pin (one new MV commit; time travel keeps the
              previous materialization readable)

This is the standard warehouse MV freshness protocol (Delta/BigQuery MVs
pin source table versions the same way) restated on the engine's own
commit log.  Reads serve the SNAPSHOT — a stale view never silently
recomputes unless the caller opts in (``mode='auto'``), because at 100 TB
an accidental rebuild is the expensive mistake, not a stale read.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame

from geocube_spark.sources.catalog import Catalog


def _newest_commit(cat: Catalog, name: str) -> dict | None:
    commits = cat._commits(name)
    if not commits:
        return None
    with open(commits[-1][1]) as fh:
        return json.load(fh)


def _dep_versions(cat: Catalog, deps: list[str]) -> dict[str, int]:
    out = {}
    for d in deps:
        cur = cat._current(d)
        if cur is None:
            raise FileNotFoundError(f"materialized-view dependency {d!r} does not exist")
        out[d] = cur[0]
    return out


def create_materialized_view(
    cat: Catalog,
    name: str,
    builder: Callable[[Catalog], DataFrame],
    deps: list[str],
) -> int:
    """Materialize ``builder(cat)`` as table ``name``, pinning the current
    version of every table in ``deps``.  Returns the MV's commit version."""
    pinned = _dep_versions(cat, deps)
    cat.write(name, builder(cat), commit_meta={"mv_deps": pinned})
    return cat._current(name)[0]


def view_staleness(cat: Catalog, name: str) -> dict:
    """{'fresh': bool, 'pinned': {dep: v}, 'current': {dep: v},
    'stale_deps': [dep, ...]} — metadata only, nothing is read."""
    rec = _newest_commit(cat, name)
    if rec is None or "mv_deps" not in rec:
        raise FileNotFoundError(f"{name!r} is not a materialized view")
    pinned = {d: int(v) for d, v in rec["mv_deps"].items()}
    current = _dep_versions(cat, list(pinned))
    stale = sorted(d for d in pinned if pinned[d] != current[d])
    return {
        "fresh": not stale,
        "pinned": pinned,
        "current": current,
        "stale_deps": stale,
    }


def read_materialized_view(
    cat: Catalog,
    name: str,
    builder: Callable[[Catalog], DataFrame] | None = None,
    mode: str = "cached",
) -> DataFrame:
    """Read the view snapshot.

    * ``cached`` (default): always serve the materialization, stale or not.
    * ``strict``: raise if any dependency moved since the build.
    * ``auto``: transparently rebuild + re-pin when stale (requires
      ``builder``), then serve the fresh snapshot.
    """
    st = view_staleness(cat, name)
    if st["fresh"] or mode == "cached":
        return cat.read(name)
    if mode == "strict":
        raise RuntimeError(
            f"materialized view {name!r} is stale (deps moved: {st['stale_deps']})"
        )
    if mode == "auto":
        if builder is None:
            raise ValueError("mode='auto' needs the view's builder to refresh")
        create_materialized_view(cat, name, builder, list(st["pinned"]))
        return cat.read(name)
    raise ValueError(f"unknown mode {mode!r}")
