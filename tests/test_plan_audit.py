"""Repo-wide plan-quality gate: EVERY registered query's physical plan is
checked for the scale anti-patterns that would sink a 100 TB run.

Complements test_plan_quality.py (which freezes specific per-query plan
shapes); this file is the blanket rule set:

  * no CartesianProduct anywhere;
  * no BatchEvalPython (row-at-a-time Python UDF) anywhere — Python only
    enters through Arrow-batched nodes;
  * BroadcastNestedLoopJoin only where a small/1-row broadcast side is the
    declared design (scalar stats, query vectors, small cell lists).
"""

from __future__ import annotations

import os

import pytest

from geocube_spark import registry
from tools.plan_audit import (
    HARD_RULES_EXEMPT_BNLJ,
    PLAN_SIZE_CAP_KB,
    audit_plan,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def plans(spark):
    registry.ensure_fixtures()
    out = {}
    for name, fn in sorted(registry.queries().items()):
        df = fn(spark, SF_DIR)
        out[name] = audit_plan(df._jdf.queryExecution().executedPlan().toString())
    return out


def test_no_cartesian_product_anywhere(plans):
    bad = [n for n, m in plans.items() if m["cartesian"]]
    assert bad == []


def test_no_row_at_a_time_python_udf(plans):
    bad = [n for n, m in plans.items() if m["py_row"]]
    assert bad == []


def test_bnlj_only_where_declared(plans):
    bad = [
        n
        for n, m in plans.items()
        if m["bnlj"] and n not in HARD_RULES_EXEMPT_BNLJ
    ]
    assert bad == []


def test_plan_size_capped(plans):
    """No query may bake large literal blocks (centroid matrices, generated
    when()-chains) into its plan — models/matrices travel in closures or
    broadcast vars, so plan size stays O(1) in the model constants."""
    bad = {n: m["plan_kb"] for n, m in plans.items() if m["plan_kb"] > PLAN_SIZE_CAP_KB}
    assert bad == {}


def test_exemption_list_is_not_stale(plans):
    """Every exempted query still exists AND still uses a BNLJ — prune the
    list when a plan improves past it, so a later regression in that query
    is caught instead of masked by the stale exemption."""
    for name in HARD_RULES_EXEMPT_BNLJ:
        assert name in plans, f"exempt query {name} no longer registered"
        assert plans[name]["bnlj"] > 0, (
            f"exempt query {name} no longer uses a BNLJ — remove it from "
            "HARD_RULES_EXEMPT_BNLJ"
        )


def test_plans_md_row_count_matches_registry():
    """The committed PLANS.md inventory must cover EVERY registered query —
    a late-round query without an audit row means the end-of-round
    `plan_audit.py --write-md` regen was skipped (round-6 verdict: 175
    rows vs 190 queries)."""
    import re

    from geocube_spark import registry

    with open("/root/repo/PLANS.md") as f:
        names = {
            m.group(1)
            for line in f
            if (m := re.match(r"\| (\w+) \|", line)) and m.group(1) != "query"
        }
    registered = set(registry.queries())
    assert names == registered, (
        f"PLANS.md is stale: missing {sorted(registered - names)[:5]}..., "
        f"extra {sorted(names - registered)[:5]} — regenerate with "
        "`python tools/plan_audit.py /root/testdata/sf0.001 --write-md`"
    )
