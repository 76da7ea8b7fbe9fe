"""Physical-plan regression gate (SURVEY.md scale discipline, VERDICT r2 #6).

Plans every registered query at sf0.001 and fails on scale red flags:
CartesianProduct anywhere, or BroadcastNestedLoopJoin outside the audited
allowlist (bounded-broadcast theta joins, documented in
scripts/explain_audit.py).  This is the same check `scripts/explain_audit.py`
writes into PLANS.md — wired into pytest so the audit can't silently rot:
a regressed broadcast (e.g. a lost F.broadcast hint making an all-pairs
join) fails CI instead of just changing a markdown file.

Planning only — no query is executed, so the whole sweep is cheap.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from explain_audit import EXPECTED_BNLJ, formatted_plan, plan_flags, plan_stats

import pyfads.llm_queries  # noqa: F401  (registers queries)
import pyfads.primitives_queries  # noqa: F401
import pyfads.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _all_queries():
    return sorted(Q.QUERIES.items())


@pytest.mark.parametrize("name,fn", _all_queries(), ids=[n for n, _ in _all_queries()])
def test_plan_has_no_scale_red_flags(spark, name, fn):
    df = fn(spark, SF_DIR)
    flags = plan_flags(name, plan_stats(formatted_plan(df)))
    assert flags == [], f"{name}: plan regression {flags}"


def test_gate_actually_fires(spark):
    """Breaking a broadcast must trip the gate: a genuine unhinted cross
    join plans as CartesianProduct/BNLJ and must be flagged."""
    from pyfads.io import read_table

    a = read_table(spark, SF_DIR, "region")
    b = read_table(spark, SF_DIR, "nation")
    bad = a.crossJoin(b)
    stats = plan_stats(formatted_plan(bad))
    assert stats["cartesian"] + stats["bnlj"] >= 1
    assert plan_flags("not_an_allowlisted_query", stats) != []


def test_single_partition_gate_fires(spark):
    """A global (un-partitioned) Window serializes every row through one
    task — the canary proves the SinglePartition flag catches it."""
    from pyspark.sql import Window, functions as F

    from pyfads.io import read_table

    df = read_table(spark, SF_DIR, "events")
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("event_id")))
    stats = plan_stats(formatted_plan(bad))
    assert stats["singlePartition"] >= 1
    assert "SINGLE_PARTITION(unexpected)" in plan_flags("not_allowlisted", stats)


def test_bnlj_allowlist_is_tight():
    """Every allowlisted name must still be a registered query (no stale
    entries hiding future regressions under a dead name)."""
    from explain_audit import EXPECTED_SINGLE_PARTITION

    unknown = EXPECTED_BNLJ - set(Q.QUERIES)
    assert unknown == set(), f"stale EXPECTED_BNLJ entries: {unknown}"
    unknown_sp = EXPECTED_SINGLE_PARTITION - set(Q.QUERIES)
    assert unknown_sp == set(), f"stale EXPECTED_SINGLE_PARTITION entries: {unknown_sp}"
