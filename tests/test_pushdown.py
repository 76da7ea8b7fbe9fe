"""Positive plan evidence: filters and projections must REACH the parquet
scan (PushedFilters / pruned scan schema), not execute above it.  The
red-flag gate (test_plans.py) catches catastrophic plans; this catches the
quieter regression where a refactor silently turns a pruned scan into a
read-everything scan.
"""

from __future__ import annotations

import re

from tests.conftest import SF_DIR

import pyfads.tpch_queries as T
from pyfads.io import read_table


def _scan_lines(df, table: str) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and table in ln
    ]


def test_shipdate_filter_pushed_to_scan(spark):
    scans = _scan_lines(T.pricing_summary_q(spark, SF_DIR), "lineitem")
    assert scans, "no lineitem scan found"
    ln = scans[0]
    assert "PushedFilters" in ln and "l_shipdate" in ln.split("PushedFilters")[1], ln
    # the scan must NOT read the unused key/linenumber columns
    cols = re.search(r"FileScan parquet \[([^\]]*)\]", ln).group(1)
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols


def test_anti_join_probe_side_is_column_pruned(spark):
    """customers_no_orders needs only (o_custkey) from orders, with its
    date filter pushed down — the probe side reads one BIGINT per row."""
    scans = _scan_lines(T.customers_no_orders_q(spark, SF_DIR), "orders")
    assert scans, "no orders scan found"
    ln = scans[0]
    cols = re.search(r"FileScan parquet \[([^\]]*)\]", ln).group(1)
    colnames = {c.split("#")[0] for c in cols.split(",") if c}
    assert colnames == {"o_custkey", "o_orderdate"}, colnames
    assert "o_orderdate" in ln.split("PushedFilters")[1], ln


def test_projection_prunes_scan_schema(spark):
    """A 2-column projection over the 10-column lineitem must scan 2."""
    df = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    ln = _scan_lines(df, "lineitem")[0]
    cols = re.search(r"FileScan parquet \[([^\]]*)\]", ln).group(1)
    colnames = {c.split("#")[0] for c in cols.split(",") if c}
    assert colnames == {"l_orderkey", "l_quantity"}, colnames
