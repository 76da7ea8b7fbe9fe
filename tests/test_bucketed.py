"""Bucketed-storage co-location (pyfads.io.write_bucketed): proves the
100 TB claim that a corpus bucketed on its key joins and aggregates with
ZERO exchanges — the plan-level evidence behind SCALE.md's "bucket once,
join forever" posture.

These assertions read the formatted physical plan: a bucketed scan exposes
its hash partitioning, so the planner drops the shuffle on both join sides
and before the aggregate.  The negative control shows the same join over
plain parquet DOES exchange — proving the assertion has teeth.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from pyfads.io import read_table, write_bucketed

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    docs = read_table(spark, SF_DIR, "documents")
    write_bucketed(docs.select("doc_id", "lang", "n_chars"), "b_docs", "doc_id", N_BUCKETS)
    write_bucketed(
        docs.select("doc_id", "source"), "b_meta", "doc_id", N_BUCKETS
    )
    yield "b_docs", "b_meta"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_meta")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture()
def big_table_mode(spark):
    """Model the 100 TB case on tiny fixtures: no auto-broadcast (both join
    sides are 'large'), no auto-disable of the bucketed scan (the planner
    skips bucketing when a table is trivially small)."""
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
        },
    ):
        yield


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, big_table_mode):
    a, b = bucketed_tables
    joined = spark.table(a).join(spark.table(b), "doc_id")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    # and the result is still correct
    assert joined.count() == spark.table(a).count()


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables, big_table_mode):
    a, _ = bucketed_tables
    agg = spark.table(a).groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_unbucketed_control_does_exchange(spark, big_table_mode):
    """Negative control: the identical join over plain parquet reads must
    shuffle — if this stops holding, the no-Exchange asserts above are
    vacuous."""
    docs = read_table(spark, SF_DIR, "documents")
    joined = docs.select("doc_id", "lang").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    assert "Exchange" in _plan(joined)


def test_bucket_pruning_on_key_filter(spark, bucketed_tables, big_table_mode):
    """Point lookups on the bucket key scan only the matching bucket
    (SelectedBucketsCount in the scan node)."""
    a, _ = bucketed_tables
    one = spark.table(a).filter(F.col("doc_id") == 7)
    plan = _plan(one)
    assert "SelectedBucketsCount: 1 out of" in plan, plan
    assert one.count() == 1


def test_range_layout_files_are_disjoint_and_sorted(spark, tmp_path):
    """write_range_layout: every output file owns a disjoint key range and
    is internally sorted — the parquet-footer evidence that filtered scans
    can skip whole files/row groups."""
    import glob

    import pyarrow.parquet as pq

    from pyfads.io import write_range_layout

    ev = read_table(spark, SF_DIR, "events")
    dest = str(tmp_path / "range_layout")
    write_range_layout(ev, dest, "user_id", n_files=4)

    files = sorted(glob.glob(f"{dest}/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    total = 0
    for f in files:
        pf = pq.ParquetFile(f)
        total += pf.metadata.num_rows
        idx = pf.schema_arrow.get_field_index("user_id")
        mins, maxs = [], []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert total == ev.count()
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        # equal keys never straddle a range boundary
        assert hi1 < lo2, ranges
