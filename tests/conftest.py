from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"

# data-dependent DuckDB oracles (pyfads.golden) must be built for the sf the
# tests compare at — set before any test module resolves oracle_sql()
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR


@pytest.fixture(scope="session")
def spark():
    # warehouse in a tmp dir so saveAsTable (bucketed-table tests) never
    # writes a spark-warehouse/ into the repo working tree
    wh = tempfile.mkdtemp(prefix="pyfads-warehouse-")
    s = (
        SparkSession.builder.master("local[4]")
        .appName("pyfads-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", wh)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()
