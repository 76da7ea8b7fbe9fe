"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
(column names), and exact values (columns sorted by name, rows sorted by all
columns).  Usage: python scripts/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def compare(name, spark_df, duck_df):
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"cols: spark={sc} duck={dc}")
        return problems
    for df in (spark_df, duck_df):
        for c in df.columns:
            if df[c].dtype == object and df[c].map(lambda v: isinstance(v, (bytes, bytearray))).any():
                df[c] = df[c].map(lambda v: bytes(v).hex() if v is not None else None)
    s = spark_df[sc].sort_values(sc).reset_index(drop=True)
    d = duck_df[dc].sort_values(dc).reset_index(drop=True)
    if len(s) == len(d):
        for c in sc:
            sv, dv = s[c].to_numpy(), d[c].to_numpy()
            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                eq = np.array_equal(sv.astype(float), dv.astype(float), equal_nan=True)
                if not eq:
                    close = np.allclose(sv.astype(float), dv.astype(float), rtol=0, atol=1e-12, equal_nan=True)
                    mism = int((~np.isclose(sv.astype(float), dv.astype(float), rtol=0, atol=0, equal_nan=True)).sum())
                    problems.append(f"col {c}: {mism} float mismatches (allclose_1e-12={close})")
            else:
                if not (sv.astype(object) == dv.astype(object)).all():
                    mism = int((sv.astype(object) != dv.astype(object)).sum())
                    problems.append(f"col {c}: {mism} value mismatches")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent oracles (pyfads.golden) build for the compared sf dir
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written directory fixture (e.g. /tmp/sf1)
            p = p + "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    if only:
        unknown = sorted(only - set(qs))
        if unknown:
            # a comma-joined or misspelled list must error, not silently
            # match nothing and print "0 passed, 0 failed" with exit 0
            print(f"ERROR: unknown query name(s): {', '.join(unknown)}")
            print(f"       (names are SPACE-separated; registry has {len(qs)} entries)")
            spark.stop()
            return 1
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {t1-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, spark {t1-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    if n_pass == 0 and n_fail == 0:
        print("ERROR: nothing ran — empty registry or filter matched nothing")
        return 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
