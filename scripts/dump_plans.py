#!/usr/bin/env python
"""Dump .explain('formatted') per registered query into a directory
(one <name>_<suffix>.txt per query) — the optimization-round evidence
files (plans/r12/).  Usage:
    python scripts/dump_plans.py <outdir> <suffix> [sf_dir] [name ...]
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    only = set(sys.argv[4:])
    os.makedirs(outdir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from __spark_entry__ import queries

    for name, fn in queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"[plans] {name} ok", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001 - record, keep going
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(f"PLAN DUMP FAILED: {exc}\n")
            print(f"[plans] {name} FAILED: {exc}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
