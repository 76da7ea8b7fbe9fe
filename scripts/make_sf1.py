#!/usr/bin/env python
"""Materialize a ~10x scale-up of the sf0.1 fixtures for the superlinearity
dry-run (SCALE.md): the sf0.1 bench cannot see candidate-pair blowup in the
near-dup family, so we synthesize an sf1-sized corpus from sf0.1 and re-time
the most expensive queries at both scales.

This data is for SCALE PROBING ONLY — correctness oracles keep running
against the driver-generated /root/testdata fixtures.

Scaling rules (deterministic, structure-preserving):
- ``documents``: 10 copies; copy i offsets doc_id by i * 10^7 and appends a
  copy-tag token to the text so copies are NOT near-duplicates of each
  other (a plain union would plant 10-way dup groups everywhere and turn
  the near-dup candidate graph superlinear BY CONSTRUCTION, measuring the
  planted distortion instead of the engine).  Within-copy near-dup
  structure matches sf0.1 exactly.
- ``embeddings``: 10 copies; copy i offsets vec_id and adds a small
  deterministic per-copy rotation-free perturbation (hash-seeded uniform
  noise, amplitude 0.05) so copies aren't cosine-identical.
- ``events``: 10 copies; event_id/user_id offset per copy, timestamps
  shifted by i hours so the event-time distribution widens like a larger
  capture window would.
- TPC-H-ish tables are copied as-is (the relational family is already
  sub-second at sf0.1 and scales are verified by plan shape, not wall
  time).

Usage: python scripts/make_sf1.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import SparkSession, functions as F

SRC = "/root/testdata/sf0.1"
COPIES = 10
ID_STRIDE = 10_000_000


def build(dst: str) -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("make-sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for i in range(COPIES):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_STRIDE))
        if i > 0:
            d = d.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copytag{i} "), F.col("doc_id").cast("string"))
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    embs = spark.read.parquet(f"{SRC}/embeddings.parquet")
    parts = []
    for i in range(COPIES):
        e = embs.withColumn("vec_id", F.col("vec_id") + F.lit(i * ID_STRIDE))
        if i > 0:
            # deterministic per-(copy, vec, coord) noise in [-0.05, 0.05]
            e = e.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, j: x
                    + (
                        F.pmod(F.xxhash64(F.col("vec_id"), j, F.lit(i)), F.lit(1000))
                        / F.lit(10000.0)
                        - F.lit(0.05)
                    ).cast("float"),
                ),
            )
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    events = spark.read.parquet(f"{SRC}/events.parquet")
    parts = []
    for i in range(COPIES):
        ev = (
            events.withColumn("event_id", F.col("event_id") + F.lit(i * ID_STRIDE))
            .withColumn("user_id", F.col("user_id") + F.lit(i * ID_STRIDE))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} HOURS"))
        )
        parts.append(ev)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{dst}/events.parquet")

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        src = f"{SRC}/{t}.parquet"
        tgt = f"{dst}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(tgt):
            if os.path.isdir(src):
                shutil.copytree(src, tgt)
            else:
                shutil.copy(src, tgt)
    spark.stop()
    print(f"sf1 fixtures written to {dst}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
