"""upsert_partitioned: latest-wins merge correctness AND the selective
partition rewrite (untouched partition files must not be rewritten)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from pyfads.io import merge_latest, upsert_partitioned

N_PARTS = 8


def _files_by_part(path):
    out = {}
    for d in os.listdir(path):
        if d.startswith("part_id="):
            pid = int(d.split("=")[1])
            full = os.path.join(path, d)
            out[pid] = {
                f: os.path.getmtime(os.path.join(full, f))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
    return out


def test_upsert_merges_and_rewrites_only_affected(spark, tmp_path):
    path = str(tmp_path / "corpus")
    base = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("v1_"), F.col("id")).alias("text"),
        F.lit(1).cast("long").alias("version"),
    )
    first = upsert_partitioned(spark, path, base, "doc_id", "version", N_PARTS)
    assert os.path.exists(path)
    before = _files_by_part(path)
    assert set(before) == set(first)

    time.sleep(1.1)  # mtime resolution guard
    batch = spark.createDataFrame(
        [(i, f"v2_{i}", 2) for i in range(10)]
        + [(100 + i, f"new_{i}", 1) for i in range(5)],
        "doc_id long, text string, version long",
    )
    affected = upsert_partitioned(spark, path, batch, "doc_id", "version", N_PARTS)
    after = _files_by_part(path)

    expect_parts = {
        r[0]
        for r in batch.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(N_PARTS)).cast("int")
        ).distinct().collect()
    }
    assert set(affected) == expect_parts

    # untouched partitions: identical files, identical mtimes
    for pid, files in before.items():
        if pid not in expect_parts:
            assert after[pid] == files, f"partition {pid} was rewritten"
    # affected partitions: fully replaced
    for pid in expect_parts & set(before):
        assert not (set(after[pid]) & set(before[pid]))

    got = {
        r["doc_id"]: (r["text"], r["version"])
        for r in spark.read.parquet(path).collect()
    }
    assert len(got) == 105
    for i in range(10):
        assert got[i] == (f"v2_{i}", 2)
    for i in range(10, 100):
        assert got[i] == (f"v1_{i}", 1)
    for i in range(5):
        assert got[100 + i] == (f"new_{i}", 1)


def test_merge_latest_batch_wins_at_equal_version(spark):
    existing = spark.createDataFrame(
        [(1, "old", 5), (2, "keep", 9)], "k long, v string, ver long"
    )
    batch = spark.createDataFrame(
        [(1, "new", 5), (3, "ins", 1)], "k long, v string, ver long"
    )
    got = {r["k"]: (r["v"], r["ver"]) for r in merge_latest(existing, batch, "k", "ver").collect()}
    assert got == {1: ("new", 5), 2: ("keep", 9), 3: ("ins", 1)}


def test_merge_latest_keeps_higher_existing_version(spark):
    existing = spark.createDataFrame([(1, "cur", 7)], "k long, v string, ver long")
    batch = spark.createDataFrame([(1, "stale", 3)], "k long, v string, ver long")
    got = merge_latest(existing, batch, "k", "ver").collect()
    assert [(r["v"], r["ver"]) for r in got] == [("cur", 7)]


def test_upsert_is_idempotent(spark, tmp_path):
    """Applying the same batch twice must leave the dataset unchanged
    (replayable ingest: a retried batch is a no-op)."""
    path = str(tmp_path / "corpus")
    base = spark.createDataFrame(
        [(i, f"v1_{i}", 1) for i in range(50)], "doc_id long, text string, version long"
    )
    upsert_partitioned(spark, path, base, "doc_id", "version", N_PARTS)
    batch = spark.createDataFrame(
        [(i, f"v2_{i}", 2) for i in range(5)], "doc_id long, text string, version long"
    )
    upsert_partitioned(spark, path, batch, "doc_id", "version", N_PARTS)
    once = sorted((r["doc_id"], r["text"], r["version"]) for r in spark.read.parquet(path).collect())
    upsert_partitioned(spark, path, batch, "doc_id", "version", N_PARTS)
    twice = sorted((r["doc_id"], r["text"], r["version"]) for r in spark.read.parquet(path).collect())
    assert once == twice


def test_streaming_ingest_upserts_corpus(spark, tmp_path):
    """Streaming ingest into a maintained corpus: micro-batches flow
    through foreachBatch -> upsert_partitioned, ending in the same state
    a single batch upsert of the union would produce."""
    import os

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    corpus = str(tmp_path / "corpus")
    # chunk 0: initial keys; chunk 1: updates (higher version) + inserts
    chunks = [
        [(i, f"a_{i}", 1) for i in range(20)],
        [(i, f"b_{i}", 2) for i in range(5)] + [(20 + i, f"n_{i}", 1) for i in range(3)],
    ]
    import pandas as pd

    for n, rows in enumerate(chunks):
        pd.DataFrame(rows, columns=["doc_id", "text", "version"]).to_parquet(
            str(src_dir / f"chunk_{n}.parquet")
        )

    stream = (
        spark.readStream.schema("doc_id long, text string, version long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _eid: upsert_partitioned(
                bdf.sparkSession, corpus, bdf, "doc_id", "version", N_PARTS
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["text"], r["version"]) for r in spark.read.parquet(corpus).collect()}
    assert len(got) == 23
    for i in range(5):
        assert got[i] == (f"b_{i}", 2)
    for i in range(5, 20):
        assert got[i] == (f"a_{i}", 1)
    for i in range(3):
        assert got[20 + i] == (f"n_{i}", 1)
