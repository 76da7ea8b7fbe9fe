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


def test_streaming_neardup_ingest_matches_sequential(spark, tmp_path):
    """Continuous-ingest near-dup gate end-to-end: micro-batches flow
    through foreachBatch -> incremental_dedup against the corpus grown so
    far -> append kept docs.  The final corpus equals the batch-mode
    sequential application of the same gate over the same chunks."""
    import os
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from pyfads.dedup import incremental_dedup

    base = "tok%d " * 1  # noqa: F841 (readability only)

    def text(seed, change=None):
        # 60 words, one changed -> 3-gram-shingle Jaccard ~0.9: high enough
        # that the 4x4 banding finds every planted pair (at J~0.8 the miss
        # probability is ~11% and doc 20 deterministically missed)
        words = [f"w{seed}x{i}" for i in range(60)]
        if change is not None:
            words[change] = f"CHANGED{seed}"
        return " ".join(words)

    chunks = [
        [(i, text(i)) for i in range(10)],
        # 10: near-dup of 0; 11-13 fresh; 14 exact copy of 2
        [(10, text(0, change=5)), (11, text(11)), (12, text(12)),
         (13, text(13)), (14, text(2))],
        # 20: near-dup of 11; 21 fresh; 22 exact copy of the (dropped) 10's
        # text — still dropped, because 10's text is a near-dup of corpus 0
        [(20, text(11, change=7)), (21, text(21)), (22, text(0, change=5))],
    ]
    src = tmp_path / "nd_src"
    src.mkdir()
    t0 = time.time() - 500
    for n, rows in enumerate(chunks):
        p = str(src / f"chunk_{n}.parquet")
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p)
        os.utime(p, (t0 + n, t0 + n))  # deterministic micro-batch order

    schema = "doc_id long, text string"
    corpus_dir = str(tmp_path / "nd_corpus")
    spark.createDataFrame([], schema).write.parquet(corpus_dir)

    def gate(bdf, corpus_df):
        verdicts = incremental_dedup(corpus_df, bdf)
        return bdf.join(
            verdicts.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
        )

    def ingest(bdf, _bid):
        sp = bdf.sparkSession
        kept = gate(bdf, sp.read.parquet(corpus_dir))
        kept.write.mode("append").parquet(corpus_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(corpus_dir).collect())

    ref = spark.createDataFrame([], schema)
    for rows in chunks:
        bdf = spark.createDataFrame(rows, schema)
        ref = ref.unionByName(gate(bdf, ref))
    want = sorted(r.doc_id for r in ref.collect())

    assert got == want
    # the planted structure: 10 (near-dup of 0), 14 (exact of 2), 20
    # (near-dup of 11), 22 (near-dup of 0 via 10's text) all dropped
    assert set(range(10)) <= set(got)
    assert {10, 14, 20, 22}.isdisjoint(got)
    assert {11, 12, 13, 21} <= set(got)


def test_streaming_corpus_refresh_matches_sequential(spark, tmp_path):
    """The complete streaming corpus-refresh loop (VERDICT r5 item 6):
    micro-batches flow through foreachBatch -> incremental_dedup gated by
    the MATERIALIZED signature store -> upsert_partitioned merge, and the
    store itself is maintained incrementally (admitted docs' signatures
    appended per batch — the corpus text is never re-read after bootstrap).
    The final corpus equals the sequential batch-mode refresh that
    recomputes corpus signatures from text every round."""
    import pandas as pd

    from pyfads.dedup import (
        incremental_dedup,
        read_signature_store,
        write_signature_store,
    )

    def text(seed, change=None):
        words = [f"w{seed}x{i}" for i in range(60)]
        if change is not None:
            words[change] = f"CHANGED{seed}"
        return " ".join(words)

    seed_rows = [(i, text(i)) for i in range(10)]
    chunks = [
        # 10: near-dup of 0; 11-12 fresh; 13 exact copy of 2
        [(10, text(0, change=5)), (11, text(11)), (12, text(12)), (13, text(2))],
        # 20: near-dup of 11 (admitted LAST batch -> only the store append
        # makes it visible to the gate); 21 fresh; 22 exact copy of 11
        [(20, text(11, change=7)), (21, text(21)), (22, text(11))],
    ]
    src = tmp_path / "cr_src"
    src.mkdir()
    t0 = time.time() - 500
    for n, rows in enumerate(chunks):
        p = str(src / f"chunk_{n}.parquet")
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p)
        os.utime(p, (t0 + n, t0 + n))

    schema = "doc_id long, text string"
    corpus_dir = str(tmp_path / "cr_corpus")
    store_dir = str(tmp_path / "cr_store")
    seed_df = spark.createDataFrame(seed_rows, schema).withColumn(
        "version", F.lit(1).cast("long")
    )
    # bootstrap: corpus + signature store written once from the seed text
    upsert_partitioned(spark, corpus_dir, seed_df, "doc_id", "version", N_PARTS)
    write_signature_store(seed_df.select("doc_id", "text"), store_dir)

    def ingest(bdf, bid):
        sp = bdf.sparkSession
        ch, cs, csh = read_signature_store(sp, store_dir)
        verd = incremental_dedup(
            None, bdf, corpus_hashes=ch, corpus_sigs=cs, corpus_shingles=csh
        )
        admitted = bdf.join(
            verd.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
        )
        # the eager actions below read `admitted` twice; pin it so the
        # store append can't observe a different (re-gated) result
        admitted = sp.createDataFrame(admitted.toPandas(), bdf.schema)
        upsert_partitioned(
            sp,
            corpus_dir,
            admitted.withColumn("version", F.lit(2 + bid).cast("long")),
            "doc_id",
            "version",
            N_PARTS,
        )
        write_signature_store(admitted, store_dir, mode="append")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "cr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.version for r in spark.read.parquet(corpus_dir).collect()
    }

    # sequential reference: text-based gate, no store
    ref = spark.createDataFrame(seed_rows, schema)
    want = {i: 1 for i in range(10)}
    for n, rows in enumerate(chunks):
        bdf = spark.createDataFrame(rows, schema)
        verd = incremental_dedup(ref.select("doc_id", "text"), bdf)
        kept = bdf.join(
            verd.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
        )
        for r in kept.collect():
            want[r.doc_id] = 2 + n
        ref = ref.unionByName(kept)

    assert got == want
    # planted structure: near/exact dups dropped, including 20 whose only
    # corpus twin (11) entered via the PREVIOUS batch's store append
    assert {10, 13, 20, 22}.isdisjoint(got)
    assert {11, 12, 21} <= set(got)


def test_streaming_semantic_refresh_matches_sequential(spark, tmp_path):
    """The semantic serve-many store's refresh loop (VERDICT r9 item 2 —
    the semantic twin of the lexical streaming refresh above): micro-
    batches flow through foreachBatch -> semantic_refresh_store (gate
    against the persisted store, append admitted survivors with cells /
    fold norms / continued c_sub packing).  A vector admitted in batch 0
    must gate batch 1 (only the store append makes it visible), and the
    final corpus membership equals the sequential train-inline gate that
    re-reads the accumulated corpus every round."""
    import pandas as pd
    import numpy as np

    from pyfads import similarity as S

    cents = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    # third cell-0 seed so the append's c_sub CONTINUATION is observable:
    # cell 0 holds 2 seed rows (cap=2 -> sub 0 full), and the batch-1
    # admission lands at position 3 -> sub 1 iff packing continued
    seed_rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
    ]
    chunks = [
        # 10: scaled copy of 0 -> dup; 11 fresh; 12 near-copy of 11's cell
        # but orthogonal to everything standing -> admitted
        [(10, [2.0, 0.0, 0.0]), (11, [0.0, 0.0, 1.0])],
        # 20: scaled copy of 11 (admitted LAST batch -> only the store
        # append makes it visible); 21 fresh-ish diagonal (cos < 0.9 to
        # every axis vector) -> admitted
        [(20, [0.0, 0.0, 3.0]), (21, [1.0, 1.0, 1.0])],
    ]
    src = tmp_path / "semref_src"
    src.mkdir()
    t0 = time.time() - 500
    for n, rows in enumerate(chunks):
        p = str(src / f"chunk_{n}.parquet")
        pd.DataFrame(rows, columns=["vec_id", "embedding"]).to_parquet(p)
        os.utime(p, (t0 + n, t0 + n))

    schema = "vec_id long, embedding array<double>"
    store = str(tmp_path / "semref_store")
    seed_df = spark.createDataFrame(seed_rows, schema)
    S.write_semantic_store(spark, store, cents, seed_df, 3, max_cell=2)

    def ingest(bdf, bid):
        S.semantic_refresh_store(bdf.sparkSession, store, bdf, 3, threshold=0.9)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "semref_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    _, corpus = S.read_semantic_store(spark, store)
    got = {r["c_id"] for r in corpus.collect()}

    # sequential reference: train-inline gate against the accumulated
    # corpus, rebuilt from scratch each round
    acc = seed_df
    for rows in chunks:
        bdf = spark.createDataFrame(rows, schema)
        verd = S.semantic_dedup_incremental(
            bdf, acc, 3, threshold=0.9, centroids=cents
        )
        admitted = bdf.join(
            verd.filter("is_new").select("vec_id"), "vec_id", "left_semi"
        )
        acc = acc.unionByName(admitted)
    want = {r["vec_id"] for r in acc.collect()}
    assert got == want
    assert got == {0, 1, 2, 11, 21}  # 10 and 20 gated out
    # c_sub packing CONTINUES each cell's sequence across appends: 21
    # ([1,1,1], dp ties -> lowest cell 0) is cell 0's THIRD row, so with
    # cap=2 it opens sub 1; a reset-per-append bug would give it sub 0
    subs = {(r["cell"], r["c_id"]): r["c_sub"] for r in corpus.collect()}
    assert subs == {
        (0, 0): 0,
        (0, 2): 0,
        (0, 21): 1,
        (1, 1): 0,
        (2, 11): 0,
    }


def test_semantic_refresh_two_level_store(spark, tmp_path):
    """The refresh loop also serves TWO-LEVEL stores: the tuple codebook
    round-trips, the gate assigns hierarchically, and admissions append
    with their fine-cell ids."""
    import numpy as np

    from pyfads import similarity as S

    store = str(tmp_path / "tl_refresh_store")
    seed = spark.createDataFrame(
        [(i, [float(i % 4 == 0), float(i % 4 == 1), float(i % 4 == 2), float(i % 4 == 3)]) for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    cb = S.train_two_level_centroids(seed, 4, n_coarse=2, n_fine=2, seed=7)
    S.write_semantic_store(spark, store, cb, seed, 4, max_cell=3)
    batch = spark.createDataFrame(
        [(100, [2.0, 0.0, 0.0, 0.0]), (101, [1.0, 1.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    verd = {
        r["vec_id"]: r["is_new"]
        for r in S.semantic_refresh_store(spark, store, batch, 4, threshold=0.9).collect()
    }
    assert verd[100] is False  # scaled copy of an axis vector -> gated
    assert verd[101] is True  # diagonal, cos 0.5 to axes -> admitted
    cb2, corpus = S.read_semantic_store(spark, store)
    assert isinstance(cb2, tuple)
    ids = {r["c_id"] for r in corpus.collect()}
    assert 101 in ids and 100 not in ids and len(ids) == 17
