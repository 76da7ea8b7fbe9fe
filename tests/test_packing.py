"""Semantics tests for the training-batch construction family
(pyfads.packing) — planted edge cases the fixture corpus cannot
guarantee: oversize docs, exact-fit boundaries, shuffle reproducibility,
split leakage.  Oracle parity at sf0.001 is covered by
tests/test_queries_vs_duckdb.py like every other entry."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyfads import packing as P


def _docs(spark, lens, ids=None):
    ids = ids or [i * 8 for i in range(len(lens))]  # one shard (shard 0 of 8)
    rows = [(i, " ".join(["w"] * n)) for i, n in zip(ids, lens)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_nextfit_greedy_recurrence(spark):
    # 200 | 100+56 | 300 (oversize, own bin) | 1
    df = _docs(spark, [200, 100, 56, 300, 1])
    out = (
        P.pack_nextfit(df, capacity=256, n_shards=8)
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.bin_id, r.fill_after) for r in out] == [
        (0, 200),
        (1, 100),
        (1, 156),
        (2, 300),
        (3, 1),
    ]


def test_nextfit_exact_fit_stays_open(spark):
    # fill + n == capacity must NOT close the bin
    df = _docs(spark, [128, 128, 1])
    out = P.pack_nextfit(df, 256, 8).orderBy("doc_id").collect()
    assert [(r.bin_id, r.fill_after) for r in out] == [(0, 128), (0, 256), (1, 1)]


def test_nextfit_oversize_first_row(spark):
    # an oversize FIRST doc occupies bin 0 alone
    df = _docs(spark, [500, 10])
    out = P.pack_nextfit(df, 256, 8).orderBy("doc_id").collect()
    assert [(r.bin_id, r.fill_after) for r in out] == [(0, 500), (1, 10)]


def test_concat_chunks_boundary_spans(spark):
    df = _docs(spark, [200, 100, 56])
    out = P.pack_concat_chunks(df, 256, 8).orderBy("doc_id").collect()
    # stream: [0,200) [200,300) [300,356) with cuts at 256
    assert [(r.first_chunk, r.last_chunk, r.n_chunks) for r in out] == [
        (0, 0, 1),
        (0, 1, 2),  # straddles the 256 cut
        (1, 1, 1),
    ]


def test_bin_stats_consistency(spark):
    df = _docs(spark, [200, 100, 56, 300, 1])
    packed = P.pack_nextfit(df, 256, 8)
    stats = P.pack_bin_stats(packed, 256).collect()
    assert sum(r.fill_tokens for r in stats) == 657
    for r in stats:
        assert r.util_bp == r.fill_tokens * 10000 // 256


def test_null_text_excluded(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (8, None)], "doc_id bigint, text string"
    )
    assert P.token_shards(df, 8).count() == 1


def test_global_shuffle_is_permutation_and_reproducible(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = P.global_shuffle(df, "seedA", 4).toPandas().sort_values("doc_id")
    b = P.global_shuffle(df, "seedA", 4).toPandas().sort_values("doc_id")
    assert (a.reset_index(drop=True) == b.reset_index(drop=True)).all().all()
    # within each shard, positions are exactly 1..n
    for _, g in a.groupby("shuffle_shard"):
        assert sorted(g["shuffle_pos"]) == list(range(1, len(g) + 1))
    # a different seed is a different permutation
    c = P.global_shuffle(df, "seedB", 4).toPandas().sort_values("doc_id")
    assert not (
        a["shuffle_shard"].to_numpy() == c["shuffle_shard"].to_numpy()
    ).all() or not (a["shuffle_pos"].to_numpy() == c["shuffle_pos"].to_numpy()).all()


def test_split_by_group_is_group_disjoint(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(100)], "doc_id bigint, grp string"
    )
    out = P.split_by_group(df, "grp")
    leaky = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert leaky == 0
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_nextfit_stream_state_carries_across_batches(spark, tmp_path):
    """A bin left open by micro-batch 0 must keep filling in micro-batch 1
    — the streamed assignment equals the batch recurrence exactly."""
    # one shard; lens 100, 100 | 50, 200: doc 16 (50) must land in the
    # bin opened by batch 0 (fill 200 -> 250), doc 24 opens bin 1
    rows0 = [(0, " ".join(["w"] * 100)), (8, " ".join(["w"] * 100))]
    rows1 = [(16, " ".join(["w"] * 50)), (24, " ".join(["w"] * 200))]
    d = str(tmp_path / "chunks")
    spark.createDataFrame(rows0, "doc_id bigint, text string").coalesce(1).write.parquet(d + "/c0.parquet")
    spark.createDataFrame(rows1, "doc_id bigint, text string").coalesce(1).write.parquet(d + "/c1.parquet")
    src = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        P.pack_nextfit_stream(src, capacity=256, n_shards=8)
        .writeStream.format("memory")
        .queryName("packstream_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id: (r.bin_id, r.fill_after)
        for r in spark.table("packstream_test").collect()
    }
    assert got == {0: (0, 100), 8: (0, 200), 16: (0, 250), 24: (1, 200)}
    # and it equals the batch operator on the union
    batch = P.pack_nextfit(
        spark.createDataFrame(rows0 + rows1, "doc_id bigint, text string"), 256, 8
    )
    assert {r.doc_id: (r.bin_id, r.fill_after) for r in batch.collect()} == got


def test_epoch_schedule_clamps_and_floors(spark):
    """Integer epoch factors: a dominant source saturates at max_epochs
    only when the budget allows; every source gets >= 1 epoch; the
    proportional slice (budget * share div total) div tokens is exact
    integer arithmetic."""
    from pyfads.pipeline import epoch_schedule

    rows = (
        [(i, "big", "w " * 99 + "w") for i in range(10)]  # 100 tok x 10
        + [(100 + i, "small", "w w w w") for i in range(5)]  # 4 tok x 5
    )
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    # total = 1020; budget 10x total: big's slice = 10200*1000/1020 = 10000
    # -> 10 epochs -> clamp 4; small's slice = 10200*20/1020 = 200 -> 10 -> 4
    got = {
        r.source: (r.n_docs, r.source_tokens, r.epochs, r.scheduled_tokens)
        for r in epoch_schedule(docs, budget_tokens=10_200, max_epochs=4).collect()
    }
    assert got == {"big": (10, 1000, 4, 4000), "small": (5, 20, 4, 80)}
    # budget below total: everything floors at 1 epoch
    got1 = {
        r.source: r.epochs
        for r in epoch_schedule(docs, budget_tokens=100, max_epochs=4).collect()
    }
    assert got1 == {"big": 1, "small": 1}
    # proportional middle: budget = 2x total -> both get exactly 2
    got2 = {
        r.source: r.epochs
        for r in epoch_schedule(docs, budget_tokens=2040, max_epochs=4).collect()
    }
    assert got2 == {"big": 2, "small": 2}


def test_curriculum_order_stages_and_determinism(spark):
    """Stage 0 holds each source's cleanest tertile (fewest Gopher flags,
    id tiebreak); (stage, shard, pos) is a total order: positions are
    1..n_rows(stage, shard) dense; re-running yields the identical frame
    (hash-seeded, no RNG)."""
    from pyfads.pipeline import curriculum_order

    clean = "the of and a to in is it for on " * 4  # 40 tokens, no flags
    dirty = "!!! ??? !!! ??? !!! ??? xx yy"  # short + punct-heavy
    rows = [(i, "s1", clean) for i in range(6)] + [
        (10 + i, "s1", dirty) for i in range(3)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = curriculum_order(docs, n_stages=3, n_shards=2, seed="t").collect()
    by_id = {r.doc_id: r for r in out}
    # 9 rows -> tertiles of 3; the 3 dirty docs have more flags than any
    # clean doc, so they fill stage 2 exactly
    assert sorted(r.doc_id for r in out if r.stage == 2) == [10, 11, 12]
    assert all(by_id[i].stage < 2 for i in range(6))
    # dense positions per (stage, shard)
    from collections import defaultdict

    groups = defaultdict(list)
    for r in out:
        groups[(r.stage, r.shard)].append(r.pos)
    for poss in groups.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # determinism
    again = curriculum_order(docs, n_stages=3, n_shards=2, seed="t").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
