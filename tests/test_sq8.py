"""Semantics tests for symmetric scalar quantization (pyfads.similarity
sq8_*) — properties the oracle-parity check can't pin: scale invariance,
level range, recall floor."""

from __future__ import annotations

import pyspark.sql.functions as F

from pyfads import similarity as S

SF_DIR = "/root/testdata/sf0.001"
DIM = 4


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_levels_in_range_and_qsum(spark):
    df = _vecs(spark, [(0, [1.0, 0.0, -1.0, 0.5]), (1, [0.1, 0.2, 0.3, 0.4])])
    out = S.sq8_quantize(S.sq8_normalize(df, DIM)).collect()
    for r in out:
        assert all(0 <= v <= 255 for v in r.qvec)
        assert r.qsum == sum(r.qvec)


def test_scale_invariance(spark):
    # cosine metric: a vector and its 3x copy must quantize identically
    df = _vecs(
        spark,
        [(0, [0.2, -0.4, 0.1, 0.9]), (1, [0.6, -1.2, 0.3, 2.7])],
    )
    a, b = sorted(
        S.sq8_quantize(S.sq8_normalize(df, DIM)).collect(), key=lambda r: r.vec_id
    )
    assert list(a.qvec) == list(b.qvec)


def test_zero_norm_dropped(spark):
    df = _vecs(spark, [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0])])
    assert S.sq8_normalize(df, DIM).count() == 1


def test_unit_extremes_hit_level_bounds(spark):
    df = _vecs(spark, [(0, [1.0, 0.0, 0.0, 0.0]), (1, [-1.0, 0.0, 0.0, 0.0])])
    rows = {r.vec_id: list(r.qvec) for r in
            S.sq8_quantize(S.sq8_normalize(df, DIM)).collect()}
    assert rows[0][0] == 255  # +1 -> top level
    assert rows[1][0] == 0  # -1 -> bottom level
    assert rows[0][1] == 127  # 0 -> floor(127.5)


def test_recall_floor_vs_exact(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 8)
    exact = S.cosine_topk(embs, q, 64, k=10).select("q_id", "neighbor_id")
    sq8 = S.sq8_topk(embs, q, 64, k=10).select(
        F.col("q_id").alias("a"), F.col("neighbor_id").alias("b")
    )
    hits = exact.join(
        sq8, (F.col("q_id") == F.col("a")) & (F.col("neighbor_id") == F.col("b"))
    )
    per_q = {r.q_id: r.n for r in hits.groupBy("q_id").agg(F.count("*").alias("n")).collect()}
    assert len(per_q) == 8
    assert all(n >= 8 for n in per_q.values()), per_q  # >= 80% recall@10
