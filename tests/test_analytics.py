"""Unit tests for the round-4 analytics operators: text normalization,
per-source curation report, KMV cardinality sketch, JSON props extraction.
(Oracle parity is covered by scripts/check_queries.py / the driver gate;
these tests pin known-value semantics and edge cases.)"""

from __future__ import annotations

import pytest

from pyfads.semistruct import parse_props, props_rollup
from pyfads.sketches import kmv_distinct_tokens
from pyfads.text import normalize_text, quality_score, source_quality

SF_DIR = "/root/testdata/sf0.001"


def test_normalize_text_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "  Hello   WORLD "),
            (2, "a\x01b\tc"),  # control char + tab both become spaces
            (3, "already clean"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text_norm"] == "hello world"
    assert out[1]["n_chars_raw"] == 16 and out[1]["n_chars_norm"] == 11
    assert out[2]["text_norm"] == "a b c"
    assert out[3]["text_norm"] == "already clean"
    # md5 keys on the normalized form: differently-messy same-content docs collide
    df2 = spark.createDataFrame(
        [(1, "Hello World"), (2, " hello   world ")], "doc_id long, text string"
    )
    md5s = {r["norm_md5"] for r in normalize_text(df2).collect()}
    assert len(md5s) == 1


def test_kmv_estimate_tracks_exact(spark):
    from pyfads.io import read_table

    docs = read_table(spark, SF_DIR, "documents")
    rows = {r["lang"]: r for r in kmv_distinct_tokens(docs, k=128).collect()}
    assert rows, "no strata"
    for lang, r in rows.items():
        assert r["n_kept"] == min(128, r["n_exact"])
        if r["n_exact"] < 128:
            # sketch degenerates to the exact count
            assert r["kmv_estimate"] == float(r["n_exact"])
        else:
            rel_err = abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"]
            # KMV stderr ~ 1/sqrt(k-2) ~ 0.089 at k=128; allow 4 sigma
            assert rel_err < 0.36, (lang, r["kmv_estimate"], r["n_exact"])


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [(1, "a b c a", "en"), (2, "b c d", "en")], "doc_id long, text string, lang string"
    )
    [r] = kmv_distinct_tokens(df, k=128).collect()
    assert r["n_exact"] == 4 and r["kmv_estimate"] == 4.0


def test_source_quality_consistent_with_doc_level(spark):
    from pyfads.io import read_table

    docs = read_table(spark, SF_DIR, "documents")
    per_doc = quality_score(docs).join(docs.select("doc_id", "source"), "doc_id")
    expected_pass = {
        r["source"]: r["cnt"]
        for r in per_doc.filter("quality_pass")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    agg = {r["source"]: r for r in source_quality(docs).collect()}
    total_docs = docs.count()
    assert sum(r["n_docs"] for r in agg.values()) == total_docs
    for src, r in agg.items():
        assert r["n_pass"] == expected_pass.get(src, 0)
        assert r["pass_rate"] == pytest.approx(r["n_pass"] / r["n_docs"])
        flag_sum = sum(
            r[c] for c in agg[src].asDict() if c.startswith("n_flag_")
        )
        assert flag_sum == r["total_flags"]


def test_props_rollup_handles_malformed_json(spark):
    df = spark.createDataFrame(
        [
            (1, "t1", '{"k": 5}'),
            (2, "t1", '{"k": 7}'),
            (3, "t1", "not json"),
            (4, "t2", None),
            (5, "t2", '{"other": 1}'),  # valid JSON, missing key
        ],
        "event_id long, event_type string, props string",
    )
    parsed = {r["event_id"]: r["prop_k"] for r in parse_props(df).collect()}
    assert parsed == {1: 5, 2: 7, 3: None, 4: None, 5: None}
    agg = {r["event_type"]: r for r in props_rollup(df).collect()}
    assert agg["t1"]["n_events"] == 3 and agg["t1"]["n_null_k"] == 1
    assert agg["t1"]["sum_k"] == 12 and agg["t1"]["mean_k"] == pytest.approx(6.0)
    assert agg["t2"]["n_null_k"] == 2 and agg["t2"]["mean_k"] is None
