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


def test_bloom_no_false_negatives_and_sane_fp(spark):
    """Every inserted key must probe maybe=True (the Bloom contract the
    contamination prefilter's losslessness rests on); absent keys may
    false-positive but at ~(1-e^{-kn/m})^k, far below 50% at this load."""
    from pyfads.sketches import bloom_build, bloom_probe

    inserted = [(f"key_{i}",) for i in range(500)]
    absent = [(f"other_{i}",) for i in range(500)]
    corpus = spark.createDataFrame(inserted, "k string")
    bloom = bloom_build(corpus, "k", n_words=256, k=4)
    probed = bloom_probe(
        bloom, spark.createDataFrame(inserted + absent, "k string"), "k",
        n_words=256, k=4,
    )
    verdicts = {r["k"]: r["maybe"] for r in probed.collect()}
    assert all(verdicts[k] for k, in inserted), "false negative"
    fp = sum(verdicts[k] for k, in absent)
    assert fp < 250  # m=16128 bits, n=500, k=4 -> expected fp ~ 2%


def test_bloom_prefilter_is_lossless(spark):
    """contamination_overlap with and without the Bloom prefilter must
    return identical rows (no false negatives => same exact-join result)."""
    from pyfads.io import read_table
    from pyfads.pipeline import contamination_overlap

    docs = read_table(spark, SF_DIR, "documents")
    bench = docs.filter("doc_id % 50 = 0")
    plain = contamination_overlap(docs, bench, n=5).collect()
    bloomed = contamination_overlap(docs, bench, n=5, bloom_words=512).collect()
    key = lambda r: (r["doc_id"], r["n_grams"], r["n_contaminated"])
    assert sorted(map(key, plain)) == sorted(map(key, bloomed))


def test_chunk_documents_covers_and_overlaps(spark):
    """Chunks reconstruct the doc: chunk 0 is the first C tokens, adjacent
    chunks share C-S tokens, the union of chunk tokens covers every token,
    and the tail chunk ends exactly at the last token."""
    from pyfads.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150))), (2, "a b c")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    d1 = by_doc[1]
    assert sorted(d1) == [0, 1, 2, 3]  # starts 0,48,96,144 (< 150)
    assert d1[0]["chunk_text"].split(" ") == [f"t{i}" for i in range(64)]
    assert d1[1]["chunk_text"].split(" ")[:16] == [f"t{i}" for i in range(48, 64)]
    assert d1[3]["chunk_text"].split(" ") == [f"t{i}" for i in range(144, 150)]
    assert d1[3]["n_chunk_tokens"] == 6
    covered = set()
    for r in d1.values():
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"t{i}" for i in range(150)}
    assert by_doc[2][0]["chunk_text"] == "a b c" and len(by_doc[2]) == 1


def test_bm25_ranking_semantics(spark):
    """tf monotonicity and idf: more hits rank higher; a rare term
    outscores an equally-frequent ubiquitous term."""
    from pyfads.text import bm25_topk

    rows = [
        (1, "join join join pad pad pad"),
        (2, "join pad pad pad pad pad"),
        (3, "pad pad pad pad pad pad"),
        (4, "rare pad pad pad pad pad"),
        (5, "join rare pad pad pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["join"], k=5).collect()
    ranked = [r.doc_id for r in out]
    # doc 1 (tf=3) > docs 2/5 (tf=1) > docs 3/4 (tf=0)
    assert ranked[0] == 1
    assert set(ranked[1:3]) == {2, 5}
    assert {r.doc_id: r.score_micros for r in out}[3] == 0
    # 'rare' appears in 2/5 docs, 'join' in 3/5: for equal tf the rare
    # term's idf is larger, so doc 4 (rare only) outscores doc 2 (join only)
    out2 = {r.doc_id: r.score_micros for r in bm25_topk(df, ["join", "rare"], k=5).collect()}
    assert out2[4] > out2[2]
    assert out2[5] > out2[4]  # both terms beats either alone


def test_text_surface_edge_inputs_no_crash(spark):
    """NULL text, empty text, and sub-shingle-length docs flow through the
    whole text/dedup/pipeline surface without task failures (the
    chunk_documents NULL divergence was latent until r5 — this sweep keeps
    the rest of the surface honest)."""
    from pyfads import dedup as D
    from pyfads import pipeline as P
    from pyfads import text as X

    df = spark.createDataFrame(
        [
            (1, None, "s"),
            (2, "", "s"),
            (3, "one", "s"),
            (4, "a b", "s"),
            (5, "normal doc with several tokens here", "s"),
        ],
        "doc_id long, text string, source string",
    )
    ops = [
        X.text_stats(df),
        X.quality_score(df),
        X.token_counts(df),
        X.lang_id(df),
        X.fingerprint(df),
        X.repetition_stats(df),
        X.pii_scrub(df),
        X.normalize_text(df),
        X.chunk_documents(df),
        X.bm25_topk(df, ["one"], k=3),
        D.exact_dedup(df),
        D.minhash_near_dup_pairs(df),
        D.jaccard_ngram_pairs(df),
        D.simhash(df),
        P.contamination_overlap(df, df.limit(1)),
    ]
    for out in ops:
        out.count()  # executes the plan; any per-row failure raises
    # NULL text yields no chunks (oracle-aligned since r5)
    from pyspark.sql import functions as F

    assert X.chunk_documents(df).filter(F.col("doc_id") == 1).count() == 0


def test_countmin_never_underestimates(spark):
    """CM guarantee on a known stream: estimate >= exact for every key,
    exact for keys with no bucket collisions at this width, 0 for absent."""
    from pyfads.sketches import countmin_build, countmin_estimate

    rows = [("a",)] * 100 + [("b",)] * 7 + [("c",)] * 1
    keys = spark.createDataFrame(rows, "key string")
    sketch = countmin_build(keys, "key", width=64, depth=3)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("nope",)], "key string")
    est = {r.key: r.cm_estimate for r in countmin_estimate(sketch, probes, "key", 64, 3).collect()}
    assert est["a"] >= 100 and est["b"] >= 7 and est["c"] >= 1
    # 3 distinct keys in 64 buckets x 3 rows: no collisions -> exact
    assert est["a"] == 100 and est["b"] == 7 and est["c"] == 1
    assert est["nope"] == 0


def test_countmin_merge_is_exact(spark):
    """CM linearity: sketch(A) + sketch(B) == sketch(A ∪ B) bit-for-bit."""
    from pyfads.sketches import countmin_build, countmin_merge

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, "key string")
    b = spark.createDataFrame([("x",)] * 3 + [("z",)] * 4, "key string")
    merged = {
        (r.j, r.b): r.c
        for r in countmin_merge(
            countmin_build(a, "key", 32, 3), countmin_build(b, "key", 32, 3)
        ).collect()
    }
    union = {
        (r.j, r.b): r.c
        for r in countmin_build(a.unionByName(b), "key", 32, 3).collect()
    }
    assert merged == union


def test_countmin_streaming_maintenance(spark, tmp_path):
    """Maintain a global Count-Min over a stream: each micro-batch's
    sketch merges into a parquet-backed store via foreachBatch; the final
    store equals the batch sketch of the full stream bit-for-bit (CM
    linearity end-to-end)."""
    import os
    import time

    import pandas as pd

    from pyfads.sketches import countmin_build, countmin_merge

    src = tmp_path / "cm_src"
    src.mkdir()
    chunks = [["x"] * 50 + ["y"] * 3, ["x"] * 20 + ["z"] * 9, ["w"] * 7]
    t0 = time.time() - 100
    for n, keys in enumerate(chunks):
        p = str(src / f"c{n}.parquet")
        pd.DataFrame({"key": keys}).to_parquet(p)
        os.utime(p, (t0 + n, t0 + n))
    store = str(tmp_path / "cm_store")
    spark.createDataFrame([], "j int, b long, c long").write.parquet(store)

    def merge_in(bdf, _bid):
        sp = bdf.sparkSession
        merged = countmin_merge(
            sp.read.parquet(store), countmin_build(bdf, "key", 32, 3)
        )
        # rewrite-into-place via temp dir (plain-parquet store; a table
        # format would make this one transactional MERGE)
        merged.cache().count()
        merged.write.mode("overwrite").parquet(store + "_next")
        sp.read.parquet(store + "_next").write.mode("overwrite").parquet(store)

    q = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(merge_in)
        .option("checkpointLocation", str(tmp_path / "cm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.j, r.b): r.c for r in spark.read.parquet(store).collect()}
    allkeys = spark.createDataFrame(
        [(k,) for keys in chunks for k in keys], "key string"
    )
    want = {(r.j, r.b): r.c for r in countmin_build(allkeys, "key", 32, 3).collect()}
    assert got == want


def test_robust_outliers_known_values(spark):
    """Hand-computed median/MAD: one wild value flags as an outlier without
    dragging the threshold (the failure mode of mean/std z-scores)."""
    import pandas as pd

    from pyfads.analytics_queries import robust_outliers_q

    # monkey-free: call the operator body directly through a temp view of
    # a tiny events frame by reusing the registered callable's logic via
    # its building blocks
    from pyspark.sql import functions as F

    rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0, 5.0, 1000.0]]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    v = ev.select("event_type", F.round(F.col("value") * 100).cast("long").alias("vc"))
    med = v.groupBy("event_type").agg(F.percentile("vc", F.lit(0.5)).alias("med_cents"))
    dev = v.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("vc") - F.col("med_cents"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", F.lit(0.5)).alias("mad_cents"))
    out = (
        dev.join(F.broadcast(mad), "event_type")
        .withColumn("is_out", F.col("adev") > F.lit(4.4478) * F.col("mad_cents"))
        .collect()
    )
    med_val = {r.med_cents for r in out}.pop()
    assert med_val == 350.0  # interpolated between 300 and 400 cents
    flagged = sorted(r.vc for r in out if r.is_out)
    assert flagged == [100000]  # only the wild value; 1.0..5.0 all inside


def test_hll_accuracy_and_registers(spark):
    """HLL raw estimate lands within ~4 standard errors (1.04/sqrt(256)
    ~ 6.5% each) of the exact cardinality on a 5k-item stream, and the
    register checksums are internally consistent."""
    from pyspark.sql import functions as F

    from pyfads.sketches import hll_distinct_tokens

    n = 5000
    docs = spark.range(n).select(
        F.lit("en").alias("lang"), F.concat(F.lit("tok"), F.col("id")).alias("text")
    )
    row = hll_distinct_tokens(docs).collect()[0]
    assert row.n_exact == n
    assert 0 < row.n_registers_set <= 256
    assert row.register_sum >= row.n_registers_set  # every register >= 1
    assert abs(row.hll_estimate - n) / n < 0.26


def test_hll_merge_is_exact(spark):
    """HLL semilattice: max-merge of shard sketches == whole-stream sketch
    bit-for-bit (register-level equality, not just estimate closeness)."""
    from pyspark.sql import functions as F

    from pyfads.sketches import hll_merge, hll_registers

    items = spark.range(2000).select(
        F.lit("g").alias("lang"), F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    a = items.filter(F.col("key").substr(2, 9).cast("long") % 2 == 0)
    b = items.filter(F.col("key").substr(2, 9).cast("long") % 2 == 1)
    merged = {
        (r.lang, r.bucket): r.register
        for r in hll_merge(
            hll_registers(a, "key"), hll_registers(b, "key")
        ).collect()
    }
    whole = {
        (r.lang, r.bucket): r.register
        for r in hll_registers(items, "key").collect()
    }
    assert merged == whole


def test_hll_duplicate_insensitive(spark):
    """Register state ignores multiplicity: 1 copy or 50 copies of each
    item give the identical sketch (max is idempotent) — the property that
    makes distinct() unnecessary in the build path."""
    from pyspark.sql import functions as F

    from pyfads.sketches import hll_registers

    once = spark.range(300).select(
        F.lit("g").alias("lang"), F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    many = once.crossJoin(spark.range(50).select(F.lit(1).alias("_")))
    r1 = {(r.bucket): r.register for r in hll_registers(once, "key").collect()}
    r2 = {(r.bucket): r.register for r in hll_registers(many, "key").collect()}
    assert r1 == r2


def test_inverted_index_small(spark):
    """Posting prefixes, df exactness, cap behavior, and checksum
    consistency on a hand-checkable corpus."""
    from pyspark.sql import functions as F

    from pyfads.text import inverted_index

    docs = spark.createDataFrame(
        [
            (1, "a b"),
            (2, "a"),
            (3, "a c c"),  # duplicate token in one doc counts once
            (4, None),  # NULL doc is not in the collection
        ],
        "doc_id long, text string",
    )
    out = {r.term: r for r in inverted_index(docs, top_terms=2, postings_cap=2).collect()}
    assert set(out) == {"a", "c"} or set(out) == {"a", "b"}  # df tie b/c broken by term asc
    assert set(out) == {"a", "b"}  # 'b' < 'c' on the df=1 tie
    assert out["a"].df == 3 and out["a"].postings_csv == "1,2"  # capped at 2
    assert out["b"].df == 1 and out["b"].postings_csv == "1"
    import hashlib

    assert out["a"].postings_md5 == hashlib.md5(b"1,2").hexdigest()


def test_inverted_index_plan_uses_window_group_limit(spark):
    """The posting-prefix window must plan as WindowGroupLimit (per-task
    top-k before the shuffle) — the property that keeps a stop-word's
    posting list from ever moving whole."""
    from pyfads.io import read_table
    from pyfads.text import inverted_index

    df = inverted_index(read_table(spark, "/root/testdata/sf0.001", "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_profile_table_small(spark):
    """Null counts, exact distincts, and typed min/max routing (numeric
    vs string vs timestamp) on a mixed-type frame."""
    import datetime

    from pyfads.profile import profile_table

    rows = [
        (1, "x", 2.5, datetime.datetime(2024, 1, 1)),
        (2, None, -1.0, datetime.datetime(2024, 1, 2)),
        (2, "y", None, None),
    ]
    df = spark.createDataFrame(
        rows, "k long, s string, v double, t timestamp_ntz"
    )
    p = {r.column_name: r for r in profile_table(df).collect()}
    assert p["k"].n_rows == 3 and p["k"].n_null == 0 and p["k"].n_distinct == 2
    assert p["k"].min_num == 1.0 and p["k"].max_num == 2.0 and p["k"].min_str is None
    assert p["s"].n_null == 1 and p["s"].min_str == "x" and p["s"].max_str == "y"
    assert p["s"].min_num is None
    assert p["v"].n_null == 1 and p["v"].min_num == -1.0 and p["v"].max_num == 2.5
    assert p["t"].n_null == 1 and p["t"].min_num == 1704067200000.0


def test_hll_streaming_maintenance(spark, tmp_path):
    """Maintain a global HLL register store over a stream via foreachBatch
    max-merge; the final store equals the batch sketch of the full stream
    register-for-register (semilattice merge end-to-end)."""
    import os
    import time

    import pandas as pd

    from pyfads.sketches import hll_merge, hll_registers

    src = tmp_path / "hll_src"
    src.mkdir()
    chunks = [
        [f"k{i}" for i in range(0, 400)],
        [f"k{i}" for i in range(300, 700)],  # overlap: max-merge, not add
        [f"k{i}" for i in range(650, 900)],
    ]
    t0 = time.time() - 100
    for n, keys in enumerate(chunks):
        p = str(src / f"c{n}.parquet")
        pd.DataFrame({"lang": "en", "key": keys}).to_parquet(p)
        os.utime(p, (t0 + n, t0 + n))
    store = str(tmp_path / "hll_store")
    spark.createDataFrame([], "lang string, bucket int, register int").write.parquet(
        store
    )

    def merge_in(bdf, _bid):
        sp = bdf.sparkSession
        merged = hll_merge(sp.read.parquet(store), hll_registers(bdf, "key"))
        merged.cache().count()
        merged.write.mode("overwrite").parquet(store + "_next")
        sp.read.parquet(store + "_next").write.mode("overwrite").parquet(store)

    q = (
        spark.readStream.schema("lang string, key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(merge_in)
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.lang, r.bucket): r.register for r in spark.read.parquet(store).collect()}
    whole = spark.createDataFrame(
        [("en", k) for ch in chunks for k in ch], "lang string, key string"
    )
    want = {(r.lang, r.bucket): r.register for r in hll_registers(whole, "key").collect()}
    assert got == want


def test_hdr_quantile_accuracy_and_merge(spark):
    """HDR sketch quantiles land within the 1/16 relative-error bound of
    exact quantiles, and shard merge equals the whole-stream histogram
    bit-for-bit (additive counts)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pyfads.sketches import hdr_histogram, hdr_merge, hdr_quantiles

    vals = [round(0.01 * (i**1.7 % 40000 + 1), 2) for i in range(1, 4001)]
    df = spark.createDataFrame(
        [("a", v) for v in vals], "event_type string, value double"
    )
    hist = hdr_histogram(df)
    out = {r.q_pct: r for r in hdr_quantiles(hist).collect()}
    arr = np.array(vals)
    for q in (50, 90, 99):
        exact = float(np.quantile(arr, q / 100, method="inverted_cdf"))
        est = out[q].est_value
        assert est <= exact * 1.001  # lower bound never overshoots
        assert est >= exact * (1 - 1 / 16) - 0.02
        assert out[q].n_events == 4000
    # merge = whole
    a = df.filter(F.col("value") < 100.0)
    b = df.filter(F.col("value") >= 100.0)
    merged = {
        (r.bucket): (r.lower, r.cnt)
        for r in hdr_merge(hdr_histogram(a), hdr_histogram(b)).collect()
    }
    whole = {(r.bucket): (r.lower, r.cnt) for r in hist.collect()}
    assert merged == whole


def test_hdr_exact_region(spark):
    """Values below 32 cents occupy exact one-cent buckets: quantiles of
    small values are EXACT, not approximate."""
    from pyfads.sketches import hdr_histogram, hdr_quantiles

    df = spark.createDataFrame(
        [("a", 0.01)] * 50 + [("a", 0.17)] * 45 + [("a", 0.31)] * 5,
        "event_type string, value double",
    )
    out = {r.q_pct: r.est_cents for r in hdr_quantiles(hdr_histogram(df)).collect()}
    assert out[50] == 1 and out[90] == 17 and out[99] == 31


def test_hdr_bucket_invariants_exhaustive(spark):
    """Over every cent value 1..200000: bucket ids are monotone in value,
    lower <= value, and bucket width <= lower/16 outside the exact region
    — the relative-error guarantee, checked exhaustively in one pass."""
    from pyspark.sql import functions as F

    from pyfads.sketches import _hdr_bucket_cols

    vc = spark.range(1, 200_001).select(F.col("id").alias("vc"))
    b, lo = _hdr_bucket_cols("vc")
    out = vc.select("vc", b, lo)
    bad = out.filter(
        (F.col("lower") > F.col("vc"))
        | ((F.col("vc") >= 32) & (F.col("vc") - F.col("lower") > F.col("lower") / 16))
        | ((F.col("vc") < 32) & (F.col("lower") != F.col("vc")))
    ).count()
    assert bad == 0
    # monotone: bucket of vc+1 never below bucket of vc
    from pyspark.sql import Window

    w = out.select(
        "vc", "bucket", F.lead("bucket").over(Window.orderBy("vc")).alias("nxt")
    )
    assert w.filter(F.col("nxt") < F.col("bucket")).count() == 0


def test_hdr_discretize_balanced_and_ordered(spark):
    """Decile buckets are value-ordered (vc ranges don't overlap across
    buckets) and roughly balanced on a smooth distribution."""
    from pyspark.sql import functions as F

    from pyfads.sketches import hdr_discretize

    vals = [("a", round(0.01 * ((i * 37) % 5000 + 1), 2)) for i in range(5000)]
    df = spark.createDataFrame(vals, "event_type string, value double")
    rows = sorted(hdr_discretize(df).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(len(rows)))
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.vc_hi < nxt.vc_lo  # ordered, non-overlapping
    total = sum(r.n_rows for r in rows)
    assert total == 5000
    # balance within the sketch's 1/16 resolution: no decile > 2.5x ideal
    assert max(r.n_rows for r in rows) < 2.5 * (total / len(rows))


def test_hdr_streaming_maintenance(spark, tmp_path):
    """Maintain a global HDR histogram over a stream via foreachBatch
    additive merge; the final store equals the batch histogram of the
    full stream counter-for-counter (completing the store pattern across
    all three mergeable sketches: CM, HLL, HDR)."""
    import os
    import time

    import pandas as pd

    from pyfads.sketches import hdr_histogram, hdr_merge

    src = tmp_path / "hdr_src"
    src.mkdir()
    chunks = [
        [round(0.01 * (i % 900 + 1), 2) for i in range(500)],
        [round(0.01 * (i % 3000 + 1), 2) for i in range(400)],
        [round(0.01 * (i % 90 + 1), 2) for i in range(300)],
    ]
    t0 = time.time() - 100
    for n, vals in enumerate(chunks):
        p = str(src / f"c{n}.parquet")
        pd.DataFrame({"event_type": "a", "value": vals}).to_parquet(p)
        os.utime(p, (t0 + n, t0 + n))
    store = str(tmp_path / "hdr_store")
    spark.createDataFrame(
        [], "event_type string, bucket long, lower long, cnt long"
    ).write.parquet(store)

    def merge_in(bdf, _bid):
        sp = bdf.sparkSession
        merged = hdr_merge(sp.read.parquet(store), hdr_histogram(bdf))
        merged.cache().count()
        merged.write.mode("overwrite").parquet(store + "_next")
        sp.read.parquet(store + "_next").write.mode("overwrite").parquet(store)

    q = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(merge_in)
        .option("checkpointLocation", str(tmp_path / "hdr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_type, r.bucket): (r.lower, r.cnt)
        for r in spark.read.parquet(store).collect()
    }
    whole = spark.createDataFrame(
        [("a", v) for ch in chunks for v in ch], "event_type string, value double"
    )
    want = {
        (r.event_type, r.bucket): (r.lower, r.cnt)
        for r in hdr_histogram(whole).collect()
    }
    assert got == want


def test_hybrid_rrf_fusion_semantics(spark):
    """RRF fusion: a doc ranked by BOTH systems outscores a doc of equal
    single-system rank; contributions follow 1/(60+rank) micros exactly;
    docs outside both pools never appear."""
    from pyfads.text import doc_embed_hash_py, hybrid_rrf

    rows = [
        # doc 1: lexical hit AND verbatim query text (dense hit)
        (1, "join dup vector window"),
        # doc 2: lexical-only hit (query terms buried in unrelated text)
        (2, "join dup vector window aaa bbb ccc ddd eee fff ggg hhh"),
        # docs 3+: unrelated filler
        (3, "xxx yyy zzz www vvv uuu"),
        (4, "xxx yyy zzz www vvv ttt"),
        (5, "qqq rrr sss ttt uuu vvv"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in hybrid_rrf(df, ["join", "dup", "vector", "window"], k=5).collect()}
    assert 1 in out and out[1].rank == 1, out
    # doc 1 is in both pools; its rrf is the exact two-system sum
    r1 = out[1]
    assert r1.rank_lex is not None and r1.rank_dense is not None
    expect = round(1_000_000.0 / (60 + r1.rank_lex)) + round(
        1_000_000.0 / (60 + r1.rank_dense)
    )
    assert r1.rrf_micros == expect
    # two-system doc 1 beats doc 2 even though doc 2 also hits lexically
    assert out[1].rrf_micros > out[2].rrf_micros
    # the python query-vector twin matches the Spark featurization device:
    # embedding the query against itself gives cosine 1 -> doc 1 must lead
    # the dense ranks too
    assert r1.rank_dense == 1
    qv = doc_embed_hash_py("join dup vector window")
    assert sum(abs(c) for c in qv) > 0 and len(qv) == 64


def test_bm25_batch_matches_single_query_runs(spark):
    """The one-scan batch scorer returns exactly what per-query bm25_topk
    runs return (same scores, same ranking) for each query in the batch."""
    from pyfads.text import bm25_batch, bm25_topk

    rows = [
        (1, "join join join pad pad pad"),
        (2, "join pad pad pad pad pad"),
        (3, "pad pad pad pad pad pad"),
        (4, "rare pad pad pad pad pad"),
        (5, "join rare pad pad pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    queries = {"qa": ["join"], "qb": ["rare", "join"]}
    batch = bm25_batch(df, queries, k=5).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score_micros))
    for qid, terms in queries.items():
        single = [
            (r.doc_id, r.score_micros)
            for r in bm25_topk(df, terms, k=5).collect()
        ]
        got = [(d, s) for _, d, s in sorted(by_q[qid])]
        assert got == single, qid


def test_bm25_batch_rejects_empty_inputs(spark):
    """ADVICE r6: an empty queries dict or an empty term list must raise a
    clear ValueError up front, not an opaque IndexError from terms[0]."""
    import pytest

    from pyfads.text import bm25_batch

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_batch(df, {})
    with pytest.raises(ValueError, match="empty term list.*qb"):
        bm25_batch(df, {"qa": ["a"], "qb": []})


def test_source_lang_gini_known_values(spark):
    """Gini impurity sanity: a single-language source scores 0; a
    perfectly 50/50 source scores exactly 500000 ppm."""
    from pyspark.sql import functions as F

    rows = (
        [(i, "en", "pure") for i in range(10)]
        + [(100 + i, "en", "even") for i in range(8)]
        + [(200 + i, "fr", "even") for i in range(8)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    c = df.groupBy("source", "lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = {
        r.source: r
        for r in c.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_sq"),
        )
        .select(
            "source",
            "n_docs",
            "n_langs",
            F.expr("(n_docs * n_docs - sum_sq) * 1000000 div (n_docs * n_docs)")
            .cast("long")
            .alias("gini_ppm"),
        )
        .collect()
    }
    assert out["pure"].gini_ppm == 0 and out["pure"].n_langs == 1
    assert out["even"].gini_ppm == 500_000 and out["even"].n_langs == 2


def test_theta_setops_accuracy_and_degeneracy(spark):
    """Theta intersection/union estimates land near truth on overlapping
    synthetic vocabularies, and degenerate to EXACT counts when both
    sides retain everything (n < k => theta = 2^60 => estimate = count)."""
    from pyspark.sql import functions as F

    from pyfads.sketches import kmv_hashes, theta_set_ops

    # A = tokens 0..2999, B = tokens 2000..5999 -> |A∩B|=1000, |A∪B|=6000
    a_docs = spark.range(3000).select(F.concat(F.lit("tok"), F.col("id")).alias("text"))
    b_docs = spark.range(2000, 6000).select(
        F.concat(F.lit("tok"), F.col("id")).alias("text")
    )
    est = theta_set_ops(kmv_hashes(a_docs, k=512), kmv_hashes(b_docs, k=512), k=512)
    r = est.collect()[0]
    assert abs(r.intersection_est - 1000) / 1000 < 0.5  # k=512 of 3k/4k
    assert abs(r.union_est - 6000) / 6000 < 0.25
    # degenerate: tiny sets fully retained -> exact
    sa = spark.createDataFrame([("x y z",)], "text string")
    sb = spark.createDataFrame([("y z w",)], "text string")
    d = theta_set_ops(kmv_hashes(sa, k=512), kmv_hashes(sb, k=512), k=512).collect()[0]
    assert d.intersection_est == 2.0 and d.union_est == 4.0
