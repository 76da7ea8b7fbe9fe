"""Planted-case tests for per-domain boilerplate scrub and intra-doc
segment dedup (pyfads.dedup) — fixture corpora can't pin the policy
edges: all-copies-removed (vs keep-first), domain isolation, threshold
boundaries, tail segments."""

from __future__ import annotations

from pyfads import dedup as D


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, domain string, text string")


BANNER = "subscribe now"  # one 2-word segment


def test_domain_boilerplate_removes_all_copies(spark):
    df = _df(
        spark,
        [
            (0, "a.com", BANNER + " unique zero text"),
            (1, "a.com", BANNER + " other words here"),
            (2, "a.com", "no banner present here"),
            # same segment on ANOTHER domain, single doc: not boilerplate there
            (3, "b.com", BANNER + " lonely doc words"),
        ],
    )
    out = {
        r.doc_id: r
        for r in D.domain_boilerplate_scrub(
            df, words_per_segment=2, min_docs=2, frac_ppm=500_000
        ).collect()
    }
    # banner scrubbed from BOTH a.com docs (first occurrence included)
    assert out[0].scrubbed_text == "unique zero text"
    assert out[0].n_boiler_dropped == 1
    assert out[1].scrubbed_text == "other words here"
    # untouched docs
    assert out[2].n_boiler_dropped == 0
    assert out[3].scrubbed_text.startswith(BANNER)


def test_domain_boilerplate_min_docs_threshold(spark):
    df = _df(
        spark,
        [
            (0, "a.com", BANNER + " one two"),
            (1, "a.com", "three four five six"),
            (2, "a.com", "seven eight nine ten"),
        ],
    )
    out = D.domain_boilerplate_scrub(
        df, words_per_segment=2, min_docs=2, frac_ppm=0
    ).collect()
    # banner appears in only 1 doc: below min_docs, nothing scrubbed
    assert all(r.n_boiler_dropped == 0 for r in out)


def test_domain_boilerplate_frac_threshold(spark):
    # 1 shared banner across 2 of 10 docs = 20%: caught at 200000 ppm,
    # ignored at 300000 ppm
    rows = [(0, "a.com", BANNER + " aa bb"), (1, "a.com", BANNER + " cc dd")]
    rows += [(i, "a.com", f"w{i}a w{i}b w{i}c w{i}d") for i in range(2, 10)]
    df = _df(spark, rows)
    hits = D.domain_boilerplate_scrub(
        df, words_per_segment=2, min_docs=2, frac_ppm=200_000
    )
    assert sum(r.n_boiler_dropped for r in hits.collect()) == 2
    misses = D.domain_boilerplate_scrub(
        df, words_per_segment=2, min_docs=2, frac_ppm=300_000
    )
    assert sum(r.n_boiler_dropped for r in misses.collect()) == 0


def test_intradoc_keeps_first_occurrence_in_order(spark):
    df = spark.createDataFrame(
        [(0, "a b c d a b e f a b")], "doc_id bigint, text string"
    )
    r = D.intradoc_segment_dedup(df, words_per_segment=2).collect()[0]
    # segments: [a b][c d][a b][e f][a b] -> keep blocks 0,1,3
    assert r.n_segments == 5
    assert r.n_repeats_dropped == 2
    assert r.scrubbed_text == "a b c d e f"


def test_intradoc_partial_tail_segment(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a")], "doc_id bigint, text string"
    )
    r = D.intradoc_segment_dedup(df, words_per_segment=2).collect()[0]
    # segments: [a b][a b][a] -> tail "a" is distinct from "a b"
    assert (r.n_segments, r.n_repeats_dropped) == (3, 1)
    assert r.scrubbed_text == "a b a"


def test_intradoc_no_repeats_is_identity(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id bigint, text string"
    )
    r = D.intradoc_segment_dedup(df, words_per_segment=2).collect()[0]
    assert r.n_repeats_dropped == 0
    assert r.scrubbed_text == "a b c d e f"
