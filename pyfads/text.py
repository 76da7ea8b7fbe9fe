"""Text analysis for large-scale training-data pipelines: statistics,
quality signals, language ID, token counting, fingerprinting.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python UDFs.  Every function has an ANSI-SQL
twin in ``pyfads.llm_queries`` so DuckDB can verify it; shared hashing is
md5-based (identical across engines), never engine-specific xxhash.

Scale: all operators are embarrassingly parallel per-row projections or
map-side-combined aggregations — no shuffles except where noted.
"""

from __future__ import annotations

import hashlib as _hashlib
import math as _math
from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "md5_hash60",
    "md5_hash60_sql",
    "md5_hash60_py",
    "tokens",
    "text_stats",
    "quality_score",
    "token_counts",
    "lang_id",
    "fingerprint",
    "repetition_stats",
    "pii_scrub",
    "normalize_text",
    "source_quality",
    "word_ngrams",
    "top_ngrams",
    "hashed_classifier_score",
    "dsir_weights",
    "dsir_train_lambda",
    "dsir_score_serve",
    "doc_embed_hash",
    "corpus_stats",
    "bpe_train_merges",
    "bpe_piece_count",
    "bpe_token_counts",
    "lm_bigram_rarity",
    "LANG_MARKERS",
    "EN_STOPWORDS",
    "PII_PATTERNS",
]

EN_STOPWORDS = ["the", "and", "of", "to", "is", "in", "a"]

# Real stopword markers per language; scoring = occurrence count (with
# multiplicity) of marker tokens.  Deterministic tie-break: first language
# in sorted key order reaching the max score.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "que", "los", "es", "una"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "zh": ["的", "是", "了", "在", "我", "不"],
}


def md5_hash60(col: Column, seed: str) -> Column:
    """Deterministic 60-bit hash shared with the DuckDB oracles:
    first 15 hex chars of md5(seed || ':' || value), base-16 parsed.

    (Spark's native xxhash64 has no DuckDB twin; md5 exists in both with
    identical output, so cross-engine-verifiable operators use this.)
    """
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), col)), 1, 15), 16, 10
    ).cast("long")


def md5_hash60_sql(seed: str, expr: str) -> str:
    """DuckDB twin of :func:`md5_hash60` — lives here (not in a query
    module) so oracle builders can import it without creating a circular
    import through pyfads.queries (a cycle that silently dropped a late
    registration when a query module was imported before pyfads.queries,
    r5)."""
    return (
        f"CAST(concat('0x', substr(md5(concat_ws(':', '{seed}', {expr})), 1, 15)) AS BIGINT)"
    )


def md5_hash60_py(seed: str, value: str) -> int:
    """Pure-Python twin of :func:`md5_hash60` — for driver/UDF-side code
    that must agree bit-for-bit with the JVM/DuckDB hashes (e.g. the
    streaming decontamination gate, which calls this once per character
    position — hence the module-level hashlib import).  Keep all three
    in lockstep."""
    return int(
        _hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:15], 16
    )


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokenization (single-space corpus convention)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality statistics: lengths, token counts, punctuation
    and stopword ratios — the standard quality-scoring feature set."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), 0))
    return df.select(
        "doc_id",
        F.length(text_col).cast("long").alias("n_chars_calc"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        (
            F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens
        ).alias("mean_token_chars"),
        (n_punct.cast("double") / F.length(text_col)).alias("punct_ratio"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score: Gopher-style rule flags over the
    :func:`text_stats` features, a [0,1] score (1 − flagged/5), and a
    keep/drop verdict.  Pure column arithmetic on top of the stats
    projection — per-row, no shuffle."""
    s = text_stats(df, text_col)
    flags = {
        "flag_short": F.col("n_tokens") < 10,
        "flag_token_len": (F.col("mean_token_chars") < 3.0)
        | (F.col("mean_token_chars") > 10.0),
        "flag_punct": F.col("punct_ratio") > 0.2,
        "flag_stop": F.col("stopword_ratio") < 0.03,
        "flag_repeat": (
            F.col("n_distinct_tokens").cast("double") / F.col("n_tokens")
        )
        < 0.3,
    }
    n_flags = reduce(
        lambda a, b: a + b, [f.cast("int") for f in flags.values()]
    ).cast("long")
    return s.select(
        "doc_id",
        *[expr.alias(name) for name, expr in flags.items()],
        n_flags.alias("n_flags"),
        (F.lit(1.0) - n_flags.cast("double") / F.lit(5.0)).alias("quality_score"),
        (n_flags == 0).alias("quality_pass"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex token counting: words, numbers, symbols, BPE-ish pieces
    (alpha runs | digit runs | single symbols)."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]+"), 0)).cast("long").alias("n_alpha_tokens"),
        F.size(F.regexp_extract_all(t, F.lit("[0-9]+"), 0)).cast("long").alias("n_num_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), 0)).cast("long").alias("n_sym_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
        .cast("long")
        .alias("n_bpe_ish_tokens"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", markers: dict[str, list[str]] | None = None
) -> DataFrame:
    """Language ID via marker-token (stopword n-gram) counting.  Scores each
    language by marker occurrences; argmax with first-in-sorted-order ties."""
    markers = markers or LANG_MARKERS
    toks = tokens(text_col)
    def _score(words: list[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        # single-arg lambda: F.filter treats 2-arg lambdas as (element, index)
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: _score(markers[lang]) for lang in sorted(markers)}
    m = F.greatest(*scores.values()) if len(scores) > 1 else list(scores.values())[0]
    pred = None
    for lang in sorted(markers):
        cond = scores[lang] == m
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    out = df.select(
        "doc_id",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in sorted(markers)],
        pred.alias("lang_pred"),
    )
    return out


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: word-2-gram totals,
    distinct counts, duplicate-2-gram ratio and most-frequent-2-gram
    fraction — the classic "remove boilerplate/templated docs" filter
    (Rae et al. 2021 §A1.1, C4's repetition heuristics).

    Shape: explode 2-grams -> count per (doc, gram) with map-side combine ->
    per-doc agg.  One shuffle keyed (doc_id, gram) whose width is the token
    stream itself — same scale class as the MinHash shingle explode.  Docs
    with < 2 tokens come back with zero counts via the left join.
    """
    toks = tokens(text_col)
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select("doc_id", F.explode(grams).alias("g"))
    counts = exploded.groupBy("doc_id", "g").count()
    agg = counts.groupBy("doc_id").agg(
        F.sum("count").cast("long").alias("n_2grams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_2grams"),
        F.max("count").cast("long").alias("top_2gram_count"),
    )
    out = df.select("doc_id").join(agg, "doc_id", "left")
    n = F.coalesce(F.col("n_2grams"), F.lit(0)).cast("long")
    d = F.coalesce(F.col("n_distinct_2grams"), F.lit(0)).cast("long")
    top = F.coalesce(F.col("top_2gram_count"), F.lit(0)).cast("long")
    return out.select(
        "doc_id",
        n.alias("n_2grams"),
        d.alias("n_distinct_2grams"),
        top.alias("top_2gram_count"),
        F.when(n > 0, (n - d).cast("double") / n).otherwise(F.lit(0.0)).alias(
            "dup_2gram_ratio"
        ),
        F.when(n > 0, top.cast("double") / n).otherwise(F.lit(0.0)).alias(
            "top_2gram_frac"
        ),
    )


# PII patterns shared with the DuckDB twin: RE2/Java-regex common subset
# (\b, \d, bounded repeats all behave identically on both engines).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction: count and replace emails, phone numbers
    and IPv4 addresses (the standard pre-training scrub pass).  Pure
    regexp_extract_all/regexp_replace — per-row, JVM codegen, no shuffle.
    Counts are taken on the original text; replacements apply in the fixed
    order email -> phone -> ip (documented because <IP> never re-matches
    the phone pattern, but a custom pattern set could overlap)."""
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    scrubbed = t
    for _name, (pat, repl) in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(
        "doc_id",
        *counts,
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style text normalization: strip control characters, collapse
    whitespace runs, trim, lowercase — the canonical form most dedup and
    fingerprint passes key on.  Pure ``regexp_replace`` chain (per-row,
    JVM codegen, zero shuffles); the patterns use only the Java/RE2 common
    subset so the DuckDB oracle is byte-identical.

    Returns the normalized text plus before/after lengths and its md5 (the
    join key a downstream normalized-dedup would use)."""
    t = F.col(text_col)
    cleaned = F.regexp_replace(t, r"[\x00-\x1F\x7F]", " ")
    norm = F.lower(F.trim(F.regexp_replace(cleaned, r"\s+", " ")))
    return df.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_raw"),
        norm.alias("text_norm"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.md5(norm).alias("norm_md5"),
    )


def source_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source curation report: document counts, quality-pass rate, and
    per-flag totals over the :func:`quality_score` verdicts — the table a
    corpus run publishes to decide which crawls/domains to keep.

    One map-side-combined aggregation keyed by the low-cardinality source
    column.  Every aggregate is an integer sum; the rates are single exact
    divisions at the end, so the doubles are bit-deterministic regardless
    of partitioning (never ``avg`` over doubles, whose summation order is
    partition-dependent)."""
    q = quality_score(df, text_col)
    joined = df.select("doc_id", "source").join(q, "doc_id")
    flag_cols = [c for c in q.columns if c.startswith("flag_")]
    agg = joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("quality_pass").cast("int")).cast("long").alias("n_pass"),
        F.sum("n_flags").cast("long").alias("total_flags"),
        *[
            F.sum(F.col(c).cast("int")).cast("long").alias(f"n_{c}")
            for c in flag_cols
        ],
    )
    return agg.select(
        "source",
        "n_docs",
        "n_pass",
        (F.col("n_pass").cast("double") / F.col("n_docs")).alias("pass_rate"),
        "total_flags",
        (F.col("total_flags").cast("double") / F.col("n_docs")).alias(
            "mean_flags"
        ),
        *[F.col(f"n_{c}") for c in flag_cols],
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of the normalized text plus a
    winnowing-style rolling fingerprint (min 60-bit hash over all char
    8-grams — robust to local edits).

    Shape: normalize once per document, then per-row ``transform`` over the
    gram positions + ``array_min`` — zero shuffles, zero row blow-up (the
    earlier explode + groupBy-min shipped every gram through a shuffle and
    was ~4x slower even single-threaded).  The normalization is projected
    into its own column first; it is referenced twice (length + lambda), so
    CollapseProject keeps it materialized once per document instead of
    re-inlining the regex per gram."""
    t = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(t), " +", " "))
    n_df = df.select("doc_id", norm.alias("__norm"))
    idx = F.sequence(F.lit(1), F.greatest(F.length("__norm") - F.lit(7), F.lit(1)))

    def gram_hash(i: Column) -> Column:
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("win"), F.col("__norm").substr(i, F.lit(8)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    return n_df.select(
        "doc_id",
        F.md5("__norm").alias("fp_md5"),
        F.array_min(F.transform(idx, gram_hash)).alias("fp_winnow"),
    )


def word_ngrams(text_col: str | Column = "text", n: int = 2) -> Column:
    """All word n-gram occurrences (with repeats) as an array column;
    docs shorter than ``n`` tokens yield an empty array."""
    toks = tokens(text_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_ngrams(
    df: DataFrame, k: int = 100, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide heavy hitters: the ``k`` most frequent word ``n``-grams
    by total occurrence count, ties broken by gram text ascending — the
    boilerplate-discovery pass of corpus curation (find the navigation
    chrome / license headers worth filtering globally).

    Shape: explode → ``groupBy(gram).count()`` with map-side partial
    aggregation (shuffle carries one row per distinct gram per partition),
    then ``orderBy(...).limit(k)`` which Spark plans as
    ``TakeOrderedAndProject`` — per-partition top-k heaps merged on the
    driver, k rows per partition over the wire, never a global sort
    shuffle.  Deterministic for any corpus.
    """
    exploded = df.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
    counts = exploded.groupBy("gram").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return counts.orderBy(F.col("cnt").desc(), F.col("gram")).limit(k)


def hashed_classifier_score(
    df: DataFrame,
    weights: "list[int]",
    seed: str = "clf",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
    bigrams: bool = True,
) -> DataFrame:
    """fastText-style linear text classifier over hashed word-n-gram
    features (the standard quality/ toxicity/ domain filter of corpus
    curation): each unigram (and optionally bigram) is hashed into one of
    ``len(weights)`` buckets, the model is the integer weight vector, and
    the document logit is the mean bucket weight.

    ``weights`` is the trained model, shipped to executors as a literal
    array (the broadcast-lookup shape: at 100 TB the model rides along in
    the plan, never joined).  Weights are *integers* (fixed-point, 1/1024
    units) so the per-document sum is order-independent and exact — the
    single float op is one final division of two exactly-representable
    values, making the score bit-identical across engines (the DuckDB
    oracle recomputes it from the same literal).

    Shape: per-row projection, zero shuffles, all JVM codegen — the
    feature hash is :func:`md5_hash60` (cross-engine) and the lookup is
    ``element_at`` into the literal array.
    """
    n_buckets = len(weights)
    w_lit = F.array(*[F.lit(int(w)) for w in weights])
    toks = tokens(text_col)
    feats = F.concat(toks, word_ngrams(text_col, 2)) if bigrams else toks
    bucket = lambda g: md5_hash60(g, seed) % n_buckets  # noqa: E731
    wsum = F.aggregate(
        F.transform(feats, lambda g: F.element_at(w_lit, (bucket(g) + 1).cast("int"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v.cast("long"),
    )
    out = df.select(
        id_col,
        F.size(feats).cast("long").alias("n_feats"),
        wsum.alias("weight_sum"),
    )
    score = F.col("weight_sum").cast("double") / (
        F.lit(1024.0) * F.greatest(F.col("n_feats"), F.lit(1)).cast("double")
    )
    return out.select(
        id_col,
        "n_feats",
        "weight_sum",
        score.alias("clf_score"),
        (score >= F.lit(float(threshold))).alias("clf_pass"),
    )


def dsir_weights(
    df: DataFrame,
    target_col: "str | Column",
    n_buckets: int = 4096,
    seed: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    per document, an estimate of log p_target(x)/p_raw(x) under hashed
    n-gram bag-of-words models of the target distribution (rows where
    ``target_col`` is true) vs the raw corpus (all rows).

    Fixed point is FLOOR-LOG2 ("bits", via ``length(bin(c)) - 1`` — the
    cross-engine-exact integer log the sketches already use): each
    feature's contribution is

        lam[h] = (il(p[h]+1) - il(p_tot+1)) - (il(q[h]+1) - il(q_tot+1))

    i.e. the smoothed log2-probability ratio at +-1-bit resolution, and a
    document's ``logw_bits`` is the sum over its unigram+bigram
    occurrences.  A true ln() would not be bit-reproducible across engines
    (the BM25 odds-form precedent); 1-bit resolution per feature over
    hundreds of features per doc still separates on-target from off-target
    text by tens of bits.

    Returns ALL rows: ``(doc_id, n_feats, logw_bits)``.

    Scale shape: features explode once, bucket-hash to ``n_buckets`` keys;
    the lambda table is BOUNDED at n_buckets rows (its totals window runs
    on that tiny table, single partition by construction), broadcast back
    onto the feature stream — so the corpus sees one explode, one
    map-side broadcast join, and ONE doc-keyed shuffle, regardless of
    corpus size.  This is DSIR's own design point: the model is a hashed
    count vector, never vocabulary-sized state.
    """
    hashed = _dsir_hashed_features(df, target_col, n_buckets, seed, text_col, id_col, bigrams)
    lam = _dsir_lambda_frame(hashed)
    agg = (
        hashed.join(F.broadcast(lam), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lam_bits").cast("long").alias("logw_bits"),
        )
    )
    out = df.select(id_col).join(agg, id_col, "left")
    return out.select(
        id_col,
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(F.col("logw_bits"), F.lit(0)).cast("long").alias("logw_bits"),
    )


def _dsir_il(c) -> Column:
    """floor(log2(x)) for x >= 1 via bit length — the cross-engine integer
    log (same device as the sketches)."""
    return (F.length(F.bin(c)) - 1).cast("long")


def _dsir_feats(text_col: str, bigrams: bool) -> Column:
    toks = tokens(text_col)
    return F.concat(toks, word_ngrams(text_col, 2)) if bigrams else toks


def _dsir_hashed_features(
    df: DataFrame,
    target_col: "str | Column",
    n_buckets: int,
    seed: str,
    text_col: str,
    id_col: str,
    bigrams: bool,
) -> DataFrame:
    """(id, __t, b): one row per feature occurrence with its bucket id."""
    tgt = (F.col(target_col) if isinstance(target_col, str) else target_col).cast(
        "boolean"
    )
    return df.select(
        F.col(id_col),
        tgt.alias("__t"),
        F.explode(_dsir_feats(text_col, bigrams)).alias("g"),
    ).select(
        id_col,
        "__t",
        (md5_hash60(F.col("g"), seed) % n_buckets).cast("long").alias("b"),
    )


def _dsir_bucket_counts(hashed: DataFrame) -> DataFrame:
    """(b, q_cnt, p_cnt): per-bucket corpus/target feature counts —
    bounded at n_buckets rows."""
    return hashed.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("q_cnt"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).cast("long").alias("p_cnt"),
    )


def _dsir_lambda_frame(hashed: DataFrame) -> DataFrame:
    """(b, lam_bits): the smoothed log2-ratio table (only buckets with at
    least one corpus occurrence — absent buckets never join anyway)."""
    il = _dsir_il
    wtot = Window.partitionBy()  # whole-frame total over <= n_buckets rows
    return _dsir_bucket_counts(hashed).select(
        "b",
        (
            (il(F.col("p_cnt") + 1) - il(F.sum("p_cnt").over(wtot) + 1))
            - (il(F.col("q_cnt") + 1) - il(F.sum("q_cnt").over(wtot) + 1))
        ).alias("lam_bits"),
    )


def dsir_train_lambda(
    df: DataFrame,
    target_col: "str | Column",
    n_buckets: int = 4096,
    seed: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
) -> "list[int]":
    """Train the DSIR model ONCE and return it as a dense per-bucket
    lambda list for :func:`dsir_score_serve` — the train-once/serve-many
    artifact (same posture as the IVF codebook store).  Buckets the
    training corpus never hashed into get the c=0 smoothed value
    ``il(q_tot+1) - il(p_tot+1)`` (both count terms at il(0+1) = 0), so
    unseen features at serve time score maximally-smoothed rather than 0.

    Driver collect is BOUNDED at n_buckets rows (KBs) — the whole point
    of feature hashing: the model never grows with the vocabulary.  ONE
    Spark job over the exploded feature stream (code-review r8 #5): the
    totals and every lam_bits derive driver-side from the collected
    bucket counts with the same integer math as _dsir_lambda_frame."""
    hashed = _dsir_hashed_features(
        df, target_col, n_buckets, seed, text_col, id_col, bigrams
    )
    rows = _dsir_bucket_counts(hashed).collect()
    q_tot = sum(int(r["q_cnt"]) for r in rows)
    p_tot = sum(int(r["p_cnt"]) for r in rows)
    il = lambda x: (x).bit_length() - 1  # noqa: E731  (x >= 1)
    default = il(q_tot + 1) - il(p_tot + 1)
    lam = [default] * n_buckets
    for r in rows:
        lam[int(r["b"])] = (il(int(r["p_cnt"]) + 1) - il(p_tot + 1)) - (
            il(int(r["q_cnt"]) + 1) - il(q_tot + 1)
        )
    return lam


def dsir_score_serve(
    df: DataFrame,
    lam: "list[int]",
    seed: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
) -> DataFrame:
    """Model-serve form of :func:`dsir_weights`: the trained lambda table
    rides as ONE array literal (like the hashed classifier's weights) and
    the per-doc score is a pure column expression — zero shuffles, zero
    state, so it runs UNCHANGED on batch tables or streaming ingest (the
    quality-gate shape: score arriving docs against a model trained on
    yesterday's corpus).

    Served scores equal :func:`dsir_weights` exactly wherever every
    feature bucket was seen in training (asserted by the registered
    twin); unseen buckets get the trainer's smoothed default."""
    n_buckets = len(lam)
    lam_lit = F.lit([int(x) for x in lam])
    feats = _dsir_feats(text_col, bigrams)
    logw = F.aggregate(
        F.transform(
            feats,
            lambda g: F.element_at(
                lam_lit, ((md5_hash60(g, seed) % n_buckets) + 1).cast("int")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v.cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.size(feats).cast("long").alias("n_feats"),
        logw.alias("logw_bits"),
    )


def doc_embed_hash(
    df: DataFrame,
    dim: int = 64,
    seed: str = "emb",
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
) -> DataFrame:
    """Model-free document embeddings via the hashing trick + signed
    random projection (Weinberger et al. 2009): each unigram/bigram
    occurrence adds +-1 (sign = one md5 bit) to one of ``dim`` buckets
    (bucket = low md5 bits), so near-duplicate texts — which share most
    n-grams — land at high cosine while unrelated texts decorrelate.
    Returns ``(doc_id, embedding array<double>)`` with exact integer
    coordinates (bit-reproducible; the oracle recomputes them in SQL).

    This is the cheap on-ramp to :func:`pyfads.similarity.semantic_dedup`
    when no learned embedding column exists yet: the composition gives
    paraphrase-class dedup over raw text with zero model dependencies.

    Shape: one explode -> map-side-combined (doc, bucket) integer sums ->
    one doc-keyed map assembly -> dense array via a sequence transform.
    (The one-agg form with ``dim`` conditional sums compiles a
    doAggregateWithKeysOutput past janino's method limit at dim 64 and
    drops the whole aggregate to interpreted mode — the two-stage map
    shape keeps codegen, and the integer sums are exact in any order so
    parity is unaffected.)  Sign comes from md5 bit 32, disjoint from the
    bucket bits for any dim up to 2^32."""
    feats = _dsir_feats(text_col, bigrams)
    h = md5_hash60(F.col("g"), seed)
    ex = df.select(F.col(id_col), F.explode(feats).alias("g")).select(
        id_col,
        (h % dim).cast("int").alias("b"),
        F.when(F.shiftright(h, 32).bitwiseAND(F.lit(1)) == 1, 1)
        .otherwise(-1)
        .alias("s"),
    )
    per = ex.groupBy(id_col, "b").agg(F.sum("s").cast("double").alias("v"))
    vec = per.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("b", "v"))).alias("__m")
    )
    # left-join back onto the full id set: a NULL text explodes to zero
    # feature rows, which would silently DROP the doc from the output
    # (ADVICE r8) — instead it keeps its row with the zero vector (the
    # coalesce below densifies a NULL map to all-zeros), which downstream
    # drop_zero_norm then handles uniformly, like dsir_weights' left join.
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.element_at("__m", j.cast("int")), F.lit(0.0)),
    )
    return (
        df.select(id_col).join(vec, id_col, "left").select(id_col, dense.alias("embedding"))
    )


def doc_embed_hash_py(
    text: str, dim: int = 64, seed: str = "emb", bigrams: bool = True
) -> "list[float]":
    """Pure-Python twin of :func:`doc_embed_hash` for ONE text — used to
    embed a literal query vector in both the Spark plan and the DuckDB
    oracle (parity by construction: same featurization, same md5 bucket
    and sign bits).  Tokenization mirrors split(text, ' ') including
    empties; coordinates are exact small integers."""
    toks = text.split(" ") if text is not None else []
    feats = list(toks)
    if bigrams and len(toks) >= 2:
        feats += [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    v = [0.0] * dim
    for g in feats:
        h = md5_hash60_py(seed, g)
        v[h % dim] += 1.0 if (h >> 32) & 1 else -1.0
    return v


def hybrid_rrf(
    df: DataFrame,
    query_terms: "list[str]",
    dim: int = 64,
    seed: str = "emb",
    pool: int = 50,
    k: int = 10,
    k_rrf: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hybrid lexical+dense retrieval fused by Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher, SIGIR 2009): BM25 top-``pool`` ranks and
    dense-cosine top-``pool`` ranks (hashing-trick doc embeddings vs the
    SAME query embedded the same way) combine as

        rrf(d) = sum over systems of 1/(k_rrf + rank_system(d))

    quantized per-system to micros (one correctly-rounded IEEE division
    each — no .5 boundary exists for k_rrf=60, pool<=50, so the rounds are
    engine-stable) and summed exactly as BIGINTs.  A doc missing from one
    system's pool contributes 0 from it — the standard RRF treatment.

    Scale shape: the lexical side is :func:`bm25_topk`'s one-scan shape;
    the dense side is one :func:`doc_embed_hash` pass + a literal-vector
    projection (map-only — the query vector rides in the plan, nothing
    joins) + TakeOrdered; the fusion joins two <= ``pool``-row frames —
    driver-scale work no matter the corpus size.  Output: top-``k``
    ``(doc_id, rank_lex, rank_dense, rrf_micros, rank)``.
    """
    qv = doc_embed_hash_py(" ".join(query_terms), dim, seed)
    qn = _math.sqrt(reduce(lambda a, x: a + x, [c * c for c in qv]))
    lex = (
        bm25_topk(df, query_terms, k=pool, k1=k1, b=b, text_col=text_col, id_col=id_col)
        .withColumn(
            "rank_lex",
            F.row_number()
            .over(Window.orderBy(F.desc("score_micros"), id_col))
            .cast("long"),
        )
        .select(id_col, "rank_lex")
    )
    emb = doc_embed_hash(df, dim=dim, seed=seed, text_col=text_col, id_col=id_col)
    dot = reduce(
        lambda a, x: a + x,
        [F.col("embedding")[i] * F.lit(float(qv[i])) for i in range(dim)],
    )
    dn = F.sqrt(
        reduce(
            lambda a, x: a + x,
            [F.col("embedding")[i] * F.col("embedding")[i] for i in range(dim)],
        )
    )
    dense = (
        emb.select(F.col(id_col), dot.alias("__dot"), dn.alias("__dn"))
        .filter(F.col("__dn") > 0)
        .select(id_col, (F.col("__dot") / (F.col("__dn") * F.lit(qn))).alias("__cos"))
        # TakeOrdered top-pool first (per-partition top-k, no global sort);
        # the rank window then runs over <= pool rows
        .orderBy(F.desc("__cos"), id_col)
        .limit(pool)
        .withColumn(
            "rank_dense",
            F.row_number().over(Window.orderBy(F.desc("__cos"), id_col)).cast("long"),
        )
        .select(id_col, "rank_dense")
    )

    def _contrib(rank_col: str) -> Column:
        return F.coalesce(
            F.round(F.lit(1_000_000.0) / (F.lit(k_rrf) + F.col(rank_col))).cast("long"),
            F.lit(0).cast("long"),
        )

    return (
        lex.join(dense, id_col, "full_outer")
        .withColumn("rrf_micros", _contrib("rank_lex") + _contrib("rank_dense"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("rrf_micros"), id_col))
            .cast("long"),
        )
        .filter(F.col("rank") <= k)
        .select(id_col, "rank_lex", "rank_dense", "rrf_micros", "rank")
    )


def corpus_stats(
    df: DataFrame, text_col: str = "text", strat_col: str = "lang"
) -> DataFrame:
    """Per-stratum corpus composition report: document count, token totals
    and moments, exact median doc length, distinct sources — the mixing
    table a data-curation run publishes per language/domain.

    One map-side-combined aggregation keyed by the stratum.  ``percentile``
    is Spark's exact interpolating implementation (matches DuckDB
    ``quantile_cont``); at 100 TB swap for ``percentile_approx`` with a
    documented error bound — the exact form is the oracle-checkable one.
    """
    n_tok = F.size(tokens(text_col)).cast("long")
    return (
        df.select(
            F.col(strat_col), n_tok.alias("__nt"), F.col("source").alias("__src")
        )
        .groupBy(strat_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__nt").cast("long").alias("total_tokens"),
            F.avg("__nt").alias("mean_tokens"),
            F.percentile("__nt", F.lit(0.5)).alias("median_tokens"),
            F.min("__nt").cast("long").alias("min_tokens"),
            F.max("__nt").cast("long").alias("max_tokens"),
            F.count_distinct(F.col("__src")).cast("long").alias("n_sources"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    standard long-document pre-tokenization step (context windows with
    ``chunk_tokens - stride`` tokens of overlap).

    Chunk starts are 0, stride, 2*stride, ... while start < n_tokens, so
    the tail is always covered; the last chunk may be shorter.  Output one
    row per chunk: (id, chunk_idx, n_chunk_tokens, chunk_text).

    Scale shape: pure per-row array ops — split once, ``sequence`` the
    starts, ``explode``, ``slice`` + ``array_join`` per chunk.  Zero
    shuffles, zero Python; at 100 TB this is a map-only stage whose output
    feeds packing (pyfads.pipeline.pack_contexts) or chunk-level dedup."""
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunk = F.slice(F.col("__toks"), F.col("start") + 1, chunk_tokens)
    # NULL text would otherwise yield one junk row (size(split(NULL)) is -1
    # under legacy sizeOfNull, so greatest(n-1,0)=0 emits start=0) while the
    # SQL oracle's generate_series over NULL emits none — drop NULLs so both
    # engines agree that a NULL document has no chunks.
    df = df.filter(F.col(text_col).isNotNull())
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(starts).alias("start"),
        )
        .select(
            id_col,
            (F.col("start") / stride).cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: "list[str]",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval: top-``k`` documents for a bag of ``query_terms``.

    Scoring: for each query term t,
        idf(t)   = (N - df_t + 0.5) / (df_t + 0.5)        (odds form — no
                   transcendental, so the arithmetic is a fixed chain of
                   correctly-rounded IEEE double ops that any engine
                   reproduces bit-for-bit; the usual log() wrapper is
                   monotone, so rankings are unchanged)
        score_t  = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl*N/sumdl))
    summed over the FIXED literal term order and quantized ONCE to micros
    (BIGINT) — deterministic under any partitioning.

    Scale shape (the whole point vs an exploded inverted index): tf for
    the bounded query-term list is computed per document with array
    filters in one projection — the corpus is scanned ONCE, nothing
    explodes, and the only shuffles are (a) one partial-agg to a single
    broadcast stats row (N, sumdl, df per term) and (b) the TakeOrdered
    top-k.  At 100 TB this is a map-only scan plus two tiny exchanges.
    For serving many ad-hoc queries, materialize `tf` per (doc, term)
    once instead; for ONE query-at-a-time scoring, this shape is optimal.

    NULL text is excluded up front (same class of bug as chunk_documents:
    Spark's legacy sizeOfNull makes size(split(NULL)) = -1, which would
    poison the GLOBAL sum_dl by -1 per NULL doc while SQL engines skip
    NULLs in SUM — so both engines agree a NULL document is not in the
    collection at all: it contributes to neither N, sum_dl, nor df_t).
    """
    df = df.filter(F.col(text_col).isNotNull())
    toks = tokens(text_col)

    def _tf(term: str) -> Column:
        # single-arg lambda: a 2-arg lambda (even via default args) makes
        # F.filter bind the second parameter to the element INDEX
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        *[_tf(t).cast("long").alias(f"tf{i}") for i, t in enumerate(query_terms)],
    )
    stats = F.broadcast(
        base.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("long")).cast("long").alias(f"df{i}")
                for i in range(len(query_terms))
            ],
        )
    )
    half = F.lit(0.5)

    def term_score(i: int) -> "F.Column":
        tf = F.col(f"tf{i}")
        idf = (F.col("n_docs") - F.col(f"df{i}") + half) / (F.col(f"df{i}") + half)
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl") * F.col("n_docs")) / F.col("sum_dl")
        )
        return idf * ((tf * F.lit(k1 + 1.0)) / denom)

    score = term_score(0)
    for i in range(1, len(query_terms)):
        score = score + term_score(i)
    return (
        base.crossJoin(stats)
        .select(
            F.col(id_col),
            F.round(score * F.lit(1_000_000.0)).cast("long").alias("score_micros"),
        )
        .orderBy(F.desc("score_micros"), id_col)
        .limit(k)
    )


def inverted_index(
    df: DataFrame,
    top_terms: int = 100,
    postings_cap: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index build: per-term document frequency plus the first
    ``postings_cap`` doc ids of the (sorted) posting list, for the
    ``top_terms`` highest-df terms.  Complements :func:`bm25_topk`: BM25
    is the scan-side one-query shape; this is the materialize-once index
    for serving many queries.

    Output per term: exact ``df``, ``postings_csv`` (capped sorted-prefix,
    comma-joined) and ``postings_md5`` — the checksum asserts list-level
    parity without emitting unbounded rows.

    Scale shape: distinct (term, doc) is one hash aggregate; the top-df
    term pick is TakeOrdered (per-partition top-k, no global sort); the
    posting prefixes come from a row_number window that Spark plans as
    WindowGroupLimit — each map task keeps at most ``postings_cap`` doc
    ids per term BEFORE the shuffle, so a stop-word's billion-document
    posting list never moves.  The full (uncapped) index at 100 TB would
    be written as a bucketed table keyed on term, not collected per row.

    NULL text is excluded (same collection rule as bm25_topk).
    """
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("term"), F.col(id_col))
        .distinct()
    )
    dfreq = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    top = dfreq.orderBy(F.col("df").desc(), "term").limit(top_terms)
    w = Window.partitionBy("term").orderBy(id_col)
    prefix = (
        toks.join(F.broadcast(top.select("term")), "term")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= postings_cap)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.col(id_col))),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_csv")
        )
    )
    return (
        top.join(prefix, "term")
        .select(
            "term",
            "df",
            "postings_csv",
            F.md5(F.col("postings_csv")).alias("postings_md5"),
        )
    )


def bm25_batch(
    df: DataFrame,
    queries: "dict[str, list[str]]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch BM25: score MANY queries in ONE corpus scan — the serving
    shape when a retrieval pass evaluates a query workload (eval suites,
    router training) rather than one ad-hoc query.

    The tf columns for the UNION of all query terms are computed in a
    single projection; each document row then fans out to one row per
    query (a bounded literal explode — |Q| rows), scored with exactly
    :func:`bm25_topk`'s float chain over that query's own term order.
    Top-k per query is a row_number window over the query key —
    WindowGroupLimit keeps k rows per query per map task, so the shuffle
    carries O(k * |Q| * tasks) rows.  Corpus scans: exactly one,
    regardless of |Q| (vs |Q| scans for repeated bm25_topk calls).
    """
    if not queries:
        raise ValueError("bm25_batch: queries dict must be non-empty")
    empty = sorted(qid for qid, ts in queries.items() if not ts)
    if empty:
        raise ValueError(f"bm25_batch: empty term list for queries {empty}")
    df = df.filter(F.col(text_col).isNotNull())
    toks = tokens(text_col)
    all_terms = sorted({t for ts in queries.values() for t in ts})
    t_idx = {t: i for i, t in enumerate(all_terms)}

    def _tf(term: str) -> Column:
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        *[_tf(t).cast("long").alias(f"tf{i}") for i, t in enumerate(all_terms)],
    )
    stats = F.broadcast(
        base.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("long")).cast("long").alias(f"df{i}")
                for i in range(len(all_terms))
            ],
        )
    )
    half = F.lit(0.5)

    def term_score(i: int) -> Column:
        tf = F.col(f"tf{i}")
        idf = (F.col("n_docs") - F.col(f"df{i}") + half) / (F.col(f"df{i}") + half)
        denom = tf + F.lit(k1) * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b) * (F.col("dl") * F.col("n_docs")) / F.col("sum_dl")
        )
        return idf * ((tf * F.lit(k1 + 1.0)) / denom)

    def query_score(terms: "list[str]") -> Column:
        s = term_score(t_idx[terms[0]])
        for t in terms[1:]:
            s = s + term_score(t_idx[t])
        return s

    fanout = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(qid).alias("query_id"),
                    F.round(query_score(ts) * F.lit(1_000_000.0))
                    .cast("long")
                    .alias("score_micros"),
                )
                for qid, ts in sorted(queries.items())
            ]
        )
    )
    scored = base.crossJoin(stats).select(F.col(id_col), fanout.alias("q")).select(
        "q.query_id", id_col, "q.score_micros"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micros"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score_micros", "rank")
    )


# ---------------------------------------------------------------------------
# Real BPE token counting (r7) — upgrades the regex-approximate token_counts
# ---------------------------------------------------------------------------


def bpe_train_merges(
    word_counts: "dict[str, int]", n_merges: int
) -> "list[tuple[str, str]]":
    """Deterministic BPE training (Sennrich et al. 2016) over a
    word-frequency table: repeatedly merge the most frequent adjacent
    symbol pair (ties -> lexicographically smallest pair), applying each
    merge to all non-overlapping occurrences left-to-right.

    BPE training needs only the DISTINCT-WORD frequency table, never the
    corpus — that is what makes the Spark operator scale: one
    map-side-combined word count, then this pure-Python loop on the
    driver over a bounded top-K word sample (the same
    bounded-training/broadcast-serving split as IVF codebooks)."""
    vocab: "dict[tuple[str, ...], int]" = {
        tuple(w): c for w, c in word_counts.items() if w
    }
    merges: "list[tuple[str, str]]" = []
    for _ in range(n_merges):
        pairs: "dict[tuple[str, str], int]" = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        vocab = {_merge_word(syms, best): c for syms, c in vocab.items()}
    return merges


def _merge_word(
    syms: "tuple[str, ...]", pair: "tuple[str, str]"
) -> "tuple[str, ...]":
    """Merge all non-overlapping occurrences of ``pair`` left-to-right."""
    out: "list[str]" = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_piece_count(word: str, ranks: "dict[tuple[str, str], int]") -> int:
    """Number of BPE pieces for one word: iteratively merge the
    lowest-rank pair present (all occurrences, left-to-right) until no
    learned pair remains — the GPT-2 ``bpe()`` encode algorithm, which
    reproduces the training-time segmentation."""
    if not word:
        return 0
    syms: "tuple[str, ...]" = tuple(word)
    while len(syms) > 1:
        ranked = [
            (ranks[p], p)
            for p in set(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not ranked:
            break
        syms = _merge_word(syms, min(ranked)[1])
    return len(syms)


def bpe_token_counts(
    df: DataFrame,
    n_merges: int = 200,
    train_top_words: int = 5000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document REAL BPE token counts with a corpus-trained merge
    table — the honest version of :func:`token_counts`'s ``n_bpe_ish``
    regex estimate.

    Scale shape (the part that matters at 100 TB): the corpus is scanned
    once into per-doc word counts (map-side combined); training sees only
    the top-``train_top_words`` distinct words by frequency (bounded
    ``orderBy().limit().collect()``, like IVF codebook training); the
    encoder UDF runs once per DISTINCT word — never per token occurrence —
    and the resulting (word, pieces) table is broadcast back onto the
    per-doc counts.  Python-row work is O(|vocab|), not O(corpus).
    """
    from pyspark.sql import types as T

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
    per_doc = tok.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    word_tot = per_doc.groupBy("word").agg(F.sum("cnt").alias("wc"))
    train = (
        word_tot.orderBy(F.desc("wc"), "word").limit(train_top_words).collect()
    )
    merges = bpe_train_merges({r["word"]: r["wc"] for r in train}, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(T.LongType())
    def n_pieces(words: pd.Series) -> pd.Series:
        return words.map(lambda w: bpe_piece_count(w, ranks)).astype("int64")

    pieces = F.broadcast(word_tot.select("word", n_pieces("word").alias("pieces")))
    return (
        per_doc.join(pieces, "word")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("pieces")).cast("long").alias("n_bpe_tokens"),
        )
    )


def lm_bigram_rarity(
    df: DataFrame,
    rare_max_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram-LM fluency proxy WITHOUT transcendentals: per document, the
    fraction (integer ppm) of its word-bigram occurrences whose CORPUS
    frequency is <= ``rare_max_count`` — the cross-engine-exact stand-in
    for a KenLM perplexity filter (CCNet-style): disfluent/garbled text is
    exactly text made of corpus-rare transitions.  (A true log-prob needs
    ln(), which is not bit-reproducible across engines — see the BM25
    odds-form precedent.)

    Shape: one bigram explode -> per-(doc, gram) count (map-side combined)
    -> global per-gram count -> equi-join back on the gram key -> per-doc
    agg.  At 100 TB the gram table is the big side of an equi-join on an
    8-byte hash; no broadcast of unbounded state.
    """
    toks = tokens(text_col)
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = (
        df.select(F.col(id_col), F.explode(grams).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    corpus = per_doc.groupBy("g").agg(F.sum("cnt").cast("long").alias("cc"))
    joined = per_doc.join(corpus, "g")
    agg = joined.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.sum(
            F.when(F.col("cc") <= rare_max_count, F.col("cnt")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_rare"),
    )
    out = df.select(id_col).join(agg, id_col, "left")
    n = F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
    r = F.coalesce(F.col("n_rare"), F.lit(0)).cast("long")
    return out.select(
        id_col,
        n.alias("n_bigrams"),
        r.alias("n_rare"),
        F.when(n > 0, F.expr("n_rare * 1000000 div n_bigrams"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rare_ppm"),
    )


def rarity_buckets(
    df: DataFrame,
    rare_max_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2019
    splits each language's crawl into fluency tertiles by LM perplexity;
    head trains the model, tail gets dropped or down-weighted) over the
    transcendental-free rarity proxy :func:`lm_bigram_rarity` — lower
    ``rare_ppm`` = more fluent = head.

    Tertile assignment is INTEGER-exact (no percent_rank floats): rows
    ranked per language by ``(rare_ppm, id)``, then
    ``tier = least((rank - 1) * 3 div n_lang, 2)`` — 0/1/2 =>
    head/middle/tail, ties broken deterministically by id, identical in
    any engine.

    Scale shape: the rarity computation is the bigram equi-join
    (:func:`lm_bigram_rarity`); the bucketing adds ONE window partitioned
    by language — a bounded-cardinality key, so each language sorts in
    parallel across its partitions' tasks.  With per-language skew (one
    dominant language at 100 TB), range-partition the window input on
    ``(lang, rare_ppm)`` first or bucket by (lang, ppm-band)."""
    r = lm_bigram_rarity(df, rare_max_count, text_col, id_col)
    j = df.select(F.col(id_col), F.col(lang_col)).join(
        r.select(id_col, "rare_ppm"), id_col
    )
    wo = Window.partitionBy(lang_col).orderBy("rare_ppm", id_col)
    wn = Window.partitionBy(lang_col)
    j = j.withColumn("__rn", F.row_number().over(wo)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    tier = F.least(F.expr("((__rn - 1) * 3) div __n"), F.lit(2))
    bucket = (
        F.when(tier == 0, F.lit("head"))
        .when(tier == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return j.select(
        F.col(id_col),
        F.col(lang_col),
        F.col("rare_ppm").cast("long").alias("rare_ppm"),
        bucket.alias("ppl_bucket"),
    )


def gate_drift(
    docs: DataFrame,
    bin_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distribution-drift audit of the quality gate: what did the filter
    do to the corpus's length distribution?  Per fixed-width token-length
    bin, the raw count, the count surviving :func:`quality_score`'s
    composite gate, and the integer-ppm share of each population plus the
    ppm delta — the training-data twin of a PSI/population-stability
    report, but transcendental-free (pure integer cross-multiplication,
    so every engine agrees to the last digit; a classic PSI's ln() term
    is float-parity-hostile for zero diagnostic gain here).

    A large negative ``delta_ppm`` on a bin means the gate is eating that
    length band (e.g. flag_short wiping bin 0); the |delta| sum over bins
    is 2,000,000x the total-variation distance between the raw and kept
    distributions.

    Scale shape: one map projection (token count + flags), one map-side-
    combined groupBy on the bin id, totals join back as a broadcast 1-row
    aggregate.  Nothing per-row shuffles except (bin, partial count).

    NULL texts are excluded up front (the module convention —
    chunk_documents, bm25_topk): Spark's size(split(NULL)) is -1, which
    would land a NULL-text doc in bin 0 while a SQL engine bins it NULL —
    filtering both twins identically keeps them agreeing by
    construction (r11 advice)."""
    docs = docs.filter(F.col(text_col).isNotNull())
    # quality_score's output id column is fixed at doc_id — rename the
    # caller's id through and back so a custom id_col works (r11 advice)
    q = quality_score(
        docs.select(F.col(id_col).alias("doc_id"), text_col),
        text_col=text_col,
    ).select(F.col("doc_id").alias(id_col), "quality_pass")
    b = (
        docs.select(F.col(id_col), F.size(tokens(text_col)).cast("long").alias("__nt"))
        .join(q, id_col)
        .select(F.expr(f"__nt div {int(bin_tokens)}").alias("bin"), "quality_pass")
    )
    agg = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum(F.when(F.col("quality_pass"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
    )
    tot = agg.agg(
        F.sum("n_raw").cast("long").alias("__t_raw"),
        F.sum("n_kept").cast("long").alias("__t_kept"),
    )
    j = agg.crossJoin(F.broadcast(tot))
    raw_ppm = F.expr("n_raw * 1000000 div __t_raw")
    kept_ppm = F.expr(
        "CASE WHEN __t_kept > 0 THEN n_kept * 1000000 div __t_kept ELSE 0 END"
    )
    return j.select(
        "bin",
        "n_raw",
        "n_kept",
        raw_ppm.cast("long").alias("raw_ppm"),
        kept_ppm.cast("long").alias("kept_ppm"),
        (kept_ppm - raw_ppm).cast("long").alias("delta_ppm"),
    )
