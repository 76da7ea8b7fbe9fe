"""Driver-checkable queries for corpus-analytics operators: text
normalization, per-source curation reporting, KMV and Bloom sketches,
semi-structured (JSON) event processing, chunking and chunk-level
boilerplate detection, keyed upsert merge, quantile-calibrated trimming,
vocabulary spectra, language-ID evaluation, z-score screening, snapshot
diffing, and integer-bin reporting views.

Same oracle-parity rules as :mod:`pyfads.llm_queries`: md5-based shared
hashing, integer sums + one exact final division instead of double ``avg``
(bit-deterministic under any partitioning), Java/RE2 common-subset regexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyfads import semistruct as J
from pyfads import sketches as K
from pyfads import text as X
from pyfads.io import epoch_ms, read_table, spread
from pyfads.queries import query

# NOTE: oracles needing pyfads.llm_queries constants (_QUALITY_SQL, _h60)
# import them lazily inside their builder functions — this module is
# registered by pyfads.queries' import loop, which can run while
# llm_queries is still mid-initialization (e.g. when a test imports
# llm_queries first), so a top-level from-import would be circular.


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(read_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Text normalization (C4-style canonical form)
# --------------------------------------------------------------------------

_NORMALIZE_SQL = r"""
WITH n AS (
  SELECT doc_id, length(text) AS raw_len,
         lower(trim(regexp_replace(
             regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
             '\s+', ' ', 'g'))) AS text_norm
  FROM documents
)
SELECT doc_id,
       CAST(raw_len AS BIGINT) AS n_chars_raw,
       text_norm,
       CAST(length(text_norm) AS BIGINT) AS n_chars_norm,
       md5(text_norm) AS norm_md5
FROM n
"""


@query("normalize_docs", oracle=_NORMALIZE_SQL)
def normalize_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control-strip + whitespace-collapse + lowercase normalization
    (per-row regexp chain, zero shuffles)."""
    return X.normalize_text(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# Per-source curation report
# --------------------------------------------------------------------------

def _source_quality_sql() -> str:
    from pyfads.llm_queries import _QUALITY_SQL

    return f"""
WITH q AS ({_QUALITY_SQL}),
j AS (SELECT d.source, q.* FROM q JOIN documents d USING (doc_id)),
a AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(quality_pass AS INT)) AS BIGINT) AS n_pass,
         CAST(sum(n_flags) AS BIGINT) AS total_flags,
         CAST(sum(CAST(flag_short AS INT)) AS BIGINT) AS n_flag_short,
         CAST(sum(CAST(flag_token_len AS INT)) AS BIGINT) AS n_flag_token_len,
         CAST(sum(CAST(flag_punct AS INT)) AS BIGINT) AS n_flag_punct,
         CAST(sum(CAST(flag_stop AS INT)) AS BIGINT) AS n_flag_stop,
         CAST(sum(CAST(flag_repeat AS INT)) AS BIGINT) AS n_flag_repeat
  FROM j GROUP BY source
)
SELECT source, n_docs, n_pass,
       CAST(n_pass AS DOUBLE) / n_docs AS pass_rate,
       total_flags,
       CAST(total_flags AS DOUBLE) / n_docs AS mean_flags,
       n_flag_short, n_flag_token_len, n_flag_punct, n_flag_stop, n_flag_repeat
FROM a
"""


@query("source_quality", oracle=_source_quality_sql)
def source_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source pass rates + per-flag totals (one map-side-combined agg
    on the low-cardinality source key)."""
    return X.source_quality(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# KMV distinct-count sketch
# --------------------------------------------------------------------------

_KMV_K = 128
_KMV_SEED = "kmv"
_HASH_SPACE_LIT = "1152921504606846976.0"  # 2^60 — md5_hash60's range


def _kmv_sql(k: int = _KMV_K, seed: str = _KMV_SEED) -> str:
    from pyfads.llm_queries import _h60

    h = _h60(seed, "tok")
    return f"""
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
hashes AS (
  SELECT DISTINCT lang, {h} AS h FROM toks
),
ranked AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM hashes
),
kept AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, CAST(max(h) AS BIGINT) AS kth_hash
  FROM ranked WHERE rn <= {k} GROUP BY lang
),
exact AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_exact FROM hashes GROUP BY lang
)
SELECT e.lang, n_exact, n_kept, kth_hash,
       CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
            ELSE {float(k - 1)} / (CAST(kth_hash AS DOUBLE) / {_HASH_SPACE_LIT})
       END AS kmv_estimate
FROM exact e JOIN kept USING (lang)
"""


@query("sketch_kmv_distinct", oracle=_kmv_sql)
def sketch_kmv_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-token cardinality: exact count + KMV estimate
    (WindowGroupLimit keeps only per-task top-k ahead of the shuffle)."""
    return K.kmv_distinct_tokens(_docs(spark, sf_dir), k=_KMV_K, seed=_KMV_SEED)


# --------------------------------------------------------------------------
# Semi-structured JSON event attributes
# --------------------------------------------------------------------------

_JSON_PROPS_SQL = """
WITH p AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
  FROM events
),
a AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN prop_k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
         CAST(min(prop_k) AS BIGINT) AS min_k,
         CAST(max(prop_k) AS BIGINT) AS max_k,
         CAST(sum(prop_k) AS BIGINT) AS sum_k,
         CAST(count(DISTINCT prop_k) AS BIGINT) AS n_distinct_k
  FROM p GROUP BY event_type
)
SELECT *, CAST(sum_k AS DOUBLE) / CAST(n_events - n_null_k AS DOUBLE) AS mean_k
FROM a
"""


@query("json_props_agg", oracle=_JSON_PROPS_SQL)
def json_props_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json extraction (PERMISSIVE, struct-pruned) + per-event_type
    rollup with an exact integer-sum mean."""
    return J.props_rollup(read_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Relational analytics: star-schema revenue rollup (broadcast dims)
# --------------------------------------------------------------------------

_REVENUE_SQL = """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_micros
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND o_orderstatus = 'F'
GROUP BY n_name
"""


@query("revenue_by_nation", oracle=_REVENUE_SQL)
def revenue_by_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-flavored star rollup: lineitem→orders→customer fact chain
    with nation/region dims — the relational-join strategy showcase.

    Join plan at 100 TB: nation (25 rows) and region (5 rows) are pinned
    broadcast; the region filter then prunes customers *before* the fact
    joins (Catalyst pushes the semi-filtering dim chain down), and the
    orders/lineitem equi-join shuffles on the order key (or goes
    shuffle-free if both sides are bucketed on it — pyfads.io.
    write_bucketed).  Revenue is an exact integer micro-unit sum
    (cents x basis points), order-independent under any partitioning —
    the bit-deterministic form of sum(price * (1 - discount))."""
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = read_table(spark, sf_dir, "customer")
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    bp = F.round(F.col("l_discount") * 10000).cast("long")
    return (
        li.withColumn("__rev", cents * (F.lit(10000) - bp))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum("__rev").cast("long").alias("revenue_micros"),
        )
    )


# --------------------------------------------------------------------------
# Bloom-filter membership: portable build (bit_or words) + probe
# --------------------------------------------------------------------------

_BLOOM_WORDS = 1024
_BLOOM_K = 4
_BLOOM_SEED = "bloom"
_BLOOM_MBITS = _BLOOM_WORDS * 63  # 63 usable bits per BIGINT word


def _bloom_sql() -> str:
    from pyfads.llm_queries import _h60

    def pos(j: int) -> str:
        h = _h60(f"{_BLOOM_SEED}{j}", "tok")
        return (
            f"SELECT tok, (({h}) % {_BLOOM_MBITS}) // 63 AS word_idx,"
            f" 1::BIGINT << ((({h}) % {_BLOOM_MBITS}) % 63)::INT AS mask"
        )

    cpos = " UNION ALL ".join(f"{pos(j)} FROM corpus" for j in range(_BLOOM_K))
    ppos = " UNION ALL ".join(f"{pos(j)} FROM probe" for j in range(_BLOOM_K))
    return f"""
WITH corpus AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id % 10 <> 0
),
probe AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id % 10 = 0
),
words AS (
  SELECT word_idx, bit_or(mask) AS word FROM ({cpos}) GROUP BY word_idx
),
probed AS (
  SELECT tok, bool_and(coalesce((word & mask) <> 0, FALSE)) AS maybe
  FROM ({ppos}) p LEFT JOIN words USING (word_idx)
  GROUP BY tok
)
SELECT tok, maybe, (tok IN (SELECT tok FROM corpus)) AS present
FROM probed
"""


@query("sketch_bloom_contains", oracle=_bloom_sql)
def sketch_bloom_contains_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership gate: build a portable 64512-bit filter over
    the held-in corpus token set (doc_id % 10 != 0), probe the held-out
    tokens, and report per-token ``maybe`` (filter verdict) next to
    ``present`` (exact ground truth) — every present token MUST be maybe
    (no false negatives, which the exact-hash oracle proves), and the
    maybe-but-absent surplus is the measured false-positive set.

    100 TB role: the cheap pre-join membership gate — e.g. drop the ~99%
    of crawl n-grams that cannot be benchmark contamination before the
    exact equi-join (pyfads.pipeline.contamination).  Build is one
    map-side-combined bit_or agg to <= 1024 BIGINT rows; probe broadcasts
    those 8 KB and never shuffles the probe stream."""
    from pyfads.sketches import bloom_build, bloom_probe
    from pyfads.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    corpus = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .select(F.explode(tokens("text")).alias("tok"))
        .distinct()
    )
    probe = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(F.explode(tokens("text")).alias("tok"))
        .distinct()
    )
    bloom = bloom_build(corpus, "tok", _BLOOM_WORDS, _BLOOM_K, _BLOOM_SEED)
    probed = bloom_probe(bloom, probe, "tok", _BLOOM_WORDS, _BLOOM_K, _BLOOM_SEED)
    present = corpus.withColumn("present", F.lit(True))
    return probed.join(present, "tok", "left").select(
        "tok", "maybe", F.coalesce("present", F.lit(False)).alias("present")
    )


# --------------------------------------------------------------------------
# Overlapping token-window chunking
# --------------------------------------------------------------------------

_CHUNK, _STRIDE = 64, 48

_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST(start // {_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(toks[start + 1 : start + {_CHUNK}]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[start + 1 : start + {_CHUNK}], ' ') AS chunk_text
FROM s
"""


@query("chunk_documents", oracle=_CHUNK_SQL)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks every 48 tokens (16-token overlap) over every
    document — map-only array ops, no shuffle, no Python."""
    return X.chunk_documents(_docs(spark, sf_dir), _CHUNK, _STRIDE)


# --------------------------------------------------------------------------
# Keyed upsert merge (latest-wins MERGE view)
# --------------------------------------------------------------------------

_UPSERT_SQL = """
WITH existing AS (
  SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(1 AS BIGINT) AS version, 0 AS __src
  FROM documents
),
batch AS (
  SELECT doc_id, 'refresh' AS source, lang, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(2 AS BIGINT) AS version, 1 AS __src
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 1000000, source, lang, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(1 AS BIGINT) AS version, 1 AS __src
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 'conflict' AS source, lang, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(1 AS BIGINT) AS version, 1 AS __src
  FROM documents WHERE doc_id % 3 = 0
),
u AS (SELECT * FROM existing UNION ALL SELECT * FROM batch),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY version DESC, __src DESC) AS __rn
  FROM u
)
SELECT doc_id, source, lang, n_chars, version FROM r WHERE __rn = 1
"""


@query("corpus_upsert", oracle=_UPSERT_SQL)
def corpus_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins keyed MERGE view (pyfads.io.merge_latest): refresh rows
    at version 2 replace their keys, brand-new keys insert, and an
    equal-version conflict batch proves the batch-wins tie-break.  This is
    the logical half of io.upsert_partitioned, whose physical half
    (selective partition rewrite) is exercised in tests/test_upsert.py."""
    from pyfads.io import merge_latest

    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(1).cast("long").alias("version"),
    )
    batch = (
        base.filter(F.col("doc_id") % 5 == 0)
        .withColumn("source", F.lit("refresh"))
        .withColumn("version", F.lit(2).cast("long"))
        .unionByName(
            base.filter(F.col("doc_id") % 7 == 0).withColumn(
                "doc_id", F.col("doc_id") + 1000000
            )
        )
        .unionByName(
            base.filter(F.col("doc_id") % 3 == 0).withColumn(
                "source", F.lit("conflict")
            )
        )
    )
    return merge_latest(base, batch, "doc_id", "version")


# --------------------------------------------------------------------------
# Quantile-calibrated per-stratum selection
# --------------------------------------------------------------------------

_QSELECT_SQL = """
WITH m AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
thr AS (
  SELECT lang, quantile_cont(n_tokens, 0.3) AS lo_thr,
               quantile_cont(n_tokens, 0.99) AS hi_thr
  FROM m GROUP BY lang
)
SELECT doc_id, lang, n_tokens, lo_thr, hi_thr
FROM m JOIN thr USING (lang)
WHERE n_tokens >= lo_thr AND n_tokens <= hi_thr
"""


@query("quantile_select", oracle=_QSELECT_SQL)
def quantile_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep docs inside their language's [P30, P99] token-count band —
    data-calibrated trim thresholds from one tiny aggregate, broadcast
    back; the corpus itself never shuffles."""
    from pyfads.pipeline import select_by_stratum_quantile

    return select_by_stratum_quantile(read_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Vocabulary frequency spectrum (Zipf report)
# --------------------------------------------------------------------------

_SPECTRUM_SQL = """
WITH tf AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY lang, tok
)
SELECT lang, freq, CAST(count(*) AS BIGINT) AS n_types
FROM tf GROUP BY lang, freq
"""


@query("vocab_spectrum", oracle=_SPECTRUM_SQL)
def vocab_spectrum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequencies per language (the Zipf/Heaps diagnostic a
    tokenizer-training run reads): two map-side-combined aggregates —
    (lang, token) counts, then (lang, freq) type counts.  Output is
    O(distinct frequencies) ~ O(sqrt(corpus)) rows."""
    docs = _docs(spark, sf_dir)
    tf = (
        docs.select(F.col("lang"), F.explode(X.tokens("text")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return tf.groupBy("lang", "freq").agg(
        F.count(F.lit(1)).cast("long").alias("n_types")
    )


# --------------------------------------------------------------------------
# Chunk-level duplication: per-doc boilerplate fraction
# --------------------------------------------------------------------------

_CHUNK_DUP_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS start
  FROM t
),
c AS (
  SELECT doc_id,
         md5(array_to_string(toks[start + 1 : start + {_CHUNK}], ' ')) AS chunk_md5
  FROM s
),
freq AS (
  SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_occurrences FROM c GROUP BY chunk_md5
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN n_occurrences > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_chunks,
       CAST(sum(CASE WHEN n_occurrences > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS dup_frac
FROM c JOIN freq USING (chunk_md5)
GROUP BY doc_id
"""


@query("chunk_dup_fraction", oracle=_CHUNK_DUP_SQL)
def chunk_dup_fraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: chunk every doc (chunk_documents), count how
    often each chunk text recurs corpus-wide (one agg on the 16-byte
    chunk md5 — never the text), and report each doc's duplicated-chunk
    fraction.  Template-heavy docs surface with dup_frac near 1.

    100 TB shape: chunking is map-only; the occurrence count and the
    per-doc rollup are two map-side-combined aggregates on bounded keys.
    The md5 projection drops chunk_text before any shuffle, so the wide
    strings never leave their scan tasks."""
    chunks = X.chunk_documents(_docs(spark, sf_dir), _CHUNK, _STRIDE).select(
        "doc_id", F.md5("chunk_text").alias("chunk_md5")
    )
    freq = chunks.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    dup = (F.col("n_occurrences") > 1).cast("int")
    return (
        chunks.join(freq, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(dup).cast("long").alias("n_dup_chunks"),
            (F.sum(dup).cast("double") / F.count(F.lit(1))).alias("dup_frac"),
        )
    )


# --------------------------------------------------------------------------
# Exact-k per-stratum sampling
# --------------------------------------------------------------------------

def _exact_k_sql() -> str:
    from pyfads.llm_queries import _h60

    h = _h60("exk", "CAST(doc_id AS VARCHAR)")
    return f"""
WITH m AS (
  SELECT doc_id, lang, {h} AS sample_hash FROM documents
)
SELECT doc_id, lang, sample_hash,
       CAST(rn AS BIGINT) AS sample_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY sample_hash, doc_id) AS rn
  FROM m
)
WHERE rn <= 40
"""


@query("sample_exact_k", oracle=_exact_k_sql)
def sample_exact_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 40 docs per language by stable hash order
    (WindowGroupLimit: per-task top-k ahead of the shuffle)."""
    from pyfads.pipeline import sample_exact_k

    return sample_exact_k(read_table(spark, sf_dir, "documents"), k=40)


_PRIO_K = 200


def _priority_sql(k: int = _PRIO_K) -> str:
    from pyfads.llm_queries import _h60

    h = _h60("prio", "CAST(doc_id AS VARCHAR)")
    # float chain mirrors pyfads.pipeline.sample_priority_k EXACTLY:
    # u = h/2^60 first, THEN w/u (w*2^60/h rounds differently)
    return f"""
WITH base AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         CAST(n_chars AS DOUBLE)
           / (CAST({h} AS DOUBLE) / 1152921504606846976.0) AS priority
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
),
top AS (SELECT * FROM base ORDER BY priority DESC, doc_id LIMIT {k + 1}),
tau AS (
  SELECT CASE WHEN count(*) <= {k} THEN 0.0::DOUBLE
         ELSE min(priority) END AS tau
  FROM top
),
samp AS (SELECT * FROM top ORDER BY priority DESC, doc_id LIMIT {k})
SELECT doc_id, weight, priority, greatest(weight, tau.tau) AS est_weight
FROM samp, tau
"""


_PRIO_STRAT_K = 40


def _priority_strat_sql(k: int = _PRIO_STRAT_K) -> str:
    from pyfads.llm_queries import _h60

    h = _h60("prio", "CAST(doc_id AS VARCHAR)")
    return f"""
WITH base AS (
  SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS weight,
         CAST(n_chars AS DOUBLE)
           / (CAST({h} AS DOUBLE) / 1152921504606846976.0) AS priority
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY priority DESC, doc_id) AS rn
  FROM base
),
tau AS (SELECT lang, priority AS tau FROM r WHERE rn = {k + 1})
SELECT r.lang, r.doc_id, r.weight, r.priority,
       greatest(r.weight, coalesce(tau.tau, CAST('0.0' AS DOUBLE)))
         AS est_weight
FROM r LEFT JOIN tau USING (lang)
WHERE r.rn <= {k}
"""


@query("sample_priority_strat", oracle=_priority_strat_sql)
def sample_priority_strat_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language priority sampling (40 docs each, per-stratum tau):
    the DLT estimator stratified — WindowGroupLimit per-task cut,
    broadcast per-stratum tau frame."""
    from pyfads.pipeline import sample_priority_stratified

    return sample_priority_stratified(
        read_table(spark, sf_dir, "documents"), k=_PRIO_STRAT_K
    )


@query("sample_priority", oracle=_priority_sql)
def sample_priority_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): 200 docs weighted by
    n_chars with unbiased subset-sum estimator weights max(w, tau).
    TakeOrdered top-(k+1), broadcast 1-row tau — O(k) rows move."""
    from pyfads.pipeline import sample_priority_k

    return sample_priority_k(read_table(spark, sf_dir, "documents"), k=_PRIO_K)


# --------------------------------------------------------------------------
# Language-ID confusion matrix (prediction quality report)
# --------------------------------------------------------------------------

def _lang_confusion_sql() -> str:
    from pyfads.llm_queries import _lang_sql

    return f"""
WITH pred AS ({_lang_sql()})
SELECT d.lang AS lang_true, p.lang_pred,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY d.lang, p.lang_pred
"""


@query("lang_confusion", oracle=_lang_confusion_sql)
def lang_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-quality report: labeled language vs lang_id prediction,
    counted per (true, predicted) cell — the confusion matrix a curation
    run publishes before trusting a heuristic filter.  One equi-join on
    doc_id + one map-side-combined agg to |langs|^2 rows."""
    docs = _docs(spark, sf_dir)
    pred = X.lang_id(docs).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id", F.col("lang").alias("lang_true"))
        .join(pred, "doc_id")
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Per-type z-score anomaly flags (integer-moment arithmetic)
# --------------------------------------------------------------------------

_ZSCORE_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v_cents) AS BIGINT) AS s,
         CAST(sum(v_cents * v_cents) AS BIGINT) AS q
  FROM c GROUP BY event_type
)
SELECT event_id, c.event_type, v_cents,
       (CAST(v_cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS zscore,
       abs((CAST(v_cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))) > 3.0 AS is_outlier
FROM c JOIN m USING (event_type)
"""


@query("value_zscore", oracle=_ZSCORE_SQL)
def value_zscore_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event z-score against its event_type's population moments, with
    a |z| > 3 outlier flag — the anomaly-screening pass over a metric feed.

    Determinism: value is exact cents, so n/sum/sum-of-squares are exact
    BIGINTs under any partitioning; z is a fixed expression over those
    three ints (divisions and one IEEE sqrt — both engines correctly
    rounded).  One map-side-combined moments agg (5 rows) broadcast back;
    the event stream never shuffles."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    m = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_cents").cast("long").alias("s"),
        F.sum(F.col("v_cents") * F.col("v_cents")).cast("long").alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = F.col("q").cast("double") / F.col("n").cast("double") - mean * mean
    z = (F.col("v_cents").cast("double") - mean) / F.sqrt(var)
    return c.join(F.broadcast(m), "event_type").select(
        "event_id", "event_type", "v_cents",
        z.alias("zscore"),
        (F.abs(z) > 3.0).alias("is_outlier"),
    )


# --------------------------------------------------------------------------
# Snapshot reconciliation: diff two corpus versions
# --------------------------------------------------------------------------

_DIFF_SQL = """
WITH old AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 4 <> 0
),
new AS (
  SELECT doc_id, md5(CASE WHEN doc_id % 6 = 0 THEN text || ' v2' ELSE text END) AS h
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.doc_id IS NULL THEN 'added'
            WHEN new.doc_id IS NULL THEN 'removed'
            WHEN old.h <> new.h THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new USING (doc_id)
"""


@query("corpus_diff", oracle=_DIFF_SQL)
def corpus_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation between two corpus versions: full outer
    join on the key comparing 16-byte content hashes — added / removed /
    changed / unchanged per doc, the audit step before promoting a
    refreshed corpus.  (Fixture: 'old' = ids not %4, 'new' = ids not %5
    with every %6 doc's text edited.)

    100 TB shape: both sides reduce to (id, md5) before the join — the
    text never shuffles; one key-partitioned full outer join, shuffle-free
    when both snapshots are bucketed on the id."""
    docs = read_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 4 != 0).select(
        "doc_id", F.md5("text").alias("h_old")
    )
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 6 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("h_new"),
    )
    status = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
        .otherwise("unchanged")
    )
    return old.join(new, "doc_id", "full_outer").select(
        "doc_id", status.alias("status")
    )


# --------------------------------------------------------------------------
# Length histogram + event-rate report (integer-bin observability views)
# --------------------------------------------------------------------------

_LEN_HIST_SQL = """
SELECT source,
       CAST(len(string_split(text, ' ')) // 16 AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
       CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM documents
GROUP BY source, len(string_split(text, ' ')) // 16
"""


@query("length_histogram", oracle=_LEN_HIST_SQL)
def length_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (16-token) doc-length histogram per source — integer
    bin ids (`div`, never float division), one map-side-combined agg."""
    docs = read_table(spark, sf_dir, "documents")
    n_tok = F.size(X.tokens("text")).cast("long")
    return (
        docs.select("source", n_tok.alias("__nt"))
        .withColumn("bin", F.expr("__nt div 16"))
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("__nt").cast("long").alias("min_tokens"),
            F.max("__nt").cast("long").alias("max_tokens"),
        )
    )


_EVENT_RATE_SQL = """
WITH h AS (
  SELECT event_type, CAST(epoch_ms(ts) // 3600000 AS BIGINT) AS hour_bin
  FROM events
),
rate AS (
  SELECT event_type, hour_bin, CAST(count(*) AS BIGINT) AS n_events
  FROM h GROUP BY event_type, hour_bin
)
SELECT event_type, hour_bin, n_events,
       CAST(row_number() OVER (PARTITION BY event_type
                               ORDER BY n_events DESC, hour_bin) AS BIGINT) AS peak_rank
FROM rate
"""


@query("event_rate_report", oracle=_EVENT_RATE_SQL)
def event_rate_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-rate matrix per type with peak-hour ranking — the
    ingest-observability view behind alerting; integer hour bins, one
    agg + one per-type window (WindowGroupLimit-eligible if filtered)."""
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    # integer div, not double `/`: mirror the oracle's BIGINT floor-div
    h = ev.select("event_type", epoch_ms(ev, "ts").alias("__ms")).select(
        "event_type", F.expr("__ms div 3600000").alias("hour_bin")
    )
    rate = h.groupBy("event_type", "hour_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    w = W.partitionBy("event_type").orderBy(F.desc("n_events"), "hour_bin")
    return rate.withColumn(
        "peak_rank", F.row_number().over(w).cast("long")
    )


# --------------------------------------------------------------------------
# Per-user activity profile
# --------------------------------------------------------------------------

_USER_PROFILE_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(epoch_ms(ts)) AS BIGINT) AS first_ms,
       CAST(max(epoch_ms(ts)) AS BIGINT) AS last_ms,
       CAST(max(epoch_ms(ts)) - min(epoch_ms(ts)) AS BIGINT) AS span_ms,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
"""


@query("user_profile", oracle=_USER_PROFILE_SQL)
def user_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile (counts, first/last/span, distinct
    types, exact value sum) — the feature row a personalization or abuse
    pipeline derives per entity.  One map-side-combined agg keyed on the
    user; the distinct-type count rewrites to the standard two-phase
    Expand internally."""
    ev = read_table(spark, sf_dir, "events")
    ms = epoch_ms(ev, "ts")
    return ev.select(
        "user_id", ms.alias("__ms"), "event_type",
        F.round(F.col("value") * 100).cast("long").alias("__vc"),
    ).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("__ms").cast("long").alias("first_ms"),
        F.max("__ms").cast("long").alias("last_ms"),
        (F.max("__ms") - F.min("__ms")).cast("long").alias("span_ms"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.sum("__vc").cast("long").alias("value_cents"),
    )


# --------------------------------------------------------------------------
# BM25 retrieval (text.bm25_topk) — the oracle SQL is generated from the
# same term list / constants so every double literal and every operation in
# the scoring chain matches the Spark expression exactly (repr-printed
# literals parse to the same binary64 in both engines; all ops are
# correctly-rounded IEEE, so the fixed-order chain is bit-identical).
# --------------------------------------------------------------------------

_BM25_TERMS = ["join", "dup", "vector", "window"]
_BM25_K = 20
_BM25_K1 = 1.2
_BM25_B = 0.75


# One SQL builder for the BM25 scoring chain, shared by _bm25_sql,
# _bm25_batch_sql and _hybrid_rrf_sql (code-review r12: three inline
# copies could silently desynchronize an oracle from text.bm25_topk).
def _bm25_tf_cols(terms: "list[str]") -> str:
    return ",\n         ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )


def _bm25_df_cols(n_terms: int) -> str:
    return ",\n         ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(n_terms)
    )


def _bm25_term_score(i: int, k1: float, b: float) -> str:
    half = "'0.5'::DOUBLE"
    idf = f"((n_docs - df{i} + {half}) / (df{i} + {half}))"
    denom = (
        f"(tf{i} + ('{k1!r}'::DOUBLE * (('{1.0!r}'::DOUBLE - '{b!r}'::DOUBLE)"
        f" + (('{b!r}'::DOUBLE * (dl * n_docs)) / sum_dl))))"
    )
    return f"({idf} * ((tf{i} * '{k1 + 1.0!r}'::DOUBLE) / {denom}))"


def _bm25_score_chain(idxs: "list[int]", k1: float, b: float) -> str:
    score = _bm25_term_score(idxs[0], k1, b)
    for i in idxs[1:]:
        score = f"({score} + {_bm25_term_score(i, k1, b)})"
    return score


def _bm25_sql() -> str:
    tf_cols = _bm25_tf_cols(_BM25_TERMS)
    df_cols = _bm25_df_cols(len(_BM25_TERMS))
    score = _bm25_score_chain(list(range(len(_BM25_TERMS))), _BM25_K1, _BM25_B)
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE text IS NOT NULL)
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM base
)
SELECT doc_id,
       CAST(round({score} * '1000000.0'::DOUBLE) AS BIGINT) AS score_micros
FROM base CROSS JOIN stats
ORDER BY score_micros DESC, doc_id
LIMIT {_BM25_K}
"""


_BM25_QUERIES = {
    "q_dup": ["dup", "vector"],
    "q_join": ["join", "window"],
    "q_mix": ["join", "dup", "vector"],
}
_BM25_BATCH_K = 10


def _bm25_batch_sql() -> str:
    k1, b = _BM25_K1, _BM25_B
    all_terms = sorted({t for ts in _BM25_QUERIES.values() for t in ts})
    t_idx = {t: i for i, t in enumerate(all_terms)}
    tf_cols = _bm25_tf_cols(all_terms)
    df_cols = _bm25_df_cols(len(all_terms))

    blocks = []
    for qid, ts in sorted(_BM25_QUERIES.items()):
        score = _bm25_score_chain([t_idx[t] for t in ts], k1, b)
        blocks.append(
            f"""SELECT '{qid}' AS query_id, doc_id,
       CAST(round({score} * '1000000.0'::DOUBLE) AS BIGINT) AS score_micros
FROM base CROSS JOIN stats
ORDER BY score_micros DESC, doc_id
LIMIT {_BM25_BATCH_K}"""
        )
    union = "\nUNION ALL\n".join(f"({blk})" for blk in blocks)
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE text IS NOT NULL)
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM base
),
u AS ({union})
SELECT query_id, doc_id, score_micros,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score_micros DESC, doc_id)
            AS BIGINT) AS rank
FROM u
"""


@query("bm25_batch", oracle=_bm25_batch_sql())
def bm25_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch BM25: three queries scored in ONE corpus scan (union-term tf
    projection + bounded literal fanout + WindowGroupLimit per-query
    top-10) — the workload-serving shape vs bm25_topk's single ad-hoc
    query.  See :func:`pyfads.text.bm25_batch`."""
    return X.bm25_batch(_docs(spark, sf_dir), _BM25_QUERIES, k=_BM25_BATCH_K)


_HYBRID_POOL = 50
_HYBRID_K = 10
_HYBRID_KRRF = 60
_HYBRID_DIM = 64
_HYBRID_SEED = "emb"


def _hybrid_rrf_sql() -> str:
    """DuckDB twin of text.hybrid_rrf: the BM25 chain (same construction
    as _bm25_sql, ranked to the pool), the dense side over the golden
    doc-embedding parquet (integer-valued doubles — exact round trip) with
    the SAME literal query vector, and the RRF fusion in micro-quantized
    integers.  Lazy builder: materializing the golden embeddings needs the
    oracle sf dir."""
    import math
    from functools import reduce

    from pyfads import golden as G
    from pyfads.text import doc_embed_hash_py

    path, _ids, _m = G._doc_embed_golden(
        G.oracle_sf_dir(), _HYBRID_DIM, _HYBRID_SEED
    )
    qv = doc_embed_hash_py(" ".join(_BM25_TERMS), _HYBRID_DIM, _HYBRID_SEED)
    qn = math.sqrt(reduce(lambda a, x: a + x, [c * c for c in qv]))

    tf_cols = _bm25_tf_cols(_BM25_TERMS)
    df_cols = _bm25_df_cols(len(_BM25_TERMS))
    score = _bm25_score_chain(list(range(len(_BM25_TERMS))), _BM25_K1, _BM25_B)

    dot = " + ".join(
        f"embedding[{i + 1}] * '{float(qv[i])!r}'::DOUBLE" for i in range(_HYBRID_DIM)
    )
    sq = " + ".join(
        f"embedding[{i + 1}] * embedding[{i + 1}]" for i in range(_HYBRID_DIM)
    )

    def contrib(rank: str) -> str:
        return (
            f"COALESCE(CAST(round('1000000.0'::DOUBLE / ({_HYBRID_KRRF} + {rank}))"
            f" AS BIGINT), 0)"
        )

    return f"""
WITH base AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE text IS NOT NULL)
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM base
),
lex AS (
  SELECT doc_id, rank_lex FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY score_micros DESC, doc_id) AS BIGINT)
             AS rank_lex
    FROM (SELECT doc_id,
                 CAST(round({score} * '1000000.0'::DOUBLE) AS BIGINT) AS score_micros
          FROM base CROSS JOIN stats))
  WHERE rank_lex <= {_HYBRID_POOL}
),
dense AS (
  SELECT doc_id, rank_dense FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT)
             AS rank_dense
    FROM (SELECT vec_id AS doc_id,
                 ({dot}) / (sqrt({sq}) * '{qn!r}'::DOUBLE) AS cos
          FROM read_parquet('{path}')))
  WHERE rank_dense <= {_HYBRID_POOL}
),
fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.rank_lex, d.rank_dense,
         {contrib('l.rank_lex')} + {contrib('d.rank_dense')} AS rrf_micros
  FROM lex l FULL JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, rank_lex, rank_dense, rrf_micros, rank FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY rrf_micros DESC, doc_id) AS BIGINT)
              AS rank
  FROM fused)
WHERE rank <= {_HYBRID_K}
"""


@query("retrieval_hybrid_rrf", oracle=_hybrid_rrf_sql)
def retrieval_hybrid_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 and dense-cosine top-50 (hashing-trick
    doc embeddings vs the same query embedded identically) fused by
    Reciprocal Rank Fusion — the standard lexical+semantic serving stack
    (see pyfads.text.hybrid_rrf).  One corpus scan per side, two <=50-row
    rank frames, integer-micro RRF — the fusion itself is driver-scale
    work at any corpus size."""
    return X.hybrid_rrf(
        _docs(spark, sf_dir),
        _BM25_TERMS,
        dim=_HYBRID_DIM,
        seed=_HYBRID_SEED,
        pool=_HYBRID_POOL,
        k=_HYBRID_K,
        k_rrf=_HYBRID_KRRF,
        k1=_BM25_K1,
        b=_BM25_B,
    )


@query("bm25_topk", oracle=_bm25_sql())
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed query-term bag — the retrieval
    primitive a contamination check or RAG corpus audit runs.  One corpus
    scan (per-doc tf via array filters — nothing explodes), one single-row
    broadcast stats agg, one TakeOrdered; odds-form idf keeps the score a
    fixed chain of IEEE ops both engines reproduce bit-for-bit
    (see pyfads.text.bm25_topk)."""
    return X.bm25_topk(
        _docs(spark, sf_dir), _BM25_TERMS, k=_BM25_K, k1=_BM25_K1, b=_BM25_B
    )


# --------------------------------------------------------------------------
# Count-Min sketch (sketches.countmin_build/estimate) — integer-only, so
# the whole sketch and every estimate is bit-identical across engines.
# --------------------------------------------------------------------------

_CM_TERMS = ["join", "dup", "vector", "window", "zzz_absent"]
_CM_WIDTH = 1024
_CM_DEPTH = 4


def _countmin_sql() -> str:
    from pyfads.text import md5_hash60_sql as _h60

    pair_selects = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, {_h60(f'cm{j}', 't')} % {_CM_WIDTH} AS b FROM tok"
        for j in range(_CM_DEPTH)
    )
    term_rows = ",\n  ".join(f"('{t}')" for t in _CM_TERMS)
    probe_selects = "\nUNION ALL\n".join(
        f"SELECT term, {j} AS j, {_h60(f'cm{j}', 'term')} % {_CM_WIDTH} AS b FROM terms"
        for j in range(_CM_DEPTH)
    )
    return f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
terms(term) AS (VALUES
  {term_rows}
),
sketch AS (
  SELECT j, b, CAST(count(*) AS BIGINT) AS c FROM ({pair_selects}) GROUP BY j, b
),
probes AS (
  {probe_selects}
),
est AS (
  SELECT p.term, CAST(min(coalesce(s.c, 0)) AS BIGINT) AS cm_estimate
  FROM probes p LEFT JOIN sketch s USING (j, b)
  GROUP BY p.term
),
exact AS (
  SELECT t AS term, CAST(count(*) AS BIGINT) AS exact_count
  FROM tok WHERE t IN (SELECT term FROM terms) GROUP BY t
)
SELECT e.term, e.cm_estimate, coalesce(x.exact_count, 0) AS exact_count
FROM est e LEFT JOIN exact x USING (term)
"""


# (name, spark dtype, kind) — must mirror what Spark reports for the
# parquet read so the dtype literal column matches cross-engine
_PROFILE_ORDERS_SPEC = [
    ("o_orderkey", "bigint", "num"),
    ("o_custkey", "bigint", "num"),
    ("o_orderstatus", "string", "str"),
    ("o_totalprice", "double", "num"),
    ("o_orderdate", "timestamp_ntz", "ts"),
    ("o_orderpriority", "string", "str"),
]


def _profile_orders_sql() -> str:
    blocks = []
    for name, dtype, kind in _PROFILE_ORDERS_SPEC:
        if kind == "num":
            lo, hi = f"CAST(min({name}) AS DOUBLE)", f"CAST(max({name}) AS DOUBLE)"
            slo = shi = "NULL::VARCHAR"
        elif kind == "ts":
            lo = f"CAST(min(epoch_ms({name})) AS DOUBLE)"
            hi = f"CAST(max(epoch_ms({name})) AS DOUBLE)"
            slo = shi = "NULL::VARCHAR"
        else:
            lo = hi = "NULL::DOUBLE"
            slo, shi = f"min({name})", f"max({name})"
        blocks.append(
            f"""SELECT '{name}' AS column_name, '{dtype}' AS dtype,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({name}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
       {lo} AS min_num, {hi} AS max_num,
       {slo} AS min_str, {shi} AS max_str
FROM orders"""
        )
    return "\nUNION ALL\n".join(blocks)


@query("profile_orders", oracle=_profile_orders_sql)
def profile_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the orders table (nulls, exact
    distinct, typed min/max) — one scan, one aggregate, one row per
    column.  See :mod:`pyfads.profile` for the float-rendering and
    100 TB approx_count_distinct notes."""
    from pyfads.profile import profile_table

    return profile_table(read_table(spark, sf_dir, "orders"))


_GINI_SQL = """
WITH c AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang
),
a AS (
  SELECT source,
         CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_langs,
         CAST(sum(n * n) AS BIGINT) AS sum_sq
  FROM c GROUP BY source
)
SELECT source, n_docs, n_langs,
       CAST((n_docs * n_docs - sum_sq) * 1000000 // (n_docs * n_docs)
            AS BIGINT) AS gini_ppm
FROM a
"""


@query("source_lang_gini", oracle=_GINI_SQL)
def source_lang_gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-diversity report per source: Gini impurity
    1 - sum(p_lang^2), emitted in exact integer millionths
    ((tot^2 - sum(c^2)) * 1e6 div tot^2) — the diversity measure that
    needs no transcendental (unlike entropy), so it is bit-exact
    cross-engine.  Two map-side-combined aggregates; n_docs stays below
    2^20 per source at any test SF so tot^2 * 1e6 < 2^63 (at true scale,
    compute in DECIMAL or per-mille)."""
    docs = _docs(spark, sf_dir)
    c = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        c.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_sq"),
        )
        .select(
            "source",
            "n_docs",
            "n_langs",
            F.expr(
                "(n_docs * n_docs - sum_sq) * 1000000 div (n_docs * n_docs)"
            )
            .cast("long")
            .alias("gini_ppm"),
        )
    )


_INVIDX_SQL = """
WITH toks0 AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE text IS NOT NULL
),
toks AS (SELECT DISTINCT term, doc_id FROM toks0),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY term),
top AS (SELECT * FROM dfreq ORDER BY df DESC, term LIMIT 100),
r AS (
  SELECT t.term, t.doc_id,
         row_number() OVER (PARTITION BY t.term ORDER BY t.doc_id) AS rn
  FROM toks t JOIN top USING (term)
),
p AS (
  SELECT term,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings_csv
  FROM r WHERE rn <= 20 GROUP BY term
)
SELECT top.term, df, postings_csv, md5(postings_csv) AS postings_md5
FROM top JOIN p USING (term)
"""


@query("inverted_index", oracle=_INVIDX_SQL)
def inverted_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index (top-100 df terms, 20-doc posting
    prefix + md5 checksum).  The serve-many-queries complement to the
    scan-side bm25_topk; posting prefixes ride WindowGroupLimit so
    stop-word posting lists never shuffle whole."""
    return X.inverted_index(_docs(spark, sf_dir))


_THETA_K = 256
_SPACE_LIT = "1152921504606846976.0"  # 2^60


def _theta_sql(k: int = _THETA_K) -> str:
    from pyfads.llm_queries import _h60

    h = _h60("theta", "tok")
    side = lambda pred, name: f"""t{name} AS (
  SELECT DISTINCT {h} AS h
  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE {pred})
),
{name} AS (SELECT h FROM t{name} ORDER BY h LIMIT {k})"""
    return f"""
WITH {side("lang = 'en'", "a")},
{side("lang <> 'en'", "b")},
st AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
         (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
         (SELECT max(h) FROM a) AS kth_a,
         (SELECT max(h) FROM b) AS kth_b
),
th AS (
  SELECT n_a, n_b,
         least(CASE WHEN n_a < {k} THEN 1152921504606846976 ELSE kth_a END,
               CASE WHEN n_b < {k} THEN 1152921504606846976 ELSE kth_b END)
           AS theta
  FROM st
),
inter AS (
  SELECT CAST(count(*) AS BIGINT) AS n_common
  FROM a JOIN b USING (h), th WHERE a.h < th.theta
),
un AS (
  SELECT CAST(count(*) AS BIGINT) AS n_union
  FROM (SELECT h FROM a UNION SELECT h FROM b), th WHERE h < th.theta
),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_common
  FROM (
    SELECT DISTINCT tok FROM (SELECT unnest(string_split(text,' ')) AS tok
                              FROM documents WHERE lang = 'en')
    INTERSECT
    SELECT DISTINCT tok FROM (SELECT unnest(string_split(text,' ')) AS tok
                              FROM documents WHERE lang <> 'en')
  )
)
SELECT th.n_a, th.n_b, CAST(th.theta AS BIGINT) AS theta,
       inter.n_common, un.n_union,
       CAST(inter.n_common AS DOUBLE)
         / (CAST(th.theta AS DOUBLE) / {_SPACE_LIT}) AS intersection_est,
       CAST(un.n_union AS DOUBLE)
         / (CAST(th.theta AS DOUBLE) / {_SPACE_LIT}) AS union_est,
       ex.exact_common
FROM th, inter, un, ex
"""


@query("sketch_theta_setops", oracle=_theta_sql)
def sketch_theta_setops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set operations: estimate the distinct-token
    INTERSECTION and UNION cardinality between the en and non-en corpus
    slices from two 256-hash KMV sketches — the DataSketches-style answer
    to "how much vocabulary do these corpora share?" without an exact
    all-token join.  Exact intersection emitted alongside for the
    accuracy read.  See :func:`pyfads.sketches.theta_set_ops`."""
    docs = _docs(spark, sf_dir)
    a = K.kmv_hashes(docs.filter(F.col("lang") == "en"), k=_THETA_K)
    b = K.kmv_hashes(docs.filter(F.col("lang") != "en"), k=_THETA_K)
    est = K.theta_set_ops(a, b, k=_THETA_K)
    ta = (
        docs.filter(F.col("lang") == "en")
        .select(F.explode(X.tokens("text")).alias("tok"))
        .distinct()
    )
    tb = (
        docs.filter(F.col("lang") != "en")
        .select(F.explode(X.tokens("text")).alias("tok"))
        .distinct()
    )
    exact = ta.join(tb, "tok").agg(
        F.count(F.lit(1)).cast("long").alias("exact_common")
    )
    return est.crossJoin(exact)


_HLL_SEED = "hll"


def _hll_sql() -> str:
    from pyfads.llm_queries import _h60
    from pyfads.sketches import _HLL_P, _hll_consts

    m, wbits, maxrank, numerator = _hll_consts(_HLL_P)
    h = _h60(_HLL_SEED, "tok")
    return f"""
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
h AS (SELECT lang, {h} AS h FROM toks),
r AS (
  SELECT lang, CAST(h % {m} AS INT) AS bucket,
         CASE WHEN h // {m} = 0 THEN {maxrank}
              ELSE {maxrank} - length(bin(h // {m})) END AS rank
  FROM h
),
regs AS (SELECT lang, bucket, MAX(rank) AS register FROM r GROUP BY lang, bucket),
agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_registers_set,
         CAST(sum(register) AS BIGINT) AS register_sum,
         CAST(sum(1::BIGINT << ({maxrank} - register)) AS BIGINT) AS z_present
  FROM regs GROUP BY lang
),
exact AS (
  SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
  FROM toks GROUP BY lang
)
SELECT e.lang, n_exact, n_registers_set, register_sum,
       '{numerator!r}'::DOUBLE /
         CAST(z_present + ({m} - n_registers_set) * {1 << maxrank} AS DOUBLE)
         AS hll_estimate
FROM exact e JOIN agg USING (lang)
"""


@query("sketch_hll", oracle=_hll_sql)
def sketch_hll_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-token cardinality via the cross-engine
    HyperLogLog (m=256 registers over the shared md5 hash): exact count
    next to integer register checksums and the raw HLL estimate.  The
    registers are bit-identical in Spark and DuckDB, so the float
    estimate (one shared-literal divide) hash-matches to the ulp —
    engine-native HLLs (approx_count_distinct / approx_distinct) can't do
    this.  KMV (sketch_kmv_distinct) runs on the same token stream for a
    direct accuracy/cost comparison."""
    return K.hll_distinct_tokens(_docs(spark, sf_dir), seed=_HLL_SEED)


def _zorder_sql() -> str:
    from pyfads.layout import zorder_sql

    z = zorder_sql("user_id", "round(value * 100)")
    return f"""
WITH z AS (
  SELECT {z} AS zk, CAST(user_id AS BIGINT) AS a,
         CAST(round(value * 100) AS BIGINT) AS b
  FROM events
)
SELECT CAST(zk // {1 << 24} AS BIGINT) AS z_cell,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(a) AS BIGINT) AS a_lo, CAST(max(a) AS BIGINT) AS a_hi,
       CAST(min(b) AS BIGINT) AS b_lo, CAST(max(b) AS BIGINT) AS b_hi
FROM z GROUP BY 1
"""


@query("zorder_events", oracle=_zorder_sql)
def zorder_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order locality diagnostic over events (user_id x value-cents):
    per z-cell row counts and per-dimension bounds — the integer Morton
    key is bit-identical cross-engine, and narrow two-dimensional cell
    bounds are what make footer-stats pruning work after a z-sorted
    write.  See :mod:`pyfads.layout`."""
    from pyfads.layout import zorder_cell_stats

    ev = read_table(spark, sf_dir, "events")
    return zorder_cell_stats(
        ev, F.col("user_id"), F.round(F.col("value") * 100)
    )


def _hdr_ctes(qs: "tuple[int, ...]", strat: str = "event_type") -> str:
    """Shared HDR CTE chain (cents -> octave/sub-bucket histogram ->
    cumulative counts -> per-percentile boundary pick) ending in
    ``sel(event_type, q_pct, n_events, est_cents)`` — ONE copy of the
    bucket formulas, composed into both the quantile and the decile
    oracles (mirrors the _minhash_ctes pattern; keeps the two SQL twins
    of pyfads.sketches._hdr_bucket_cols from desynchronizing)."""
    q_list = ", ".join(str(q) for q in qs)
    return f"""v AS (
  SELECT {strat} AS event_type, CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
p AS (SELECT event_type, vc FROM v WHERE vc >= 1),
b AS (
  SELECT event_type,
         CASE WHEN vc < 32 THEN vc
              ELSE (length(bin(vc)) - 5) * 16
                   + vc // (1::BIGINT << (length(bin(vc)) - 5)) END AS bucket,
         CASE WHEN vc < 32 THEN vc
              ELSE (vc // (1::BIGINT << (length(bin(vc)) - 5)))
                   * (1::BIGINT << (length(bin(vc)) - 5)) END AS lower
  FROM p
),
hist AS (
  SELECT event_type, bucket, lower, CAST(count(*) AS BIGINT) AS cnt
  FROM b GROUP BY event_type, bucket, lower
),
c AS (
  SELECT *, CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket)
                 AS BIGINT) AS cum
  FROM hist
),
tot AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_events
  FROM hist GROUP BY event_type
),
qs AS (SELECT unnest([{q_list}]) AS q_pct),
sel AS (
  SELECT c.event_type, qs.q_pct, tot.n_events,
         CAST(min(c.lower) AS BIGINT) AS est_cents
  FROM c JOIN tot USING (event_type), qs
  WHERE c.cum >= (qs.q_pct * tot.n_events + 99) // 100
  GROUP BY c.event_type, qs.q_pct, tot.n_events
)"""


_HDR_SQL = f"""
WITH {_hdr_ctes((50, 90, 99))}
SELECT event_type, q_pct, n_events, est_cents,
       CAST(est_cents AS DOUBLE) / CAST('100.0' AS DOUBLE) AS est_value
FROM sel
"""


_HDR_DECILE_SQL = f"""
WITH {_hdr_ctes(tuple(range(10, 100, 10)))},
asg AS (
  SELECT p.event_type, p.vc,
         (SELECT count(*) FROM sel s
          WHERE s.event_type = p.event_type AND s.est_cents <= p.vc) AS bucket
  FROM p
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(vc) AS BIGINT) AS vc_lo, CAST(max(vc) AS BIGINT) AS vc_hi
FROM asg GROUP BY event_type, bucket
"""


@query("value_deciles", oracle=_HDR_DECILE_SQL)
def value_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization of events.value per event_type: decile
    bucket assignment from the HDR sketch's boundaries (integer-cent
    comparisons against a broadcast <=9-row boundary array) — the
    mergeable, order-independent QuantileDiscretizer.  See
    :func:`pyfads.sketches.hdr_discretize`."""
    return K.hdr_discretize(read_table(spark, sf_dir, "events"))


def _hdr_hourly_sql() -> str:
    strat = "concat(event_type, '#', CAST(epoch_ms(ts) // 3600000 AS VARCHAR))"
    return f"""
WITH {_hdr_ctes((50, 90), strat=strat)}
SELECT str_split(event_type, '#')[1] AS event_type,
       CAST(str_split(event_type, '#')[2] AS BIGINT) AS hour_idx,
       q_pct, n_events, est_cents,
       CAST(est_cents AS DOUBLE) / CAST('100.0' AS DOUBLE) AS est_value
FROM sel
"""


@query("hdr_hourly_quantiles", oracle=_hdr_hourly_sql)
def hdr_hourly_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P50/P90 of events.value per (event_type, hour) from per-window HDR
    sketches — the windowed composition that makes the sketch useful for
    telemetry: each (type, hour) cell is an independently-mergeable
    integer histogram, so a streaming job can maintain the exact same
    answers per micro-batch (the foreachBatch store pattern proven in
    tests).  Composite stratum = type#hour, split back on output."""
    ev = read_table(spark, sf_dir, "events")
    # integer div for the hour index (a double quotient truncated can
    # disagree with the oracle's BIGINT floor-div at hour boundaries)
    base = ev.select(
        "event_type", "value", epoch_ms(ev, "ts").alias("__ms")
    )
    df2 = base.select(
        F.concat_ws(
            "#",
            F.col("event_type"),
            F.expr("__ms div 3600000").cast("string"),
        ).alias("strat"),
        "value",
    )
    hist = K.hdr_histogram(df2, "value", "strat")
    q = K.hdr_quantiles(hist, (50, 90), "strat")
    parts = F.split(F.col("strat"), "#")
    return q.select(
        parts.getItem(0).alias("event_type"),
        parts.getItem(1).cast("long").alias("hour_idx"),
        "q_pct",
        "n_events",
        "est_cents",
        "est_value",
    )


@query("sketch_hdr_quantiles", oracle=_HDR_SQL)
def sketch_hdr_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P50/P90/P99 of events.value per event_type from the mergeable HDR
    histogram sketch (integer cents, octave + 4-bit sub-buckets, <= 1/16
    relative error) — the order-independent, cross-engine-exact
    alternative to t-digest/approx_percentile.  See
    :func:`pyfads.sketches.hdr_histogram`."""
    ev = read_table(spark, sf_dir, "events")
    hist = K.hdr_histogram(ev, "value", "event_type")
    return K.hdr_quantiles(hist)


@query("sketch_countmin", oracle=_countmin_sql())
def sketch_countmin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates for a probe-term list over the corpus
    token stream, alongside the exact counts (CM never underestimates;
    the absent probe term pins the estimate-0 path).  Everything is
    integer arithmetic on md5-derived buckets, so Spark and DuckDB agree
    bit-for-bit on the sketch itself, not just the estimates."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(X.tokens("text")).alias("t"))
    sketch = K.countmin_build(toks, "t", _CM_WIDTH, _CM_DEPTH)
    probes = spark.createDataFrame([(t,) for t in _CM_TERMS], "term string")
    est = K.countmin_estimate(sketch, probes, "term", _CM_WIDTH, _CM_DEPTH)
    exact = (
        toks.filter(F.col("t").isin(_CM_TERMS))
        .groupBy(F.col("t").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return est.join(exact, "term", "left").select(
        "term",
        "cm_estimate",
        F.coalesce(F.col("exact_count"), F.lit(0)).cast("long").alias("exact_count"),
    )


# --------------------------------------------------------------------------
# Robust outliers: median / MAD (all arithmetic on integer cents, so the
# interpolated medians are exact half-integers — bit-identical everywhere)
# --------------------------------------------------------------------------

_MAD_K = "'4.4478'::DOUBLE"  # 3 * 1.4826 (consistency constant), one literal

_MAD_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events
),
med AS (
  SELECT event_type, quantile_cont(vc, 0.5) AS med_cents FROM v GROUP BY event_type
),
dev AS (
  SELECT v.event_type, v.vc, abs(v.vc - m.med_cents) AS adev, m.med_cents
  FROM v JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       any_value(d.med_cents) AS med_cents,
       any_value(m.mad_cents) AS mad_cents,
       CAST(sum(CASE WHEN d.adev > {_MAD_K} * m.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


@query("robust_outliers", oracle=_MAD_SQL)
def robust_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier report per event_type — the
    skew-insensitive alternative to z-scores (one wild value cannot drag
    the threshold the way it drags a mean/stddev).

    Determinism: values are integer cents, so the interpolated medians
    are exact half-integers and every deviation is exact — the only float
    op is the single fixed-literal threshold multiply.  Scale shape: two
    map-side-combined percentile aggs (per-group state, small group count)
    with the tiny medians/MAD frames broadcast back; the events feed is
    scanned twice, never shuffled by row."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.round(F.col("value") * 100).cast("long").alias("vc"))
    med = v.groupBy("event_type").agg(
        F.percentile("vc", F.lit(0.5)).alias("med_cents")
    )
    dev = v.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("vc") - F.col("med_cents"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_cents")
    )
    thr = F.lit(4.4478) * F.col("mad_cents")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.any_value("med_cents").alias("med_cents"),
            F.any_value("mad_cents").alias("mad_cents"),
            F.sum((F.col("adev") > thr).cast("long")).cast("long").alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# Quality-gate drift audit (r11): per length-bin raw-vs-kept integer-ppm
# shares — the PSI-class stability report, transcendental-free.
# --------------------------------------------------------------------------
def _gate_drift_sql() -> str:
    from pyfads.llm_queries import _QUALITY_SQL

    return f"""
WITH q AS ({_QUALITY_SQL}),
b AS (
  SELECT CAST(len(string_split(d.text, ' ')) // 16 AS BIGINT) AS bin,
         q.quality_pass
  FROM documents d JOIN q USING (doc_id)
  WHERE d.text IS NOT NULL
),
agg AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_raw,
         CAST(sum(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
  FROM b GROUP BY bin
),
tot AS (SELECT CAST(sum(n_raw) AS BIGINT) AS t_raw,
               CAST(sum(n_kept) AS BIGINT) AS t_kept FROM agg)
SELECT bin, n_raw, n_kept,
       CAST(n_raw * 1000000 // t_raw AS BIGINT) AS raw_ppm,
       CAST(CASE WHEN t_kept > 0 THEN n_kept * 1000000 // t_kept ELSE 0 END
            AS BIGINT) AS kept_ppm,
       CAST((CASE WHEN t_kept > 0 THEN n_kept * 1000000 // t_kept ELSE 0 END)
            - (n_raw * 1000000 // t_raw) AS BIGINT) AS delta_ppm
FROM agg, tot
"""


@query("gate_drift_report", oracle=_gate_drift_sql)
def gate_drift_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate drift audit: per token-length bin, the raw vs
    gate-surviving population in exact integer ppm and the delta — a
    PSI-class stability report without the float ln() term.  See
    :func:`pyfads.text.gate_drift`."""
    docs = read_table(spark, sf_dir, "documents")
    return X.gate_drift(docs)
