"""Corpus-assembly operators for training-data pipelines: deterministic
stratified sampling, sequence packing, and benchmark-contamination checks.

These are the steps between "filtered documents" and "training batches":
every one is reproducible (md5-derived randomness, never ``rand()``), so a
100 TB run can be replayed bit-for-bit and audited.  All hot paths are
built-in ``pyspark.sql.functions``; every operator has a DuckDB SQL twin in
``pyfads.llm_queries``.

Scale notes per operator are in the docstrings; none materializes anything
on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from pyfads.text import md5_hash60, tokens

__all__ = [
    "sample_by_hash",
    "dsir_sample",
    "pack_greedy",
    "contamination_overlap",
    "split_assign",
    "global_shuffle_index",
    "mix_sample",
    "key_skew_report",
    "curriculum_order",
    "epoch_schedule",
]

_SAMPLE_BUCKETS = 10_000


def sample_by_hash(
    df: DataFrame,
    rates: dict[str, float],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "samp",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its 60-bit md5
    hash (of the id) modulo 10000 falls under the stratum's rate.

    The language/domain re-weighting step of corpus assembly ("keep 100%
    of en, 30% of zh, ..."), done the reproducible way: no ``rand()``, so
    membership is a pure function of (id, seed) — resampling with a changed
    rate keeps the previous sample as a subset (rates only move the
    threshold).  Per-row filter, zero shuffles; the rate map rides along as
    a literal MapType column.
    """
    if not rates:
        raise ValueError("rates must map at least one stratum to a rate")
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
    rate_map = F.create_map(
        *[F.lit(x) for kv in sorted(rates.items()) for x in kv]
    )
    h = md5_hash60(F.col(id_col).cast("string"), seed)
    bucket = h % _SAMPLE_BUCKETS
    thresh = (
        F.coalesce(rate_map[F.col(strat_col)], F.lit(float(default_rate)))
        * _SAMPLE_BUCKETS
    )
    return (
        df.withColumn("samp_bucket", bucket.cast("long"))
        .filter(F.col("samp_bucket") < thresh)
        .select(id_col, strat_col, "samp_bucket")
    )


def dsir_sample(
    weights: DataFrame,
    k: int = 100,
    seed: str = "dsirs",
    bits_col: str = "logw_bits",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR's resampling step (Xie et al. 2023): a weighted-without-
    replacement top-k over importance weights given in log2 "bits"
    (:func:`pyfads.text.dsir_weights`), via an INTEGER exponential race.

    The exponential-race / Gumbel-max trick samples x with probability
    proportional to w(x) by ranking on log w(x) + noise; here the noise is
    the integer ``60 - bit_length(u)`` for a 60-bit md5 uniform ``u`` —
    geometric(1/2), i.e. the exponential race at the same 1-bit resolution
    as the weights themselves.  All-integer, so the sample is bit-exactly
    reproducible across engines and replays (the reason this is not
    float Gumbel noise); within-key ties break on (u, id).

    Returns the k winners: ``(doc_id, <bits_col>, noise_bits, race_key)``.

    Scale shape: one projection + ``orderBy().limit(k)`` — Spark plans
    TakeOrderedAndProject (per-task top-k, then a single bounded merge),
    the same shape as :func:`sample_priority_k`; nothing corpus-sized
    moves.
    """
    u = md5_hash60(F.col(id_col).cast("string"), seed)
    base = weights.select(
        F.col(id_col),
        F.col(bits_col).cast("long").alias(bits_col),
        u.alias("__u"),
        (F.lit(60) - (F.length(F.bin(u + 1)) - 1)).cast("long").alias("noise_bits"),
    )
    base = base.withColumn(
        "race_key", (F.col(bits_col) + F.col("noise_bits")).cast("long")
    )
    return (
        base.orderBy(F.col("race_key").desc(), F.col("__u").asc(), F.col(id_col))
        .limit(k)
        .select(id_col, bits_col, "noise_bits", "race_key")
    )


def pack_greedy(
    df: DataFrame,
    context_len: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "pack",
    count_col: "str | None" = None,
) -> DataFrame:
    """Greedy sequence packing plan: shard documents by hash, order each
    shard deterministically, and assign every document to the context
    window (bin) its running token-prefix lands in.

    ``count_col`` supplies a precomputed per-doc token count (e.g. real
    BPE counts from :func:`pyfads.text.bpe_token_counts`) instead of the
    default whitespace estimate — the bin budget then reflects what the
    trainer actually consumes.

    This is the planning half of training-sequence packing ("concatenate
    docs into fixed-length contexts"): ``bin_idx = prefix_tokens //
    context_len`` models a writer that streams the shard's docs in order
    into back-to-back windows.  Shape: one shuffle on the shard key, one
    window running-sum per shard — shards bound the sort width, so the
    plan scales by adding shards (at 100 TB you'd use thousands; the
    default 8 is fixture-sized).
    """
    if context_len < 1 or n_shards < 1:
        raise ValueError("context_len and n_shards must be >= 1")
    h = md5_hash60(F.col(id_col).cast("string"), seed)
    if count_col is not None:
        n_tok = F.col(count_col).cast("long")
    else:
        n_tok = F.size(tokens(text_col)).cast("long")
    base = df.select(
        F.col(id_col),
        (h % n_shards).cast("long").alias("shard"),
        h.alias("pack_hash"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("pack_hash", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        prefix.alias("prefix_tokens"),
        F.floor(prefix / F.lit(context_len)).cast("long").alias("bin_idx"),
    )


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the row's hash bucket picks
    the split whose cumulative-fraction interval it falls in.

    Membership is a pure function of (id, seed) — growing the corpus never
    moves an existing row between splits, and the same row always lands in
    the same split across reruns/machines (the property ``rand()``-based
    splits lack).  Per-row projection, zero shuffles.
    """
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    h = md5_hash60(F.col(id_col).cast("string"), seed)
    bucket = (h % _SAMPLE_BUCKETS).cast("long")
    expr = None
    cum = 0.0
    # insertion order defines the interval layout — document it in callers
    for name, frac in fractions.items():
        cum += frac
        cond = bucket < F.lit(int(round(cum * _SAMPLE_BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr).withColumn("split_bucket", bucket)


def global_shuffle_index(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "shuf",
    buckets: int = 256,
) -> DataFrame:
    """Exact global training-order position for every row under a
    deterministic hash shuffle — WITHOUT a single-partition sort.

    The classic two-phase distributed rank: bucket rows by the top bits of
    the order key (so bucket ranges tile the global order), rank within each
    bucket with a per-bucket window, and add the bucket's global offset.
    The offsets come from a bounded ``groupBy(bucket).count()`` — at most
    ``buckets`` rows ever reach the driver (same bounded-collect contract as
    IVF codebook training), and the big table is touched by exactly one
    shuffle.  A naive ``row_number() OVER (ORDER BY hash)`` would funnel
    100 TB through one task; this never does.
    """
    if buckets < 1 or buckets > (1 << 20):
        raise ValueError("buckets must be in [1, 2^20]")
    h = md5_hash60(F.col(id_col).cast("string"), seed)
    # top bits of the 60-bit hash: bucket ranges are contiguous in (h, id)
    width = (1 << 60) // buckets
    # integer div — float division would lose bits above 2^53
    base = df.select(F.col(id_col), h.alias("shuffle_key")).withColumn(
        "__bkt", F.expr(f"shuffle_key div {width}")
    )
    counts = base.groupBy("__bkt").count().collect()  # bounded: <= buckets rows
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["__bkt"]):
        offsets[row["__bkt"]] = acc
        acc += row["count"]
    off_map = F.create_map(
        *[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])]
    )
    w = Window.partitionBy("__bkt").orderBy("shuffle_key", id_col)
    return base.select(
        id_col,
        "shuffle_key",
        (off_map[F.col("__bkt")] + F.row_number().over(w) - 1)
        .cast("long")
        .alias("shuffle_pos"),
    )


def _word_gram_hashes(df: DataFrame, n: int, text_col: str, id_col: str, seed: str) -> DataFrame:
    """(id, gram_hash) pairs, one row per *distinct* word n-gram per doc."""
    toks = tokens(text_col)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    grams = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, md5_hash60(F.col("g"), seed).alias("gram_h"))
        .distinct()
    )


def contamination_overlap(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "cont",
    bloom_words: int | None = None,
) -> DataFrame:
    """Benchmark-contamination check: the fraction of each document's
    distinct word ``n``-grams that also occur in the benchmark corpus —
    the standard eval-decontamination pass (GPT-3 §C / PaLM style, 13-gram
    in the papers; ``n`` is a knob).

    Shape: both sides reduce to (id, gram_hash) pairs; the benchmark's
    distinct hash set is usually tiny relative to the corpus, so the
    membership probe is a broadcast semi-join on one 8-byte key — the
    corpus side streams, nothing resembles all-pairs.  Docs shorter than
    ``n`` tokens report zero grams (and frac 0.0) via the left join.

    ``bloom_words``: when the benchmark gram set is itself too large to
    broadcast raw (a full eval-suite union at 100 TB), set this to route
    the corpus grams through a Bloom prefilter first — the filter is
    ``bloom_words`` BIGINT rows (8 KB per 1024) built by one bit_or agg
    over the benchmark grams, and only the ~maybe grams reach the exact
    semi-join.  No false negatives, so the output is IDENTICAL to the
    unfiltered path (the registered oracle is literally the same SQL);
    the exact join's probe-side volume drops by the bloom rejection rate.

    .. note:: the ``bloom_words`` path is EAGER: it runs the filter-build
       aggregation and a bounded collect (<= ``bloom_words`` rows) at
       call time so the words can be embedded as a literal map-side
       predicate (zero extra shuffles at probe time).  Callers composing
       lazy plans should call this last; bench.py times the builder call
       inside the measured region so this cost is always counted.
    """
    doc_grams = _word_gram_hashes(df, n, text_col, id_col, seed)
    bench_hashes = (
        _word_gram_hashes(benchmark, n, text_col, id_col, seed)
        .select("gram_h")
        .distinct()
    )
    bench_grams = F.broadcast(bench_hashes)
    per_doc = doc_grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    probe_grams = doc_grams
    if bloom_words is not None:
        from pyfads.sketches import bloom_build, bloom_maybe_expr

        key = F.col("gram_h").cast("string")
        # bounded collect (<= bloom_words rows) of the distributed bit_or
        # build, then the probe is a PURE MAP-SIDE FILTER via the literal
        # lookup — r5 rework: the previous distributed probe added a
        # corpus-gram distinct, a groupBy, and a string-keyed semi-join
        # (three shuffles) and benched 2.6x SLOWER than no prefilter at
        # sf0.1; the literal form adds zero shuffles, so the prefilter can
        # only help.  bloom_probe remains for filters too large to embed.
        bloom = bloom_build(
            bench_hashes.select(key.alias("k")), "k", bloom_words, seed=seed
        )
        words = {r["word_idx"]: r["word"] for r in bloom.collect()}
        probe_grams = doc_grams.filter(
            bloom_maybe_expr(words, key, bloom_words, seed=seed)
        )
    contaminated = (
        probe_grams.join(bench_grams, "gram_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated"))
    )
    out = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .join(contaminated, id_col, "left")
    )
    ng = F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
    nc = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
    return out.select(
        id_col,
        ng.alias("n_grams"),
        nc.alias("n_contaminated"),
        F.when(ng > 0, nc.cast("double") / ng).otherwise(F.lit(0.0)).alias(
            "contamination_frac"
        ),
    )


def mix_sample(
    df: DataFrame,
    targets: dict[str, int],
    out_rows: int,
    strat_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Quota-driven data-mixture sampling: draw a deterministic sample whose
    per-stratum composition approximates ``targets`` (integer mixture
    weights, e.g. ``{"web": 6, "code": 3, "books": 1}``) out of a total
    budget of ``out_rows`` rows.

    This is the "data mixing" step of a training run — turn raw source
    sizes into the target mixture — done scale-correct: per-stratum counts
    come from one map-side-combined aggregation, quotas and keep-rates are
    computed *in the plan* with pure integer arithmetic (quota·1e6 div
    count, so both engines agree bit-for-bit — no float rounding), and
    membership is the md5-threshold test of :func:`sample_by_hash` (no
    ``rand()``, replayable).  The tiny per-stratum rate table is broadcast
    back onto the corpus; the corpus itself never shuffles.

    A stratum smaller than its quota keeps everything (rate caps at 1e6
    millionths); strata absent from ``targets`` are dropped.  Realized
    counts are binomial around the quota — exactness-per-quota would need
    a global per-stratum rank (one extra shuffle), which a 100 TB mixture
    pass does not want.
    """
    if out_rows <= 0:
        raise ValueError("out_rows must be positive")
    if not targets or any(w < 0 for w in targets.values()):
        raise ValueError("targets must be non-negative integer weights")
    total_w = sum(targets.values())
    if total_w <= 0:
        raise ValueError("targets must have positive total weight")
    quota_map = F.create_map(
        *[
            F.lit(x)
            for k, w in sorted(targets.items())
            for x in (k, int(out_rows * w // total_w))
        ]
    )
    counts = df.groupBy(strat_col).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    rates = F.broadcast(
        counts.withColumn(
            "__quota", F.coalesce(quota_map[F.col(strat_col)].cast("long"), F.lit(0))
        )
        .withColumn(
            # integer div end-to-end: both engines agree bit-for-bit, no
            # float rounding at any corpus size
            "__rate_ppm",
            F.least(
                F.lit(1_000_000).cast("long"),
                F.expr("(__quota * 1000000) div __n"),
            ),
        )
        .select(strat_col, "__rate_ppm")
    )
    h = md5_hash60(F.col(id_col).cast("string"), seed)
    return (
        df.join(rates, strat_col)
        .withColumn("mix_bucket", (h % 1_000_000).cast("long"))
        .filter(F.col("mix_bucket") < F.col("__rate_ppm"))
        .select(id_col, strat_col, F.col("__rate_ppm").alias("rate_ppm"), "mix_bucket")
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 20,
) -> DataFrame:
    """Heavy-hitter diagnostic for shuffle keys: the ``top`` most frequent
    values of ``key_col`` with absolute count, share of all rows, and the
    ratio to a perfectly uniform key — the numbers that tell you whether a
    join/groupBy on this key needs a salt cap or AQE skew handling *before*
    you burn a 1000-executor hour discovering it.

    Shape: map-side-combined ``groupBy(key).count()`` (one shuffle of
    distinct keys), a 1-row global frame broadcast back, and a
    ``TakeOrderedAndProject`` top-k — no global sort, driver receives only
    ``top`` rows.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = F.broadcast(
        counts.agg(
            F.sum("cnt").cast("long").alias("__total"),
            F.count(F.lit(1)).cast("long").alias("__n_keys"),
        )
    )
    return (
        counts.join(tot)
        .select(
            "key",
            "cnt",
            (F.col("cnt").cast("double") / F.col("__total").cast("double")).alias(
                "share"
            ),
            (
                F.col("cnt").cast("double")
                * F.col("__n_keys").cast("double")
                / F.col("__total").cast("double")
            ).alias("skew_x"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(top)
    )


def select_by_stratum_quantile(
    df: DataFrame,
    lo_q: float = 0.3,
    hi_q: float = 0.99,
    strat_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    approx_accuracy: int | None = None,
) -> DataFrame:
    """Per-stratum quantile-calibrated selection: keep documents whose
    token count lies within the stratum's [lo_q, hi_q] exact interpolated
    quantiles — the "trim the short tail and the outlier top per
    language" curation pass, with thresholds calibrated from the data
    instead of hand-set constants.

    Scale shape: thresholds come from ONE map-side-combined aggregate,
    the tiny threshold table broadcasts back, and the filter is per-row —
    the corpus never shuffles.  The default exact ``percentile`` is the
    oracle-checkable form (matches DuckDB ``quantile_cont``) but its
    partial state holds every distinct value per stratum; at 100 TB pass
    ``approx_accuracy`` (e.g. 10000) to use ``percentile_approx``
    (Greenwald-Khanna, bounded state): the returned rank error is at most
    1/accuracy of the stratum size, so a threshold can move past at most
    ~n/accuracy documents per boundary — bound asserted in
    tests/test_llm_ops.py::test_quantile_select_approx_bound."""
    from pyfads.text import tokens

    m = df.select(
        F.col(id_col),
        F.col(strat_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    )
    if approx_accuracy is not None:
        pct = lambda q: F.percentile_approx(  # noqa: E731
            "n_tokens", F.lit(q), F.lit(approx_accuracy)
        ).cast("double")
    else:
        pct = lambda q: F.percentile("n_tokens", F.lit(q))  # noqa: E731
    thr = m.groupBy(strat_col).agg(
        pct(lo_q).alias("lo_thr"),
        pct(hi_q).alias("hi_thr"),
    )
    return (
        m.join(F.broadcast(thr), strat_col)
        .filter(
            (F.col("n_tokens") >= F.col("lo_thr"))
            & (F.col("n_tokens") <= F.col("hi_thr"))
        )
        .select(id_col, strat_col, "n_tokens", "lo_thr", "hi_thr")
    )


def sample_exact_k(
    df: DataFrame,
    k: int = 100,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "exk",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order —
    the fixed-budget counterpart of :func:`sample_by_hash` (rate-based):
    "give me 10k eval docs per language", reproducible across reruns and
    cluster sizes.

    Scale shape: ``row_number`` per stratum over the md5 order plans as
    WindowGroupLimit — each map task forwards at most k rows per stratum
    before the exchange, so the shuffle carries O(k x strata x tasks)
    rows, never the corpus.  Growing the corpus only swaps which rows
    rank inside k (hash order is stable per row)."""
    h = md5_hash60(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy(strat_col).orderBy(h.asc(), F.col(id_col))
    return (
        df.select(F.col(id_col), F.col(strat_col), h.alias("sample_hash"))
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def _priority_cut(
    df: DataFrame, k: int, weight_col: str, id_col: str, seed: str
) -> DataFrame:
    """The corpus-wide top-(k+1)-by-priority cut of :func:`sample_priority_k`
    (TakeOrderedAndProject — per-task top-k, no global sort)."""
    u = md5_hash60(F.col(id_col).cast("string"), seed).cast("double") / F.lit(
        float(1 << 60)
    )
    base = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)).select(
        F.col(id_col),
        F.col(weight_col).cast("double").alias("weight"),
        (F.col(weight_col).cast("double") / u).alias("priority"),
    )
    return base.orderBy(F.col("priority").desc(), F.col(id_col)).limit(k + 1)


def sample_priority_k(
    df: DataFrame,
    k: int = 200,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "prio",
) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): a weighted
    without-replacement sample of k rows that supports UNBIASED subset-sum
    estimation — "sample 10k docs but keep the token-mass accounting
    honest", the weighted counterpart of :func:`sample_exact_k`.

    Each row gets priority q = w / u with u = hash/2^60 in (0,1]; the k
    highest-priority rows are kept, and each keeps the estimator weight
    ``max(w, tau)`` where tau is the (k+1)-th priority.  Subset sums of
    ``est_weight`` are unbiased for the true subset weight (their Thm 1),
    with near-optimal variance among k-sample schemes.

    Determinism: u derives from the shared md5 hash and q is ONE IEEE
    multiply+divide — identical on any engine/partitioning; ties broken by
    id.  Weights must be positive; NULL/non-positive rows are excluded.

    Scale shape: the top-(k+1) cut is ``orderBy().limit()`` ->
    TakeOrderedAndProject (per-task top-k, then one O(k) merge — NO global
    sort); tau is a broadcast 1-row min over those k+1 rows.  O(k) rows
    move regardless of corpus size.  If the population has at most k rows
    everything is kept and tau = 0, so ``est_weight == weight`` exactly
    (the DLT small-population case).
    """
    # materialize the k+1-row TakeOrdered result ONCE: tau and the sample
    # are two consumers, and without this the corpus-wide top-k scan runs
    # twice (TakeOrderedAndProject is not an Exchange, so Spark cannot
    # reuse it across the two subtrees — r6 review finding).  The cut
    # itself lives in _priority_cut so its TakeOrdered plan shape stays
    # directly assertable (tests/test_llm_ops.py).
    top = _priority_cut(df, k, weight_col, id_col, seed).localCheckpoint(
        eager=True
    )
    tau = F.broadcast(
        top.agg(
            F.when(F.count(F.lit(1)) <= k, F.lit(0.0))
            .otherwise(F.min("priority"))
            .alias("tau")
        )
    )
    samp = top.orderBy(F.col("priority").desc(), F.col(id_col)).limit(k)
    return samp.crossJoin(tau).select(
        id_col,
        "weight",
        "priority",
        F.greatest(F.col("weight"), F.col("tau")).alias("est_weight"),
    )


def mix_temperature(
    df: DataFrame,
    out_rows: int,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mixt",
) -> DataFrame:
    """Temperature-based mixture sampling with alpha = 1/2: target share of
    stratum L is count_L^alpha / sum(count^alpha) — the standard
    multilingual-corpus rebalancing (upsample tails, downsample heads)
    popularized by multilingual LM training recipes.

    alpha is FIXED at 1/2 because sqrt is an IEEE correctly-rounded
    operation — unlike pow(x, alpha) for general alpha, every engine
    computes the identical double, which keeps the realized per-stratum
    keep-rates (and therefore the sample itself) bit-deterministic and
    oracle-checkable.  The sum over strata is a left fold over the
    LANG-SORTED weight list (F.aggregate here, list_reduce in the DuckDB
    twin), so accumulation order is fixed; each rate is then one multiply
    + one divide + one floor to integer millionths.

    Scale shape: one map-side-combined count per stratum; the fold runs
    over the tiny per-stratum frame collected INTO THE PLAN as a sorted
    array (never to the driver); membership is the same md5-threshold
    test as :func:`mix_sample` — the corpus itself never shuffles.
    """
    if out_rows <= 0:
        raise ValueError("out_rows must be positive")
    counts = df.groupBy(strat_col).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    folded = counts.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(strat_col).alias("s"), F.col("__n")))
        ).alias("__a")
    ).select(
        F.col("__a"),
        F.aggregate(
            F.transform("__a", lambda x: F.sqrt(x["__n"].cast("double"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__tot"),
    )
    budget = float(1_000_000 * out_rows)
    rates = F.broadcast(
        folded.select(F.explode("__a").alias("e"), "__tot").select(
            F.col("e.s").alias(strat_col),
            F.floor(
                F.lit(budget)
                * (F.sqrt(F.col("e.__n").cast("double")) / F.col("__tot"))
                / F.col("e.__n").cast("double")
            )
            .cast("long")
            .alias("__raw_ppm"),
        )
        .select(
            strat_col,
            F.least(F.lit(1_000_000).cast("long"), F.col("__raw_ppm")).alias(
                "rate_ppm"
            ),
        )
    )
    h = md5_hash60(F.col(id_col).cast("string"), seed)
    return (
        df.join(rates, strat_col)
        .withColumn("mix_bucket", (h % 1_000_000).cast("long"))
        .filter(F.col("mix_bucket") < F.col("rate_ppm"))
        .select(id_col, strat_col, "rate_ppm", "mix_bucket")
    )


def sample_priority_stratified(
    df: DataFrame,
    k: int = 40,
    strat_col: str = "lang",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "prio",
) -> DataFrame:
    """Per-stratum priority sampling: the DLT estimator of
    :func:`sample_priority_k` applied independently within each stratum
    ("k weighted docs per language, with honest mass accounting") — each
    stratum gets its own tau from its (k+1)-th priority, 0 when the
    stratum has at most k rows (everything kept, est == weight).

    Scale shape: the per-stratum cut is a row_number window over the
    priority order — WindowGroupLimit keeps at most k+1 rows per stratum
    per map task BEFORE the shuffle; the per-stratum tau frame joins back
    as a broadcast (one row per stratum)."""
    u = md5_hash60(F.col(id_col).cast("string"), seed).cast("double") / F.lit(
        float(1 << 60)
    )
    base = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)).select(
        F.col(strat_col),
        F.col(id_col),
        F.col(weight_col).cast("double").alias("weight"),
        (F.col(weight_col).cast("double") / u).alias("priority"),
    )
    w = Window.partitionBy(strat_col).orderBy(F.col("priority").desc(), id_col)
    ranked = base.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k + 1
    )
    tau = F.broadcast(
        ranked.filter(F.col("rn") == k + 1).select(
            strat_col, F.col("priority").alias("tau")
        )
    )
    return (
        ranked.filter(F.col("rn") <= k)
        .join(tau, strat_col, "left")
        .select(
            strat_col,
            id_col,
            "weight",
            "priority",
            F.greatest(
                F.col("weight"), F.coalesce(F.col("tau"), F.lit(0.0))
            ).alias("est_weight"),
        )
    )


def curriculum_order(
    docs: DataFrame,
    n_stages: int = 3,
    n_shards: int = 8,
    seed: str = "curriculum",
    id_col: str = "doc_id",
    strat_col: str = "source",
) -> DataFrame:
    """Curriculum training-order construction: per-``strat_col`` quality
    stages (cleanest docs first — the anneal-from-clean schedule
    curriculum-learning pipelines use), then a deterministic seeded
    shuffle WITHIN each stage so the order inside a stage is unbiased.

    Stage assignment is INTEGER-exact (the :func:`pyfads.text.
    rarity_buckets` tertile arithmetic): rows ranked per stratum by
    Gopher-flag count ``(n_flags, id)``, ``stage = least((rank-1) *
    n_stages div n_strat, n_stages-1)`` — stage 0 is the cleanest slice.
    Within a stage the order is :func:`pyfads.packing.global_shuffle`'s
    (hash shard, hash position) pair — a training loop reads stages in
    order and shards within a stage in any interleaving.

    Scale shape: ONE window per stratum for the stage rank (bounded-
    cardinality key, the ppl_buckets precedent) + one row_number per
    (stage, shard) — shard count bounds that partition; no global sort,
    no RNG state.  Returns ``(id, strat, n_flags, stage, shard, pos)``."""
    from pyfads.text import quality_score

    # quality_score's output id column is fixed at doc_id — rename the
    # caller's id through and back so a custom id_col works (r11 advice)
    q = quality_score(
        docs.select(F.col(id_col).alias("doc_id"), "text")
    ).select(F.col("doc_id").alias(id_col), "n_flags")
    d = docs.select(F.col(id_col), F.col(strat_col)).join(q, id_col)
    # asc_nulls_last: DuckDB's ASC default — keeps the twin exact even if
    # a corpus carries NULL texts (Spark's bare ASC is NULLS FIRST)
    wo = Window.partitionBy(strat_col).orderBy(
        F.asc_nulls_last("n_flags"), id_col
    )
    wn = Window.partitionBy(strat_col)
    d = d.withColumn("__rn", F.row_number().over(wo)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    stage = F.least(
        F.expr(f"((__rn - 1) * {int(n_stages)}) div __n"),
        F.lit(int(n_stages) - 1),
    ).cast("int")
    sid = F.col(id_col).cast("string")
    shard = (md5_hash60(sid, f"{seed}:shard") % int(n_shards)).cast("int")
    okey = md5_hash60(sid, f"{seed}:order")
    staged = d.select(
        F.col(id_col),
        F.col(strat_col),
        F.col("n_flags"),
        stage.alias("stage"),
        shard.alias("shard"),
        okey.alias("__okey"),
    )
    wpos = Window.partitionBy("stage", "shard").orderBy("__okey", id_col)
    return staged.withColumn(
        "pos", F.row_number().over(wpos).cast("bigint")
    ).drop("__okey")


def epoch_schedule(
    docs: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    id_col: str = "doc_id",
    strat_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Data-constrained epoch scheduling (the Muennighoff et al. 2023
    "Scaling Data-Constrained Language Models" regime): given a training
    token budget and the per-source token inventory, assign each source an
    integer repeat factor — proportional allocation, capped at
    ``max_epochs`` (beyond ~4 epochs repeated data stops helping), floor 1
    (every source is seen at least once).

    All integer arithmetic: ``share = budget * source_tokens div
    total_tokens`` (proportional budget slice), ``epochs =
    least(greatest(share div source_tokens, 1), max_epochs)`` — i.e. how
    many full passes of the source fit its slice, clamped.  Returns one
    row per source: ``(source, n_docs, source_tokens, epochs,
    scheduled_tokens)``.

    Scale shape: whitespace token counts are a map-only projection;
    the per-source rollup is one map-side-combinable groupBy over a
    bounded key; the corpus total joins back as a literal-free crossJoin
    of a 1-row aggregate (broadcast by AQE).  Nothing per-row ever
    shuffles except the (source, partial sum) pairs."""
    t = docs.select(
        F.col(strat_col),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("__nt"),
    )
    per = t.groupBy(strat_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__nt").cast("bigint").alias("source_tokens"),
    )
    total = per.agg(F.sum("source_tokens").cast("bigint").alias("__total"))
    j = per.crossJoin(F.broadcast(total))
    epochs = F.expr(
        f"least(greatest((CAST({int(budget_tokens)} AS BIGINT) * source_tokens"
        f" div __total) div source_tokens, CAST(1 AS BIGINT)),"
        f" CAST({int(max_epochs)} AS BIGINT))"
    )
    return j.select(
        F.col(strat_col),
        "n_docs",
        "source_tokens",
        epochs.alias("epochs"),
        (epochs * F.col("source_tokens")).cast("bigint").alias("scheduled_tokens"),
    )
