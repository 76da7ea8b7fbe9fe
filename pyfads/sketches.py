"""Distributed cardinality sketches for corpus analytics.

KMV (k-minimum-values) distinct-count estimation: keep the ``k`` smallest
values of a uniform hash over the distinct items; the k-th smallest hash
``m_k`` (scaled to [0,1]) estimates the cardinality as ``(k-1)/m_k``
(Bar-Yossef et al., "Counting distinct elements in a data stream", 2002).

Unlike ENGINE-NATIVE HyperLogLog (whose register layout is private and
non-portable), KMV over a shared md5-based hash is **bit-deterministic
across engines** — the same items always produce the same k smallest
hashes — so the estimate itself is DuckDB-oracle-checkable, not just
"approximately right".  The HLL at the bottom of this module applies the
same trick to HLL itself: fixed hash, fixed bucket/rank rule, integer
harmonic sum — portable registers, ulp-exact estimate.

Scale shape (100 TB): the per-stratum k-smallest is expressed as
``row_number() OVER (PARTITION BY stratum ORDER BY h) <= k``, which Spark
3.5+ plans as ``WindowGroupLimit`` — every map task keeps only its local
top-k *before* the shuffle, so the exchange carries O(k × partitions) rows
per stratum, never the full distinct-hash stream.  The distinct() before it
is one hash-partitioned aggregate with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pyfads.text import md5_hash60, tokens

__all__ = [
    "kmv_distinct_tokens",
    "bloom_build",
    "bloom_probe",
    "hll_registers",
    "hll_estimate",
    "hll_merge",
    "hll_distinct_tokens",
    "hdr_histogram",
    "hdr_quantiles",
    "hdr_merge",
]

# md5_hash60 yields 60-bit hashes; scaling by 2^60 maps them to (0,1]
_HASH_SPACE = float(1 << 60)


def kmv_distinct_tokens(
    df: DataFrame,
    k: int = 128,
    strat_col: str = "lang",
    text_col: str = "text",
    seed: str = "kmv",
) -> DataFrame:
    """Per-stratum distinct-token cardinality: the exact count (the oracle
    target at test SF; at 100 TB it is the expensive number the sketch
    replaces) next to the KMV estimate computed from the k smallest
    distinct hashes.

    Returns one row per stratum: ``n_exact``, ``n_kept`` (min(k, exact)),
    ``kth_hash`` (the largest kept hash), and ``kmv_estimate`` — exact by
    definition when the stratum has fewer than ``k`` distinct tokens.
    """
    hashes = (
        df.select(F.col(strat_col), F.explode(tokens(text_col)).alias("__tok"))
        .select(F.col(strat_col), md5_hash60(F.col("__tok"), seed).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(strat_col).orderBy("h")
    kept = hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    smallest = kept.groupBy(strat_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").cast("long").alias("kth_hash"),
    )
    exact = hashes.groupBy(strat_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(_HASH_SPACE))
    )
    return (
        exact.join(smallest, strat_col)
        .select(
            strat_col,
            "n_exact",
            "n_kept",
            "kth_hash",
            est.alias("kmv_estimate"),
        )
    )


# --------------------------------------------------------------------------
# Bloom filter: distributed build (bit_or word agg) + probe
# --------------------------------------------------------------------------

# 63 payload bits per BIGINT word: bit positions 0..62 keep every shift
# <= 62, which both JVM long shifts and DuckDB BIGINT shifts evaluate
# identically (DuckDB raises on 1 << 63, so bit 63 is left unused).
_BITS_PER_WORD = 63


def _bloom_positions(key: F.Column, n_words: int, k: int, seed: str):
    """k (word_idx, bit-in-word) pairs for ``key`` — one independent
    md5-seeded hash per probe function, mod the usable bit space."""
    m_bits = n_words * _BITS_PER_WORD
    for j in range(k):
        bit = md5_hash60(key, f"{seed}{j}") % m_bits
        yield (bit / _BITS_PER_WORD).cast("long"), bit % _BITS_PER_WORD


def _mask(bit_col: str) -> F.Column:
    """``1L << bit`` as a column expression (F.shiftleft only takes a
    Python int for the shift amount)."""
    return F.expr(f"shiftleft(1L, cast({bit_col} AS INT))")


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    n_words: int = 1024,
    k: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """Build an ``n_words * 63``-bit Bloom filter over ``keys[key_col]`` as
    a DataFrame of (word_idx BIGINT, word BIGINT) — at most ``n_words``
    rows regardless of input size.

    Scale shape (100 TB): each key expands to ``k`` (word_idx, bitmask)
    pairs map-side; one ``groupBy(word_idx).agg(bit_or)`` with map-side
    combine collapses everything to <= n_words rows before the single tiny
    exchange — the same one-pass-to-tiny-result contract as a count.  The
    word layout is engine-portable (md5-derived positions, plain BIGINT
    words), so a filter built by Spark can be probed by any system that
    can md5 — unlike opaque built-in bloom aggregates.
    """
    pairs = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(w.alias("word_idx"), b.alias("bit"))
                    for w, b in _bloom_positions(F.col(key_col), n_words, k, seed)
                ]
            )
        ).alias("p")
    ).select("p.word_idx", _mask("p.bit").alias("mask"))
    return pairs.groupBy("word_idx").agg(F.bit_or("mask").alias("word"))


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    n_words: int = 1024,
    k: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """Probe ``probes[key_col]`` against a :func:`bloom_build` filter:
    one row per probe key with ``maybe`` = all k bits set (no false
    negatives; false-positive rate ~ (1 - e^{-kn/m})^k).

    Scale shape: the filter is <= n_words rows (8 KB per 1024 words), so
    the positions-to-words equi-join broadcasts it; probes stay fully
    distributed and aggregate back to one row per key map-side."""
    pos = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(w.alias("word_idx"), b.alias("bit"))
                    for w, b in _bloom_positions(F.col(key_col), n_words, k, seed)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.word_idx", _mask("p.bit").alias("mask"))
    hit = F.coalesce(
        (F.col("word").bitwiseAND(F.col("mask")) != 0), F.lit(False)
    )
    return (
        pos.join(F.broadcast(bloom), "word_idx", "left")
        .select(key_col, hit.alias("__hit"))
        .groupBy(key_col)
        .agg(F.bool_and("__hit").alias("maybe"))
    )


def bloom_maybe_expr(
    words: "dict[int, int]",
    key: F.Column,
    n_words: int = 1024,
    k: int = 4,
    seed: str = "bloom",
) -> F.Column:
    """Membership test against a COLLECTED Bloom filter as a pure column
    expression: ``words`` is the (word_idx -> word) dict of a
    :func:`bloom_build` result (<= n_words rows — a bounded collect of the
    same class as the IVF codebook), embedded as an array literal.

    This turns the probe into a map-side filter — no distinct, no join, no
    shuffle at all — the right shape whenever the filter fits in the plan
    (8 KB per 1024 words; fine up to millions of words).  Use
    :func:`bloom_probe` instead when the filter itself is too large to
    embed.  Same positions/words as the distributed probe, so verdicts are
    identical (no false negatives either way)."""
    lookup = F.lit([int(words.get(i, 0)) for i in range(n_words)])
    masks = F.lit([1 << i for i in range(_BITS_PER_WORD)])
    cond = None
    for w, b in _bloom_positions(key, n_words, k, seed):
        word = F.element_at(lookup, (w + 1).cast("int"))
        mask = F.element_at(masks, (b + 1).cast("int"))
        bit = word.bitwiseAND(mask) != 0
        cond = bit if cond is None else cond & bit
    return cond


# --------------------------------------------------------------------------
# Count-Min sketch: heavy-hitter count estimation in O(depth * width) space
# --------------------------------------------------------------------------


def countmin_build(
    keys: DataFrame,
    key_col: str = "key",
    width: int = 1024,
    depth: int = 4,
    seed: str = "cm",
) -> DataFrame:
    """Build a Count-Min sketch over a key stream (with multiplicity):
    ``depth`` independent md5-hashed rows of ``width`` counters, as a
    DataFrame of (j, b, c) — at most depth*width rows regardless of input.

    All arithmetic is INTEGER (bucket ids and counts), so unlike
    float-based sketches every value is bit-identical across engines and
    partitionings by construction.

    Scale shape: one explode to ``depth`` (j, b) pairs per key, one
    map-side-combined count agg collapsing to <= depth*width rows — the
    same one-pass-to-tiny-result contract as :func:`bloom_build`.
    """
    pairs = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (md5_hash60(F.col(key_col), f"{seed}{j}") % width).alias("b"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.j", "p.b")
    return pairs.groupBy("j", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    width: int = 1024,
    depth: int = 4,
    seed: str = "cm",
) -> DataFrame:
    """Point-query the sketch: per probe key, ``cm_estimate`` = min over
    the depth rows of the hashed counter (the classic CM upper bound:
    never under, over by at most ~N/width w.h.p. per row).

    The sketch side is <= depth*width rows, so the (j, b) equi-join
    broadcasts it; probes stay distributed.  Keys absent from the stream
    get estimate 0 via the left join + coalesce."""
    pos = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (md5_hash60(F.col(key_col), f"{seed}{j}") % width).alias("b"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.j", "p.b")
    return (
        pos.join(F.broadcast(sketch), ["j", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cm_estimate"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two Count-Min sketches built with the same (width, depth,
    seed): counter-wise sum.  CM is linear, so
    ``merge(build(A), build(B)) == build(A ∪ B)`` exactly (integer adds) —
    the property that lets each executor/day/shard sketch independently
    and a tiny driver-side (or reduce-side) merge produce the global
    sketch.  Asserted bit-exact in tests/test_analytics.py."""
    return (
        a.unionByName(b)
        .groupBy("j", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )


# --------------------------------------------------------------------------
# HyperLogLog: cross-engine-deterministic register sketch
# --------------------------------------------------------------------------

# HLL over the shared md5_hash60 hash (Flajolet et al., "HyperLogLog: the
# analysis of a near-optimal cardinality estimation algorithm", 2007).
# Engine-native HLLs (Spark approx_count_distinct's HLL++, DuckDB
# approx_distinct) use private hash/register layouts and cannot be
# cross-checked; this one fixes the hash (md5_hash60), the bucket split
# (low p bits) and the rank rule (leading zeros of the remaining
# 60-p bits, via length(bin(w)) — identical in Spark and DuckDB), so the
# REGISTERS are bit-identical across engines and the estimate is one
# shared-literal multiply + one IEEE division — oracle-checkable to the
# last ulp like the KMV/Bloom/Count-Min sketches above.
#
# The emitted estimate is the RAW HLL estimator alpha_m * m^2 / sum(2^-reg)
# (no small/large-range corrections: both need transcendentals (ln), which
# are not reproducible across engines — see PAPERS.md on portable floats).
# The scaled harmonic sum is kept in exact integer form: each register
# contributes 2^(maxrank - reg) with maxrank = 60 - p + 1 <= 53, so the
# per-stratum sum stays below 2^(p + 53) < 2^62 for p <= 8 — no float
# accumulation anywhere, hence partition-order independence for free.

_HLL_P = 8  # m = 256 registers; standard error 1.04/sqrt(m) ~ 6.5%


def _hll_consts(p: int):
    m = 1 << p
    wbits = 60 - p  # md5_hash60 is 60-bit
    maxrank = wbits + 1
    alpha = 0.7213 / (1 + 1.079 / m)  # Flajolet's alpha_m, m >= 128
    # one pre-multiplied literal so both engines do a single division
    numerator = alpha * float(m) * float(m) * float(1 << maxrank)
    return m, wbits, maxrank, numerator


def hll_registers(
    df: DataFrame,
    key_col: str,
    strat_col: str = "lang",
    p: int = _HLL_P,
    seed: str = "hll",
) -> DataFrame:
    """Per-stratum HLL registers: one row per PRESENT (stratum, bucket)
    with ``register`` = max rank seen.  Absent buckets are implicit zeros
    (the estimator adds them back), so the sketch frame is at most
    ``m`` rows per stratum — trivially broadcastable / storable.

    Scale shape: one hash-partitioned aggregate on (stratum, bucket) with
    map-side combine — each map task emits at most m rows per stratum no
    matter how many input rows it saw.  No distinct() needed: max() is
    idempotent, duplicates cost nothing.
    """
    m, wbits, maxrank, _ = _hll_consts(p)
    h = df.select(
        F.col(strat_col), md5_hash60(F.col(key_col), seed).alias("h")
    )
    w = F.expr(f"h div {m}")
    rank = F.when(w == F.lit(0), F.lit(maxrank)).otherwise(
        F.lit(maxrank) - F.length(F.bin(w))
    )
    return (
        h.select(
            F.col(strat_col),
            (F.col("h") % m).cast("int").alias("bucket"),
            rank.cast("int").alias("rank"),
        )
        .groupBy(strat_col, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_estimate(
    registers: DataFrame, strat_col: str = "lang", p: int = _HLL_P
) -> DataFrame:
    """Fold a register frame into per-stratum estimates.  Returns
    ``n_registers_set`` and ``register_sum`` (integer checksums asserting
    the registers themselves, not just the float) plus ``hll_estimate``."""
    m, wbits, maxrank, numerator = _hll_consts(p)
    agg = registers.groupBy(strat_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers_set"),
        F.sum("register").cast("long").alias("register_sum"),
        F.sum(F.expr(f"shiftleft(1L, {maxrank} - register)"))
        .cast("long")
        .alias("z_present"),
    )
    total = F.col("z_present") + (F.lit(m) - F.col("n_registers_set")) * F.lit(
        1 << maxrank
    )
    return agg.select(
        strat_col,
        "n_registers_set",
        "register_sum",
        (F.lit(numerator) / total.cast("double")).alias("hll_estimate"),
    )


def hll_merge(a: DataFrame, b: DataFrame, strat_col: str = "lang") -> DataFrame:
    """Merge two register frames built with the same (p, seed):
    bucket-wise max.  HLL registers form a semilattice under max, so
    ``merge(build(A), build(B)) == build(A ∪ B)`` exactly — shard/day/
    executor sketches combine losslessly (asserted bit-exact in
    tests/test_analytics.py)."""
    return (
        a.unionByName(b)
        .groupBy(strat_col, "bucket")
        .agg(F.max("register").alias("register"))
    )


def hll_distinct_tokens(
    df: DataFrame,
    strat_col: str = "lang",
    text_col: str = "text",
    p: int = _HLL_P,
    seed: str = "hll",
) -> DataFrame:
    """Per-stratum distinct-token cardinality: exact count next to the HLL
    estimate — same token stream as :func:`kmv_distinct_tokens` so the two
    sketch families are directly comparable on accuracy and cost."""
    toks = df.select(
        F.col(strat_col), F.explode(tokens(text_col)).alias("__tok")
    )
    regs = hll_registers(toks, "__tok", strat_col=strat_col, p=p, seed=seed)
    est = hll_estimate(regs, strat_col=strat_col, p=p)
    exact = toks.distinct().groupBy(strat_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    return exact.join(est, strat_col).select(
        strat_col, "n_exact", "n_registers_set", "register_sum", "hll_estimate"
    )


# --------------------------------------------------------------------------
# HDR histogram: mergeable quantile sketch, pure integer
# --------------------------------------------------------------------------

# HdrHistogram-style bucketing (Gil Tene's High Dynamic Range histogram;
# same family as DDSketch, Karppa & Pagh "HDR sketching" lineage) over
# integer cents: exact below 32, then one bucket per (octave, top-4-bits)
# — relative error <= 1/16 per bucket, counts are plain BIGINTs, merge is
# addition (linear, like Count-Min).  Every operation is integer
# arithmetic (bit_length via length(bin(x)), shifts via floor-div by a
# power of two), so the sketch AND its quantile answers are bit-identical
# across engines/partitionings — unlike t-digest/GK, whose state depends
# on input order, or engine-native approx_percentile.

_HDR_SUB_BITS = 4
_HDR_LINEAR = 1 << (_HDR_SUB_BITS + 1)  # exact region: vc < 32


def _hdr_bucket_cols(vc_name: str = "vc"):
    """(bucket, lower) columns for the positive BIGINT cents column named
    ``vc_name`` (a NAME, not a Column: the shift expressions need the SQL
    text of the column, and a half-honored Column parameter would silently
    mix two columns — r6 review finding)."""
    vc = F.col(vc_name)
    o = F.length(F.bin(vc))  # bit_length, vc >= 1
    shift = F.greatest(o - F.lit(_HDR_SUB_BITS + 1), F.lit(0))
    pow2_sql = (
        f"shiftleft(1L, greatest(length(bin({vc_name})) - {_HDR_SUB_BITS + 1}, 0))"
    )
    pow2 = F.expr(pow2_sql)
    top = F.expr(f"{vc_name} div {pow2_sql}")
    bucket = F.when(vc < _HDR_LINEAR, vc).otherwise(
        shift.cast("long") * (1 << _HDR_SUB_BITS) + top
    )
    lower = F.when(vc < _HDR_LINEAR, vc).otherwise(top * pow2)
    return bucket.cast("long").alias("bucket"), lower.cast("long").alias("lower")


def hdr_histogram(
    df: DataFrame,
    value_col: str = "value",
    strat_col: str = "event_type",
    cents: int = 100,
) -> DataFrame:
    """Per-stratum HDR histogram over ``round(value * cents)``: one row
    per present (stratum, bucket) with its ``lower`` bound (in cents) and
    ``cnt``.  Non-positive / NULL values are excluded (the sketch covers
    positive magnitudes; shift the domain first if you need zeros).

    Scale: one map-side-combined aggregate; at most a few hundred buckets
    per stratum regardless of row count."""
    vc = F.round(F.col(value_col) * cents).cast("long")
    b, lo = _hdr_bucket_cols("vc")
    return (
        df.select(F.col(strat_col), vc.alias("vc"))
        .filter(F.col("vc") >= 1)
        .select(F.col(strat_col), b, lo)
        .groupBy(strat_col, "bucket", "lower")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hdr_merge(a: DataFrame, b: DataFrame, strat_col: str = "event_type") -> DataFrame:
    """Histogram merge: counter-wise sum (linear, like Count-Min)."""
    return (
        a.unionByName(b)
        .groupBy(strat_col, "bucket", "lower")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def hdr_quantiles(
    hist: DataFrame,
    qs: "tuple[int, ...]" = (50, 90, 99),
    strat_col: str = "event_type",
    cents: int = 100,
) -> DataFrame:
    """Quantile answers from an HDR histogram: for each integer percent q,
    the lower bound of the first bucket whose cumulative count reaches
    rank ceil(q*n/100).  Integer ranks (``(q*n + 99) div 100``), integer
    bounds; the only float is the final cents->unit division.

    Returns ``(strat, q_pct, n_events, est_cents, est_value)``."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(strat_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w).cast("long"))
    tot = hist.groupBy(strat_col).agg(F.sum("cnt").cast("long").alias("n_events"))
    qdf = F.broadcast(
        cum.sparkSession.createDataFrame([(q,) for q in qs], "q_pct int")
    )
    ranked = (
        cum.join(F.broadcast(tot), strat_col)
        .crossJoin(qdf)
        .filter(F.col("cum") >= F.expr("(q_pct * n_events + 99) div 100"))
        .groupBy(strat_col, "q_pct", "n_events")
        .agg(F.min("lower").alias("est_cents"))
    )
    return ranked.select(
        strat_col,
        "q_pct",
        "n_events",
        "est_cents",
        (F.col("est_cents").cast("double") / F.lit(float(cents))).alias("est_value"),
    )


def hdr_discretize(
    df: DataFrame,
    value_col: str = "value",
    strat_col: str = "event_type",
    n_buckets: int = 10,
    cents: int = 100,
) -> DataFrame:
    """Quantile discretization (the ML-prep "QuantileDiscretizer", done
    sketch-first): bin each row's value into its per-stratum quantile
    bucket, with boundaries taken from the HDR histogram — so the
    binning is mergeable, order-independent, and bit-identical across
    engines, unlike approxQuantile-based binning.

    Bucket b of n covers values >= the (b/n)-quantile boundary and < the
    next; boundaries are HDR bucket LOWER BOUNDS (integer cents), so
    assignment is pure integer comparison.  Rows with non-positive /
    NULL values are excluded (the sketch's domain).

    Scale: the boundary frame is <= (strata x n_buckets) rows, broadcast;
    assignment is one map-side range join expressed as a conditional sum
    over the broadcast boundary array — the corpus never shuffles.
    """
    hist = hdr_histogram(df, value_col, strat_col, cents)
    qs = tuple(int(100 * b / n_buckets) for b in range(1, n_buckets))
    bounds = hdr_quantiles(hist, qs, strat_col, cents).select(
        strat_col, "q_pct", "est_cents"
    )
    barr = F.broadcast(
        bounds.groupBy(strat_col).agg(
            F.sort_array(
                F.collect_list(F.struct("q_pct", "est_cents"))
            ).alias("__bounds")
        )
    )
    vc = F.round(F.col(value_col) * cents).cast("long")
    # bucket = number of boundaries <= vc (0..n_buckets-1)
    assigned = (
        df.select(F.col(strat_col), vc.alias("vc"))
        .filter(F.col("vc") >= 1)
        .join(barr, strat_col)
        .select(
            strat_col,
            "vc",
            F.size(
                F.filter("__bounds", lambda b: b["est_cents"] <= F.col("vc"))
            )
            .cast("long")
            .alias("bucket"),
        )
    )
    return assigned.groupBy(strat_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("vc").alias("vc_lo"),
        F.max("vc").alias("vc_hi"),
    )


# --------------------------------------------------------------------------
# Theta-style set operations over KMV sketches
# --------------------------------------------------------------------------


def kmv_hashes(
    df: DataFrame,
    k: int = 256,
    text_col: str = "text",
    seed: str = "theta",
) -> DataFrame:
    """The k smallest distinct token hashes of a corpus slice — the KMV /
    Theta sketch retained set (one frame per slice, <= k rows).

    Scale: distinct-hash agg + WindowGroupLimit top-k, same shape as
    :func:`kmv_distinct_tokens` without the stratum key."""
    hashes = (
        df.select(F.explode(tokens(text_col)).alias("__tok"))
        .select(md5_hash60(F.col("__tok"), seed).alias("h"))
        .distinct()
    )
    # global top-k via orderBy().limit() -> TakeOrdered (no global sort)
    return hashes.orderBy("h").limit(k)


def theta_set_ops(
    a_hashes: DataFrame, b_hashes: DataFrame, k: int = 256
) -> DataFrame:
    """Theta-sketch set-operation estimates from two :func:`kmv_hashes`
    frames (Dasgupta et al., "Theta sketch framework", 2016): with
    theta = min(theta_A, theta_B) (each side's k-th smallest hash,
    2^60 when the side retained fewer than k), every retained hash below
    theta is a uniform sample of the underlying set, so

        |A ∩ B| ~ |{h < theta: h in A and B}| / (theta / 2^60)
        |A ∪ B| ~ |{h < theta: h in A or B}|  / (theta / 2^60)

    All counting is exact integers on <= 2k rows; each estimate is ONE
    IEEE division — bit-identical cross-engine like the other sketches.
    The two sketch frames are tiny, so this composes as a broadcast join
    no matter how large the underlying corpora were."""
    stats = lambda df, side: df.agg(  # noqa: E731
        F.count(F.lit(1)).cast("long").alias(f"n_{side}"),
        F.max("h").cast("long").alias(f"kth_{side}"),
    )
    sa, sb = stats(a_hashes, "a"), stats(b_hashes, "b")
    space = 1 << 60
    both = sa.crossJoin(sb).select(
        "n_a",
        "n_b",
        F.when(F.col("n_a") < k, F.lit(space))
        .otherwise(F.col("kth_a"))
        .alias("theta_a"),
        F.when(F.col("n_b") < k, F.lit(space))
        .otherwise(F.col("kth_b"))
        .alias("theta_b"),
    ).select(
        "n_a", "n_b", F.least("theta_a", "theta_b").alias("theta")
    )
    inter = (
        a_hashes.join(b_hashes, "h")
        .crossJoin(F.broadcast(both.select("theta")))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    union = (
        a_hashes.unionByName(b_hashes)
        .distinct()
        .crossJoin(F.broadcast(both.select("theta")))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_union"))
    )
    return (
        both.crossJoin(inter)
        .crossJoin(union)
        .select(
            "n_a",
            "n_b",
            "theta",
            "n_common",
            "n_union",
            (
                F.col("n_common").cast("double")
                / (F.col("theta").cast("double") / F.lit(float(space)))
            ).alias("intersection_est"),
            (
                F.col("n_union").cast("double")
                / (F.col("theta").cast("double") / F.lit(float(space)))
            ).alias("union_est"),
        )
    )
