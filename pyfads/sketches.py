"""Distributed cardinality sketches for corpus analytics.

KMV (k-minimum-values) distinct-count estimation: keep the ``k`` smallest
values of a uniform hash over the distinct items; the k-th smallest hash
``m_k`` (scaled to [0,1]) estimates the cardinality as ``(k-1)/m_k``
(Bar-Yossef et al., "Counting distinct elements in a data stream", 2002).

Unlike HyperLogLog (whose register layout is engine-specific and
non-portable), KMV over a shared md5-based hash is **bit-deterministic
across engines** — the same items always produce the same k smallest
hashes — so the estimate itself is DuckDB-oracle-checkable, not just
"approximately right".

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

__all__ = ["kmv_distinct_tokens"]

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
