"""Storage-layout optimization: Z-order (Morton) clustering keys.

At 100 TB the cheapest query is the one that never reads the file: parquet
row-group min/max stats prune scans, but they only help along the sort
key.  Sorting by a Z-ORDER key interleaves the bits of TWO dimensions so
files stay simultaneously narrow in both — the layout trick behind
Databricks Delta's OPTIMIZE ZORDER, Iceberg's sort orders, and the
classic UB-tree — letting either predicate prune.

The key here is the pure-integer Morton interleave of two bounded
non-negative ints (bit i of each input lands at bits 2i+1 / 2i), built
as a fixed chain of shifts/masks — bit-identical on any engine, so the
key itself (and any stats over it) is DuckDB-oracle-checkable.

Usage for writes:  ``df.repartitionByRange(N, zorder_key(...))
.sortWithinPartitions(zorder_key(...)).write.parquet(...)`` — range
partitioning keeps files disjoint in z-space; the footer-stats test in
tests/test_layout.py measures the bounding-box shrinkage directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "zorder_sql", "zorder_cell_stats"]


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns: bit i of ``a`` -> bit 2i+1, bit i of ``b`` -> bit 2i.
    Values are clamped into [0, 2^bits) first (out-of-range inputs would
    silently alias cells otherwise)."""
    hi = (1 << bits) - 1
    ca = F.least(F.greatest(a.cast("long"), F.lit(0)), F.lit(hi))
    cb = F.least(F.greatest(b.cast("long"), F.lit(0)), F.lit(hi))
    # shifts rendered as multiply/divide by powers of two so the SAME
    # formula renders in portable SQL (zorder_sql below)
    terms = []
    for i in range(bits):
        terms.append(((ca / (1 << i)).cast("long") % 2) * (1 << (2 * i + 1)))
        terms.append(((cb / (1 << i)).cast("long") % 2) * (1 << (2 * i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — same clamp, same bit terms."""
    hi = (1 << bits) - 1
    ca = f"least(greatest(CAST({a_expr} AS BIGINT), 0), {hi})"
    cb = f"least(greatest(CAST({b_expr} AS BIGINT), 0), {hi})"
    terms = []
    for i in range(bits):
        terms.append(f"(({ca} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({cb} // {1 << i}) % 2) * {1 << (2 * i)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_cell_stats(
    df: DataFrame,
    a: Column,
    b: Column,
    bits: int = 16,
    cell_shift: int = 24,
) -> DataFrame:
    """Locality diagnostic: group rows by the top bits of their z-key
    (``z div 2^cell_shift`` — one cell = one contiguous z-range, i.e. one
    would-be file) and report per-cell row counts and per-dimension
    bounds.  Narrow per-cell bounds in BOTH dimensions is exactly the
    property that makes footer-stats pruning work after a z-sorted
    write."""
    z = zorder_key(a, b, bits)
    return (
        df.select(
            (z / (1 << cell_shift)).cast("long").alias("z_cell"),
            a.cast("long").alias("__a"),
            b.cast("long").alias("__b"),
        )
        .groupBy("z_cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__a").alias("a_lo"),
            F.max("__a").alias("a_hi"),
            F.min("__b").alias("b_lo"),
            F.max("__b").alias("b_hi"),
        )
    )
