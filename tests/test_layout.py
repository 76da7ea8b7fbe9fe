"""Z-order layout: key correctness + a REAL parquet footer-stats test.

The point of a z-sorted write is that every output file stays narrow in
BOTH dimensions, so parquet min/max row-group stats can prune scans on
either predicate.  test_zorder_write_shrinks_file_bounds measures exactly
that from the written files' own footers (pyarrow metadata), comparing a
z-ordered write against a one-dimension-sorted write of the same rows.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pyfads.layout import zorder_cell_stats, zorder_key


def _interleave_py(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (70000, -3)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r.z
        for r in df.select(zorder_key(F.col("a"), F.col("b")).alias("z"))
        .orderBy("a", "b")
        .collect()
    ]
    want = [
        _interleave_py(min(max(a, 0), 65535), min(max(b, 0), 65535))
        for a, b in sorted(rows)
    ]
    assert got == want


def test_zorder_locality_is_monotone_in_both_dims(spark):
    """Rows in the same z-cell are close in BOTH dimensions: each cell's
    per-dim span is far below the global span."""
    df = spark.range(10000).select(
        (F.col("id") % 100 * 11 % 997).alias("a"),
        ((F.col("id") * 7919) % 997).alias("b"),
    )
    cells = zorder_cell_stats(df, F.col("a"), F.col("b"), cell_shift=14).collect()
    assert len(cells) > 4
    for c in cells:
        assert c.a_hi - c.a_lo <= 512  # global span ~997
        assert c.b_hi - c.b_lo <= 512


def test_zorder_write_prunes_on_either_dimension(spark, tmp_path):
    """Footer-stats proof: under an a-only sort, a narrow predicate on
    ``b`` intersects EVERY file (each is full-width in b); under a
    z-order sort the same predicate prunes most files, while an ``a``
    predicate still prunes too — the whole point of the layout."""

    def _file_bounds(path: str):
        out = []
        for f in (tmp_path / path).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            bounds = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    s = col.statistics
                    name = col.path_in_schema
                    lo, hi = bounds.get(name, (s.min, s.max))
                    bounds[name] = (min(lo, s.min), max(hi, s.max))
            out.append(bounds)
        assert len(out) >= 8, f"expected a multi-file layout in {path}"
        return out

    def _files_hit(bounds, col, lo, hi) -> int:
        return sum(1 for b in bounds if not (b[col][1] < lo or b[col][0] > hi))

    n = 40000
    df = spark.range(n).select(
        ((F.col("id") * 7919) % 1024).alias("a"),
        ((F.col("id") * 104729) % 1024).alias("b"),
    )
    z = zorder_key(F.col("a"), F.col("b"), bits=10)
    (
        df.repartitionByRange(16, z)
        .sortWithinPartitions(z)
        .write.mode("overwrite")
        .parquet(str(tmp_path / "byz"))
    )
    (
        df.repartitionByRange(16, F.col("a"))
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(str(tmp_path / "bya"))
    )
    zb = _file_bounds("byz")
    ab = _file_bounds("bya")
    nf_z, nf_a = len(zb), len(ab)
    # narrow predicate on b: a-sorted layout cannot prune at all
    assert _files_hit(ab, "b", 100, 150) == nf_a
    assert _files_hit(zb, "b", 100, 150) <= nf_z // 2
    # predicate on a: both layouts prune (z coarser, but still real)
    assert _files_hit(ab, "a", 100, 150) <= 2
    assert _files_hit(zb, "a", 100, 150) <= nf_z // 2
