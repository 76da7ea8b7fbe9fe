"""Partition-independence: the docstrings claim results are deterministic
under any partitioning (integer-exact sums, md5 randomness, total-order
tie-breaks).  Prove it: run representative heavy queries under different
shuffle-partition counts (and AQE on/off) and require bit-identical rows.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

import __spark_entry__ as entry

# one per claim family: banded self-join dedup, window top-k, integer-sum
# star join, quantile thresholds, the upsert merge, and the end-to-end
# curation composition
QUERIES = [
    "dedup_minhash_lsh",
    "g5_knn_topk",
    "revenue_rollup",
    "quantile_select",
    "corpus_upsert",
    "corpus_curation",
    "pricing_summary",  # DECIMAL(38) charge sum + exact avg divisions
    "value_zscore",  # integer population moments -> fixed double expression
    # r9 families: min-struct keep-first keeper + ordered reassembly, and
    # the hierarchical two-stage assignment + keeper self-join
    "dedup_segments_scrub",
    "dedup_semantic_twolevel",
    # r10 families: salt-capped boundary-token blocking + Levenshtein verify,
    # and the prefix-filter containment join over hashed shingle keys with a
    # localCheckpoint-ed set table
    "fuzzy_pairs",
    "dedup_containment",
]


def _rows(spark, name, shuffle_parts, aqe):
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    spark.conf.set("spark.sql.adaptive.enabled", "true" if aqe else "false")
    try:
        df = entry.queries()[name](spark, SF_DIR)
        pdf = df.toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_output_is_partition_independent(spark, name):
    a = _rows(spark, name, 3, aqe=True)
    b = _rows(spark, name, 17, aqe=False)
    assert a.columns.tolist() == b.columns.tolist()
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (av == bv).all() or (
            av.dtype.kind == "f" and ((av == bv) | (av != av) & (bv != bv)).all()
        ), f"{name}.{c} differs between partitionings"
