"""Semi-structured (JSON) column processing over the events stream.

The events fixture carries a ``props`` JSON string column (TESTDATA.md) —
the typical "attributes bag" of a real event feed.  Extraction uses
``from_json`` with an explicit schema so parsing happens once, JVM-side,
inside whole-stage codegen (never a Python UDF), and malformed documents
null out instead of failing the job (PERMISSIVE mode — the only sane
setting at 100 TB where some corrupt records are a certainty).

Scale shape: extraction is a per-row projection (zero shuffles); the
rollup is one map-side-combined aggregation keyed by the low-cardinality
``event_type``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["parse_props", "props_rollup"]

PROPS_SCHEMA = "k INT"


def parse_props(df: DataFrame, col: str = "props") -> DataFrame:
    """Parse the JSON ``props`` column into typed fields (adds ``prop_k``).

    ``from_json`` + ``getField`` — Catalyst prunes the struct to the
    accessed fields, so adding keys to PROPS_SCHEMA later costs nothing
    for queries that don't read them.
    """
    return df.withColumn(
        "prop_k", F.from_json(F.col(col), PROPS_SCHEMA).getField("k")
    )


def props_rollup(df: DataFrame, col: str = "props") -> DataFrame:
    """Per-event_type rollup of the extracted JSON attribute: row count,
    null-parse count, min/max/sum, and the mean derived as an exact
    integer-sum division (bit-deterministic regardless of aggregation
    order, unlike a double ``avg`` — the oracle-parity rule)."""
    p = parse_props(df, col)
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("prop_k").isNull().cast("int")).cast("long").alias("n_null_k"),
        F.min("prop_k").cast("long").alias("min_k"),
        F.max("prop_k").cast("long").alias("max_k"),
        F.sum("prop_k").cast("long").alias("sum_k"),
        F.count_distinct(F.col("prop_k")).cast("long").alias("n_distinct_k"),
    ).withColumn(
        "mean_k",
        F.col("sum_k").cast("double")
        / (F.col("n_events") - F.col("n_null_k")).cast("double"),
    )
