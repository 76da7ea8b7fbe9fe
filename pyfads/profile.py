"""Table profiling: per-column data-quality statistics in one pass.

The ingestion-side sanity scan every large pipeline runs before training
jobs consume a table: row count, null count, exact distinct count, and
min/max per column — emitted as one ROW PER COLUMN so downstream checks
(null-rate alerts, cardinality drift) are plain filters over the profile.

Cross-engine float discipline: min/max are NEVER rendered through
engine-native number->string casts (Spark prints 1e7 as '1.0E7', DuckDB
as '10000000.0').  Numeric and timestamp columns emit ``min_num/max_num``
as DOUBLE (bigints below 2^53 and epoch-millis are exactly representable;
doubles pass through untouched); string columns emit ``min_str/max_str``
verbatim; each type leaves the other pair NULL.

Scale shape: a single aggregate over one scan.  The exact
``count(DISTINCT col)`` per column makes Spark plan an Expand (one
duplicated stream per distinct aggregate) — the right call for an
oracle-checked profile, and the documented swap-out at 100 TB is
``approx_count_distinct`` (HLL++, one pass, no expand) or the portable
HLL in :mod:`pyfads.sketches` when the profile itself must be
cross-engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["profile_table"]

_NUM_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}
_TS_TYPES = {"timestamp", "timestamp_ntz", "date"}


def profile_table(df: DataFrame) -> DataFrame:
    """One profile row per column of ``df``:
    ``(column_name, dtype, n_rows, n_null, n_distinct, min_num, max_num,
    min_str, max_str)``."""
    from pyfads.io import epoch_ms

    aggs: list[F.Column] = [F.count(F.lit(1)).cast("long").alias("__n")]
    for name, dtype in df.dtypes:
        c = F.col(name)
        aggs.append(F.count(c).cast("long").alias(f"__nn_{name}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"__nd_{name}"))
        if dtype in _NUM_TYPES:
            lo, hi = F.min(c).cast("double"), F.max(c).cast("double")
        elif dtype in _TS_TYPES:
            ms = epoch_ms(df, name)
            lo, hi = F.min(ms).cast("double"), F.max(ms).cast("double")
        else:
            lo = hi = F.lit(None).cast("double")
        aggs.append(lo.alias(f"__lo_{name}"))
        aggs.append(hi.alias(f"__hi_{name}"))
        if dtype == "string":
            slo, shi = F.min(c), F.max(c)
        else:
            slo = shi = F.lit(None).cast("string")
        aggs.append(slo.alias(f"__slo_{name}"))
        aggs.append(shi.alias(f"__shi_{name}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.lit(dtype).alias("dtype"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{name}")).cast("long").alias("n_null"),
                F.col(f"__nd_{name}").alias("n_distinct"),
                F.col(f"__lo_{name}").alias("min_num"),
                F.col(f"__hi_{name}").alias("max_num"),
                F.col(f"__slo_{name}").alias("min_str"),
                F.col(f"__shi_{name}").alias("max_str"),
            )
            for name, dtype in df.dtypes
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")
