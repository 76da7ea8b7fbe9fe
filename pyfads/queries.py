"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable, with a matching DuckDB-runnable ANSI
SQL oracle where the semantics are SQL-expressible.

Column-name discipline: the driver's comparator sorts columns by name and
hashes values, so every computed column is aliased identically in the Spark
code and the SQL.

Timestamp columns in the testdata are ``timestamp[us]`` parquet: Spark reads
them as TIMESTAMP_NTZ, DuckDB as TIMESTAMP — so oracles use
``epoch_ms(col)`` where Spark uses :func:`pyfads.io.epoch_ms` (a
tz-independent ``timestampdiff`` against the epoch; both floor to millis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a queries() entry (+ optional DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Flagship: batch FADS on events (P6/G12/G14).  Sequential stateful loop —
# not SQL-expressible; the driver records a rows-only check, and the golden
# pure-Python oracle in tests/test_fads_batch.py is the semantic gate.
# --------------------------------------------------------------------------


@query("fads_generalize_events")
def fads_generalize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyfads import FADSConfig, fads_generalize
    from pyfads.io import events_with_arrival

    cfg = FADSConfig(
        k=10,
        buffer_rows=30,
        reuse_ms=60_000,
        qid_cols=("user_id", "value", "ts_millis"),
        pid_col="event_id",
        arrival_col="arrival_ms",
    )
    return fads_generalize(events_with_arrival(spark, sf_dir), cfg)


@query("fads_partitioned_events")
def fads_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-out FADS (SURVEY.md §2.5.9): independent per-event_type groups."""
    from pyfads import FADSConfig, fads_generalize_partitioned
    from pyfads.io import events_with_arrival

    cfg = FADSConfig(
        k=5,
        buffer_rows=15,
        reuse_ms=60_000,
        qid_cols=("user_id", "value", "ts_millis"),
        pid_col="event_id",
        arrival_col="arrival_ms",
    )
    return fads_generalize_partitioned(
        events_with_arrival(spark, sf_dir), cfg, "event_type"
    )


def _register_primitives() -> None:
    from pyfads import primitives_queries  # noqa: F401  (registers on import)


def _register_llm_ops() -> None:
    from pyfads import llm_queries  # noqa: F401


for _reg in (_register_primitives, _register_llm_ops):
    try:
        _reg()
    except ImportError:
        # module not built yet — registry stays partial during bring-up
        pass
