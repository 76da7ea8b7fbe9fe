"""Batch FADS generalization as a Spark DataFrame transformation.

The reference runs its FADS ProcessFunction at parallelism 1 over an
unbounded stream (TransactionGeneralizationJob.java:40, Generalizer.java).
The batch equivalent is ``groupBy(<one group>).applyInPandas(...)`` over
arrival-sorted rows — one Arrow batch stream through the sequential state
machine in :mod:`pyfads.fads_core`.

Two modes:

- :func:`fads_generalize` — **parity mode**: a single group reproduces the
  reference's sequential, order-sensitive semantics exactly.  By design this
  puts all rows through one task (the reference is parallelism-1 too); it is
  the correctness mode, not the scale mode.
- :func:`fads_generalize_partitioned` — **scale-out mode** (SURVEY.md
  §2.5.9): hash-partition on a key, run an independent FADS instance per
  group in parallel.  k-anonymity holds *within* each group (each released
  interval still covers >= k rows of its group); global bounds are per-group.
  This is the 100 TB path: work fans out across executors with a single
  shuffle on the partition key and no driver involvement.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from pyfads.config import FADSConfig
from pyfads.fads_core import FADSState, ReleasedBatch
from pyfads.schema import fads_output_schema

__all__ = ["fads_generalize", "fads_generalize_partitioned", "run_fads_pandas"]


def _assemble(pdf: pd.DataFrame, batches: Iterable[ReleasedBatch], cfg: FADSConfig) -> pd.DataFrame:
    """Build the output frame: passthrough cols by released row position,
    plus <qid>_lo/<qid>_hi columns."""
    row_ids: list[int] = []
    los: list[np.ndarray] = []
    his: list[np.ndarray] = []
    for b in batches:
        row_ids.extend(b.row_ids)
        los.extend(b.lo)
        his.extend(b.hi)
    idx = np.asarray(row_ids, dtype=np.int64)
    lo_m = np.vstack(los) if los else np.empty((0, len(cfg.qid_cols)))
    hi_m = np.vstack(his) if his else np.empty((0, len(cfg.qid_cols)))

    out = {}
    for col in pdf.columns:
        if col in cfg.qid_cols:
            continue
        out[col] = pdf[col].to_numpy()[idx]
    for j, q in enumerate(cfg.qid_cols):
        out[f"{q}_lo"] = lo_m[:, j]
        out[f"{q}_hi"] = hi_m[:, j]
    # column order must match fads_output_schema: input order with each QID
    # expanded in place
    cols = []
    for col in pdf.columns:
        if col in cfg.qid_cols:
            cols += [f"{col}_lo", f"{col}_hi"]
        else:
            cols.append(col)
    return pd.DataFrame(out)[cols]


def run_fads_pandas(pdf: pd.DataFrame, cfg: FADSConfig) -> pd.DataFrame:
    """Run the full FADS loop + flush over one pandas partition (one group)."""
    pdf = pdf.sort_values([cfg.arrival_col, cfg.pid_col], kind="mergesort").reset_index(
        drop=True
    )
    qids = pdf[list(cfg.qid_cols)].to_numpy(dtype=np.float64)
    arrivals = pdf[cfg.arrival_col].to_numpy(dtype=np.int64)
    state = FADSState(cfg)
    legacy = None
    if cfg.legacy_distance:
        lcols = list(cfg.legacy_distance_cols or cfg.qid_cols)
        legacy = pdf[lcols].to_numpy(dtype=np.float64)
    released = state.process(
        np.arange(len(pdf)),
        qids,
        arrivals,
        pids=pdf[cfg.pid_col].to_numpy(),
        legacy_vals=legacy,
    )
    tail = state.flush()
    return _assemble(pdf, (released, tail), cfg)


def _check_cols(df: DataFrame, cfg: FADSConfig) -> None:
    missing = [
        c
        for c in (
            *cfg.qid_cols,
            cfg.pid_col,
            cfg.arrival_col,
            *(cfg.legacy_distance_cols or () if cfg.legacy_distance else ()),
        )
        if c not in df.columns
    ]
    if missing:
        raise ValueError(f"input is missing required columns: {missing}")


def fads_generalize(df: DataFrame, cfg: FADSConfig) -> DataFrame:
    """Parity-mode batch FADS: single sequential group (reference semantics).

    Input must carry ``cfg.arrival_col`` (long arrival clock) — see
    ``pyfads.io.with_arrival``.  Output: non-QID columns pass through, each
    QID becomes ``<col>_lo``/``<col>_hi`` (Generalizer.java:259-269).
    """
    _check_cols(df, cfg)
    out_schema = fads_output_schema(df.schema, cfg)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return run_fads_pandas(pdf, cfg)

    return df.groupBy(F.lit(1).alias("__g")).applyInPandas(fn, out_schema)


def fads_generalize_partitioned(
    df: DataFrame,
    cfg: FADSConfig,
    partition_col: str,
    max_group_rows: int | None = None,
) -> DataFrame:
    """Scale-out batch FADS: independent FADS per ``partition_col`` group.

    One shuffle on the partition key, then embarrassingly parallel; each
    group's rows are k-anonymized against that group's own global bounds.

    ``max_group_rows`` is the hot-key guard (same discipline as the dedup
    side's ``_salt_cap``): the sequential per-group state machine makes one
    10x-hot key a 10x-long straggler task at 100 TB.  When set, each group
    is sub-split into arrival-contiguous runs of at most ``max_group_rows``
    rows (row_number over the group's arrival order), and FADS runs
    independently per run — so max task size is bounded at
    ``max_group_rows`` regardless of key skew.  Semantics: k-anonymity and
    global bounds hold *within each run* (each run behaves like its own
    bounded stream); releases never mix rows across runs.
    """
    _check_cols(df, cfg)
    if partition_col in cfg.qid_cols:
        raise ValueError("partition_col cannot be a QID column")
    if max_group_rows is not None and max_group_rows < cfg.buffer_rows + 1:
        raise ValueError("max_group_rows must exceed buffer_rows (a run smaller "
                         "than the buffer never overflows and only ever flushes)")
    out_schema = fads_output_schema(df.schema, cfg)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return run_fads_pandas(pdf.drop(columns="__fads_run", errors="ignore"), cfg)

    if max_group_rows is None:
        return df.groupBy(partition_col).applyInPandas(fn, out_schema)

    w = Window.partitionBy(partition_col).orderBy(cfg.arrival_col, cfg.pid_col)
    salted = df.withColumn(
        "__fads_run",
        ((F.row_number().over(w) - 1) / F.lit(max_group_rows)).cast("long"),
    )
    return salted.groupBy(partition_col, "__fads_run").applyInPandas(fn, out_schema)
