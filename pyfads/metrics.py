"""Throughput measurement (P5) — the Spark-native replacement for the
reference's pass-through ParallelThroughputLogger
(ParallelThroughputLogger.java:76-101) and its history/mean accumulator
(ParallelThroughputStatistics.java:38-62).

In Spark, throughput is observed, not computed by a dataflow operator:

- streaming: ``StreamingQueryListener.onQueryProgress`` exposes
  ``processedRowsPerSecond`` per micro-batch — :class:`ThroughputListener`
  keeps the per-batch history and mean, mirroring the reference's logger.
- batch: :class:`BatchThroughput` wraps an action with wall-clock timing and
  a row count (optionally via ``df.observe`` so the count is a free
  side-product of the same job rather than a second scan).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

try:  # streaming listener (needs a streaming-capable session)
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore

__all__ = ["ThroughputListener", "BatchThroughput", "observe_count"]


class ThroughputListener(StreamingQueryListener):
    """Collects processedRowsPerSecond history across micro-batches.

    Mirrors the reference logger's behavior: periodic samples + full history
    + mean at close (ParallelThroughputLogger.java:44-48, 88-95).
    """

    def __init__(self, label: str = "ThroughputLogger"):
        self.label = label
        self.history: list[float] = []
        self.rows_total = 0

    # StreamingQueryListener interface
    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        rate = p.processedRowsPerSecond
        if rate is not None and rate > 0:
            self.history.append(float(rate))
        self.rows_total += int(p.numInputRows or 0)

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    @property
    def mean(self) -> float:
        """Mean of the per-batch history (ParallelThroughputStatistics.java:52-54)."""
        return sum(self.history) / len(self.history) if self.history else 0.0


@dataclass
class BatchThroughput:
    """Wall-clock + row-count throughput for batch actions.

    ``with BatchThroughput("fads") as t: n = do_action()``; set ``t.rows``
    before exit (or use :func:`observe_count`).  Keeps a history so repeated
    runs accumulate like the reference's statistics object.
    """

    label: str = "batch"
    rows: int = 0
    history: list[float] = field(default_factory=list)
    seconds: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        if self.rows and self.seconds > 0:
            self.history.append(self.rows / self.seconds)
        return False

    @property
    def rows_per_sec(self) -> float:
        return self.rows / self.seconds if self.seconds > 0 else 0.0

    @property
    def mean(self) -> float:
        return sum(self.history) / len(self.history) if self.history else 0.0


def observe_count(df: DataFrame, name: str = "tput") -> tuple[DataFrame, Observation]:
    """Attach a free row-count observation to a DataFrame: the count is
    produced by the same job that runs the action (no second scan)."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs
