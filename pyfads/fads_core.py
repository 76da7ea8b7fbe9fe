"""FADS state machine — the sequential core shared by batch and streaming.

Re-implements the semantics of the reference's stateful ProcessFunction
(reference Generalizer.java:98-133 per-element loop, :136-189 release
decision, :59-74 end-of-stream flush, Cluster.java:18-85 bounding box /
fits / infoLoss) with the paper-intended fixes recorded in SURVEY.md §2.5:

1. kNN distance is ``abs(delta) / (hi - lo)`` over the *actual QID columns*
   (the reference has a precedence bug and indexes fields 0..n-1 instead of
   through ``keys[]`` — Generalizer.java:356).
2. ``bufferConstraint`` is a row *count* (Generalizer.java:123), not a time.
3. Suppression snapshots the global bounds at release time (the reference
   aliases the still-mutating bounds array — Generalizer.java:249 + :112-113).
4. infoLoss guards division by zero when a global range is 0
   (Cluster.java:82 would produce Inf/NaN); a zero global range contributes 0.
5. Time is a *logical arrival clock* (caller-supplied monotone longs, e.g.
   event-time millis or a sequence) instead of ``System.currentTimeMillis()``
   — deterministic and replayable.
6. kNN ties break by buffer (arrival) order via a stable sort; cluster-argmin
   ties break by creation order, first wins (the reference's PriorityQueue
   iteration order is an implementation detail).

The per-release work is vectorized with numpy over the (tiny, <=
``buffer_rows``) buffer, so the Python-level loop is O(n) with small
constants — this is the hot path of the batch ``applyInPandas`` wrapper and
of the streaming state handle.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np

from pyfads.config import FADSConfig

__all__ = ["FADSState", "ReleasedBatch"]


@dataclass
class _Cluster:
    """Axis-aligned QID bounding box + creation time (Cluster.java:14-15)."""

    lo: np.ndarray  # shape (d,)
    hi: np.ndarray  # shape (d,)
    created: int  # logical arrival clock at creation


@dataclass
class ReleasedBatch:
    """Released rows: original row ids + the interval assigned to each."""

    row_ids: list = field(default_factory=list)
    lo: list = field(default_factory=list)  # list of (d,) arrays
    hi: list = field(default_factory=list)


class FADSState:
    """Incremental FADS k-anonymizer over rows of (row_id, qid_vector, arrival).

    ``process(row_ids, qids, arrivals)`` consumes rows in the given order and
    returns whatever was released by buffer pressure; ``flush()`` drains the
    buffer at end-of-stream (reference close(), Generalizer.java:59-74).
    """

    def __init__(self, cfg: FADSConfig):
        self.cfg = cfg
        self.d = len(cfg.qid_cols)
        self.glo = np.full(self.d, np.inf)
        self.ghi = np.full(self.d, -np.inf)
        # buffer of (row_id, qid (d,), arrival) in arrival order (G1)
        self.buffer: deque = deque()
        # live clusters in creation order (creation times are nondecreasing
        # on the logical clock, so a deque pops expiry in order) (G3)
        self.clusters: deque[_Cluster] = deque()
        self.last_arrival: int = 0

    # -- primitives -------------------------------------------------------

    def _update_bounds(self, q: np.ndarray) -> None:
        """G2 running global min/max (Generalizer.java:107-115)."""
        np.minimum(self.glo, q, out=self.glo)
        np.maximum(self.ghi, q, out=self.ghi)

    def _expire_clusters(self, now: int) -> None:
        """G3 TTL expiry (Generalizer.java:117-120)."""
        reuse = self.cfg.reuse_ms
        while self.clusters and self.clusters[0].created + reuse < now:
            self.clusters.popleft()

    def _info_loss(self, lo: np.ndarray, hi: np.ndarray) -> float:
        """G8 (Cluster.java:79-85) with the zero-global-range guard."""
        grange = self.ghi - self.glo
        with np.errstate(invalid="ignore", divide="ignore"):
            terms = np.where(grange > 0, (hi - lo) / grange, 0.0)
        return float(terms.mean())

    def _best_fitting_cluster(self, q: np.ndarray) -> _Cluster | None:
        """G9 argmin infoLoss among strictly-fitting clusters
        (Generalizer.java:230-243; fits: Cluster.java:55-62, strict)."""
        best = None
        best_il = np.inf
        for c in self.clusters:
            if np.all(q > c.lo) and np.all(q < c.hi):
                il = self._info_loss(c.lo, c.hi)
                if il < best_il:  # strict < : first-created wins ties
                    best, best_il = c, il
        return best

    # -- release decision (G12, Generalizer.java:136-189) ------------------

    def _release_without_cluster(self, out: ReleasedBatch, row_id, q) -> None:
        """Reuse the best fitting old cluster, else suppress (the shared
        fallback of Generalizer.java:140-149 and :177-188)."""
        c = self._best_fitting_cluster(q)
        if c is not None:
            out.row_ids.append(row_id)
            out.lo.append(c.lo)
            out.hi.append(c.hi)
        else:
            # G11 suppress with a *snapshot* of the global bounds
            out.row_ids.append(row_id)
            out.lo.append(self.glo.copy())
            out.hi.append(self.ghi.copy())

    def _release_oldest(self, out: ReleasedBatch, now: int) -> None:
        row_id, q, _arr, _pid, lq = self.buffer.popleft()
        k1 = self.cfg.k - 1
        if len(self.buffer) < k1:
            # cannot form a new cluster: reuse best old cluster or suppress
            self._release_without_cluster(out, row_id, q)
            return

        buf_q = np.stack([b[1] for b in self.buffer])  # (B, d)
        if self.cfg.legacy_distance:
            # shipped-bug parity (Generalizer.java:356): (abs(delta)/hi)-lo
            # over the raw legacy fields, no zero guard; NaN/Inf flow
            # through the stable argsort (NaN ordered last)
            l_buf = np.stack([b[4] for b in self.buffer])
            with np.errstate(invalid="ignore", divide="ignore"):
                per_dim = np.abs(l_buf - lq) / self.ghi - self.glo
            dists = per_dim.mean(axis=1)
        else:
            # G5 intended: k-1 nearest by mean over dims of abs(delta)/(ghi-glo)
            grange = self.ghi - self.glo
            with np.errstate(invalid="ignore", divide="ignore"):
                per_dim = np.where(grange > 0, np.abs(buf_q - q) / grange, 0.0)
            dists = per_dim.mean(axis=1)
        if self.cfg.distinct_pids:
            # Intended PID-uniqueness filter (Generalizer.java:205-216, the
            # commented-out check): walk the stable distance order, greedily
            # taking the nearest neighbour whose PID is not already among the
            # chosen neighbours.  The pivot's own PID is NOT pre-excluded
            # (the reference's uniqueKeys map starts empty).  If fewer than
            # k-1 unique-PID neighbours exist, knn() returns null and the
            # caller reuses an old cluster / suppresses; the buffer is
            # untouched (Generalizer.java:177-188).
            buf = list(self.buffer)
            chosen: list[int] = []
            seen: set = set()
            for j in np.argsort(dists, kind="stable"):
                pid = buf[j][3]
                if pid in seen:
                    continue
                seen.add(pid)
                chosen.append(int(j))
                if len(chosen) == k1:
                    break
            if len(chosen) < k1:
                self._release_without_cluster(out, row_id, q)
                return
            order = np.asarray(chosen)
        else:
            order = np.argsort(dists, kind="stable")[:k1]

        # G6: cluster box over the k-1 *neighbours only* (the pivot is
        # generalized with the neighbours' box even if it lies outside —
        # shipped reference behavior, Generalizer.java:155,173)
        nb_q = buf_q[order]
        knn_lo = nb_q.min(axis=0)
        knn_hi = nb_q.max(axis=0)

        old = self._best_fitting_cluster(q)
        if old is not None and self._info_loss(old.lo, old.hi) < self._info_loss(
            knn_lo, knn_hi
        ):
            # reuse old cluster; neighbours stay buffered (Generalizer.java:162-165)
            out.row_ids.append(row_id)
            out.lo.append(old.lo)
            out.hi.append(old.hi)
            return

        # release pivot + neighbours with the new cluster, cache it
        # (Generalizer.java:166-176)
        nb_set = set(order.tolist())
        kept = deque()
        for i, item in enumerate(self.buffer):
            if i in nb_set:
                out.row_ids.append(item[0])
                out.lo.append(knn_lo)
                out.hi.append(knn_hi)
            else:
                kept.append(item)
        self.buffer = kept
        out.row_ids.append(row_id)
        out.lo.append(knn_lo)
        out.hi.append(knn_hi)
        self.clusters.append(_Cluster(knn_lo, knn_hi, now))

    # -- public API --------------------------------------------------------

    def process(
        self, row_ids, qids: np.ndarray, arrivals, pids=None, legacy_vals=None
    ) -> ReleasedBatch:
        """Consume rows (already in arrival order); return released rows.

        Per-element loop of Generalizer.java:98-133: buffer -> update global
        bounds -> expire clusters -> release oldest on buffer overflow.

        ``pids`` (optional) carries the PID value per row for the
        ``distinct_pids`` kNN filter; when omitted, ``row_ids`` double as
        PIDs (true for the streaming wrappers, which key rows by pid_col).
        ``legacy_vals`` (optional, (n, d)) carries the raw-field values the
        ``legacy_distance`` mode measures distances on; defaults to the
        QID vectors.
        """
        out = ReleasedBatch()
        B = self.cfg.buffer_rows
        if pids is None:
            pids = row_ids
        qids = np.asarray(qids, dtype=np.float64)
        if legacy_vals is None:
            legacy_vals = qids
        else:
            legacy_vals = np.asarray(legacy_vals, dtype=np.float64)
        for rid, q, arr, pid, lq in zip(row_ids, qids, arrivals, pids, legacy_vals):
            arr = int(arr)
            self.last_arrival = arr
            self.buffer.append((rid, q, arr, pid, lq))
            self._update_bounds(q)
            self._expire_clusters(arr)
            if len(self.buffer) > B:
                self._release_oldest(out, arr)
        return out

    def flush(self) -> ReleasedBatch:
        """End-of-stream drain (reference close(), Generalizer.java:59-74)."""
        out = ReleasedBatch()
        now = self.last_arrival
        while self.buffer:
            self._release_oldest(out, now)
        return out
