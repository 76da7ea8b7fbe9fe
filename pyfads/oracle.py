"""Pure-Python FADS golden oracle for tests.

A deliberately simple, list-based re-statement of the FADS semantics
(reference Generalizer.java:98-257 / Cluster.java:18-85 with the SURVEY.md
§2.5 intended-semantics fixes — same divergence list as
``pyfads.fads_core``).  No numpy, no shared code with the production state
machine: the test asserts the two independent implementations agree row for
row (SURVEY.md §5 item 2).
"""

from __future__ import annotations

from pyfads.config import FADSConfig

__all__ = ["fads_oracle"]


def _info_loss(lo, hi, glo, ghi):
    terms = []
    for i in range(len(lo)):
        gr = ghi[i] - glo[i]
        terms.append((hi[i] - lo[i]) / gr if gr > 0 else 0.0)
    return sum(terms) / len(terms)


def _fits(q, lo, hi):
    return all(lo[i] < q[i] < hi[i] for i in range(len(q)))


def _best_cluster(q, clusters, glo, ghi):
    best, best_il = None, float("inf")
    for c in clusters:  # creation order; strict < => first-created wins ties
        lo, hi, _created = c
        if _fits(q, lo, hi):
            il = _info_loss(lo, hi, glo, ghi)
            if il < best_il:
                best, best_il = c, il
    return best


def fads_oracle(rows, cfg: FADSConfig):
    """rows: iterable of (row_id, qid_tuple, arrival_int[, pid[, legacy_tuple]])
    in arrival order; when pid is omitted the row_id doubles as the PID;
    when legacy_tuple is omitted the QID tuple doubles as the legacy
    distance fields.

    Returns dict row_id -> (lo_tuple, hi_tuple).
    """
    d = len(cfg.qid_cols)
    glo = [float("inf")] * d
    ghi = [float("-inf")] * d
    buffer = []  # (row_id, q, arrival, pid, legacy_vals)
    clusters = []  # (lo, hi, created)
    released = {}

    def release_without_cluster(rid, q):
        c = _best_cluster(q, clusters, glo, ghi)
        if c is not None:
            released[rid] = (tuple(c[0]), tuple(c[1]))
        else:
            released[rid] = (tuple(glo), tuple(ghi))  # suppress snapshot

    def release_oldest(now):
        rid, q, _arr, _pid, lq = buffer.pop(0)
        if len(buffer) < cfg.k - 1:
            release_without_cluster(rid, q)
            return
        # k-1 nearest by mean normalized-L1; stable ties on buffer order.
        # legacy_distance reproduces the shipped (abs/hi)-lo precedence bug
        # over the raw legacy fields (Generalizer.java:356), no zero guard
        # (IEEE semantics emulated: x/0 -> +inf, 0/0 -> NaN, NaN last).
        if cfg.legacy_distance:

            def dist(item):
                s = 0.0
                for i in range(d):
                    num = abs(item[4][i] - lq[i])
                    if ghi[i] != 0.0:
                        s += num / ghi[i] - glo[i]
                    elif num == 0.0:
                        s += float("nan")
                    else:
                        s += float("inf") - glo[i]
                return s / d

        else:

            def dist(item):
                s = 0.0
                for i in range(d):
                    gr = ghi[i] - glo[i]
                    s += abs(item[1][i] - q[i]) / gr if gr > 0 else 0.0
                return s / d

        import math

        def nan_last(v, j):
            # numpy stable argsort: NaN sorts after +inf, stable among NaNs
            return (1, 0.0, j) if math.isnan(v) else (0, v, j)

        order = sorted(
            range(len(buffer)), key=lambda j: nan_last(dist(buffer[j]), j)
        )
        if cfg.distinct_pids:
            # greedy nearest-first with pairwise-distinct neighbour PIDs
            # (reference Generalizer.java:205-216, intended semantics)
            nb_idx, seen = [], set()
            for j in order:
                pid = buffer[j][3]
                if pid in seen:
                    continue
                seen.add(pid)
                nb_idx.append(j)
                if len(nb_idx) == cfg.k - 1:
                    break
            if len(nb_idx) < cfg.k - 1:
                release_without_cluster(rid, q)
                return
        else:
            nb_idx = order[: cfg.k - 1]
        nb = [buffer[j] for j in nb_idx]
        lo = tuple(min(t[1][i] for t in nb) for i in range(d))
        hi = tuple(max(t[1][i] for t in nb) for i in range(d))
        old = _best_cluster(q, clusters, glo, ghi)
        if old is not None and _info_loss(old[0], old[1], glo, ghi) < _info_loss(
            lo, hi, glo, ghi
        ):
            released[rid] = (tuple(old[0]), tuple(old[1]))
            return
        for j in sorted(nb_idx, reverse=True):
            nrid = buffer[j][0]
            released[nrid] = (lo, hi)
            del buffer[j]
        released[rid] = (lo, hi)
        clusters.append((list(lo), list(hi), now))

    last = 0
    for row in rows:
        rid, q, arr = row[0], row[1], row[2]
        pid = row[3] if len(row) > 3 else rid
        qt = tuple(float(x) for x in q)
        lq = tuple(float(x) for x in row[4]) if len(row) > 4 else qt
        last = arr
        buffer.append((rid, qt, int(arr), pid, lq))
        for i in range(d):
            glo[i] = min(glo[i], float(q[i]))
            ghi[i] = max(ghi[i], float(q[i]))
        while clusters and clusters[0][2] + cfg.reuse_ms < arr:
            clusters.pop(0)
        if len(buffer) > cfg.buffer_rows:
            release_oldest(int(arr))
    while buffer:
        release_oldest(last)
    return released
