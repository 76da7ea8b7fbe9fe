"""Hypothesis fuzz of the MMR greedy core (pyfads.similarity.mmr_select):
random candidate geometries x random (k, lam), checking the selection
invariants and that every pick is the true argmax of the MMR objective
given the prefix picked so far.  Pure numpy — no SparkSession, so the
fuzz loop stays fast.  This is the function BOTH the Spark worker and the
DuckDB golden-oracle builder call, so fuzzing it covers the shared core
of the retrieval_mmr gate entry."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pyfads.similarity import mmr_select


def _sims(M: np.ndarray) -> np.ndarray:
    norms = np.sqrt((M * M).sum(axis=1))
    return (M[:, None, :] * M[None, :, :]).sum(axis=2) / np.outer(norms, norms)


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=12),
    dim=st.integers(min_value=2, max_value=8),
    k=st.integers(min_value=1, max_value=15),
    lam_pct=st.integers(min_value=0, max_value=100),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_mmr_select_invariants(n, dim, k, lam_pct, seed):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, dim))
    # keep vectors away from zero norm (the caller filters those)
    M[np.sqrt((M * M).sum(axis=1)) < 1e-6] += 1.0
    ids = sorted(int(x) for x in rng.choice(10_000, size=n, replace=False))
    qv = rng.normal(size=dim)
    qv /= np.linalg.norm(qv)
    rel = (M @ qv) / np.sqrt((M * M).sum(axis=1))
    lam = np.float64(lam_pct) / np.float64(100.0)

    out = mmr_select(ids, rel.astype(np.float64), M.astype(np.float64), k, float(lam))

    # shape invariants: min(k, n) unique picks, contiguous ranks from 1
    assert len(out) == min(k, n)
    assert [r for _, r, _ in out] == list(range(1, len(out) + 1))
    assert len({nid for nid, _, _ in out}) == len(out)
    picked_ids = [nid for nid, _, _ in out]
    assert set(picked_ids) <= set(ids)

    # each pick is the exact argmax of the MMR objective given its prefix
    sims = _sims(M.astype(np.float64))
    idx_of = {v: i for i, v in enumerate(ids)}
    chosen: list[int] = []
    for step, (nid, _r, micros) in enumerate(out, start=1):
        best = None
        for cand in ids:
            i = idx_of[cand]
            if cand in picked_ids[: step - 1]:
                continue
            pen = (
                max(np.float64(sims[i, idx_of[c]]) for c in chosen)
                if chosen
                else np.float64(0.0)
            )
            score = lam * np.float64(rel[i]) - (np.float64(1.0) - lam) * pen
            if best is None or score > best[1] or (score == best[1] and cand < best[0]):
                best = (cand, score)
        assert nid == best[0], (step, nid, best, out)
        assert micros == int(np.round(best[1] * 1e6))
        chosen.append(nid)


def test_mmr_select_empty_and_degenerate():
    assert mmr_select([], np.array([]), np.zeros((0, 4)), 5, 0.7) == []
    # single candidate: rank 1, objective lam * rel
    out = mmr_select(
        [42], np.array([0.5]), np.array([[1.0, 0.0]]), 3, 0.7
    )
    assert out == [(42, 1, int(np.round(np.float64(0.7) * np.float64(0.5) * 1e6)))]
