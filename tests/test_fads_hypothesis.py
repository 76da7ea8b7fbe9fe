"""Hypothesis fuzz of the FADS core: random data x random config, checking
the k-anonymity invariants and agreement between the two independent
implementations (numpy state machine vs pure-Python golden oracle).
Pure-pandas — no SparkSession, so the fuzz loop stays fast."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pyfads import FADSConfig
from pyfads.fads_batch import run_fads_pandas
from pyfads.oracle import fads_oracle

QIDS = ("user_id", "value", "ts_millis")


def _cfg(k: int, buffer_rows: int, reuse_ms: int) -> FADSConfig:
    return FADSConfig(
        k=k,
        buffer_rows=buffer_rows,
        reuse_ms=reuse_ms,
        qid_cols=QIDS,
        pid_col="event_id",
        arrival_col="arrival_ms",
    )


@st.composite
def fads_case(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    k = draw(st.integers(min_value=2, max_value=12))
    buffer_rows = draw(st.integers(min_value=k, max_value=40))
    reuse_ms = draw(st.sampled_from([0, 1, 1_000, 10**9]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            # small integer domains force duplicate QID values (degenerate
            # boxes, zero global ranges) — the edge cases that matter
            "user_id": rng.integers(0, max(n // 4, 2), n).astype(float),
            "value": rng.integers(-3, 4, n).astype(float),
            "ts_millis": np.sort(rng.integers(0, 5_000, n)).astype(float),
        }
    )
    pdf["arrival_ms"] = pdf["ts_millis"].astype(np.int64)
    return pdf, _cfg(k, buffer_rows, reuse_ms)


@st.composite
def dup_pid_case(draw):
    """Random data with a heavily-duplicated PID column, both kNN modes."""
    n = draw(st.integers(min_value=1, max_value=100))
    k = draw(st.integers(min_value=2, max_value=8))
    buffer_rows = draw(st.integers(min_value=k, max_value=30))
    n_pids = draw(st.integers(min_value=1, max_value=max(n // 3, 1)))
    strict = draw(st.booleans())
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "row_uid": np.arange(n),
            "person": rng.integers(0, n_pids, n),
            "user_id": rng.integers(0, max(n // 4, 2), n).astype(float),
            "value": rng.integers(-3, 4, n).astype(float),
            "ts_millis": np.sort(rng.integers(0, 5_000, n)).astype(float),
        }
    )
    pdf["arrival_ms"] = pdf["ts_millis"].astype(np.int64)
    cfg = FADSConfig(
        k=k,
        buffer_rows=buffer_rows,
        reuse_ms=draw(st.sampled_from([0, 1_000, 10**9])),
        qid_cols=QIDS,
        pid_col="person",
        arrival_col="arrival_ms",
        distinct_pids=strict,
    )
    return pdf, cfg


@settings(max_examples=40, deadline=None)
@given(dup_pid_case())
def test_fads_fuzz_distinct_pids_oracle_parity(case):
    pdf, cfg = case
    out = run_fads_pandas(pdf, cfg)
    assert sorted(out["row_uid"]) == sorted(pdf["row_uid"])
    for q in cfg.qid_cols:
        assert (out[f"{q}_lo"] <= out[f"{q}_hi"]).all()

    # oracle consumes rows in the exact order run_fads_pandas sorts them
    s = pdf.sort_values(["arrival_ms", "person"], kind="mergesort").reset_index(drop=True)
    rows = [
        (i, tuple(s.loc[i, c] for c in cfg.qid_cols), int(s.loc[i, "arrival_ms"]),
         int(s.loc[i, "person"]))
        for i in range(len(s))
    ]
    expected = fads_oracle(rows, cfg)
    got = out.set_index("row_uid")
    for i, (lo, hi) in expected.items():
        uid = int(s.loc[i, "row_uid"])
        for j, q in enumerate(cfg.qid_cols):
            assert got.loc[uid, f"{q}_lo"] == pytest.approx(lo[j])
            assert got.loc[uid, f"{q}_hi"] == pytest.approx(hi[j])


@settings(max_examples=40, deadline=None)
@given(fads_case())
def test_fads_fuzz_invariants_and_oracle_parity(case):
    pdf, cfg = case
    out = run_fads_pandas(pdf, cfg)

    # |out| == |in| and ids are a permutation (G14: everything flushes)
    assert sorted(out["event_id"]) == sorted(pdf["event_id"])

    # intervals are well-formed and inside global bounds
    for q in cfg.qid_cols:
        assert (out[f"{q}_lo"] <= out[f"{q}_hi"]).all()
        assert (out[f"{q}_lo"] >= pdf[q].min() - 1e-9).all()
        assert (out[f"{q}_hi"] <= pdf[q].max() + 1e-9).all()

    # independent-implementation agreement, row for row
    rows = [
        (i, tuple(pdf.loc[i, c] for c in cfg.qid_cols), int(pdf.loc[i, cfg.arrival_col]))
        for i in range(len(pdf))
    ]
    expected = fads_oracle(rows, cfg)
    got = out.set_index("event_id")
    for i, (lo, hi) in expected.items():
        eid = int(pdf.loc[i, "event_id"])
        for j, q in enumerate(cfg.qid_cols):
            assert got.loc[eid, f"{q}_lo"] == pytest.approx(lo[j])
            assert got.loc[eid, f"{q}_hi"] == pytest.approx(hi[j])


@settings(max_examples=25, deadline=None)
@given(fads_case(), st.integers(min_value=0, max_value=120))
def test_stream_codec_resume_equivalence(case, split_raw):
    """Fuzzed restart guarantee: cutting a random stream at a random point,
    round-tripping the state through the versioned codec, and resuming must
    release exactly what the uninterrupted run releases (incl. flush)."""
    from pyfads.fads_stream import decode_state, encode_state, make_stream_handler
    from tests.test_fads_stream import FakeState

    pdf, cfg = case
    split = min(split_raw, len(pdf))
    cols = list(pdf.columns)

    def run(batches):
        h = make_stream_handler(cfg, cols, 1000)
        fake = FakeState()
        out = []
        for b in batches:
            out += list(h((1,), iter([b]), fake))
            if fake._v is not None:  # explicit codec round trip between batches
                fads, pending = decode_state(fake._v[0], cfg)
                fake._v = (encode_state(fads, pending),)
        fake.hasTimedOut = True
        out += list(h((1,), iter([]), fake))
        return (
            pd.concat(out).sort_values("event_id").reset_index(drop=True)
            if out
            else pd.DataFrame()
        )

    cont = run([pdf])
    resumed = run([pdf.iloc[:split], pdf.iloc[split:]])
    pd.testing.assert_frame_equal(cont, resumed, check_dtype=False)
