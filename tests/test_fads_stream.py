"""Streaming FADS parity tests (P6 stream / G1 / G3 / G14).

Strategy: chunk the sf0.001 events into ordered parquet files, stream them
with ``maxFilesPerTrigger=1`` (3 micro-batches), and check that the
state-carrying streaming operator releases exactly what the batch run
releases before its end-of-stream flush — then that the timeout path and the
foreachBatch fallback produce the flush tail too."""

from __future__ import annotations

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from pyfads import FADSConfig
from pyfads.fads_batch import fads_generalize, run_fads_pandas
from pyfads.fads_core import FADSState
from pyfads.fads_stream import (
    ForeachBatchFADS,
    decode_state,
    encode_state,
    fads_generalize_stream,
    make_stream_handler,
)
from pyfads.io import events_with_arrival

SF_DIR = "/root/testdata/sf0.001"
N_CHUNKS = 3


def _cfg() -> FADSConfig:
    return FADSConfig(
        k=10,
        buffer_rows=30,
        reuse_ms=60_000,
        qid_cols=("user_id", "value", "ts_millis"),
        pid_col="event_id",
        arrival_col="arrival_ms",
    )


@pytest.fixture(scope="module")
def events_pdf(spark):
    return (
        events_with_arrival(spark, SF_DIR)
        .toPandas()
        .sort_values(["arrival_ms", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def chunk_dir(events_pdf, tmp_path_factory):
    """Events split into N ordered parquet files (mtime-ordered for the
    file source's processing order)."""
    d = tmp_path_factory.mktemp("event_chunks")
    for i, part in enumerate(np.array_split(events_pdf, N_CHUNKS)):
        p = d / f"chunk_{i}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return str(d)


def _expected_released(events_pdf, cfg):
    """Pure-Python expected: process-only releases (no flush) over the full
    arrival-ordered input."""
    st = FADSState(cfg)
    rel = st.process(
        events_pdf[cfg.pid_col].to_numpy(),
        events_pdf[list(cfg.qid_cols)].to_numpy(dtype=np.float64),
        events_pdf[cfg.arrival_col].to_numpy(dtype=np.int64),
    )
    # exact floats: the state machine only copies/min/maxes values, never
    # rounds — and np.round at epoch-millis magnitude introduces artifacts
    return {
        (int(pid), *map(float, lo), *map(float, hi))
        for pid, lo, hi in zip(rel.row_ids, rel.lo, rel.hi)
    }, st


def _rows_to_set(rows, cfg):
    qid = list(cfg.qid_cols)
    return {
        (
            int(r["event_id"]),
            *[float(r[f"{q}_lo"]) for q in qid],
            *[float(r[f"{q}_hi"]) for q in qid],
        )
        for r in rows
    }


def test_stream_releases_match_batch_process(spark, events_pdf, chunk_dir):
    cfg = _cfg()
    src = (
        spark.readStream.schema(
            spark.createDataFrame(events_pdf.head(1)).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )
    out = fads_generalize_stream(src, cfg, flush_after_ms=3_600_000)
    # NB: with a processing-time timeout armed the query keeps scheduling
    # state-cleanup batches, so processAllAvailable/availableNow never
    # terminate — poll the sink for the expected release count instead
    expected_n = len(events_pdf) - cfg.buffer_rows
    q = (
        out.writeStream.format("memory")
        .queryName("fads_stream_out")
        .outputMode("append")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 240
        while _t.time() < deadline:
            if spark.table("fads_stream_out").count() >= expected_n:
                break
            _t.sleep(2)
        got = spark.table("fads_stream_out").collect()
    finally:
        q.stop()
    expected, _ = _expected_released(events_pdf, cfg)
    assert _rows_to_set(got, cfg) == expected
    # releases strictly precede the flush tail: buffer_rows stay pending
    assert len(got) == len(events_pdf) - cfg.buffer_rows


@pytest.mark.parametrize("n_chunks", [8])
def test_stream_parity_many_chunks(
    spark, events_pdf, tmp_path_factory, n_chunks
):
    """r11 verdict item 7: the 3-chunk parity tests exercise only two
    state-store boundary crossings — prove the stream==batch contract is
    not an artifact of few boundaries by replaying the same fixture as 8
    micro-batches (7 pickle round-trips through the state store).
    Positional splits are value-safe here: arrival_ms is unique in the
    fixture (verified), so no tied arrivals can straddle a chunk."""
    cfg = _cfg()
    d = tmp_path_factory.mktemp(f"event_chunks_{n_chunks}")
    for i, part in enumerate(np.array_split(events_pdf, n_chunks)):
        p = d / f"chunk_{i}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    src = (
        spark.readStream.schema(spark.createDataFrame(events_pdf.head(1)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = fads_generalize_stream(src, cfg, flush_after_ms=3_600_000)
    expected_n = len(events_pdf) - cfg.buffer_rows
    q = (
        out.writeStream.format("memory")
        .queryName("fads_stream_out8")
        .outputMode("append")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 240
        while _t.time() < deadline:
            if spark.table("fads_stream_out8").count() >= expected_n:
                break
            _t.sleep(2)
        got = spark.table("fads_stream_out8").collect()
    finally:
        q.stop()
    expected, _ = _expected_released(events_pdf, cfg)
    assert _rows_to_set(got, cfg) == expected
    assert len(got) == expected_n


class FakeState:
    """Minimal GroupState stand-in for driving the handler directly."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None
        self.removed = False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self.removed = True
        self.exists = False

    def setTimeoutDuration(self, ms):
        pass


def test_timeout_flush_drains_buffer(events_pdf):
    """G14: the idle-timeout path emits exactly the buffered tail with the
    same intervals the batch flush assigns."""
    cfg = _cfg()

    handler = make_stream_handler(cfg, list(events_pdf.columns), 1000)
    st = FakeState()
    released = list(handler((1,), iter([events_pdf]), st))
    assert st.exists  # buffer carried in state

    st.hasTimedOut = True
    flushed = list(handler((1,), iter([]), st))
    assert st.removed
    tail = pd.concat(flushed)
    assert len(tail) == cfg.buffer_rows

    # batch run == stream releases + stream flush, row for row
    batch = run_fads_pandas(events_pdf, cfg)
    stream_all = pd.concat([*released, tail])
    b = batch.sort_values("event_id").reset_index(drop=True)
    s = stream_all[b.columns].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, s, check_dtype=False)


def test_foreach_batch_fallback_parity(spark, events_pdf, chunk_dir):
    cfg = _cfg()
    src = (
        spark.readStream.schema(spark.createDataFrame(events_pdf.head(1)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )
    fb = ForeachBatchFADS(cfg)
    q = src.writeStream.foreachBatch(fb).trigger(availableNow=True).start()
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    tail = fb.flush()
    stream_all = pd.concat([*fb.outputs, tail])

    batch = fads_generalize(
        events_with_arrival(spark, SF_DIR), cfg
    ).toPandas()
    b = batch.sort_values("event_id").reset_index(drop=True)
    s = stream_all[b.columns].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, s, check_dtype=False)


def test_stream_state_codec_roundtrip(events_pdf):
    """encode/decode is lossless: same bounds, buffer, clusters, pending —
    and the blob holds plain builtins only (no pyfads/pandas/numpy classes,
    so a code upgrade mid-stream cannot break checkpointed state)."""
    import pickletools

    cfg = _cfg()
    st = FADSState(cfg)
    st.process(
        events_pdf[cfg.pid_col].to_numpy()[:100],
        events_pdf[list(cfg.qid_cols)].to_numpy(dtype=np.float64)[:100],
        events_pdf[cfg.arrival_col].to_numpy(dtype=np.int64)[:100],
    )
    pending = events_pdf.head(50).copy()
    # a datetime passthrough column must NOT smuggle pandas Timestamp class
    # references into the blob (datetime64 round-trips through int64)
    pending["ingested_at"] = (
        pd.to_datetime("2024-06-01") + pd.to_timedelta(pending.index, unit="s")
    ).astype("datetime64[us]")
    pending.index = pending[cfg.pid_col]
    blob = encode_state(st, pending)
    # no GLOBAL opcode => no class references anywhere in the pickle stream
    ops = [op.name for op, _arg, _pos in pickletools.genops(blob)]
    assert "GLOBAL" not in ops and "STACK_GLOBAL" not in ops

    st2, pending2 = decode_state(blob, cfg)
    assert len(st2.buffer) == len(st.buffer)
    assert np.array_equal(st2.glo, st.glo)
    assert np.array_equal(st2.ghi, st.ghi)
    for (r1, q1, a1, p1, l1), (r2, q2, a2, p2, l2) in zip(st.buffer, st2.buffer):
        assert (r1, a1, p1) == (r2, a2, p2)
        assert np.array_equal(q1, q2) and np.array_equal(l1, l2)
    assert len(st2.clusters) == len(st.clusters)
    pd.testing.assert_frame_equal(pending, pending2)


# A v1 state blob frozen at the codec's introduction: cfg (k=3, buffer=5,
# reuse=1000, qids=(x, y), pid/arr), 8 rows of _codec_fixture_pdf processed
# through make_stream_handler.  Every future build must keep decoding it —
# this is the upgrade-across-code-change guarantee a mid-stream checkpoint
# relies on.
_FROZEN_V1_BLOB = (
    "gASVrQIAAAAAAAB9lCiMAXaUSwGMA2dsb5RdlChHP+AAAAAAAABHQAIAAAAAAABljANnaGmUXZQoR0ARAAAAAAAAR0AjAAAA"
    "AAAAZYwGYnVmZmVylF2UKChLAV2UKEc/+AAAAAAAAEdAIwAAAAAAAGVLZEsBXZQoRz/4AAAAAAAAR0AjAAAAAAAAZXSUKEsC"
    "XZQoR0ARAAAAAAAAR0ACAAAAAAAAZUvISwJdlChHQBEAAAAAAABHQAIAAAAAAABldJQoSwNdlChHP+AAAAAAAABHQCEAAAAA"
    "AABlTSwBSwNdlChHP+AAAAAAAABHQCEAAAAAAABldJQoSwZdlChHP/AAAAAAAABHQCIAAAAAAABlTVgCSwZdlChHP/AAAAAA"
    "AABHQCIAAAAAAABldJQoSwddlChHQBAAAAAAAABHQAgAAAAAAABlTbwCSwddlChHQBAAAAAAAABHQAgAAAAAAABldJRljAhj"
    "bHVzdGVyc5RdlF2UKEdABgAAAAAAAEdAEwAAAAAAAGVdlChHQAwAAAAAAABHQBoAAAAAAABlTfQBh5RhjAxsYXN0X2Fycml2"
    "YWyUTbwCjAdwZW5kaW5nlH2UKIwEY29sc5RdlCiMA3BpZJSMAXiUjAF5lIwDYXJylGWMBmR0eXBlc5RdlCiMBWludDY0lIwH"
    "ZmxvYXQ2NJSMB2Zsb2F0NjSUjAVpbnQ2NJRljARkYXRhlH2UKGghXZQoSwFLAksDSwZLB2VoIl2UKEc/+AAAAAAAAEdAEQAA"
    "AAAAAEc/4AAAAAAAAEc/8AAAAAAAAEdAEAAAAAAAAGVoI12UKEdAIwAAAAAAAEdAAgAAAAAAAEdAIQAAAAAAAEdAIgAAAAAA"
    "AEdACAAAAAAAAGVoJF2UKEtkS8hNLAFNWAJNvAJldYwJaW5kZXhfY29slGghdXUu"
)


def _codec_cfg() -> FADSConfig:
    return FADSConfig(
        k=3, buffer_rows=5, reuse_ms=1000, qid_cols=("x", "y"), pid_col="pid", arrival_col="arr"
    )


def _codec_fixture_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "pid": np.arange(12, dtype=np.int64),
            "x": np.array([3.0, 1.5, 4.25, 0.5, 2.75, 3.5, 1.0, 4.0, 2.0, 0.25, 3.25, 1.75]),
            "y": np.array([7.0, 9.5, 2.25, 8.5, 4.75, 6.5, 9.0, 3.0, 5.0, 8.25, 6.25, 9.75]),
            "arr": np.arange(12, dtype=np.int64) * 100,
        }
    )


def test_frozen_v1_state_blob_still_decodes():
    """Upgrade guarantee: a checkpoint written by the v1 codec resumes under
    current code, and the resumed stream finishes bit-identically to a
    continuous batch run over the same rows."""
    import base64

    cfg = _codec_cfg()
    pdf = _codec_fixture_pdf()
    blob = base64.b64decode(_FROZEN_V1_BLOB)

    st, pending = decode_state(blob, cfg)
    assert len(st.buffer) == 5 and st.last_arrival == 700
    assert pending is not None and list(pending["pid"]) == [1, 2, 3, 6, 7]

    # resume: feed rows 8..11 through the handler primed with the frozen
    # state, then the timeout flush; together with the pre-freeze releases
    # (rows 0, 4, 5 — regenerated below) this must equal the batch run
    fake = FakeState()
    fake.update((blob,))
    handler = make_stream_handler(cfg, list(pdf.columns), 1000)
    resumed = list(handler((1,), iter([pdf.iloc[8:]]), fake))
    fake.hasTimedOut = True
    resumed += list(handler((1,), iter([]), fake))

    pre_freeze = list(
        make_stream_handler(cfg, list(pdf.columns), 1000)((1,), iter([pdf.head(8)]), FakeState())
    )
    stream_all = pd.concat(pre_freeze + resumed)
    batch = run_fads_pandas(pdf, cfg)
    b = batch.sort_values("pid").reset_index(drop=True)
    s = stream_all[b.columns].sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, s, check_dtype=False)


def test_unknown_codec_version_fails_loudly():
    cfg = _codec_cfg()
    bad = pickle.dumps({"v": 99})
    with pytest.raises(ValueError, match="codec version"):
        decode_state(bad, cfg)


def test_stream_restart_from_checkpoint(spark, events_pdf, tmp_path_factory):
    """Production restart continuity: run 1 processes two chunks and is
    STOPPED; run 2 is a brand-new query on the same checkpoint that must
    decode run 1's persisted state blob, process the third chunk, fire the
    idle-timeout flush, and land the whole stream bit-identical to the
    batch run.  (The frozen-blob test proves the codec format; this proves
    the codec through a real state-store round trip across query restarts.)"""
    import time as _t

    cfg = _cfg()
    base = tmp_path_factory.mktemp("restart")
    src_dir, ckpt, out_dir = str(base / "src"), str(base / "ckpt"), str(base / "out")
    os.makedirs(src_dir)
    chunks = np.array_split(events_pdf, 3)
    for i, part in enumerate(chunks[:2]):
        part.to_parquet(f"{src_dir}/chunk_{i}.parquet", index=False)
        os.utime(f"{src_dir}/chunk_{i}.parquet", (1_700_000_000 + i * 60,) * 2)

    schema = spark.createDataFrame(events_pdf.head(1)).schema

    def start_query():
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out = fads_generalize_stream(src, cfg, flush_after_ms=15_000)
        return (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    def sink_count():
        try:
            return spark.read.parquet(out_dir).count()
        except Exception:
            return 0

    expected_run1 = len(chunks[0]) + len(chunks[1]) - cfg.buffer_rows
    q = start_query()
    try:
        deadline = _t.time() + 240
        while _t.time() < deadline and sink_count() < expected_run1:
            _t.sleep(0.5)
        assert sink_count() >= expected_run1
    finally:
        q.stop()  # mid-stream: buffer + clusters stay only in the checkpoint

    # new data arrives while the query is DOWN
    chunks[2].to_parquet(f"{src_dir}/chunk_2.parquet", index=False)
    os.utime(f"{src_dir}/chunk_2.parquet", (1_700_000_300,) * 2)

    q2 = start_query()
    try:
        deadline = _t.time() + 240
        while _t.time() < deadline and sink_count() < len(events_pdf):
            _t.sleep(2)
    finally:
        q2.stop()

    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) == len(events_pdf)
    batch = run_fads_pandas(events_pdf, cfg)
    b = batch.sort_values("event_id").reset_index(drop=True)
    s = got[b.columns].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, s, check_dtype=False)


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas variant
# ---------------------------------------------------------------------------


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self.vs = FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.vs

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, ms):
        self.timers.append(ms)


class FakeTimerValues:
    def __init__(self, now_ms=1_000_000):
        self._now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self._now


def test_stateful_processor_parity(events_pdf):
    """FADSStatefulProcessor (the transformWithStateInPandas operator body)
    across two input batches + the expired-timer flush equals the batch run
    row for row, and exactly one flush timer stays armed per key."""
    from pyfads.fads_stream import FADSStatefulProcessor

    cfg = _cfg()
    proc = FADSStatefulProcessor(cfg, list(events_pdf.columns), flush_after_ms=1000)
    handle = FakeHandle()
    proc.init(handle)

    half = len(events_pdf) // 2
    tv = FakeTimerValues()
    out = list(proc.handleInputRows((1,), iter([events_pdf.head(half)]), tv))
    out += list(proc.handleInputRows((1,), iter([events_pdf.iloc[half:]]), tv))
    assert handle.timers == [tv.getCurrentProcessingTimeInMs() + 1000]  # re-armed, not stacked
    out += list(proc.handleExpiredTimer((1,), tv, None))
    assert handle.vs.get() is None  # state dropped on flush

    batch = run_fads_pandas(events_pdf, cfg)
    stream_all = pd.concat(out)
    b = batch.sort_values("event_id").reset_index(drop=True)
    s = stream_all[b.columns].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, s, check_dtype=False)


def test_tws_end_to_end(spark, events_pdf, chunk_dir):
    """Real transformWithStateInPandas query (RocksDB state store) — runs
    only where the Python runtime's protobuf dependency exists."""
    from pyfads.fads_stream import HAS_TWS_RUNTIME, ROCKSDB_PROVIDER, fads_generalize_stream_tws

    cfg = _cfg()
    if not HAS_TWS_RUNTIME:
        with pytest.raises(NotImplementedError, match="protobuf"):
            fads_generalize_stream_tws(
                spark.readStream.schema(spark.createDataFrame(events_pdf.head(1)).schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(chunk_dir),
                cfg,
            )
        pytest.skip("transformWithState runtime needs google.protobuf")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src = (
            spark.readStream.schema(spark.createDataFrame(events_pdf.head(1)).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        out = fads_generalize_stream_tws(src, cfg, flush_after_ms=4000)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_out")
            .outputMode("append")
            .start()
        )
        try:
            import time as _t

            deadline = _t.time() + 240
            while _t.time() < deadline:
                if spark.table("tws_out").count() >= len(events_pdf):
                    break
                _t.sleep(2)
            got = spark.table("tws_out").toPandas()
        finally:
            q.stop()
        batch = run_fads_pandas(events_pdf, cfg)
        b = batch.sort_values("event_id").reset_index(drop=True)
        s = got[b.columns].sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(b, s, check_dtype=False)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_multibatch_ttl_flush_parity(spark, tmp_path_factory):
    """End-to-end multi-micro-batch parity against the pure-Python golden
    oracle, including the REAL ProcessingTimeTimeout flush (not a fake
    state handle) and cluster-TTL expiry crossing micro-batch boundaries:
    arrival jumps of 10000 between chunks with reuse_ms=5000 mean every
    cluster cached in batch i must expire on the first row of batch i+1,
    after a pickle round-trip through the state store."""
    from pyfads.oracle import fads_oracle

    cfg = FADSConfig(
        k=3,
        buffer_rows=6,
        reuse_ms=5_000,
        qid_cols=("user_id", "value"),
        pid_col="event_id",
        arrival_col="arrival_ms",
    )
    # continuous uniforms: strict box containment (cluster reuse) actually
    # occurs, so expiring vs not expiring clusters changes released
    # intervals for 27 post-boundary rows at this seed (verified offline)
    rng = np.random.default_rng(0)
    n_chunks, per_chunk = 3, 20
    frames = []
    for i in range(n_chunks):
        frames.append(
            pd.DataFrame(
                {
                    "event_id": np.arange(i * per_chunk, (i + 1) * per_chunk),
                    "user_id": rng.uniform(0, 100, per_chunk).round(3),
                    "value": rng.uniform(0, 100, per_chunk).round(3),
                    "arrival_ms": (i * 10_000 + np.arange(per_chunk) * 50).astype(
                        np.int64
                    ),
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    d = tmp_path_factory.mktemp("ttl_chunks")
    for i, part in enumerate(frames):
        p = d / f"chunk_{i}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    src = (
        spark.readStream.schema(spark.createDataFrame(pdf.head(1)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = fads_generalize_stream(src, cfg, flush_after_ms=3_000)
    q = (
        out.writeStream.format("memory")
        .queryName("fads_ttl_out")
        .outputMode("append")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 180
        while _t.time() < deadline:
            if spark.table("fads_ttl_out").count() >= len(pdf):
                break
            _t.sleep(2)
        got = spark.table("fads_ttl_out").collect()
    finally:
        q.stop()
    assert len(got) == len(pdf), "timeout flush did not drain the buffer"

    rows = [
        (int(r.event_id), (float(r.user_id), float(r.value)), int(r.arrival_ms))
        for r in pdf.itertuples()
    ]
    expected = fads_oracle(rows, cfg)
    exp_set = {
        (rid, *map(float, lo), *map(float, hi)) for rid, (lo, hi) in expected.items()
    }
    assert _rows_to_set(got, cfg) == exp_set

    # sanity that the scenario really exercises the TTL boundary: without
    # expiry the oracle must assign different intervals to rows AFTER the
    # first chunk boundary (i.e. expiry-on-restore is observable)
    no_ttl = fads_oracle(rows, FADSConfig(**{**cfg.__dict__, "reuse_ms": 10**9}))
    assert any(expected[r] != no_ttl[r] for r in expected if r >= per_chunk)


# ---------------------------------------------------------------------------
# End-to-end taxi parity job (VERDICT r5 item 3): the reference's ONE job
# shape — TransactionGeneralizationJob.java:36-79 — composed as a single
# Structured Streaming query: gzipped taxi CSV source (P1) -> line parse
# (P2) -> arrival enrichment (P4) -> throughput listener (P5) -> stateful
# FADS generalizer k=10/buffer=30/QIDs {0,1,5}=(rideId,taxiId,endTime),
# pid=rideId (P6) -> parquet sink (P7), asserted row-for-row against the
# pure-Python FADSState oracle.
# ---------------------------------------------------------------------------


def _taxi_csv_lines(n: int = 120) -> list[str]:
    """Deterministic NYCTaxiRideSource-format CSV: token order
    rideId,START|END,time,time,lon,lat,lon,lat,passengerCnt,taxiId,driverId
    (NYCTaxiRideSource.java:204-244).  The parsed startTime is strictly
    increasing in line order so event time doubles as the replayable
    arrival clock; a few rows carry empty lon/lat (reference maps them to
    0.0, :231-234) and a few are END lines (time pair swapped on parse)."""
    from datetime import datetime, timedelta, timezone

    base = datetime(2020, 3, 1, tzinfo=timezone.utc)
    fmt = lambda d: d.strftime("%Y-%m-%d %H:%M:%S")
    lines = []
    for i in range(n):
        clock = base + timedelta(seconds=7 * i)
        later = fmt(clock + timedelta(seconds=300 + i))
        if i % 10 == 3:  # END event: parse swaps (time1, time2)
            kind, t1, t2 = "END", later, fmt(clock)
        else:
            kind, t1, t2 = "START", fmt(clock), later
        lon = "" if i % 17 == 5 else f"-73.9{i % 100:02d}"
        lat = "" if i % 17 == 5 else f"40.7{i % 100:02d}"
        lines.append(
            f"{i + 1},{kind},{t1},{t2},{lon},{lat},-73.800,40.600,"
            f"{1 + i % 4},{100 + i % 7},{5000 + i}"
        )
    return lines


def test_end_to_end_taxi_job_gz_to_parquet(spark, tmp_path):
    import gzip
    import time as _t

    from pyfads.io import read_taxi_csv
    from pyfads.metrics import ThroughputListener
    from pyfads.schema import fads_output_schema

    # P1 fixture: nycTaxiRides split over 3 gz files, mtime-ordered so the
    # file source replays them as 3 ordered micro-batches
    lines = _taxi_csv_lines(120)
    src_dir = tmp_path / "taxi_gz"
    src_dir.mkdir()
    for i, lo in enumerate(range(0, len(lines), 40)):
        p = src_dir / f"nycTaxiRides_{i}.gz"
        with gzip.open(p, "wt") as fh:
            fh.write("\n".join(lines[lo : lo + 40]) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    # reference job parameters: Generalizer(10, 30, 60000, keys={0,1,5},
    # pidKey=0) over the 11-field tuple -> QIDs (rideId, taxiId, endTime),
    # pid rideId (which is itself a QID, as in the reference)
    cfg = FADSConfig(
        k=10,
        buffer_rows=30,
        reuse_ms=60_000,
        qid_cols=("rideId", "taxiId", "endTime"),
        pid_col="rideId",
        arrival_col="arrival_ms",
    )

    from pyfads.io import parse_taxi_lines

    raw = (
        spark.readStream.option("maxFilesPerTrigger", 1).text(str(src_dir))
    )  # P1: throttling is the source's concern in Spark (rate_stream)
    parsed = parse_taxi_lines(raw)  # P2
    enriched = parsed.withColumn(
        "arrival_ms", F.col("startTime")
    )  # P4: event time as the deterministic replay clock
    listener = ThroughputListener("TaxiJob")  # P5
    spark.streams.addListener(listener)
    released = fads_generalize_stream(enriched, cfg, flush_after_ms=3_600_000)  # P6
    out_dir, ckpt = str(tmp_path / "out_parquet"), str(tmp_path / "ckpt")
    q = (
        released.writeStream.format("parquet")  # P7
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    out_schema = fads_output_schema(enriched.schema, cfg)
    expected_n = len(lines) - cfg.buffer_rows
    try:
        deadline = _t.time() + 240
        while _t.time() < deadline:
            if spark.read.schema(out_schema).parquet(out_dir).count() >= expected_n:
                break
            _t.sleep(2)
        got = spark.read.schema(out_schema).parquet(out_dir).collect()
        # listener progress events are delivered asynchronously — under CPU
        # contention the final micro-batch's event can lag the sink rows, so
        # drain it BEFORE stop()/removeListener (observed: 80/120 rows
        # counted when stopping immediately)
        drain = _t.time() + 60
        while listener.rows_total < len(lines) and _t.time() < drain:
            _t.sleep(0.5)
    finally:
        q.stop()
        spark.streams.removeListener(listener)

    # P5: the logger observed the stream's input rows flowing through
    assert listener.rows_total >= len(lines)

    # pure-Python oracle over the batch-parsed fixture in arrival order
    pdf = (
        read_taxi_csv(spark, str(src_dir))
        .withColumn("arrival_ms", F.col("startTime"))
        .toPandas()
        .sort_values(["arrival_ms", "rideId"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(pdf) == len(lines)
    st = FADSState(cfg)
    rel = st.process(
        pdf["rideId"].to_numpy(),
        pdf[list(cfg.qid_cols)].to_numpy(dtype=np.float64),
        pdf["arrival_ms"].to_numpy(dtype=np.int64),
    )
    by_pid = dict(zip(pdf["rideId"], pdf["driverId"]))
    expected = {
        (int(by_pid[pid]), *map(float, lo), *map(float, hi))
        for pid, lo, hi in zip(rel.row_ids, rel.lo, rel.hi)
    }
    got_set = {
        (
            int(r["driverId"]),
            float(r["rideId_lo"]), float(r["taxiId_lo"]), float(r["endTime_lo"]),
            float(r["rideId_hi"]), float(r["taxiId_hi"]), float(r["endTime_hi"]),
        )
        for r in got
    }
    assert got_set == expected and len(got_set) == expected_n
