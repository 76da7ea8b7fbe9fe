"""Event-time windowing operators (pyfads.windows): batch semantics against
hand-computed values, plus batch == streaming parity for the operators that
run unchanged on a watermarked stream (tumbling window, session window)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyfads.io import epoch_ms, read_table
from pyfads.windows import asof_join, sessionize, session_stats, tumbling_agg

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_sessionize_gap_semantics(spark):
    rows = [
        # user 1: events at 0s, 10s, 2000s (gap>30min? no - 30min=1800s so
        # 2000s-10s=1990s > 1800s -> new session), 2010s
        (1, 1, 0), (2, 1, 10_000), (3, 1, 2_000_000), (4, 1, 2_010_000),
        # user 2: single event
        (5, 2, 500),
    ]
    df = _mk(spark, rows, "event_id long, user_id long, ts_ms long")
    out = sessionize(df, ["user_id"], "ts_ms", 1_800_000, tiebreak_cols=["event_id"])
    got = {r.event_id: r.session_seq for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_tie_is_deterministic(spark):
    rows = [(10, 1, 100), (11, 1, 100), (12, 1, 100)]
    df = _mk(spark, rows, "event_id long, user_id long, ts_ms long")
    out = sessionize(df, ["user_id"], "ts_ms", 1000, tiebreak_cols=["event_id"])
    assert {r.session_seq for r in out.collect()} == {1}


def test_session_stats_cents_sum(spark):
    rows = [(1, 1, 0, 1.25), (2, 1, 10, 2.50), (3, 1, 10_000, 0.10)]
    df = _mk(spark, rows, "event_id long, user_id long, ts_ms long, value double")
    sess = sessionize(df, ["user_id"], "ts_ms", 1000, tiebreak_cols=["event_id"])
    out = session_stats(
        sess, ["user_id"], "ts_ms",
        cents_col=F.round(F.col("value") * 100).cast("bigint"),
    ).collect()
    by_seq = {r.session_seq: r for r in out}
    assert by_seq[1].n_events == 2 and by_seq[1].sum_cents == 375
    assert by_seq[2].n_events == 1 and by_seq[2].sum_cents == 10
    assert by_seq[1].start_ms == 0 and by_seq[1].end_ms == 10


def test_asof_join_inclusive_and_ties(spark):
    left = _mk(
        spark,
        [(1, 1, 100), (2, 1, 200), (3, 1, 300), (4, 2, 100)],
        "event_id long, user_id long, ts_ms long",
    )
    right = _mk(
        spark,
        # two right rows at ts=200 — tiebreak keeps rid 21 (largest)
        (lambda: [(1, 100, 10.0, 20), (1, 200, 30.0, 21), (1, 200, 25.0, 19)])(),
        "user_id long, ts_ms long, v double, rid long",
    )
    out = asof_join(
        left, right, ["user_id"], "ts_ms", ["v"], right_tiebreak="rid"
    ).collect()
    got = {r.event_id: r.v for r in out}
    assert got == {1: 10.0, 2: 30.0, 3: 30.0, 4: None}


def test_asof_join_exclusive(spark):
    left = _mk(spark, [(1, 1, 100)], "event_id long, user_id long, ts_ms long")
    right = _mk(spark, [(1, 100, 5.0, 1)], "user_id long, ts_ms long, v double, rid long")
    out = asof_join(
        left, right, ["user_id"], "ts_ms", ["v"], right_tiebreak="rid",
        inclusive=False,
    ).collect()
    assert out[0].v is None


def test_tumbling_agg_known_values(spark):
    ev = read_table(spark, SF_DIR, "events")
    out = tumbling_agg(
        ev, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")]
    )
    pdf = out.toPandas()
    # totals preserved; window starts are hour-aligned epoch ms
    assert pdf["n"].sum() == ev.count()
    assert (pdf["win_start_ms"] % 3_600_000 == 0).all()
    assert ((pdf["win_end_ms"] - pdf["win_start_ms"]) == 3_600_000).all()


# ---------------------------------------------------------------------------
# Batch == streaming parity: the same tumbling_agg/session-window pipeline on
# a file stream with a watermark, run to completion, equals the batch result.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("win_chunks")
    pdf = read_table(spark, SF_DIR, "events").toPandas().sort_values("ts")
    # pandas would write datetime64[ns] as TIMESTAMP(NANOS) parquet, which
    # Spark's NTZ reader rejects; [us] round-trips as timestamp_ntz
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    n = len(pdf) // 3
    for i, lo in enumerate(range(0, len(pdf), n)):
        pdf.iloc[lo : lo + n].to_parquet(f"{d}/chunk_{i}.parquet", index=False)
    return str(d)


def _run_stream_to_memory(spark, sdf, name, ckpt):
    # complete mode: append would withhold windows the watermark never
    # passes (nothing arrives after the last file to advance it).
    # ckpt comes from the caller's tmp_path fixture — fixed /tmp paths
    # collide across concurrent test sessions (ADVICE r5).
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_stream_equals_batch(spark, event_files, tmp_path):
    # watermarks require TIMESTAMP (LTZ); session tz is UTC so the cast from
    # NTZ is value-preserving on both the stream and the batch side
    batch_df = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    schema = read_table(spark, SF_DIR, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    agg = tumbling_agg(
        stream, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")]
    )
    got = _run_stream_to_memory(spark, agg, "win_tumble", tmp_path / "ckpt").toPandas()
    want = tumbling_agg(
        batch_df, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")]
    ).toPandas()
    key = ["win_start_ms", "win_end_ms", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key + ["n"]], want[key + ["n"]])


def test_session_window_stream_matches_gap_sessionize(spark, event_files, tmp_path):
    """Native F.session_window on a stream produces the same session spans
    as the batch gap-sessionization for a quiet key (no overlapping users
    interleave within a session gap here: compare per-user session count)."""
    batch_df = read_table(spark, SF_DIR, "events")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
    )
    agg = stream.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    got = (
        _run_stream_to_memory(spark, agg, "win_sess", tmp_path / "ckpt")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = batch_df.select("event_id", "user_id", epoch_ms(batch_df, "ts").alias("ts_ms"))
    sess = sessionize(ev, ["user_id"], "ts_ms", 30 * 60 * 1000, tiebreak_cols=["event_id"])
    want = (
        sess.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_sessions": "int64", "n_events": "int64"}),
        want.astype({"n_sessions": "int64", "n_events": "int64"}),
    )


def test_session_window_stream_eight_chunks(spark, tmp_path_factory, tmp_path):
    """r11 verdict item 7: the session-window stream parity above runs 3
    micro-batches — re-prove it with 8 chunks so merging-session state
    crosses 7 store boundaries (sessions spanning chunk edges must merge
    across micro-batches, not within one)."""
    batch_df = read_table(spark, SF_DIR, "events")
    d = tmp_path_factory.mktemp("win_chunks8")
    pdf = batch_df.toPandas().sort_values("ts")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    import numpy as np

    import os

    for i, part in enumerate(np.array_split(pdf, 8)):
        p = f"{d}/chunk_{i}.parquet"
        part.to_parquet(p, index=False)
        # stagger mtimes: FileStreamSource orders pending files by mtime,
        # and 8 sub-ms writes can tie — a late-time chunk processed first
        # would advance the watermark past earlier chunks (code-review r12;
        # same device as _fads_stream_chunks)
        t = 1_700_000_000 + i * 60
        os.utime(p, (t, t))
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
    )
    agg = stream.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    got = (
        _run_stream_to_memory(spark, agg, "win_sess8", tmp_path / "ckpt")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = batch_df.select("event_id", "user_id", epoch_ms(batch_df, "ts").alias("ts_ms"))
    sess = sessionize(ev, ["user_id"], "ts_ms", 30 * 60 * 1000, tiebreak_cols=["event_id"])
    want = (
        sess.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_sessions": "int64", "n_events": "int64"}),
        want.astype({"n_sessions": "int64", "n_events": "int64"}),
    )


def test_sliding_stream_equals_batch(spark, event_files, tmp_path):
    """sliding_agg runs unchanged on a watermarked stream: 1h windows
    sliding every 15 min, complete-mode output == batch output."""
    from pyfads.windows import sliding_agg

    batch_df = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    schema = read_table(spark, SF_DIR, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    got = _run_stream_to_memory(
        spark,
        sliding_agg(stream, "ts", "1 hour", "15 minutes", ["event_type"], aggs),
        "win_slide",
        tmp_path / "ckpt",
    ).toPandas()
    want = sliding_agg(
        batch_df, "ts", "1 hour", "15 minutes", ["event_type"], aggs
    ).toPandas()
    key = ["win_start_ms", "win_end_ms", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key + ["n"]], want[key + ["n"]])


def test_session_agg_stream_equals_batch(spark, event_files, tmp_path):
    """The registered session_window_agg operator (native F.session_window)
    produces identical closed sessions on a stream and in batch."""
    from pyfads.windows import session_agg

    batch_df = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    schema = read_table(spark, SF_DIR, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
    ]
    got = _run_stream_to_memory(
        spark,
        session_agg(stream, "ts", "30 minutes", ["user_id"], aggs),
        "win_sagg",
        tmp_path / "ckpt",
    ).toPandas()
    want = session_agg(batch_df, "ts", "30 minutes", ["user_id"], aggs).toPandas()
    key = ["sess_start_ms", "sess_end_ms", "user_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[key + ["n_events", "sum_cents"]], want[key + ["n_events", "sum_cents"]]
    )


def test_tumbling_stream_foreachbatch_capture(spark, event_files, tmp_path):
    """foreachBatch capture of the streaming tumbling agg in UPDATE mode:
    the union of per-batch updates, last-write-wins per window, equals the
    batch result — the sink-agnostic way to consume windowed updates."""
    batch_df = read_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    schema = read_table(spark, SF_DIR, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    agg = tumbling_agg(
        stream, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")]
    )
    captured: list[pd.DataFrame] = []

    def capture(bdf, bid):
        pdf = bdf.toPandas()
        if len(pdf):
            pdf["__bid"] = bid
            captured.append(pdf)

    q = (
        agg.writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        pd.concat(captured)
        .sort_values("__bid")
        .groupby(["win_start_ms", "win_end_ms", "event_type"], as_index=False)
        .last()
        .drop(columns="__bid")
    )
    want = tumbling_agg(
        batch_df, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n")]
    ).toPandas()
    key = ["win_start_ms", "win_end_ms", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key + ["n"]], want[key + ["n"]])


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode watermark semantics: a row arriving after the watermark
    passed its window is DROPPED; windows emit once finalized."""
    d = tmp_path / "late_stream"
    d.mkdir()

    import os
    import time

    base_mtime = time.time() - 1000

    def write_file(name, rows, order):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
        pdf.to_parquet(d / name, index=False)
        # the file source orders batches by mtime; same-ms writes would make
        # the intake order (and thus the watermark race) nondeterministic
        os.utime(d / name, (base_mtime + order, base_mtime + order))

    hour = 3600
    # file 0: two rows in window [0h,1h); file 1: watermark-advancer at 3h
    # (watermark := 3h+100s - 10min after this batch commits); file 2: the
    # batch during which [0h,1h)'s state is evicted + emitted; file 3: a
    # LATE row back in [0h,1h) that must now be dropped, plus a live row.
    # The drop is only GUARANTEED once the window's state was evicted in an
    # earlier batch — Spark's documented watermark semantics: a late row
    # whose state still exists may legitimately be aggregated (measured: it
    # is), so the late file must come two batches after the advancer.
    write_file("f0.parquet", [(1, 100), (2, 200)], 0)
    write_file("f1.parquet", [(3, 3 * hour + 100)], 10)
    write_file("f2.parquet", [(6, 3 * hour + 200)], 20)
    write_file("f3.parquet", [(4, 300), (5, 3 * hour + 300)], 30)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    agg = tumbling_agg(stream, "ts", "1 hour", [], [F.count(F.lit(1)).alias("n")])
    q = (
        agg.writeStream.format("memory")
        .queryName("win_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        int(r.win_start_ms): int(r.n) for r in spark.table("win_late").collect()
    }
    # the late event_id=4 did NOT land in the first window (n stays 2); the
    # [3h,4h) window is not in append output (never finalized — no later
    # data advanced the watermark past it)
    assert got == {0: 2}


def test_interval_join_batch_semantics(spark):
    """Hand-computed: all (left, right) same-key pairs with r.ts in
    [l.ts, l.ts + 10s]; boundary inclusive both ends, cross-key never."""
    from pyfads.windows import interval_join

    lrows = [(1, "2020-01-01 00:00:00"), (2, "2020-01-01 00:01:00")]
    rrows = [
        (1, "2020-01-01 00:00:05", 100),
        (1, "2020-01-01 00:00:10", 101),  # exactly +10s -> included
        (1, "2020-01-01 00:00:11", 102),  # +11s -> excluded
        (2, "2020-01-01 00:00:59", 103),  # before left ts -> excluded
        (2, "2020-01-01 00:01:00", 104),  # exactly equal -> included
    ]
    left = spark.createDataFrame(lrows, "user_id long, l_ts string").withColumn(
        "l_ts", F.col("l_ts").cast("timestamp")
    )
    right = spark.createDataFrame(rrows, "user_id long, r_ts string, rid long").withColumn(
        "r_ts", F.col("r_ts").cast("timestamp")
    )
    out = interval_join(left, right, ["user_id"], "l_ts", "r_ts", 0, 10_000)
    assert sorted(r.rid for r in out.collect()) == [100, 101, 104]
    # the plan must be a key equi-join, not a nested loop over the range
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_join_stream_equals_batch(spark, event_files, tmp_path):
    """Stream-stream interval join (both sides watermarked) produces the
    same click->purchase pairs as the batch interval_join."""
    from pyfads.windows import interval_join

    schema = read_table(spark, SF_DIR, "events").schema

    def side(df, etype, idname, tsname):
        return df.filter(F.col("event_type") == etype).select(
            "user_id",
            F.col("event_id").alias(idname),
            F.col("ts").cast("timestamp").alias(tsname),
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
    )
    clicks = side(stream, "click", "click_id", "c_ts").withWatermark("c_ts", "2 hours")
    purchases = side(stream, "purchase", "purchase_id", "p_ts").withWatermark(
        "p_ts", "2 hours"
    )
    joined = interval_join(
        clicks, purchases, ["user_id"], "c_ts", "p_ts", 0, 3_600_000
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("win_ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.table("win_ssj").collect()
    }
    batch = read_table(spark, SF_DIR, "events")
    want = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in interval_join(
            side(batch, "click", "click_id", "c_ts"),
            side(batch, "purchase", "purchase_id", "p_ts"),
            ["user_id"],
            "c_ts",
            "p_ts",
            0,
            3_600_000,
        ).collect()
    }
    assert got == want and len(want) > 0


def test_interval_join_matches_bruteforce_reference(spark):
    """Property: interval_join == the quadratic per-key reference on random
    inputs (boundary-inclusive both ends, negative lower bound allowed)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyfads.windows import interval_join

    row = st.tuples(
        st.integers(min_value=1, max_value=3),      # key
        st.integers(min_value=0, max_value=120),    # ts seconds
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        lrows=st.lists(row, min_size=0, max_size=8),
        rrows=st.lists(row, min_size=0, max_size=8),
        lower=st.integers(min_value=-30, max_value=10),
        width=st.integers(min_value=0, max_value=40),
    )
    def run(lrows, rrows, lower, width):
        upper = lower + width
        left = spark.createDataFrame(
            [(i, k, f"1970-01-01 00:{t // 60:02d}:{t % 60:02d}") for i, (k, t) in enumerate(lrows)] or [(0, 0, "1970-01-01 00:00:00")],
            "lid long, user_id long, l_ts string",
        ).withColumn("l_ts", F.col("l_ts").cast("timestamp"))
        right = spark.createDataFrame(
            [(i, k, f"1970-01-01 00:{t // 60:02d}:{t % 60:02d}") for i, (k, t) in enumerate(rrows)] or [(0, 0, "1970-01-01 00:00:00")],
            "rid long, user_id long, r_ts string",
        ).withColumn("r_ts", F.col("r_ts").cast("timestamp"))
        if not lrows:
            left = left.filter(F.lit(False))
        if not rrows:
            right = right.filter(F.lit(False))
        got = {
            (r.lid, r.rid)
            for r in interval_join(
                left, right, ["user_id"], "l_ts", "r_ts", lower * 1000, upper * 1000
            ).collect()
        }
        want = {
            (li, ri)
            for li, (lk, lt) in enumerate(lrows)
            for ri, (rk, rt) in enumerate(rrows)
            if lk == rk and lt + lower <= rt <= lt + upper
        }
        assert got == want

    run()


def test_event_transitions_small(spark):
    """Bigram counts and single-division probabilities on a hand-checked
    two-user sequence; ties within a millisecond break by event_id."""
    from pyfads.windows import event_transitions

    rows = [
        # user 1: a -> b -> b
        (1, 1, "a", 1000),
        (2, 1, "b", 2000),
        (3, 1, "b", 3000),
        # user 2: a -> c (same ms: order by event_id)
        (4, 2, "a", 1000),
        (5, 2, "c", 1000),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_ms long"
    )
    out = {(r.prev_type, r.next_type): r for r in event_transitions(df).collect()}
    assert out[("a", "b")].n_trans == 1 and out[("a", "b")].n_from == 2
    assert out[("a", "c")].n_trans == 1 and out[("a", "c")].p_trans == 0.5
    assert out[("b", "b")].n_trans == 1 and out[("b", "b")].p_trans == 1.0
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "b")}


def test_funnel_three_step_semantics(spark):
    """Hand-checked levels, including the edge the naive post-join filter
    gets wrong: a user whose only step-2 events are OUT of window must
    stay at level 1 (not vanish), and a purchase BEFORE the click never
    counts as step 3."""
    from pyfads.windows import funnel_three_step

    H = 3_600_000
    rows = [
        # user 1: full funnel
        (10, 1, "view", 1000),
        (11, 1, "click", 2000),
        (12, 1, "purchase", 2500),
        # user 2: click exists but outside the horizon -> level 1
        (20, 2, "view", 1000),
        (21, 2, "click", 1000 + H + 1),
        # user 3: purchase but never clicked -> level 1
        (30, 3, "view", 1000),
        (31, 3, "purchase", 1500),
        # user 4: purchase precedes the click -> level 2
        (40, 4, "view", 1000),
        (41, 4, "purchase", 1100),
        (42, 4, "click", 1200),
        # user 5: two clicks; step 3 anchors on the EARLIEST click
        (50, 5, "view", 1000),
        (51, 5, "click", 1100),
        (52, 5, "click", 3000),
        (53, 5, "purchase", 2000),  # after first click -> level 3
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_ms long"
    )
    out = {r.event_id: r for r in funnel_three_step(df).collect()}
    assert out[10].funnel_level == 3 and out[10].step3_ms == 2500
    assert out[20].funnel_level == 1 and out[20].step2_ms is None
    assert out[30].funnel_level == 1
    assert out[40].funnel_level == 2 and out[40].step2_ms == 1200
    assert out[50].funnel_level == 3 and out[50].step2_ms == 1100
    assert set(out) == {10, 20, 30, 40, 50}  # one row per view, none lost


def test_sessionize_stream_matches_batch_label_for_label(spark, event_files, tmp_path):
    """VERDICT r6 item 6: the gap-based per-EVENT sessionize as a streaming
    stateful operator — replaying the ordered chunks must reproduce the
    batch operator's (event_id -> session_seq) labels exactly, including
    sessions that SPAN micro-batch boundaries (the state carry)."""
    from pyfads.io import epoch_ms
    from pyfads.windows import sessionize_stream

    gap = 30 * 60 * 1000
    ev = read_table(spark, SF_DIR, "events")
    batch_df = ev.withColumn("ts_ms", epoch_ms(ev, "ts"))
    want = {
        r.event_id: r.session_seq
        for r in sessionize(
            batch_df, ["user_id"], "ts_ms", gap, tiebreak_cols=["event_id"]
        ).collect()
    }

    schema = ev.schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
    )
    stream = raw.withColumn("ts_ms", epoch_ms(raw, "ts"))
    labeled = sessionize_stream(
        stream, ["user_id"], "ts_ms", gap, tiebreak_cols=["event_id"]
    )
    q = (
        labeled.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_id: r.session_seq for r in spark.table("sess_stream").collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_sessionize_stream_restart_from_checkpoint(spark, tmp_path):
    """Restart continuity for the streaming sessionizer: run 1 labels the
    first chunk and is stopped; run 2 on the same checkpoint must restore
    each key's (last_ts, seq) carry and continue numbering — a session
    SPANNING the restart keeps its sequence number, and a post-gap event
    after the restart increments from the carried counter, matching the
    batch labels exactly."""
    import os
    import time as _t

    import pandas as pd

    from pyfads.windows import sessionize_stream

    gap = 1_000
    # user 1: events at 0ms, 500ms | restart | 700ms (same session, spans
    # the restart), then 5_000ms (new session -> seq 2)
    rows = [
        (1, 1, 0), (2, 1, 500),          # chunk 0 (run 1)
        (3, 1, 700), (4, 1, 5_000),      # chunk 1 (run 2)
        (5, 2, 100),                     # chunk 0
        (6, 2, 9_000),                   # chunk 1 (new session for user 2)
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_ms"])
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    ck = str(tmp_path / "ckpt")
    chunk0 = pdf[pdf.event_id.isin([1, 2, 5])]
    chunk1 = pdf[pdf.event_id.isin([3, 4, 6])]
    chunk0.to_parquet(f"{src_dir}/chunk_0.parquet", index=False)
    os.utime(f"{src_dir}/chunk_0.parquet", (1_700_000_000,) * 2)

    schema = spark.createDataFrame(pdf).schema

    def run_until(n_expected, timeout_s=120):
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        labeled = sessionize_stream(
            src, ["user_id"], "ts_ms", gap, tiebreak_cols=["event_id"]
        )
        q = (
            labeled.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )
        try:
            deadline = _t.time() + timeout_s
            while _t.time() < deadline:
                try:
                    n = (
                        spark.read.schema(
                            labeled.schema
                        ).parquet(str(tmp_path / "out")).count()
                    )
                except Exception:
                    n = 0
                if n >= n_expected:
                    break
                _t.sleep(1)
        finally:
            q.stop()

    run_until(3)  # run 1: chunk 0 only
    chunk1.to_parquet(f"{src_dir}/chunk_1.parquet", index=False)
    os.utime(f"{src_dir}/chunk_1.parquet", (1_700_000_060,) * 2)
    run_until(6)  # run 2: fresh query, same checkpoint

    got = {
        r.event_id: r.session_seq
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 2}
