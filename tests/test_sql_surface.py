"""Ad-hoc SQL surface + JSONL interchange: register_views makes every
testdata table addressable from spark.sql under the same names the DuckDB
oracles use, and read_jsonl/write_jsonl round-trip a corpus losslessly."""

from __future__ import annotations

import duckdb
import pandas as pd

from pyfads.io import read_jsonl, read_table, register_views, write_jsonl

SF_DIR = "/root/testdata/sf0.001"


def test_adhoc_sql_matches_duckdb(spark):
    """A multi-way relational query typed straight into spark.sql returns
    exactly what DuckDB computes over the same parquet — the engine's
    interactive query surface is trustworthy, not just the registered
    operators."""
    register_views(spark, SF_DIR)
    sql = """
    SELECT n.n_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """
    got = (
        spark.sql(sql).toPandas().sort_values("n_name").reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    want = con.sql(sql).df().sort_values("n_name").reset_index(drop=True)
    con.close()
    pd.testing.assert_frame_equal(
        got.astype({"n_orders": "int64", "total_cents": "int64"}),
        want.astype({"n_orders": "int64", "total_cents": "int64"}),
    )


def test_jsonl_roundtrip(spark, tmp_path):
    docs = read_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, d)
    back = read_jsonl(spark, d, schema=docs.schema)
    a = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = back.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_jsonl_malformed_lines_null_out(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nnot json at all\n{"doc_id": 2, "text": "fine"}\n')
    df = read_jsonl(spark, str(p), schema="doc_id long, text string")
    rows = sorted(
        df.collect(), key=lambda r: (r["doc_id"] is None, r["doc_id"])
    )
    assert [r["doc_id"] for r in rows] == [1, 2, None]


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from pyfads.io import read_orc, write_orc

    docs = read_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "docs_orc")
    write_orc(docs, d)
    back = read_orc(spark, d)
    a = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = back.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    # filter + projection reach the ORC scan (stripe-level pushdown)
    plan = (
        back.filter(back.doc_id == 3)
        .select("doc_id", "lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,3)]" in plan
    assert "struct<doc_id:bigint,lang:string>" in plan


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    """Production ingest shape: keep the raw line of anything that failed
    to parse in a _corrupt_record column, split the stream into clean rows
    and a quarantine side — nothing is silently dropped."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "BROKEN {{{\n"
        '{"doc_id": 2, "text": "fine"}\n'
        '{"doc_id": "not_a_number", "text": "bad type"}\n'
    )
    df = read_jsonl(
        spark, str(p),
        schema="doc_id long, text string, _corrupt_record string",
    ).cache()  # PERMISSIVE + corrupt column requires a cache/materialization
    clean = df.filter("_corrupt_record IS NULL").drop("_corrupt_record")
    quarantine = df.filter("_corrupt_record IS NOT NULL")
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    bad = [r["_corrupt_record"] for r in quarantine.collect()]
    assert len(bad) == 2 and any("BROKEN" in b for b in bad)
    assert len(clean.collect()) + len(bad) == 4
    df.unpersist()


def test_bench_stdout_line_stays_inside_driver_tail_capture():
    """VERDICT r6 item 7: the driver tail-captures ~2000 chars of stdout;
    the compact bench line must stay under 1800 chars no matter how large
    the query registry grows (BENCH_r04 recorded parsed:null when the full
    dict outgrew the window at 97 queries)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    summary = {
        "metric": "fads_pipeline_wall_sec",
        "value": 1.234,
        "unit": "sec",
        "sf": 0.1,
        "rows": 100000,
        "rows_per_sec": 81234.5,
        "total_sec": 456.789,
        "n_queries": 0,
        "reps_cap": 6,
    }

    # the REAL registry's names (the case the driver hits every round)
    from pyfads.queries import QUERIES

    real = {name: 1.0 + i * 0.037 for i, name in enumerate(QUERIES)}
    summary["n_queries"] = len(real)
    line = bench.compact_line(summary, real, "BENCH_FULL.json")
    assert len(line) < 1800, len(line)
    parsed = json.loads(line)
    assert parsed["queries_omitted"] + len(parsed["queries"]) == len(real)
    for k in ("metric", "value", "unit", "sf", "queries"):
        assert k in parsed

    # adversarial growth: 1000 long-named queries still fit
    big = {f"extremely_long_query_name_number_{i:04d}": float(i) for i in range(1000)}
    summary["n_queries"] = len(big)
    line = bench.compact_line(summary, big, "BENCH_FULL.json")
    assert len(line) < 1800, len(line)
    parsed = json.loads(line)
    assert parsed["queries_omitted"] > 0
    # slowest-first priority: the single slowest query always makes the line
    assert "extremely_long_query_name_number_0999" in parsed["queries"]

    # budget packing (ADVICE r7): an overflowing long-named entry must not
    # stop shorter-named, still-slower-first entries from filling the line
    base_len = len(
        json.dumps(
            {**summary, "detail": "d", "queries": {}, "queries_omitted": 0},
            separators=(",", ":"),
        )
    )
    timings = {"q_" + "x" * 120: 10.0, "qa": 9.0, "qb": 8.0}
    line = bench.compact_line(summary, timings, "d", budget=base_len + 30)
    parsed = json.loads(line)
    assert "qa" in parsed["queries"] and "qb" in parsed["queries"]
    assert "q_" + "x" * 120 not in parsed["queries"]
