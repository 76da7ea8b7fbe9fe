#!/usr/bin/env python
"""Plan audit: dump .explain("formatted") for every registered query and
scan for scale red flags.  Writes PLANS.md at the repo root.

Red flags checked per plan:
- CartesianProduct / BroadcastNestedLoopJoin on a non-broadcast-intended
  query (all-pairs shapes that die at 100 TB)
- parquet scans with no column pruning (ReadSchema ~ full table width)
- Exchange count (shuffles) — reported so regressions are visible in diffs

Usage: python scripts/explain_audit.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

# BroadcastNestedLoopJoin is the *intended* physical join for these: each
# joins a bounded broadcast side — a 1-row global-bounds frame (g5/g8/g11,
# ann_cosine's bounded query set, g3's 1-row "now") or the grouped cluster
# boxes on a theta range-containment predicate (g7/g9).  The probe side
# streams; nothing here is an unbounded all-pairs product.
EXPECTED_BNLJ = {
    "ann_cosine_topk",
    "ann_matryoshka_topk",  # same operator on the 16-dim prefix: bounded-broadcast query side, theta join
    "ann_matryoshka_refined",  # composes the prefix stage above; the refine join is an equi-join
    "ann_recall_matryoshka",  # composes ann_matryoshka_refined + the audited brute-force ground truth
    "knn_label_predict",  # composes ann_cosine_topk's audited bounded-broadcast theta join
    "hard_negatives",  # same class: bounded broadcast anchors, label-mismatch theta join
    "hard_negatives_dim1024",  # same, wide-vector fold path
    "ann_recall_lsh",  # composes ann_cosine_topk's audited bounded-broadcast theta join (ground-truth side)
    "ann_recall_ivf",  # same class, IVF candidate generator
    "ann_sq8_topk",  # same class: bounded-broadcast quantized query side, q_id <> neighbor_id theta join
    "ann_recall_sq8",  # composes ann_sq8_topk + the audited brute-force ground truth
    "split_summary",  # 1-row leakage-count frame crossJoined back (skew_report class)
    "tclose_audit_events",  # bounded dims crossJoined: category distribution (|event_type| rows) + 1-row total — never row-scale
    "corpus_manifest",  # 1-row summary frames crossJoined (theta-setops class)
    "minhash_recall",  # same class: three 1-row count frames crossJoined
    "skew_report",  # 1-row global (total, n_keys) frame joined keylessly
    "ann_cosine_dim1024",
    "knn_label_accuracy",  # same class: bounded broadcast query side, q_id <> neighbor_id theta join
    "g3_cluster_ttl",
    "g5_knn_topk",
    "g7_fits",
    "g8_info_loss",
    "g9_best_cluster",
    "g11_suppress",
    "bm25_topk",  # 1-row corpus-stats frame (N, sumdl, per-term df) joined keylessly
    "bm25_batch",  # same 1-row stats frame, batch variant
    "retrieval_hybrid_rrf",  # composes bm25_topk's 1-row stats frame; the RRF fusion full-outer joins two <=pool(50)-row rank frames — every BNLJ side is bounded
    "retrieval_mmr",  # composes cosine_topk's audited bounded-broadcast query side + q_id <> neighbor_id theta join (ann_cosine_topk class)
    "sample_priority",  # 1-row broadcast tau threshold cross-joined to the k-row sample
    "sketch_hdr_quantiles",  # 3-row literal percentile frame cross-joined to the bounded histogram
    "value_deciles",  # same class: 9-row literal percentile frame inside hdr_quantiles
    "hdr_hourly_quantiles",  # same class: 2-row literal percentile frame inside hdr_quantiles
    "sketch_theta_setops",  # <=k-row sketch frames + 1-row theta/summary frames, all bounded crossJoins
    "session_outliers",  # 1-row med/MAD frames cross-joined back (robust_outliers class)
    # Q11/Q15 flavors: the scalar-subquery total/max is a 1-row broadcast
    # frame cross-joined back (the canonical decorrelation) — bounded at
    # any scale, the probe side streams
    "important_part_values",
    "top_supplier_revenue",
    "epoch_schedule",  # 1-row corpus-token total cross-joined to the per-source rollup (skew_report class)
    "gate_drift_report",  # 1-row (t_raw, t_kept) totals frame cross-joined to the bin agg (same class)
}

# Queries allowed to contain an `Exchange SinglePartition` — a shuffle that
# serializes rows onto ONE task, the quietest way to lose a cluster at
# 100 TB (a global Window.orderBy or un-partitioned final agg plans this
# way).  Two audited-legitimate classes only:
# - partial-aggregate feeds (g2_global_bounds, g3/g5/g8/g9/g11's broadcast
#   1-row global-bounds frame): the exchange moves <= one row per input
#   partition, bounded at any scale;
# - parity-mode sequential primitives (g2_running_bounds, p3_pid_assign,
#   p4_arrival_enrich): a global arrival-ordered window IS the reference
#   semantics (parallelism-1 stream); their scale paths are the documented
#   alternatives (from_ts_col arrival clock / partitioned FADS) — see
#   pyfads/io.py:with_arrival.
# Anything new lands here only with a written justification (VERDICT r3 #7).
EXPECTED_SINGLE_PARTITION: set[str] = {
    "g2_global_bounds",
    "skew_report",  # same class: partial-agg feed, <= 1 row per partition
    "disjunctive_revenue",  # keyless global agg: <= 1 partial row per task
    "forecast_revenue",  # Q6 flavor: same keyless-global-agg class
    "promo_revenue_share",  # Q14 flavor: same keyless-global-agg class
    "bm25_topk",  # partial-agg feed of the 1-row stats frame, <= 1 row per task
    "bm25_batch",  # same partial-agg feed, batch variant
    "retrieval_hybrid_rrf",  # bm25's partial-agg feed + rank windows over <=pool(50)-row TakeOrdered outputs — KBs on the single task at any corpus size
    "clf_eval_confusion",  # keyless 1-row confusion-matrix agg over the test split, <= 1 partial row per task
    "profile_orders",  # keyless global profile agg: <= 1 partial row per task
    "corpus_mix_temp",  # stratum-fold agg over the per-lang count frame: <= strata rows total
    "sketch_theta_setops",  # keyless stats/count aggs over <=k-row sketch frames
    "corpus_manifest",  # same class: keyless 1-row component aggs, <= 1 partial row per task
    "minhash_recall",  # same class: keyless 1-row count aggs, <= 1 partial row per task
    # DSIR lambda totals: a whole-frame window over the bucket-count table,
    # which is BOUNDED at n_buckets (4096) rows by construction — the
    # hashed model never grows with the corpus, so the single partition
    # holds KBs at any scale (same class as corpus_mix_temp's stratum fold)
    "dsir_weights",
    "dsir_sample",
    "session_outliers",  # keyless med/MAD percentile aggs, <= 1 partial row per task
    "split_summary",  # 1-row leaky-group count re-agg, <= 1 partial row per task
    "tclose_audit_events",  # 1-row total-count partial-agg feed, <= 1 row per task
    "important_part_values",  # Q11: 1-row total-cents re-agg, <= 1 partial row/task
    "top_supplier_revenue",  # Q15: 1-row max re-agg, <= 1 partial row/task
    "g3_cluster_ttl",
    "g5_knn_topk",
    "g8_info_loss",
    "g9_best_cluster",
    "g11_suppress",
    "g2_running_bounds",
    "p3_pid_assign",
    "p4_arrival_enrich",
    "epoch_schedule",  # keyless 1-row token-total re-agg over the per-source frame, <= 1 partial row per task
    "gate_drift_report",  # keyless 1-row totals re-agg over the bounded bin frame, same class
}


def formatted_plan(df) -> str:
    """Capture df.explain('formatted') as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(plan: str) -> dict:
    return {
        "shuffles": len(re.findall(r"\bExchange\b", plan)),
        "broadcastHash": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortMerge": len(re.findall(r"SortMergeJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        # formatted plans render the partitioning in the details section as
        # "Arguments: SinglePartition, ..." under each Exchange node
        "singlePartition": len(re.findall(r"Arguments: SinglePartition", plan)),
    }


def plan_flags(name: str, stats: dict) -> list[str]:
    """Scale red flags for one query's physical plan (the pytest gate in
    tests/test_plans.py asserts this returns [] for every registered query)."""
    flags = []
    if stats["cartesian"]:
        flags.append("CARTESIAN")
    if stats["bnlj"] and name not in EXPECTED_BNLJ:
        flags.append("BNLJ(unexpected)")
    if stats["singlePartition"] and name not in EXPECTED_SINGLE_PARTITION:
        flags.append("SINGLE_PARTITION(unexpected)")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import pyfads.llm_queries  # noqa: F401
    import pyfads.primitives_queries  # noqa: F401
    import pyfads.queries as Q

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("pyfads-explain-audit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sections: list[str] = []
    flags_summary: list[str] = []
    for name, fn in Q.QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:
            sections.append(f"## {name}\n\nFAILED to plan: {exc}\n")
            flags_summary.append(f"- `{name}`: PLANNING FAILED")
            continue

        stats = plan_stats(plan)
        flags = plan_flags(name, stats)
        header = (
            " ".join(f"{k}={v}" for k, v in stats.items())
            + (f"  **FLAGS: {', '.join(flags)}**" if flags else "")
        )
        if flags:
            flags_summary.append(f"- `{name}`: {', '.join(flags)}")
        sections.append(f"## {name}\n\n{header}\n\n```\n{plan.strip()}\n```\n")

    out = [
        "# PLANS — physical-plan audit of every registered query",
        "",
        f"Generated by `scripts/explain_audit.py` at `{sf_dir}`.",
        "",
        "Red-flag summary (empty = clean):",
        "",
        *(flags_summary or ["- none"]),
        "",
        *sections,
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(sections)} plans); flags: {len(flags_summary)}")
    spark.stop()


if __name__ == "__main__":
    main()
