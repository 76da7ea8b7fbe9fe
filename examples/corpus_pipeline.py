#!/usr/bin/env python
"""End-to-end training-corpus build, composed from pyfads operators.

The canonical LLM-data flow: raw documents -> normalize -> quality gate ->
exact dedup -> near-dup survivors -> benchmark-contamination gate ->
source-mixture sample -> chunk -> packed contexts -> parquet, with stage
counts printed as a funnel report.

Every stage is the same oracle-checked operator the query registry
exposes; this script is the composition proof that they snap together.

Usage:
    python examples/corpus_pipeline.py [sf_dir] [out_dir]
    # defaults: /root/testdata/sf0.001, /tmp/pyfads_corpus_out
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pyfads_corpus_out"

    from pyfads import dedup as D
    from pyfads import pipeline as P
    from pyfads import text as X
    from pyfads.io import read_table

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("pyfads-corpus-pipeline")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    funnel: list[tuple[str, int]] = []

    def stage(name: str, df):
        """Record the funnel count and truncate lineage: every later
        count/write reads the materialized stage instead of re-running
        normalize -> dedup -> CC from the raw scan."""
        df = df.localCheckpoint(eager=True)
        funnel.append((name, df.count()))
        return df

    docs = read_table(spark, sf_dir, "documents")
    funnel.append(("raw", docs.count()))

    # 1. canonical form + quality gate
    norm = X.normalize_text(docs).select(
        "doc_id", F.col("text_norm").alias("text")
    ).join(docs.select("doc_id", "lang", "source"), "doc_id")
    passing = X.quality_score(norm).filter(F.col("quality_score") >= 0.5)
    kept = stage("quality", norm.join(passing.select("doc_id"), "doc_id"))

    # 2. exact dedup, then near-dup survivors (one doc per component)
    # (exact_dedup returns (doc_id, text, n_copies) — rejoin the metadata)
    exact = stage(
        "exact_dedup",
        D.exact_dedup(kept).select("doc_id", "text").join(
            kept.select("doc_id", "lang", "source"), "doc_id"
        ),
    )
    # 2a'. containment scrub: drop excerpt/quote copies (subset shingle
    # sets) — Jaccard below scores a short excerpt inside a long doc too
    # low to catch, containment sees it at 1.0 from the excerpt's side
    cont = D.containment_scrub(exact)
    exact = stage(
        "containment_scrub",
        exact.join(cont.filter(F.col("keep")).select("doc_id"), "doc_id"),
    )

    pairs = D.minhash_near_dup_pairs(exact).select("a_id", "b_id")
    groups = D.connected_components(pairs, nodes=exact.select("doc_id"))
    survivors = stage(
        "near_dup_survivors",
        exact.join(
            groups.filter(F.col("doc_id") == F.col("group_id")).select("doc_id"),
            "doc_id",
        ),
    )

    # 2b. substring-level scrub (ExactSubstr keep-one): whole-doc dedup
    # above can't touch long verbatim passages embedded in otherwise-
    # different survivors — rewrite those spans out, keeping the
    # corpus-canonical occurrence
    scrubbed = stage(
        "substring_scrubbed",
        D.exact_substring_scrub(survivors, L=40, emit="text").join(
            survivors.select("doc_id", "lang", "source"), "doc_id"
        ),
    )

    # 2c. semantic (paraphrase-level) dedup — model-free: hashing-trick
    # doc embeddings feed SemDeDup-class cell dedup; lexical passes above
    # cannot see reworded redundancy
    from pyfads import similarity as S

    embs = X.doc_embed_hash(scrubbed).withColumnRenamed("doc_id", "vec_id")
    sem = S.semantic_dedup(embs, dim=64, threshold=0.8)
    scrubbed = stage(
        "semantic_dedup",
        scrubbed.join(
            sem.filter(F.col("is_kept")).select(F.col("vec_id").alias("doc_id")),
            "doc_id",
        ),
    )

    # 3. benchmark-contamination gate (self-benchmark demo: first 5 docs):
    # token-overlap screen (bloom-style) + exact span-level report —
    # either signal drops the doc
    bench = docs.select("doc_id", "text").filter(F.col("doc_id") < 5)
    overlap = P.contamination_overlap(scrubbed, bench)
    span_hits = D.contamination_report(scrubbed, bench, L=40)
    clean = stage(
        "decontaminated",
        scrubbed.join(
            overlap.filter(F.col("n_contaminated") > 0)
            .select("doc_id")
            .unionByName(span_hits.select("doc_id"))
            .distinct(),
            "doc_id",
            "left_anti",
        ),
    )
    n_clean = funnel[-1][1]

    # 3b. DSIR importance selection toward the target distribution
    # (here: lang='en'): integer log2 importance weights + the
    # exponential-race sample keeps the docs that look most like the
    # target while staying reproducible
    if n_clean > 0:
        w = X.dsir_weights(clean, F.col("lang") == "en", n_buckets=1024)
        picked = P.dsir_sample(w, k=max(n_clean * 3 // 4, 1))
        clean = stage("dsir_selected", clean.join(picked.select("doc_id"), "doc_id"))
        n_clean = funnel[-1][1]

    # 4. source-mixture sample (equal mixture weights across sources);
    # an empty decontaminated frame ends the funnel gracefully at zeros
    sources = [r.source for r in clean.select("source").distinct().collect()]
    if not sources:
        mixed = clean
        funnel.append(("mixed", 0))
    else:
        budget = max(len(sources), n_clean // 2)
        mixed = P.mix_sample(
            clean, {s: 1 for s in sources}, out_rows=budget, strat_col="source"
        ).select("doc_id").join(clean, "doc_id")
        mixed = stage("mixed", mixed)

    # 4b. training-order + epoch plan over the mixed corpus: per-source
    # quality-curriculum stages with a seeded in-stage shuffle, and the
    # data-constrained integer epoch schedule for a fixed token budget
    from pyfads.pipeline import curriculum_order, epoch_schedule

    order = curriculum_order(mixed, n_stages=3, n_shards=4)
    funnel.append(("curriculum_rows", order.count()))
    sched = epoch_schedule(mixed, budget_tokens=200_000)
    order.write.mode("overwrite").parquet(out + "/train_order")
    sched.write.mode("overwrite").parquet(out + "/epoch_schedule")

    # 5. chunk + pack chunks into fixed-length training contexts
    chunks = stage("chunks", X.chunk_documents(mixed, chunk_tokens=64, stride=48))
    packed = P.pack_greedy(
        chunks.select(
            (F.col("doc_id") * 10_000 + F.col("chunk_idx")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        ),
        context_len=256,
    )
    funnel.append(
        ("packed_contexts", packed.select("shard", "bin_idx").distinct().count())
    )

    packed.write.mode("overwrite").parquet(out + "/contexts")
    chunks.write.mode("overwrite").parquet(out + "/chunks")

    # 6. serving probe: the retrieval stack over the corpus just built —
    # hybrid BM25+dense RRF fusion picks the entry point, then MMR
    # diversifies around it (the RAG serving shape, same oracle-checked
    # operators as retrieval_hybrid_rrf / retrieval_mmr)
    serving: list[str] = []
    if n_clean > 0:
        hits = X.hybrid_rrf(mixed, ["join", "dup", "vector", "window"], k=5)
        top = [r.doc_id for r in hits.orderBy("rank").collect()]
        serving.append(f"hybrid_rrf top-5: {top}")
        if top:
            vecs = X.doc_embed_hash(mixed).withColumnRenamed("doc_id", "vec_id")
            diverse = S.mmr_rerank(
                vecs, vecs.filter(F.col("vec_id") == top[0]), dim=64, k=3, pool=8
            )
            picks = [
                r.neighbor_id
                for r in diverse.orderBy("sel_rank").collect()
            ]
            serving.append(f"mmr around doc {top[0]}: {picks}")

    print("\n=== corpus funnel ===")
    for stage_name, n in funnel:
        print(f"{stage_name:>20}: {n}")
    for line in serving:
        print(line)
    print(f"written: {out}/chunks, {out}/contexts")
    spark.stop()


if __name__ == "__main__":
    main()
