"""Training-batch construction: sequence packing, deterministic global
shuffle, and group-disjoint train/val/test splits.

These are the last-mile operators of an LLM data pipeline — after
dedup/curation the surviving documents must be (a) packed into
fixed-token-budget training sequences/shards, (b) shuffled reproducibly,
and (c) split so that no dedup group straddles train and eval.  None of
these exist in the reference (it is a streaming anonymization engine);
they extend its capability surface per the build brief, same as the
dedup/similarity families.

Design for 100 TB:

- Every operator keys its only shuffle on a deterministic ``shard``
  (``doc_id % n_shards``): packing and shuffling are embarrassingly
  parallel ACROSS shards, strictly ordered WITHIN a shard.  ``n_shards``
  is the output-writer parallelism — thousands on a real cluster, small
  here so fixture bins are non-trivial.
- :func:`pack_concat_chunks` (GPT-style concat-then-chunk) is a pure
  window cumulative sum — whole-stage codegen, one shuffle.
- :func:`pack_nextfit` (whole-document greedy bin packing) is inherently
  sequential per shard, so it runs as one Arrow-batched
  ``applyInPandas`` per shard: O(rows) numpy loop, no driver collect.
  Its DuckDB twin replays the identical greedy recurrence with a
  recursive CTE — bit-exact, not approximate.
- :func:`global_shuffle` orders by a cross-engine md5 hash
  (:func:`pyfads.text.md5_hash60`) — a seeded, reproducible permutation
  with no RNG state to ship; at scale this is one hash-partitioned sort
  per shard, never a global sort.
- :func:`split_by_group` hashes the GROUP key (canonical URL, minhash
  group, …), not the row, so every member of a dup group lands in the
  same split — the standard leakage guard (Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better" — eval
  contamination via near-dups straddling splits).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from pyfads.text import md5_hash60, tokens

__all__ = [
    "token_shards",
    "pack_concat_chunks",
    "pack_nextfit",
    "pack_nextfit_stream",
    "pack_bin_stats",
    "global_shuffle",
    "split_by_group",
]


def token_shards(
    df: DataFrame,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, shard, n_tokens)`` packing input: whitespace token counts
    (the corpus tokenization contract, :func:`pyfads.text.tokens`) and the
    deterministic shard key.  Null-text docs are excluded explicitly (the
    segment-dedup null contract)."""
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("bigint").alias("shard"),
        F.size(tokens(text_col)).cast("bigint").alias("n_tokens"),
    )


def pack_concat_chunks(
    df: DataFrame,
    chunk_tokens: int,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style packing: within each shard, documents are concatenated in
    id order into one token stream that is cut into fixed
    ``chunk_tokens``-sized training chunks; a document may straddle a cut.
    Emits, per doc, the half-open chunk span it occupies:

    - ``first_chunk`` / ``last_chunk`` — chunk ids of the doc's first and
      last token (``floor(prev_cum / C)`` / ``floor((cum - 1) / C)``),
    - ``n_chunks`` — how many chunks the doc touches (1 = no boundary
      crossing).

    One cumulative-sum window per shard is the entire plan — no UDF, no
    join; at 100 TB each shard's running sum is an independent sorted
    partition.  Integer arithmetic end to end (``div``), so the DuckDB
    twin is bit-exact.

    Sibling: :func:`pyfads.pipeline.pack_greedy` plans the same
    concat-writer with hash shards and reports only the STARTING bin;
    this form uses id-ordered shards and reports the full chunk SPAN —
    the boundary-crossing diagnostic (how many docs straddle a context
    cut) that a packing quality report needs."""
    t = token_shards(df, n_shards, text_col, id_col)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        t.withColumn("cum_tokens", cum)
        .select(
            id_col,
            "shard",
            "n_tokens",
            "cum_tokens",
            F.expr(f"(cum_tokens - n_tokens) div {chunk_tokens}").alias("first_chunk"),
            F.expr(f"(cum_tokens - 1) div {chunk_tokens}").alias("last_chunk"),
        )
        .withColumn("n_chunks", (F.col("last_chunk") - F.col("first_chunk") + 1))
    )


def pack_nextfit(
    df: DataFrame,
    capacity: int,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy NEXT-FIT whole-document bin packing per shard: walk docs in
    id order keeping one open bin; a doc that does not fit closes the bin
    and opens the next (an oversize doc gets a bin of its own — fill may
    exceed capacity only then, the standard convention).  Emits
    ``(doc_id, shard, n_tokens, bin_id, fill_after)`` where ``fill_after``
    is the open bin's fill after placing the doc.

    The recurrence is inherently sequential, so each shard runs as ONE
    Arrow-batched ``applyInPandas`` group — a linear numpy/python loop
    over that shard's rows, no ``collect()``, parallel across shards.
    The DuckDB twin replays the exact recurrence as a recursive CTE, so
    the oracle check is bit-exact (this is NOT a heuristic approximation
    of the oracle — both sides compute the same greedy answer)."""
    t = token_shards(df, n_shards, text_col, id_col)
    cap = capacity

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        lens = pdf["n_tokens"].to_numpy()
        bins = [0] * len(lens)
        fills = [0] * len(lens)
        b, fill = 0, 0
        for i, n in enumerate(lens):
            n = int(n)
            if i > 0 and fill + n > cap:
                b, fill = b + 1, 0
            fill += n
            bins[i], fills[i] = b, fill
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["fill_after"] = pd.Series(fills, dtype="int64")
        return pdf

    schema = f"{id_col} bigint, shard bigint, n_tokens bigint, bin_id bigint, fill_after bigint"
    return t.groupBy("shard").applyInPandas(_pack, schema)


def pack_bin_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-bin packing report over :func:`pack_nextfit` output: docs per
    bin, fill, and integer utilization in basis points
    (``fill * 10000 div capacity`` — exact cross-engine arithmetic, no
    float division).  Map-side-combinable aggregation on (shard, bin)."""
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("fill_tokens"),
        F.expr(f"(sum(n_tokens) * 10000) div {capacity}").alias("util_bp"),
    )


def global_shuffle(
    df: DataFrame,
    seed: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic, seeded pseudo-random training order: rows are
    assigned to a shard by hash and ordered within the shard by an
    independent hash (tie-broken by id) — re-running with the same seed
    reproduces the order bit-for-bit on any cluster layout, and changing
    the seed gives an unrelated permutation (epoch reshuffling).

    Scale shape: shard assignment is a hash partition; the within-shard
    ``row_number`` is one sort per shard — there is never a global
    total-order sort.  Both hashes are :func:`pyfads.text.md5_hash60`
    (cross-engine md5), so the DuckDB twin is exact.

    Sibling: :func:`pyfads.pipeline.global_shuffle_index` produces the
    single GLOBAL rank via the two-phase bucket-offset trick; this form
    produces the (shard, position) pair a multi-file shard writer
    consumes directly — no offset pass at all."""
    sid = F.col(id_col).cast("string")
    shard = (md5_hash60(sid, f"{seed}:shard") % n_shards).cast("bigint")
    key = md5_hash60(sid, f"{seed}:order")
    w = Window.partitionBy("shuffle_shard").orderBy("shuffle_key", id_col)
    return (
        df.select(
            F.col(id_col),
            shard.alias("shuffle_shard"),
            key.alias("shuffle_key"),
        )
        .withColumn("shuffle_pos", F.row_number().over(w).cast("bigint"))
    )


def split_by_group(
    df: DataFrame,
    group_col: str,
    seed: str = "split",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Group-disjoint train/val/test assignment: the bucket is a hash of
    the GROUP key, so every row of a dup group receives the same split —
    near-duplicates can never straddle train and eval (the leakage the
    contamination family detects; this prevents it at assembly time).

    Pure per-row column expressions — zero shuffle; the only cost is the
    md5.  ``train_pct``/``val_pct`` are integer percents of 100 hash
    buckets.

    Sibling: :func:`pyfads.pipeline.split_assign` buckets on the ROW id
    (correct when rows are independent); this form buckets on the GROUP
    key, which is the required discipline once a dedup pass has found
    near-duplicate families."""
    bucket = md5_hash60(F.col(group_col), seed) % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split_bucket", bucket.cast("bigint")).withColumn(
        "split", split
    )


def pack_nextfit_stream(
    stream: DataFrame,
    capacity: int,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """STREAMING next-fit packing: the ingest-time form of
    :func:`pack_nextfit` — documents arrive in micro-batches and each
    shard's open bin (id, fill, started) persists in
    ``applyInPandasWithState`` group state, so bins straddle micro-batch
    boundaries exactly as the batch recurrence would place them.  Given
    micro-batches that arrive in id order per shard (an ordered ingest
    feed), the streamed assignment is IDENTICAL row-for-row to the batch
    operator — the property the ``pack_nextfit_streamed`` entry checks
    against the same recursive-CTE oracle.

    Within one (shard, micro-batch) group the Arrow chunks are gathered
    and sorted by id before the linear walk (bounded by the micro-batch,
    not the stream).  No timers: packing state never expires — a
    production deployment would add a TTL alongside the FADS pattern."""
    import pandas as _pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    t = token_shards(stream, n_shards, text_col, id_col)
    cap = capacity
    cols = [id_col, "shard", "n_tokens", "bin_id", "fill_after"]

    def handle(key, pdf_iter, state):
        if state.exists:
            b, fill, started = state.get
        else:
            b, fill, started = 0, 0, 0
        pdf = _pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fills = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if started and fill + n > cap:
                b, fill = b + 1, 0
            fill += n
            started = 1
            bins.append(b)
            fills.append(fill)
        pdf["bin_id"] = _pd.Series(bins, dtype="int64")
        pdf["fill_after"] = _pd.Series(fills, dtype="int64")
        state.update((b, fill, started))
        yield pdf[cols]

    return t.groupBy("shard").applyInPandasWithState(
        handle,
        outputStructType=(
            f"{id_col} bigint, shard bigint, n_tokens bigint, "
            "bin_id bigint, fill_after bigint"
        ),
        stateStructType="bin_id bigint, fill bigint, started int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
