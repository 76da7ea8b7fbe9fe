"""Deduplication operators for training-data pipelines.

- exact dedup: hash-groupBy on the text (one shuffle, map-side combined).
- MinHash + LSH banding near-dup: shingle → per-permutation min-hash →
  band keys → *bucketed* candidate join → exact n-gram Jaccard verify.
  Never an all-pairs crossJoin: the only shuffle keys are the band hashes,
  which is the textbook 100 TB-safe shape (candidates ∝ true dups).
- SimHash: 32-bit per-document signature via per-bit majority vote over
  token hashes — Hamming-adjacent signatures are near-dup candidates.
- embedding near-dup reuses pyfads.similarity.

Hashing is md5-based (``pyfads.text.md5_hash60``) so every step has a
bit-identical DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from pyfads.text import md5_hash60, md5_hash60_py, tokens

__all__ = [
    "exact_dedup",
    "exact_dedup_stream",
    "segment_dedup_scrub",
    "domain_boilerplate_scrub",
    "intradoc_segment_dedup",
    "shingles",
    "shingle_sets",
    "minhash_signature",
    "minhash_band_pairs",
    "jaccard_verify",
    "minhash_near_dup_pairs",
    "char_ngrams",
    "jaccard_ngram_pairs",
    "simhash",
    "simhash_near_dup_pairs",
    "connected_components",
    "MINHASH_P",
    "MINHASH_A",
    "MINHASH_B",
    "incremental_dedup",
    "write_signature_store",
    "read_signature_store",
    "exact_substring_spans",
    "cdc_duplicate_chunks",
    "contamination_report",
    "exact_substring_scrub",
    "contamination_gate_stream",
    "broadcast_eval_hashes",
    "cdc_duplicate_pairs",
]


def segment_dedup_scrub(
    df: DataFrame,
    words_per_segment: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style segment-level global deduplication (Wenzek et al. 2019
    dedups paragraphs by hash across the whole crawl — the standard
    boilerplate killer: headers, footers, license blurbs occur verbatim in
    millions of docs).  The fixture corpus is single-spaced prose without
    newline paragraphs, so the segmentation unit is a fixed width of
    ``words_per_segment`` words; with real newline-delimited text, split
    on the separator upstream and pass 1-line segments through the same
    keeper logic.

    Keeper rule: the globally FIRST occurrence (lexicographic min of
    ``(doc_id, segment_index)``) of every distinct segment survives; all
    other occurrences are scrubbed.  Docs are reassembled from their
    surviving segments in order.  Returns ``(doc_id, n_segments,
    n_dropped, scrubbed_text)`` for every doc with a non-null text.

    Scale shape: the keeper is a ``groupBy(segment).agg(min(struct))`` —
    map-side combinable, so a billion-copy boilerplate segment partial-
    aggregates instead of hot-keying one reducer (a window row_number
    over the segment would); the re-join back is an equi-join on the
    segment.  At 100 TB, key both on a 128-bit hash of the segment
    instead of the string to shrink shuffle bytes (the fixture keys on
    the string so the DuckDB twin is collision-free by construction)."""
    # explicit null-text guard (ADVICE r9): without it the contract leans
    # on size(null) = null — under spark.sql.legacy.sizeOfNull=true (the
    # pre-4.0 default) size(null) = -1, sequence(0, -1) = [0, -1], and a
    # null-text doc would emit two empty segments plus an output row,
    # diverging from the DuckDB twin's WHERE text IS NOT NULL
    df = df.filter(F.col(text_col).isNotNull())
    words = F.split(F.col(text_col), " ")
    w = words_per_segment
    nseg = F.ceil(F.size(words) / F.lit(w)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda b: F.concat_ws(" ", F.slice(words, b * w + 1, w)),
    )
    seg = df.select(F.col(id_col), F.posexplode(segs).alias("blk", "seg"))
    keeper = seg.groupBy("seg").agg(
        F.min(F.struct(F.col(id_col).alias("kid"), F.col("blk").alias("kblk"))).alias(
            "k"
        )
    )
    marked = seg.join(keeper, "seg").withColumn(
        "is_keeper",
        (F.col(id_col) == F.col("k.kid")) & (F.col("blk") == F.col("k.kblk")),
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.when(F.col("is_keeper"), 0).otherwise(1)).cast("long").alias("n_dropped"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("is_keeper"), F.struct("blk", "seg"))
                    )
                ),
                lambda t: t["seg"],
            ),
        ).alias("scrubbed_text"),
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one representative (min id) per distinct text.

    Scale: single hash-partitioned agg on text (consider hashing the text to
    a 128-bit key first at petabyte scale so the shuffle carries 16 bytes,
    not documents — the md5 here doubles as that key).
    """
    return df.groupBy(text_col).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    ).select(id_col, text_col, "n_copies")


def exact_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming exact dedup: keep the first-seen occurrence of each
    distinct text on an unbounded stream (continuous-ingest dedup).

    The state key is the 128-bit content hash, never the document itself —
    per-distinct-doc state is 16 bytes + overhead regardless of text size.

    Two modes:
    - default: ``dropDuplicates`` on the content hash.  State holds every
      distinct hash seen — exact forever, memory ∝ distinct corpus size;
      right when the run is bounded (a backfill replayed as a stream).
    - ``event_time_col`` + ``watermark_delay`` (e.g. ``"1 hour"``):
      ``dropDuplicatesWithinWatermark`` — duplicates are only suppressed
      within the watermark horizon and state expires with it.  Bounded
      state, the 100 TB continuous-ingestion shape (a re-crawl seen a week
      later re-enters; cross-horizon dedup belongs to the batch pass).
    """
    if (event_time_col is None) != (watermark_delay is None):
        raise ValueError(
            "event_time_col and watermark_delay must be supplied together — "
            "a partial pair would silently fall back to unbounded-state "
            "exact mode"
        )
    hashed = stream.withColumn("__content_h", F.md5(F.col(text_col)))
    if event_time_col is not None and watermark_delay is not None:
        out = hashed.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["__content_h"]
        )
    else:
        out = hashed.dropDuplicates(["__content_h"])
    return out.drop("__content_h")


def shingles(text_col: str = "text", k: int = 3) -> "F.Column":
    """Word k-gram shingles (k=3 default) of a single-space-tokenized text."""
    toks = tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    # try_element_at: docs with < k tokens index past the end — ANSI mode
    # hard-fails element_at there; NULLs are skipped by concat_ws, matching
    # DuckDB's out-of-bounds toks[i] -> NULL oracle semantics
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, (i + F.lit(j)).cast("int")) for j in range(k)]
        ),
    )


# Universal-hash permutation constants: mh_j = min((A[j]*h + B[j]) mod P)
# over base hashes h = md5_hash60(shingle) mod P.  One md5 per shingle for
# ALL permutations (vs one per shingle*permutation) — the constants are
# seeded so the DuckDB oracle builder reproduces them exactly.
MINHASH_P = 2_147_483_647  # 2^31 - 1: A*h + B stays well inside int64
_rng = __import__("random").Random(0xFAD5)
MINHASH_A = [_rng.randrange(1, MINHASH_P) for _ in range(64)]
MINHASH_B = [_rng.randrange(0, MINHASH_P) for _ in range(64)]
del _rng


def minhash_signature(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_perm: int = 16, k: int = 3
) -> DataFrame:
    """MinHash signature: mh_j = min over shingles of ((A_j*h + B_j) mod P)
    with h the 60-bit md5 base hash mod P.

    Shape: explode shingles → hash once → groupBy doc with n_perm min aggs.
    The min is map-side combined, so the shuffle carries one row of n_perm
    longs per document — not the shingles.  (A flat ``array_min(transform(
    ...))`` projection re-inlines the shingle array into every permutation
    lambda: 16x recompute and a codegen blowup — measured 20x slower.)
    """
    h = (md5_hash60(F.col("__s"), "mh") % MINHASH_P).alias("__h")
    exploded = df.select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("__s")
    ).select(id_col, h)
    mins = [
        F.min((F.col("__h") * MINHASH_A[j] + MINHASH_B[j]) % MINHASH_P).alias(f"mh{j}")
        for j in range(n_perm)
    ]
    return exploded.groupBy(id_col).agg(*mins)


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingles array) projection — the verify-join side."""
    return df.select(F.col(id_col), shingles(text_col, k).alias("shingles"))


def _band_key(band: int, rows: int) -> "F.Column":
    cols = [F.col(f"mh{band * rows + r}") for r in range(rows)]
    return F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))


def _salt_cap(df: DataFrame, id_col: str, key: str, cap: int, *parts: str) -> DataFrame:
    """Split buckets wider than ``cap`` into salted sub-buckets (ordered by id).

    The skew guard for every LSH-style candidate join here: a bucket shared
    by B rows contributes B^2 join rows, so one boilerplate key can hot-spot
    a task at 100 TB.  With the cap, task size is bounded at cap^2 always;
    recall loss is confined to pathological buckets whose shared key already
    carries no similarity signal (real near-dup buckets are narrow).
    """
    w = Window.partitionBy(*parts, key).orderBy(id_col)
    return (
        df.withColumn("__pos", F.row_number().over(w))
        .withColumn(
            key,
            F.concat_ws(
                "#",
                F.col(key).cast("string"),
                ((F.col("__pos") - 1) / F.lit(cap)).cast("long").cast("string"),
            ),
        )
        .drop("__pos")
    )


def minhash_band_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    max_bucket: int | None = 64,
) -> DataFrame:
    """LSH banding: docs sharing any band key are candidates.

    Shape: explode signature into (band_idx, band_key), self-join on the
    band bucket, distinct (a, b) pairs with a < b.  The join is an
    equi-join on the band key — shuffled, bucketed, never all-pairs.

    ``max_bucket`` is the skew guard for adversarial corpora: a band key
    shared by B docs contributes B^2 join rows, so one boilerplate bucket
    can hot-spot a task at 100 TB.  With a cap, buckets wider than
    ``max_bucket`` are split into ceil(B/max_bucket) salted sub-buckets
    (candidate pairs are then found only within a sub-bucket — bounded
    recall loss on pathological buckets, bounded task size always; real
    near-dup buckets are narrow and unaffected).  **On by default** (64,
    matching :func:`jaccard_ngram_pairs`); pass ``None`` for uncapped
    perfect-recall banding on trusted corpora.
    """
    rows = n_perm // bands
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(F.array(*[_band_key(b, rows) for b in range(bands)])).alias(
            "band_idx", "band_key"
        ),
    )
    if max_bucket is not None:
        banded = _salt_cap(banded, id_col, "band_key", max_bucket, "band_idx")
    a = banded.select(
        F.col(id_col).alias("a_id"), "band_idx", "band_key"
    )
    b = banded.select(
        F.col(id_col).alias("b_id"), "band_idx", "band_key"
    )
    return (
        a.join(b, on=["band_idx", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sh_df: DataFrame, id_col: str = "doc_id", threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard over distinct shingle sets for candidate pairs.

    jac = |distinct(A) ∩ distinct(B)| / |distinct(A ∪ B)|; two equi-joins
    against :func:`shingle_sets` (candidate set is small, ∝ true dups).
    """
    sa = sh_df.select(F.col(id_col).alias("a_id"), F.col("shingles").alias("a_sh"))
    sb = sh_df.select(F.col(id_col).alias("b_id"), F.col("shingles").alias("b_sh"))
    j = (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
            / F.size(F.array_union("a_sh", "b_sh")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("a_id", "b_id", "jaccard")


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    max_bucket: int | None = 64,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature → bands → bucketed
    candidate join → exact Jaccard verify.  ``max_bucket`` (default 64,
    aligned with :func:`jaccard_ngram_pairs`) enables the hot-bucket skew
    guard — see :func:`minhash_band_pairs` for the recall trade-off."""
    sigs = minhash_signature(df, text_col, id_col, n_perm)
    pairs = minhash_band_pairs(sigs, id_col, n_perm, bands, max_bucket)
    return jaccard_verify(pairs, shingle_sets(df, text_col, id_col), id_col, threshold)


def char_ngrams(text_col: str = "text", n: int = 4) -> "F.Column":
    """Distinct character n-grams of the text (ASCII corpus: byte == char)."""
    t = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(n))))


def jaccard_ngram_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    threshold: float = 0.6,
    max_block: int | None = 64,
) -> DataFrame:
    """Char n-gram Jaccard near-dup pairs with min-wise blocking.

    Blocking key = the min 60-bit hash over a doc's distinct n-grams (a
    1-permutation MinHash): docs with Jaccard j collide with probability j,
    so recall at threshold 0.6+ is >= 0.6 per pass while the only shuffle
    key is one 8-byte hash per document — never the |N|^2 cross product.
    Candidates are then verified with exact Jaccard over the distinct-gram
    sets.

    Two scale guards (measured 5x at sf0.1, essential at 100 TB):

    - ``max_block``: same-vocabulary corpora share their globally-minimal
      gram hash, producing ~1000-doc hot blocks (B^2 pair blowup in one
      task).  Blocks wider than the cap are split into salted sub-blocks
      ordered by id — bounded task size; recall loss only inside blocks
      whose shared min-gram already carries no similarity signal.  **On by
      default** (64, aligned with :func:`minhash_near_dup_pairs`): pairs
      that straddle two sub-blocks of a >64-doc block are missed — pass
      ``max_block=None`` for uncapped blocking on trusted corpora.
    - size prefilter: ``jaccard >= t`` implies ``min(|A|,|B|)/max >= t``
      (intersection <= min, union >= max), so candidate pairs are pruned on
      two ints before the exact set intersection runs.
    """
    grams = df.select(F.col(id_col), char_ngrams(text_col, n).alias("__g"))
    keyed = grams.select(
        id_col,
        "__g",
        F.size("__g").alias("__sz"),
        F.array_min(F.transform("__g", lambda g: md5_hash60(g, "jg"))).alias("__bk"),
    )
    if max_block is not None:
        keyed = _salt_cap(keyed, id_col, "__bk", max_block)
    # explicit hash-partition on the block key: the verify stage is
    # CPU-bound (set intersections) on byte-small rows, and AQE's
    # size-based coalescing would otherwise squash it onto 1-2 cores;
    # both self-join branches reuse this one exchange, co-partitioned
    keyed = keyed.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "__bk"
    )
    a = keyed.select(
        F.col(id_col).alias("a_id"), F.col("__g").alias("a_g"),
        F.col("__sz").alias("a_sz"), "__bk",
    )
    b = keyed.select(
        F.col(id_col).alias("b_id"), F.col("__g").alias("b_g"),
        F.col("__sz").alias("b_sz"), "__bk",
    )
    j = (
        a.join(b, "__bk")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            F.least("a_sz", "b_sz").cast("double") / F.greatest("a_sz", "b_sz")
            >= F.lit(threshold)
        )
        .withColumn("__i", F.size(F.array_intersect("a_g", "b_g")))
        .withColumn(
            # grams are distinct sets, so |A∪B| = |A|+|B|-|A∩B| — one hash
            # pass per pair instead of two (array_union dropped); exact
            # integer arithmetic, so the value (and the DuckDB oracle)
            # is unchanged
            "jaccard",
            F.col("__i").cast("double")
            / (F.col("a_sz") + F.col("b_sz") - F.col("__i")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("a_id", "b_id", "jaccard")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """SimHash signature: per-bit majority vote over (multiplicity-counted)
    token hashes; bit b set iff vote > 0.

    Shape: explode tokens → 60-bit hash → groupBy doc with ``bits`` CASE
    sums (map-side combined) → reassemble the integer.  One shuffle on the
    doc id.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = tok.select(id_col, md5_hash60(F.col("tok"), "sh").alias("hv"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("hv"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    v = h.groupBy(id_col).agg(*votes)
    sig = reduce(
        lambda a, b: a + b,
        [
            F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
            for b in range(bits)
        ],
    )
    return v.select(id_col, sig.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = 64,
) -> DataFrame:
    """SimHash near-dup pairs: band the signature, bucket-join, verify Hamming.

    By pigeonhole, two signatures within Hamming distance ``max_hamming``
    < ``bands`` must agree exactly on at least one band, so banding gives
    perfect recall at ``max_hamming <= bands - 1`` while the join stays an
    equi-join on (band_idx, band_value) — never all-pairs.  The verify step
    is ``bit_count(a XOR b) <= max_hamming`` on the two 64-bit signatures.
    ``max_bucket`` (default 64, aligned with the other near-dup pipelines)
    enables the hot-bucket salt guard (see :func:`_salt_cap`) — essential
    here at scale: a band is only ``bits/bands`` wide, so band values
    collide far more often than md5 band keys do.
    """
    if max_hamming >= bands:
        raise ValueError("banding guarantees recall only for max_hamming < bands")
    width = bits // bands
    mask = (1 << width) - 1
    sigs = simhash(df, text_col, id_col, bits)
    banded = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__b"),
    ).select(id_col, "simhash", "__b.band_idx", "__b.band_key")
    if max_bucket is not None:
        banded = _salt_cap(banded, id_col, "band_key", max_bucket, "band_idx")
    a = banded.select(
        F.col(id_col).alias("a_id"), F.col("simhash").alias("__a_sig"), "band_idx", "band_key"
    )
    b = banded.select(
        F.col(id_col).alias("b_id"), F.col("simhash").alias("__b_sig"), "band_idx", "band_key"
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("__a_sig").bitwiseXOR(F.col("__b_sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-group assignment: connected components over an undirected
    near-dup pair list.  Returns ``(id_col, group_id)`` where ``group_id``
    is the smallest member id of the component — keep one doc per group
    (canonically the one with ``doc_id == group_id``) to deduplicate.

    Algorithm: iterative min-label propagation with pointer jumping
    (label <- label-of-label each round), the DataFrame rendering of the
    classic large-star/small-star CC used for web-scale dedup.  Pointer
    jumping halves chain depth per round, so convergence is
    O(log diameter) joins, not O(diameter).

    100 TB shape: the iteration runs ONLY over edge endpoints — docs that
    appear in at least one near-dup pair, a small fraction of the corpus —
    and singletons rejoin at the end via one left join (``group_id`` =
    own id).  Each round is two equi-joins + a map-side-combined min-agg
    on 8-byte keys; ``localCheckpoint`` truncates lineage so plans stay
    flat.  The per-round driver action is a single monotone convergence
    scalar (sum of labels, strictly decreasing until fixpoint), never a
    data collect.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        # checkpoint the EDGE LIST itself (r12): every convergence round is
        # its own Spark job, and an un-materialized `edges` re-executed the
        # whole upstream pair-generation pipeline (MinHash banding + verify
        # join for the dedup entries) once per round — O(rounds) full
        # corpus passes at 100 TB.  Edge-endpoint-sized, the documented
        # iteration state bound.  eager=False: the first round's action
        # materializes it; later rounds read the cached blocks.
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("u").alias(id_col))
        .distinct()
        .withColumn("group_id", F.col(id_col))
        .localCheckpoint(eager=False)
    )
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed(id_col, "v"), "v")
            .groupBy("u")
            .agg(F.min("group_id").alias("__nbr"))
        )
        stepped = (
            labels.join(nbr_min.withColumnRenamed("u", id_col), id_col, "left")
            .select(
                id_col,
                F.least(
                    F.col("group_id"), F.coalesce(F.col("__nbr"), F.col("group_id"))
                ).alias("group_id"),
            )
        )
        # pointer jump: label <- label's label (labels are themselves node ids)
        jump = labels.select(
            F.col(id_col).alias("group_id"), F.col("group_id").alias("__gg")
        )
        labels = (
            stepped.join(jump, "group_id", "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("__gg"), F.col("group_id")).alias("group_id"),
            )
            # eager=False: the convergence agg below materializes the
            # checkpoint inside ITS job — one job per round, not two
            .localCheckpoint(eager=False)
        )
        # NOTE (r12): folding this scalar into the checkpoint job via
        # df.observe() was tried and measured SLOWER — Observation.get
        # waits on the async listener bus, which under load adds seconds
        # per round; the agg over the lazily-checkpointed frame does the
        # same in one job without the listener dependency
        cur = labels.agg(F.sum("group_id")).first()[0]
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    if nodes is None:
        return labels
    return (
        nodes.select(id_col)
        .join(labels, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("group_id"), F.col(id_col)).alias("group_id"),
        )
    )


def write_signature_store(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    k: int = 3,
    mode: str = "overwrite",
) -> str:
    """Materialize the corpus-side dedup state once so per-batch ingest
    never re-reads (let alone re-shingles) the corpus text — the real
    100 TB shape of :func:`incremental_dedup`, where the corpus is
    petabytes but its signature store is three narrow tables:

    - ``hashes``   — distinct md5 content hashes (16 bytes/doc);
    - ``sigs``     — :func:`minhash_signature` output (``n_perm`` longs/doc);
    - ``shingles`` — :func:`shingle_sets` output (the Jaccard-verify side;
      the one store proportional to text size — at extreme scale replace
      with a second, longer minhash signature as the verifier).

    Per-batch cost then depends only on batch size + store size, not
    corpus text size; after each refresh, append the admitted batch's
    signatures (``mode="append"``) instead of rebuilding.  On a cluster,
    write ``sigs`` through pyfads.io.write_bucketed on the band keys so
    the candidate join is corpus-side shuffle-free.
    """
    corpus.select(F.md5(F.col(text_col)).alias("__h")).distinct().write.mode(
        mode
    ).parquet(f"{path}/hashes")
    minhash_signature(corpus, text_col, id_col, n_perm, k).write.mode(mode).parquet(
        f"{path}/sigs"
    )
    shingle_sets(corpus, text_col, id_col, k).write.mode(mode).parquet(
        f"{path}/shingles"
    )
    return path


def read_signature_store(spark, path: str) -> "tuple[DataFrame, DataFrame, DataFrame]":
    """(hashes, sigs, shingles) frames of a :func:`write_signature_store`
    dataset — pass them to :func:`incremental_dedup` as ``corpus_hashes``/
    ``corpus_sigs``/``corpus_shingles`` (with ``corpus=None``)."""
    return (
        spark.read.parquet(f"{path}/hashes"),
        spark.read.parquet(f"{path}/sigs"),
        spark.read.parquet(f"{path}/shingles"),
    )


def incremental_dedup(
    corpus: "DataFrame | None",
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    max_bucket: int | None = 64,
    corpus_hashes: "DataFrame | None" = None,
    corpus_sigs: "DataFrame | None" = None,
    corpus_shingles: "DataFrame | None" = None,
) -> DataFrame:
    """Incremental ingest dedup: admit ``batch`` documents against an
    existing ``corpus`` — the daily-crawl-vs-historical-corpus gate of a
    continuously-grown training set.  Returns one row per batch doc with a
    ``keep`` verdict and the first matching drop ``reason``:

    - ``exact``       — same text as a corpus doc or an earlier (lower-id)
      batch doc (md5 content-hash semi-join; 16-byte keys, never the text);
    - ``near_corpus`` — MinHash band collision with a corpus doc verified
      at n-gram Jaccard >= ``threshold``;
    - ``near_batch``  — verified near-dup of an earlier batch doc
      (keep-first-id, same rule as :func:`minhash_near_dup_pairs` pairs);
    - ``kept``        — none of the above.

    Scale shape: the corpus is touched by exactly two shuffles (content
    hashes; minhash signatures — both map-side-combined to one short row
    per doc) and never joined to itself.  Cross candidates are an equi-join
    on band keys with the corpus side *capped* at ``max_bucket`` docs per
    bucket (first by id; overflow dropped — bounded fan-out per batch doc,
    recall loss only on boilerplate buckets).  Batch-internal pairs reuse
    the salt-capped self-join.  At 100 TB the corpus signatures/hashes
    would be a bucketed table maintained incrementally (pyfads.io.
    write_bucketed), making the per-batch cost independent of corpus size
    — pass them in as ``corpus_hashes`` (distinct md5 strings, column
    ``__h``), ``corpus_sigs`` (:func:`minhash_signature` output) and
    ``corpus_shingles`` (:func:`shingle_sets` output), and the corpus
    text column is never read at all (output verified identical:
    tests/test_llm_ops.py::test_incremental_dedup_presigged).  With all
    three supplied (e.g. from :func:`read_signature_store`), ``corpus``
    may be ``None`` — the corpus dataframe is not referenced at all.
    """
    if corpus is None and (
        corpus_hashes is None or corpus_sigs is None or corpus_shingles is None
    ):
        raise ValueError(
            "corpus=None requires corpus_hashes, corpus_sigs AND "
            "corpus_shingles (a signature store) — a partial store would "
            "silently need the corpus text"
        )
    bh = batch.select(F.col(id_col), F.md5(F.col(text_col)).alias("__h"))
    ch = (
        corpus_hashes
        if corpus_hashes is not None
        else corpus.select(F.md5(F.col(text_col)).alias("__h")).distinct()
    )
    exact_corpus = bh.join(ch, "__h", "left_semi").select(id_col)
    first_b = bh.groupBy("__h").agg(F.min(id_col).alias("__first"))
    exact_batch = (
        bh.join(first_b, "__h").filter(F.col(id_col) > F.col("__first")).select(id_col)
    )
    exact_ids = exact_corpus.union(exact_batch).distinct().withColumn(
        "__exact", F.lit(True)
    )

    rows = n_perm // bands
    banded = lambda sigs: sigs.select(  # noqa: E731
        F.col(id_col),
        F.posexplode(F.array(*[_band_key(b, rows) for b in range(bands)])).alias(
            "band_idx", "band_key"
        ),
    )
    # one signature frame per side, shared by the cross join and the
    # batch-internal banding: the identical agg subtrees canonicalize to one
    # ReusedExchange instead of re-hashing every shingle per consumer
    sig_b = minhash_signature(batch, text_col, id_col, n_perm)
    bands_b = banded(sig_b)
    sig_c = (
        corpus_sigs
        if corpus_sigs is not None
        else minhash_signature(corpus, text_col, id_col, n_perm)
    )
    bands_c = banded(sig_c)
    if max_bucket is not None:
        w = Window.partitionBy("band_idx", "band_key").orderBy(id_col)
        bands_c = (
            bands_c.withColumn("__pos", F.row_number().over(w))
            .filter(F.col("__pos") <= max_bucket)
            .drop("__pos")
        )
    cand_cb = (
        bands_b.select(F.col(id_col).alias("b_id"), "band_idx", "band_key")
        .join(
            bands_c.select(F.col(id_col).alias("a_id"), "band_idx", "band_key"),
            on=["band_idx", "band_key"],
        )
        .select("a_id", "b_id")
        .distinct()
    )
    sh_c = (
        corpus_shingles
        if corpus_shingles is not None
        else shingle_sets(corpus, text_col, id_col)
    )
    sh_all = sh_c.unionByName(shingle_sets(batch, text_col, id_col))
    near_corpus_ids = (
        jaccard_verify(cand_cb, sh_all, id_col, threshold)
        .select(F.col("b_id").alias(id_col))
        .distinct()
        .withColumn("__near_c", F.lit(True))
    )
    pairs_bb = minhash_band_pairs(sig_b, id_col, n_perm, bands, max_bucket)
    near_batch_ids = (
        jaccard_verify(pairs_bb, shingle_sets(batch, text_col, id_col), id_col, threshold)
        .select(F.col("b_id").alias(id_col))
        .distinct()
        .withColumn("__near_b", F.lit(True))
    )
    out = (
        batch.select(id_col)
        .join(exact_ids, id_col, "left")
        .join(near_corpus_ids, id_col, "left")
        .join(near_batch_ids, id_col, "left")
    )
    reason = (
        F.when(F.col("__exact"), F.lit("exact"))
        .when(F.col("__near_c"), F.lit("near_corpus"))
        .when(F.col("__near_b"), F.lit("near_batch"))
        .otherwise(F.lit("kept"))
    )
    return out.select(
        id_col,
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """EXACT Jaccard threshold self-join via prefix filtering — the
    SSJoin/PPJoin family (Chaudhuri-Ganti-Kaushik ICDE'06, Xiao et al.
    WWW'08): the deterministic, no-false-negative complement to the
    probabilistic MinHash-LSH path.  Guarantees every pair with
    J(A,B) >= t is returned (LSH can miss pairs between band boundaries;
    this cannot), at the cost of a larger candidate set on low-similarity
    corpora.

    Prefix-filter theorem: order each doc's distinct shingles by GLOBAL
    frequency (rarest first); if J(A,B) >= t, the first
    ``|X| - ceil(t*|X|) + 1`` shingles of A and B must share an element —
    so candidates come from an equi-join on prefix shingles only, plus a
    size filter (t*|B| <= |A| <= |B|/t).  Verification is exact set
    intersection; the threshold test is the integer cross-multiplication
    ``den*inter >= num*uni`` — no float ever decides membership.

    Scale shape: the only shuffles are (a) the global shingle-frequency
    agg, (b) a per-doc window (bounded by doc length) for prefix ranks,
    and (c) the prefix equi-join, whose key distribution is rarest-first
    by construction — the frequency ordering is itself the skew guard
    (a stop-shingle lands in a prefix only for docs made almost entirely
    of stop-shingles).  Verification joins touch candidates only.
    """
    t_num, t_den = threshold_num, threshold_den
    ds = df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, k))).alias("g")
    )
    sz = ds.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("s"))
    gf = ds.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("gdf"))
    w = Window.partitionBy(id_col).orderBy("gdf", "g")
    ranked = (
        ds.join(gf, "g")
        .withColumn("rn", F.row_number().over(w))
        .join(sz, id_col)
        # prefix length p = s - ceil(t*s) + 1;  ceil(n*s/d) = (n*s + d - 1) div d
        .filter(
            F.col("rn")
            <= F.col("s") - F.expr(f"({t_num} * s + {t_den} - 1) div {t_den}") + 1
        )
        .select(F.col(id_col), F.col("g"), F.col("s"))
    )
    a = ranked.select(
        F.col(id_col).alias("a_id"), F.col("g"), F.col("s").alias("sa")
    )
    b = ranked.select(
        F.col(id_col).alias("b_id"), F.col("g"), F.col("s").alias("sb")
    )
    cands = (
        a.join(b, "g")
        .filter(F.col("a_id") < F.col("b_id"))
        # size filter: J >= t forces t*s_max <= s_min
        .filter(
            F.lit(t_den) * F.least("sa", "sb") >= F.lit(t_num) * F.greatest("sa", "sb")
        )
        .select("a_id", "b_id")
        .distinct()
    )
    arr = ds.groupBy(id_col).agg(F.sort_array(F.collect_list("g")).alias("gs"))
    va = arr.select(F.col(id_col).alias("a_id"), F.col("gs").alias("ga"))
    vb = arr.select(F.col(id_col).alias("b_id"), F.col("gs").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("long")
    return (
        cands.join(va, "a_id")
        .join(vb, "b_id")
        .withColumn("inter", inter)
        .withColumn(
            "uni", (F.size("ga") + F.size("gb")).cast("long") - F.col("inter")
        )
        .filter(F.lit(t_den) * F.col("inter") >= F.lit(t_num) * F.col("uni"))
        .select(
            "a_id",
            "b_id",
            "inter",
            "uni",
            (F.col("inter").cast("double") / F.col("uni").cast("double")).alias(
                "jaccard"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Substring-level exact dedup (ExactSubstr class)
# ---------------------------------------------------------------------------


def exact_substring_spans(
    df: DataFrame, L: int = 40, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """ExactSubstr-class duplicate detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, the merged character spans covered by length-``L``
    substrings that occur more than once in the corpus — the verbatim-copy
    case MinHash/SimHash/PPJoin miss (a long quoted passage embedded in an
    otherwise-different document).

    Spark shape (no suffix array needed; the suffix array is a single-node
    data structure, this is its shuffle-native equivalent):

    1. explode each doc into stride-1 length-L char shingles ``(pos, h)``
       — ``h`` is the shared 60-bit md5 so the wide shuffle carries 8-byte
       keys, never text;
    2. one hash-partitioned window count per shingle hash; keep
       occurrences whose corpus frequency >= 2 (Lee et al.'s "occurs more
       than once in the training set");
    3. per-doc gaps-and-islands merge of the overlapping/adjacent
       ``[pos, pos+L-1]`` spans (all spans are length L and arrive sorted
       by pos, so a lag() suffices — no running-max needed).

    Returns one row per doc with any duplicated coverage:
    ``(doc_id, n_spans, dup_chars, n_chars, dup_ppm)`` with integer ppm
    (``dup_chars * 1e6 div n_chars`` — cross-engine exact).

    100-TB note: stride-1 shingling amplifies the shuffle ~L x corpus —
    the exactness price, same order as a suffix array's O(n) positions.
    The scale mitigation is content-defined chunking
    (:func:`cdc_duplicate_chunks`): alignment-robust at ~1/m the shuffle
    rows, catching only spans longer than the expected chunk size.
    """
    if L < 2:
        raise ValueError(f"exact_substring_spans: L must be >= 2, got {L}")
    sh = _shingle_occurrences(df, L, text_col, id_col)
    freq = F.count(F.lit(1)).over(Window.partitionBy("h"))
    occ = sh.withColumn("c", freq).filter(F.col("c") >= 2).drop("c", "h")
    return _merge_occurrence_spans(occ, L, id_col, out_chars="dup_chars",
                                   out_ppm="dup_ppm")


XSUB_SEED = "xsub"  # shared by batch shingling, SQL twins, and the
# streaming gate's Python-side hashing — one constant, three lockstep twins


def _shingle_occurrences(
    df: DataFrame, L: int, text_col: str, id_col: str, seed: str = XSUB_SEED
) -> DataFrame:
    """Stride-1 length-L char-shingle hash occurrences:
    ``(id, n_chars, pos, h)`` — 8-byte hash keys, text never shuffled."""
    d = df.select(id_col, text_col, F.length(text_col).alias("n_chars")).filter(
        F.col("n_chars") >= L
    )
    return d.select(
        id_col,
        "n_chars",
        F.explode(
            F.sequence(F.lit(1), F.col("n_chars") - F.lit(L) + F.lit(1))
        ).alias("pos"),
        F.col(text_col),
    ).select(
        id_col,
        "n_chars",
        "pos",
        md5_hash60(F.expr(f"substring({text_col}, pos, {L})"), seed).alias("h"),
    )



def _occurrence_spans(occ: DataFrame, L: int, id_col: str) -> DataFrame:
    """Merged (gaps-and-islands) spans from length-L occurrences at
    ``(id, pos)``: one row per maximal covered region ``(id, n_chars, s, e)``.
    All spans are length L and sorted by pos, so a lag() suffices (end is
    monotone — no running max needed)."""
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    brk = occ.withColumn(
        "b",
        F.when(
            F.lag("pos").over(wdoc).isNull()
            | (F.col("pos") > F.lag("pos").over(wdoc) + F.lit(L)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    isl = brk.withColumn(
        "isl",
        F.sum("b").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy(id_col, "isl").agg(
        F.first("n_chars").alias("n_chars"),
        F.min("pos").alias("s"),
        (F.max("pos") + F.lit(L) - F.lit(1)).alias("e"),
    )

def _merge_occurrence_spans(
    occ: DataFrame,
    L: int,
    id_col: str,
    out_chars: str,
    out_ppm: str,
) -> DataFrame:
    """Gaps-and-islands merge of length-L spans at ``(id, pos)`` into one
    row per doc: span count, covered chars, total chars, integer ppm.
    All spans are length L and sorted by pos, so a lag() suffices (end is
    monotone — no running max needed)."""
    spans = _occurrence_spans(occ, L, id_col)
    return (
        spans.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + F.lit(1)).cast("long").alias(out_chars),
            F.first("n_chars").cast("long").alias("n_chars"),
        )
        .withColumn(
            out_ppm, F.expr(f"{out_chars} * 1000000 div n_chars").cast("long")
        )
    )


def cdc_duplicate_chunks(
    df: DataFrame,
    window: int = 16,
    modulus: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined-chunking duplicate detection — the 100-TB-shaped
    sibling of :func:`exact_substring_spans` (the stride/offset-robust
    trick behind rsync/LBFS chunking and CDC dedup generally): cut every
    document at positions where the rolling hash of the trailing
    ``window`` chars is ``== 0 (mod modulus)``.  Cut points depend only on
    LOCAL content, so two copies of a long passage embedded at *different
    offsets* in different documents produce the same interior chunks —
    no alignment problem, and only ~``n/modulus`` chunk rows reach the
    shuffle (vs ``n`` stride-1 shingle rows).

    A chunk whose full text occurs >= 2 times corpus-wide is duplicated.
    Returns per doc: ``(doc_id, n_chunks, n_dup_chunks, dup_chars,
    n_chars, dup_ppm)`` (integer ppm).  Docs shorter than ``window`` are
    a single chunk.  Detection granularity: verbatim regions shorter than
    the expected chunk length (~``modulus`` chars) are missed — that is
    the explicit recall-for-shuffle trade documented in SCALE.md.
    """
    chunks = _cdc_chunks(df, window, modulus, text_col, id_col)
    freq = F.count(F.lit(1)).over(Window.partitionBy("ch"))
    marked = chunks.withColumn("dup", (freq >= 2).cast("long"))
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("dup").cast("long").alias("n_dup_chunks"),
            F.sum(F.col("dup") * F.col("clen")).cast("long").alias("dup_chars"),
            F.first("n_chars").cast("long").alias("n_chars"),
        )
        .withColumn(
            "dup_ppm", F.expr("dup_chars * 1000000 div n_chars").cast("long")
        )
    )



def _cdc_chunks(
    df: DataFrame, window: int, modulus: int, text_col: str, id_col: str
) -> DataFrame:
    """Content-defined chunks ``(id, n_chars, clen, ch)``: cut positions
    where the rolling md5 of the trailing ``window`` chars is 0 mod
    ``modulus`` (i == n adds nothing — the doc end is always a boundary);
    the hashes are the shared 60-bit md5 so DuckDB computes the same cuts
    and the same chunk identities."""
    d = df.select(id_col, text_col, F.length(text_col).alias("n_chars")).filter(
        F.col("n_chars") >= 1
    )
    cuts = (
        d.filter(F.col("n_chars") > window)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(window), F.col("n_chars") - F.lit(1))
            ).alias("bp"),
            F.col(text_col),
        )
        .filter(
            md5_hash60(
                F.expr(f"substring({text_col}, bp - {window} + 1, {window})"),
                "cdc",
            )
            % modulus
            == 0
        )
        .select(id_col, "bp")
    )
    ends = cuts.unionByName(d.select(id_col, F.col("n_chars").alias("bp")))
    wdoc = Window.partitionBy(id_col).orderBy("bp")
    return (
        ends.withColumn(
            "start", F.coalesce(F.lag("bp").over(wdoc) + F.lit(1), F.lit(1))
        )
        .join(d, id_col)
        .select(
            id_col,
            "n_chars",
            (F.col("bp") - F.col("start") + F.lit(1)).alias("clen"),
            md5_hash60(
                F.expr(f"substring({text_col}, start, bp - start + 1)"), "cchunk"
            ).alias("ch"),
        )
    )


def cdc_duplicate_pairs(
    df: DataFrame,
    window: int = 16,
    modulus: int = 64,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Doc pairs sharing >= ``min_shared`` identical CDC chunks — the
    actionable PAIRS view of :func:`cdc_duplicate_chunks` (which docs
    near-verbatim-overlap, offset-robust), feeding the same
    connected-components / survivor machinery as the MinHash pairs.

    Shape: distinct (id, chunk-hash) self-join on the 8-byte chunk hash —
    candidates ∝ true shared content, never all-pairs.  At 100 TB, cap
    pathological buckets exactly like the MinHash band join
    (``_salt_cap``); uncapped here because the oracle twin is exact.
    Returns ``(a_id, b_id, n_shared_chunks, shared_chars)``.
    """
    ch = _cdc_chunks(df, window, modulus, text_col, id_col).select(
        id_col, "ch", "clen"
    ).distinct()
    a = ch.select(
        F.col(id_col).alias("a_id"), F.col("ch"), F.col("clen")
    )
    b = ch.select(F.col(id_col).alias("b_id"), F.col("ch"))
    return (
        a.join(b, "ch")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_chunks"),
            F.sum("clen").cast("long").alias("shared_chars"),
        )
        .filter(F.col("n_shared_chunks") >= min_shared)
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    L: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval decontamination scan (the GPT-3-appendix / PaLM-style
    n-gram overlap check): for each TRAINING document, the merged char
    spans covered by length-``L`` substrings that also appear anywhere in
    the EVAL set, plus how many distinct eval documents it collides with.
    Docs with no overlap are absent — the clean corpus is the anti-join.

    Scale shape: the eval side is benchmarks (KBs–MBs), so its distinct
    ``(h, eval_id)`` shingle hashes BROADCAST; the 100-TB corpus is
    scanned once into (doc, pos, h) occurrences and never shuffled on the
    hash at all — the only wide exchange is the per-doc span merge, keyed
    on doc_id.  Returns ``(doc_id, n_spans, contaminated_chars, n_chars,
    contam_ppm, n_eval_docs)``.
    """
    if L < 2:
        raise ValueError(f"contamination_report: L must be >= 2, got {L}")
    ev = (
        _shingle_occurrences(eval_df, L, text_col, id_col)
        .select(F.col("h"), F.col(id_col).alias("__eval_id"))
        .distinct()
    )
    co = _shingle_occurrences(corpus, L, text_col, id_col)
    hits = co.join(F.broadcast(ev), "h")
    occ = hits.select(id_col, "n_chars", "pos").distinct()
    spans = _merge_occurrence_spans(
        occ, L, id_col, out_chars="contaminated_chars", out_ppm="contam_ppm"
    )
    ev_counts = hits.groupBy(id_col).agg(
        F.count_distinct("__eval_id").cast("long").alias("n_eval_docs")
    )
    return spans.join(ev_counts, id_col)


def exact_substring_scrub(
    df: DataFrame,
    L: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    emit: str = "digest",
) -> DataFrame:
    """The ACTION step of ExactSubstr dedup (Lee et al. 2022 keep-one
    semantics): rewrite each document with its duplicated spans REMOVED,
    keeping the corpus-canonical occurrence — the first ``(doc_id, pos)``
    of each repeated length-``L`` substring survives, every other
    occurrence's merged span is cut out.

    Keep-one holds even for periodic/repetitive text, where overlapping
    occurrences of the same substring share chars with the canonical one
    (e.g. ``'a'*50`` at L=40 has 11 overlapping occurrences): the merged
    removal spans are interval-SUBTRACTED by the doc's merged canonical
    spans before any char is cut, so the canonical copy always survives
    intact.  Without the subtraction the removal span ``[2, 50]`` would
    eat into the kept ``[1, 40]`` copy and the doc would collapse to one
    char.

    Returns ALL docs.  ``emit="digest"`` (default):
    ``(doc_id, clean_md5, n_chars_clean, removed_chars)`` — the md5 keeps
    the driver comparison narrow while pinning the reconstructed text
    byte-for-byte.  ``emit="text"``: ``(doc_id, <text_col>,
    removed_chars)`` with the actual cleaned text, for pipeline use.

    Shape on top of :func:`exact_substring_spans`'s machinery: the
    canonicity rank is one more window on the same hash partitioning
    (``row_number`` over (h | doc, pos)); the interval subtraction is one
    overlap join of two small per-doc span sets; text reconstruction is a
    per-span slice via ``lag(e)`` + an order-pinned ``array_sort`` fold —
    no per-row Python, no collect.
    """
    if L < 2:
        raise ValueError(f"exact_substring_scrub: L must be >= 2, got {L}")
    if emit not in ("digest", "text"):
        # validate before any plan construction so a typo'd emit fails
        # immediately rather than after the whole lazy plan is built
        raise ValueError(f"exact_substring_scrub: emit must be 'digest' or 'text', got {emit!r}")
    sh = _shingle_occurrences(df, L, text_col, id_col)
    wh = Window.partitionBy("h")
    rn = F.row_number().over(wh.orderBy(id_col, "pos"))
    dup = (
        sh.withColumn("c", F.count(F.lit(1)).over(wh))
        .withColumn("rn", rn)
        .filter(F.col("c") >= 2)
    )
    rem_spans = _occurrence_spans(
        dup.filter(F.col("rn") > 1).select(id_col, "n_chars", "pos"), L, id_col
    ).select(id_col, "s", "e")
    can_spans = _occurrence_spans(
        dup.filter(F.col("rn") == 1).select(id_col, "n_chars", "pos"), L, id_col
    ).select(F.col(id_col).alias("__cid"), F.col("s").alias("cs"), F.col("e").alias("ce"))

    # interval subtraction rem \ canon: per removal span, the gap before
    # each overlapping canonical span plus the tail after the last one — a
    # sentinel canon row at e+1 makes the tail fall out of the same formula
    matched = rem_spans.join(
        can_spans,
        (F.col(id_col) == F.col("__cid"))
        & (F.col("cs") <= F.col("e"))
        & (F.col("ce") >= F.col("s")),
    ).select(id_col, "s", "e", "cs", "ce")
    sentinel = rem_spans.select(
        id_col, "s", "e", (F.col("e") + 1).alias("cs"), (F.col("e") + 1).alias("ce")
    )
    wspan = Window.partitionBy(id_col, "s").orderBy("cs")
    gaps = (
        matched.unionByName(sentinel)
        .withColumn(
            "gs",
            F.greatest(
                F.col("s"), F.coalesce(F.lag("ce").over(wspan) + 1, F.col("s"))
            ),
        )
        .withColumn("ge", F.col("cs") - 1)
        .filter(F.col("ge") >= F.col("gs"))
        .select(id_col, F.col("gs").alias("s"), F.col("ge").alias("e"))
    )

    base = df.select(id_col, F.col(text_col).alias("__t"))
    sp = gaps.join(base, id_col)
    wdoc = Window.partitionBy(id_col).orderBy("s")
    prev_e = F.coalesce(F.lag("e").over(wdoc), F.lit(0))
    sp = sp.withColumn(
        "piece",
        F.substring(F.col("__t"), prev_e + 1, F.col("s") - prev_e - 1),
    )
    per_doc = sp.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("s", "piece"))).alias("parts"),
        F.max("e").alias("last_e"),
        F.sum(F.col("e") - F.col("s") + F.lit(1)).cast("long").alias("removed_chars"),
    )
    res = df.select(id_col, F.col(text_col).alias("__t")).join(
        per_doc, id_col, "left"
    )
    clean = F.when(F.col("parts").isNull(), F.col("__t")).otherwise(
        F.concat(
            F.array_join(F.transform(F.col("parts"), lambda x: x["piece"]), ""),
            F.expr("substring(__t, last_e + 1, length(__t))"),
        )
    )
    removed = F.coalesce(F.col("removed_chars"), F.lit(0)).cast("long").alias(
        "removed_chars"
    )
    if emit == "text":
        return res.select(id_col, clean.alias(text_col), removed)
    return res.select(
        id_col,
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("long").alias("n_chars_clean"),
        removed,
    )


def _ceil_ppm(part: int, whole: int) -> int:
    """Ceiling parts-per-million: any nonzero part scores >= 1 ppm
    regardless of document length (floor division reports 0 once
    whole > part * 1e6, which would leak contaminated long docs past a
    0-ppm gate)."""
    return -((-part * 1_000_000) // whole)


def _gate_ppm_udf(bc, L: int):
    """Arrow-batched contamination-ppm UDF over a BROADCAST eval-hash set.

    ``bc`` is a ``pyspark.Broadcast`` of ``(L, frozenset)`` — the 60-bit
    shingle hashes tagged with the length they were computed at; the
    closure captures only the broadcast HANDLE (a few hundred bytes
    however large the eval set grows — pinned by tests/test_llm_ops.py),
    and ``bc.value`` resolves executor-side from the torrent-distributed
    block, once per executor instead of once per task.  Module-level so
    the test can price the pickled closure."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def contam_ppm(texts: pd.Series) -> pd.Series:
        eval_hashes = bc.value[1]

        def one(t: "str | None") -> int:
            if t is None or len(t) < L:
                return 0
            n = len(t) - L + 1
            spans: "list[list[int]]" = []  # merged [s, e] hit spans
            for i in range(n):
                if md5_hash60_py(XSUB_SEED, t[i : i + L]) not in eval_hashes:
                    continue
                s, e = i, i + L - 1
                if spans and s <= spans[-1][1] + 1:
                    spans[-1][1] = e
                else:
                    spans.append([s, e])
            covered = sum(e - s + 1 for s, e in spans)
            return _ceil_ppm(covered, len(t))

        return texts.map(one).astype("int64")

    return contam_ppm


def contamination_gate_stream(
    stream: DataFrame,
    eval_df: "DataFrame | None" = None,
    L: int = 40,
    max_contam_ppm: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_broadcast=None,
) -> DataFrame:
    """Streaming ingest decontamination: drop (or threshold) incoming docs
    that share any length-``L`` substring with the eval set — the
    continuous-crawl twin of :func:`contamination_report`.

    A streaming aggregation re-joined to its own stream is an unsupported
    plan, so the gate is STATELESS map-only: the eval set's distinct
    shingle hashes (benchmarks are KBs–MBs) are collected once and closed
    over by an Arrow-batched pandas UDF that hashes each incoming doc's
    shingles row-locally and counts membership — no join, no state, no
    shuffle; exactly the shape a per-record streaming filter wants.  The
    hash is the shared md5_hash60, so the hit verdict agrees bit-for-bit
    with the batch :func:`contamination_report` detector (asserted in
    tests/test_llm_ops.py).  The ``contam_ppm`` metric is on the SAME
    basis as the batch report's ``contam_ppm`` — merged contaminated span
    chars over doc chars — so a threshold tuned on batch reports ports to
    the gate (the only difference: the gate CEILS the division, so one
    hit in an arbitrarily long doc still scores >= 1 ppm and
    ``max_contam_ppm=0`` never leaks; the batch report floors — gate and
    batch ppm agree within 1).  A doc passes when its ppm is <=
    ``max_contam_ppm``; the diagnostic column is kept on survivors.

    Python-side md5 per char position is the price of statelessness —
    right for a gate on an ingest stream (docs/sec, not TB/sec); the
    full-corpus backfill belongs to the batch operator.

    The eval hash set ships as a ``SparkContext.broadcast`` (one transfer
    per executor, torrent-distributed) rather than a UDF closure capture,
    which would re-serialize the whole set into every task's command
    (ADVICE r7) — at realistic eval-set sizes (MBs of 60-bit hashes) the
    closure path bloats every micro-batch's task setup.

    Broadcast ownership (ADVICE r8): a broadcast built HERE lives for the
    SparkContext's lifetime — fine for the one-long-lived-gate production
    shape, but constructing many gates (per-test, per-job loops) leaks
    executor memory.  For that pattern, build the set once with
    :func:`broadcast_eval_hashes`, pass it as ``eval_broadcast=``, and
    ``.unpersist()`` it yourself when the last gate terminates.
    """
    # exactly one of eval_df / eval_broadcast supplies the eval set: a
    # broadcast built from a DIFFERENT eval set than a simultaneously
    # passed eval_df is undetectable (only L is validated), so passing
    # both is refused loudly instead of silently ignoring eval_df
    # (ADVICE r9)
    if (eval_df is None) == (eval_broadcast is None):
        raise ValueError(
            "contamination_gate_stream: pass exactly one of eval_df (the "
            "gate builds and owns the broadcast) or eval_broadcast (from "
            "broadcast_eval_hashes; the caller owns it) — "
            f"got eval_df={'set' if eval_df is not None else 'None'}, "
            f"eval_broadcast={'set' if eval_broadcast is not None else 'None'}"
        )
    if eval_broadcast is None:
        eval_broadcast = broadcast_eval_hashes(
            stream.sparkSession, eval_df, L, text_col, id_col
        )
    else:
        val = eval_broadcast.value
        if not (isinstance(val, tuple) and len(val) == 2 and isinstance(val[0], int)):
            raise ValueError(
                "contamination_gate_stream: eval_broadcast must wrap the "
                "(L, frozenset) pair from broadcast_eval_hashes — a bare "
                "hash set can't be validated against the gate's shingle "
                "length"
            )
        if val[0] != L:
            raise ValueError(
                f"contamination_gate_stream: eval_broadcast was built at "
                f"L={val[0]} but the gate shingles at L={L} — membership "
                f"probes would silently never hit"
            )
    contam_ppm = _gate_ppm_udf(eval_broadcast, L)

    out = stream.withColumn("contam_ppm", contam_ppm(F.col(text_col)))
    return out.filter(F.col("contam_ppm") <= max_contam_ppm)


def broadcast_eval_hashes(spark, eval_df: DataFrame, L: int = 40, text_col: str = "text", id_col: str = "doc_id"):
    """Build the eval-set shingle-hash broadcast ONCE for reuse across
    gates — the caller owns it (``.unpersist()`` when the last gate built
    from it terminates).  Pass the result as ``eval_broadcast=`` to
    :func:`contamination_gate_stream`.  The broadcast value is
    ``(L, frozenset)`` so a gate shingling at a DIFFERENT length fails
    loudly instead of silently never matching."""
    rows = (
        _shingle_occurrences(eval_df, L, text_col, id_col)
        .select("h")
        .distinct()
        .collect()
    )
    return spark.sparkContext.broadcast((L, frozenset(r["h"] for r in rows)))


def _word_segments(
    df: DataFrame,
    words_per_segment: int,
    text_col: str,
    id_col: str,
    extra_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Shared fixed-width word segmentation (the segment_dedup_scrub
    contract): ``(id, *extra, blk, seg)`` with the null-text guard."""
    d = df.filter(F.col(text_col).isNotNull())
    words = F.split(F.col(text_col), " ")
    w = words_per_segment
    nseg = F.ceil(F.size(words) / F.lit(w)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda b: F.concat_ws(" ", F.slice(words, b * w + 1, w)),
    )
    return d.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.posexplode(segs).alias("blk", "seg"),
    )


def _reassemble(marked: DataFrame, id_col: str, keep: "F.Column",
                drop_alias: str, group_extra: "tuple[str, ...]" = ()) -> DataFrame:
    """Shared ordered reassembly: keep segments where ``keep`` holds,
    count drops, rebuild the doc in block order (the segment_dedup_scrub
    collect_list/array_sort shape — no per-doc window)."""
    return marked.groupBy(id_col, *group_extra).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.when(keep, 0).otherwise(1)).cast("long").alias(drop_alias),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("blk", "seg")))
                ),
                lambda t: t["seg"],
            ),
        ).alias("scrubbed_text"),
    )


def domain_boilerplate_scrub(
    df: DataFrame,
    words_per_segment: int = 8,
    min_docs: int = 2,
    frac_ppm: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Per-DOMAIN boilerplate removal (the RefinedWeb/trafilatura cleanup
    the global keep-first dedup is not): a segment that recurs across at
    least ``min_docs`` distinct documents of one domain AND at least
    ``frac_ppm`` ppm of that domain's documents is that domain's template
    chrome (nav bars, footers, cookie banners) — it is scrubbed from
    EVERY document of the domain, first occurrence included (keep-first
    would enshrine one copy of the banner as content).

    Differs from :func:`segment_dedup_scrub` on both axes: the frequency
    key is (domain, segment) not (segment), and the verdict deletes all
    occurrences instead of keeping one.  Output: ``(doc_id, domain,
    n_segments, n_boiler_dropped, scrubbed_text)``.

    Scale shape: segment frequencies are a map-side-combinable
    ``groupBy(domain, segment)``; the per-domain doc counts are a tiny
    dimension; the boilerplate list (only segments clearing the
    threshold) is small by construction, so the mark-join back onto the
    segment stream broadcasts.  At 100 TB key segments by a 128-bit hash
    (the segment_dedup_scrub note) and the shuffle carries hashes only."""
    d = df.filter(F.col(text_col).isNotNull())
    seg = _word_segments(d, words_per_segment, text_col, id_col, (domain_col,))
    domain_docs = d.groupBy(domain_col).agg(
        F.countDistinct(id_col).alias("__n_domain_docs")
    )
    seg_docs = seg.groupBy(domain_col, "seg").agg(
        F.countDistinct(id_col).alias("__n_seg_docs")
    )
    boiler = (
        seg_docs.join(domain_docs, domain_col)
        .filter(
            (F.col("__n_seg_docs") >= min_docs)
            & (F.col("__n_seg_docs") * 1_000_000 >= F.lit(frac_ppm) * F.col("__n_domain_docs"))
        )
        .select(domain_col, "seg", F.lit(True).alias("__is_boiler"))
    )
    marked = seg.join(F.broadcast(boiler), [domain_col, "seg"], "left")
    return _reassemble(
        marked,
        id_col,
        F.col("__is_boiler").isNull(),
        "n_boiler_dropped",
        (domain_col,),
    )


def intradoc_segment_dedup(
    df: DataFrame,
    words_per_segment: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """WITHIN-document repeated-segment removal: the first occurrence of
    each distinct segment inside a doc survives, later repeats are
    dropped — the scrub companion to the Gopher repetition FLAGS (which
    only score; this rewrites).  Complements :func:`segment_dedup_scrub`
    (cross-corpus) at the finest granularity: a doc that loops its own
    paragraph is cleaned even when no other doc shares it.

    Entirely doc-local: one map-side-combinable ``groupBy(doc, segment)
    .agg(min(blk))`` and a doc-bounded re-join — no corpus-wide key ever
    shuffles, so skew is impossible by construction.  Output: ``(doc_id,
    n_segments, n_repeats_dropped, scrubbed_text)``."""
    seg = _word_segments(df, words_per_segment, text_col, id_col)
    first = seg.groupBy(id_col, "seg").agg(F.min("blk").alias("__first_blk"))
    marked = seg.join(first, [id_col, "seg"]).withColumn(
        "__keep", F.col("blk") == F.col("__first_blk")
    )
    return _reassemble(marked, id_col, F.col("__keep"), "n_repeats_dropped")


def containment_pairs(
    df: DataFrame,
    k: int = 3,
    threshold_ppm: int = 800_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ASYMMETRIC shingle-containment near-dup pairs, EXACT: containment
    of A in B is ``|sh(A) ∩ sh(B)| / |sh(A)|`` over DISTINCT word-k-gram
    shingle sets.  Jaccard misses subset duplication when sizes differ (a
    tweet quoted inside a long article scores near-zero Jaccard but
    containment 1.0 from the tweet's side) — containment is the standard
    aggregator/quote/excerpt detector (Broder 1997 defines both; CDC/
    ExactSubstr cover verbatim spans, this covers shingle-bag subsets).

    Candidate generation is the prefix-filter theorem adapted to the
    containment predicate (the :func:`prefix_jaccard_pairs` SSJoin family,
    NO false negatives): order each doc's shingles rarest-globally-first;
    if ``shared >= t * min(|A|,|B|)`` with A the (size, id)-canonical
    smaller side, then A's first ``|A| - ceil(t*|A|) + 1`` shingles must
    hit B's FULL set — so candidates come from an equi-join of the
    smaller side's PREFIX shingles against full occurrences.  The
    rarest-first ordering is itself the skew guard: a corpus-frequent
    boilerplate shingle lands in a prefix only for docs made almost
    entirely of boilerplate.  (Measured at sf0.1: 153k candidates vs
    1.04M for one-shared-rare-shingle blocking — 6.8x tighter AND exact.)

    Verify is exact on every candidate: set intersection of the two
    full shingle arrays, integer ppm arithmetic (``1e6 * shared div
    |A|``), cross-multiplied threshold — zero floats, bit-identical in
    any engine.  Returns ``(a_id, b_id, n_shared, n_a, n_b, cont_a_ppm,
    cont_b_ppm)`` for unordered pairs (a_id < b_id) where the MAX of the
    two directional containments (= shared/min) clears
    ``threshold_ppm``.

    Two scale moves beyond the skeleton (measured 19s -> 9s at sf0.1,
    and the gap widens with data): shingles are hashed to 60-bit longs
    UP FRONT (:func:`pyfads.text.md5_hash60`, oracle-replayable), so
    every join/window/intersect shuffles 8-byte keys instead of ~25-byte
    strings; and the hashed shingle-set table is ``localCheckpoint``-ed
    because FIVE downstream branches reuse it (gf/pref/fullocc/verify×2)
    — without it Catalyst re-runs the shingling per branch.  Collision
    risk at 60 bits is ~n^2/2^61 — negligible below ~10^8 distinct
    shingles per comparison universe."""
    from pyfads.text import md5_hash60

    thr = int(threshold_ppm)
    base = df.filter(F.col(text_col).isNotNull())
    sets = base.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(shingles(text_col, k)),
            lambda g: md5_hash60(g, "cont"),
        ).alias("sh"),
    ).localCheckpoint()
    ds = sets.select(F.col(id_col), F.explode("sh").alias("g"))
    sz = sets.select(F.col(id_col), F.size("sh").cast("long").alias("sn"))
    gf = ds.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("gdf"))
    w = Window.partitionBy(id_col).orderBy("gdf", "g")
    # prefix length p = sn - ceil(t*sn) + 1;  ceil(thr*sn/1e6) integer-exact
    pref = (
        ds.join(gf, "g")
        .withColumn("rn", F.row_number().over(w))
        .join(sz, id_col)
        .filter(
            F.col("rn")
            <= F.col("sn") - F.expr(f"({thr} * sn + 999999) div 1000000") + 1
        )
        .select(F.col(id_col), "g", "sn")
    )
    p = pref.select(F.col(id_col).alias("p_id"), "g", F.col("sn").alias("pn"))
    fo = ds.join(sz, id_col).select(
        F.col(id_col).alias("f_id"), "g", F.col("sn").alias("fn")
    )
    cand = (
        p.join(fo, "g")
        .filter(
            F.struct(F.col("pn"), F.col("p_id")) < F.struct(F.col("fn"), F.col("f_id"))
        )
        .select(
            F.least("p_id", "f_id").alias("a_id"),
            F.greatest("p_id", "f_id").alias("b_id"),
        )
        .distinct()
    )
    sa = sets.select(F.col(id_col).alias("a_id"), F.col("sh").alias("__sha"))
    sb = sets.select(F.col(id_col).alias("b_id"), F.col("sh").alias("__shb"))
    v = (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("__sha", "__shb")).cast("long").alias("n_shared"),
            F.size("__sha").cast("long").alias("n_a"),
            F.size("__shb").cast("long").alias("n_b"),
        )
    )
    return v.filter(
        F.col("n_shared") * F.lit(1_000_000) >= F.lit(thr) * F.least("n_a", "n_b")
    ).select(
        "a_id",
        "b_id",
        "n_shared",
        "n_a",
        "n_b",
        F.expr("n_shared * 1000000 div n_a").cast("long").alias("cont_a_ppm"),
        F.expr("n_shared * 1000000 div n_b").cast("long").alias("cont_b_ppm"),
    )


def containment_scrub(
    df: DataFrame,
    k: int = 3,
    threshold_ppm: int = 800_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Actionable verdict over :func:`containment_pairs`: DROP the
    contained side of every qualifying pair (the excerpt/quote/aggregated
    copy), keep the container.  The contained side is the smaller shingle
    set — containment_pairs' threshold tests ``shared/min(|A|,|B|)``,
    which IS the smaller side's containment — with the (size, id) tie
    rule: equal-size mutual near-copies drop the larger id (keep-min-id,
    the exact_dedup convention).  Returns ``(doc_id, keep,
    n_containers)`` for every non-null-text doc."""
    pairs = containment_pairs(df, k, threshold_ppm, text_col, id_col)
    dropped_id = (
        F.when(F.col("n_a") < F.col("n_b"), F.col("a_id"))
        .when(F.col("n_a") > F.col("n_b"), F.col("b_id"))
        .otherwise(F.col("b_id"))
    )
    drops = (
        pairs.select(dropped_id.alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_containers"))
    )
    base = df.filter(F.col(text_col).isNotNull()).select(id_col)
    out = base.join(drops, id_col, "left")
    return out.select(
        F.col(id_col),
        F.col("n_containers").isNull().alias("keep"),
        F.coalesce(F.col("n_containers"), F.lit(0)).cast("long").alias("n_containers"),
    )
