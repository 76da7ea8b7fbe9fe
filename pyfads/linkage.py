"""Fuzzy record linkage / entity resolution over edit distance.

Record linkage deduplicates *records* whose keys never match exactly —
titles with typos, OCR noise, truncated suffixes — the metadata-level
complement of the content-level near-dup family (MinHash Jaccard over
full texts, :mod:`pyfads.dedup`).  The classic pipeline (Fellegi-Sunter
blocking + comparison) rendered Spark-first:

1. **Key extraction** — a short pseudo-title per record (the leading
   ``n_words`` tokens; with real metadata, pass the title column).
2. **Blocking** — candidate pairs only from records sharing a cheap
   block key.  Two passes (the key's FIRST token, its LAST token) give
   the pigeonhole recall contract: any pair whose edits leave either
   boundary token intact is caught; only pairs edited at BOTH ends are
   missed (the same bounded-loss shape as Hamming banding,
   :func:`pyfads.multimodal._banded_hamming_pairs`).  Hot blocks ("the
   ..." titles) are salt-capped (:func:`pyfads.dedup._salt_cap`) so no
   task ever exceeds ``max_block``^2 pair work at 100 TB.
3. **Comparison** — exact Levenshtein on the full key, JVM-side
   (``F.levenshtein`` with the threshold arg: early-exits the DP once
   the bound is exceeded, O(d*len) not O(len^2)).
4. **Resolution** — verified pairs -> connected components
   (:func:`pyfads.dedup.connected_components`) -> one canonical
   ``entity_id`` (min member id) per cluster.

Reference parity: the reference engine has no linkage operator; this
family is part of the training-data-curation surface (metadata dedup
before content dedup).  Scale shape: shuffle keys are block tokens and
pair ids only; the Levenshtein verify touches candidate pairs, never the
corpus cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyfads.dedup import _salt_cap, connected_components
from pyfads.text import tokens

__all__ = ["record_keys", "fuzzy_pairs", "resolve_entities", "golden_records"]


def record_keys(
    df: DataFrame,
    n_words: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    sort_tokens: bool = False,
) -> DataFrame:
    """Per-record pseudo-title: the leading ``n_words`` tokens re-joined,
    plus the two boundary tokens used as blocking keys.  Null-text rows
    are excluded (no key, nothing to link).  Pure per-row projection —
    zero shuffles.

    ``sort_tokens=True`` is the TOKEN-SORT variant (fuzzywuzzy's
    token_sort_ratio class): the key is the lexicographically sorted
    token slice, so word-reordered duplicates ("smith, john" vs "john
    smith") collapse to edit distance 0, and the blocking tokens become
    the slice's min/max token — reorder-invariant by construction."""
    toks = tokens(text_col)
    sl = F.slice(toks, 1, int(n_words))
    if sort_tokens:
        sl = F.array_sort(sl)
        first, last = F.element_at(sl, 1), F.element_at(sl, F.size(sl))
    else:
        last_idx = F.least(F.size(toks), F.lit(int(n_words))).cast("int")
        first, last = F.element_at(toks, 1), F.element_at(toks, last_idx)
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.concat_ws(" ", sl).alias("rkey"),
        first.alias("__first"),
        last.alias("__last"),
    )


def fuzzy_pairs(
    df: DataFrame,
    max_dist: int = 2,
    n_words: int = 6,
    max_block: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    sort_tokens: bool = False,
) -> DataFrame:
    """Fuzzy-duplicate candidate pairs ``(a_id, b_id, edit_dist)`` with
    ``edit_dist = levenshtein(key_a, key_b) <= max_dist`` and
    ``a_id < b_id``.

    Blocking recall contract (documented loss, replayed exactly by the
    DuckDB twin): a pair is a candidate iff the records share a
    (salt-capped) first-token or last-token block — pairs whose edits
    touch BOTH boundary tokens, or that a hot block's salt split
    separates, are missed.  Verification is exact on every candidate.

    Scale: two narrow block passes (token, id) -> self-join on the block
    key -> distinct pairs -> two hash joins to fetch keys -> per-row
    Levenshtein.  ``F.levenshtein(..., threshold)`` short-circuits the DP
    at ``max_dist`` (returns -1 past the bound), so the verify is
    O(max_dist * keylen) per pair.  ``sort_tokens=True`` switches to
    reorder-invariant token-sort keys (see :func:`record_keys`)."""
    keys = record_keys(df, n_words, text_col, id_col, sort_tokens)
    blocks = keys.select(
        F.col(id_col),
        F.posexplode(F.array("__first", "__last")).alias("block_idx", "block_key"),
    )
    blocks = _salt_cap(blocks, id_col, "block_key", max_block, "block_idx")
    a = blocks.select(F.col(id_col).alias("a_id"), "block_idx", "block_key")
    b = blocks.select(F.col(id_col).alias("b_id"), "block_idx", "block_key")
    cand = (
        a.join(b, ["block_idx", "block_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    ka = keys.select(F.col(id_col).alias("a_id"), F.col("rkey").alias("__ka"))
    kb = keys.select(F.col(id_col).alias("b_id"), F.col("rkey").alias("__kb"))
    d = F.levenshtein(F.col("__ka"), F.col("__kb"), int(max_dist))
    return (
        cand.join(ka, "a_id")
        .join(kb, "b_id")
        .withColumn("edit_dist", d.cast("long"))
        .filter(F.col("edit_dist") >= 0)
        .select("a_id", "b_id", "edit_dist")
    )


def resolve_entities(
    df: DataFrame,
    max_dist: int = 2,
    n_words: int = 6,
    max_block: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Entity resolution: fuzzy pairs -> connected components -> every
    record labeled with its cluster's canonical ``entity_id`` (the min
    member id).  Records with no fuzzy match (or null text excluded from
    keying) resolve to themselves via the CC singleton rejoin.  Returns
    ``(id_col, entity_id)`` for every keyed record."""
    pairs = fuzzy_pairs(df, max_dist, n_words, max_block, text_col, id_col)
    nodes = df.filter(F.col(text_col).isNotNull()).select(id_col)
    cc = connected_components(pairs, nodes=nodes, id_col=id_col, max_iter=max_iter)
    return cc.select(F.col(id_col), F.col("group_id").alias("entity_id"))


def golden_records(
    df: DataFrame,
    max_dist: int = 2,
    n_words: int = 6,
    max_block: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Survivorship: one GOLDEN record per resolved entity — the classic
    record-linkage completion (after clustering, pick the most complete
    member as the canonical row).  Survivorship rule here: longest text
    wins, ties break on the smaller id — deterministic and
    engine-portable.  Returns ``(entity_id, n_records, rep_id,
    rep_len)``.

    Scale shape: entity resolution's CC output joined back to the corpus
    (equi-join on id), then ONE window partitioned by entity_id — entity
    groups are near-dup clusters, naturally small; a pathological
    mega-entity costs O(group) sort work, not O(group^2)."""
    from pyspark.sql import Window

    ents = resolve_entities(df, max_dist, n_words, max_block, text_col, id_col)
    j = ents.join(
        df.select(
            F.col(id_col), F.length(text_col).cast("long").alias("__len")
        ),
        id_col,
    )
    w = Window.partitionBy("entity_id").orderBy(F.desc("__len"), id_col)
    wn = Window.partitionBy("entity_id")
    ranked = j.withColumn("__rn", F.row_number().over(w)).withColumn(
        "n_records", F.count(F.lit(1)).over(wn).cast("long")
    )
    return ranked.filter(F.col("__rn") == 1).select(
        "entity_id",
        "n_records",
        F.col(id_col).alias("rep_id"),
        F.col("__len").alias("rep_len"),
    )
