"""URL / domain-level corpus curation (r9 verdict #7 — the RefinedWeb /
CCNet front-of-pipeline family the text operators were missing):

- :func:`with_synth_urls` — the fixture's documents table has no URL
  column, so entries derive one DETERMINISTICALLY from (doc_id, source):
  five surface-form cases (mixed-case scheme/host, explicit default
  ports, www prefixes, trailing slashes, fragments, utm/fbclid tracking
  params) over a shared article id, so canonicalization is non-trivial
  and canonical duplicates exist by construction.  The derivation is a
  CONTRACT with the DuckDB twins (:func:`synth_url_sql`).
- :func:`url_canonicalize` — RefinedWeb-style canonical form: lowercase
  scheme+host, strip the scheme's default port, strip a leading ``www.``,
  drop the fragment, drop tracking params (utm_*, fbclid, gclid,
  msclkid, ref), strip trailing slashes.  Pure column expressions —
  per-row, codegen, no UDF, no shuffle.
- :func:`url_dedup` — exact keep-one (min doc_id) per canonical URL: one
  map-side-combinable groupBy + an equi-join back, the exact_dedup shape.
- :func:`domain_policy_filter` — per-domain curation policy: drop
  blocklisted domains, then cap each surviving domain at ``cap`` docs
  (id-ordered — deterministic; swap in a quality score upstream).  One
  window over the domain — the only shuffle.

Scale notes: everything keys on the canonical-URL/domain string; at
100 TB key the dedup on a 128-bit hash of the canonical instead (the
segment-dedup precedent) and the domain window stays safe because the
cap truncates inside each partition after one sort.  Registered-domain
(eTLD+1) extraction needs a public-suffix list — out of scope; the
domain here is the full www-stripped, PORT-FREE host (bad.com:8443 hits
the same blocklist entry and quota bucket as bad.com; the canonical URL
keeps a non-default port, since that names a different resource).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "with_synth_urls",
    "url_canonicalize",
    "url_dedup",
    "domain_policy_filter",
    "synth_url_sql",
    "url_canonical_sql",
]

TRACKING_PARAM_RE = "^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)="
ARTICLE_MOD = 37  # article-id modulus: collisions at every fixture SF


def with_synth_urls(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic synthetic ``url`` column (see module doc).
    Five cases by ``doc_id % 5`` over article id ``(doc_id // 5) % 37``;
    cases 0/1 share a canonical form, 2/4 share another, 3 differs by
    scheme — so dup groups exist without any randomness."""
    did = F.col(id_col)
    case = did % 5
    # integer div, not floor(double/5): bit-free of float questions and
    # identical to the twin's `// 5`
    aid_s = F.expr(f"cast(({id_col} div 5) % {ARTICLE_MOD} as string)")
    src = F.col("source")
    url = (
        F.when(
            case == 0,
            F.concat(
                F.lit("https://www."), src, F.lit(".example.com/articles/"), aid_s
            ),
        )
        .when(
            case == 1,
            F.concat(
                F.lit("HTTPS://"), src, F.lit(".Example.COM:443/articles/"),
                aid_s, F.lit("/"),
            ),
        )
        .when(
            case == 2,
            F.concat(
                F.lit("https://www."), src, F.lit(".example.com/articles/"),
                aid_s, F.lit("?utm_source=feed&utm_medium=rss&id="), aid_s,
            ),
        )
        .when(
            case == 3,
            F.concat(
                F.lit("http://"), src, F.lit(".example.com:80/articles/"),
                aid_s, F.lit("#section-2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), src, F.lit(".example.com/articles/"), aid_s,
                F.lit("?id="), aid_s, F.lit("&fbclid=IwAR"), did.cast("string"),
            )
        )
    )
    return df.withColumn("url", url)


def url_canonicalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url`` and ``domain`` (www-stripped lowercase host).
    Every step is a deterministic string expression the DuckDB twin
    replays verbatim (:func:`url_canonical_sql`)."""
    u1 = F.split_part(F.col(url_col), F.lit("#"), F.lit(1))  # strip fragment
    scheme = F.lower(F.split_part(u1, F.lit("://"), F.lit(1)))
    hostpath = F.split_part(u1, F.lit("://"), F.lit(2))
    hostport = F.split_part(hostpath, F.lit("/"), F.lit(1))
    pathq = F.substr(hostpath, F.length(hostport) + F.lit(1))
    host = F.lower(hostport)
    # strip only the SCHEME-DEFAULT port from the canonical host (an
    # explicit non-default port names a different resource and stays)
    host = F.when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(F.regexp_replace(host, ":80$", ""))
    chost = F.regexp_replace(host, r"^www\.", "")
    # the DOMAIN (policy key) is port-free: bad.com:8443 must hit the
    # same blocklist entry and quota bucket as bad.com (code-review r10)
    domain = F.regexp_replace(chost, ":[0-9]+$", "")
    path = F.regexp_replace(F.split_part(pathq, F.lit("?"), F.lit(1)), "/+$", "")
    q = F.when(
        pathq.contains("?"), F.split_part(pathq, F.lit("?"), F.lit(2))
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(q, "&"), lambda p: ~p.rlike(TRACKING_PARAM_RE)
    )
    q2 = F.array_join(F.filter(kept, lambda p: p != ""), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        chost,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    return df.withColumn("domain", domain).withColumn("canonical_url", canonical)


def url_dedup(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact keep-one per canonical URL: the keeper is the min id (the
    exact_dedup contract).  Returns every row as ``(id_col, canonical_url,
    n_copies, is_keeper)``.  groupBy min/count is map-side combinable — a
    billion-copy canonical partial-aggregates instead of hot-keying."""
    g = df.groupBy("canonical_url").agg(
        F.min(id_col).alias("__keeper"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )
    return (
        df.select(id_col, "canonical_url")
        .join(g, "canonical_url")
        .select(
            id_col,
            "canonical_url",
            "n_copies",
            (F.col(id_col) == F.col("__keeper")).alias("is_keeper"),
        )
    )


def domain_policy_filter(
    df: DataFrame,
    blocklist: "list[str]",
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain curation policy (RefinedWeb's domain-level controls):
    rows from blocklisted domains drop outright; each surviving domain
    keeps its first ``cap`` rows by id (swap a quality ordering in
    upstream).  Returns survivors ``(id_col, domain, domain_rank)``.
    The window over the domain is the only shuffle; the rank filter
    truncates within each partition after one sort."""
    w = Window.partitionBy("domain").orderBy(id_col)
    return (
        df.filter(~F.col("domain").isin(list(blocklist)))
        .withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("domain_rank") <= cap)
        .select(id_col, "domain", "domain_rank")
    )


def url_gate_stream(
    stream: DataFrame,
    corpus_canonicals: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming URL ingest gate: drop every incoming doc whose CANONICAL
    url already exists in the standing corpus — the URL-level twin of the
    lexical/semantic ingest gates (stream-static LEFT ANTI join, stateless,
    no watermark; Spark re-plans the static side per micro-batch).
    ``stream`` must already carry ``canonical_url``
    (:func:`url_canonicalize` is stateless, so apply it to the streaming
    frame directly); ``corpus_canonicals`` is a static ``(canonical_url)``
    frame — at scale, a parquet table maintained by appending admitted
    survivors' canonicals per tick, exactly the refresh-store posture.
    Survivors keep ``(id_col, canonical_url)``.  Within-batch canonical
    duplicates are not gated against each other (the corpus is the
    authority — run :func:`url_dedup` over survivors for that)."""
    cp = corpus_canonicals.select("canonical_url").distinct()
    return stream.select(id_col, "canonical_url").join(
        cp, "canonical_url", "left_anti"
    ).select(id_col, "canonical_url")


def synth_url_sql(id_expr: str = "doc_id") -> str:
    """DuckDB twin of :func:`with_synth_urls` — emits the ``url`` select
    expression over (doc_id, source)."""
    aid = f"CAST(({id_expr} // 5) % {ARTICLE_MOD} AS VARCHAR)"
    return f"""CASE {id_expr} % 5
  WHEN 0 THEN 'https://www.' || source || '.example.com/articles/' || {aid}
  WHEN 1 THEN 'HTTPS://' || source || '.Example.COM:443/articles/' || {aid} || '/'
  WHEN 2 THEN 'https://www.' || source || '.example.com/articles/' || {aid}
              || '?utm_source=feed&utm_medium=rss&id=' || {aid}
  WHEN 3 THEN 'http://' || source || '.example.com:80/articles/' || {aid} || '#section-2'
  ELSE 'https://' || source || '.example.com/articles/' || {aid}
       || '?id=' || {aid} || '&fbclid=IwAR' || CAST({id_expr} AS VARCHAR)
END"""


def url_canonical_sql(url_expr: str = "url") -> "tuple[str, str]":
    """DuckDB twin of :func:`url_canonicalize`: returns ``(domain_sql,
    canonical_sql)`` select expressions replaying every step — fragment
    strip, lowercase scheme/host, default-port strip, www strip, tracking
    param filter, trailing-slash strip — over ``url_expr``."""
    u1 = f"split_part({url_expr}, '#', 1)"
    scheme = f"lower(split_part({u1}, '://', 1))"
    hostpath = f"split_part({u1}, '://', 2)"
    hostport = f"split_part({hostpath}, '/', 1)"
    pathq = f"substring({hostpath}, length({hostport}) + 1)"
    host = (
        f"CASE WHEN {scheme} = 'https'"
        f" THEN regexp_replace(lower({hostport}), ':443$', '')"
        f" ELSE regexp_replace(lower({hostport}), ':80$', '') END"
    )
    chost = f"regexp_replace({host}, '^www\\.', '')"
    domain = f"regexp_replace({chost}, ':[0-9]+$', '')"
    path = f"regexp_replace(split_part({pathq}, '?', 1), '/+$', '')"
    q = (
        f"CASE WHEN {pathq} LIKE '%?%'"
        f" THEN split_part({pathq}, '?', 2) ELSE '' END"
    )
    q2 = (
        f"array_to_string(list_filter(string_split({q}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')), '&')"
    )
    canonical = (
        f"{scheme} || '://' || {chost} || {path} ||"
        f" (CASE WHEN {q2} <> '' THEN '?' || {q2} ELSE '' END)"
    )
    return domain, canonical
