"""URL canonicalization query corpus (operators.web).

No driver table carries URLs, so the corpus synthesizes deterministic
crawl-ish URLs from ``doc_id`` — identically in Spark and DuckDB — and
oracle-checks the normalization chain on them (same pattern as the
multimodal payload synthesis).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.psl import PSL_2LABEL, PSL_3LABEL
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load

# Deterministic synthetic URL: mixed-case scheme/host, default port,
# rotating utm params and fragments — every normalization rule gets hit.
_URL_SQL = (
    "'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM:443/p/'"
    " || CAST(doc_id AS VARCHAR)"
    " || CASE doc_id % 3 WHEN 0 THEN '?utm_source=x&q=1'"
    "                    WHEN 1 THEN '?q=' || CAST(doc_id % 13 AS VARCHAR)"
    "                                || '&utm_campaign=y'"
    "                    ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END"
)

_IN_2LABEL = ", ".join(f"'{s}'" for s in PSL_2LABEL)
_IN_3LABEL = ", ".join(f"'{s}'" for s in PSL_3LABEL)


def _domain_ctes(host_source: str) -> str:
    """DuckDB CTE chain computing the PSL registrable domain for a relation
    ``{host_source}`` exposing ``__host`` (mirrors operators.web.url_domain
    over the same operators.psl snapshot)."""
    return f"""
    __dp AS (
      SELECT *, string_split(__host, '.') AS __parts,
             len(string_split(__host, '.')) AS __n
      FROM {host_source}
    ),
    __dl AS (
      SELECT *,
             array_to_string(list_slice(__parts, greatest(__n - 1, 1), __n),
                             '.') AS __last2,
             array_to_string(list_slice(__parts, greatest(__n - 2, 1), __n),
                             '.') AS __last3
      FROM __dp
    ),
    __dk AS (
      SELECT *,
             least(__n,
                   CASE WHEN __n >= 3 AND __last3 IN ({_IN_3LABEL}) THEN 3
                        WHEN __n >= 2 AND __last2 IN ({_IN_2LABEL}) THEN 2
                        ELSE 1 END + 1) AS __keep
      FROM __dl
    ),
    __dom AS (
      SELECT *,
             array_to_string(
               list_slice(__parts, __n - __keep + 1, __n), '.') AS domain
      FROM __dk
    )
    """


def _synth_url() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.lit("HTTPS://WWW.Example"),
        (did % 7).cast("string"),
        F.lit(".COM:443/p/"),
        did.cast("string"),
        F.when(did % 3 == 0, F.lit("?utm_source=x&q=1"))
        .when(
            did % 3 == 1,
            F.concat(
                F.lit("?q="), (did % 13).cast("string"), F.lit("&utm_campaign=y")
            ),
        )
        .otherwise(F.lit("")),
        F.when(did % 2 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )


@register(
    "web_url_normalize",
    f"""
    WITH __u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
    __p AS (
      SELECT doc_id, url,
             lower(regexp_extract(url,
               '^([A-Za-z][A-Za-z0-9+.-]*)://.*$', 1)) AS __scheme,
             lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$', 1)) AS __hostport,
             regexp_replace(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS __rest
      FROM __u
    ),
    __h AS (
      SELECT *, regexp_replace(__hostport, ':[0-9]+$', '') AS __host
      FROM __p
    ),
    {_domain_ctes("__h")}
    SELECT doc_id,
           __scheme || '://' ||
           (CASE WHEN __scheme = 'https'
                 THEN regexp_replace(__hostport, ':443$', '')
                 WHEN __scheme = 'http'
                 THEN regexp_replace(__hostport, ':80$', '')
                 ELSE __hostport END) ||
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(__rest, '#.*$', ''),
             '([?&])(utm_[^&#]*&)+', '\\1', 'g'),
             '[?&]utm_[^&#]*$', ''),
             '\\?&+', '?', 'g'),
             '[?&]+$', '') AS url_norm,
           domain
    FROM __dom
    """,
    doc="Crawl URL canonicalization: scheme/host case-fold, default-port "
    "strip, fragment drop, utm_* tracking-param removal, plus the "
    "PSL-snapshot registrable domain — the dedup key for web corpora; "
    "pure per-row projection (regexps + InSet probe), no shuffle.",
)
def web_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.web import normalize_url, url_domain

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url")
    )
    return docs.select(
        "doc_id",
        normalize_url("url").alias("url_norm"),
        url_domain("url").alias("domain"),
    )


# PSL-case host matrix: ICANN 2-label (co.uk, co.jp, com.au), private
# 2-label (github.io), 3-label (s3.amazonaws.com), plain TLD with www,
# single-label host, a host that IS a public suffix, and a port strip.
_HOST_SQL = (
    "CASE doc_id % 8"
    " WHEN 0 THEN 'www.site' || CAST(doc_id AS VARCHAR) || '.co.uk'"
    " WHEN 1 THEN 'user' || CAST(doc_id AS VARCHAR) || '.github.io'"
    " WHEN 2 THEN 'bucket' || CAST(doc_id AS VARCHAR) || '.s3.amazonaws.com'"
    " WHEN 3 THEN 'www.site' || CAST(doc_id AS VARCHAR) || '.com'"
    " WHEN 4 THEN 'a.b.site' || CAST(doc_id AS VARCHAR) || '.co.jp'"
    " WHEN 5 THEN 'localhost'"
    " WHEN 6 THEN 'site' || CAST(doc_id AS VARCHAR) || '.com.au:8080'"
    " ELSE 'co.uk' END"
)


def _synth_host() -> F.Column:
    did = F.col("doc_id")
    sid = did.cast("string")
    return (
        F.when(did % 8 == 0, F.concat(F.lit("www.site"), sid, F.lit(".co.uk")))
        .when(did % 8 == 1, F.concat(F.lit("user"), sid, F.lit(".github.io")))
        .when(
            did % 8 == 2,
            F.concat(F.lit("bucket"), sid, F.lit(".s3.amazonaws.com")),
        )
        .when(did % 8 == 3, F.concat(F.lit("www.site"), sid, F.lit(".com")))
        .when(did % 8 == 4, F.concat(F.lit("a.b.site"), sid, F.lit(".co.jp")))
        .when(did % 8 == 5, F.lit("localhost"))
        .when(did % 8 == 6, F.concat(F.lit("site"), sid, F.lit(".com.au:8080")))
        .otherwise(F.lit("co.uk"))
    )


@register(
    "web_url_domain",
    f"""
    WITH __u AS (
      SELECT doc_id, 'https://' || {_HOST_SQL} || '/x' AS url FROM documents
    ),
    __h AS (
      SELECT doc_id, url,
             regexp_replace(
               lower(regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$', 1)),
               ':[0-9]+$', '') AS __host
      FROM __u
    ),
    {_domain_ctes("__h")}
    SELECT doc_id, domain FROM __dom
    """,
    doc="Registrable-domain extraction against the PSL snapshot: ICANN and "
    "private-section 2-/3-label suffixes, bare-suffix hosts, single-label "
    "hosts, port stripping — oracle mirrors the same snapshot in SQL.",
)
def web_url_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.web import url_domain

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("https://"), _synth_host(), F.lit("/x")).alias("url"),
    )
    return docs.select("doc_id", url_domain("url").alias("domain"))


# ---------------------------------------------------------------------------
# web_host_quality_rollup — the CommonCrawl-style curation readout
# ---------------------------------------------------------------------------

# Rollup host matrix: 23 registered domains x 3 subdomains, suffix class
# rotating over PSL cases, so the PSL collapse (www./m./blog. -> one
# registrable domain) actually aggregates multiple hosts per group.
_ROLLUP_HOST_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'm.' ELSE 'blog.' END"
    " || 'site' || CAST(doc_id % 23 AS VARCHAR)"
    " || CASE (doc_id % 23) % 4 WHEN 0 THEN '.co.uk'"
    "                           WHEN 1 THEN '.github.io'"
    "                           WHEN 2 THEN '.com'"
    "                           ELSE '.com.au' END"
)


def _rollup_host() -> F.Column:
    did = F.col("doc_id")
    g = did % 23
    sub = (
        F.when(did % 3 == 0, F.lit("www."))
        .when(did % 3 == 1, F.lit("m."))
        .otherwise(F.lit("blog."))
    )
    sfx = (
        F.when(g % 4 == 0, F.lit(".co.uk"))
        .when(g % 4 == 1, F.lit(".github.io"))
        .when(g % 4 == 2, F.lit(".com"))
        .otherwise(F.lit(".com.au"))
    )
    return F.concat(sub, F.lit("site"), g.cast("string"), sfx)


def _rollup_oracle() -> str:
    from heparchy_spark.operators.text import PII_PATTERNS

    pii_any = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))"
        for pat in PII_PATTERNS.values()
    )
    tok = (
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    quality = (
        "CASE WHEN n_chars >= 100"
        " AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
        "       >= 0.6 * length(text)"
        f" AND {tok} BETWEEN 20 AND 100000 THEN 1 ELSE 0 END"
    )
    return f"""
    WITH __h AS (
      SELECT doc_id, text, n_chars, {_ROLLUP_HOST_SQL} AS __host
      FROM documents
    ),
    {_domain_ctes("__h")}
    SELECT domain,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT __host) AS BIGINT) AS n_hosts,
           ROUND(1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(*), 6)
             AS dup_rate,
           ROUND(CAST(SUM({quality}) AS DOUBLE) / COUNT(*), 6)
             AS quality_rate,
           ROUND(CAST(SUM(CASE WHEN {pii_any} > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS pii_rate,
           {_sql_davg_chars()} AS avg_chars
    FROM __dom
    GROUP BY domain
    """


def _sql_davg_chars() -> str:
    from heparchy_spark.queries.numeric import sql_davg

    return sql_davg("n_chars")


@register(
    "web_host_quality_rollup",
    _rollup_oracle(),
    doc="Host-level curation rollup — the per-registered-domain readout a "
    "CommonCrawl-scale pipeline keeps (docs, host fan-in, exact-dup "
    "rate, C4-gate pass rate, PII incidence, mean length) to decide "
    "which domains to keep, cap, or drop.  Registrable domain via the "
    "PSL snapshot (operators.web.url_domain: InSet probe, no join); "
    "signals are the SAME expressions as text_quality_filter / "
    "text_pii_scan / dedup_exact so the rollup agrees with the per-doc "
    "gates.  ONE grouped aggregate with exact multi-DISTINCT (Expand); "
    "the documented 100 TB swap is approx_count_distinct / an HLL "
    "sketch per domain once exact host/text cardinalities stop "
    "mattering.  Ratios are int/int divisions of exact counts "
    "(engine-identical), mean length rides the decimal davg grid.  "
    "Full SQL oracle.",
)
def web_host_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.text import (
        PII_PATTERNS,
        pii_counts,
        token_count,
    )
    from heparchy_spark.operators.web import url_domain
    from heparchy_spark.queries.numeric import davg

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars", _rollup_host().alias("__host")
    )
    with_dom = docs.select(
        "text",
        "n_chars",
        "__host",
        url_domain(
            F.concat(F.lit("https://"), F.col("__host"))
        ).alias("domain"),
    )
    alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).cast(
        "double"
    )
    quality = (
        (F.col("n_chars") >= 100)
        & (alpha >= 0.6 * F.length("text"))
        & token_count("text").between(20, 100000)
    ).cast("int")
    counts = pii_counts("text")
    pii_any = (
        sum(counts[k] for k in PII_PATTERNS) > 0
    ).cast("int")
    return with_dom.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__host").cast("long").alias("n_hosts"),
        # distinct CONTENT HASHES, not texts: the Expand/shuffle carries
        # 32-byte digests instead of whole documents (the oracle's
        # COUNT(DISTINCT text) is value-identical, sha256 collision-free)
        F.round(
            1.0
            - F.countDistinct(F.sha2("text", 256)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
        F.round(F.sum(quality).cast("double") / F.count(F.lit(1)), 6).alias(
            "quality_rate"
        ),
        F.round(F.sum(pii_any).cast("double") / F.count(F.lit(1)), 6).alias(
            "pii_rate"
        ),
        davg("n_chars").alias("avg_chars"),
    )


@register(
    "web_domain_cap_sample",
    f"""
    WITH __h AS (
      SELECT doc_id, text, n_chars, {_ROLLUP_HOST_SQL} AS __host
      FROM documents
    ),
    {_domain_ctes("__h")},
    __q AS (
      SELECT doc_id, domain,
             CASE WHEN n_chars >= 100
               AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                     >= 0.6 * length(text)
               AND (CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
                     BETWEEN 20 AND 100000
               THEN 1 ELSE 0 END AS q,
             sha256(text || 'cap') AS __hsh
      FROM __dom
    )
    SELECT doc_id, domain, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT doc_id, domain,
             row_number() OVER (
               PARTITION BY domain
               ORDER BY q DESC, __hsh, doc_id) AS rnk
      FROM __q
    )
    WHERE rnk <= 20
    """,
    doc="Per-domain document cap — the anti-over-representation step of "
    "web curation (one boilerplate-heavy domain must not dominate the "
    "training mix): keep at most 20 docs per PSL registered domain, "
    "quality-gate passers first, then content-hash order (a "
    "deterministic uniform draw, same A-ES keying as the samplers), "
    "doc_id as the total tiebreak.  ONE partitioned rank window over "
    "the domain key — parallel across domains at any corpus size; a "
    "skewed mega-domain pays only its own partition (salting note in "
    "SCALE.md applies).  Full SQL oracle.",
)
def web_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from heparchy_spark.operators.text import token_count
    from heparchy_spark.operators.web import url_domain

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars", _rollup_host().alias("__host")
    )
    with_dom = docs.withColumn(
        "domain",
        url_domain(F.concat(F.lit("https://"), F.col("__host"))),
    )
    alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).cast(
        "double"
    )
    q = (
        (F.col("n_chars") >= 100)
        & (alpha >= 0.6 * F.length("text"))
        & token_count("text").between(20, 100000)
    ).cast("int")
    hsh = F.sha2(F.concat(F.col("text"), F.lit("cap")), 256)
    w = Window.partitionBy("domain").orderBy(
        F.col("__q").desc(), "__hsh", "doc_id"
    )
    return (
        with_dom.withColumn("__q", q)
        .withColumn("__hsh", hsh)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 20)
        .select("doc_id", "domain", "rnk")
    )


# ---------------------------------------------------------------------------
# web_url_dedup_canonical — URL-level crawl dedup
# ---------------------------------------------------------------------------

# Variant matrix: (host mod 7) x (path mod 50) defines the canonical
# page; utm param / fragment variants differ ONLY in what normalization
# strips, so every (host, path) group collapses to one canonical URL.
_DEDUP_URL_SQL = (
    "'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.COM:443/p/'"
    " || CAST(doc_id % 50 AS VARCHAR)"
    " || CASE doc_id % 3 WHEN 0 THEN '?utm_source=x'"
    "                    WHEN 1 THEN '?utm_campaign=y'"
    "                    ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END"
)


def _dedup_url() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.lit("HTTPS://WWW.Site"),
        (did % 7).cast("string"),
        F.lit(".COM:443/p/"),
        (did % 50).cast("string"),
        F.when(did % 3 == 0, F.lit("?utm_source=x"))
        .when(did % 3 == 1, F.lit("?utm_campaign=y"))
        .otherwise(F.lit("")),
        F.when(did % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


@register(
    "web_url_dedup_canonical",
    f"""
    WITH __u AS (SELECT doc_id, {_DEDUP_URL_SQL} AS url FROM documents),
    __p AS (
      SELECT doc_id, url,
             lower(regexp_extract(url,
               '^([A-Za-z][A-Za-z0-9+.-]*)://.*$', 1)) AS __scheme,
             lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$', 1)) AS __hostport,
             regexp_replace(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS __rest
      FROM __u
    ),
    __n AS (
      SELECT doc_id, url,
             __scheme || '://' ||
             (CASE WHEN __scheme = 'https'
                   THEN regexp_replace(__hostport, ':443$', '')
                   WHEN __scheme = 'http'
                   THEN regexp_replace(__hostport, ':80$', '')
                   ELSE __hostport END) ||
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(__rest, '#.*$', ''),
               '([?&])(utm_[^&#]*&)+', '\\1', 'g'),
               '[?&]utm_[^&#]*$', ''),
               '\\?&+', '?', 'g'),
               '[?&]+$', '') AS url_norm
      FROM __p
    )
    SELECT url_norm,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           COUNT(*) AS n_crawled,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants
    FROM __n
    GROUP BY url_norm
    """,
    doc="URL-level crawl dedup — the cheapest dedup tier of a web "
    "pipeline, upstream of any content hashing: canonicalize "
    "(case-fold, default-port strip, fragment drop, utm_* removal — "
    "operators.web.normalize_url) and keep the FIRST crawl per "
    "canonical URL (min doc_id), reporting how many raw crawls and "
    "distinct raw spellings collapsed onto each page.  Pure projection "
    "+ one grouped aggregate on the canonical key; at 100 TB the key "
    "is uniform (hash of a URL) so the shuffle is skew-free, and "
    "min/count are combinable (map-side partials).  Full SQL oracle.",
)
def web_url_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.web import normalize_url

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _dedup_url().alias("url")
    )
    return (
        docs.withColumn("url_norm", normalize_url("url"))
        .groupBy("url_norm")
        .agg(
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_crawled"),
            F.countDistinct("url").cast("long").alias("n_raw_variants"),
        )
    )
