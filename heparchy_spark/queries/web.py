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
