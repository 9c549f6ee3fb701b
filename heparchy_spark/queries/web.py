"""URL canonicalization query corpus (operators.web).

No driver table carries URLs, so the corpus synthesizes deterministic
crawl-ish URLs from ``doc_id`` — identically in Spark and DuckDB — and
oracle-checks the normalization chain on them (same pattern as the
multimodal payload synthesis).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

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
    )
    SELECT doc_id,
           __scheme || '://' ||
           (CASE WHEN __scheme = 'https'
                 THEN regexp_replace(__hostport, ':443$', '')
                 WHEN __scheme = 'http'
                 THEN regexp_replace(__hostport, ':80$', '')
                 ELSE __hostport END) ||
           regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(__rest, '#.*$', ''),
             '([?&])(utm_[^&#]*&)+', '\\1', 'g'),
             '[?&]utm_[^&#]*$', ''),
             '[?&]+$', '') AS url_norm,
           regexp_replace(regexp_replace(__hostport, ':[0-9]+$', ''),
                          '^www\\.', '') AS domain
    FROM __p
    """,
    doc="Crawl URL canonicalization: scheme/host case-fold, default-port "
    "strip, fragment drop, utm_* tracking-param removal, plus a "
    "registrable-domain approximation — the dedup key for web corpora; "
    "pure per-row regexp projection, no shuffle.",
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
