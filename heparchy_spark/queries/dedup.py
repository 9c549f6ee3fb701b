"""Dedup query corpus over the ``documents`` table (operators.dedup)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_df,
    simhash_near_dup_pairs,
)
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load

# DuckDB expression mirroring operators.dedup.normalize_text
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)
# DuckDB expression mirroring operators.dedup.shingles(text, 3)
_SHINGLES_SQL = f"""
    list_distinct(
      list_transform(
        generate_series(1, greatest(len(string_split({_NORM_SQL}, ' ')) - 2, 0)),
        i -> string_split({_NORM_SQL}, ' ')[i] || ' ' ||
             string_split({_NORM_SQL}, ' ')[i+1] || ' ' ||
             string_split({_NORM_SQL}, ' ')[i+2]))
"""


@register(
    "dedup_exact",
    """
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS rep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup: sha256 content hash, min doc_id representative. "
    "Uniform hash keys -> skew-free shuffle at any scale.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "dedup_exact_normalized",
    f"""
    SELECT sha256({_NORM_SQL}) AS content_hash,
           MIN(doc_id) AS rep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup on normalized text (lowercase, punct/whitespace folding).",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(
        load(spark, sf_dir, "documents"), "text", "doc_id", normalize=True
    )


@register(
    "dedup_ngram_jaccard_pairs",
    f"""
    WITH toks0 AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      FROM toks0
    ),
    toks AS (SELECT doc_id, unnest(s) AS tok FROM sh),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.id_a, c.id_b,
           CAST(c.n_shared AS DOUBLE)
             / (len(sa.s) + len(sb.s) - c.n_shared) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE CAST(c.n_shared AS DOUBLE)
            / (len(sa.s) + len(sb.s) - c.n_shared) >= 0.6
    """,
    doc="Exact 3-gram Jaccard near-dup pairs (threshold 0.6), full recall: "
    "candidates from an equi-join on shared shingles (any pair with "
    "Jaccard > 0 shares one), verified by exact set sizes — the oracle "
    "mirrors the same near-linear shape instead of brute-forcing pairs.",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        n=3,
        threshold=0.6,
        prefix_tokens=None,  # exact PPJoin prefix bound -> oracle-comparable
    )


@register(
    "dedup_minhash_lsh_pairs",
    None,  # xxhash64-based signatures are Spark-specific; rows-only check
    doc="MinHash(64) + LSH(16 bands) candidate pairs verified by exact "
    "Jaccard >= 0.5.",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_near_dup_pairs(
        load(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        num_perm=64,
        bands=16,
        jaccard_threshold=0.5,
    )


@register(
    "dedup_simhash_fingerprints",
    None,  # xxhash64-based; rows-only
    doc="64-bit SimHash fingerprint per document (column algebra, no UDF).",
)
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_df(load(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "dedup_simhash_pairs",
    None,  # xxhash64-based; rows-only
    doc="SimHash near-dup pairs at Hamming distance <= 3 via pigeonhole "
    "block equi-join.",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_dup_pairs(
        load(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=3
    )


@register(
    "dedup_incremental_new_docs",
    """
    WITH __old AS (
      SELECT sha256(text) AS content_hash FROM documents WHERE doc_id % 2 = 0
    ), __new AS (
      SELECT doc_id, sha256(text) AS content_hash
      FROM documents WHERE doc_id % 2 = 1
    ), __batch AS (
      SELECT content_hash, min(doc_id) AS doc_id
      FROM __new GROUP BY content_hash
    )
    SELECT doc_id, content_hash
    FROM __batch b
    WHERE NOT EXISTS (
      SELECT 1 FROM __old o WHERE o.content_hash = b.content_hash
    )
    """,
    doc="Incremental ingest dedup: odd doc_ids are the incoming snapshot, "
    "even doc_ids the already-ingested corpus; batch-first-wins then "
    "left-anti join on the content hash.",
)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.dedup import incremental_exact_dedup

    docs = load(spark, sf_dir, "documents")
    return incremental_exact_dedup(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        "text",
        "doc_id",
    )
