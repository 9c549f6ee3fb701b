"""Dataset-assembly query corpus over ``documents`` (operators.dataset)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.dataset import (
    pack_sequences,
    split_assign,
    stratified_sample,
)
from heparchy_spark.operators.text import token_count
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load
from heparchy_spark.queries.text import _TOKCOUNT_SQL

_BUCKET_SQL = (
    "('0x' || substr(sha256(text || 'split'), 1, 12))::BIGINT % 10000"
)


@register(
    "dataset_split_assign",
    f"""
    SELECT doc_id,
           CASE WHEN __b < 8000 THEN 'train'
                WHEN __b < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_BUCKET_SQL} AS __b FROM documents)
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by content-hash "
    "bucket: reproducible, stable under corpus growth, duplicate contents "
    "co-assign (no cross-split leakage).",
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = split_assign(
        docs, "text", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split"
    )
    return out.select("doc_id", "split")


@register(
    "dataset_stratified_sample",
    """
    WITH __t AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY sha256(text), doc_id) AS __rn,
             count(*) OVER (PARTITION BY lang) AS __n
      FROM documents
    )
    SELECT doc_id, lang FROM __t WHERE __rn <= ceil(0.2 * __n)
    """,
    doc="Exact-quota 20% stratified sample per language, chosen by "
    "content-hash order (deterministic, engine-portable).",
)
def dataset_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", "text", "doc_id", 0.2).select(
        "doc_id", "lang"
    )


@register(
    "dataset_pack_bins",
    f"""
    SELECT doc_id, lang,
           CAST(__tc AS BIGINT) AS seq_len,
           CAST(floor(CAST(__cum - __tc AS DOUBLE) / 512.0) AS BIGINT)
             AS bin_id
    FROM (
      SELECT doc_id, lang, __tc,
             sum(__tc) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS __cum
      FROM (SELECT doc_id, lang, {_TOKCOUNT_SQL} AS __tc FROM documents)
    )
    """,
    doc="Sequence packing into 512-token bins per language shard: running "
    "floor((cumsum-len)/budget) in id order — streaming first-fit "
    "approximation, parallel across shards (no global cumsum).",
)
def dataset_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return pack_sequences(
        docs, "lang", "doc_id", token_count("text"), budget=512
    )
