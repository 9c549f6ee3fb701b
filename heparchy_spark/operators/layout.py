"""Physical-layout operators: bucketing for co-located joins, salting for
skewed keys (SURVEY.md §2.5 scale notes; BASELINE north-star requirements).

These are the two knobs Catalyst cannot infer on its own:

- **Bucketing** pre-shuffles a table once at write time; two tables
  bucketed by the same key into the same bucket count join with ZERO
  exchanges — the repeated-join amortization play for 100 TB fact tables.
- **Salting** splits a pathologically hot key across ``factor`` synthetic
  sub-keys. AQE's skew-join handles moderate skew at runtime; explicit
  salting is for the degenerate case (one key >> one executor's memory)
  and for aggregations, which AQE skew handling does not cover.
"""

from __future__ import annotations

import typing as ty

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "write_bucketed",
    "bucketed_join_ready",
    "salted_groupby_count",
    "salted_join",
]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: ty.Sequence[str],
    num_buckets: int = 32,
    sort_cols: ty.Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins/aggregations between tables bucketed on the same keys with the
    same bucket count skip their exchanges entirely (verify with
    ``plans.shuffle_count``). Parquet + metastore bucketing spec.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join_ready(spark, left_table: str, right_table: str, on: str):
    """Read two co-bucketed tables and join on the bucket key — the plan
    must show zero shuffle exchanges (asserted in tests)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on)


def _salt(df: DataFrame, factor: int, seed: int = 0x5A17) -> Column:
    """Deterministic salt in [0, factor) derived from the full row CONTENT
    (seeded xxhash64 over every column).  Content hashing — never
    ``rand()`` and never ``monotonically_increasing_id()``, which depends
    on partition layout — means a retried/recomputed task re-salts every
    row identically regardless of how AQE re-split the input, so salted
    aggregates cannot double-count under lineage recompute.  Rows of one
    hot key spread across salts because their non-key columns differ
    (fully identical duplicate rows share a salt; they are combinable
    anyway)."""
    return F.pmod(
        F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns]),
        F.lit(factor),
    )


def salted_groupby_count(
    df: DataFrame, key: str, factor: int = 16
) -> DataFrame:
    """Two-phase count for skewed grouping keys: partial count on
    (key, salt) spreads the hot key over ``factor`` reducers, then a final
    (cheap — ``factor`` rows per key) aggregation merges.

    Spark's hash-aggregate partial combine usually covers this; the salted
    form guards high-cardinality-payload aggs (collect_list/percentile)
    where map-side combine cannot shrink the hot key's data.
    """
    partial = (
        df.withColumn("__salt", _salt(df, factor))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(key).agg(F.sum("__c").alias("n"))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi join: the skewed side gets a salt in [0, factor);
    the other side is replicated ``factor`` times (explode) so every
    (key, salt) pair finds its match. Use when one key's rows exceed an
    executor (AQE skew-join splits partitions, but a single giant KEY
    still lands in one task without salting).

    The replicated side multiplies ``factor``x — keep it the smaller input.
    """
    salted_left = skewed.withColumn("__salt", _salt(skewed, factor))
    replicated = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(factor)])),
    )
    out = salted_left.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
