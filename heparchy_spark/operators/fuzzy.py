"""Fuzzy record-linkage primitives: blocked edit-distance candidate
pairs over a canonicalized value dictionary.

The standard entity-resolution shape: canonicalize (distinct values +
occurrence weights), block (cheap equi-key bounds the candidate set),
compare (banded Levenshtein inside the block only).  All-pairs
comparison is never materialized — the same tractability argument as
LSH banding and SemDeDup clustering, with the block key in the role of
the bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def blocked_fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    block: Column,
    max_dist: int = 4,
    min_dist: int = 1,
) -> DataFrame:
    """Candidate near-match pairs among the DISTINCT values of
    ``text_col`` sharing a block key, at edit distance in
    ``[min_dist, max_dist]``.

    ``block`` is a Column expression over the canonicalized ``value``
    column (e.g. ``F.split(F.col("value"), " ")[0]`` for first-token
    blocking) — it is evaluated on the dictionary, not the raw rows.

    Returns (value_a, value_b, edit_dist, n_a, n_b) with
    ``value_a < value_b``; ``n_*`` are the occurrence counts of each
    value in ``df``, so downstream canonicalization can merge the rarer
    spelling into the dominant one without re-scanning the input.

    Scale shape: the dictionary aggregate is the only pass over the
    data (map-side combinable, |distinct values| output rows — for
    name-like columns that is orders of magnitude below the row count).
    The pair join is an equi-join on the block key; Spark's banded
    ``levenshtein(l, r, threshold)`` early-exits at ``max_dist + 1``
    cost per comparison (O(len·k), not O(len²)) and returns -1 above
    the threshold, so the band filter is one predicate.  A skewed block
    (one giant key) inherits the usual medicine: refine the block key
    (add a length bucket or second token) or salt + re-merge; AQE
    skew-join splits oversized partitions at runtime.
    """
    vals = (
        df.groupBy(F.col(text_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("value", block.alias("__blk"), "n")
    )
    a = vals.select(
        F.col("value").alias("value_a"),
        F.col("__blk"),
        F.col("n").alias("n_a"),
    )
    b = vals.select(
        F.col("value").alias("value_b"),
        F.col("__blk"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(b, "__blk")
        .where(F.col("value_a") < F.col("value_b"))
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("value_a"), F.col("value_b"), max_dist),
        )
        .where(F.col("edit_dist").between(min_dist, max_dist))
        .select("value_a", "value_b", "edit_dist", "n_a", "n_b")
    )
