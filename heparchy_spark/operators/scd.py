"""Slowly-changing-dimension (Type 2) history build from a change log.

``scd2_build`` turns an append-only event/change stream into the classic
warehouse dimension-history table: one row per (key, attribute-state)
RUN, with ``valid_from`` / ``valid_to`` half-open validity intervals,
``version`` numbers, and an ``is_current`` flag.  Consecutive rows with
an unchanged attribute tuple collapse into one validity row (run-length
encoding over time).

Plan shape: one shuffle on the key, then windows *partitioned by the
key* — change detection (lag), interval close (lead), and version
numbering all ride the same sort, so Catalyst plans a single
Sort+Window chain per key partition.  Nothing global, nothing
single-partition; keys parallelize freely, which is the 100 TB shape
(dimension history is per-entity state, exactly what hash partitioning
distributes).

Determinism: ties on the timestamp are broken by ``tiebreak_col``
(a unique id), so the run-length encoding is a pure function of the
input set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_build(
    df: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, *attrs, valid_from, valid_to, version, is_current) — the
    Type-2 dimension history of ``attr_cols`` per ``key_col``.

    ``valid_to`` is NULL on each key's current row (half-open
    ``[valid_from, valid_to)`` otherwise).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(a).over(w)
        # NULL-safe inequality: a change to/from NULL is a change
        changed = changed | ~F.col(a).eqNullSafe(prev)
    marked = df.withColumn(
        "__chg",
        F.when(F.lag(ts_col).over(w).isNull(), F.lit(True)).otherwise(
            changed
        ),
    ).where(F.col("__chg"))

    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        marked.select(
            key_col,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
            F.row_number().over(w2).alias("version"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
