"""Distributed exact prefix aggregation (parallel scan).

``prefix_sum`` computes, for every row, the running total of one or more
value columns over a global numeric order — WITHOUT the classic
single-partition global window (``Window.orderBy`` with no partition
moves 100 TB to one task; instant death at scale).  It is the two-level
scan decomposition (Blelloch 1990, the textbook parallel prefix):

1. bucket the order column coarsely by VALUE RANGE, computed from a
   broadcast single-row (min, max) aggregate — combinable, exact, no
   sort;
2. run the cumulative aggregate *within* each bucket (window partitioned
   by bucket — embarrassingly parallel);
3. compute each bucket's offset as the cumulative total of *prior
   buckets* from the tiny per-bucket-totals table (one window over
   ``n_buckets`` rows — the only serial step, bounded by construction);
4. broadcast the offsets back and add.

The result is exact and deterministic for integral value columns (long
addition is associative); callers who need float prefix sums should
quantize first (``queries/numeric.py`` grid conventions).

Used by the interval-sweep family: concurrency counting (events with
+1/-1 deltas at interval endpoints), distributed ECDFs for the KS drift
statistic, and any "running state over time at corpus scale" question.

The same decomposition drives ``operators/skyline.py`` (prefix MAX);
this module is the SUM/amount form with multi-column support.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def prefix_sum(
    df: DataFrame,
    order_col: str,
    val_cols: list[str],
    n_buckets: int = 64,
    suffix: str = "_cum",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``<val>_cum`` running-total columns over ``order_col`` order.

    ``order_col`` must be numeric with UNIQUE values (aggregate
    duplicate keys first — the running total at a key is otherwise
    ill-defined).  Inclusive semantics: the row's own value is counted.

    With ``partition_cols`` the scan runs independently per group — the
    grouped form of the same two-level decomposition: per-group value
    bounds (one combinable aggregate, broadcast back on the group key),
    in-bucket windows partitioned by (group, bucket), and a per-group
    offset window over ``n_buckets`` rows.  No step is serial in more
    than ``n_buckets`` rows per group, so a skewed group costs its
    share of bucket windows, never a single-task global sort.
    """
    o = F.col(order_col)
    parts = list(partition_cols or [])

    if parts:
        bounds = df.groupBy(*parts).agg(
            F.min(o).alias("__lo"), F.max(o).alias("__hi")
        )
        pre = df.join(F.broadcast(bounds), parts)
    else:
        bounds = df.agg(F.min(o).alias("__lo"), F.max(o).alias("__hi"))
        pre = df.crossJoin(F.broadcast(bounds))
    bucketed = pre.withColumn(
        "__b",
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor(
                    (o - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo")) / F.lit(n_buckets))
                ).cast("int"),
            )
        ),
    )

    w_in = (
        Window.partitionBy(*parts, "__b")
        .orderBy(o)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for v in val_cols:
        bucketed = bucketed.withColumn(f"__in_{v}", F.sum(v).over(w_in))

    # tiny table: one row per (group, bucket); the only serial window in
    # the plan, bounded by n_buckets rows per group
    btot = bucketed.groupBy(*parts, "__b").agg(
        *[F.sum(v).alias(f"__t_{v}") for v in val_cols]
    )
    w_b = (
        (Window.partitionBy(*parts) if parts else Window.partitionBy())
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = btot.select(
        *parts,
        "__b",
        *[F.sum(f"__t_{v}").over(w_b).alias(f"__off_{v}") for v in val_cols],
    )

    out = bucketed.join(F.broadcast(boff), [*parts, "__b"])
    for v in val_cols:
        out = out.withColumn(
            v + suffix,
            F.col(f"__in_{v}") + F.coalesce(F.col(f"__off_{v}"), F.lit(0)),
        )
    return out.drop(
        "__b",
        "__lo",
        "__hi",
        *[f"__in_{v}" for v in val_cols],
        *[f"__t_{v}" for v in val_cols],
        *[f"__off_{v}" for v in val_cols],
    )


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """(t, concurrent) — the number of intervals covering each endpoint
    instant, half-open ``[start, end)`` semantics, evaluated at every
    distinct endpoint (the only places the count changes).

    The classic sweep-line: +1 at each start, -1 at each end, running
    sum over time — with the running sum distributed via ``prefix_sum``
    so no single task ever sees more than ``rows / n_buckets`` events.
    ``start_col`` / ``end_col`` must be timestamps.
    """
    deltas = (
        df.select(F.col(start_col).alias("t"), F.lit(1).alias("d"))
        .unionAll(df.select(F.col(end_col).alias("t"), F.lit(-1).alias("d")))
        .groupBy("t")
        .agg(F.sum("d").alias("d"))
        # NTZ-safe: the session TZ is pinned UTC (queries/tables.load), so
        # the cast is value-preserving for both timestamp flavors.
        .withColumn(
            "__o", F.unix_micros(F.col("t").cast("timestamp"))
        )
    )
    return (
        prefix_sum(deltas, "__o", ["d"], n_buckets=n_buckets)
        .select("t", F.col("d_cum").cast("long").alias("concurrent"))
    )
