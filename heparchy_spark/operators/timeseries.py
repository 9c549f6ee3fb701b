"""Time-series regularization: resample, gap-fill, and LOCF forward-fill.

The event store's analytics twins (tumbling/sliding windows, as-of joins)
aggregate what EXISTS; dashboards and feature pipelines also need the
buckets that don't — a sensor that went quiet must show as a zero or a
carried-forward value, not silently vanish from the axis.  This module
adds the TimescaleDB ``time_bucket_gapfill``/``locf`` semantics as plain
DataFrame algebra:

* ``resample``: truncate-to-bucket + aggregate (one shuffle on
  (group, bucket) — the tumbling-window shape);
* ``gap_fill``: per group, generate the COMPLETE bucket axis between
  that group's first and last observation (``sequence`` + ``explode`` —
  fan-out is |buckets|, data-independent) and left-join the aggregates
  back;
* ``locf``: forward-fill nulls with ``last(..., ignorenulls)`` over a
  per-group ordered window — one window pass, no self-join.

Scale: the axis generation is per-group arithmetic (no shuffle beyond
the aggregate's); the join back is on (group, bucket) — same key, so
with the aggregate's partitioning reused it stays co-located; ``locf``
is the only sort, per group.  Guard: a group spanning ``max_buckets``
buckets (default 10M) fails fast rather than exploding a runaway axis —
the classic gap-fill footgun when one stray 1970 timestamp widens the
axis by decades.
"""

from __future__ import annotations

import typing as ty

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = ["resample", "gap_fill", "locf", "interpolate_linear"]


def _step_seconds(step: str) -> Column:
    # the interval's length in seconds, as a column constant (folded by
    # Catalyst); avoids engine-specific interval->long cast rules
    return F.unix_timestamp(
        F.expr(f"timestamp'1970-01-01 00:00:00' + INTERVAL {step}")
    )


def _bucket(ts_col: str, step: str) -> Column:
    # window() would also bucket, but emits a struct; epoch arithmetic
    # keeps the axis a plain sortable column the sequence join can hit
    s = _step_seconds(step)
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / s) * s
    )


def resample(
    df: DataFrame,
    ts_col: str,
    step: str,
    group_cols: ty.Sequence[str],
    aggs: ty.Sequence[Column],
) -> DataFrame:
    """Aggregate into fixed ``step`` buckets per group: the tumbling
    window as a plain groupBy (one shuffle on (group, bucket))."""
    return (
        df.withColumn("__bucket", _bucket(ts_col, step))
        .groupBy(*group_cols, "__bucket")
        .agg(*aggs)
        .withColumnRenamed("__bucket", "bucket")
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    step: str,
    group_cols: ty.Sequence[str],
    aggs: ty.Sequence[Column],
    max_buckets: int = 10_000_000,
) -> DataFrame:
    """``resample`` plus the missing buckets: every group's axis is
    complete from its first to its last observation; absent buckets
    carry NULL aggregate values (compose with ``locf`` or
    ``F.coalesce(c, lit(0))`` for carry/zero semantics)."""
    gcols = list(group_cols)
    sampled = resample(df, ts_col, step, gcols, aggs)
    span = sampled.groupBy(*gcols).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    n_buckets = (
        F.unix_timestamp("__hi") - F.unix_timestamp("__lo")
    ) / _step_seconds(step) + 1
    # fail fast on runaway axes (one stray epoch-1970 row would otherwise
    # explode decades of buckets)
    guard = F.assert_true(
        n_buckets <= max_buckets,
        f"gap_fill: a group spans more than max_buckets={max_buckets} "
        "buckets; check for stray timestamps or raise the limit",
    )
    # the guard rides INSIDE the sequence expression (a dropped helper
    # column would be pruned away before it ever evaluated)
    axis = span.withColumn(
        "bucket",
        F.explode(
            F.when(
                guard.isNull(),  # assert_true: NULL on pass, throws on fail
                F.sequence(
                    F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}")
                ),
            )
        ),
    ).select(*gcols, "bucket")
    return axis.join(sampled, [*gcols, "bucket"], "left")


def locf(
    df: DataFrame,
    value_cols: ty.Sequence[str],
    order_col: str,
    group_cols: ty.Sequence[str],
) -> DataFrame:
    """Last-observation-carried-forward: fill NULLs in ``value_cols``
    with the latest preceding non-null value per group (leading NULLs
    stay NULL — there is nothing to carry).  One ordered window pass."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def interpolate_linear(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_cols: ty.Sequence[str],
) -> DataFrame:
    """Linear interpolation of NULL ``value_col`` rows between their
    nearest non-null neighbors per group (Timescale's ``interpolate``):
    v = v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev).

    Two ordered window passes (backward-looking last + forward-looking
    first, both ``ignorenulls``) carry each neighbor's value AND
    timestamp; rows with only one neighbor (leading/trailing holes)
    stay NULL — interpolation needs both ends, and inventing an
    extrapolation silently would be a correctness trap.  No self-joins:
    cost is two sorts per group, same shape as ``locf``.
    """
    gcols = list(group_cols)
    t = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("double")
    back = (
        Window.partitionBy(*gcols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*gcols)
        .orderBy(ts_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    # neighbor value/time pairs must come from the SAME row: carry a
    # struct so a null value cannot pair with a different row's time
    obs = F.when(v.isNotNull(), F.struct(v.alias("v"), t.alias("t")))
    prev = F.last(obs, ignorenulls=True).over(back)
    nxt = F.first(obs, ignorenulls=True).over(fwd)
    frac = (t - prev["t"]) / (nxt["t"] - prev["t"])
    filled = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev.isNotNull() & nxt.isNotNull(),
            prev["v"] + (nxt["v"] - prev["v"]) * frac,
        )
    )
    return df.withColumn(value_col, filled)
