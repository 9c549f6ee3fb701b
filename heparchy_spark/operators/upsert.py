"""Lakehouse MERGE primitives: key-level change classification and
snapshot production from (base, updates) pairs.

The MERGE INTO shape every table format (Delta/Iceberg/Hudi) implements
on top of exactly this plan: one full-outer equi-join on the merge key,
per-row action classification, and column coalescing for the new
snapshot.  Expressed declaratively so Catalyst handles distribution —
at 100 TB the join is the only shuffle, and it disappears entirely when
both sides are bucketed on the key (see ``operators/layout.py``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def merge_actions(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every merge key: ``insert`` (update side only),
    ``update`` (both sides, any compare column differs — null-safe),
    ``unchanged`` (both sides, all equal), ``keep`` (base side only —
    the WHEN NOT MATCHED BY SOURCE default).

    Returns base columns as ``b_*``, update columns as ``u_*``, the key
    columns, and ``action``.  ``compare_cols`` defaults to every
    non-key column shared by both sides.

    Scale shape: ONE full-outer shuffle join on the merge key — the
    irreducible cost of MERGE; everything else is per-row projection.
    Comparison uses null-safe equality (``eqNullSafe``) so null→value
    and value→null transitions classify as updates, matching
    Delta/Iceberg semantics.
    """
    if compare_cols is None:
        shared = set(base.columns) & set(updates.columns)
        compare_cols = sorted(shared - set(keys))
    b = base.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"b_{c}") for c in compare_cols],
        F.lit(1).alias("__in_b"),
    )
    u = updates.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"u_{c}") for c in compare_cols],
        F.lit(1).alias("__in_u"),
    )
    changed = None
    for c in compare_cols:
        diff = ~F.col(f"b_{c}").eqNullSafe(F.col(f"u_{c}"))
        changed = diff if changed is None else (changed | diff)
    action = (
        F.when(F.col("__in_b").isNull(), F.lit("insert"))
        .when(F.col("__in_u").isNull(), F.lit("keep"))
        .when(changed if changed is not None else F.lit(False), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        b.join(u, keys, "full_outer")
        .withColumn("action", action)
        .drop("__in_b", "__in_u")
    )


def merge_snapshot(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    delete_missing: bool = False,
) -> DataFrame:
    """The post-MERGE table: update-side columns win wherever the key
    matched (including a genuine value→NULL update — which a naive
    ``coalesce`` would silently undo), base columns survive otherwise;
    ``delete_missing=True`` drops base keys absent from the update side
    (WHEN NOT MATCHED BY SOURCE THEN DELETE).  Output schema = keys +
    compare columns."""
    if compare_cols is None:
        shared = set(base.columns) & set(updates.columns)
        compare_cols = sorted(shared - set(keys))
    acts = merge_actions(base, updates, keys, compare_cols)
    out = acts if not delete_missing else acts.where(F.col("action") != "keep")
    matched = F.col("action") != "keep"  # update row exists for this key
    return out.select(
        *keys,
        *[
            F.when(matched, F.col(f"u_{c}"))
            .otherwise(F.col(f"b_{c}"))
            .alias(c)
            for c in compare_cols
        ],
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse each key's
    attribute stream into validity intervals ``[valid_from, valid_to)``,
    open-ended (``valid_to`` null, ``is_current`` true) for the latest
    run.

    Gaps-and-islands: a null-safe change flag against ``lag``, a running
    sum to number runs, one aggregate per run, and ``lead`` over runs
    for the closing timestamp.  ``tiebreak_col`` pins the order of
    same-timestamp rows (pass the event id for deterministic history).

    Scale shape: every step shares ONE partitioning — the key — so the
    whole history build is a single shuffle followed by partition-local
    windows and a map-side-combinable aggregate.  Key skew (one entity
    with millions of versions) inherits the window-skew medicine: range-
    bucket the timestamp into a composite key, then stitch runs across
    bucket edges.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    chg = F.when(
        ~F.lag(F.col(attr_col)).over(w).eqNullSafe(F.col(attr_col)),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = df.withColumn("__chg", chg).withColumn(
        "__run",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    g = runs.groupBy(key_col, attr_col, "__run").agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wr = Window.partitionBy(key_col).orderBy("__run")
    return (
        g.withColumn("valid_to", F.lead("valid_from").over(wr))
        .select(
            key_col,
            attr_col,
            "valid_from",
            "valid_to",
            "n_events",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
) -> DataFrame:
    """Incremental SCD2 maintenance: apply a batch of NEW observations
    (one row per key, timestamps after each key's open run) to an
    existing type-2 history without recomputing it.

    Semantics per key: same attribute -> the open run absorbs the event
    (n_events + 1); changed attribute -> the open run closes at the new
    timestamp and a fresh current run opens; unseen key -> a new
    current run.  Keys absent from the batch keep their history
    untouched.  Equivalence contract (pytest-pinned): merging a
    one-event-per-key batch equals rebuilding ``scd2_history`` from the
    appended event log.

    Scale shape: closed intervals are never touched — the join hits
    only the OPEN rows (one per key) against the batch, both narrow and
    key-partitioned; history depth costs nothing per merge.  This is
    the warehouse pattern that turns the one-shot history build into a
    streaming-friendly incremental pipeline.
    """
    cur = history.where(F.col("is_current"))
    closed = history.where(~F.col("is_current"))
    u = updates.select(
        F.col(key_col),
        F.col(attr_col).alias("__new_attr"),
        F.col(ts_col).alias("__new_ts"),
        F.lit(1).alias("__in_u"),
    )
    # Persisted: four union branches read the same full-outer join — an
    # unpersisted lineage would re-execute the merge's only shuffle join
    # once per branch.  Narrow frame (one open row per key + the batch);
    # caller owns cache lifetime, same contract as the other staged ops.
    j = cur.join(u, key_col, "full_outer").persist()
    in_u = F.col("__in_u").isNotNull()
    in_hist = F.col("valid_from").isNotNull()
    # eqNullSafe throughout: a NULL attribute is a legitimate run value
    # (scd2_history compares with eqNullSafe too) — null-unsafe ==/!=
    # would silently DROP such keys from every branch.
    same_attr = F.col(attr_col).eqNullSafe(F.col("__new_attr"))
    untouched = j.where(~in_u).select(*history.columns)
    absorbed = j.where(in_u & in_hist & same_attr).select(
        F.col(key_col),
        F.col(attr_col),
        "valid_from",
        F.lit(None).cast("timestamp").alias("valid_to"),
        (F.col("n_events") + 1).alias("n_events"),
        F.lit(True).alias("is_current"),
    )
    closed_now = j.where(in_u & in_hist & ~same_attr).select(
        F.col(key_col),
        F.col(attr_col),
        "valid_from",
        F.col("__new_ts").alias("valid_to"),
        "n_events",
        F.lit(False).alias("is_current"),
    )
    opened = j.where(in_u & (~in_hist | ~same_attr)).select(
        F.col(key_col),
        F.col("__new_attr").alias(attr_col),
        F.col("__new_ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(1).cast("long").alias("n_events"),
        F.lit(True).alias("is_current"),
    )
    return (
        closed.select(*history.columns)
        .unionByName(untouched)
        .unionByName(absorbed.select(*history.columns))
        .unionByName(closed_now.select(*history.columns))
        .unionByName(opened.select(*history.columns))
    )
