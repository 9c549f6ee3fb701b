"""Ordered-funnel analytics: strict-sequence conversion over an event
stream (view -> click -> purchase and friends).

Stage k is reached by a user when they have a stage-k event STRICTLY
AFTER the timestamp at which they first reached stage k-1 — the
standard product-analytics definition (repeat stage-k events don't
help, and out-of-order events don't count).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def funnel_reach(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_gap: str | None = None,
) -> list[DataFrame]:
    """Per-stage reach frames: element k is (user, __t) where ``__t`` is
    the first time that user completed steps[0..k] in strict order.
    ``max_gap`` (an INTERVAL string, e.g. ``'24 hours'``) additionally
    requires each stage within that window of the previous stage's
    first-reach time — the time-bounded conversion-funnel variant.

    Windowing is GREEDY-ANCHORED: each stage's window opens at the
    user's FIRST qualifying completion of the previous stage, never a
    later one.  A user with view@T, view@T+10h, click@T+25h does NOT
    convert under a 24h gap here (the window anchored at T), although a
    re-anchoring funnel definition would credit the T+10h -> T+25h
    sequence.  Greedy anchoring is one shuffle-light pass; re-anchoring
    needs per-user sequential scans (a stateful/session operator —
    see ``streaming_funnel`` for the per-user state-machine shape).

    Stage k+1 filters the event scan to ONE event type before its only
    shuffle (the per-user min), then joins the previous stage's compact
    (user, t) frame — each stage costs one combinable aggregate plus a
    user-keyed join of two narrow frames, and survivor sets only shrink
    down the funnel.  Nothing is quadratic; at 100 TB the event scan's
    type filter is a pushed-down predicate.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    out: list[DataFrame] = []
    cur: DataFrame | None = None
    for step in steps:
        ev = df.where(F.col(type_col) == step).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if cur is None:
            cur = ev.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            within = F.col("__ts") > F.col("__t")
            if max_gap is not None:
                within = within & (
                    F.col("__ts") <= F.col("__t") + F.expr(f"INTERVAL {max_gap}")
                )
            cur = (
                ev.join(cur, "__u")
                .where(within)
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        out.append(cur)
    return out


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_gap: str | None = None,
) -> DataFrame:
    """(stage_idx, stage, n_users) — distinct users reaching each funnel
    stage in strict order (optionally within ``max_gap`` per stage)."""
    stages = funnel_reach(df, user_col, ts_col, type_col, steps, max_gap)
    parts = [
        s.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("stage_idx"),
            F.lit(step).alias("stage"),
            "n_users",
        )
        for i, (step, s) in enumerate(zip(steps, stages))
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res
