"""Stats-safe checkpoint barrier for iterative self-join chains.

``DataFrame.localCheckpoint`` truncates the logical plan to a
``LogicalRDD`` but KEEPS the checkpointed plan's estimated statistics
(``originStats``).  For a chain of self-joins — e.g. pointer doubling,
where step k+1 joins step k with itself — ``SizeInBytesOnlyStatsPlanVisitor``
multiplies the two child estimates, so the carried ``sizeInBytes``
SQUARES every step.  After ~14 steps the BigInteger holds millions of
digits and every subsequent planning pass burns minutes inside
``BigInteger.multiply`` (observed: 23 s per 232-row join at sf0.1,
growing ~2.7x per step, with the actual Spark jobs at ~20 ms).

``checkpoint_stats_barrier`` cuts that feedback loop: it local-checkpoints
the frame, then rebuilds a DataFrame directly from the checkpointed
``InternalRow`` RDD so the new ``LogicalRDD`` carries NO origin stats.
Join planning then falls back to ``spark.sql.defaultSizeInBytes`` (no
auto-broadcast), which is the right call inside these loops anyway — AQE
re-plans the tiny post-shuffle sides to broadcast at runtime, and the
estimate can never compound.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_warned_connect = False


def checkpoint_stats_barrier(df: DataFrame, eager: bool = True) -> DataFrame:
    """``localCheckpoint`` + drop the origin statistics (see module doc).

    The rebuild goes through ``SparkSession.internalCreateDataFrame`` on
    the already-checkpointed RDD — pure JVM-side plumbing, no Python
    round-trip, no extra job beyond the checkpoint itself.

    Under Spark Connect the private JVM handles (``_jdf`` /
    ``_jsparkSession``) do not exist; there the function degrades to a
    plain ``localCheckpoint`` (lineage still truncated) and warns once
    that origin statistics are retained — long self-join chains may
    then re-trigger the stats-squaring slowdown this barrier exists to
    prevent.
    """
    ck = df.localCheckpoint(eager=eager)
    if not hasattr(ck, "_jdf"):  # Spark Connect — no JVM handles
        global _warned_connect
        if not _warned_connect:
            _warned_connect = True
            warnings.warn(
                "checkpoint_stats_barrier: running under Spark Connect;"
                " falling back to plain localCheckpoint, which KEEPS"
                " origin statistics — chained self-joins may hit the"
                " stats-squaring planner slowdown (see"
                " heparchy_spark/plans/barrier.py module doc).",
                RuntimeWarning,
                stacklevel=2,
            )
        return ck
    spark = ck.sparkSession
    jdf = ck._jdf  # noqa: SLF001 — JVM handle, classic (non-Connect) mode
    jspark = spark._jsparkSession  # noqa: SLF001
    rebuilt = jspark.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(rebuilt, spark)
