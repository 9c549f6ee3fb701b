"""Interval-sweep corpus queries (distributed prefix sum).

Spark side: the two-level parallel-scan plan (operators/sweep.py) — no
global single-partition window anywhere.  Oracles: DuckDB's global
``SUM() OVER (ORDER BY t)``, which is exactly the formulation that does
NOT scale and which the operator exists to replace — parity therefore
compares the distributed decomposition against the textbook serial
sweep.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.sweep import interval_concurrency
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load


@register(
    "events_peak_concurrent_users",
    """
    WITH iv AS (
      SELECT user_id,
             MIN(ts) AS s,
             MAX(ts) + INTERVAL 1 SECOND AS e
      FROM events GROUP BY user_id
    ),
    ev AS (
      SELECT s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d FROM iv
    ),
    agg AS (SELECT t, SUM(d) AS d FROM ev GROUP BY t),
    run AS (
      SELECT t, CAST(SUM(d) OVER (ORDER BY t) AS BIGINT) AS c FROM agg
    )
    SELECT CAST(date_trunc('day', t) AS DATE) AS day,
           CAST(MAX(c) AS BIGINT) AS peak_users
    FROM run
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Peak number of simultaneously-active users per day, where a "
    "user is active from their first event until one second after "
    "their last (half-open sweep).  Spark runs the distributed "
    "two-level prefix sum (operators/sweep.py) — per-bucket windows in "
    "parallel plus a broadcast of |buckets| offsets — while the oracle "
    "uses the global serial SUM() OVER (ORDER BY t) the operator "
    "replaces, so parity compares the scalable plan against the "
    "textbook sweep line.",
    expects_bnlj=True,
    expects_broadcast="per-bucket offset frame (|buckets| rows) + 1-row bounds",
    expects_global_window="prefix_sum's 64-row bucket-offset scan",
)
def events_peak_concurrent_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    iv = ev.groupBy("user_id").agg(
        F.min("ts").alias("s"),
        (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("e"),
    )
    conc = interval_concurrency(iv, "s", "e")
    return (
        conc.groupBy(
            F.to_date(F.date_trunc("day", F.col("t"))).alias("day")
        )
        .agg(F.max("concurrent").alias("peak_users"))
        .orderBy("day")
    )
