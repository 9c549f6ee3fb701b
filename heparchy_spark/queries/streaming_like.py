"""Event-time window queries over the ``events`` table.

These are the batch-mode equivalents of the Structured Streaming operators in
``heparchy_spark.streaming`` (same window semantics, same column names) — the
streaming versions are tested in ``tests/test_streaming.py``; these batch
twins are oracle-checkable by DuckDB.  The reference's only streaming surface
is the ingest generator ``event_iter`` (/root/reference/heparchy/write/
hdf.py:493-516); event-time analytics is [ext] per SURVEY.md §2.10.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from heparchy_spark.queries import register
from heparchy_spark.queries.numeric import davg, dsum, sql_davg, sql_dsum
from heparchy_spark.queries.tables import load


@register(
    "events_tumbling_hourly",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 6)} AS total_value,
           {sql_davg('value')} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour event-time window x event_type. Streaming twin: "
    "groupBy(window(ts, '1 hour'), event_type) with watermark.",
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 6).alias("total_value"),
            davg("value").alias("avg_value"),
        )
    )


@register(
    "events_sliding_6h_daily_users",
    """
    SELECT CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    """,
    doc="Daily distinct-user rollup (streaming twin uses sliding windows + "
    "approx_count_distinct; batch oracle keeps it exact).",
)
def events_sliding_6h_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "events_sessionize_30m",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                       OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Sessionization with a 30-minute inactivity gap via gaps-and-islands "
    "windows. Streaming twin: session_window(ts, '30 minutes').",
)
def events_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Interval-typed difference: valid for TIMESTAMP and TIMESTAMP_NTZ alike
    # (Spark 4 forbids casting TIMESTAMP_NTZ straight to a numeric epoch).
    prev = F.lag(F.col("ts")).over(w)
    gap = F.col("ts") - prev
    new_session = F.when(
        prev.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = ev.withColumn(
        "session_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "events_asof_latest_before_order",
    """
    WITH anchors AS (
      SELECT o_orderkey, o_custkey % 150 AS user_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + INTERVAL (o_orderkey % 28) DAY
               + INTERVAL (o_custkey % 24) HOUR AS anchor_ts
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT a.o_orderkey,
           (SELECT MAX(e.ts) FROM events e
            WHERE e.user_id = a.user_id AND e.ts <= a.anchor_ts)
             AS last_event_ts
    FROM anchors a
    """,
    doc="As-of join: latest event at-or-before each order's date for the "
    "order's (mapped) user. Spark side uses the engine's asof_join operator "
    "(union+window, no range explosion).",
)
def events_asof_latest_before_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.asof import asof_join

    anchor = (
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(days=(F.col("o_orderkey") % 28).cast("int"))
        + F.make_interval(hours=(F.col("o_custkey") % 24).cast("int"))
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 150).alias("user_id"),
            anchor.alias("ts"),
        )
    )
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    joined = asof_join(
        left=o,
        right=ev,
        on="ts",
        by="user_id",
        right_cols={"ts": "last_event_ts"},
    )
    return joined.select("o_orderkey", "last_event_ts")


@register(
    "events_stream_join_view_purchase",
    """
    SELECT v.user_id, v.ts AS view_ts, p.ts AS purchase_ts,
           ROUND(p.value, 6) AS purchase_value
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 2 HOUR
    """,
    doc="Batch twin of the stream-stream join (streaming.purchase_view_join):"
    " views within 2h before a same-user purchase. Streaming version bounds "
    "state with watermarks + the time-range condition.",
)
def events_stream_join_view_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from heparchy_spark.streaming import purchase_view_join

    ev = load(spark, sf_dir, "events")
    out = purchase_view_join(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        watermark=None,
        horizon="2 hours",
    )
    return out.select(
        "user_id",
        "view_ts",
        "purchase_ts",
        F.round("purchase_value", 6).alias("purchase_value"),
    )


@register(
    "events_scd2_type_history",
    """
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events
    ),
    c AS (
      SELECT *, CASE WHEN lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)
             IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      FROM e
    ),
    r AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM c
    ),
    g AS (
      SELECT user_id, event_type, run, MIN(ts) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM r GROUP BY 1, 2, 3
    ),
    v AS (
      SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run)
               AS valid_to,
             n_events
      FROM g
    )
    SELECT user_id, event_type, valid_from, valid_to, n_events,
           valid_to IS NULL AS is_current
    FROM v
    """,
    doc="SCD type-2 history of each user's event-type attribute "
    "(operators/upsert.py scd2_history): gaps-and-islands run "
    "numbering, one interval row per run with [valid_from, valid_to) "
    "and an open current row. Every step shares the user-id "
    "partitioning — one shuffle end to end.",
)
def events_scd2_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.upsert import scd2_history

    ev = load(spark, sf_dir, "events")
    return scd2_history(
        ev, "user_id", "event_type", "ts", tiebreak_col="event_id"
    )


@register(
    "events_funnel_conversion",
    """
    WITH s1 AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
        AND CAST(e.ts AS TIMESTAMP) > s1.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
        AND CAST(e.ts AS TIMESTAMP) > s2.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 0 AS stage_idx, 'view' AS stage,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL SELECT 1, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL SELECT 2, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    """,
    doc="Strict-order conversion funnel view -> click -> purchase "
    "(operators/funnel.py): stage k+1 needs an event strictly after the "
    "user's first stage-k completion. Each stage = one pushed-down type "
    "filter + one combinable per-user min + one narrow user-keyed join; "
    "survivor sets shrink monotonically down the funnel.",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.funnel import funnel_counts

    ev = load(spark, sf_dir, "events")
    return funnel_counts(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


@register(
    "events_funnel_conversion_24h",
    """
    WITH s1 AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
        AND CAST(e.ts AS TIMESTAMP) > s1.t
        AND CAST(e.ts AS TIMESTAMP) <= s1.t + INTERVAL 24 HOURS
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
        AND CAST(e.ts AS TIMESTAMP) > s2.t
        AND CAST(e.ts AS TIMESTAMP) <= s2.t + INTERVAL 24 HOURS
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 0 AS stage_idx, 'view' AS stage,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL SELECT 1, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL SELECT 2, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    """,
    doc="Time-bounded funnel: each stage must land within 24 hours of "
    "the previous stage's first completion — the product-analytics "
    "windowed-conversion variant; same per-stage filtered-aggregate "
    "shape as events_funnel_conversion.",
)
def events_funnel_conversion_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.funnel import funnel_counts

    ev = load(spark, sf_dir, "events")
    return funnel_counts(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"],
        max_gap="24 hours",
    )


@register(
    "events_asof_next_after_order",
    """
    WITH anchors AS (
      SELECT o_orderkey, o_custkey % 150 AS user_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + INTERVAL (o_orderkey % 28) DAY
               + INTERVAL (o_custkey % 24) HOUR AS anchor_ts
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT a.o_orderkey,
           (SELECT MIN(e.ts) FROM events e
            WHERE e.user_id = a.user_id AND e.ts >= a.anchor_ts)
             AS next_event_ts
    FROM anchors a
    """,
    doc="FORWARD as-of join: earliest event at-or-after each order's "
    "anchor for the order's (mapped) user — the direction='forward' "
    "path of operators/asof.py (same union+window plan, no range "
    "explosion), complementing the backward corpus entry.",
)
def events_asof_next_after_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.asof import asof_join

    anchor = (
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(days=(F.col("o_orderkey") % 28).cast("int"))
        + F.make_interval(hours=(F.col("o_custkey") % 24).cast("int"))
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 150).alias("user_id"),
            anchor.alias("ts"),
        )
    )
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    joined = asof_join(
        left=o,
        right=ev,
        on="ts",
        by="user_id",
        right_cols={"ts": "next_event_ts"},
        direction="forward",
    )
    return joined.select("o_orderkey", "next_event_ts")


@register(
    "events_attribution_last_touch",
    """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, ts FROM events WHERE event_type = 'view'
    ),
    m AS (
      SELECT p.event_id, p.user_id, p.ts, MAX(v.ts) AS view_ts
      FROM p LEFT JOIN v
        ON v.user_id = p.user_id AND v.ts <= p.ts
      GROUP BY 1, 2, 3
    )
    SELECT event_id, user_id,
           view_ts IS NOT NULL
             AND date_diff('second', view_ts, ts) <= 86400 AS attributed,
           CASE WHEN view_ts IS NOT NULL
                     AND date_diff('second', view_ts, ts) <= 86400
                THEN CAST(floor(date_diff('second', view_ts, ts) / 60)
                          AS BIGINT)
           END AS gap_minutes
    FROM m
    """,
    doc="Marketing attribution (last-touch, 24h lookback): each purchase "
    "attributes to the user's most recent view within the window — the "
    "as-of join in its second composition (operators/asof.py: one "
    "union + per-user window, no per-row range probe; the oracle's "
    "LEFT JOIN + MAX form is the quadratic shape the operator avoids). "
    "Unattributed purchases keep a NULL gap.",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.where(F.col("event_type") == "view").select("user_id", "ts")
    att = asof_join(
        p, v, on="ts", by="user_id",
        right_cols={"ts": "view_ts"}, direction="backward",
    )
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp("view_ts")
    attributed = F.col("view_ts").isNotNull() & (gap_s <= 86400)
    return att.select(
        "event_id",
        "user_id",
        attributed.alias("attributed"),
        F.when(attributed, F.floor(gap_s / 60).cast("long")).alias(
            "gap_minutes"
        ),
    )


@register(
    "events_timeseries_decompose",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             {sql_dsum('value', 4)} AS v
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, day, v,
             ROUND(CAST(SUM(CAST(v AS DECIMAL(38,10))) OVER w7 AS DOUBLE)
                   / COUNT(v) OVER w7, 6) AS trend
      FROM daily
      WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    d AS (
      SELECT *, isodow(day) AS dow, ROUND(v - trend, 6) AS detr FROM t
    ),
    s AS (
      SELECT event_type, dow, {sql_davg('detr')} AS seasonal
      FROM d GROUP BY 1, 2
    )
    SELECT d.event_type, d.day, d.v AS value, d.trend, s.seasonal,
           ROUND(d.v - d.trend - s.seasonal, 6) AS residual
    FROM d JOIN s ON d.event_type = s.event_type AND d.dow = s.dow
    """,
    doc="Classical additive time-series decomposition of the daily value "
    "series per event type: trend = 7-day centered moving average "
    "(decimal-accumulated window), seasonal = day-of-week mean of the "
    "detrended series, residual = the rest — the moving-average "
    "decomposition behind STL, as two windows + one group aggregate. "
    "Scale: the corpus-size pass is the daily rollup; everything after "
    "runs on |types| x |days| rows.",
)
def events_timeseries_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(dsum(F.col("value"), 4).alias("v"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    t = daily.withColumn(
        "trend",
        F.round(
            F.sum(F.col("v").cast("decimal(38,10)")).over(w7).cast("double")
            / F.count("v").over(w7),
            6,
        ),
    )
    d = t.withColumn("dow", F.weekday("day") + 1).withColumn(
        "detr", F.round(F.col("v") - F.col("trend"), 6)
    )
    s = d.groupBy("event_type", "dow").agg(davg("detr").alias("seasonal"))
    return d.join(s, ["event_type", "dow"]).select(
        "event_type",
        "day",
        F.col("v").alias("value"),
        "trend",
        "seasonal",
        F.round(F.col("v") - F.col("trend") - F.col("seasonal"), 6).alias(
            "residual"
        ),
    )


@register(
    "events_cusum_changepoint",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, {sql_davg('n')} AS mean_n
      FROM daily GROUP BY event_type
    ),
    c AS (
      SELECT d.event_type, d.day, d.n,
             ROUND(CAST(SUM(CAST(ROUND(d.n - m.mean_n, 8)
                                 AS DECIMAL(38,10)))
                        OVER (PARTITION BY d.event_type ORDER BY d.day
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE),
                   6) AS cusum
      FROM daily d JOIN m ON d.event_type = m.event_type
    )
    SELECT event_type, day AS changepoint_day, cusum AS peak_cusum
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY abs(cusum) DESC, day
             ) AS rk
      FROM c
    ) WHERE rk = 1
    """,
    doc="Single-changepoint estimation per event type by the CUSUM "
    "statistic: running decimal-accumulated sum of daily-count "
    "deviations from the series mean; the |cusum| peak is the classic "
    "change-point location estimate. The corpus-size pass is the daily "
    "rollup; the running sum and argmax run on |types| x |days| rows.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = daily.groupBy("event_type").agg(davg("n").alias("mean_n"))
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = (
        daily.join(m, "event_type")
        .withColumn(
            "cusum",
            F.round(
                F.sum(
                    F.round(F.col("n") - F.col("mean_n"), 8).cast(
                        "decimal(38,10)"
                    )
                )
                .over(wrun)
                .cast("double"),
                6,
            ),
        )
    )
    wpk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.asc("day")
    )
    return (
        c.withColumn("rk", F.row_number().over(wpk))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.col("cusum").alias("peak_cusum"),
        )
    )


# ---------------------------------------------------------------------------
# events_ewma_value — bounded-horizon EWMA smoothing per event type
# ---------------------------------------------------------------------------

# alpha = 0.3, horizon 16 days: weight k = 0.3 * 0.7^k, truncated where the
# tail mass is ~0.3%.  Shared Python-computed literals so both engines sum
# the IDENTICAL doubles in the identical left-to-right order.
_EWMA_W = [0.3 * 0.7**k for k in range(16)]


def _ewma_sql() -> str:
    num = " + ".join(
        f"COALESCE(ROUND({w!r} * lag(daily_mean, {k}) OVER w, 8), 0.0)"
        for k, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"(CASE WHEN lag(daily_mean, {k}) OVER w IS NULL"
        f" THEN 0.0 ELSE {w!r} END)"
        for k, w in enumerate(_EWMA_W)
    )
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND({sql_dsum('ROUND(value, 6)', 6)} / COUNT(*), 6)
               AS daily_mean
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, daily_mean,
           ROUND(({num}) / ({den}), 6) AS ewma
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """


@register(
    "events_ewma_value",
    _ewma_sql(),
    doc="Exponentially weighted moving average (alpha=0.3) of each event "
    "type's daily mean value, BOUNDED-HORIZON form (16 lags, ~99.7% of "
    "the weight mass): the recursive EWMA is a sequential scan per key — "
    "unbounded state and unshardable — while the truncated form is 16 "
    "lag() reads inside ONE window pass, so smoothing 100 TB of metrics "
    "costs one sort per key like any other window aggregate, and the "
    "streaming twin keeps 16 rows of state per key.  Weights are shared "
    "Python-computed literals; near-partition-start rows renormalize "
    "over the lags that exist.",
)
def events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.round(
            dsum(F.round(F.col("value"), 6), 6) / F.count(F.lit(1)), 6
        ).alias("daily_mean")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    num = None
    den = None
    for k, wk in enumerate(_EWMA_W):
        lagk = F.lag("daily_mean", k).over(w)
        term = F.coalesce(F.round(F.lit(wk) * lagk, 8), F.lit(0.0))
        dterm = F.when(lagk.isNull(), F.lit(0.0)).otherwise(F.lit(wk))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return daily.select(
        "event_type",
        "day",
        "daily_mean",
        F.round(num / den, 6).alias("ewma"),
    )


@register(
    "events_bot_regularity",
    """
    WITH seq AS (
      SELECT user_id,
             (epoch_us(ts)
              - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)) // 1000
               AS gap_ms
      FROM events
    ),
    sums AS (
      SELECT user_id,
             CAST(COUNT(gap_ms) AS BIGINT) AS n_gaps,
             CAST(SUM(CAST(gap_ms AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(gap_ms AS DECIMAL(38,0))
                      * CAST(gap_ms AS DECIMAL(38,0))) AS DOUBLE) AS s2
      FROM seq WHERE gap_ms IS NOT NULL
      GROUP BY user_id HAVING COUNT(gap_ms) >= 4
    )
    SELECT user_id, n_gaps + 1 AS n_events,
           ROUND(s1 / n_gaps, 3) AS mean_gap_ms,
           ROUND(CASE WHEN s1 > 0
                      THEN sqrt(greatest(s2 / n_gaps
                                         - (s1 / n_gaps) * (s1 / n_gaps),
                                         0.0)) / (s1 / n_gaps)
                      ELSE 0.0 END, 6) + 0.0 AS cv_gap,
           (CASE WHEN s1 > 0
                 THEN sqrt(greatest(s2 / n_gaps
                                    - (s1 / n_gaps) * (s1 / n_gaps),
                                    0.0)) / (s1 / n_gaps)
                 ELSE 0.0 END) < 0.1 AS bot_like
    FROM sums
    """,
    doc="Automation/bot screening by inter-arrival REGULARITY — the "
    "curation filter that catches scripted traffic organic behavior "
    "never produces: per user (>= 5 events), the coefficient of "
    "variation of consecutive event gaps; cv near 0 = metronome-like "
    "scheduling, flagged below 0.1.  Moments-sketch determinism: per-"
    "user state is exact (n, sum gap, sum gap^2) with millisecond gaps "
    "squared in DECIMAL(38,0), and every derived double is the same "
    "literal expression of those exact integers in both engines.  One "
    "lag window + one combinable aggregate; at 100 TB the lag rides "
    "the same (user, ts) sort the sessionizer already pays.",
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.expr(
            "(unix_micros(cast(ts as timestamp))"
            " - lag(unix_micros(cast(ts as timestamp))) over"
            " (partition by user_id order by ts, event_id)) div 1000"
        ).alias("gap_ms"),
    )
    dec = "decimal(38,0)"
    sums = (
        seq.where(F.col("gap_ms").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_ms").alias("n_gaps"),
            F.sum(F.col("gap_ms").cast(dec)).cast("double").alias("s1"),
            F.sum(F.col("gap_ms").cast(dec) * F.col("gap_ms").cast(dec))
            .cast("double")
            .alias("s2"),
        )
        .where(F.col("n_gaps") >= 4)
    )
    mean = F.col("s1") / F.col("n_gaps")
    var = F.greatest(
        F.col("s2") / F.col("n_gaps") - mean * mean, F.lit(0.0)
    )
    cv = F.when(F.col("s1") > 0, F.sqrt(var) / mean).otherwise(F.lit(0.0))
    return sums.select(
        "user_id",
        (F.col("n_gaps") + 1).alias("n_events"),
        F.round(mean, 3).alias("mean_gap_ms"),
        (F.round(cv, 6) + F.lit(0.0)).alias("cv_gap"),
        (cv < 0.1).alias("bot_like"),
    )


@register(
    "events_markov_entropy",
    """
    WITH tr AS (
      SELECT user_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             event_type AS cur
      FROM events
    ),
    cnt AS (
      SELECT user_id, prev, cur, COUNT(*) AS cij
      FROM tr WHERE prev IS NOT NULL
      GROUP BY user_id, prev, cur
    ),
    marg AS (
      SELECT user_id, prev, cur, cij,
             SUM(cij) OVER (PARTITION BY user_id, prev) AS ci,
             SUM(cij) OVER (PARTITION BY user_id) AS n
      FROM cnt
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_transitions,
           ROUND(CAST(SUM(CAST(ROUND(
             -(CAST(cij AS DOUBLE) / CAST(n AS DOUBLE))
               * ROUND(LN(CAST(cij AS DOUBLE) / CAST(ci AS DOUBLE)), 8),
             10) AS DECIMAL(38,10))) AS DOUBLE), 6) + 0.0
             AS entropy_rate
    FROM marg GROUP BY user_id
    """,
    doc="Per-user Markov entropy rate — behavioral predictability "
    "beside the inter-arrival cv screen: transition counts between "
    "consecutive event types (one lag window on the (user, ts, "
    "event_id) sort the sessionizer already pays), entropy "
    "H = -sum (cij/n) ln(cij/ci) over the user's transition matrix.  "
    "Zero = fully scripted next-event behavior (another bot "
    "signature), high = diverse organic use.  Determinism: counts are "
    "exact ints, both probability ratios are single int/int divisions "
    "(IEEE-identical), LN is rounded to 8 dp (cross-engine libm ULP "
    "guard), each term rounds to 10 dp into a DECIMAL(38,10) sum — "
    "order-free — and the final double rounds to 6 (+0.0 normalizes "
    "-0.0).  One grouped aggregate + two windows riding the user "
    "partitioning.  Full SQL oracle.",
)
def events_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_type").alias("cur"),
    ).where(F.col("prev").isNotNull())
    cnt = tr.groupBy("user_id", "prev", "cur").agg(
        F.count(F.lit(1)).alias("cij")
    )
    marg = cnt.select(
        "user_id",
        "cij",
        F.sum("cij").over(Window.partitionBy("user_id", "prev")).alias("ci"),
        F.sum("cij").over(Window.partitionBy("user_id")).alias("n"),
    )
    term = F.round(
        -(F.col("cij").cast("double") / F.col("n").cast("double"))
        * F.round(
            F.log(F.col("cij").cast("double") / F.col("ci").cast("double")),
            8,
        ),
        10,
    ).cast("decimal(38,10)")
    return marg.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_transitions"),
        (F.round(F.sum(term).cast("double"), 6) + 0.0).alias(
            "entropy_rate"
        ),
    )


@register(
    "events_theil_sen_trend",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS y
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    slopes AS (
      SELECT (b.y - a.y) / (b.x - a.x) AS s
      FROM daily a JOIN daily b ON a.x < b.x
    ),
    ranked AS (
      SELECT s, row_number() OVER (ORDER BY s) AS rn,
             COUNT(*) OVER () AS n
      FROM slopes
    ),
    med AS (
      SELECT CASE WHEN MAX(n) % 2 = 1
               THEN MAX(CASE WHEN rn = (n + 1) // 2 THEN s END)
               ELSE (SUM(CASE WHEN rn IN (n // 2, n // 2 + 1)
                         THEN s ELSE 0 END)) / 2.0 END AS slope
      FROM ranked
    ),
    resid AS (
      SELECT d.y - m.slope * d.x AS r
      FROM daily d CROSS JOIN med m
    ),
    rranked AS (
      SELECT r, row_number() OVER (ORDER BY r) AS rn,
             COUNT(*) OVER () AS n
      FROM resid
    ),
    rmed AS (
      SELECT CASE WHEN MAX(n) % 2 = 1
               THEN MAX(CASE WHEN rn = (n + 1) // 2 THEN r END)
               ELSE (SUM(CASE WHEN rn IN (n // 2, n // 2 + 1)
                         THEN r ELSE 0 END)) / 2.0 END AS intercept
      FROM rranked
    )
    SELECT (SELECT COUNT(*) FROM daily) AS n_days,
           (SELECT COUNT(*) FROM slopes) AS n_pairs,
           ROUND(m.slope, 6) AS slope_per_day,
           ROUND(rm.intercept, 6) AS intercept
    FROM med m CROSS JOIN rmed rm
    """,
    doc="Theil-Sen robust trend of daily purchase revenue: slope = "
    "exact median of all pairwise day-over-day slopes, intercept = "
    "median residual at that slope — a single outlier day (a flash "
    "sale, a logging gap) cannot move it, where OLS swings (the "
    "reason monitoring dashboards prefer it).  The pairwise self-join "
    "and medians run on the BOUNDED per-day frame (one grouped "
    "aggregate first: ~hundreds of rows, ~10^4 pairs at ANY corpus "
    "scale — the fact table is never self-joined), so the declared "
    "bounded BNLJ and the unpartitioned median windows are the "
    "AUC-histogram exception class.  Exact decimal daily sums, one "
    "double cast, slopes as single divisions, even-count medians "
    "average two exact doubles.  Full SQL oracle.",
    expects_bnlj=True,  # bounded day-frame self-join + 1-row medians
    expects_broadcast="bounded day-frame medians (declared bounded BNLJ)",
    expects_global_window="pairwise-slope medians over the bounded calendar-day frame",
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(38,10)"))
            .cast("double")
            .alias("y")
        )
        .select(
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("x"),
            "y",
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias(
            "s"
        )
    )

    def _median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.orderBy(col)
        ranked = df.withColumn("rn", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy())
        )
        mid_odd = F.max(
            F.when(
                F.col("rn") == ((F.col("n") + 1) / 2).cast("long"),
                F.col(col),
            )
        )
        mid_even = (
            F.sum(
                F.when(
                    (F.col("rn") == (F.col("n") / 2).cast("long"))
                    | (F.col("rn") == (F.col("n") / 2).cast("long") + 1),
                    F.col(col),
                ).otherwise(F.lit(0.0))
            )
            / 2.0
        )
        return ranked.agg(
            F.when(F.max("n") % 2 == 1, mid_odd)
            .otherwise(mid_even)
            .alias(out)
        )

    med = _median(slopes, "s", "slope")
    resid = daily.crossJoin(F.broadcast(med)).select(
        (F.col("y") - F.col("slope") * F.col("x")).alias("r")
    )
    rmed = _median(resid, "r", "intercept")
    n_days = daily.count()
    n_pairs = n_days * (n_days - 1) // 2
    return med.crossJoin(F.broadcast(rmed)).select(
        F.lit(n_days).cast("long").alias("n_days"),
        F.lit(n_pairs).cast("long").alias("n_pairs"),
        F.round("slope", 6).alias("slope_per_day"),
        F.round("intercept", 6).alias("intercept"),
    )
