"""Event-sequence corpus queries: Markov transition estimation,
frequent contiguous trigrams, and last-touch attribution.

All are per-key window pipelines — one shuffle on the entity key, then
Sort+Window chains inside each partition; the 100 TB shape for
"state over time per entity" questions.  (Type-2 dimension history is
``operators/upsert.py scd2_history`` / ``events_scd2_type_history``.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS src, next_type AS dst, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, SUM(n) AS t FROM c GROUP BY src)
    SELECT c.src, c.dst,
           CAST(c.n AS BIGINT) AS n_transitions,
           ROUND(CAST(c.n AS DOUBLE) / t, 9) AS prob
    FROM c JOIN tot USING (src)
    ORDER BY src, dst
    """,
    doc="First-order Markov transition matrix over per-user event-type "
    "sequences: lead() within user order gives the bigram stream, one "
    "count aggregate and a row-normalizing self-aggregate join give "
    "MLE transition probabilities.  The |types|^2-bounded matrix is "
    "the model a sequence-aware sampler or anomaly scorer consumes.",
    expects_broadcast="per-event-type totals (bounded type domain)",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    c = seq.groupBy("src", "dst").agg(F.count("*").alias("n_transitions"))
    tot = c.groupBy("src").agg(F.sum("n_transitions").alias("__t"))
    return (
        c.join(F.broadcast(tot), "src")
        .select(
            "src",
            "dst",
            "n_transitions",
            F.round(
                F.col("n_transitions").cast("double") / F.col("__t"), 9
            ).alias("prob"),
        )
        .orderBy("src", "dst")
    )


@register(
    "events_top_trigrams",
    """
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3,
           COUNT(*) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n_occurrences DESC, e1, e2, e3
    LIMIT 20
    """,
    doc="Top-20 contiguous event-type trigrams across per-user "
    "sequences (PrefixSpan-lite for fixed length 3): two leads on the "
    "user-partitioned window give the trigram stream, one combinable "
    "count/distinct aggregate, TakeOrdered top-k.  The |types|^3 "
    "support table is bounded regardless of corpus size.",
)
def events_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), "e1", "e2", "e3")
        .limit(20)
    )


@register(
    "events_last_touch_attribution",
    """
    WITH marked AS (
      SELECT user_id, ts, event_type, value,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_ts
      FROM events
    )
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_purchases,
           COUNT(last_click_ts) FILTER (
             ts - last_click_ts <= INTERVAL 24 HOURS
           ) AS n_attributed,
           ROUND(CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38,10))) FILTER (
             ts - last_click_ts <= INTERVAL 24 HOURS
           ) AS DOUBLE), 2) AS attributed_value
    FROM marked
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Daily attributed-revenue rollup: each purchase credits the "
    "user's most recent prior CLICK within 24 hours, then attributed "
    "count and value aggregate per day.  Third composition of the "
    "carried-state idea (events_attribution_last_touch does per-"
    "purchase view-attribution via the as-of operator): here the "
    "carried click timestamp is a conditional running MAX over the "
    "user window (monotone in event order, so max = most recent), so "
    "attribution + rollup is one window pass + one aggregate with no "
    "event-type self-join at all.",
)
def events_last_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from heparchy_spark.queries.numeric import dsum

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.withColumn(
        "last_click_ts",
        F.max(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).over(w),
    )
    attributed = F.col("last_click_ts").isNotNull() & (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("last_click_ts").cast("timestamp"))
        <= F.lit(24 * 3600 * 1_000_000)
    )
    return (
        marked.where(F.col("event_type") == "purchase")
        .groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(attributed.cast("long")).alias("n_attributed"),
            dsum(
                F.when(attributed, F.round(F.col("value"), 2)), 2
            ).alias("attributed_value"),
        )
        .orderBy("day")
    )


@register(
    "events_kaplan_meier",
    """
    WITH bounds AS (
      SELECT CAST(date_trunc('day', MAX(ts)) AS DATE) AS last_day FROM events
    ),
    u AS (
      SELECT user_id,
             date_diff('day', CAST(date_trunc('day', MIN(ts)) AS DATE),
                       CAST(date_trunc('day', MAX(ts)) AS DATE)) AS t,
             CASE WHEN CAST(date_trunc('day', MAX(ts)) AS DATE)
                       >= (SELECT last_day FROM bounds) - 1
                  THEN 0 ELSE 1 END AS churned
      FROM events GROUP BY user_id
    ),
    per_t AS (
      SELECT t, SUM(churned) AS d, COUNT(*) AS leaving
      FROM u GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             (SELECT COUNT(*) FROM u) -
               COALESCE(SUM(leaving) OVER (
                 ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS n
      FROM per_t
    ),
    terms AS (
      SELECT t, d, n,
             CASE WHEN d >= n THEN NULL
                  ELSE ROUND(LN(1.0 - CAST(d AS DOUBLE) / n), 8) END AS lt,
             CASE WHEN d >= n THEN 1 ELSE 0 END AS dead
      FROM risk
    )
    SELECT t AS lifetime_days,
           CAST(d AS BIGINT) AS n_churned,
           CAST(n AS BIGINT) AS n_at_risk,
           CASE WHEN SUM(dead) OVER w > 0 THEN 0.0
                ELSE ROUND(EXP(SUM(lt) OVER w), 6) END AS survival
    FROM terms
    WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    ORDER BY t
    """,
    doc="Kaplan-Meier survival curve of user lifetimes (first to last "
    "event day; users still active in the final two corpus days are "
    "right-censored): risk sets from one bounded per-lifetime "
    "aggregate, the survival product as exp of a running sum of "
    "round-8 log terms.  Every window here runs over the "
    "|distinct lifetimes| table — bounded by the corpus time span in "
    "days, not by its row count.",
    expects_bnlj=True,
    expects_broadcast="1-row study-end bound + 1-row total",
    expects_global_window="per-lifetime-day frame (bounded day domain)",
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.datediff(
            F.to_date(F.date_trunc("day", F.max("ts"))),
            F.to_date(F.date_trunc("day", F.min("ts"))),
        ).alias("t"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("__last"),
    )
    bounds = ev.agg(
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("__end")
    )
    u = u.crossJoin(F.broadcast(bounds)).select(
        "t",
        F.when(
            F.col("__last") >= F.date_sub(F.col("__end"), 1), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("churned"),
    )
    per_t = u.groupBy("t").agg(
        F.sum("churned").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    total = per_t.agg(F.sum("leaving").alias("__total"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n",
            F.col("__total")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0)),
        )
    )
    terms = risk.select(
        "t",
        "d",
        "n",
        F.when(
            F.col("d") >= F.col("n"), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n")), 8
            )
        )
        .alias("lt"),
        (F.col("d") >= F.col("n")).cast("int").alias("dead"),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return terms.select(
        F.col("t").alias("lifetime_days"),
        F.col("d").cast("long").alias("n_churned"),
        F.col("n").cast("long").alias("n_at_risk"),
        F.when(F.sum("dead").over(w_cum) > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum("lt").over(w_cum)), 6))
        .alias("survival"),
    ).orderBy("t")


@register(
    "events_anomaly_markov_nll",
    """
    WITH seq AS (
      SELECT user_id, event_type AS src,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS dst
      FROM events
    ),
    big AS (SELECT user_id, src, dst FROM seq WHERE dst IS NOT NULL),
    c AS (SELECT src, dst, COUNT(*) AS n FROM big GROUP BY 1, 2),
    tot AS (SELECT src, SUM(n) AS t FROM c GROUP BY src),
    p AS (
      SELECT c.src, c.dst,
             ROUND(CAST(c.n AS DOUBLE) / t, 9) AS prob
      FROM c JOIN tot USING (src)
    )
    SELECT b.user_id,
           COUNT(*) AS n_bigrams,
           ROUND(
             ROUND(CAST(SUM(CAST(ROUND(-LN(p.prob), 8) AS DECIMAL(38,10)))
                        AS DOUBLE), 8) / COUNT(*), 6) AS avg_nll
    FROM big b JOIN p ON b.src = p.src AND b.dst = p.dst
    GROUP BY b.user_id
    ORDER BY b.user_id
    """,
    doc="Sequence-anomaly score per user: average negative log-likelihood "
    "of the user's event bigrams under the corpus-wide Markov "
    "transition model (events_markov_transitions composed back onto "
    "the bigram stream).  The |types|^2 probability matrix broadcasts; "
    "scoring is one window pass + one combinable decimal aggregate — "
    "users whose behavior the model finds surprising surface with the "
    "highest avg_nll.  Same ln/round-8 determinism contract as the "
    "bigram-LM NLL in queries/text.py.",
    expects_broadcast="per-event-type-pair transition table (bounded type domain)",
)
def events_anomaly_markov_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.queries.numeric import dsum

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    big = ev.select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    c = big.groupBy("src", "dst").agg(F.count("*").alias("n"))
    tot = c.groupBy("src").agg(F.sum("n").alias("__t"))
    p = c.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        F.round(F.col("n").cast("double") / F.col("__t"), 9).alias("prob"),
    )
    return (
        big.join(F.broadcast(p), ["src", "dst"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                dsum(F.round(-F.log(F.col("prob")), 8), 8)
                / F.count(F.lit(1)),
                6,
            ).alias("avg_nll"),
        )
        .orderBy("user_id")
    )


@register(
    "events_sequence_support",
    """
    WITH span AS (
      SELECT user_id, event_type,
             MIN(CAST(ts AS TIMESTAMP)) AS mn,
             MAX(CAST(ts AS TIMESTAMP)) AS mx
      FROM events GROUP BY user_id, event_type
    ),
    tot AS (SELECT COUNT(DISTINCT user_id) AS nu FROM events),
    pairs AS (
      SELECT a.event_type AS first_type, b.event_type AS then_type,
             COUNT(*) AS n_users
      FROM span a JOIN span b
        ON a.user_id = b.user_id
       AND a.event_type <> b.event_type
       AND a.mn < b.mx
      GROUP BY 1, 2
    )
    SELECT first_type, then_type, CAST(n_users AS BIGINT) AS n_users,
           ROUND(CAST(n_users AS DOUBLE) / nu, 9) AS support
    FROM pairs CROSS JOIN tot
    ORDER BY first_type, then_type
    """,
    doc="Sequential-pattern support (PrefixSpan length-2 patterns, "
    "gap-tolerant): for every ordered type pair (a, b), the share of "
    "users with SOME a-event strictly before SOME b-event — exists "
    "a < b iff min_ts(a) < max_ts(b), so the corpus-scale scan "
    "collapses to one per-(user, type) min/max aggregate and a "
    "user-keyed self-join bounded by |types|^2 rows per user.  The "
    "non-adjacent semantics distinguish it from events_top_trigrams "
    "(consecutive n-grams) and events_funnel_conversion (one fixed "
    "stage chain).",
    expects_bnlj=True,
    expects_broadcast="1-row user-count total",
)
def events_sequence_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    span = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    )
    tot = ev.agg(F.countDistinct("user_id").alias("__nu"))
    a = span.select(
        "user_id", F.col("event_type").alias("first_type"),
        F.col("mn").alias("__amn"),
    )
    b = span.select(
        "user_id", F.col("event_type").alias("then_type"),
        F.col("mx").alias("__bmx"),
    )
    pairs = (
        a.join(b, "user_id")
        .where(
            (F.col("first_type") != F.col("then_type"))
            & (F.col("__amn") < F.col("__bmx"))
        )
        .groupBy("first_type", "then_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "first_type",
            "then_type",
            F.col("n_users").cast("long").alias("n_users"),
            F.round(
                F.col("n_users").cast("double") / F.col("__nu"), 9
            ).alias("support"),
        )
        .orderBy("first_type", "then_type")
    )
