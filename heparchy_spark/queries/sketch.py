"""Sketch corpus queries (Count-Min heavy hitters).

The sketch is deterministic given the data (sha256-slice positions), so
the DuckDB oracle rebuilds the identical d x w counter table in portable
SQL and the whole query hash-checks — estimate column included.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.sketch import (
    cm_positions,
    count_min_build,
    count_min_estimate,
)
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load

_W = 1 << 14
_D = 3
_TOPK = 20


def _pos_sql(h: str, i: int) -> str:
    return (
        f"CAST(CONCAT('0x', substr({h}, {1 + 15 * i}, 15)) AS BIGINT) % {_W}"
    )


@register(
    "sketch_count_min_users",
    f"""
    WITH hashed AS (
      SELECT user_id, sha256(CAST(user_id AS VARCHAR)) AS h FROM events
    ),
    pos AS (
      {" UNION ALL ".join(
          f"SELECT {i} AS row_idx, {_pos_sql('h', i)} AS col_idx, user_id"
          f" FROM hashed" for i in range(_D))}
    ),
    sketch AS (
      SELECT row_idx, col_idx, COUNT(*) AS cnt FROM pos GROUP BY 1, 2
    ),
    top AS (
      SELECT user_id, COUNT(*) AS exact_n FROM events
      GROUP BY user_id ORDER BY exact_n DESC, user_id LIMIT {_TOPK}
    ),
    thashed AS (
      SELECT user_id, exact_n, sha256(CAST(user_id AS VARCHAR)) AS h FROM top
    ),
    tpos AS (
      {" UNION ALL ".join(
          f"SELECT user_id, exact_n, {i} AS row_idx,"
          f" {_pos_sql('h', i)} AS col_idx FROM thashed"
          for i in range(_D))}
    )
    SELECT tpos.user_id, tpos.exact_n, MIN(sketch.cnt) AS cm_est
    FROM tpos JOIN sketch
      ON sketch.row_idx = tpos.row_idx AND sketch.col_idx = tpos.col_idx
    GROUP BY tpos.user_id, tpos.exact_n
    """,
    doc="Count-Min heavy hitters over the events stream: a 3 x 2^14 "
    "counter sketch (one explode + one combinable aggregate — at most "
    "d*w rows shuffle, independent of input size) estimates the top-20 "
    "users' event counts; exact counts sit alongside for the one-sided "
    "error contract (cm_est >= exact_n). Oracle rebuilds the identical "
    "sketch in portable SQL (operators/sketch.py).",
    expects_broadcast="fixed-width CM sketch frame (d x w cells)",
)
def sketch_count_min_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sketch = count_min_build(
        ev, cm_positions(F.col("user_id"), _W, _D)
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("user_id"))
        .limit(_TOPK)
    )
    est = count_min_estimate(
        top, "user_id", cm_positions(F.col("user_id"), _W, _D), sketch
    )
    return top.join(est, "user_id").select("user_id", "exact_n", "cm_est")


_HLL_B = 12


@register(
    "sketch_hll_registers_users",
    f"""
    WITH hashed AS (
      SELECT CAST(CONCAT('0x', substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS v
      FROM events
    ),
    split AS (
      SELECT v >> {60 - _HLL_B} AS register_idx,
             v & {(1 << (60 - _HLL_B)) - 1} AS rest
      FROM hashed
    )
    SELECT register_idx,
           MAX(CASE WHEN rest = 0 THEN {60 - _HLL_B + 1}
                    ELSE {60 - _HLL_B + 1} - length(bin(rest)) END) AS max_rank
    FROM split GROUP BY register_idx
    """,
    doc="HyperLogLog register ledger over event user_ids: 2^12 registers "
    "of max leading-zero rank — the mergeable distinct-count STATE "
    "(merge = per-register max), exposed as rows so it can be persisted "
    "and diffed instead of re-shuffling every key for exact distinct "
    "(operators/sketch.py hll_registers). Integer-deterministic; oracle "
    "rebuilds the registers bit-for-bit in portable SQL.",
)
def sketch_hll_registers_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.sketch import hll_registers

    return hll_registers(
        load(spark, sf_dir, "events"), F.col("user_id"), b=_HLL_B
    )


@register(
    "sketch_hll_daily_user_registers",
    f"""
    WITH hashed AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(CONCAT('0x', substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS v
      FROM events
    ),
    split AS (
      SELECT day, v >> {60 - _HLL_B} AS register_idx,
             v & {(1 << (60 - _HLL_B)) - 1} AS rest
      FROM hashed
    )
    SELECT day, register_idx,
           MAX(CASE WHEN rest = 0 THEN {60 - _HLL_B + 1}
                    ELSE {60 - _HLL_B + 1} - length(bin(rest)) END) AS max_rank
    FROM split GROUP BY day, register_idx
    """,
    doc="Per-day HyperLogLog user ledgers: <= 2^12 register rows per day, "
    "roll up to weeks/months with one per-register max instead of "
    "recounting the key universe — the distinct-count cube pattern. "
    "Oracle rebuilds every ledger bit-for-bit in portable SQL.",
)
def sketch_hll_daily_user_registers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from heparchy_spark.operators.sketch import hll_registers

    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return hll_registers(ev, F.col("user_id"), b=_HLL_B, group_cols=["day"])


@register(
    "sketch_hll_weekly_rollup",
    f"""
    WITH hashed AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             CAST(CONCAT('0x', substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS v
      FROM events
    ),
    split AS (
      SELECT week, v >> {60 - _HLL_B} AS register_idx,
             v & {(1 << (60 - _HLL_B)) - 1} AS rest
      FROM hashed
    ),
    daily AS (
      SELECT week, register_idx,
             MAX(CASE WHEN rest = 0 THEN {60 - _HLL_B + 1}
                      ELSE {60 - _HLL_B + 1} - length(bin(rest)) END)
               AS max_rank
      FROM split GROUP BY week, register_idx
    )
    SELECT week, register_idx, MAX(max_rank) AS max_rank
    FROM daily GROUP BY week, register_idx
    """,
    doc="HLL ledger roll-up IN the engine: the per-day ledgers merge to "
    "weekly with one per-register max — the aggregation touches at most "
    "(days x 2^12) ledger rows, never the event stream again. Oracle "
    "rebuilds the rollup in portable SQL.",
)
def sketch_hll_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.sketch import hll_registers

    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    ).withColumn("week", F.to_date(F.date_trunc("week", "ts")))
    daily = hll_registers(
        ev, F.col("user_id"), b=_HLL_B, group_cols=["week", "day"]
    )
    return daily.groupBy("week", "register_idx").agg(
        F.max("max_rank").alias("max_rank")
    )


_HLL_EST_SQL = """
      SELECT ROUND(CASE WHEN raw <= 10240.0 AND zeros > 0
                   THEN 4096.0 * ln(4096.0 / CAST(zeros AS DOUBLE))
                   ELSE raw END, 6) AS est
      FROM (
        SELECT (4096 - COUNT(*)) AS zeros,
               12098218.894406674 /
                 (CAST(SUM(CAST(1 AS BIGINT) << (49 - max_rank))
                       + (4096 - COUNT(*)) * (CAST(1 AS BIGINT) << 49)
                       AS DOUBLE) / 562949953421312.0) AS raw
        FROM {src}
      )
"""


@register(
    "sketch_hll_intersection_days",
    f"""
    WITH hashed AS (
      -- filter via a projected alias: DuckDB 1.0 returns zero rows for
      -- IN-lists applied directly to CAST(TIMESTAMP_NS AS DATE)
      SELECT * FROM (
        SELECT CAST(ts AS DATE) AS day, user_id,
               CAST(CONCAT('0x', substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS v
        FROM events
      ) WHERE day IN (DATE '2024-01-01', DATE '2024-01-02')
    ),
    split AS (
      SELECT day, v >> {60 - _HLL_B} AS register_idx,
             v & {(1 << (60 - _HLL_B)) - 1} AS rest
      FROM hashed
    ),
    led AS (
      SELECT day, register_idx,
             MAX(CASE WHEN rest = 0 THEN {60 - _HLL_B + 1}
                      ELSE {60 - _HLL_B + 1} - length(bin(rest)) END)
               AS max_rank
      FROM split GROUP BY day, register_idx
    ),
    uled AS (
      SELECT register_idx, MAX(max_rank) AS max_rank FROM led GROUP BY 1
    ),
    ea AS ({_HLL_EST_SQL.format(src="(SELECT * FROM led WHERE day = DATE '2024-01-01')")}),
    eb AS ({_HLL_EST_SQL.format(src="(SELECT * FROM led WHERE day = DATE '2024-01-02')")}),
    eu AS ({_HLL_EST_SQL.format(src="uled")}),
    ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection FROM (
        SELECT DISTINCT user_id FROM hashed WHERE day = DATE '2024-01-01'
        INTERSECT
        SELECT DISTINCT user_id FROM hashed WHERE day = DATE '2024-01-02'
      )
    )
    SELECT ea.est AS est_day_a, eb.est AS est_day_b, eu.est AS est_union,
           ROUND(ea.est + eb.est - eu.est, 6) AS est_intersection,
           exact_intersection
    FROM ea, eb, eu, ex
    """,
    doc="HLL set-operation composition: estimated overlap of two days' "
    "user sets via inclusion-exclusion on mergeable register ledgers "
    "(union ledger = per-register max, never a re-count), with the "
    "exact intersection beside it. Estimates run ENGINE-side "
    "(operators/sketch.py hll_estimate_df): the harmonic sum "
    "accumulates as an exact int64, so both engines produce "
    "bit-identical doubles — order-free where naive double summation "
    "is partition-order-dependent.",
    expects_bnlj=True,
    expects_broadcast="1-row HLL register aggregates",
)
def sketch_hll_intersection_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.sketch import hll_estimate_df, hll_registers

    d1, d2 = "2024-01-01", "2024-01-02"
    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    evf = ev.where(F.col("day").isin(d1, d2))
    led = hll_registers(evf, F.col("user_id"), b=_HLL_B, group_cols=["day"])
    led = led.persist()
    ea = hll_estimate_df(
        led.where(F.col("day") == d1).select("register_idx", "max_rank")
    ).select(F.col("est_distinct").alias("est_day_a"))
    eb = hll_estimate_df(
        led.where(F.col("day") == d2).select("register_idx", "max_rank")
    ).select(F.col("est_distinct").alias("est_day_b"))
    eu = hll_estimate_df(
        led.groupBy("register_idx").agg(F.max("max_rank").alias("max_rank"))
    ).select(F.col("est_distinct").alias("est_union"))
    ex = (
        evf.where(F.col("day") == d1)
        .select("user_id")
        .distinct()
        .intersect(evf.where(F.col("day") == d2).select("user_id").distinct())
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    return (
        ea.join(F.broadcast(eb))
        .join(F.broadcast(eu))
        .join(F.broadcast(ex))
        .select(
            "est_day_a",
            "est_day_b",
            "est_union",
            F.round(
                F.col("est_day_a") + F.col("est_day_b") - F.col("est_union"),
                6,
            ).alias("est_intersection"),
            "exact_intersection",
        )
    )


@register(
    "sketch_kmv_distinct_users",
    """
    WITH pairs AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS kmv_h
      FROM events
    ),
    ranked AS (
      SELECT event_type, kmv_h,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY kmv_h) AS kmv_rank
      FROM pairs
    ),
    st AS (
      SELECT event_type, COUNT(*) AS n_kept, MAX(kmv_h) AS max_h
      FROM ranked WHERE kmv_rank <= 64 GROUP BY event_type
    ),
    ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT st.event_type,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
           ROUND(CASE WHEN n_kept >= 64
                 THEN 63.0 / (CAST(max_h AS DOUBLE) / 1152921504606846976.0)
                 ELSE CAST(n_kept AS DOUBLE) END, 4) AS kmv_est
    FROM st JOIN ex ON st.event_type = ex.event_type
    """,
    doc="KMV (bottom-64) distinct-user sketch per event type beside the "
    "exact count: the k smallest distinct sha256-slice hashes are "
    "mergeable state (union of sketches = bottom-k of the union), and "
    "(k-1)/u_k estimates cardinality from the kth-smallest normalized "
    "value.  The estimate column itself hash-checks because the hash is "
    "the portable sha256 slice — the oracle rebuilds the sketch "
    "bit-for-bit in SQL.  One combinable distinct + a per-group window "
    "over surviving distincts; merging day sketches into week sketches "
    "is one sort-limit, never a recount.",
)
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.sketch import kmv_estimate, kmv_sketch

    ev = load(spark, sf_dir, "events")
    st = kmv_sketch(ev, F.col("user_id"), k=64, group_cols=["event_type"])
    est = kmv_estimate(st, k=64, group_cols=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "exact_distinct", "kmv_est"
    )


@register(
    "sketch_kmv_jaccard_days",
    """
    WITH hashed AS (
      -- filter via a projected alias: DuckDB 1.0 returns zero rows for
      -- IN-lists applied directly to CAST(TIMESTAMP_NS AS DATE)
      SELECT * FROM (
        SELECT CAST(ts AS DATE) AS day, user_id,
               CAST(CONCAT('0x', substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS kmv_h
        FROM events
      ) WHERE day IN (DATE '2024-01-01', DATE '2024-01-02')
    ),
    ska AS (
      SELECT kmv_h FROM (
        SELECT kmv_h, ROW_NUMBER() OVER (ORDER BY kmv_h) AS r
        FROM (SELECT DISTINCT kmv_h FROM hashed WHERE day = DATE '2024-01-01')
      ) WHERE r <= 64
    ),
    skb AS (
      SELECT kmv_h FROM (
        SELECT kmv_h, ROW_NUMBER() OVER (ORDER BY kmv_h) AS r
        FROM (SELECT DISTINCT kmv_h FROM hashed WHERE day = DATE '2024-01-02')
      ) WHERE r <= 64
    ),
    un AS (
      SELECT kmv_h,
             CASE WHEN kmv_h IN (SELECT kmv_h FROM ska) THEN 1 ELSE 0 END AS a,
             CASE WHEN kmv_h IN (SELECT kmv_h FROM skb) THEN 1 ELSE 0 END AS b
      FROM (SELECT kmv_h FROM ska UNION SELECT kmv_h FROM skb)
    ),
    kept AS (
      SELECT * FROM (
        SELECT kmv_h, a, b, ROW_NUMBER() OVER (ORDER BY kmv_h) AS r FROM un
      ) WHERE r <= 64
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_union_kept,
             CAST(SUM(a * b) AS BIGINT) AS n_both,
             MAX(kmv_h) AS max_h
      FROM kept
    ),
    ex AS (
      SELECT ROUND(
        CAST((SELECT COUNT(*) FROM (
           SELECT DISTINCT user_id FROM hashed WHERE day = DATE '2024-01-01'
           INTERSECT
           SELECT DISTINCT user_id FROM hashed WHERE day = DATE '2024-01-02'
        )) AS DOUBLE)
        / CAST((SELECT COUNT(*) FROM (
           SELECT DISTINCT user_id FROM hashed
        )) AS DOUBLE), 6) AS exact_jaccard
    )
    SELECT n_union_kept, n_both,
           ROUND(CAST(n_both AS DOUBLE) / n_union_kept, 6) AS jaccard_est,
           ROUND(CASE WHEN n_union_kept >= 64
                 THEN 63.0 / (CAST(max_h AS DOUBLE) / 1152921504606846976.0)
                 ELSE CAST(n_union_kept AS DOUBLE) END, 4) AS union_est,
           ROUND(CAST(n_both AS DOUBLE) / n_union_kept *
                 CASE WHEN n_union_kept >= 64
                 THEN 63.0 / (CAST(max_h AS DOUBLE) / 1152921504606846976.0)
                 ELSE CAST(n_union_kept AS DOUBLE) END, 4)
             AS intersection_est,
           exact_jaccard
    FROM st, ex
    """,
    doc="KMV set-resemblance composition (Broder bottom-k / Theta "
    "sketch): Jaccard, union size, and intersection size of two days' "
    "user sets estimated ENTIRELY from the two bottom-64 sketches — "
    "the k smallest hashes of the sketch union, the fraction present "
    "in both, and (k-1)/u_k — beside the exact Jaccard. Mergeable "
    "sketch state means cross-day/corpus resemblance at 100 TB reads "
    "only sketch rows (<= 2k per comparison), never the raw sets; the "
    "union ranking is a single-partition window over <= 128 rows, "
    "bounded by construction.",
    expects_global_window="<=2k-row KMV sketch union",
)
def sketch_kmv_jaccard_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.sketch import kmv_jaccard, kmv_sketch

    d1, d2 = "2024-01-01", "2024-01-02"
    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    evf = ev.where(F.col("day").isin(d1, d2)).persist()
    ska = kmv_sketch(evf.where(F.col("day") == d1), F.col("user_id"), k=64)
    skb = kmv_sketch(evf.where(F.col("day") == d2), F.col("user_id"), k=64)
    est = kmv_jaccard(ska, skb, k=64)
    inter = (
        evf.where(F.col("day") == d1)
        .select("user_id")
        .distinct()
        .intersect(evf.where(F.col("day") == d2).select("user_id").distinct())
        .count()
    )
    union = evf.select("user_id").distinct().count()
    exact = F.round(F.lit(float(inter)) / F.lit(float(union)), 6)
    return est.select(
        "n_union_kept",
        "n_both",
        "jaccard_est",
        "union_est",
        "intersection_est",
        exact.alias("exact_jaccard"),
    )


_JS_W = 1 << 13
_JS_D = 3


def _js_pos_sql(h: str, i: int) -> str:
    return (
        f"CAST(CONCAT('0x', substr({h}, {1 + 15 * i}, 15)) AS BIGINT)"
        f" % {_JS_W}"
    )


@register(
    "sketch_cm_join_size_views_purchases",
    f"""
    WITH va AS (
      SELECT user_id, sha256(CAST(user_id AS VARCHAR)) AS h
      FROM events WHERE event_type = 'view'
    ),
    pb AS (
      SELECT user_id, sha256(CAST(user_id AS VARCHAR)) AS h
      FROM events WHERE event_type = 'purchase'
    ),
    ska AS (
      SELECT row_idx, col_idx, COUNT(*) AS cnt FROM (
        {" UNION ALL ".join(
            f"SELECT {i} AS row_idx, {_js_pos_sql('h', i)} AS col_idx FROM va"
            for i in range(_JS_D))}
      ) GROUP BY 1, 2
    ),
    skb AS (
      SELECT row_idx, col_idx, COUNT(*) AS cnt FROM (
        {" UNION ALL ".join(
            f"SELECT {i} AS row_idx, {_js_pos_sql('h', i)} AS col_idx FROM pb"
            for i in range(_JS_D))}
      ) GROUP BY 1, 2
    ),
    dots AS (
      SELECT ska.row_idx, SUM(ska.cnt * skb.cnt) AS dot
      FROM ska JOIN skb
        ON ska.row_idx = skb.row_idx AND ska.col_idx = skb.col_idx
      GROUP BY ska.row_idx
    ),
    ex AS (
      SELECT CAST(COALESCE(SUM(v.c * p.c), 0) AS BIGINT)
               AS exact_join_size
      FROM (SELECT user_id, COUNT(*) AS c FROM va GROUP BY 1) v
      JOIN (SELECT user_id, COUNT(*) AS c FROM pb GROUP BY 1) p
        ON v.user_id = p.user_id
    )
    SELECT CAST(MIN(dot) AS BIGINT) AS cm_join_size, exact_join_size
    FROM dots CROSS JOIN ex
    GROUP BY exact_join_size
    """,
    doc="Join-size estimation from sketches alone (Cormode & "
    "Muthukrishnan 2005): |views JOIN purchases ON user_id| estimated "
    "as the min-over-rows inner product of two 3 x 8192 Count-Min "
    "sketches — the cardinality a planner needs to size a join, read "
    "from <= d*w counter rows instead of either table. Exact join "
    "size (sum over users of views*purchases) sits beside it for the "
    "one-sided error contract (est >= exact). Deterministic sha-slice "
    "positions; the oracle rebuilds both sketches in portable SQL.",
    expects_bnlj=True,
    expects_broadcast="fixed-width CM sketch frames",
)
def sketch_cm_join_size_views_purchases(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from heparchy_spark.operators.sketch import (
        cm_positions,
        count_min_build,
        count_min_join_size,
    )

    ev = load(spark, sf_dir, "events")
    va = ev.where(F.col("event_type") == "view")
    pb = ev.where(F.col("event_type") == "purchase")
    ska = count_min_build(
        va, cm_positions(F.col("user_id"), _JS_W, _JS_D)
    )
    skb = count_min_build(
        pb, cm_positions(F.col("user_id"), _JS_W, _JS_D)
    )
    est = count_min_join_size(ska, skb, _JS_D)
    exact = (
        va.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(
            pb.groupBy("user_id").agg(F.count(F.lit(1)).alias("c2")),
            "user_id",
        )
        .agg(
            F.coalesce(F.sum(F.col("c") * F.col("c2")), F.lit(0))
            .cast("long")
            .alias("exact_join_size")
        )
    )
    return est.join(F.broadcast(exact)).select(
        F.col("cm_join_size").cast("long").alias("cm_join_size"),
        "exact_join_size",
    )


@register(
    "sketch_sample_quantiles_value",
    """
    WITH hashed AS (
      SELECT event_type, value AS v,
             CAST(('0x' || substr(sha256(CAST(event_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    sample AS (
      SELECT event_type, v, h FROM (
        SELECT event_type, v, h,
               ROW_NUMBER() OVER (
                 PARTITION BY event_type ORDER BY h, v) AS hr
        FROM hashed
      ) WHERE hr <= 256
    ),
    ranked AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY v, h) AS vr,
             COUNT(*) OVER (PARTITION BY event_type) AS ns
      FROM sample
    )
    SELECT event_type, q_pct, v AS q_value,
           CAST(ns AS BIGINT) AS sample_n
    FROM ranked, (SELECT UNNEST([50, 90, 99]) AS q_pct) q
    WHERE vr = GREATEST(1, CAST(CEIL(q_pct * ns / 100) AS INTEGER))
    """,
    doc="Mergeable quantile sketch per event type: bottom-256-by-hash "
    "uniform sample (the KMV idea applied to quantiles — merge = "
    "bottom-s of the union, rank error O(1/sqrt(s))), p50/p90/p99 read "
    "off the sorted sample at rank ceil(q*n_s) under a (value, hash) "
    "total order.  No compaction depends on arrival order, so unlike "
    "GK/KLL the state is a pure function of the row set and the "
    "oracle rebuilds it bit-for-bit "
    "(operators/sketch.py bottomk_sample_quantiles).",
)
def sketch_sample_quantiles_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from heparchy_spark.operators.sketch import bottomk_sample_quantiles

    ev = load(spark, sf_dir, "events")
    return bottomk_sample_quantiles(
        ev,
        "value",
        F.col("event_id"),
        quantiles=[50, 90, 99],
        s=256,
        group_cols=["event_type"],
    )
