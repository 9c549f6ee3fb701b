"""Distribution-drift corpus queries (operators/drift.py).

The event stream splits at its time midpoint into "before" and "after"
halves — the snapshot-over-snapshot comparison every production
training pipeline runs; the document corpus splits by language for the
vocabulary-drift lens.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.drift import (
    ks_two_sample,
    log_odds_terms,
    psi_fixed_bins,
)
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load

# Shared split: events before/after the midpoint of the observed range.
_MID_SQL = """
      SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid FROM events
"""


def _halved_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            (
                F.unix_micros(F.min("ts").cast("timestamp"))
                + F.unix_micros(F.max("ts").cast("timestamp"))
            )
            / F.lit(2)
        )
        .cast("long")
        .alias("__mid")
    )
    return ev.crossJoin(F.broadcast(bounds)).withColumn(
        "__first",
        F.unix_micros(F.col("ts").cast("timestamp")) < F.col("__mid"),
    )


@register(
    "drift_value_ks",
    f"""
    WITH b AS ({_MID_SQL}),
    lab AS (
      SELECT value,
             CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
                  THEN 1 ELSE 0 END AS ia
      FROM events
    ),
    pv AS (
      SELECT value, SUM(ia) AS da, SUM(1 - ia) AS db
      FROM lab GROUP BY value
    ),
    cum AS (
      SELECT SUM(da) OVER (ORDER BY value) AS ca,
             SUM(db) OVER (ORDER BY value) AS cb
      FROM pv
    ),
    n AS (SELECT SUM(da) AS na, SUM(db) AS nb FROM pv)
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           ROUND(CAST(MAX(ABS(ca * nb - cb * na)) AS DOUBLE)
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 9) AS ks_stat
    FROM cum, n GROUP BY na, nb
    """,
    doc="Exact two-sample Kolmogorov-Smirnov statistic between event "
    "values before and after the stream's time midpoint.  Spark "
    "evaluates the ECDF difference with the distributed prefix sum "
    "(integer cross-multiples, supremum exact); the oracle uses the "
    "serial global window the operator replaces.",
)
def drift_value_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ks_two_sample(
        _halved_events(spark, sf_dir).select("value", "__first"),
        "value",
        "__first",
    )


@register(
    "drift_value_psi",
    f"""
    WITH b AS ({_MID_SQL}),
    r AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
    lab AS (
      SELECT value,
             CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
                  THEN 1 ELSE 0 END AS ia
      FROM events
    ),
    binned AS (
      SELECT CASE WHEN (SELECT hi FROM r) = (SELECT lo FROM r) THEN 0
                  ELSE LEAST(9, CAST(FLOOR(
                    (value - (SELECT lo FROM r))
                    / (((SELECT hi FROM r) - (SELECT lo FROM r)) / 10)
                  ) AS INT)) END AS bin,
             SUM(ia) AS n_first,
             SUM(1 - ia) AS n_second
      FROM lab GROUP BY 1
    ),
    tot AS (SELECT SUM(n_first) AS ta, SUM(n_second) AS tb FROM binned)
    SELECT bin,
           CAST(n_first AS BIGINT) AS n_first,
           CAST(n_second AS BIGINT) AS n_second,
           ROUND(
             ((CAST(n_first AS DOUBLE) + 1.0) / (CAST(ta AS DOUBLE) + 10.0)
              - (CAST(n_second AS DOUBLE) + 1.0) / (CAST(tb AS DOUBLE) + 10.0))
             * (ROUND(LN((CAST(n_first AS DOUBLE) + 1.0)
                         / (CAST(ta AS DOUBLE) + 10.0)), 8)
                - ROUND(LN((CAST(n_second AS DOUBLE) + 1.0)
                           / (CAST(tb AS DOUBLE) + 10.0)), 8)),
             8) AS psi_term
    FROM binned, tot
    ORDER BY bin
    """,
    doc="Population Stability Index contingency over 10 fixed-width "
    "bins of the global value range, events before vs after the time "
    "midpoint, Laplace-smoothed; sum(psi_term) IS the PSI.  One "
    "map-side-combinable scan to a 10-row table.",
)
def drift_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return psi_fixed_bins(
        _halved_events(spark, sf_dir).select("value", "__first"),
        "value",
        "__first",
        n_bins=10,
    )


@register(
    "drift_term_logodds",
    """
    WITH toks AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS ia,
             unnest(string_split(
               trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok AS term, SUM(ia) AS n_first, SUM(1 - ia) AS n_second
      FROM toks WHERE tok <> '' GROUP BY tok
    ),
    tot AS (SELECT SUM(n_first) AS ta, SUM(n_second) AS tb FROM vocab)
    SELECT term,
           CAST(n_first AS BIGINT) AS n_first,
           CAST(n_second AS BIGINT) AS n_second,
           ROUND(
             ROUND(LN((CAST(n_first AS DOUBLE) + 0.5)
                      / (CAST(ta AS DOUBLE) - n_first + 0.5)), 8)
             - ROUND(LN((CAST(n_second AS DOUBLE) + 0.5)
                        / (CAST(tb AS DOUBLE) - n_second + 0.5)), 8),
             8) AS log_odds
    FROM vocab, tot
    WHERE n_first + n_second >= 20
    ORDER BY ABS(ROUND(
             ROUND(LN((CAST(n_first AS DOUBLE) + 0.5)
                      / (CAST(ta AS DOUBLE) - n_first + 0.5)), 8)
             - ROUND(LN((CAST(n_second AS DOUBLE) + 0.5)
                        / (CAST(tb AS DOUBLE) - n_second + 0.5)), 8),
             8)) DESC, term
    LIMIT 25
    """,
    doc="Vocabulary drift: top-25 terms by |log-odds| (Haldane +0.5 "
    "smoothing, Monroe et al. 'Fightin' Words' uninformative-prior "
    "form) between English and non-English documents.  Exploded-token "
    "aggregate to a sublinear vocab table, then TakeOrdered top-k; "
    "ln() values snap to the 1e-8 grid so both engines rank "
    "identically.",
)
def drift_term_logodds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return log_odds_terms(
        docs.withColumn("__ia", F.col("lang") == F.lit("en")),
        "text",
        "doc_id",
        "__ia",
        k=25,
        min_count=20,
    )


@register(
    "drift_chi2_lang_source",
    """
    WITH d AS (
      SELECT source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    obs AS (SELECT source, y, COUNT(*) AS o FROM d GROUP BY source, y),
    rt AS (SELECT source, COUNT(*) AS r FROM d GROUP BY source),
    ct AS (SELECT y, COUNT(*) AS c FROM d GROUP BY y),
    n AS (SELECT COUNT(*) AS n FROM d),
    grid AS (
      SELECT rt.source, ct.y, rt.r, ct.c, n.n,
             COALESCE(obs.o, 0) AS o
      FROM rt CROSS JOIN ct CROSS JOIN n
      LEFT JOIN obs ON obs.source = rt.source AND obs.y = ct.y
    ),
    terms AS (
      SELECT ROUND(
               (o - CAST(r AS DOUBLE) * c / n)
               * (o - CAST(r AS DOUBLE) * c / n)
               / (CAST(r AS DOUBLE) * c / n), 9) AS t,
             n
      FROM grid
    )
    SELECT ROUND(CAST(SUM(CAST(t AS DECIMAL(38,10))) AS DOUBLE), 9)
             AS chi2,
           CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
             * CAST((SELECT COUNT(*) FROM ct) - 1 AS BIGINT) AS dof,
           CAST(MAX(n) AS BIGINT) AS n_docs
    FROM terms
    """,
    doc="Pearson chi-squared independence test of document source vs "
    "the is-English label: the full contingency grid is the CROSS "
    "PRODUCT of the two marginal tables (both bounded by category "
    "cardinality, never corpus size) left-joined to observed counts so "
    "zero cells still contribute their expected mass.  Expected counts "
    "come from exact integer marginals; per-cell terms snap to the "
    "1e-9 grid and accumulate in decimal so the statistic is "
    "order-independent across engines and partitionings.",
)
def drift_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.queries.numeric import dsum

    d = load(spark, sf_dir, "documents").select(
        "source", (F.col("lang") == "en").cast("int").alias("y")
    )
    obs = d.groupBy("source", "y").agg(F.count(F.lit(1)).alias("o"))
    rt = d.groupBy("source").agg(F.count(F.lit(1)).alias("r"))
    ct = d.groupBy("y").agg(F.count(F.lit(1)).alias("c"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .join(obs, ["source", "y"], "left")
        .select(
            "source",
            "y",
            "r",
            "c",
            "n",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    exp = F.col("r").cast("double") * F.col("c") / F.col("n")
    t = F.round((F.col("o") - exp) * (F.col("o") - exp) / exp, 9)
    dof = (
        rt.agg(F.count(F.lit(1)).alias("__nr"))
        .crossJoin(ct.agg(F.count(F.lit(1)).alias("__nc")))
        .select(
            ((F.col("__nr") - 1) * (F.col("__nc") - 1))
            .cast("long")
            .alias("dof")
        )
    )
    return (
        grid.select(t.alias("__t"), "n")
        .agg(
            F.round(dsum("__t", 9), 9).alias("chi2"),
            F.max("n").cast("long").alias("n_docs"),
        )
        .crossJoin(F.broadcast(dof))
        .select("chi2", "dof", "n_docs")
    )
