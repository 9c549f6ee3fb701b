"""Distribution-drift diagnostics for training-data pipelines.

Three standard drift lenses, each shaped for 100 TB:

* ``ks_two_sample`` — exact two-sample Kolmogorov-Smirnov statistic.
  The ECDF difference is evaluated at every distinct value via the
  distributed prefix sum (``operators/sweep.py``) — no global
  single-partition window, no sort of the raw data.  The supremum is
  computed over INTEGER cross-multiples (``|ca*nb - cb*na|``), so the
  max is exact; only the final normalization divides.

* ``psi_fixed_bins`` — Population Stability Index over fixed-width
  bins with Laplace smoothing: one scan to the (bin, half) contingency
  table (map-side combinable), bounded output.  The industry-standard
  "did this feature shift between snapshots" number.

* ``log_odds_terms`` — vocabulary drift between two document groups:
  per-term log-odds with Haldane (+0.5) smoothing (the Monroe et al.
  2008 "Fightin' Words" statistic, uninformative-prior form), top-k by
  absolute effect.  Exploded-token aggregate plus a TakeOrdered top-k;
  the vocabulary table is the only intermediate and it is sublinear in
  corpus size.

Determinism: all counts are exact integers; every ``ln`` is rounded to
the 1e-8 grid immediately (the corpus' bigram-NLL convention), so both
engines rank and hash identical values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from heparchy_spark.operators.sweep import prefix_sum


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    is_first_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """One row (n_a, n_b, ks_stat): sup-norm ECDF distance between the
    ``is_first_col`` = true sample (A) and the rest (B).

    Scale note: the cross-multiples are 64-bit; exact up to
    ``min(n_a, n_b) * max(n_a, n_b) < 2^63`` (~3e9 rows per side) —
    beyond that, switch the final compare to decimal.
    """
    ia = F.col(is_first_col).cast("long")
    pv = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.sum(ia).alias("__da"),
        F.sum(F.lit(1) - ia).alias("__db"),
    )
    cum = prefix_sum(pv, "__v", ["__da", "__db"], n_buckets=n_buckets)
    n = cum.agg(
        F.max("__da_cum").alias("__na"), F.max("__db_cum").alias("__nb")
    )
    return (
        cum.crossJoin(F.broadcast(n))
        .agg(
            F.max("__na").alias("n_a"),
            F.max("__nb").alias("n_b"),
            F.round(
                F.max(
                    F.abs(
                        F.col("__da_cum") * F.col("__nb")
                        - F.col("__db_cum") * F.col("__na")
                    )
                ).cast("double")
                / (F.max("__na") * F.max("__nb")),
                9,
            ).alias("ks_stat"),
        )
    )


def psi_fixed_bins(
    df: DataFrame,
    value_col: str,
    is_first_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n_first, n_second, psi_term) over fixed-width bins of the
    GLOBAL value range; ``sum(psi_term)`` is the PSI.  Laplace (+1)
    smoothing keeps empty bins finite — and every one of the ``n_bins``
    bins emits a row (counts joined onto a 0..n_bins-1 spine), because
    a bin empty in BOTH halves still carries a nonzero smoothed term
    whenever the two halves' totals differ; dropping it would bias the
    statistic low."""
    v = F.col(value_col)
    bounds = df.agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
    ia = F.col(is_first_col).cast("long")
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(n_bins - 1),
                    F.floor(
                        (v - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / F.lit(n_bins))
                    ).cast("int"),
                )
            ),
        )
        .groupBy("bin")
        .agg(
            F.sum(ia).alias("n_first"),
            F.sum(F.lit(1) - ia).alias("n_second"),
        )
    )
    spine = df.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    binned = spine.join(binned, "bin", "left").select(
        "bin",
        F.coalesce("n_first", F.lit(0)).alias("n_first"),
        F.coalesce("n_second", F.lit(0)).alias("n_second"),
    )
    tot = binned.agg(
        F.sum("n_first").alias("__ta"), F.sum("n_second").alias("__tb")
    )
    p = F.col("n_first").cast("double") + F.lit(1.0)
    q = F.col("n_second").cast("double") + F.lit(1.0)
    pa = p / (F.col("__ta") + F.lit(float(n_bins)))
    pb = q / (F.col("__tb") + F.lit(float(n_bins)))
    return (
        binned.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_first",
            "n_second",
            F.round(
                (pa - pb) * (F.round(F.log(pa), 8) - F.round(F.log(pb), 8)),
                8,
            ).alias("psi_term"),
        )
        .orderBy("bin")
    )



def jsd_fixed_bins(
    df: DataFrame,
    value_col: str,
    is_first_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n_first, n_second, jsd_term) over fixed-width bins of the
    GLOBAL value range; ``sum(jsd_term)`` is the Jensen-Shannon
    divergence (base e, in [0, ln 2]) between the first/second halves'
    smoothed bin distributions — the bounded, symmetric complement to
    PSI (which explodes on near-empty bins) and KS (rank-only).

    Same determinism conventions as :func:`psi_fixed_bins`: Laplace
    (+1) smoothing on a full bin spine, probabilities are single
    double divisions of exact ints, every LN is rounded to 8 decimals
    before combining (masks libm ulp differences across engines), and
    the term itself rounds to 8 — a SQL oracle writing the same
    expression tree reproduces it bit-for-bit.

    Scale shape: one map-side-combinable scan to an ``n_bins``-row
    table, two scalar broadcasts (range bounds, totals).
    """
    v = F.col(value_col)
    bounds = df.agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
    ia = F.col(is_first_col).cast("long")
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(n_bins - 1),
                    F.floor(
                        (v - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / F.lit(n_bins))
                    ).cast("int"),
                )
            ),
        )
        .groupBy("bin")
        .agg(
            F.sum(ia).alias("n_first"),
            F.sum(F.lit(1) - ia).alias("n_second"),
        )
    )
    spine = df.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    binned = spine.join(binned, "bin", "left").select(
        "bin",
        F.coalesce("n_first", F.lit(0)).alias("n_first"),
        F.coalesce("n_second", F.lit(0)).alias("n_second"),
    )
    tot = binned.agg(
        F.sum("n_first").alias("__ta"), F.sum("n_second").alias("__tb")
    )
    pa = (F.col("n_first").cast("double") + F.lit(1.0)) / (
        F.col("__ta") + F.lit(float(n_bins))
    )
    pb = (F.col("n_second").cast("double") + F.lit(1.0)) / (
        F.col("__tb") + F.lit(float(n_bins))
    )
    m = (pa + pb) / F.lit(2.0)
    rln = lambda x: F.round(F.log(x), 8)  # noqa: E731
    term = (
        F.lit(0.5) * pa * (rln(pa) - rln(m))
        + F.lit(0.5) * pb * (rln(pb) - rln(m))
    )
    return (
        binned.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_first",
            "n_second",
            # + 0.0 normalizes IEEE -0.0 (a tiny negative term rounded
            # away) to +0.0 so both engines hash identically
            (F.round(term, 8) + F.lit(0.0)).alias("jsd_term"),
        )
        .orderBy("bin")
    )


def log_odds_terms(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    is_first_col: str,
    k: int = 25,
    min_count: int = 20,
) -> DataFrame:
    """Top-``k`` drifted terms between the two document groups by
    |log-odds| with Haldane smoothing: (term, n_first, n_second,
    log_odds), ordered by effect size desc, term asc."""
    from heparchy_spark.operators.text import token_stream

    flagged = docs.select(
        F.col(id_col), F.col(text_col), F.col(is_first_col).alias("__ia")
    )
    toks = token_stream(flagged, text_col, id_col).join(
        flagged.select(F.col(id_col).alias("__id"), "__ia"), "__id"
    )
    ia = F.col("__ia").cast("long")
    vocab = toks.groupBy(F.col("__tok").alias("term")).agg(
        F.sum(ia).alias("n_first"),
        F.sum(F.lit(1) - ia).alias("n_second"),
    )
    tot = vocab.agg(
        F.sum("n_first").alias("__ta"), F.sum("n_second").alias("__tb")
    )
    a = F.col("n_first").cast("double")
    b = F.col("n_second").cast("double")
    la = F.round(
        F.log((a + 0.5) / (F.col("__ta") - a + 0.5)), 8
    )
    lb = F.round(
        F.log((b + 0.5) / (F.col("__tb") - b + 0.5)), 8
    )
    return (
        vocab.where(F.col("n_first") + F.col("n_second") >= min_count)
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "n_first",
            "n_second",
            F.round(la - lb, 8).alias("log_odds"),
        )
        .orderBy(F.abs(F.col("log_odds")).desc(), F.col("term"))
        .limit(k)
    )


def wasserstein_1d(
    df: DataFrame,
    value_col: str,
    is_first_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """One row (n_a, n_b, w1_dist): exact 1-D Wasserstein (earth
    mover's) distance between the ``is_first_col`` = true sample (A)
    and the rest (B) — the integral of |ECDF_A - ECDF_B|, the
    magnitude-bearing companion to KS's supremum (KS says the
    distributions differ; W1 says by how much, in value units).

    Exactness: W1 = sum over consecutive distinct values of
    (next_v - v) * |ca*nb - cb*na| / (na*nb) with INTEGER
    cross-multiples (the ks_two_sample convention; same < 2^63
    envelope), per-term round-9 + decimal accumulation so the sum is
    order-independent and engine-identical.

    Scale shape: cumulative counts come from the distributed prefix
    sum; the successor value comes from the SAME two-level bucket
    decomposition (in-bucket lead windows + a <= n_buckets-row
    boundary table) — no step is serial in more than ``n_buckets``
    rows, no global sort of the distinct-value table.
    """
    from heparchy_spark.queries.numeric import dsum

    ia = F.col(is_first_col).cast("long")
    pv = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.sum(ia).alias("__da"),
        F.sum(F.lit(1) - ia).alias("__db"),
    )
    cum = prefix_sum(pv, "__v", ["__da", "__db"], n_buckets=n_buckets)
    # re-bucket with prefix_sum's own equi-width rule for the
    # distributed successor: in-bucket lead + next-bucket-min boundary
    o = F.col("__v")
    bounds = cum.agg(F.min(o).alias("__lo"), F.max(o).alias("__hi"))
    bucketed = cum.crossJoin(F.broadcast(bounds)).withColumn(
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
    from pyspark.sql import Window

    w_in = Window.partitionBy("__b").orderBy("__v")
    bmin = bucketed.groupBy("__b").agg(F.min("__v").alias("__bv"))
    w_b = Window.partitionBy().orderBy("__b")
    bnext = bmin.select(
        "__b", F.lead("__bv").over(w_b).alias("__nextb_v")
    )
    stepped = (
        bucketed.withColumn("__lead_v", F.lead("__v").over(w_in))
        .join(F.broadcast(bnext), "__b")
        .withColumn(
            "__next_v",
            F.coalesce("__lead_v", "__nextb_v", F.col("__v")),
        )
    )
    n = cum.agg(
        F.max("__da_cum").alias("__na"), F.max("__db_cum").alias("__nb")
    )
    term = F.round(
        (F.col("__next_v") - F.col("__v"))
        * F.abs(
            F.col("__da_cum") * F.col("__nb")
            - F.col("__db_cum") * F.col("__na")
        ).cast("double")
        / (F.col("__na").cast("double") * F.col("__nb")),
        9,
    )
    return (
        stepped.crossJoin(F.broadcast(n))
        .agg(
            F.max("__na").alias("n_a"),
            F.max("__nb").alias("n_b"),
            dsum(term, 9).alias("w1_dist"),
        )
    )
