"""Fuzzy record-linkage primitives: blocked edit-distance candidate
pairs over a canonicalized value dictionary.

The standard entity-resolution shape: canonicalize (distinct values +
occurrence weights), block (cheap equi-key bounds the candidate set),
compare (banded Levenshtein inside the block only).  All-pairs
comparison is never materialized — the same tractability argument as
LSH banding and SemDeDup clustering, with the block key in the role of
the bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def blocked_fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    block: Column,
    max_dist: int = 4,
    min_dist: int = 1,
) -> DataFrame:
    """Candidate near-match pairs among the DISTINCT values of
    ``text_col`` sharing a block key, at edit distance in
    ``[min_dist, max_dist]``.

    ``block`` is a Column expression over the canonicalized ``value``
    column (e.g. ``F.split(F.col("value"), " ")[0]`` for first-token
    blocking) — it is evaluated on the dictionary, not the raw rows.

    Returns (value_a, value_b, edit_dist, n_a, n_b) with
    ``value_a < value_b``; ``n_*`` are the occurrence counts of each
    value in ``df``, so downstream canonicalization can merge the rarer
    spelling into the dominant one without re-scanning the input.

    Scale shape: the dictionary aggregate is the only pass over the
    data (map-side combinable, |distinct values| output rows — for
    name-like columns that is orders of magnitude below the row count).
    The pair join is an equi-join on the block key; Spark's banded
    ``levenshtein(l, r, threshold)`` early-exits at ``max_dist + 1``
    cost per comparison (O(len·k), not O(len²)) and returns -1 above
    the threshold, so the band filter is one predicate.  A skewed block
    (one giant key) inherits the usual medicine: refine the block key
    (add a length bucket or second token) or salt + re-merge; AQE
    skew-join splits oversized partitions at runtime.
    """
    vals = (
        df.groupBy(F.col(text_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("value", block.alias("__blk"), "n")
    )
    a = vals.select(
        F.col("value").alias("value_a"),
        F.col("__blk"),
        F.col("n").alias("n_a"),
    )
    b = vals.select(
        F.col("value").alias("value_b"),
        F.col("__blk"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(b, "__blk")
        .where(F.col("value_a") < F.col("value_b"))
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("value_a"), F.col("value_b"), max_dist),
        )
        .where(F.col("edit_dist").between(min_dist, max_dist))
        .select("value_a", "value_b", "edit_dist", "n_a", "n_b")
    )


def fs_em_params(
    pairs: DataFrame,
    agree_cols: list[str],
    iters: int = 10,
) -> DataFrame:
    """Unsupervised Fellegi-Sunter parameter estimation by EM over
    blocked comparison vectors — the algorithm behind Splink-style
    probabilistic linkage (Winkler 1988): estimates, per field, the
    match/non-match agreement probabilities m_f = P(agree | match) and
    u_f = P(agree | non-match) plus the overall match share lambda,
    with NO labeled pairs.

    Input: ``pairs`` with one 0/1 ``agree_cols`` column per compared
    field (other columns ignored).  Output: one row per field —
    (field, m_prob, u_prob, match_share, match_weight,
    nonmatch_weight); the weights are the ln(m/u) / ln((1-m)/(1-u))
    log-odds that score pairs downstream, making
    ``dedup_fs_linkage_scores``' fixed-m form fully data-driven.

    Scale shape — the Splink architecture: the ONLY pass over the pair
    set is a groupBy on the agreement pattern (map-side combinable,
    <= 2^F output rows for F fields); EM then iterates on that bounded
    pattern table driver-side.  The collect is 2^F rows by
    construction, never pair-scaled.

    Engine-exact by the corpus' fixed-point convention: every
    responsibility snaps to the 1e-9 grid and enters the M-step as a
    SCALED INTEGER times the pattern count, so per-iteration sums are
    exact integer arithmetic; the few double ops (E-step products and
    ratio, M-step divisions, the clamp) are identical literal
    sequences on both engines, so a SQL oracle replays all ``iters``
    rounds as unrolled CTEs bit-for-bit.  Probabilities clamp to
    [1e-9, 1 - 1e-9] so the log-odds stay finite even if a field
    agrees (or disagrees) in every resolved pair.
    """
    import math

    counts = (
        pairs.groupBy(*agree_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    pats = [
        (tuple(int(r[c]) for c in agree_cols), int(r["__n"]))
        for r in counts
    ]
    n_pairs = sum(n for _, n in pats)
    G = 1_000_000_000  # 1e-9 snap grid, the scaled_long convention

    def snap(x: float) -> float:
        return math.floor(x * G + 0.5) / G

    def clamp(x: float) -> float:
        return min(max(x, 1e-09), 1.0 - 1e-09)

    def rnd6(x: float) -> float:
        # DuckDB ROUND: half away from zero on the scaled double
        return math.copysign(
            math.floor(abs(x) * 1000000.0 + 0.5), x
        ) / 1000000.0

    lam = 0.1
    m = {f: 0.9 for f in agree_cols}
    u = {f: 0.1 for f in agree_cols}
    for _ in range(iters):
        sp = 0  # sum of scaled responsibilities (exact int)
        spf = {f: 0 for f in agree_cols}
        suf = {f: 0 for f in agree_cols}
        for gamma, n in pats:
            w = lam
            v = 1.0 - lam
            for f, g in zip(agree_cols, gamma):
                w = w * (m[f] if g else 1.0 - m[f])
                v = v * (u[f] if g else 1.0 - u[f])
            ps = int(math.floor((w / (w + v)) * G + 0.5))
            sp += ps * n
            for f, g in zip(agree_cols, gamma):
                if g:
                    spf[f] += ps * n
                    suf[f] += (G - ps) * n
        # Clamp the scaled responsibility mass away from the saturation
        # points: if every pattern responsibility snapped to 0 (or 1)
        # on the 1e-9 grid, sp would hit 0 (or G*n_pairs) and the m/u
        # updates below would divide by zero.  Mirrored exactly in the
        # unrolled-CTE oracle (queries/dedup.py _fs_em_sql).
        sp = min(max(sp, 1), G * n_pairs - 1)
        su = G * n_pairs - sp
        lam = clamp(snap(float(sp) / 1000000000.0 / float(n_pairs)))
        m = {
            f: clamp(snap(float(spf[f]) / float(sp))) for f in agree_cols
        }
        u = {
            f: clamp(snap(float(suf[f]) / float(su))) for f in agree_cols
        }
    rows = [
        (
            f,
            m[f],
            u[f],
            lam,
            rnd6(math.log(m[f] / u[f])),
            rnd6(math.log((1.0 - m[f]) / (1.0 - u[f]))),
        )
        for f in agree_cols
    ]
    return pairs.sparkSession.createDataFrame(
        rows,
        "field string, m_prob double, u_prob double, match_share double,"
        " match_weight double, nonmatch_weight double",
    )
