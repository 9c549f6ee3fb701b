"""Property tests for the round-4 late-session corpus queries: Markov
row-normalization, KM survival monotonicity, NDCG weight table, and the
merge == recompute identity on synthetic frames."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_markov_rows_normalize(spark):
    from heparchy_spark.queries import spark_queries

    rows = spark_queries()["events_markov_transitions"](spark, SF).collect()
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r.src] = by_src.get(r.src, 0.0) + r.prob
        assert 0.0 < r.prob <= 1.0
    # round-9 per-cell rounding: row sums within 1e-8 * |types| of 1
    assert by_src and all(abs(s - 1.0) < 1e-7 for s in by_src.values())


def test_kaplan_meier_monotone_nonincreasing(spark):
    from heparchy_spark.queries import spark_queries

    rows = sorted(
        spark_queries()["events_kaplan_meier"](spark, SF).collect(),
        key=lambda r: r.lifetime_days,
    )
    assert rows
    last = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= last + 1e-9
        last = r.survival
        assert r.n_at_risk >= r.n_churned


def test_ndcg_weight_table_matches_definition():
    from heparchy_spark.queries.text import _ndcg_weights

    wt, cum = _ndcg_weights()
    assert [rk for rk, _ in wt] == list(range(1, 11))
    for rk, w in wt:
        assert abs(w - 1.0 / math.log2(rk + 1)) < 5e-9
    # prefix sums are exact over the round-8 weights
    acc = 0.0
    assert cum[0] == (0, 0.0)
    for (rk, w), (n, c) in zip(wt, cum[1:]):
        acc = round(acc + w, 10)
        assert n == rk and abs(c - acc) < 1e-9


def test_incremental_merge_equals_recompute(spark):
    from heparchy_spark.queries import spark_queries

    qs = spark_queries()
    merged = {
        r.day: (r.n_orders, r.total_value)
        for r in qs["agg_incremental_merge"](spark, SF).collect()
    }
    from heparchy_spark.queries.numeric import dsum
    from heparchy_spark.queries.tables import load

    full = {
        r.day: (r.n_orders, r.total_value)
        for r in load(spark, SF, "orders")
        .groupBy(
            F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.round(F.col("o_totalprice"), 2), 2).alias("total_value"),
        )
        .collect()
    }
    assert merged == full


def test_ab_ztest_counts_consistent(spark):
    from heparchy_spark.queries import spark_queries

    r = spark_queries()["events_ab_ztest"](spark, SF).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    assert abs(r.rate_a - round(r.conv_a / r.n_a, 6)) < 1e-9
    if r.z_score is not None:
        assert (r.rate_a >= r.rate_b) == (r.z_score >= 0)
