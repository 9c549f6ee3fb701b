"""Physical-layout operators: bucketed co-located joins must run with zero
shuffles; salted aggregation/join must equal their unsalted results."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from heparchy_spark.operators.layout import (
    bucketed_join_ready,
    salted_groupby_count,
    salted_join,
    write_bucketed,
)
from heparchy_spark.plans import shuffle_count
from heparchy_spark.queries.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_zero_shuffle(spark):
    o = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    write_bucketed(o, "t_orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        num_buckets=8,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join_ready(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        n = joined.count()
        assert n == li.count()  # every lineitem has its order
        assert shuffle_count(joined) == 0  # co-located: no exchanges
        # the same join on plain parquet shuffles both sides
        plain = o.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        plain.count()
        assert shuffle_count(plain) >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salted_groupby_count_matches_plain(spark):
    li = load(spark, SF_DIR, "lineitem")
    got = {
        r["l_orderkey"]: r["n"]
        for r in salted_groupby_count(li, "l_orderkey", factor=8).collect()
    }
    want = {
        r["l_orderkey"]: r["cnt"]
        for r in li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    got = salted_join(li, o, "l_orderkey", factor=4)
    want = li.join(o, "l_orderkey")
    assert got.count() == want.count()
    g = got.agg(F.sum("l_quantity"), F.sum("o_totalprice")).first()
    w = want.agg(F.sum("l_quantity"), F.sum("o_totalprice")).first()
    assert g[0] == pytest.approx(w[0]) and g[1] == pytest.approx(w[1])


def test_salt_is_content_stable_and_spreads(spark):
    # Re-running the same salted aggregation twice yields identical results
    # (content-derived salt, no rand/monotonic id), and a hot key's rows
    # actually spread across salts.
    import pyspark.sql.functions as F

    from heparchy_spark.operators.layout import _salt, salted_groupby_count

    df = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("payload")
    )
    a = {r["k"]: r["n"] for r in salted_groupby_count(df, "k", 8).collect()}
    b = {r["k"]: r["n"] for r in salted_groupby_count(df, "k", 8).collect()}
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    assert a == b == plain
    n_salts = (
        df.withColumn("s", _salt(df, 8))
        .where(F.col("k") == 0)
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts == 8  # hot key spread over every salt bucket


def test_salted_join_rerun_identical(spark):
    import pyspark.sql.functions as F

    from heparchy_spark.operators.layout import salted_join

    skewed = spark.range(0, 3000).select(
        F.when(F.col("id") < 2800, F.lit(7)).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    c1 = salted_join(skewed, small, "k", factor=4).count()
    c2 = salted_join(skewed, small, "k", factor=4).count()
    plain = skewed.join(small, "k").count()
    assert c1 == c2 == plain
