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
