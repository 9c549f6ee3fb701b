"""TPC-H queries 2,8,9,11,12,13,15,16,17,19,20,21,22 — completing the
22-query suite (q1,3,4,5,6,7,10,14,18 live in ``relational.py``).

The driver's star schema is a REDUCED TPC-H (TESTDATA.md): no ``partsupp``
table, no commit/receipt dates, no containers/phones/comments.  Queries
that need those are ADAPTED, keeping the plan shape that makes each query
interesting (correlated subqueries, multi-alias EXISTS/NOT EXISTS,
disjunctive pushdown, scalar subqueries) while substituting available
columns.  Every adaptation is documented on the query.  The supply
relation for q2/q16/q20 is derived as ``distinct (l_partkey, l_suppkey)``
from lineitem — "supplier S supplies part P" evidence — with unit cost
``min(l_extendedprice / l_quantity)`` standing in for ``ps_supplycost``.

Scale notes: nation/region (fixed 25/5 rows at every SF) carry explicit
broadcast hints, declared per-query via ``expects_broadcast``; supplier,
part and every orders/customer-derived frame GROW with SF, so their
joins are unhinted — an explicit hint is honored at any size (AQE never
demotes one) and hard-fails above Spark's 8 GB broadcast cap, while an
unhinted join lets AQE pick BHJ exactly while the side fits and SMJ
beyond it (the measured q18 10x transition).  Correlated subqueries
are hand-decorrelated in the DataFrame API into aggregate+join — the same
rewrite Catalyst/DuckDB performs — so the Spark plan is explicitly the
scalable one (no per-row re-execution semantics to trust an optimizer
with).  Double aggregates go through ``queries.numeric`` (exact decimal
accumulation + grid rounding) so value hashes match DuckDB bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.queries import register
from heparchy_spark.queries.numeric import davg, dsum, sql_davg, sql_dsum
from heparchy_spark.queries.tables import load


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived supply relation: (l_partkey, l_suppkey, unit_cost).

    Stand-in for the absent ``partsupp``: a supplier supplies a part iff a
    lineitem links them; unit cost = min observed unit price (rounded to
    6dp — identical doubles on both engines, so equality joins on it are
    exact).  One shuffle on the (partkey, suppkey) pair, combinable
    map-side.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6
        ).alias("unit_cost")
    )


_SQL_SUPPLY = """
    SELECT l_partkey, l_suppkey,
           ROUND(MIN(l_extendedprice / l_quantity), 6) AS unit_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
"""


@register(
    "q2_min_cost_supplier",
    f"""
    WITH supply AS ({_SQL_SUPPLY})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM part
    JOIN supply   ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND unit_cost = (
        SELECT MIN(unit_cost) FROM supply s2
        JOIN supplier sp ON sp.s_suppkey = s2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = sp.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE s2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    """,
    doc="TPC-H Q2 (adapted: supply relation derived from lineitem, "
    "unit_cost = min unit price — no partsupp in the driver schema): "
    "min-cost supplier per part in a region. The correlated MIN is "
    "decorrelated to a per-part aggregate joined back on (partkey, cost); "
    "nation/region (fixed dims) are hinted; supplier scales with SF so "
    "its join is left to AQE sizing.",
    expects_broadcast="nation/region fixed dims (25/5 rows at every SF)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    # Two consumers (per-part min + the equality join back) would re-run
    # the lineitem aggregation; the supply relation is one row per
    # (part, supplier) pair in-region — small enough to stage
    # (same multi-consumer persist rationale as the MinHash staging).
    # Contract: the returned plan holds this persisted intermediate;
    # long-lived sessions reclaim it via spark.catalog.clearCache() after
    # materializing (bench.py does so per run) — same caller-managed
    # storage contract as pagerank / connected_components.
    eu_supply = (
        _supply(spark, sf_dir)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .persist()
    )
    min_cost = eu_supply.groupBy(
        F.col("l_partkey").alias("__mc_pk")
    ).agg(F.min("unit_cost").alias("__min_cost"))
    return (
        p.where((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .join(eu_supply, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            min_cost,
            (F.col("__mc_pk") == F.col("p_partkey"))
            & (F.col("unit_cost") == F.col("__min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost"
        )
    )


@register(
    "q8_market_share",
    f"""
    WITH all_nations AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           ROUND({sql_dsum("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END")}
                 / {sql_dsum('volume')}, 6) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
    doc="TPC-H Q8 (constants adapted to the driver's value domain): "
    "NATION_5's share of ECONOMY-part volume sold into ASIA per year. "
    "Only the fixed nation/region dims are hinted; part/supplier scale "
    "with SF so those joins are left to AQE. The two fact shuffles are "
    "lineitem-orders and orders-customer.",
    expects_broadcast="nation projections + region (fixed dims)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    n1 = n.select("n_nationkey", "n_regionkey")
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(
            p.where(F.col("p_type") == "ECONOMY"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .join(F.broadcast(n2), F.col("s_nk") == F.col("s_nationkey"))
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        F.lit(0.0)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(dsum(nation_vol) / dsum(vol), 6).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {sql_dsum(
               'l_extendedprice * (1 - l_discount)'
               ' - 0.5 * p_retailprice * l_quantity')} AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 (adapted: cost = 0.5 * p_retailprice * l_quantity — no "
    "ps_supplycost in the driver schema; 0.5 is exactly representable so "
    "per-row doubles match DuckDB bit-for-bit): profit on red parts by "
    "supplier nation and year. Only nation (fixed dim) is hinted — part "
    "and supplier scale with SF; profit accumulates "
    "in decimal for engine-independent hashes.",
    expects_broadcast="nation fixed dim (25 rows at every SF)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(
            p.where(F.col("p_name").like("%red%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    f"""
    WITH pv AS (
      SELECT l_partkey AS partkey,
             {sql_dsum('l_quantity * p_retailprice', 2)} AS part_value
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT partkey, part_value FROM pv
    WHERE part_value > (SELECT ROUND({sql_davg('part_value')} * 1.5, 6) FROM pv)
    """,
    doc="TPC-H Q11 (adapted: inventory value = shipped quantity x retail "
    "price over lineitem — no partsupp; threshold = 1.5x the AVERAGE "
    "part value rather than a fixed fraction of the total, so the "
    "selectivity is stable at every scale factor): parts representing a "
    "significant share of one nation's shipped value. The scalar "
    "subquery is a single-row broadcast-joined aggregate, the cross-"
    "join-with-one-row pattern. Only nation (fixed dim) and the 1-row "
    "threshold are hinted; part/supplier scale with SF.",
    expects_bnlj=True,
    expects_broadcast="nation fixed dim + 1-row threshold aggregate",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    pv = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            dsum(F.col("l_quantity") * F.col("p_retailprice"), 2).alias(
                "part_value"
            )
        )
    )
    total = pv.agg(
        F.round(davg("part_value") * 1.5, 6).alias("__threshold")
    )
    return (
        pv.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("__threshold"))
        .select("partkey", "part_value")
    )


@register(
    "q12_late_priority_lines",
    """
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 (adapted: 'late' = shipped >60 days after order — no "
    "commit/receipt dates; l_returnflag stands in for l_shipmode): count "
    "of late lines by priority class. One fact-fact shuffle on orderkey; "
    "the conditional counts are map-side combinable.",
)
def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 (adapted: excluded order class = '4-NOT SPECIFIED' "
    "priority — no comment column to pattern-match): order-count "
    "histogram over customers, including zero-order customers via the "
    "left join. Two shuffles (custkey join+count, then tiny count "
    "histogram).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.where(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue. The revenue view "
    "computes once (persisted) and feeds both the max scalar subquery and "
    "the equality filter; dsum grid-rounding makes the double equality "
    "engine-independent. Only the 1-row max aggregate is hinted; "
    "supplier scales with SF so its join is left to AQE.",
    expects_broadcast="1-row max-revenue aggregate",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    # Two consumers (max scalar + the equality filter) — persist the tiny
    # per-supplier view so the lineitem quarter scan runs once (the same
    # multi-consumer staging as q2/minhash; bench clears cache per run).
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
        .persist()
    )
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_cnt",
    f"""
    WITH supply AS ({_SQL_SUPPLY})
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM supply
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (adapted: supply relation from lineitem; excluded "
    "suppliers = negative account balance — no comment column for the "
    "complaints pattern): supplier diversity per part attribute group. "
    "The NOT IN decorrelates to an anti-join; the excluded set and the "
    "part filter both scale with SF, so neither is hinted (AQE "
    "broadcasts them while they fit); count(distinct) expands two-phase.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        _supply(spark, sf_dir)
        .join(
            p.where(
                (F.col("p_brand") != "Brand#1")
                & (F.col("p_type") != "PROMO")
                & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            bad,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    f"""
    SELECT ROUND({sql_dsum('l_extendedprice', 2)} / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size < 10
      AND l_quantity < (
        SELECT 0.2 * {sql_davg('l_quantity')}
        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
      )
    """,
    doc="TPC-H Q17 (adapted: part filter = brand + small size — no "
    "container column): revenue lost to small-quantity orders. The "
    "correlated per-part average decorrelates to a per-partkey aggregate "
    "joined back; the filtered part table and the per-partkey aggregate "
    "both scale with SF, so neither is hinted (AQE sizes them); davg "
    "grid-rounding keeps the threshold comparison engine-independent.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    target = p.where((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10))
    per_part_avg = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.2) * davg("l_quantity")).alias("__qty_threshold")
    )
    return (
        li.join(target, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part_avg, F.col("__pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("__qty_threshold"))
        .agg(
            F.round(dsum("l_extendedprice", 2) / 7.0, 6).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19 (adapted: size ranges replace the container lists): "
    "disjunctive brand/size/quantity predicate over the part join. The "
    "common p_size <= 15 bound pushes to the part scan; part scales "
    "with SF so the join is unhinted (AQE sizes it); the OR "
    "evaluates post-join without a second pass.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return (
        li.join(
            p.where(F.col("p_size").between(1, 15)),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .where(branch)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q20_promotion_suppliers",
    f"""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%blue%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING {sql_dsum('l_quantity', 2)} > 100
      )
    """,
    doc="TPC-H Q20 (adapted: qualification = shipped >100 units of blue "
    "parts in 1997, via lineitem — no partsupp availability to halve): "
    "suppliers in one nation with significant promo-part volume. The IN "
    "decorrelates to a left-semi join on the HAVING-pruned supplier set. "
    "Only nation (fixed dim) is hinted; the blue-part filter scales "
    "with SF so that join is left to AQE.",
    expects_broadcast="nation fixed dim (25 rows at every SF)",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    qualified = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            p.where(F.col("p_name").like("%blue%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity", 2).alias("__qty"))
        .where(F.col("__qty") > 100)
    )
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .where(F.col("n_name") == "NATION_7")
        .join(qualified, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    """,
    doc="TPC-H Q21 (adapted: 'late' = shipped >60 days after order date — "
    "no commit/receipt dates): suppliers who were the SOLE late supplier "
    "on a finished multi-supplier order. The EXISTS/NOT EXISTS pair "
    "becomes left-semi + left-anti joins on orderkey; both reuse the "
    "lineitem scan. Only nation (fixed dim) is hinted; supplier scales "
    "with SF so its join is left to AQE.",
    expects_broadcast="nation fixed dim (25 rows at every SF)",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(
            o.where(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .where(F.col("l_shipdate") > late_cut)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .where(F.col("n_name") == "NATION_4")
        .select(
            F.col("l_orderkey").alias("__ok"),
            F.col("l_suppkey").alias("__sk"),
            F.col("o_orderdate").alias("__od"),
            "s_name",
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("__ok3"),
        F.col("l_suppkey").alias("__sk3"),
        F.col("l_shipdate").alias("__sd3"),
    )
    with_other = l1.join(
        l2,
        (F.col("__ok2") == F.col("__ok")) & (F.col("__sk2") != F.col("__sk")),
        "left_semi",
    )
    sole_late = with_other.join(
        l3,
        (F.col("__ok3") == F.col("__ok"))
        & (F.col("__sk3") != F.col("__sk"))
        & (F.col("__sd3") > F.col("__od") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return sole_late.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("numwait")
    )


@register(
    "q22_global_sales_opportunity",
    f"""
    WITH pos AS (
      SELECT {sql_davg('c_acctbal')} AS avg_bal FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 13, 17, 19)
    )
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           {sql_dsum('c_acctbal', 2)} AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 13, 17, 19)
      AND c_acctbal > (SELECT avg_bal FROM pos)
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 (adapted: country code = c_nationkey — no phone "
    "column; dormancy = no orders since 1999, since every driver "
    "customer has ordered at least once): wealthy customers in target "
    "countries gone dormant. Scalar-subquery average broadcasts; the NOT "
    "EXISTS is a left-anti join against the filtered orders key "
    "projection.",
    expects_bnlj=True,
    expects_broadcast="1-row average-balance aggregate",
)
def q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    target = c.where(F.col("c_nationkey").isin(1, 3, 5, 7, 13, 17, 19))
    avg_bal = target.where(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("__avg_bal")
    )
    return (
        target.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            o.where(
                F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )
