"""Market-basket corpus queries — co-purchase pairs and association rules
over the lineitem fact (baskets = orders, items = parts).

Both queries are pure relational compositions (distinct -> self equi-join
on the basket key -> combinable counts -> broadcast dims), so the oracle
is plain ANSI SQL.  Confidence/lift are single IEEE divisions of exact
integers, rounded to 6 — deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.basket import (
    association_rules,
    basket_items,
    copurchase_pairs,
)
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load

_MAX_BASKET = 32  # guard: cap per-basket pair fanout (sf max is 13)
_MIN_SUPPORT = 2

_BASKETS_CTE = f"""
b AS (
  SELECT basket, item FROM (
    SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
  ) d
  WHERE basket IN (
    SELECT basket FROM (
      SELECT l_orderkey AS basket, COUNT(DISTINCT l_partkey) AS sz
      FROM lineitem GROUP BY l_orderkey
    ) s WHERE sz <= {_MAX_BASKET}
  )
),
pairs AS (
  SELECT x.item AS item_a, y.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS pair_support
  FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item
  GROUP BY x.item, y.item
  HAVING COUNT(*) >= {_MIN_SUPPORT}
)
"""


@register(
    "basket_copurchase_pairs",
    f"""
    WITH {_BASKETS_CTE}
    SELECT item_a, item_b, pair_support FROM pairs
    """,
    doc="Co-purchase pair supports over order baskets: one distinct on "
    "(order, part), a self EQUI-join on the basket key (never "
    "all-pairs; fanout bounded by the max_basket_items guard), "
    "combinable pair counts, min-support filter. The 100 TB shape of "
    "frequent-itemset mining's first pass.",
)
def basket_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    b = basket_items(
        li, "l_orderkey", "l_partkey", max_basket_items=_MAX_BASKET
    )
    return copurchase_pairs(b, min_support=_MIN_SUPPORT)


@register(
    "basket_association_rules",
    f"""
    WITH {_BASKETS_CTE},
    directed AS (
      SELECT item_a AS antecedent, item_b AS consequent, pair_support
      FROM pairs
      UNION ALL
      SELECT item_b AS antecedent, item_a AS consequent, pair_support
      FROM pairs
    ),
    supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM b GROUP BY item),
    nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM b)
    SELECT
      d.antecedent,
      d.consequent,
      d.pair_support,
      ROUND(CAST(d.pair_support AS DOUBLE) / CAST(sa.s AS DOUBLE), 6)
        AS confidence,
      ROUND(CAST(d.pair_support * nb.n AS DOUBLE)
            / CAST(sa.s * sc.s AS DOUBLE), 6) AS lift
    FROM directed d
    JOIN supp sa ON sa.item = d.antecedent
    JOIN supp sc ON sc.item = d.consequent
    CROSS JOIN nb
    """,
    doc="Association rules a->b with support/confidence/lift: pair "
    "supports from the equi-join pass, per-item supports as a "
    "broadcast dim, basket total as a broadcast single-row aggregate. "
    "Confidence and lift are each ONE IEEE division of exact integers "
    "(< 2**53), rounded to 6 — engine-independent.",
    expects_bnlj=True,
    expects_broadcast="1-row basket-count aggregate",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    b = basket_items(
        li, "l_orderkey", "l_partkey", max_basket_items=_MAX_BASKET
    )
    return association_rules(b, min_pair_support=_MIN_SUPPORT)


@register(
    "basket_item_cf_topk",
    f"""
    WITH {_BASKETS_CTE},
    directed AS (
      SELECT item_a AS item, item_b AS neighbor, pair_support FROM pairs
      UNION ALL
      SELECT item_b AS item, item_a AS neighbor, pair_support FROM pairs
    ),
    supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM b GROUP BY item),
    scored AS (
      SELECT d.item, d.neighbor, d.pair_support,
             ROUND(CAST(d.pair_support AS DOUBLE)
                   / sqrt(CAST(si.s * sn.s AS DOUBLE)), 9) AS cosine_sim
      FROM directed d
      JOIN supp si ON si.item = d.item
      JOIN supp sn ON sn.item = d.neighbor
    )
    SELECT item, neighbor, pair_support, cosine_sim,
           CAST(cf_rank AS INT) AS cf_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY item ORDER BY cosine_sim DESC, neighbor ASC
             ) AS cf_rank
      FROM scored
    ) r WHERE cf_rank <= 5
    """,
    doc="Item-to-item collaborative filtering (Linden et al. 2003): "
    "top-5 co-purchase neighbors per part by binary-incidence cosine "
    "n_ij/sqrt(n_i*n_j) (operators/basket.py item_cf_topk).  Pair "
    "supports from the bounded equi-join pass; the ranking window "
    "partitions by item over support-filtered candidate lists; the "
    "window orders by the ROUND-9 score with the neighbor id as "
    "tiebreak so ranks are engine-independent.",
)
def basket_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.basket import item_cf_topk

    li = load(spark, sf_dir, "lineitem")
    b = basket_items(
        li, "l_orderkey", "l_partkey", max_basket_items=_MAX_BASKET
    )
    return item_cf_topk(b, k=5, min_support=_MIN_SUPPORT)
