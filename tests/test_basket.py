"""Market-basket operator: pair supports, rules, oversized-basket guard."""

from __future__ import annotations

from heparchy_spark.operators.basket import (
    association_rules,
    basket_items,
    copurchase_pairs,
)


def _toy(spark):
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 20), (3, 30),
        (4, 10), (4, 20),
        # basket 5 is oversized (4 items > cap 3) and must be dropped
        (5, 10), (5, 20), (5, 30), (5, 40),
    ]
    return spark.createDataFrame(rows, "basket_id long, item_id long")


def test_pair_supports_and_basket_cap(spark):
    b = basket_items(_toy(spark), "basket_id", "item_id", max_basket_items=3)
    got = {
        (r.item_a, r.item_b): r.pair_support
        for r in copurchase_pairs(b).collect()
    }
    assert got == {(10, 20): 3, (10, 30): 1, (20, 30): 2}
    # without the cap, basket 5 contributes its 6 pairs
    b_all = basket_items(_toy(spark), "basket_id", "item_id")
    n_all = copurchase_pairs(b_all).count()
    assert n_all == 6  # (10,20)(10,30)(20,30)(10,40)(20,40)(30,40)


def test_association_rules_confidence_lift(spark):
    b = basket_items(_toy(spark), "basket_id", "item_id", max_basket_items=3)
    rules = {
        (r.antecedent, r.consequent): (r.confidence, r.lift)
        for r in association_rules(b, min_pair_support=2).collect()
    }
    # item supports: 10 -> 3, 20 -> 4, 30 -> 2; n_baskets = 4
    assert rules[(10, 20)] == (1.0, 1.0)  # 3/3, 3*4/(3*4)
    assert rules[(20, 10)] == (0.75, 1.0)  # 3/4
    assert rules[(20, 30)] == (0.5, 1.0)  # 2/4, 2*4/(4*2)
    assert rules[(30, 20)] == (1.0, 1.0)
    assert set(rules) == {(10, 20), (20, 10), (20, 30), (30, 20)}
