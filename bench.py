"""Benchmark harness — runs the headline corpus at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query executes end-to-end into a noop sink (full computation, no
driver-side materialization cost).  Protocol: one UNTIMED warm-up run per
query, then min of 2 timed runs.  The warm-up is per-query, not just
per-session: the first execution of each plan pays whole-stage-codegen
class compilation + JIT, measured at 3-6x steady state on the widest
generated classes (the 64-column dedup aggregates), and a session-level
warm-up does not amortize it.  min-of-2 then guards against the shared
VM's bursty neighbor load (single-shot timings vary 3x on identical
plans).  Together they measure the engine, not the JIT or the neighbors.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q9_product_profit",
    "q10_returned_items",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "join_left_order_counts",
    "agg_count_distinct",
    "window_topk_orders_per_customer",
    "window_running_customer_spend",
    "topk_orders_global",
    "events_tumbling_hourly",
    "events_sessionize_30m",
    "events_asof_latest_before_order",
    "json_extract_events",
    "agg_percentiles_quantity",
    "pivot_qty_by_status",
    "dedup_exact",
    "dedup_contamination_check",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_pairs",
    "text_profile_full",
    "text_fingerprints",
    "text_repetition_signals",
    "text_token_freqs",
    "text_filter_funnel",
    "dataset_shuffle_shards",
    "dataset_training_corpus",
    "similarity_cosine_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "similarity_pq_topk",
    "sketch_count_min_users",
    "dedup_bloom_prefilter",
    "multimodal_byte_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    from heparchy_spark.queries import spark_queries
    from heparchy_spark.session import get_spark

    spark = get_spark("heparchy-spark-bench")
    qs = spark_queries()

    def run(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        # Queries that persist intermediates (minhash/simhash staging) would
        # otherwise accumulate storage across runs; keep each run
        # self-contained so timings are independent.
        spark.catalog.clearCache()
        return dt

    run("q1_pricing_summary")  # warm-up: JVM/JIT/codegen startup

    timings: dict[str, float] = {}
    for name in HEADLINE:
        try:
            run(name)  # untimed per-query warm-up: codegen compile + JIT
            timings[name] = round(min(run(name), run(name)), 3)
        except Exception as exc:  # noqa: BLE001
            print(f"bench error in {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
