"""Benchmark harness — runs the headline corpus at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query executes end-to-end into a noop sink (full computation, no
driver-side materialization cost).  Protocol: one UNTIMED warm-up run per
query, then MIN of 3 timed runs, with the relative spread of the timed
runs recorded per query.  The warm-up is per-query, not just
per-session: the first execution of each plan pays whole-stage-codegen
class compilation + JIT, measured at 3-6x steady state on the widest
generated classes (the 64-column dedup aggregates), and a session-level
warm-up does not amortize it.  min-of-3 then guards against the shared
VM's bursty neighbor load (single-shot timings vary 3x on identical
plans).  Together they measure the engine, not the JIT or the neighbors.

Noise instrumentation (round-2 verdict: a 22% round-over-round drift on
byte-identical code was indistinguishable from a real regression):

* ``spread``  — per query, (max-min)/min over the 3 timed runs; a spread
  >0.5 on a scan-bound query means neighbor load corrupted that timing;
* ``canary``  — a fixed reference query (q6, scan+agg, byte-stable across
  rounds) timed FIRST and again LAST; ``drift`` = last/first.  The JVM
  keeps C2-compiling shared paths throughout the run, so drift ~0.5-0.8
  is the measured steady state (0.47-0.51 at sf0.01) even after the
  first sample discards a full warm-up round; the NOISE signal is drift
  >1 (machine slowed mid-run) or a drift far below the round-over-round
  norm recorded in prior BENCH_r{N}.json files;
* ``noise_floor`` — median per-query spread, one number summarizing how
  trustworthy this round's timings are.
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
    "text_bm25_topk",
    "similarity_semantic_dedup",
    "merge_upsert_orders",
    "events_funnel_conversion",
    "graph_triangle_counts",
    "text_chunk_documents",
    "profile_table_stats",
    "join_salted_brand_counts",
    "retrieval_rrf_hybrid",
    "graph_label_propagation",
    "dataset_dsir_logweights",
    "dedup_incremental_minhash",
    "similarity_mmr_rerank",
    "dataset_temperature_sample",
    "similarity_random_projection",
    "text_winnowing_fingerprints",
    "text_compression_signals",
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

    def timed(name: str, n: int = 3) -> tuple[float, float]:
        """(min, relative spread) over n timed runs, after one untimed
        warm-up run that absorbs codegen compile + JIT."""
        run(name)
        samples = [run(name) for _ in range(n)]
        lo, hi = min(samples), max(samples)
        return round(lo, 3), round((hi - lo) / lo if lo > 0 else 0.0, 3)

    run("q1_pricing_summary")  # warm-up: JVM/JIT/codegen startup

    CANARY = "q6_forecast_revenue"
    timed(CANARY)  # discard: early-session JVM warm-up biases the first
    canary_first, _ = timed(CANARY)  # sample or the drift reads as noise

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        try:
            timings[name], spreads[name] = timed(name)
        except Exception as exc:  # noqa: BLE001
            print(f"bench error in {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0

    canary_last, _ = timed(CANARY)

    valid_spreads = sorted(s for n, s in spreads.items() if timings[n] >= 0)
    noise_floor = (
        round(valid_spreads[len(valid_spreads) // 2], 3) if valid_spreads else 0.0
    )
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "noise_floor": noise_floor,
                "canary": {
                    "query": CANARY,
                    "first": canary_first,
                    "last": canary_last,
                    "drift": round(
                        canary_last / canary_first if canary_first > 0 else 1.0, 3
                    ),
                },
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
