"""Scale rehearsal ABOVE the driver's largest test data (VERDICT r7 #6).

Every 100 TB claim in SCALE.md is a plan-shape argument; none had been
MEASURED above sf0.1 (~600 k lineitem rows).  This tool deterministically
inflates sf0.1 ~``R``x into a scratch dir — replicating each table with
per-copy key shifts so referential integrity holds within a copy, text
rotated per copy so replicas are NOT near-duplicates of each other (a
naive replication would make every dedup candidate set quadratic in R by
construction, measuring the inflation artifact instead of the operator),
and embeddings perturbed per copy for the same reason — then times a
representative query slate at both scales and records the wall-clock
scaling exponent  log(t_R / t_1) / log(R)  plus shuffle read/write bytes
from the live UI's stage metrics.  Exponent ~1.0 = linear (the target
for scans/aggs/banded joins); >>1 = a nonlinearity to file.

    python tools/scale_rehearsal.py                 # R=10, full slate
    python tools/scale_rehearsal.py --r 5 q1_pricing_summary ...

Results: SCALE_REHEARSAL.json (machine) + printed markdown row per
query (paste into SCALE.md).  The scratch dir (/tmp/heparchy_scale_rN)
is reused across runs; delete it to force a rebuild.  Do NOT point this
at /root/testdata for output — the scratch lives in /tmp.
"""

from __future__ import annotations

import json
import math
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"

# The slate: the most expensive corpus queries by BENCH_DETAILS, plus a
# banded dedup, an iterative graph op, an ANN scan, a window family
# member, and two relational baselines.
SLATE = [
    "q1_pricing_summary",
    "q18_large_orders",
    "agg_percentiles_quantity",
    "events_sessionize_30m",
    "profile_table_stats",
    "quality_logreg_auc",
    "text_lm_perplexity",
    "text_fingerprints",
    "dedup_minhash_lsh_pairs",
    "dedup_incremental_minhash",
    "similarity_cosine_topk",
    "graph_pagerank_supply_network",
    "graph_boruvka_forest",
    "web_host_quality_rollup",
    # round-9 additions (r8 verdict #4): the LLM-pipeline heavies the
    # first rehearsal skipped, plus two de-hinted TPC-H joins to record
    # the broadcast->SMJ transition now that the explicit hints are gone
    "multimodal_dhash_neardups",  # decode-bound mapInPandas: stays linear?
    "dedup_rouge_l_pairs",  # O(n*m) DP over banded candidates
    "dataset_leakage_safe_split",  # iterative connected components
    "similarity_semantic_dedup",  # cluster-bounded pairing
    "q3_shipping_priority",  # de-hinted: AQE BHJ->SMJ transition
    "q5_local_supplier",  # de-hinted: AQE BHJ->SMJ transition
]

# 20-letter rotation alphabet: R<=20 keeps every copy's text pairwise
# distinct under translate(), so replicas never masquerade as near-dups.
_ALPHA = "abcdefghijklmnopqrst"


def _rot(i: int) -> str:
    return _ALPHA[i % 20:] + _ALPHA[: i % 20]


def build_inflated(spark, out_dir: Path, r: int) -> None:
    from heparchy_spark.queries.tables import TABLES, load

    out_dir.mkdir(parents=True, exist_ok=True)
    # key-domain strides: shift copy i's keys by i*stride per domain
    strides: dict[str, int] = {}
    for tbl, col in [
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey"),
        ("events", "event_id"),
        ("events", "user_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        strides[col] = (
            load(spark, BASE, tbl).agg(F.max(col)).collect()[0][0] + 1
        )

    shifts: dict[str, list[tuple[str, str]]] = {
        # table -> [(column, key-domain)]
        "customer": [("c_custkey", "c_custkey")],
        "orders": [("o_orderkey", "o_orderkey"), ("o_custkey", "c_custkey")],
        "lineitem": [
            ("l_orderkey", "o_orderkey"),
            ("l_partkey", "p_partkey"),
            ("l_suppkey", "s_suppkey"),
        ],
        "part": [("p_partkey", "p_partkey")],
        "supplier": [("s_suppkey", "s_suppkey")],
        "events": [("event_id", "event_id"), ("user_id", "user_id")],
        "documents": [("doc_id", "doc_id")],
        "embeddings": [("vec_id", "vec_id")],
    }

    for tbl in TABLES:
        dest = out_dir / f"{tbl}.parquet"
        if dest.exists():
            continue
        df = load(spark, BASE, tbl)
        if tbl in ("region", "nation"):
            # dimension tables stay fixed: scale-up multiplies facts per
            # dimension value, the realistic growth mode
            df.write.mode("overwrite").parquet(str(dest))
            continue
        copies = []
        for i in range(r):
            c = df
            for col, dom in shifts.get(tbl, []):
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[dom]))
            if tbl == "documents" and i > 0:
                c = c.withColumn("text", F.translate("text", _ALPHA, _rot(i)))
            if tbl == "embeddings" and i > 0:
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: x
                        + F.lit(0.03 * i) * ((j % 7).cast("double") - 3.0),
                    ).cast("array<float>"),
                )
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(str(dest))
        print(f"inflated {tbl}: x{r}", file=sys.stderr)


def _shuffle_totals(spark) -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over all completed stages, from
    the live UI REST API (local mode, default port).

    ``spark.ui.retainedStages`` is raised in ``main`` (r8 advice: the
    default 1000 evicts old stages on long slates, making later r1-r0
    deltas negative/understated); callers still clamp deltas at 0 and
    flag rollover as a second guard."""
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        ) as resp:
            stages = json.load(resp)
        return (
            sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception:  # pragma: no cover - UI disabled
        return (0, 0)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--r", type=int, default=10)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import os

    # live UI on: the stage REST API is the shuffle-bytes source
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

    from heparchy_spark.queries import REGISTRY, _load_all
    from heparchy_spark.session import get_spark

    _load_all()
    slate = args.queries or [n for n in SLATE if n in REGISTRY]
    # retainedStages high enough that no stage is evicted mid-slate —
    # eviction made later per-query shuffle deltas negative (r8 advice)
    spark = get_spark(
        "scale-rehearsal",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    scratch = Path(f"/tmp/heparchy_scale_r{args.r}")
    build_inflated(spark, scratch, args.r)

    results: dict[str, dict] = {}
    for name in slate:
        row: dict = {}
        # untimed warm-up at base scale: codegen + JIT for this plan
        # family, so the base sample isn't the cold one
        try:
            REGISTRY[name].spark(spark, BASE).write.mode(
                "overwrite"
            ).format("noop").save()
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001 - the timed loop reports it
            pass
        for label, sf_dir in [("base", BASE), ("inflated", str(scratch))]:
            r0, w0 = _shuffle_totals(spark)
            t0 = time.time()
            try:
                df = REGISTRY[name].spark(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                wall = round(time.time() - t0, 2)
                err = None
            except Exception as exc:  # noqa: BLE001
                wall, err = round(time.time() - t0, 2), str(exc)[:200]
            r1, w1 = _shuffle_totals(spark)
            spark.catalog.clearCache()
            # clamp at 0 + flag: an evicted stage store would otherwise
            # record a negative/understated delta silently
            rollover = r1 < r0 or w1 < w0
            row[label] = {
                "wall": wall,
                "shuffle_read": max(r1 - r0, 0),
                "shuffle_write": max(w1 - w0, 0),
                "error": err,
                **({"stage_rollover": True} if rollover else {}),
            }
        b, i = row["base"], row["inflated"]
        if not b["error"] and not i["error"] and b["wall"] > 0:
            row["wall_exponent"] = round(
                math.log(max(i["wall"], 1e-3) / b["wall"]) / math.log(args.r),
                2,
            )
            if b["shuffle_write"] > 0 and i["shuffle_write"] > 0:
                row["shuffle_exponent"] = round(
                    math.log(i["shuffle_write"] / b["shuffle_write"])
                    / math.log(args.r),
                    2,
                )
        results[name] = row
        print(
            f"| {name} | {b['wall']} | {i['wall']} | "
            f"{row.get('wall_exponent', 'ERR')} | "
            f"{round(b['shuffle_write'] / 1e6, 1)} MB | "
            f"{round(i['shuffle_write'] / 1e6, 1)} MB | "
            f"{row.get('shuffle_exponent', '-')} |"
            + (f"  ERROR: {i['error']}" if i["error"] else "")
        )

    out = Path(__file__).resolve().parent.parent / "SCALE_REHEARSAL.json"
    # MERGE into the committed file: a targeted re-run of a few queries
    # must not drop the rest of the slate's rows or the notes block
    merged: dict = {"r": args.r, "results": {}, "notes": {}}
    try:
        prev = json.loads(out.read_text())
        if int(prev.get("r", args.r)) == args.r:
            merged["results"].update(prev.get("results", {}))
        merged["notes"].update(prev.get("notes", {}))
    except (OSError, ValueError):
        pass
    merged["results"].update(results)
    out.write_text(json.dumps(merged, indent=1))
    print(f"wrote {out}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
