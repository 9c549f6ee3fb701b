"""Plan audit: run every corpus query and report its physical-plan scale
properties — shuffle-exchange count, broadcast usage, scans, codegen spans.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from heparchy_spark.plans import (
        executed_plan,
        has_broadcast_join,
        shuffle_count,
        wholestage_codegen_ids,
    )
    from heparchy_spark.queries import spark_queries
    from heparchy_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = spark_queries()
    names = args[1:] or sorted(qs)
    print(f"{'query':42s} {'shuffles':>8s} {'bcast':>6s} {'scans':>6s} {'codegen':>8s}")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            plan = executed_plan(df)
            print(
                f"{name:42s} {shuffle_count(df):8d} "
                f"{str(has_broadcast_join(df)):>6s} "
                f"{plan.count('Scan parquet'):6d} "
                f"{len(wholestage_codegen_ids(df)):8d}"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:42s} ERROR: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
