"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
against the same sf directory, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized).  Usage:

    python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from heparchy_spark.queries.tables import TABLES  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows), sorted(cols)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from heparchy_spark.session import get_spark

    spark = get_spark("parity-check")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_noracle = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) [no oracle]")
            n_noracle += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        sh, sn, sc = table_hash(scols, srows)
        oh, on, oc = table_hash(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} duckdb={oc}")
            n_fail += 1
        elif sn != on:
            print(f"FAIL {name}: rowcount differs spark={sn} duckdb={on}")
            n_fail += 1
        elif sh != oh:
            print(f"FAIL {name}: value hash differs ({sn} rows)")
            _diff_preview(scols, srows, ocols, orows)
            n_fail += 1
        else:
            print(f"PASS {name}: {sn} rows match ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    spark.stop()
    return 1 if n_fail else 0


def _diff_preview(scols, srows, ocols, orows, limit: int = 5) -> None:
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sset = sorted("|".join(canon(r[i]) for i in so) for r in srows)
    oset = sorted("|".join(canon(r[i]) for i in oo) for r in orows)
    s_only = [x for x in sset if x not in set(oset)][:limit]
    o_only = [x for x in oset if x not in set(sset)][:limit]
    for x in s_only:
        print(f"   spark-only:  {x[:200]}")
    for x in o_only:
        print(f"   duckdb-only: {x[:200]}")


if __name__ == "__main__":
    raise SystemExit(main())
