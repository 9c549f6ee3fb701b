"""Cross-scale parity sweep: every SQL-oracle corpus query checked at
MULTIPLE scale factors in one pass.

The per-round driver gate runs at sf0.01; a query whose seed constants or
grid rounding silently depend on that scale would still pass it.  This
sweep reruns the full hash-compare protocol (tools/parity_check.py) at
each listed sf directory, EXCLUDING fixture-backed oracles — their
expected values are precomputed at sf0.01 by design (see
``expected_fixture_sql``) and cannot be rescaled without rebuilding.

    python tools/sweep_check.py                      # sf0.001 + sf0.1
    python tools/sweep_check.py /root/testdata/sf0.001 /root/testdata/sf0.1
    python tools/sweep_check.py --reverify           # only the round's
                                 # edited queries (REVERIFY.json), the
                                 # per-round log committed as SWEEP_r{N}.log

Exit code 0 iff every (query, sf) cell passes.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_FIXTURE_MARKS = (
    "expected values precomputed in plain Python",
    # oracles COMPOSED over a committed fixture parquet (e.g. the dijet
    # query reads the antikt jets fixture) are sf0.01-pinned too
    "tests/fixtures/",
)


def sql_oracle_names() -> list[str]:
    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    return sorted(
        name
        for name, sql in oracles.items()
        if not any(m in sql for m in _FIXTURE_MARKS)
    )


def main() -> int:
    args = list(sys.argv[1:])
    only_reverify = "--reverify" in args
    if only_reverify:
        args.remove("--reverify")
    sf_dirs = args or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.1",
    ]
    names = sql_oracle_names()
    if only_reverify:
        import json

        rv = json.loads(
            (Path(__file__).resolve().parent.parent / "REVERIFY.json")
            .read_text()
        )
        listed = set(rv.get("names", ()))
        names = [n for n in names if n in listed]
    print(f"sweeping {len(names)} SQL-oracle queries over {sf_dirs}")
    rc = 0
    for sf in sf_dirs:
        # One parity_check process per sf keeps Spark/DuckDB state and
        # failure output identical to the driver-shaped single-sf run.
        proc = subprocess.run(
            [sys.executable, "tools/parity_check.py", sf, *names],
            cwd=Path(__file__).resolve().parent.parent,
            capture_output=True,
            text=True,
        )
        tail = [ln for ln in proc.stdout.splitlines() if ln.strip()][-1:]
        print(f"{sf}: {tail[0] if tail else '(no output)'}")
        for ln in proc.stdout.splitlines():
            if ln.startswith("FAIL"):
                print(f"  {ln}")
                rc = 1
        if proc.returncode != 0:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
