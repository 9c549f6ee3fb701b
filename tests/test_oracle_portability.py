"""Driver-harness portability sweep (VERDICT r2 task 7).

The driver compares Spark and DuckDB results by pulling both into pandas,
sorting columns by name, sorting rows, and hashing canonicalized values.
Two output shapes break that harness even when the VALUES are identical:

* array/map/struct-typed final columns — pandas ``sort_values`` cannot
  factorize list objects (``TypeError: unhashable type: 'list'``); this
  killed ``map_funcs_events`` in round 2;
* DuckDB HUGEINT/UHUGEINT outputs (e.g. an uncast ``SUM`` over integers)
  — the pandas fetch renders them float64 (``1234.0``) while Spark's
  bigint renders ``1234``, so canonical strings differ; this killed
  ``q12_late_priority_lines`` in round 2.

These tests reject the whole class mechanically for every registered
query, so a future corpus addition cannot reintroduce either failure.
"""

from __future__ import annotations

import duckdb
import pytest

from heparchy_spark.queries.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

# DuckDB logical types whose pandas conversion is not canonical-string
# stable across engines, or not sortable at all.
_BAD_DUCK_FRAGMENTS = ("HUGEINT", "UHUGEINT", "STRUCT(", "MAP(", "UNION(")


def _duck_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_oracle_outputs_have_portable_duckdb_types():
    """Bind (no execution) every oracle and reject HUGEINT/UHUGEINT and
    any nested type in the FINAL output columns."""
    import __spark_entry__ as entry_mod

    con = _duck_con()
    offenders = []
    for name, sql in sorted(entry_mod.oracle_sql().items()):
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if t.endswith("[]") or any(f in t for f in _BAD_DUCK_FRAGMENTS):
                offenders.append((name, col, t))
    con.close()
    assert not offenders, (
        "oracle outputs with driver-hostile DuckDB types: " f"{offenders}"
    )


def test_spark_outputs_are_scalar_columns(spark):
    """Every corpus query's result schema must be flat scalars — the
    driver's pandas canonicalizer cannot sort array/map/struct columns."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as entry_mod

    offenders = []
    for name, fn in entry_mod.queries().items():
        for field in fn(spark, SF_DIR).schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, field.name, str(field.dataType)))
    assert not offenders, (
        "spark outputs with non-scalar columns the driver cannot "
        f"canonicalize: {offenders}"
    )


def test_round2_red_rows_now_hash_clean():
    """End-to-end regression for the two round-2 driver-red rows: run the
    fixed oracles through DuckDB's PANDAS path (the driver's fetch) and
    assert the dtype/shape hazards are gone."""
    import __spark_entry__ as entry_mod

    con = _duck_con()
    oracles = entry_mod.oracle_sql()

    q12 = con.execute(oracles["q12_late_priority_lines"]).df()
    assert str(q12["high_line_count"].dtype) == "int64"
    assert str(q12["low_line_count"].dtype) == "int64"

    mf = con.execute(oracles["map_funcs_events"]).df()
    bad = [v for v in mf["prop_keys"].head(50) if not isinstance(v, str)]
    assert not bad, f"prop_keys must be joined strings, got: {bad[:3]}"
    # the sort the driver performs must now succeed
    mf.sort_values(by=sorted(mf.columns), inplace=False)
    con.close()


def test_oracles_execute_under_resource_cap():
    """Every oracle must EXECUTE (not just bind) under a fixed DuckDB
    resource cap — 512 MB, 4 threads, spill disabled — so an oracle
    that silently assumes an unbounded driver box (a blow-up join, a
    HUGEINT-wide materialization, an accidental cross product) fails
    HERE at sf0.001 instead of erroring in the driver's gate.  Binding
    alone missed the round-2 class until runtime; execution under a cap
    closes the next one."""
    import __spark_entry__ as entry_mod

    con = _duck_con()
    con.execute("SET memory_limit='512MB'")
    con.execute("SET threads=4")
    con.execute("SET temp_directory=''")  # no spill: the cap is real
    failures = []
    for name, sql in sorted(entry_mod.oracle_sql().items()):
        try:
            con.execute(sql).fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, str(exc)[:160]))
    con.close()
    assert not failures, (
        "oracles failing under the 512MB/4-thread cap: " f"{failures}"
    )
