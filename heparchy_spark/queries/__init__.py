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
        multimodal,
        relational,
        similarity,
        streaming_like,
        text,
        web,
    )


def spark_queries() -> dict[str, SparkBuilder]:
    _load_all()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
