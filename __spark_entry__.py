"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing summary)
at sf0.001; ``queries()``/``oracle_sql()`` expose the registered corpus
(heparchy_spark.queries) — every SQL-expressible query carries a DuckDB
oracle; hash-sensitive double aggregates accumulate in exact decimal on both
sides (heparchy_spark.queries.numeric) so value hashes are engine-independent.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from heparchy_spark.queries import spark_queries

    return spark_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from heparchy_spark.queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from heparchy_spark.queries import oracle_map

    return oracle_map()
