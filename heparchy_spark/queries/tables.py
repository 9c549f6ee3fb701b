"""Driver test-table loaders (TESTDATA.md).

``load`` is the single scan entry point for the corpus: bare
``spark.read.parquet`` so Catalyst owns pushdown/pruning.  At cluster scale
the same call works on a directory of thousands of files; nothing here
assumes single-file inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown test table: {name}")
    try:
        # the driver runs queries on ITS session; timestamp semantics must
        # match the timezone-naive DuckDB oracle regardless of its config
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover - conf locked down
        pass
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """``events.ts`` is Parquet TIMESTAMP(NANOS), which Spark only reads as
    a long (``nanosAsLong``); convert to a microsecond timestamp (floor
    division — matches DuckDB's nanos->micros truncation)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf locked down
        pass
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
