"""Raw-corpus ingest: JSONL / CSV / plain-text files → the ``documents``
shape (LLM-pipeline front door; [ext] beside SURVEY.md §2.1's S-rows).

Design for 100 TB:

- **Spark's native readers do the IO** (``spark.read.json/csv/text``):
  splittable formats parallelize by block, compressed files (.gz/.zst)
  decompress per file, and a directory of N files runs N-way parallel —
  no driver-side file walking.
- **Deterministic content-addressed ids**: ``doc_id = xxhash64(text)``
  (JVM-side).  Unlike ``monotonically_increasing_id`` the id is stable
  across reruns, repartitioning, and incremental loads — so downstream
  incremental dedup (left-anti against a seen-id sidecar) and split
  assignment (``operators/dataset.py``) stay reproducible.  Exact-dup
  texts collapse to one id by construction, which IS the exact-dedup
  semantic the pipeline wants.
- **Corrupt records are data, not exceptions**: JSONL ingests PERMISSIVE
  with a ``_corrupt_record`` capture column; callers split good/bad with
  one filter instead of failing the 10-hour job on line 9 billion.
- **Provenance travels**: ``source_file`` via ``input_file_name()`` —
  required for contamination tracebacks and per-source mixing weights.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_documents", "CORRUPT_COL"]

CORRUPT_COL = "_corrupt_record"

_FORMATS = ("jsonl", "csv", "text")


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    *,
    text_col: str = "text",
    schema: T.StructType | str | None = None,
    options: dict[str, str] | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a raw corpus into ``(doc_id, source_file, text, ...)``.

    ``fmt``: ``jsonl`` (one JSON object per line; ``text_col`` selects the
    document field), ``csv`` (header row expected unless overridden via
    ``options``), or ``text`` (whole line = document).  ``schema`` pins
    the JSONL/CSV schema — ALWAYS pass one in production: schema inference
    runs an extra full scan of the input before the real read.

    Rows whose ``text_col`` is null (including every corrupt JSONL line)
    are dropped unless ``keep_corrupt=True``, which keeps them with the
    raw line in ``_corrupt_record`` for quarantine sinks.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    opts = dict(options or {})
    if fmt == "jsonl":
        opts.setdefault("mode", "PERMISSIVE")
        opts.setdefault("columnNameOfCorruptRecord", CORRUPT_COL)
        reader = spark.read.options(**opts)
        if schema is not None:
            sch = (
                T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
            )
            if keep_corrupt and CORRUPT_COL not in sch.fieldNames():
                sch = sch.add(CORRUPT_COL, T.StringType())
            reader = reader.schema(sch)
        df = reader.json(path)
    elif fmt == "csv":
        opts.setdefault("header", "true")
        reader = spark.read.options(**opts)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.csv(path)
    else:
        df = spark.read.options(**(options or {})).text(path)
        text_col = "value"

    df = df.withColumn("source_file", F.input_file_name())
    if text_col != "text":
        if "text" in df.columns:
            # the input already carries an unrelated 'text' column — move
            # it aside instead of producing two ambiguous 'text' columns
            df = df.withColumnRenamed("text", "text_raw")
        df = df.withColumnRenamed(text_col, "text")
    if not keep_corrupt:
        df = df.where(F.col("text").isNotNull())
        if CORRUPT_COL in df.columns:
            df = df.drop(CORRUPT_COL)
    # quarantined rows have NULL text; hashing NULL would give every one
    # the same id (xxhash64's seed), collapsing the quarantine set — id
    # them by the raw corrupt line instead (still content-addressed)
    id_parts = [F.col("text")]
    if CORRUPT_COL in df.columns:
        id_parts.append(F.col(CORRUPT_COL))
    id_src = F.coalesce(*id_parts, F.lit(""))
    out_cols = ["doc_id", "source_file", "text"]
    # 'doc_id' excluded: withColumn REPLACES an input doc_id column, and
    # listing it again in rest would select it twice (ambiguous refs)
    rest = [c for c in df.columns if c not in ("doc_id", "source_file", "text")]
    return df.withColumn("doc_id", F.xxhash64(id_src)).select(*out_cols, *rest)
