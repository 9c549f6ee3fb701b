"""heparchy-spark — a PySpark-native engine with the capabilities of
jacanchaplais/heparchy (hierarchical HEP event storage & access), extended
with the relational/streaming/LLM-pipeline operator surface those
capabilities imply at 100 TB scale.

Layout (SURVEY.md §7):
- ``session``   — tuned SparkSession factory
- ``schemas``   — the normalized long-format data model (§1.6)
- ``sources``   — ingest/egress: HDF5 bridge, Parquet layout, reader/writer facades
- ``functions`` — physics & helper column expressions
- ``operators`` — [ext] operators: asof, dedup, similarity, text, graph
- ``queries``   — driver-facing oracle-checked query corpus
- ``streaming`` — Structured Streaming ingest & event-time analytics
- ``plans``     — plan inspection / scale-property assertions
"""

from __future__ import annotations

import typing as ty
from pathlib import Path

from heparchy_spark.session import get_spark

__version__ = "0.1.0"
__all__ = ["get_spark", "open_file", "__version__"]


def open_file(
    path: str | Path,
    mode: str = "r",
    process: str | None = None,
    spark=None,
    **kwargs: ty.Any,
):
    """Unified open dispatch (``/root/reference/heparchy/__init__.py:19-98``):
    mode ('r'/'w') × optional process name → one of four context-managed
    handles (HepReader / HepProcessReader / HepWriter / HepProcessWriter).

    Unlike the reference, a SparkSession backs every handle; pass one or the
    default session factory is used.
    """
    from contextlib import ExitStack, contextmanager

    from heparchy_spark.sources import HepReader, HepWriter

    spark = spark or get_spark()
    if mode not in ("r", "w"):
        raise ValueError(f"mode must be 'r' or 'w', got {mode!r}")

    @contextmanager
    def _ctx():
        with ExitStack() as stack:
            if mode == "r":
                reader = stack.enter_context(HepReader(spark, path))
                yield reader[process] if process is not None else reader
            else:
                writer = stack.enter_context(HepWriter(spark, path, **kwargs))
                if process is not None:
                    yield stack.enter_context(writer.new_process(process))
                else:
                    yield writer

    return _ctx()
