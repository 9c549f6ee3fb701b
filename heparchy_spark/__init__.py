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

from heparchy_spark.session import get_spark

__version__ = "0.1.0"
__all__ = ["get_spark", "__version__"]
