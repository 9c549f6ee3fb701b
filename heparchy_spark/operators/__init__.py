"""Custom operators the reference implies but Spark lacks as built-ins.

Each operator is a composition of DataFrame primitives first (so Catalyst
still owns the physical plan), a Pandas-UDF fallback only where column
algebra genuinely can't express the semantics (SURVEY.md §2.11).

Modules:
- ``asof``       — as-of join (union + single window, no range explosion)
- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity`` — cosine top-k, hyperplane LSH, IVF index
- ``text``       — token counts, char stats, quality, lang-id, fingerprints
- ``multimodal`` — binary payload columns: sniff/stats/decode/frames
- ``layout``     — bucketed co-located joins, skew salting
"""

from heparchy_spark.operators import (  # noqa: F401
    asof,
    dedup,
    layout,
    multimodal,
    similarity,
    text,
)
from heparchy_spark.operators.asof import asof_join  # noqa: F401

__all__ = [
    "asof",
    "dedup",
    "layout",
    "multimodal",
    "similarity",
    "text",
    "asof_join",
]
