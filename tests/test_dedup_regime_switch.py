"""The r11 size-regime switches must be output-invariant.

Both ``ngram_jaccard_pairs`` (prefix cache partitioned only above the
broadcast regime) and ``simhash_near_dup_pairs`` (wide 2x32 banding only
above the corpus-size gate) pick a physical plan from driver-side source
bytes; the declared results must be identical in either regime.  The
gates read ``_source_bytes`` at call time, so forcing the big regime is
a monkeypatch of that helper.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401

from heparchy_spark.operators import dedup


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),
        (3, "a completely different document about spark physical planning"),
        (4, "a completely different document about spark physical plans"),
        (5, "short one"),
        (6, ""),
        (7, "the quick brown fox jumps over the lazy cat again and again"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_ppjoin_regimes_identical(spark, monkeypatch):
    docs = _docs(spark)
    small = _rows(
        dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5),
        ["id_a", "id_b", "jaccard"],
    )
    spark.catalog.clearCache()
    monkeypatch.setattr(dedup, "_source_bytes", lambda df: 1 << 40)
    big = _rows(
        dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5),
        ["id_a", "id_b", "jaccard"],
    )
    spark.catalog.clearCache()
    assert small == big
    assert small  # the corpus above does contain near-dup pairs


def test_simhash_regimes_identical(spark, monkeypatch):
    docs = _docs(spark)
    small = _rows(
        dedup.simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=3),
        ["id_a", "id_b", "hamming"],
    )
    spark.catalog.clearCache()
    monkeypatch.setattr(dedup, "_source_bytes", lambda df: 1 << 40)
    wide = _rows(
        dedup.simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=3),
        ["id_a", "id_b", "hamming"],
    )
    spark.catalog.clearCache()
    assert small == wide
    assert small
