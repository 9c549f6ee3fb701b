"""Physical-layout corpus queries (Z-order key algebra).

The z-key itself is deterministic bit arithmetic over equi-width bucket
ids, so it hash-checks against a plain-SQL DuckDB mirror — the oracle
recomputes min/max and the interleave from scratch.  The *layout effect*
(per-file bounding boxes shrink, scans prune) is asserted separately in
``tests/test_layout.py`` on real Parquet footers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.layout import hilbert_key, zorder_key
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load

_BITS = 8
_K = 2


def _sql_bucket(expr: str, lo: str, hi: str, bits: int) -> str:
    n = 1 << bits
    return (
        f"LEAST(GREATEST(CAST(FLOOR((CAST({expr} AS DOUBLE) - {lo})"
        f" / (({hi} - {lo}) / {n})) AS BIGINT), 0), {n - 1})"
    )


def _sql_interleave(bucket_exprs: list[str], bits: int) -> str:
    terms = []
    for i, b in enumerate(bucket_exprs):
        for j in range(bits):
            terms.append(f"((({b} >> {j}) & 1) << {j * len(bucket_exprs) + i})")
    return " + ".join(terms)


_ORACLE = f"""
    WITH stats AS (
      SELECT CAST(MIN(o_custkey) AS DOUBLE) AS lo0,
             CAST(MAX(o_custkey) AS DOUBLE) AS hi0,
             CAST(MIN(o_totalprice) AS DOUBLE) AS lo1,
             CAST(MAX(o_totalprice) AS DOUBLE) AS hi1
      FROM orders
    ), bucketed AS (
      SELECT o_orderkey,
             {_sql_bucket('o_custkey', 'lo0', 'hi0', _BITS)} AS b0,
             {_sql_bucket('o_totalprice', 'lo1', 'hi1', _BITS)} AS b1
      FROM orders CROSS JOIN stats
    )
    SELECT o_orderkey, {_sql_interleave(['b0', 'b1'], _BITS)} AS zkey
    FROM bucketed
"""


@register(
    "layout_zorder_key",
    _ORACLE,
    doc="Morton (Z-order) key over (o_custkey, o_totalprice): equi-width "
    "bucket ids interleaved bit-by-bit — the write-time clustering key "
    "behind multi-column data skipping (operators/layout.py "
    "cluster_by_zorder). Stats pass + pure shift/mask algebra; the "
    "oracle recomputes the whole construction in portable SQL.",
    expects_bnlj=True,
    expects_broadcast="1-row min/max bounds",
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    stats = o.agg(
        F.min(F.col("o_custkey").cast("double")).alias("lo0"),
        F.max(F.col("o_custkey").cast("double")).alias("hi0"),
        F.min(F.col("o_totalprice").cast("double")).alias("lo1"),
        F.max(F.col("o_totalprice").cast("double")).alias("hi1"),
    )
    # equiwidth_bucket takes literal bounds (the operator path computes
    # stats driver-side); here the bounds stay columnar via a broadcast
    # stats join so both engines derive them identically from the same
    # parquet doubles — same arithmetic as equiwidth_bucket otherwise.
    n = 1 << _BITS

    def bucket(v: str, lo: str, hi: str):
        raw = F.floor(
            (F.col(v).cast("double") - F.col(lo))
            / ((F.col(hi) - F.col(lo)) / F.lit(float(n)))
        ).cast("long")
        return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))

    bucketed = o.join(F.broadcast(stats)).select(
        "o_orderkey",
        bucket("o_custkey", "lo0", "hi0").alias("b0"),
        bucket("o_totalprice", "lo1", "hi1").alias("b1"),
    )
    return bucketed.select(
        "o_orderkey",
        zorder_key([F.col("b0"), F.col("b1")], _BITS).alias("zkey"),
    )


# ---------------------------------------------------------------------------
# layout_hilbert_key — Hilbert-curve clustering key (better locality)
# ---------------------------------------------------------------------------


def _hilbert_ctes(bits: int) -> list[str]:
    """The per-level MATERIALIZED CTE chain computing the Hilbert d of
    every order row — shared by the key oracle and the clustering-
    quality oracle (the final table is ``h{bits}`` with (x, y, d))."""
    parts = [
        """stats AS (
      SELECT CAST(MIN(o_custkey) AS DOUBLE) AS lo0,
             CAST(MAX(o_custkey) AS DOUBLE) AS hi0,
             CAST(MIN(o_totalprice) AS DOUBLE) AS lo1,
             CAST(MAX(o_totalprice) AS DOUBLE) AS hi1
      FROM orders
    )""",
        f"""h0 AS MATERIALIZED (
      SELECT o_orderkey,
             {_sql_bucket('o_custkey', 'lo0', 'hi0', bits)} AS x,
             {_sql_bucket('o_totalprice', 'lo1', 'hi1', bits)} AS y,
             CAST(0 AS BIGINT) AS d
      FROM orders CROSS JOIN stats
    )""",
    ]
    # one MATERIALIZED CTE per level: each level reads its predecessor's
    # (x, y, d) several times, and DuckDB's default CTE inlining would
    # re-expand the whole chain exponentially
    for k, level in enumerate(range(bits - 1, -1, -1), start=1):
        s = 1 << level
        parts.append(f"""h{k} AS MATERIALIZED (
      SELECT o_orderkey,
             CASE WHEN (y & {s}) > 0 THEN x
                  WHEN (x & {s}) > 0 THEN {s - 1} - y ELSE y END AS x,
             CASE WHEN (y & {s}) > 0 THEN y
                  WHEN (x & {s}) > 0 THEN {s - 1} - x ELSE x END AS y,
             d + {s * s} * (CASE
                   WHEN (x & {s}) > 0 AND (y & {s}) > 0 THEN 2
                   WHEN (x & {s}) > 0 THEN 3
                   WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d
      FROM h{k - 1}
    )""")
    return parts


def _hilbert_oracle(bits: int) -> str:
    return (
        "WITH "
        + ",\n    ".join(_hilbert_ctes(bits))
        + f"\n    SELECT o_orderkey, CAST(d AS BIGINT) AS hkey FROM h{bits}"
    )


@register(
    "layout_hilbert_key",
    _hilbert_oracle(_BITS),
    doc="Hilbert-curve clustering key over (o_custkey, o_totalprice) "
    "equi-width bucket ids — the write-time layout key with strictly "
    "better locality than Morton/Z-order (the curve never jumps, so "
    "consecutive key ranges are tighter bounding boxes and box "
    "predicates touch fewer files at the same file count).  The xy2d "
    "walk runs as a per-row JVM HigherOrderFunction fold over the "
    "level array (O(bits) expression tree); the oracle replays the "
    "identical walk as one MATERIALIZED CTE per level "
    "(operators/layout.py hilbert_key — the operator behind "
    "cluster_by_hilbert and optimize(curve='hilbert')).",
    expects_bnlj=True,
    expects_broadcast="1-row min/max bounds",
)
def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    stats = o.agg(
        F.min(F.col("o_custkey").cast("double")).alias("lo0"),
        F.max(F.col("o_custkey").cast("double")).alias("hi0"),
        F.min(F.col("o_totalprice").cast("double")).alias("lo1"),
        F.max(F.col("o_totalprice").cast("double")).alias("hi1"),
    )
    n = 1 << _BITS

    def bucket(v: str, lo: str, hi: str):
        raw = F.floor(
            (F.col(v).cast("double") - F.col(lo))
            / ((F.col(hi) - F.col(lo)) / F.lit(float(n)))
        ).cast("long")
        return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))

    bucketed = o.join(F.broadcast(stats)).select(
        "o_orderkey",
        bucket("o_custkey", "lo0", "hi0").alias("b0"),
        bucket("o_totalprice", "lo1", "hi1").alias("b1"),
    )
    return bucketed.select(
        "o_orderkey",
        hilbert_key(F.col("b0"), F.col("b1"), _BITS).alias("hkey"),
    )


def _quality_oracle(bits: int, n_files: int) -> str:
    parts = _hilbert_ctes(bits)
    parts.append(f"""bkt AS MATERIALIZED (
      SELECT o_orderkey,
             {_sql_bucket('o_custkey', 'lo0', 'hi0', bits)} AS b0,
             {_sql_bucket('o_totalprice', 'lo1', 'hi1', bits)} AS b1
      FROM orders CROSS JOIN stats
    )""")
    parts.append(f"""keyed AS (
      SELECT b.o_orderkey, b.b0, b.b1, 'natural' AS scheme,
             CAST(b.o_orderkey AS BIGINT) AS key FROM bkt b
      UNION ALL
      SELECT b.o_orderkey, b.b0, b.b1, 'zorder',
             {_sql_interleave(['b.b0', 'b.b1'], bits)} FROM bkt b
      UNION ALL
      SELECT b.o_orderkey, b.b0, b.b1, 'hilbert', CAST(h.d AS BIGINT)
      FROM bkt b JOIN h{bits} h USING (o_orderkey)
    )""")
    parts.append(f"""boxes AS (
      SELECT scheme, file_id,
             MAX(b0) - MIN(b0) + 1 AS span0,
             MAX(b1) - MIN(b1) + 1 AS span1
      FROM (
        SELECT scheme, b0, b1,
               NTILE({n_files}) OVER (PARTITION BY scheme
                                      ORDER BY key, o_orderkey) AS file_id
        FROM keyed
      ) GROUP BY scheme, file_id
    )""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT scheme, CAST(COUNT(*) AS BIGINT) AS n_files,
           ROUND(CAST(SUM(span0 * span1) AS DOUBLE) / COUNT(*), 6)
             AS avg_box_area,
           ROUND(CAST(SUM(span0) AS DOUBLE) / COUNT(*), 6) AS avg_b0_span,
           ROUND(CAST(SUM(span1) AS DOUBLE) / COUNT(*), 6) AS avg_b1_span
    FROM boxes GROUP BY scheme"""
    )


_N_FILES = 32


@register(
    "layout_clustering_quality",
    _quality_oracle(_BITS, _N_FILES),
    doc="Data-skipping EFFECTIVENESS audit for the clustering keys: cut "
    "each ordering (natural insertion order, Z-order, Hilbert) into 32 "
    "equal files (NTILE over the key's total order) and report the mean "
    "per-file bounding box over the two bucketed dimensions — exactly "
    "the min/max zone-map a scan consults, so smaller boxes = more "
    "files skipped by a 2-D predicate.  Quantifies WHY the space-"
    "filling keys exist instead of asserting it: natural order spans "
    "the full o_totalprice range in every file; Hilbert's boxes beat "
    "Z-order's (no bit-interleave jumps).  Exact integer spans, one "
    "final division; the NTILE total order is (key, o_orderkey), so "
    "files are deterministic.  The audit's global sort is inherent to "
    "the metric — at 100 TB it is the same range-partitioned sort the "
    "layout rewrite itself pays.",
    expects_bnlj=True,  # 1-row stats broadcast under each bucketing
    expects_broadcast="1-row min/max bounds",
)
def layout_clustering_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    stats = o.agg(
        F.min(F.col("o_custkey").cast("double")).alias("lo0"),
        F.max(F.col("o_custkey").cast("double")).alias("hi0"),
        F.min(F.col("o_totalprice").cast("double")).alias("lo1"),
        F.max(F.col("o_totalprice").cast("double")).alias("hi1"),
    )
    n = 1 << _BITS

    def bucket(v: str, lo: str, hi: str):
        raw = F.floor(
            (F.col(v).cast("double") - F.col(lo))
            / ((F.col(hi) - F.col(lo)) / F.lit(float(n)))
        ).cast("long")
        return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))

    bkt = o.join(F.broadcast(stats)).select(
        "o_orderkey",
        bucket("o_custkey", "lo0", "hi0").alias("b0"),
        bucket("o_totalprice", "lo1", "hi1").alias("b1"),
    )
    keyed = (
        bkt.select(
            "o_orderkey", "b0", "b1",
            F.lit("natural").alias("scheme"),
            F.col("o_orderkey").cast("long").alias("key"),
        )
        .unionByName(
            bkt.select(
                "o_orderkey", "b0", "b1",
                F.lit("zorder").alias("scheme"),
                zorder_key([F.col("b0"), F.col("b1")], _BITS).alias("key"),
            )
        )
        .unionByName(
            bkt.select(
                "o_orderkey", "b0", "b1",
                F.lit("hilbert").alias("scheme"),
                hilbert_key(F.col("b0"), F.col("b1"), _BITS).alias("key"),
            )
        )
    )
    w = Window.partitionBy("scheme").orderBy("key", "o_orderkey")
    boxes = (
        keyed.withColumn("file_id", F.ntile(_N_FILES).over(w))
        .groupBy("scheme", "file_id")
        .agg(
            (F.max("b0") - F.min("b0") + 1).alias("span0"),
            (F.max("b1") - F.min("b1") + 1).alias("span1"),
        )
    )
    return boxes.groupBy("scheme").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.round(
            F.sum(F.col("span0") * F.col("span1")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_box_area"),
        F.round(F.sum("span0").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_b0_span"
        ),
        F.round(F.sum("span1").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_b1_span"
        ),
    )
