"""Physical-layout operators: bucketed co-located joins must run with zero
shuffles; salted aggregation/join must equal their unsalted results."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from heparchy_spark.operators.layout import (
    bucketed_join_ready,
    salted_groupby_count,
    salted_join,
    write_bucketed,
)
from heparchy_spark.plans import shuffle_count
from heparchy_spark.queries.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_zero_shuffle(spark):
    o = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    write_bucketed(o, "t_orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        num_buckets=8,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join_ready(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        n = joined.count()
        assert n == li.count()  # every lineitem has its order
        assert shuffle_count(joined) == 0  # co-located: no exchanges
        # the same join on plain parquet shuffles both sides
        plain = o.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        plain.count()
        assert shuffle_count(plain) >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salted_groupby_count_matches_plain(spark):
    li = load(spark, SF_DIR, "lineitem")
    got = {
        r["l_orderkey"]: r["n"]
        for r in salted_groupby_count(li, "l_orderkey", factor=8).collect()
    }
    want = {
        r["l_orderkey"]: r["cnt"]
        for r in li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    got = salted_join(li, o, "l_orderkey", factor=4)
    want = li.join(o, "l_orderkey")
    assert got.count() == want.count()
    g = got.agg(F.sum("l_quantity"), F.sum("o_totalprice")).first()
    w = want.agg(F.sum("l_quantity"), F.sum("o_totalprice")).first()
    assert g[0] == pytest.approx(w[0]) and g[1] == pytest.approx(w[1])


def test_salt_is_content_stable_and_spreads(spark):
    # Re-running the same salted aggregation twice yields identical results
    # (content-derived salt, no rand/monotonic id), and a hot key's rows
    # actually spread across salts.
    import pyspark.sql.functions as F

    from heparchy_spark.operators.layout import _salt, salted_groupby_count

    df = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("payload")
    )
    a = {r["k"]: r["n"] for r in salted_groupby_count(df, "k", 8).collect()}
    b = {r["k"]: r["n"] for r in salted_groupby_count(df, "k", 8).collect()}
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    assert a == b == plain
    n_salts = (
        df.withColumn("s", _salt(df, 8))
        .where(F.col("k") == 0)
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts == 8  # hot key spread over every salt bucket


def test_salted_join_rerun_identical(spark):
    import pyspark.sql.functions as F

    from heparchy_spark.operators.layout import salted_join

    skewed = spark.range(0, 3000).select(
        F.when(F.col("id") < 2800, F.lit(7)).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    c1 = salted_join(skewed, small, "k", factor=4).count()
    c2 = salted_join(skewed, small, "k", factor=4).count()
    plain = skewed.join(small, "k").count()
    assert c1 == c2 == plain


def test_zorder_key_interleaves_bits(spark):
    from heparchy_spark.operators.layout import zorder_key

    df = spark.range(1).select(
        F.lit(0b1011).cast("long").alias("a"), F.lit(0b0110).cast("long").alias("b")
    )
    got = df.select(zorder_key([F.col("a"), F.col("b")], 4).alias("z")).first()["z"]
    # interleave LSB-first: bit j of col i -> position j*2 + i
    want = 0
    for j in range(4):
        want |= ((0b1011 >> j) & 1) << (j * 2 + 0)
        want |= ((0b0110 >> j) & 1) << (j * 2 + 1)
    assert got == want


def test_cluster_by_zorder_tightens_file_stats(spark, tmp_path):
    """Writing in z-order must shrink every clustered column's per-file
    extent vs the natural layout — the property Parquet min/max skipping
    feeds on."""
    import pyarrow.parquet as pq

    from heparchy_spark.operators.layout import cluster_by_zorder

    o = load(spark, SF_DIR, "orders")
    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    # natural order, same file count for a fair comparison
    o.repartition(8).write.mode("overwrite").parquet(plain_dir)
    cluster_by_zorder(
        o, ["o_custkey", "o_totalprice"], bits_per_col=10, num_files=8
    ).write.mode("overwrite").parquet(z_dir)

    def mean_extent(d: str, col: str) -> float:
        import pathlib

        extents = []
        for f in pathlib.Path(d).glob("*.parquet"):
            md = pq.read_metadata(f)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                rgm = md.row_group(rg)
                for ci in range(rgm.num_columns):
                    c = rgm.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                extents.append(float(hi) - float(lo))
        assert extents
        return sum(extents) / len(extents)

    for col in ["o_custkey", "o_totalprice"]:
        plain_e = mean_extent(plain_dir, col)
        z_e = mean_extent(z_dir, col)
        assert z_e < plain_e * 0.7, (col, z_e, plain_e)

    # content preserved
    assert (
        spark.read.parquet(z_dir).count() == o.count()
    )


def test_bloom_file_index_prunes_and_agrees(spark, tmp_path):
    """Bloom file index: a point probe reads a strict subset of files,
    results equal the full-scan filter, and an absent value prunes to
    zero files (no false negatives by construction)."""
    import pyspark.sql.functions as F

    from heparchy_spark.operators.layout import (
        bloom_prune_files,
        read_pruned_by_bloom,
        write_bloom_file_index,
    )
    from heparchy_spark.queries.tables import load

    path = str(tmp_path / "bloomed")
    orders = load(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bloom_file_index(orders, path, "o_orderkey", n_files=8)

    probe = orders.select("o_orderkey").collect()[37].o_orderkey
    files, total = bloom_prune_files(spark, path, "o_orderkey", probe)
    assert total == 8
    assert 1 <= len(files) < total

    got = read_pruned_by_bloom(spark, path, "o_orderkey", probe).collect()
    want = (
        spark.read.parquet(path)
        .where(F.col("o_orderkey") == probe)
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) == 1

    missing_files, _ = bloom_prune_files(
        spark, path, "o_orderkey", -999_999_999
    )
    assert read_pruned_by_bloom(
        spark, path, "o_orderkey", -999_999_999
    ).count() == 0
    assert len(missing_files) <= 1  # at most a false positive, never a miss


# ---------------------------------------------------------------------------
# Hilbert curve layout
# ---------------------------------------------------------------------------


def _xy2d(n_bits: int, x: int, y: int) -> int:
    """Plain-Python Hilbert xy->d (the public reference algorithm) —
    shares nothing with the column-algebra implementation."""
    d = 0
    s = 1 << (n_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_key_exhaustive_bijective_and_local(spark):
    """bits=4: every one of the 256 cells matches the reference value,
    the key is a bijection onto [0, 256), and consecutive keys are grid
    NEIGHBORS (Manhattan distance 1) — the locality property Z-order
    lacks (its power-of-two seam jumps are also asserted)."""
    from heparchy_spark.operators.layout import hilbert_key, zorder_key

    grid = spark.range(256).select(
        (F.col("id") % 16).alias("x"),
        (F.col("id") / 16).cast("long").alias("y"),
    )
    rows = grid.select(
        "x",
        "y",
        hilbert_key(F.col("x"), F.col("y"), 4).alias("d"),
        zorder_key([F.col("x"), F.col("y")], 4).alias("z"),
    ).collect()

    by_d = {}
    for r in rows:
        assert r["d"] == _xy2d(4, r["x"], r["y"]), (r["x"], r["y"])
        by_d[r["d"]] = (r["x"], r["y"])
    assert sorted(by_d) == list(range(256))  # bijection

    def max_step(mapping):
        cells = [mapping[k] for k in sorted(mapping)]
        return max(
            abs(ax - bx) + abs(ay - by)
            for (ax, ay), (bx, by) in zip(cells, cells[1:])
        )

    assert max_step(by_d) == 1  # Hilbert: always a neighbor
    by_z = {r["z"]: (r["x"], r["y"]) for r in rows}
    assert max_step(by_z) > 1  # Morton: seam jumps — why Hilbert exists


def test_cluster_by_hilbert_tightens_file_stats(spark, tmp_path):
    """Hilbert re-layout must shrink per-file extents on BOTH clustered
    columns vs the natural layout (same file count), like Z-order."""
    import pathlib

    import pyarrow.parquet as pq

    from heparchy_spark.operators.layout import cluster_by_hilbert

    o = load(spark, SF_DIR, "orders")
    plain_dir = str(tmp_path / "plain")
    h_dir = str(tmp_path / "hilbert")
    o.repartition(8).write.mode("overwrite").parquet(plain_dir)
    cluster_by_hilbert(
        o, ["o_custkey", "o_totalprice"], bits_per_col=10, num_files=8
    ).write.mode("overwrite").parquet(h_dir)

    def mean_extent(d: str, col: str) -> float:
        extents = []
        for f in pathlib.Path(d).glob("*.parquet"):
            md = pq.read_metadata(f)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                rgm = md.row_group(rg)
                for ci in range(rgm.num_columns):
                    c = rgm.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                extents.append(float(hi) - float(lo))
        assert extents
        return sum(extents) / len(extents)

    for col in ["o_custkey", "o_totalprice"]:
        assert mean_extent(h_dir, col) < mean_extent(plain_dir, col) * 0.7

    assert spark.read.parquet(h_dir).count() == o.count()
    with pytest.raises(ValueError):
        cluster_by_hilbert(o, ["o_custkey"], bits_per_col=4)


def _skilling_index(xs: list[int], bits: int) -> int:
    """Plain-Python Skilling AxesToTranspose + interleave (the public
    algorithm, AIP Conf. Proc. 707) — independent mirror."""
    x = list(xs)
    n = len(x)
    m = 1 << (bits - 1)
    q = m
    while q > 1:
        p = q - 1
        for i in range(n):
            if x[i] & q:
                x[0] ^= p
            else:
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q >>= 1
    for i in range(1, n):
        x[i] ^= x[i - 1]
    t = 0
    q = m
    while q > 1:
        if x[n - 1] & q:
            t ^= q - 1
        q >>= 1
    x = [v ^ t for v in x]
    # MSB-first interleave, x0 most significant
    d = 0
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            d = (d << 1) | ((x[i] >> j) & 1)
    return d


def test_hilbert_nd_exhaustive_bijective_and_local(spark):
    """3-D, bits=3: all 512 cells match the Skilling mirror, the key is
    a bijection onto [0, 512), and consecutive keys are grid neighbors
    (Manhattan distance 1) — the k-D Hilbert guarantee."""
    from heparchy_spark.operators.layout import hilbert_key_nd

    grid = spark.range(512).select(
        (F.col("id") % 8).alias("x"),
        ((F.col("id") / 8).cast("long") % 8).alias("y"),
        (F.col("id") / 64).cast("long").alias("z"),
    )
    rows = grid.select(
        "x", "y", "z",
        hilbert_key_nd([F.col("x"), F.col("y"), F.col("z")], 3).alias("d"),
    ).collect()

    by_d = {}
    for r in rows:
        assert r["d"] == _skilling_index([r["x"], r["y"], r["z"]], 3), (
            r["x"], r["y"], r["z"],
        )
        by_d[r["d"]] = (r["x"], r["y"], r["z"])
    assert sorted(by_d) == list(range(512))  # bijection

    cells = [by_d[k] for k in sorted(by_d)]
    assert all(
        sum(abs(a - b) for a, b in zip(c1, c2)) == 1
        for c1, c2 in zip(cells, cells[1:])
    )  # every consecutive pair is a grid neighbor

    with pytest.raises(ValueError):
        hilbert_key_nd([F.col("x")], 3)
    with pytest.raises(ValueError):
        hilbert_key_nd([F.col("x")] * 3, 21)  # 63 > 62 key bits


def test_cluster_by_hilbert_3d_roundtrip(spark, tmp_path):
    """k=3 re-layout preserves content and routes through the nd key."""
    from heparchy_spark.operators.layout import cluster_by_hilbert

    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    out = cluster_by_hilbert(
        li, ["l_partkey", "l_quantity", "l_extendedprice"],
        bits_per_col=8, num_files=4,
    )
    d = str(tmp_path / "h3")
    out.write.mode("overwrite").parquet(d)
    got = spark.read.parquet(d)
    assert got.count() == li.count()
    assert sorted(got.columns) == sorted(li.columns)
