"""Physics query corpus: anti-kT jet clustering over hash-synthesized
per-event particles (operators/jets.py) — the reference domain's canonical
reconstruction step, exercised on the driver's ``events`` table the same
way the multimodal corpus synthesizes payloads from ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.queries import expected_fixture_sql, register
from heparchy_spark.queries.tables import load


@register(
    "physics_antikt_jets",
    expected_fixture_sql("physics_antikt_jets"),
    doc="Anti-kT (R=0.4, ptmin=5) inclusive jets per 200-particle "
    "collision event: sequential recombination runs INSIDE one "
    "applyInPandas group per event while events fan out across "
    "executors — one shuffle on the event key, bounded per-group state. "
    "Particles are hash-synthesized from event_id (exact JVM xxhash64 "
    "words -> NumPy kinematics); the plain-Python/NumPy mirror in "
    "tools/build_expected.py replays the identical merge trajectory.",
)
def physics_antikt_jets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.jets import antikt_jets

    ev = load(spark, sf_dir, "events")
    return antikt_jets(ev, "event_id", particles_per_event=200)


def _event_shapes_sql() -> str:
    from heparchy_spark.queries.numeric import sql_dsum

    u = lambda j: (  # noqa: E731
        f"CAST(('0x' || substr(sha256(CAST(event_id AS VARCHAR) || 'p{j}'),"
        f" 1, 12)) AS BIGINT) / 281474976710656.0"
    )
    return f"""
    WITH p AS (
      SELECT event_id // 200 AS jev,  -- '//' truncates like Spark's cast
             20.0 * ({u(1)} - 0.5) AS px,
             20.0 * ({u(2)} - 0.5) AS py,
             40.0 * ({u(3)} - 0.5) AS pz
      FROM events
    ),
    t AS (
      SELECT jev, COUNT(*) AS n_particles,
             {sql_dsum('ROUND(sqrt(px*px + py*py), 4)', 4)} AS sum_pt,
             {sql_dsum('ROUND(px*px, 8)', 8)} AS sxx,
             {sql_dsum('ROUND(py*py, 8)', 8)} AS syy,
             {sql_dsum('ROUND(pz*pz, 8)', 8)} AS szz,
             {sql_dsum('ROUND(px*py, 8)', 8)} AS sxy,
             {sql_dsum('ROUND(px*pz, 8)', 8)} AS sxz,
             {sql_dsum('ROUND(py*pz, 8)', 8)} AS syz
      FROM p GROUP BY jev
    ),
    m AS (
      SELECT jev, n_particles, sum_pt,
             ROUND(sxx / (sxx + syy + szz), 8) AS a,
             ROUND(syy / (sxx + syy + szz), 8) AS b,
             ROUND(szz / (sxx + syy + szz), 8) AS c,
             ROUND(sxy / (sxx + syy + szz), 8) AS d,
             ROUND(sxz / (sxx + syy + szz), 8) AS f,
             ROUND(syz / (sxx + syy + szz), 8) AS g
      FROM t
    ),
    eig AS (
      SELECT jev, n_particles, sum_pt, a, b, c, d, f, g,
             (a + b + c) / 3.0 AS q,
             sqrt(((a - (a + b + c) / 3.0) * (a - (a + b + c) / 3.0)
                 + (b - (a + b + c) / 3.0) * (b - (a + b + c) / 3.0)
                 + (c - (a + b + c) / 3.0) * (c - (a + b + c) / 3.0)
                 + 2.0 * (d * d + f * f + g * g)) / 6.0) AS pp
      FROM m
    ),
    ang AS (
      SELECT jev, n_particles, sum_pt, q, pp,
             acos(LEAST(1.0, GREATEST(-1.0,
               ((a - q) * ((b - q) * (c - q) - g * g)
                - d * (d * (c - q) - g * f)
                + f * (d * g - (b - q) * f)) / (2.0 * pp * pp * pp)
             ))) / 3.0 AS phi
      FROM eig
    )
    SELECT jev AS jet_event, n_particles, sum_pt,
           ROUND(1.5 * (3.0 * q - (q + 2.0 * pp * cos(phi))), 6)
             AS sphericity,
           ROUND(1.5 * (q + 2.0 * pp * cos(phi + 2.0943951023931953)), 6)
             AS aplanarity
    FROM ang
    """


@register(
    "physics_event_shapes",
    _event_shapes_sql(),
    doc="Event-shape observables per 200-particle collision event: "
    "sphericity 1.5(l2+l3) and aplanarity 1.5*l3 from the eigenvalues of "
    "the normalized momentum tensor S_ab = sum(p_a p_b)/sum(|p|^2) — "
    "PURE column algebra end to end: sha256-prefix uniform momenta "
    "(engine-portable, the dataset-sampling technique), ONE combinable "
    "aggregation (6 tensor sums + norm + pt, round-8 decimal "
    "accumulation), then the closed-form trigonometric eigensolver for "
    "symmetric 3x3 on the grouped frame.  No UDF, no fixture: the oracle "
    "is the identical formula in ANSI SQL; transcendental 1-ulp engine "
    "drift is absorbed by the round-6 output grid.",
)
def physics_event_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from heparchy_spark.queries.numeric import dsum

    ev = load(spark, sf_dir, "events")

    def u(j: int):
        h = F.sha2(
            F.concat(F.col("event_id").cast("string"), F.lit(f"p{j}")), 256
        )
        return F.conv(F.substring(h, 1, 12), 16, 10).cast("long") / F.lit(
            281474976710656.0
        )

    p = ev.select(
        (F.col("event_id") / F.lit(200)).cast("long").alias("jev"),
        (F.lit(20.0) * (u(1) - F.lit(0.5))).alias("px"),
        (F.lit(20.0) * (u(2) - F.lit(0.5))).alias("py"),
        (F.lit(40.0) * (u(3) - F.lit(0.5))).alias("pz"),
    )
    px, py, pz = F.col("px"), F.col("py"), F.col("pz")
    t = p.groupBy("jev").agg(
        F.count(F.lit(1)).alias("n_particles"),
        dsum(F.round(F.sqrt(px * px + py * py), 4), 4).alias("sum_pt"),
        dsum(F.round(px * px, 8), 8).alias("sxx"),
        dsum(F.round(py * py, 8), 8).alias("syy"),
        dsum(F.round(pz * pz, 8), 8).alias("szz"),
        dsum(F.round(px * py, 8), 8).alias("sxy"),
        dsum(F.round(px * pz, 8), 8).alias("sxz"),
        dsum(F.round(py * pz, 8), 8).alias("syz"),
    )
    tr = F.col("sxx") + F.col("syy") + F.col("szz")
    m = t.select(
        "jev",
        "n_particles",
        "sum_pt",
        F.round(F.col("sxx") / tr, 8).alias("a"),
        F.round(F.col("syy") / tr, 8).alias("b"),
        F.round(F.col("szz") / tr, 8).alias("c"),
        F.round(F.col("sxy") / tr, 8).alias("d"),
        F.round(F.col("sxz") / tr, 8).alias("f"),
        F.round(F.col("syz") / tr, 8).alias("g"),
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    d, f_, g = F.col("d"), F.col("f"), F.col("g")
    q = (a + b + c) / F.lit(3.0)
    eig = m.select(
        "jev",
        "n_particles",
        "sum_pt",
        a, b, c, d, f_, g,
        q.alias("q"),
        F.sqrt(
            (
                (a - q) * (a - q)
                + (b - q) * (b - q)
                + (c - q) * (c - q)
                + F.lit(2.0) * (d * d + f_ * f_ + g * g)
            )
            / F.lit(6.0)
        ).alias("pp"),
    )
    qc, pp = F.col("q"), F.col("pp")
    det = (
        (a - qc) * ((b - qc) * (c - qc) - g * g)
        - d * (d * (c - qc) - g * f_)
        + f_ * (d * g - (b - qc) * f_)
    )
    ang = eig.select(
        "jev",
        "n_particles",
        "sum_pt",
        qc.alias("q"),
        pp.alias("pp"),
        (
            F.acos(
                F.least(
                    F.lit(1.0),
                    F.greatest(
                        F.lit(-1.0), det / (F.lit(2.0) * pp * pp * pp)
                    ),
                )
            )
            / F.lit(3.0)
        ).alias("phi"),
    )
    qc, pp, phi = F.col("q"), F.col("pp"), F.col("phi")
    l1 = qc + F.lit(2.0) * pp * F.cos(phi)
    l3 = qc + F.lit(2.0) * pp * F.cos(phi + F.lit(2.0943951023931953))
    return ang.select(
        F.col("jev").alias("jet_event"),
        "n_particles",
        "sum_pt",
        F.round(F.lit(1.5) * (F.lit(3.0) * qc - l1), 6).alias("sphericity"),
        F.round(F.lit(1.5) * l3, 6).alias("aplanarity"),
    )
