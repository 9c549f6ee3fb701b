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


@register(
    "physics_ca_jets",
    expected_fixture_sql("physics_ca_jets"),
    doc="Cambridge/Aachen (generalized-kT p=0) inclusive jets over the "
    "same hash-synthesized 200-particle events as physics_antikt_jets: "
    "the purely geometric member of the family (d_ij = dR^2/R^2, "
    "d_iB = 1), the substructure-analysis algorithm.  Same Spark shape — "
    "one applyInPandas group per event, events fan out — exercising the "
    "p parameter of the shared incremental kernel; the plain-NumPy "
    "mirror replays the identical merge trajectory.",
)
def physics_ca_jets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.jets import genkt_jets

    ev = load(spark, sf_dir, "events")
    return genkt_jets(ev, "event_id", particles_per_event=200, p=0.0)


def _dijet_sql() -> str:
    from heparchy_spark.queries import _EXPECTED_DIR

    jets = _EXPECTED_DIR / "physics_antikt_jets.parquet"
    # cosh/sinh via exp on BOTH engines (DuckDB lacks cosh); every
    # four-vector component rounds to 8 before combination so 1-ulp
    # transcendental drift between engines dies before the cancellation
    # in the invariant-mass subtraction
    return f"""
    WITH lead AS (
      SELECT jet_event,
             max(CASE WHEN jet_rank = 1 THEN jet_pt END) AS pt1,
             max(CASE WHEN jet_rank = 1 THEN jet_y END) AS y1,
             max(CASE WHEN jet_rank = 1 THEN jet_phi END) AS phi1,
             max(CASE WHEN jet_rank = 1 THEN jet_mass END) AS m1,
             max(CASE WHEN jet_rank = 2 THEN jet_pt END) AS pt2,
             max(CASE WHEN jet_rank = 2 THEN jet_y END) AS y2,
             max(CASE WHEN jet_rank = 2 THEN jet_phi END) AS phi2,
             max(CASE WHEN jet_rank = 2 THEN jet_mass END) AS m2,
             COUNT(*) AS nj
      FROM read_parquet('{jets}') WHERE jet_rank <= 2
      GROUP BY jet_event
    ),
    four AS (
      SELECT jet_event, pt1, pt2, y1, y2, phi1, phi2,
             ROUND(pt1 * cos(phi1), 8) AS px1,
             ROUND(pt1 * sin(phi1), 8) AS py1,
             ROUND(sqrt(m1*m1 + pt1*pt1) * (exp(y1) - exp(-y1)) / 2.0, 8)
               AS pz1,
             ROUND(sqrt(m1*m1 + pt1*pt1) * (exp(y1) + exp(-y1)) / 2.0, 8)
               AS e1,
             ROUND(pt2 * cos(phi2), 8) AS px2,
             ROUND(pt2 * sin(phi2), 8) AS py2,
             ROUND(sqrt(m2*m2 + pt2*pt2) * (exp(y2) - exp(-y2)) / 2.0, 8)
               AS pz2,
             ROUND(sqrt(m2*m2 + pt2*pt2) * (exp(y2) + exp(-y2)) / 2.0, 8)
               AS e2
      FROM lead WHERE nj = 2
    )
    SELECT jet_event,
           ROUND(sqrt(GREATEST(
             (e1 + e2) * (e1 + e2) - (px1 + px2) * (px1 + px2)
             - (py1 + py2) * (py1 + py2) - (pz1 + pz2) * (pz1 + pz2),
             0.0)), 4) AS m_jj,
           ROUND(CASE WHEN abs(phi1 - phi2) > 3.141592653589793
                      THEN 6.283185307179586 - abs(phi1 - phi2)
                      ELSE abs(phi1 - phi2) END, 6) AS delta_phi,
           ROUND(abs(y1 - y2), 6) AS delta_y,
           ROUND(pt2 / pt1, 6) AS pt_ratio
    FROM four
    """


@register(
    "physics_dijet_mass",
    _dijet_sql(),
    doc="Leading-dijet system per event from the anti-kT jets: invariant "
    "mass m_jj, wrapped delta-phi, delta-y, and pt balance of the two "
    "highest-pt jets (events with >= 2 jets).  Composition shape: the "
    "clustered jet table (bounded — a few jets per event) feeds a "
    "conditional-aggregation pivot and closed-form kinematics, all "
    "column algebra; the oracle replays the identical formulas in SQL "
    "over the committed anti-kT fixture, so the jet-finder and the "
    "downstream analysis are verified independently.",
)
def physics_dijet_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from heparchy_spark.operators.jets import antikt_jets

    ev = load(spark, sf_dir, "events")
    jets = antikt_jets(ev, "event_id", particles_per_event=200).where(
        F.col("jet_rank") <= 2
    )

    def pick(col: str, rank: int):
        return F.max(
            F.when(F.col("jet_rank") == rank, F.col(col))
        ).alias(f"{col[4:] if col.startswith('jet_') else col}{rank}")

    lead = jets.groupBy("jet_event").agg(
        pick("jet_pt", 1), pick("jet_y", 1), pick("jet_phi", 1),
        pick("jet_mass", 1),
        pick("jet_pt", 2), pick("jet_y", 2), pick("jet_phi", 2),
        pick("jet_mass", 2),
        F.count(F.lit(1)).alias("nj"),
    ).where(F.col("nj") == 2)

    def four(r: int):
        pt, yy = F.col(f"pt{r}"), F.col(f"y{r}")
        phi, m = F.col(f"phi{r}"), F.col(f"mass{r}")
        mt = F.sqrt(m * m + pt * pt)
        return [
            F.round(pt * F.cos(phi), 8).alias(f"px{r}"),
            F.round(pt * F.sin(phi), 8).alias(f"py{r}"),
            F.round(mt * (F.exp(yy) - F.exp(-yy)) / F.lit(2.0), 8).alias(
                f"pz{r}"
            ),
            F.round(mt * (F.exp(yy) + F.exp(-yy)) / F.lit(2.0), 8).alias(
                f"e{r}"
            ),
        ]

    f4 = lead.select(
        "jet_event", "pt1", "pt2", "y1", "y2", "phi1", "phi2",
        *four(1), *four(2),
    )
    e_s = F.col("e1") + F.col("e2")
    px_s = F.col("px1") + F.col("px2")
    py_s = F.col("py1") + F.col("py2")
    pz_s = F.col("pz1") + F.col("pz2")
    dphi = F.abs(F.col("phi1") - F.col("phi2"))
    return f4.select(
        "jet_event",
        F.round(
            F.sqrt(
                F.greatest(
                    e_s * e_s - px_s * px_s - py_s * py_s - pz_s * pz_s,
                    F.lit(0.0),
                )
            ),
            4,
        ).alias("m_jj"),
        F.round(
            F.when(
                dphi > F.lit(3.141592653589793),
                F.lit(6.283185307179586) - dphi,
            ).otherwise(dphi),
            6,
        ).alias("delta_phi"),
        F.round(F.abs(F.col("y1") - F.col("y2")), 6).alias("delta_y"),
        F.round(F.col("pt2") / F.col("pt1"), 6).alias("pt_ratio"),
    )


@register(
    "physics_softdrop_jets",
    expected_fixture_sql("physics_softdrop_jets"),
    doc="Soft-drop-groomed fat jets (Larkoski et al. 2014, zcut=0.1 "
    "beta=0 — the mMDT point; R=0.8, pt >= 30): Cambridge/Aachen "
    "clustering with the merge TREE recorded, then the grooming walk "
    "that strips soft wide-angle branches until a split passes "
    "z >= zcut (dR/R)^beta, reporting groomed pt/mass and the z_g/r_g "
    "substructure observables.  Same per-event applyInPandas fan-out "
    "as physics_antikt_jets; the plain-NumPy mirror replays every "
    "merge AND every grooming decision bit-exact.",
)
def physics_softdrop_jets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.jets import softdrop_jets

    ev = load(spark, sf_dir, "events")
    return softdrop_jets(ev, "event_id", particles_per_event=200)


# ---------------------------------------------------------------------------
# physics_event_ht_met — per-event HT / missing-ET observables
# ---------------------------------------------------------------------------


def _ht_met_sql() -> str:
    from heparchy_spark.queries.numeric import sql_scaled_long, sql_xsum

    u = lambda j: (  # noqa: E731
        f"CAST(('0x' || substr(sha256(CAST(event_id AS VARCHAR) || 'p{j}'),"
        f" 1, 12)) AS BIGINT) / 281474976710656.0"
    )
    return f"""
    WITH p AS (
      SELECT event_id // 200 AS jev,
             20.0 * ({u(1)} - 0.5) AS px,
             20.0 * ({u(2)} - 0.5) AS py
      FROM events
    ),
    t AS (
      SELECT jev, COUNT(*) AS n_particles,
             {sql_xsum(sql_scaled_long('sqrt(px*px + py*py)', 8), 8)} AS ht,
             {sql_xsum(sql_scaled_long('px', 8), 8)} AS spx,
             {sql_xsum(sql_scaled_long('py', 8), 8)} AS spy,
             MAX({sql_scaled_long('sqrt(px*px + py*py)', 8)}) AS lead_s
      FROM p GROUP BY jev
    )
    SELECT jev AS jet_event, n_particles,
           ROUND(ht, 4) AS ht,
           ROUND(sqrt(spx * spx + spy * spy), 6) AS met,
           ROUND(atan2(spy, spx), 6) AS met_phi,
           ROUND((CAST(lead_s AS DOUBLE) / 100000000.0) / ht, 6)
             AS lead_pt_frac
    FROM t
    """


@register(
    "physics_event_ht_met",
    _ht_met_sql(),
    doc="Per-event scalar-sum pt (HT), missing transverse momentum "
    "(magnitude + azimuth of -sum p_T, reported as the recoil vector "
    "sum), and the leading particle's HT fraction — the trigger-level "
    "observables computed BEFORE any clustering.  Same engine-portable "
    "sha256-prefix momenta as physics_event_shapes; the three sums ride "
    "the exact split-long path (numeric.xsum, grid 1e-8) so every "
    "aggregate is an exact integer and atan2/sqrt 1-ulp engine drift is "
    "absorbed by the round-6 grid.  ONE combinable aggregation per "
    "event — the 100 TB shape is identical.",
)
def physics_event_ht_met(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from heparchy_spark.queries.numeric import scaled_long, xsum
    from heparchy_spark.queries.tables import load

    ev = load(spark, sf_dir, "events")

    def u(j: int):
        return (
            F.conv(
                F.substring(
                    F.sha2(
                        F.concat(
                            F.col("event_id").cast("string"), F.lit(f"p{j}")
                        ),
                        256,
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            / F.lit(281474976710656.0)
        )
    px = F.lit(20.0) * (u(1) - F.lit(0.5))
    py = F.lit(20.0) * (u(2) - F.lit(0.5))
    pt = F.sqrt(px * px + py * py)
    p = ev.select(
        F.expr("event_id div 200").alias("jev"),
        px.alias("px"),
        py.alias("py"),
        pt.alias("pt"),
    )
    t = p.groupBy("jev").agg(
        F.count(F.lit(1)).alias("n_particles"),
        xsum(scaled_long(F.col("pt"), 8), 8).alias("ht"),
        xsum(scaled_long(F.col("px"), 8), 8).alias("spx"),
        xsum(scaled_long(F.col("py"), 8), 8).alias("spy"),
        F.max(scaled_long(F.col("pt"), 8)).alias("lead_s"),
    )
    return t.select(
        F.col("jev").alias("jet_event"),
        "n_particles",
        F.round(F.col("ht"), 4).alias("ht"),
        F.round(
            F.sqrt(F.col("spx") * F.col("spx") + F.col("spy") * F.col("spy")),
            6,
        ).alias("met"),
        F.round(F.atan2(F.col("spy"), F.col("spx")), 6).alias("met_phi"),
        F.round(
            (F.col("lead_s").cast("double") / F.lit(1e8)) / F.col("ht"), 6
        ).alias("lead_pt_frac"),
    )
