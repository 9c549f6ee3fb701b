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
