"""Physics column expressions over the (px, py, pz, e) four-momentum model.

The reference stores ``pmu`` and leaves all kinematics to caller-side NumPy
(SURVEY.md §2.9); here they are pure Column algebra — JVM codegen, no UDFs —
usable per-particle or under ``groupBy(event)`` sums for event-level
kinematics (e.g. invariant mass of summed momenta).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def pt(px: Column | str = "px", py: Column | str = "py") -> Column:
    """Transverse momentum sqrt(px^2 + py^2)."""
    return F.hypot(_c(px), _c(py))


def phi(px: Column | str = "px", py: Column | str = "py") -> Column:
    """Azimuthal angle atan2(py, px) in (-pi, pi]."""
    return F.atan2(_c(py), _c(px))


def eta(
    px: Column | str = "px",
    py: Column | str = "py",
    pz: Column | str = "pz",
) -> Column:
    """Pseudorapidity: asinh(pz / pt)."""
    return F.asinh(_c(pz) / pt(px, py))


def rapidity(e: Column | str = "e", pz: Column | str = "pz") -> Column:
    """Rapidity 0.5 * ln((E + pz) / (E - pz))."""
    return 0.5 * F.log((_c(e) + _c(pz)) / (_c(e) - _c(pz)))


def inv_mass(
    px: Column | str = "px",
    py: Column | str = "py",
    pz: Column | str = "pz",
    e: Column | str = "e",
) -> Column:
    """Invariant mass sqrt(max(E^2 - |p|^2, 0))."""
    m2 = _c(e) ** 2 - _c(px) ** 2 - _c(py) ** 2 - _c(pz) ** 2
    return F.sqrt(F.greatest(m2, F.lit(0.0)))
