"""Cross-engine float determinism helpers.

Summing doubles is order-dependent; Spark's partial aggregation order differs
run-to-run and from DuckDB's.  Two-layer fix:

1. **Exact accumulation**: cast each addend to ``DECIMAL(38,10)`` and sum in
   decimal on BOTH engines.  Both Spark (``BigDecimal.valueOf`` — shortest
   string repr) and DuckDB produce the identical per-row decimal, so the sums
   are identical decimals.
2. **Grid rounding**: the final decimal->double conversion can still differ by
   1 ulp (DuckDB double-rounds hugeint/10^scale).  So we ROUND the double to
   the *intrinsic decimal grid* of the data (e.g. prices are 2-decimal, so a
   sum of prices is exactly on the 2-decimal grid): an on-grid value is never
   at a rounding midpoint, and 1 ulp of error is absorbed.

    Spark : round(F.sum(expr.cast(DEC)).cast("double"), grid)
    DuckDB: ROUND(CAST(SUM(CAST(expr AS DECIMAL(38,10))) AS DOUBLE), grid)

Pick ``grid`` >= the number of decimal digits of the addends (qty/price: 2,
price*(1-disc): 4, price*(1-disc)*(1+tax): 6, arbitrary doubles: 6).
Averages divide the identical sum-double by the identical count and round to
6 (midpoint-straddle probability ~ulp/grid, negligible).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

DEC = "decimal(38,10)"
AVG_GRID = 6


def _col(expr: Column | str) -> Column:
    return F.col(expr) if isinstance(expr, str) else expr


def dsum(expr: Column | str, grid: int = 4) -> Column:
    """Order-independent double sum: exact decimal accumulation + grid round."""
    return F.round(F.sum(_col(expr).cast(DEC)).cast("double"), grid)


def davg(expr: Column | str) -> Column:
    """Order-independent double average: decimal-sum / count, rounded."""
    c = _col(expr)
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), AVG_GRID)


def sql_dsum(expr: str, grid: int = 4) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS DOUBLE), {grid})"
    )


def sql_davg(expr: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS DOUBLE)"
        f" / COUNT({expr}), {AVG_GRID})"
    )


# ---------------------------------------------------------------------------
# Exact scaled-LONG sums — the fast path beside dsum's decimal accumulation
# ---------------------------------------------------------------------------
#
# Decimal(38,10) aggregation is exact but walks Spark's BigDecimal-backed
# buffer (~12x slower than a long sum, measured on a 600k-row 13-agg scan).
# When the addends snap to a fixed 10^-scale grid, summing the SCALED
# INTEGERS is just as exact and stays inside whole-stage codegen.  A single
# long sum overflows silently once |sum of a| >= 2^63, so the addend is
# split at 2^31 (two's-complement identity a = (a >> 31)*2^31 + (a & mask),
# valid for negative a too) and the two per-partition-combinable long sums
# are recombined in decimal on the FINAL aggregate row only.
#
# Exactness envelope: per group, n * 2^31 < 2^63 (the lo-sum bound) and
# n * max|a >> 31| < 2^63 — i.e. n < 4.3e9 rows per group with addends up
# to |a| ~ 2^62.  Beyond that envelope (e.g. a 100 TB global sum), use
# dsum / a deeper split; the two forms produce the SAME exact integer, so
# swapping them never changes a value hash.
#
# DuckDB mirror: SUM(BIGINT) accumulates in HUGEINT (exact, no split
# needed) — ``sql_xsum`` is just CAST(SUM(a) AS DOUBLE)/10^scale.  Both
# engines convert the identical exact integer to double (IEEE nearest) and
# divide by the same power of ten (one correctly-rounded op), so the
# moment doubles are bit-identical.

_SPLIT_POW = 31
_SPLIT = 1 << _SPLIT_POW
_SPLIT_MASK = _SPLIT - 1


def scaled_long(expr: Column | str, scale: int) -> Column:
    """Snap a double expression to the 10^-scale grid as a LONG, via
    ``floor(v * 10^scale + 0.5)`` — the half-toward-+inf tie rule.

    floor, not ``round``: Spark's round on doubles allocates a BigDecimal
    per value (measured ~3.5x slower on a 12-snap scan), while floor is
    one Math.floor.  Both engines evaluate the IDENTICAL double ops
    (multiply, add, floor), so the snapped integers agree bit-for-bit by
    construction — no shortest-repr-vs-binary rounding analysis needed.
    """
    return F.floor(
        _col(expr) * F.lit(float(10**scale)) + F.lit(0.5)
    ).cast("long")


def sql_scaled_long(expr: str, scale: int) -> str:
    return (
        f"CAST(FLOOR(({expr}) * {float(10 ** scale)!r} + 0.5) AS BIGINT)"
    )


def xsum(scaled: Column, scale: int) -> Column:
    """Exact order-independent sum of ``scaled_long`` addends, as the
    double of (exact integer sum) / 10^scale.  See the envelope note
    above; outside it use :func:`dsum`."""
    hi = F.sum(F.shiftright(scaled, _SPLIT_POW))
    lo = F.sum(scaled.bitwiseAND(F.lit(_SPLIT_MASK)))
    tot = (
        hi.cast("decimal(38,0)") * F.lit(_SPLIT).cast("decimal(38,0)")
        + lo.cast("decimal(38,0)")
    )
    return tot.cast("double") / F.lit(float(10**scale))


def sql_xsum(scaled_expr: str, scale: int) -> str:
    """DuckDB twin of :func:`xsum`: HUGEINT accumulation needs no split."""
    return (
        f"(CAST(SUM({scaled_expr}) AS DOUBLE) / {float(10 ** scale)!r})"
    )


def xavg(scaled: Column, scale: int) -> Column:
    """Exact-sum average on the xsum fast path: identical to davg when
    the addends sit on the 10^-scale grid (same exact rational, same
    nearest-double, same round-6)."""
    return F.round(xsum(scaled, scale) / F.count(scaled), AVG_GRID)


def sql_xavg(scaled_expr: str, scale: int) -> str:
    return (
        f"ROUND({sql_xsum(scaled_expr, scale)}"
        f" / COUNT({scaled_expr}), {AVG_GRID})"
    )
