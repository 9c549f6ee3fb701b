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
