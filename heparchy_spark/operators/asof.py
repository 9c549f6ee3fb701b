"""As-of (nearest-predecessor) join — [ext] operator, SURVEY.md §2.5.

Semantics: for every left row, attach the right row with the greatest
``on`` value that is <= (backward) or >= (forward) the left row's ``on``,
within the same ``by`` group.  This is pandas ``merge_asof`` re-expressed
for distributed execution.

Strategy (scale rationale): a naive range join explodes to |L|x|R| pairs per
group before aggregation.  Instead we UNION the two inputs, shuffle ONCE on
``by``, sort within each partition by (on, side), and carry the latest right
value forward with ``last(..., ignorenulls=True)`` over a running window.
Cost is one shuffle + one sort of |L|+|R| rows — the same shape as a single
window aggregate, and AQE handles skewed ``by`` keys.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_cols: Mapping[str, str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Attach, to each left row, columns from the as-of matching right row.

    Parameters
    ----------
    on : ordering column name (present in both inputs, comparable type).
    by : equi-group column(s) present in both inputs.
    right_cols : mapping {right column -> output alias}.
    direction : "backward" (match latest right with on <= left.on) or
        "forward" (earliest right with on >= left.on).
    allow_exact_matches : if False, use strict < / > instead of <= / >=.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by_cols = [by] if isinstance(by, str) else list(by)

    left_payload = [c for c in left.columns if c not in set(by_cols) | {on}]
    # Side marker: with exact matches a right row at the same `on` must be
    # visible to the left row, i.e. sort before it (either direction); the
    # strict variant sorts it after.
    exact = 0 if allow_exact_matches else 1
    # All right payload columns travel as ONE struct: the struct itself is
    # non-null for every right row even when individual fields are null, so
    # last(ignorenulls=True) picks the whole matched row atomically.
    # Per-column last() would skip a null field and substitute the value
    # from an OLDER right row (pandas merge_asof returns the matched row's
    # null instead — and different columns could even come from different
    # right rows).
    from pyspark.sql.types import StructField, StructType

    r_struct_type = StructType(
        [StructField(rc, right.schema[rc].dataType) for rc in right_cols]
    )
    l_tag = (
        left.select(
            *by_cols,
            F.col(on).alias("__on"),
            F.lit(1 - exact).alias("__side"),
            F.lit(True).alias("__is_left"),
            *[F.col(c) for c in left_payload],
            F.lit(None).cast(r_struct_type).alias("__r_row"),
        )
    )
    r_tag = (
        right.select(
            *by_cols,
            F.col(on).alias("__on"),
            F.lit(exact).alias("__side"),
            F.lit(False).alias("__is_left"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_payload],
            F.struct(
                *[F.col(rc).alias(rc) for rc in right_cols]
            ).alias("__r_row"),
        )
    )
    unioned = l_tag.unionByName(r_tag)

    order = [F.col("__on").asc(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col("__on").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("__r_row"), ignorenulls=True).over(w)
    carried = unioned.select(
        *by_cols,
        "__on",
        "__is_left",
        *left_payload,
        *[
            matched.getField(rc).alias(alias)
            for rc, alias in right_cols.items()
        ],
    )
    return (
        carried.where(F.col("__is_left"))
        .drop("__is_left")
        .withColumnRenamed("__on", on)
    )
