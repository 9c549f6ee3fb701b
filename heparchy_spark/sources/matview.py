"""Incremental view maintenance (IVM) — a materialized grouped aggregate
kept in sync with an append-only ``SnapshotTable`` by folding in only the
NEW rows of each refresh.

The warehouse pattern: a 100 TB fact table gets a few GB of appends per
cycle, and the dashboard aggregate must not re-scan history to stay
fresh.  With combinable aggregates (sum/count/min/max — Spark's own
partial-aggregation algebra) the delta's partial aggregate merges into
the stored state exactly like map-side partials merge into reduce-side
finals, so refresh cost is O(delta + |state|), independent of the base
table's history.  ``read_incremental`` supplies the delta (file-level,
no record CDC needed on an append-only lineage); an overwrite/rollback
on the base breaks that lineage, which ``refresh`` detects (the
incremental read refuses) and falls back to a full recompute — wrong
answers are structurally impossible, only the fast path is lost.

The view state is itself a ``SnapshotTable``: each refresh is one atomic
overwrite commit carrying ``app_meta={"base_version": N}``, so view and
cursor move together — a crashed refresh leaves the previous consistent
(state, cursor) pair, and re-running is idempotent.
"""

from __future__ import annotations

import typing as ty

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from heparchy_spark.sources.snapshot import SnapshotTable

__all__ = ["MaterializedAggregate"]

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


class MaterializedAggregate:
    """``aggs`` maps output column -> ``(kind, in_col)`` with kind in
    ``sum | count | min | max`` (``count`` counts rows; ``in_col``
    ignored).  All are insert-monotone, which is exactly what an
    append-only base guarantees; deletes/updates arrive as overwrites
    and trigger the full-recompute path instead."""

    def __init__(
        self,
        base: SnapshotTable,
        view: SnapshotTable,
        group_cols: ty.Sequence[str],
        aggs: dict[str, tuple[str, str | None]],
    ) -> None:
        for name, (kind, _) in aggs.items():
            if kind not in _MERGE:
                raise ValueError(
                    f"agg {name!r}: kind must be one of {sorted(_MERGE)}"
                )
        self.base = base
        self.view = view
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)

    # -- aggregate expression builders --------------------------------------

    def _partial_exprs(self) -> list:
        out = []
        for name, (kind, col) in self.aggs.items():
            if kind == "count":
                out.append(F.count(F.lit(1)).alias(name))
            else:
                out.append(getattr(F, kind)(col).alias(name))
        return out

    def _merge_exprs(self) -> list:
        return [
            _MERGE[kind](name).alias(name)
            for name, (kind, _) in self.aggs.items()
        ]

    # -- public surface -----------------------------------------------------

    def read(self) -> DataFrame:
        return self.view.read()

    def refresh(self) -> dict:
        """Advance the view to the base's latest version.  Returns
        ``{"base_version", "mode"}`` with mode ``noop`` (already fresh),
        ``incremental`` (delta fold) or ``full`` (lineage break)."""
        base_v = self.base.latest_version()
        if base_v == 0:
            raise ValueError("base table has no commits yet")
        cursor = self.view.app_meta().get("base_version", 0)
        if cursor == base_v:
            return {"base_version": base_v, "mode": "noop"}

        mode = "full"
        merged: DataFrame
        if cursor > 0:
            try:
                delta = self.base.read_incremental(cursor, base_v)
                partial = delta.groupBy(*self.group_cols).agg(
                    *self._partial_exprs()
                )
                merged = (
                    self.view.read()
                    .unionByName(partial)
                    .groupBy(*self.group_cols)
                    .agg(*self._merge_exprs())
                )
                mode = "incremental"
            except ValueError:
                # overwrite/rollback broke append-only lineage (or the
                # cursor version was vacuumed): recompute from scratch
                pass
        if mode == "full":
            merged = self.base.read(base_v).groupBy(*self.group_cols).agg(
                *self._partial_exprs()
            )
        self.view.commit(
            merged,
            mode="overwrite",
            operation=f"refresh[{mode}](base v{base_v})",
            app_meta={"base_version": base_v},
        )
        return {"base_version": base_v, "mode": mode}
