"""Weighted pivot table (pandas ``pivot_table`` with weighted kernels).

``weighted_pivot`` spreads one categorical column into output columns
and fills the cells with weighted statistics — the wide-format
counterpart of the grouped aggregates. The reference library has no
pivot surface (SURVEY.md §2.6); engine extension.

Scale shape: ONE hash aggregate with map-side partials — every
``(value column, pivot value, stat)`` cell is a conditionally-masked
weighted kernel in the same ``groupBy(index).agg(...)`` pass, so the
shuffle moves one combined row per index key regardless of how many
cells the table has. No ``Window``, no join, no Spark ``pivot()``
fallback path. Pass ``column_values`` explicitly at scale: without it
the pivot domain comes from a driver-side ``distinct().collect()``
(same contract as Spark's own ``pivot()``; a guard caps it).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_weights_spark import _stats

__all__ = ["weighted_pivot"]

#: pivot-domain guard for the implicit distinct().collect() path
MAX_IMPLICIT_COLUMN_VALUES = 1000

_STATS = {
    "count": lambda x, w: _stats.w_count(x, w),
    "sum": lambda x, w: _stats.w_sum(x, w),
    "mean": lambda x, w: _stats.w_mean(x, w),
    "var": lambda x, w: _stats.w_var(x, w),
    "std": lambda x, w: _stats.w_std(x, w),
    "min": lambda x, w: _stats.w_min(x, w),
    "max": lambda x, w: _stats.w_max(x, w),
}


def _slug(v) -> str:
    s = "NULL" if v is None else str(v)
    return re.sub(r"[^0-9A-Za-z_]", "_", s)


def weighted_pivot(
    wdf,
    index: Sequence[str],
    columns: str,
    values: Sequence[str],
    stats: Sequence[str] = ("mean",),
    column_values: Optional[Sequence] = None,
) -> DataFrame:
    """Wide weighted aggregate: one output row per ``index`` key, one
    output column ``{value}_{pivot value}[_{stat}]`` per cell.

    ``column_values`` fixes the pivot domain (and column order)
    without a scan; when omitted, the distinct values of ``columns``
    are collected to the driver (ordered, NULL last) — fine for a
    categorical, guarded at ``MAX_IMPLICIT_COLUMN_VALUES``. NULL is an
    ordinary pivot value (null-safe cell mask), matching the engine's
    ``dropna=False`` convention.
    """
    index = list(index)
    values = list(values)
    stats = list(stats)
    bad = [s for s in stats if s not in _STATS]
    if bad or not stats:
        raise ValueError(
            f"stats must be a non-empty subset of {sorted(_STATS)}, "
            f"got {stats!r}"
        )
    if not values:
        raise ValueError("values must name at least one column")
    for c in [columns, *index, *values]:
        if c not in wdf.df.columns:
            raise KeyError(f"column {c!r} not in frame")
    if column_values is None:
        rows = (
            wdf.df.select(columns)
            .distinct()
            .orderBy(F.col(columns).asc_nulls_last())
            .limit(MAX_IMPLICIT_COLUMN_VALUES + 1)
            .collect()
        )
        if len(rows) > MAX_IMPLICIT_COLUMN_VALUES:
            raise ValueError(
                f"pivot column {columns!r} has more than "
                f"{MAX_IMPLICIT_COLUMN_VALUES} distinct values; pass "
                "column_values= explicitly"
            )
        column_values = [r[0] for r in rows]
    w = wdf.weights
    aggs = []
    single = len(stats) == 1
    for v in column_values:
        cond = F.col(columns).eqNullSafe(F.lit(v))
        wv = F.when(cond, w)
        for c in values:
            xv = F.when(cond, wdf._value(c))
            for s in stats:
                name = (
                    f"{c}_{_slug(v)}" if single else f"{c}_{_slug(v)}_{s}"
                )
                aggs.append(_STATS[s](xv, wv).alias(name))
    return wdf.df.groupBy(*[F.col(k) for k in index]).agg(*aggs)
