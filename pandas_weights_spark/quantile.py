"""Weighted quantiles / median (engine extension — the reference has no
quantile support; this is the frequency-weights "inverted CDF" definition
consistent with the engine's ddof convention).

Definition: for the weighted distribution of a column x, the q-quantile
is the smallest value whose cumulative weight reaches ``q × Σw``,
cumulating in ascending-x order with ties merged (a RANGE frame: every
row of equal value shares one cumulative weight). Rows with NULL x, or
NULL/non-positive weight, are excluded — they carry no probability mass.

Plan shape: one hash exchange on the group keys, one sort per value
column (RANGE-frame running sum + a whole-partition total in the same
Window), then a reuse-partitioning groupBy — the agg rides the window's
exchange, so grouped quantiles cost exactly one shuffle like every other
grouped statistic.

Scale note: *global* (ungrouped) quantiles order the whole table in a
single window partition — exact but single-task, like any total order in
Spark. At 100 TB use grouped quantiles, or pre-filter, or accept
``approxQuantile`` (unweighted) where approximation is tolerable.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["weighted_quantiles", "quantile_col_name"]


def quantile_col_name(col: str, q: float) -> str:
    """``x, 0.5 → x_p50``; non-integral percents keep digits (``x_p12_5``)."""
    pct = q * 100.0
    if float(int(pct)) == pct:
        return f"{col}_p{int(pct)}"
    return f"{col}_p{str(pct).replace('.', '_')}"


def weighted_quantiles(
    wdf,
    qs: Union[float, Sequence[float]],
    subset: Optional[Sequence[str]] = None,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Grouped (or global, ``keys=()``) weighted quantiles.

    One output column per (value column, q): ``{col}_p{percent}``.
    Empty groups / all-excluded columns yield NULL.
    """
    if isinstance(qs, float):
        qs = [qs]
    qs = [float(q) for q in qs]
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile must be in (0, 1], got {q}")
    cols = list(subset) if subset is not None else wdf.numeric_columns()
    cols = [c for c in cols if c not in keys]
    if not cols:
        raise ValueError("no numeric columns for quantile")

    w = wdf.weights
    df = wdf.df
    sel = [F.col(k) for k in keys]
    part = [F.col(k) for k in keys]
    aggs = []
    for c in cols:
        x = wdf._value(c)
        # probability mass of this row for column c (0 ⇒ excluded)
        mass = F.when(x.isNotNull() & (w > 0), w).otherwise(F.lit(0.0))
        cum = Window.partitionBy(*part).orderBy(x).rangeBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        total = Window.partitionBy(*part)
        cw = F.sum(mass).over(cum)
        tw = F.sum(mass).over(total)
        sel += [
            x.alias(f"__x_{c}__"),
            F.when(mass > 0, cw).alias(f"__cw_{c}__"),
            tw.alias(f"__tw_{c}__"),
        ]
        for q in qs:
            aggs.append(
                F.min(
                    F.when(
                        F.col(f"__cw_{c}__") >= F.lit(q) * F.col(f"__tw_{c}__"),
                        F.col(f"__x_{c}__"),
                    )
                ).alias(quantile_col_name(c, q))
            )
    staged = df.select(*sel)
    return staged.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
