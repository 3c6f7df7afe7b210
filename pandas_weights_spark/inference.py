"""Weighted hypothesis-test statistics (engine extension — the
reference stops at descriptive moments, SURVEY.md §2.6; these are the
inferential counterparts built from the SAME moment kernels, under the
engine's frequency-weight convention: Σw plays n, ddof subtracts from
Σw).

No p-values are emitted: Spark has no t/χ² CDF builtin and a Python
UDF for one scalar per group would poison the whole-stage-codegen
plan; the (statistic, dof) pair is the deliverable (tail probabilities
are a driver-side table lookup away and deliberately out of the data
plan).

Scale shapes:

* ``weighted_ttest`` — Welch's unequal-variance two-sample t. ONE
  conditionally-masked moment aggregate computes both samples' count /
  mean / variance per ``by`` group (same one-shuffle shape as
  ``agg_all``), then the t statistic and Welch–Satterthwaite dof are
  row-local algebra on the 1-row-per-group result.
* ``weighted_chi2`` — χ² independence of two categoricals. ONE
  ``GROUPING SETS ((r,c),(r),(c),())`` aggregate emits observed cell
  masses, row totals, column totals, and the grand total in a single
  map-side-combining pass; expected masses and the χ² sum are then a
  self-contained re-aggregation of the tiny cell table (R×C rows) —
  the raw data is scanned exactly once.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_weights_spark import _stats

__all__ = ["weighted_ttest", "weighted_chi2"]


def weighted_ttest(
    wdf,
    value: str,
    group_col: str,
    group_a,
    group_b,
    by: Optional[Sequence[str]] = None,
    ddof: int = 1,
) -> DataFrame:
    """Welch's two-sample t statistic between the rows where
    ``group_col == group_a`` and ``== group_b`` (optionally per ``by``
    key): columns ``n_a/mean_a/var_a``, same for ``b``, ``t_stat``,
    ``df`` (Welch–Satterthwaite). ``n`` is the weight mass Σw; any
    guard failure (empty side, non-positive variance base) yields NULL
    — the kernels' convention.
    """
    keys = list(by or [])
    for c in [value, group_col, *keys]:
        if c not in wdf.df.columns:
            raise KeyError(f"column {c!r} not in frame")
    x = wdf._value(value)
    w = wdf.weights
    sides = {"a": group_a, "b": group_b}
    aggs = []
    for tag, gv in sides.items():
        mask = F.col(group_col).eqNullSafe(F.lit(gv))
        xm = F.when(mask, x)
        wm = F.when(mask, w)
        aggs += [
            _stats.w_count(xm, wm).alias(f"n_{tag}"),
            _stats.w_mean(xm, wm).alias(f"mean_{tag}"),
            _stats.w_var(xm, wm, ddof=ddof).alias(f"var_{tag}"),
        ]
    g = (
        wdf.df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
        if keys
        else wdf.df.agg(*aggs)
    )
    na, nb = F.col("n_a"), F.col("n_b")
    va, vb = F.col("var_a"), F.col("var_b")
    se2a = F.try_divide(va, na)
    se2b = F.try_divide(vb, nb)
    se2 = se2a + se2b
    t = F.try_divide(F.col("mean_a") - F.col("mean_b"), F.sqrt(se2))
    df_w = F.try_divide(
        se2 * se2,
        F.try_divide(se2a * se2a, na - F.lit(1.0))
        + F.try_divide(se2b * se2b, nb - F.lit(1.0)),
    )
    return g.select(
        *keys,
        "n_a", "mean_a", "var_a", "n_b", "mean_b", "var_b",
        F.when(se2 > 0, t).alias("t_stat"),
        F.when(se2 > 0, df_w).alias("df"),
    )


def weighted_chi2(
    wdf,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """χ² test of independence between two categorical columns over
    the weighted contingency table: one row with ``chi2``, ``dof`` =
    (R−1)(C−1), ``n`` (grand mass), and ``cramers_v`` =
    √(χ² / (n·min(R−1, C−1))). NULL categories are ordinary buckets.

    The observed/marginal masses come from ONE grouping-sets pass over
    the raw rows; everything after operates on the R×C cell table.
    """
    for c in (row_col, col_col):
        if c not in wdf.df.columns:
            raise KeyError(f"column {c!r} not in frame")
    w = wdf.weights
    gs = wdf.df.groupingSets(
        [[row_col, col_col], [row_col], [col_col], []],
        row_col, col_col,
    ).agg(
        F.sum(w).alias("m"),
        F.grouping(row_col).alias("__pw_gr__"),
        F.grouping(col_col).alias("__pw_gc__"),
    )
    cells = gs.where((F.col("__pw_gr__") == 0) & (F.col("__pw_gc__") == 0)).select(
        row_col, col_col, F.col("m").alias("o")
    )
    rtot = gs.where((F.col("__pw_gr__") == 0) & (F.col("__pw_gc__") == 1)).select(
        row_col, F.col("m").alias("rt")
    )
    ctot = gs.where((F.col("__pw_gr__") == 1) & (F.col("__pw_gc__") == 0)).select(
        col_col, F.col("m").alias("ct")
    )
    grand = gs.where((F.col("__pw_gr__") == 1) & (F.col("__pw_gc__") == 1)).select(
        F.col("m").alias("g")
    )
    # the FULL R×C grid, not just observed combos: an empty cell has
    # O = 0 but E = rt·ct/g > 0 and still contributes E to the χ² sum
    # (scipy/pandas semantics). Null-safe cell join: NULL categories
    # are ordinary buckets. Everything below the grouping-sets pass is
    # R×C rows — all joins broadcast.
    grid = rtot.crossJoin(ctot)
    j = grid.join(
        cells,
        on=[
            grid[row_col].eqNullSafe(cells[row_col]),
            grid[col_col].eqNullSafe(cells[col_col]),
        ],
        how="left",
    ).crossJoin(F.broadcast(grand))
    o = F.coalesce(F.col("o"), F.lit(0.0))
    e = F.col("rt") * F.col("ct") / F.col("g")
    term = F.try_divide((o - e) * (o - e), e)
    agg = (
        j.agg(
            F.sum(term).alias("chi2"),
            # every grid row carries the same grand total
            F.min("g").alias("n"),
        )
        .crossJoin(F.broadcast(rtot.agg(F.count(F.lit(1)).alias("_r"))))
        .crossJoin(F.broadcast(ctot.agg(F.count(F.lit(1)).alias("_c"))))
    )
    rr = F.col("_r") - F.lit(1)
    cc = F.col("_c") - F.lit(1)
    return agg.select(
        "chi2",
        (rr * cc).cast("long").alias("dof"),
        "n",
        F.sqrt(
            F.try_divide(
                F.col("chi2"),
                F.col("n") * F.least(rr, cc).cast("double"),
            )
        ).alias("cramers_v"),
    )
