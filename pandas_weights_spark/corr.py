"""Weighted Pearson correlation operators.

Three surfaces, mirroring the reference:

* :func:`frame_corr` — pairwise matrix over a table's numeric columns
  (reference ``frame.py:253-285``), long form ``(col_x, col_y, corr)``.
* :func:`grouped_corr` — per-group matrices (reference ``frame.py:630-660``)
  as ``(keys…, col_x, col_y, corr)``. The reference iterates groups on the
  driver; here it is ONE distributed ``groupBy().agg()`` over all pair
  moments followed by a JVM-side ``inline`` unpivot — group cardinality is
  unbounded and there is exactly one shuffle.
* :func:`aligned_corr` — correlation against another table's column,
  aligned by an explicit inner join (reference ``series.py:222-247``,
  ``435-468``: pandas label alignment incl. duplicate-label cross-pairing
  → join fan-out).

Only the i<=j triangle's moments are computed (k(k+1)/2 pairs, reference
frame.py:272-283 does the same); the mirror is emitted by reusing the
computed value. All moments for all pairs land in a single aggregate, so
Catalyst's common-subexpression elimination shares duplicated sums.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandas_weights_spark._stats import (
    corr_from_moments,
    corr_moment_exprs,
    cov_from_moments,
)

if TYPE_CHECKING:
    import pandas as pd

    from pandas_weights_spark.frame import WeightedDataFrame

__all__ = [
    "frame_corr",
    "grouped_corr",
    "aligned_corr",
    "aligned_cov",
    "aligned_corr_cov",
    "frame_cov",
    "grouped_cov",
    "frame_corr_cov",
    "spearman_corr",
    "spearman_matrix",
    "weighted_autocorr",
    "to_matrix",
]


def _check_method(method: str) -> None:
    # reference raises for non-pearson (frame.py:263-266); the engine
    # routes method="spearman" to spearman_matrix at the frame surface
    # (r5) — this guard covers the remaining methods (kendall, ...)
    # and the grouped matrix, where spearman stays pair-level
    # (spearman_corr(by=...)).
    if method != "pearson":
        raise NotImplementedError(
            f"weighted correlation method {method!r} is not supported "
            "here; use wt().corr(method='spearman') for the global "
            "rank matrix or spearman_corr() per pair/group."
        )


def _pair_moment_exprs(
    wdf: "WeightedDataFrame",
    cols: Sequence[str],
    names: Optional[Sequence[str]] = None,
) -> list[Column]:
    """Aggregate expressions for every i<=j pair's moments (all seven by
    default; cov passes the five it needs so the extra sums never run)."""
    w = wdf.weights
    exprs: list[Column] = []
    for i, cx in enumerate(cols):
        x = wdf._value(cx)
        for j in range(i, len(cols)):
            cy = cols[j]
            y = wdf._value(cy)
            for name, expr in corr_moment_exprs(x, y, w).items():
                if names is not None and name not in names:
                    continue
                exprs.append(expr.alias(f"__m_{i}_{j}_{name}"))
    return exprs


_COV_MOMENTS = ("n", "w", "wx", "wy", "wxy")


def _pair_corr(i: int, j: int, ddof: int, min_periods: int) -> Column:
    m = lambda name: F.col(f"__m_{i}_{j}_{name}")  # noqa: E731
    return corr_from_moments(
        m("n"), m("w"), m("wx"), m("wy"), m("wxy"), m("wxx"), m("wyy"),
        ddof=ddof, min_periods=min_periods,
    )


def _pair_cov(i: int, j: int, swap: bool, ddof: int, min_periods: int) -> Column:
    m = lambda name: F.col(f"__m_{i}_{j}_{name}")  # noqa: E731
    # cov(x, y) is symmetric, but the mirror entry's (wx, wy) swap keeps
    # the formula's float evaluation identical either way
    wx, wy = (m("wy"), m("wx")) if swap else (m("wx"), m("wy"))
    return cov_from_moments(
        m("n"), m("w"), wx, wy, m("wxy"), ddof=ddof, min_periods=min_periods
    )


def _pair_structs(
    cols: Sequence[str],
    ddof: int,
    min_periods: int,
    stat: str = "corr",
) -> list[Column]:
    """One struct per *ordered* pair; the j<i mirror reuses the i<=j moments
    (symmetry exploitation as in reference frame.py:272-283)."""
    structs = []
    for i, cx in enumerate(cols):
        for j, cy in enumerate(cols):
            lo, hi = (i, j) if i <= j else (j, i)
            if stat == "corr":
                val = _pair_corr(lo, hi, ddof, min_periods)
            else:
                val = _pair_cov(lo, hi, j < i, ddof, min_periods)
            structs.append(
                F.struct(
                    F.lit(cx).alias("col_x"),
                    F.lit(cy).alias("col_y"),
                    val.alias(stat),
                )
            )
    return structs


def frame_corr(
    wdf: "WeightedDataFrame",
    method: str = "pearson",
    min_periods: int = 1,
    ddof: int = 1,
    subset: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Weighted Pearson matrix, long form. One aggregate pass."""
    _check_method(method)
    cols = list(subset) if subset is not None else wdf.numeric_columns()
    if not cols:
        raise ValueError("no numeric columns to correlate")
    moments = wdf.df.agg(*_pair_moment_exprs(wdf, cols))
    return moments.select(
        F.inline(F.array(*_pair_structs(cols, ddof, min_periods)))
    )


def corr_pair(
    wdf: "WeightedDataFrame",
    x_col: str,
    y_col: str,
    method: str = "pearson",
    min_periods: int = 1,
    ddof: int = 1,
) -> DataFrame:
    """Weighted Pearson correlation of ONE column pair — the matrix
    path's ``(x_col, y_col)`` cell without the matrix: 7 aggregate
    expressions instead of ``7·k(k+1)/2`` (measured ~3× less per-row
    aggregate work than a filtered 2-column matrix at sf0.1). The
    value is BIT-identical to ``frame_corr``'s corresponding cell:
    same pairwise-complete moment expressions
    (:func:`corr_moment_exprs` over the frame's nanvl'd values), same
    :func:`corr_from_moments` kernel. Output: one row ``(corr)``.
    """
    _check_method(method)
    w = wdf.weights
    x = wdf._value(x_col)
    y = wdf._value(y_col)
    moments = [
        expr.alias(f"__m_0_1_{name}")
        for name, expr in corr_moment_exprs(x, y, w).items()
    ]
    return wdf.df.agg(*moments).select(
        _pair_corr(0, 1, ddof, min_periods).alias("corr")
    )


def grouped_corr(
    wdf: "WeightedDataFrame",
    keys: Sequence[str],
    dropna: bool = True,
    sort: bool = False,
    method: str = "pearson",
    min_periods: int = 1,
    ddof: int = 1,
) -> DataFrame:
    """Per-group weighted Pearson matrices, long form, single shuffle."""
    _check_method(method)
    cols = [c for c in wdf.numeric_columns() if c not in keys]
    if not cols:
        raise ValueError("no numeric columns to correlate")
    df = wdf.df
    if dropna:
        for k in keys:
            df = df.where(F.col(k).isNotNull())
    moments = df.groupBy(*[F.col(k) for k in keys]).agg(
        *_pair_moment_exprs(wdf, cols)
    )
    out = moments.select(
        *keys, F.inline(F.array(*_pair_structs(cols, ddof, min_periods)))
    )
    if sort:
        out = out.orderBy(*keys, "col_x", "col_y")
    return out


def frame_cov(
    wdf: "WeightedDataFrame",
    min_periods: int = 1,
    ddof: int = 1,
    subset: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Weighted covariance matrix, long form ``(col_x, col_y, cov)``.

    Same single-aggregate-pass plan as :func:`frame_corr` (the pair
    moment set is a subset of corr's); extension beyond the reference,
    which implements corr only.
    """
    cols = list(subset) if subset is not None else wdf.numeric_columns()
    if not cols:
        raise ValueError("no numeric columns to covary")
    moments = wdf.df.agg(*_pair_moment_exprs(wdf, cols, names=_COV_MOMENTS))
    return moments.select(
        F.inline(F.array(*_pair_structs(cols, ddof, min_periods, stat="cov")))
    )


def grouped_cov(
    wdf: "WeightedDataFrame",
    keys: Sequence[str],
    dropna: bool = True,
    sort: bool = False,
    min_periods: int = 1,
    ddof: int = 1,
) -> DataFrame:
    """Per-group weighted covariance matrices, long form, single shuffle."""
    cols = [c for c in wdf.numeric_columns() if c not in keys]
    if not cols:
        raise ValueError("no numeric columns to covary")
    df = wdf.df
    if dropna:
        for k in keys:
            df = df.where(F.col(k).isNotNull())
    moments = df.groupBy(*[F.col(k) for k in keys]).agg(
        *_pair_moment_exprs(wdf, cols, names=_COV_MOMENTS)
    )
    out = moments.select(
        *keys,
        F.inline(F.array(*_pair_structs(cols, ddof, min_periods, stat="cov"))),
    )
    if sort:
        out = out.orderBy(*keys, "col_x", "col_y")
    return out


def frame_corr_cov(
    wdf: "WeightedDataFrame",
    min_periods: int = 1,
    ddof: int = 1,
    subset: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Correlation AND covariance matrices fused into one aggregate pass,
    long form ``(col_x, col_y, corr, cov)``.

    The cov moments are a subset of corr's, so computing both stats from
    one moment aggregate is free relative to :func:`frame_corr` alone —
    half the scans of running :func:`frame_corr` + :func:`frame_cov`
    separately and joining. Values are bit-identical to the separate
    paths (same moment expressions, same ``*_from_moments`` kernels).
    """
    cols = list(subset) if subset is not None else wdf.numeric_columns()
    if not cols:
        raise ValueError("no numeric columns to correlate")
    moments = wdf.df.agg(*_pair_moment_exprs(wdf, cols))
    structs = []
    for i, cx in enumerate(cols):
        for j, cy in enumerate(cols):
            lo, hi = (i, j) if i <= j else (j, i)
            structs.append(
                F.struct(
                    F.lit(cx).alias("col_x"),
                    F.lit(cy).alias("col_y"),
                    _pair_corr(lo, hi, ddof, min_periods).alias("corr"),
                    _pair_cov(lo, hi, j < i, ddof, min_periods).alias("cov"),
                )
            )
    return moments.select(F.inline(F.array(*structs)))


def aligned_corr(
    left: DataFrame,
    x_col: str,
    other: DataFrame,
    y_col: str,
    on: Union[str, Sequence[str]],
    by: Optional[Sequence[str]] = None,
    method: str = "pearson",
    min_periods: Optional[int] = None,
    ddof: int = 1,
) -> DataFrame:
    """Correlate ``left[x_col]`` (weights already bound on ``left`` under
    ``WEIGHT_COL``) against ``other[y_col]``, aligned by inner join on
    ``on`` — the engine's replacement for pandas label alignment
    (series.py:238-239). Duplicate join keys fan out like duplicate index
    labels (README.md:84-135). ``by`` adds per-group output
    (series.py:435-468); default ``min_periods`` is 1 (series.py:246).

    At scale: if ``other`` is small it is broadcast automatically by AQE;
    a skewed ``on`` key benefits from AQE skew handling.
    """
    from pandas_weights_spark.frame import WEIGHT_COL

    _check_method(method)
    min_periods = 1 if min_periods is None else min_periods
    on_cols = [on] if isinstance(on, str) else list(on)
    by = list(by) if by else []

    y_alias = "__pw_other__"
    left_sel = left.select(
        *dict.fromkeys(on_cols + by), F.col(x_col).alias("__pw_x__"), F.col(WEIGHT_COL)
    )
    right_sel = other.select(*on_cols, F.col(y_col).alias(y_alias))
    joined = left_sel.join(right_sel, on=on_cols, how="inner")

    x = F.col("__pw_x__").cast("double")
    y = F.col(y_alias).cast("double")
    w = F.col(WEIGHT_COL)
    moments = {
        name: expr.alias(f"__m_{name}")
        for name, expr in corr_moment_exprs(x, y, w).items()
    }
    m = lambda name: F.col(f"__m_{name}")  # noqa: E731
    corr = corr_from_moments(
        m("n"), m("w"), m("wx"), m("wy"), m("wxy"), m("wxx"), m("wyy"),
        ddof=ddof, min_periods=min_periods,
    ).alias("corr")

    if by:
        return (
            joined.groupBy(*by).agg(*moments.values()).select(*by, corr).orderBy(*by)
        )
    return joined.agg(*moments.values()).select(corr)


def aligned_cov(
    left: DataFrame,
    x_col: str,
    other: DataFrame,
    y_col: str,
    on: Union[str, Sequence[str]],
    by: Optional[Sequence[str]] = None,
    min_periods: Optional[int] = None,
    ddof: int = 1,
) -> DataFrame:
    """Weighted covariance of ``left[x_col]`` against ``other[y_col]``
    aligned by inner join on ``on`` — the cov analog of
    :func:`aligned_corr` (extension: the reference aligns corr only).
    Same join fan-out semantics; only the five cov moments are computed.
    """
    from pandas_weights_spark.frame import WEIGHT_COL

    min_periods = 1 if min_periods is None else min_periods
    on_cols = [on] if isinstance(on, str) else list(on)
    by = list(by) if by else []

    y_alias = "__pw_other__"
    left_sel = left.select(
        *dict.fromkeys(on_cols + by), F.col(x_col).alias("__pw_x__"), F.col(WEIGHT_COL)
    )
    right_sel = other.select(*on_cols, F.col(y_col).alias(y_alias))
    joined = left_sel.join(right_sel, on=on_cols, how="inner")

    x = F.col("__pw_x__").cast("double")
    y = F.col(y_alias).cast("double")
    w = F.col(WEIGHT_COL)
    moments = {
        name: expr.alias(f"__m_{name}")
        for name, expr in corr_moment_exprs(x, y, w).items()
        if name in _COV_MOMENTS
    }
    m = lambda name: F.col(f"__m_{name}")  # noqa: E731
    cov = cov_from_moments(
        m("n"), m("w"), m("wx"), m("wy"), m("wxy"),
        ddof=ddof, min_periods=min_periods,
    ).alias("cov")

    if by:
        return (
            joined.groupBy(*by).agg(*moments.values()).select(*by, cov).orderBy(*by)
        )
    return joined.agg(*moments.values()).select(cov)


def aligned_corr_cov(
    left: DataFrame,
    x_col: str,
    other: DataFrame,
    y_col: str,
    on: Union[str, Sequence[str]],
    by: Optional[Sequence[str]] = None,
    min_periods: Optional[int] = None,
    ddof: int = 1,
) -> DataFrame:
    """Aligned correlation AND covariance in one join + one aggregate —
    the fused form of :func:`aligned_corr` / :func:`aligned_cov` (which
    each re-run the alignment join). Output ``(by…, corr, cov)``; values
    bit-identical to the separate paths (same moments, same kernels).
    """
    from pandas_weights_spark.frame import WEIGHT_COL

    min_periods = 1 if min_periods is None else min_periods
    on_cols = [on] if isinstance(on, str) else list(on)
    by = list(by) if by else []

    y_alias = "__pw_other__"
    left_sel = left.select(
        *dict.fromkeys(on_cols + by), F.col(x_col).alias("__pw_x__"), F.col(WEIGHT_COL)
    )
    right_sel = other.select(*on_cols, F.col(y_col).alias(y_alias))
    joined = left_sel.join(right_sel, on=on_cols, how="inner")

    x = F.col("__pw_x__").cast("double")
    y = F.col(y_alias).cast("double")
    w = F.col(WEIGHT_COL)
    moments = {
        name: expr.alias(f"__m_{name}")
        for name, expr in corr_moment_exprs(x, y, w).items()
    }
    m = lambda name: F.col(f"__m_{name}")  # noqa: E731
    corr = corr_from_moments(
        m("n"), m("w"), m("wx"), m("wy"), m("wxy"), m("wxx"), m("wyy"),
        ddof=ddof, min_periods=min_periods,
    ).alias("corr")
    cov = cov_from_moments(
        m("n"), m("w"), m("wx"), m("wy"), m("wxy"),
        ddof=ddof, min_periods=min_periods,
    ).alias("cov")

    if by:
        return (
            joined.groupBy(*by)
            .agg(*moments.values())
            .select(*by, corr, cov)
            .orderBy(*by)
        )
    return joined.agg(*moments.values()).select(corr, cov)


def spearman_corr(
    wdf: "WeightedDataFrame",
    x_col: str,
    y_col: str,
    by: Optional[Sequence[str]] = None,
    min_periods: int = 1,
    ddof: int = 1,
    band_bounds: Optional[dict] = None,
) -> DataFrame:
    """Weighted Spearman rank correlation of two columns (extension: the
    reference raises for non-pearson, frame.py:263-266).

    Semantics: average-tie ranks over the pairwise-complete mask
    (x, y, w all non-NULL — exactly the rows pandas
    ``.corr(method="spearman")`` ranks), then the weighted Pearson
    kernel (:func:`~pandas_weights_spark._stats.corr_from_moments`) on
    the ranks. At unit weights this reproduces pandas spearman.

    Plan: per-row average-tie ranks come straight from TWO banded
    cumulative-count windows over the masked frame — one per column,
    each partitioned by ``(keys, band)`` so ranking stays parallel when
    the key has 3 distinct values and the column is near-unique. A
    RANGE frame makes the cumulative count tie-inclusive, so
    ``rank = band_offset + count(v' <= v) - (ties - 1)/2`` needs no
    distinct-value aggregate, no rank join-back, and no row-id regroup
    (the r3 melt-join-regroup shape paid THREE extra fat shuffles:
    distinct-count, rank join, rid regroup).

    r4 barrier diet (2.7 s → sf0.1 target <1.5 s; the windows were
    already cheap — sequential full passes were the cost):

    - band bounds come from a robust [p1, p99] of a bounded
      ``limit(10240)`` probe (ONE cheap job that reads about a row
      group, vs r3's full per-group min/max scan), or — for callers
      needing run-to-run reproducible plans (ADVICE r4: the probe's
      subset is partition-order dependent) — from an explicit
      ``band_bounds={"x": (lo, hi), "y": (lo, hi)}`` with no probe job
      at all. Deterministic probe variants were measured and rejected:
      content-hash sampling and split-pinned filters still scan every
      partition (+0.6 s), per-key exact percentiles via broadcast join
      +1.4 s on this 1.9 s query. Banding stays linear arithmetic
      (2 flops/row in codegen; an equal-frequency edge-array variant's
      per-row higher-order-function fold was 3× slower than the whole
      r3 query). Rows outside the probed support clamp into the edge
      bands; ranks are band-assignment-invariant (equal values always
      share a band), so bound quality affects only load balance,
      never the result.
    - the two per-(keys, band) offset joins are fused into ONE
      broadcast join on ``keys`` carrying two ``map<band, offset>``
      columns (≤ bands entries ≈ 2 KB per key — broadcast-small at any
      key cardinality that can hold a corr).

    Band totals still come from ONE GROUPING SETS
    ((keys, bandx), (keys, bandy)) map-side-combining pass — a joint
    (keys, bandx, bandy) count would materialize up to keys·bands²
    groups (a shuffle as fat as the data) only to be re-marginalized.
    """
    from pyspark.sql import Window

    from pandas_weights_spark.frame import WEIGHT_COL
    from pandas_weights_spark.groupby import _join_group_stats

    bands = 256
    keys = list(by) if by else []
    kc = [F.col(k) for k in keys]
    # _value wraps in nanvl so pandas NaN means missing, like every kernel
    x = wdf._value(x_col)
    y = wdf._value(y_col)
    w = F.col(WEIGHT_COL)
    v = wdf.df.where(x.isNotNull() & y.isNotNull() & w.isNotNull()).select(
        *keys, x.alias("__x__"), y.alias("__y__"), w.alias(WEIGHT_COL)
    )
    # p1/p99 rather than min/max: one sampled outlier would stretch the
    # linear band range until the real mass collapses into a few bands.
    # The probe's row subset is partition-order dependent (limit races
    # the collect, ADVICE r4); ranks are band-assignment-invariant so
    # only load balance varies, never values. Callers needing
    # reproducible plans pass band_bounds={"x": (lo, hi), "y": ...} —
    # zero probe job, fully literal. Deterministic probe alternatives
    # were measured and rejected on this 1.9 s query: content-hash
    # sampling / split-pinned filters still scan every partition's
    # rows (+0.6 s), and per-key exact percentile bounds via broadcast
    # join cost +1.4 s (extra scan + losing the literal-codegen band).
    if band_bounds is not None:
        bounds = {"bx": tuple(band_bounds["x"]), "by": tuple(band_bounds["y"])}
    else:
        bounds = v.limit(10_240).agg(
            F.percentile_approx("__x__", [0.01, 0.99], 1000).alias("bx"),
            F.percentile_approx("__y__", [0.01, 0.99], 1000).alias("by"),
        ).first()
    if bounds["bx"] is None:  # no pairwise-complete rows at all
        null_corr = F.lit(None).cast("double").alias("corr")
        if keys:  # no groups either — empty result, matching r3
            return v.groupBy(*keys).agg(null_corr).select(*keys, "corr")
        return v.sparkSession.range(1).select(null_corr)

    def _lit_band(col: str, lo: float, hi: float) -> Column:
        c = F.col(col).cast("double")
        if not (hi > lo):
            return F.lit(0)
        return F.greatest(
            F.lit(0),
            F.least(
                F.lit(bands - 1),
                F.floor((c - F.lit(float(lo))) / F.lit(float(hi - lo))
                        * F.lit(float(bands))).cast("int"),
            ),
        )

    j = v.select(
        *keys, "__x__", "__y__", WEIGHT_COL,
        _lit_band("__x__", *bounds["bx"]).alias("__bandx__"),
        _lit_band("__y__", *bounds["by"]).alias("__bandy__"),
    )
    gsets = j.groupingSets(
        [[*keys, "__bandx__"], [*keys, "__bandy__"]],
        *keys, "__bandx__", "__bandy__",
    ).agg(
        F.count(F.lit(1)).alias("__bt__"),
        F.grouping("__bandy__").alias("__gy__"),
    )
    # BOTH columns' band→offset maps from ONE aggregate over the
    # grouping-set marginals: collect each key's (band, count) list and
    # fold it (sorted) into an exclusive-running-sum map — ≤ bands
    # elements per key, all expression-side. Splitting into per-column
    # branches (r4 first cut) let Catalyst push the grouping-flag
    # filter into each branch's Expand, defeating exchange reuse and
    # re-scanning the table per column.
    def _offmap(entries: Column) -> Column:
        zero = F.struct(
            F.lit(0).cast("long").alias("s"),
            F.map_from_arrays(
                F.array().cast("array<int>"), F.array().cast("array<long>")
            ).alias("m"),
        )
        return F.aggregate(
            F.sort_array(entries),
            zero,
            lambda acc, e: F.struct(
                (acc["s"] + e["n"]).alias("s"),
                F.map_concat(
                    acc["m"], F.create_map(e["band"], acc["s"])
                ).alias("m"),
            ),
            lambda acc: acc["m"],
        )

    def _entries(band_col: str, other_gone: int) -> Column:
        # when() without otherwise -> NULL for the other marginal's
        # rows, and collect_list drops NULLs
        return F.collect_list(
            F.when(
                F.col("__gy__") == other_gone,
                F.struct(
                    F.col(band_col).alias("band"), F.col("__bt__").alias("n")
                ),
            )
        )

    maps = gsets.groupBy(*kc).agg(
        _offmap(_entries("__bandx__", 1)).alias("__mx__"),
        _offmap(_entries("__bandy__", 0)).alias("__my__"),
    )
    if keys:
        j = _join_group_stats(j, maps, keys)
    else:
        j = j.crossJoin(F.broadcast(maps))
    j = j.select(
        *keys, "__x__", "__y__", WEIGHT_COL, "__bandx__", "__bandy__",
        F.element_at("__mx__", F.col("__bandx__")).alias("__off__bandx__"),
        F.element_at("__my__", F.col("__bandy__")).alias("__off__bandy__"),
    )

    def _rank(val_col: str, band_col: str) -> Column:
        cum_win = (
            Window.partitionBy(*kc, F.col(band_col))
            .orderBy(F.col(val_col))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tie_win = (
            Window.partitionBy(*kc, F.col(band_col))
            .orderBy(F.col(val_col))
            .rangeBetween(Window.currentRow, Window.currentRow)
        )
        cum = F.count(F.lit(1)).over(cum_win)
        tie = F.count(F.lit(1)).over(tie_win)
        return (
            (cum + F.col(f"__off{band_col}")).cast("double")
            - (tie - F.lit(1)).cast("double") / F.lit(2.0)
        )

    j = j.select(
        *keys,
        WEIGHT_COL,
        _rank("__x__", "__bandx__").alias("__rx__"),
        _rank("__y__", "__bandy__").alias("__ry__"),
    )

    moments = {
        name: expr.alias(f"__m_{name}")
        for name, expr in corr_moment_exprs(
            F.col("__rx__"), F.col("__ry__"), F.col(WEIGHT_COL)
        ).items()
    }
    m = lambda name: F.col(f"__m_{name}")  # noqa: E731
    corr = corr_from_moments(
        m("n"), m("w"), m("wx"), m("wy"), m("wxy"), m("wxx"), m("wyy"),
        ddof=ddof, min_periods=min_periods,
    ).alias("corr")
    if keys:
        return j.groupBy(*keys).agg(*moments.values()).select(*keys, corr)
    return j.agg(*moments.values()).select(corr)


def spearman_matrix(
    wdf: "WeightedDataFrame",
    subset: Optional[Sequence[str]] = None,
    min_periods: int = 1,
    ddof: int = 1,
    bands: int = 256,
    band_bounds: Optional[dict] = None,
) -> DataFrame:
    """Weighted Spearman rank-correlation MATRIX, long form ``(col_x,
    col_y, corr)`` — the k-column companion to :func:`spearman_corr`
    (the reference raises for ``corr(method="spearman")``; this closes
    the matrix surface the pair operator left open).

    Semantics: LISTWISE-complete — rows with a NULL in ANY selected
    column (or the weight) drop before ranking, so every pair shares
    one rank basis and the matrix is positive semi-definite. This is
    the standard large-scale simplification and a documented divergence
    from pandas' per-pair masks (pandas re-ranks every pair over its
    own pairwise-complete rows — k² rank passes; at equal masks the two
    definitions coincide, and the pairwise behavior stays available via
    :func:`spearman_corr` per pair).

    Plan: one listwise filter → one bounded probe for ALL columns'
    [p1, p99] band bounds → ONE GROUPING SETS pass emitting every
    column's band counts → one k-map offset aggregate broadcast back →
    k banded rank windows (each partitioned by its own (band) — ranking
    parallelism k × bands, never a whole-table sort) → ONE moment
    aggregate for all k(k+1)/2 pairs (the same fused shape as
    :func:`frame_corr`).

    ``band_bounds`` (r6, ADVICE r5 — the same escape hatch
    :func:`spearman_corr` grew in r5): a ``{col: (lo, hi)}`` mapping
    that skips the partition-order-dependent ``limit(10240)`` probe
    job entirely for run-to-run reproducible PLANS (values are
    band-assignment-invariant either way; only load balance varies).
    Columns absent from the mapping still probe.
    """
    from pandas_weights_spark.frame import WEIGHT_COL

    cols = list(subset) if subset is not None else wdf.numeric_columns()
    if not cols:
        raise ValueError("no numeric columns to correlate")
    k = len(cols)
    w = F.col(WEIGHT_COL)
    mask = w.isNotNull()
    for c in cols:
        mask = mask & wdf._value(c).isNotNull()
    v = wdf.df.where(mask).select(
        *[wdf._value(c).alias(f"__c{i}__") for i, c in enumerate(cols)],
        w.alias(WEIGHT_COL),
    )
    bb = {c: tuple(bnds) for c, bnds in (band_bounds or {}).items()}
    unknown = set(bb) - set(cols)
    if unknown:
        raise ValueError(f"band_bounds for unselected column(s): {unknown}")
    need_probe = [i for i, c in enumerate(cols) if c not in bb]
    probe = None
    if need_probe:
        probe = v.limit(10_240).agg(
            *[
                F.percentile_approx(f"__c{i}__", [0.01, 0.99], 1000).alias(
                    f"b{i}"
                )
                for i in need_probe
            ]
        ).first()
    bounds: "list" = []
    for i, c in enumerate(cols):
        if c in bb:
            lo, hi = bb[c]
            bounds.append((float(lo), float(hi)))
        else:
            b = probe[f"b{i}"]
            bounds.append(None if b is None else (float(b[0]), float(b[1])))

    def _lit_band(i: int) -> Column:
        b = bounds[i]
        c = F.col(f"__c{i}__").cast("double")
        if b is None or not (b[1] > b[0]):
            return F.lit(0)
        lo, hi = b
        return F.greatest(
            F.lit(0),
            F.least(
                F.lit(bands - 1),
                F.floor(
                    (c - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(bands))
                ).cast("int"),
            ),
        )

    j = v.select(
        "*", *[_lit_band(i).alias(f"__band{i}__") for i in range(k)]
    )
    band_cols = [f"__band{i}__" for i in range(k)]
    gsets = j.groupingSets(
        [[b] for b in band_cols], *band_cols
    ).agg(
        F.count(F.lit(1)).alias("__bt__"),
        *[F.grouping(b).alias(f"__g{i}__") for i, b in enumerate(band_cols)],
    )

    def _offmap(entries: Column) -> Column:
        zero = F.struct(
            F.lit(0).cast("long").alias("s"),
            F.map_from_arrays(
                F.array().cast("array<int>"), F.array().cast("array<long>")
            ).alias("m"),
        )
        return F.aggregate(
            F.sort_array(entries),
            zero,
            lambda acc, e: F.struct(
                (acc["s"] + e["n"]).alias("s"),
                F.map_concat(
                    acc["m"], F.create_map(e["band"], acc["s"])
                ).alias("m"),
            ),
            lambda acc: acc["m"],
        )

    maps = gsets.agg(
        *[
            _offmap(
                F.collect_list(
                    F.when(
                        F.col(f"__g{i}__") == 0,
                        F.struct(
                            F.col(band_cols[i]).alias("band"),
                            F.col("__bt__").alias("n"),
                        ),
                    )
                )
            ).alias(f"__map{i}__")
            for i in range(k)
        ]
    )
    j = j.crossJoin(F.broadcast(maps)).select(
        "*",
        *[
            F.element_at(F.col(f"__map{i}__"), F.col(band_cols[i])).alias(
                f"__off{i}__"
            )
            for i in range(k)
        ],
    )

    from pyspark.sql import Window

    def _rank(i: int) -> Column:
        cum_win = (
            Window.partitionBy(F.col(band_cols[i]))
            .orderBy(F.col(f"__c{i}__"))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tie_win = (
            Window.partitionBy(F.col(band_cols[i]))
            .orderBy(F.col(f"__c{i}__"))
            .rangeBetween(Window.currentRow, Window.currentRow)
        )
        cum = F.count(F.lit(1)).over(cum_win)
        tie = F.count(F.lit(1)).over(tie_win)
        return (
            (cum + F.col(f"__off{i}__")).cast("double")
            - (tie - F.lit(1)).cast("double") / F.lit(2.0)
        )

    ranked = j.select(
        WEIGHT_COL, *[_rank(i).alias(f"__r{i}__") for i in range(k)]
    )
    exprs = []
    for i in range(k):
        for l in range(i, k):
            for name, expr in corr_moment_exprs(
                F.col(f"__r{i}__"), F.col(f"__r{l}__"), F.col(WEIGHT_COL)
            ).items():
                exprs.append(expr.alias(f"__m_{i}_{l}_{name}"))
    moments = ranked.agg(*exprs)
    return moments.select(
        F.inline(F.array(*_pair_structs(cols, ddof, min_periods)))
    )


def to_matrix(long_form: DataFrame) -> "pd.DataFrame":
    """Pivot long-form ``(col_x, col_y, corr)`` to a square pandas matrix.

    Driver-side convenience for the reference's k×k output shape
    (frame.py:270) — k is the column count, so the collected data is tiny.
    """
    pdf = long_form.toPandas()
    order = list(dict.fromkeys(pdf["col_x"]))
    return (
        pdf.pivot(index="col_x", columns="col_y", values="corr")
        .reindex(index=order, columns=order)
        .rename_axis(index=None, columns=None)
    )


def weighted_autocorr(
    wdf: "WeightedDataFrame",
    col: str,
    lags: Sequence[int] = (1,),
    order_by: Sequence[str] = (),
    by: Optional[Sequence[str]] = None,
    ddof: int = 1,
    min_periods: int = 1,
) -> DataFrame:
    """Weighted autocorrelation function: the weighted Pearson
    correlation of ``x_t`` with ``x_{t−k}`` along ``order_by``
    (optionally per ``by`` group), one output row per (group, lag) —
    ``keys…, lag, corr`` (engine extension: lag features' sanity check
    in time-series / session pipelines).

    Convention: the pair ``(x_t, x_{t−k})`` carries the CURRENT row's
    weight ``w_t``, and is pairwise-complete masked like every corr
    kernel (x_t, x_{t−k}, w_t all non-NULL — leading rows of each group
    drop out of lag k naturally).

    Plan: ONE WindowExec produces every lagged column (all lags share
    the ``partitionBy(by) orderBy(order_by)`` sort), then ONE aggregate
    computes all lags' seven moments fused (map-side partials), and the
    long (lag, corr) shape unpivots from that single row — two
    exchanges total, independent of the number of lags.
    """
    from pyspark.sql import Window

    from pandas_weights_spark.frame import WEIGHT_COL

    lags = [int(k) for k in lags]
    if not lags or any(k < 1 for k in lags):
        raise ValueError(f"lags must be positive ints, got {lags!r}")
    if not order_by:
        raise ValueError("autocorr requires order_by columns")
    keys = list(by or [])
    for c in [col, *order_by, *keys]:
        if c not in wdf.df.columns:
            raise KeyError(f"column {c!r} not in frame")
    if not keys:
        import warnings

        warnings.warn(
            "keyless autocorr orders the whole table in a single window "
            "partition (one task). Pass by= at scale.",
            stacklevel=2,
        )
    x = wdf._value(col)
    w = F.col(WEIGHT_COL)
    spec = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(c) for c in order_by]
    )
    lagged = wdf.df.select(
        *keys,
        x.alias("__x__"),
        w.alias(WEIGHT_COL),
        *[F.lag(x, k).over(spec).alias(f"__xl_{k}__") for k in lags],
    )
    moments = []
    for k in lags:
        for name, expr in corr_moment_exprs(
            F.col("__x__"), F.col(f"__xl_{k}__"), F.col(WEIGHT_COL)
        ).items():
            moments.append(expr.alias(f"__m_{k}_{name}"))
    agg = (
        lagged.groupBy(*[F.col(k) for k in keys]).agg(*moments)
        if keys
        else lagged.agg(*moments)
    )
    rows = []
    for k in lags:
        m = lambda name, k=k: F.col(f"__m_{k}_{name}")  # noqa: E731
        rows.append(
            F.struct(
                F.lit(k).alias("lag"),
                corr_from_moments(
                    m("n"), m("w"), m("wx"), m("wy"), m("wxy"),
                    m("wxx"), m("wyy"),
                    ddof=ddof, min_periods=min_periods,
                ).alias("corr"),
            )
        )
    return agg.select(
        *keys, F.explode(F.array(*rows)).alias("__p__")
    ).select(*keys, F.col("__p__.lag").alias("lag"),
             F.col("__p__.corr").alias("corr"))
