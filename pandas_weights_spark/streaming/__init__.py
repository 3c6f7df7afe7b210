"""Structured Streaming support for the weighted aggregates
(SURVEY.md §2.6: the reference's resample is batch-only; the engine's
moment-sum design makes the same statistics streaming-safe for free).

Every §2 statistic is built from associative+commutative partial sums
(Σw, Σwx, Σwx², masked counts — see ``_stats``), so they run unchanged
under incremental execution: map-side partials merge into state exactly
like they merge across batch partitions. ``weighted_resample_stream``
is the streaming twin of :class:`~pandas_weights_spark.resample.
WeightedResampler` — same kernels, plus a watermark for late data and
state eviction.

Usage::

    stream = spark.readStream.schema(schema).parquet(dir)
    agg = weighted_resample_stream(
        stream, weights="w", on="ts", rule="10min",
        watermark="30 minutes", stats=("count", "sum", "mean"),
    )
    agg.writeStream.outputMode("append").trigger(availableNow=True)...

Output mode notes: ``append`` emits each window once, after the
watermark passes it (the streaming analog of a closed resample bucket);
``update``/``complete`` emit running values.
"""

from __future__ import annotations

import datetime as dt
from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_weights_spark.frame import WEIGHT_COL, wt
from pandas_weights_spark.groupby import _KERNELS
from pandas_weights_spark.resample import parse_rule

__all__ = ["weighted_resample_stream", "weighted_groupby_stream"]


def weighted_resample_stream(
    stream: DataFrame,
    weights: Union[str, "F.Column"],
    on: str,
    rule: Union[str, dt.timedelta],
    watermark: str = "1 hour",
    stats: Sequence[str] = ("count", "sum", "mean"),
    value_cols: Sequence[str] | None = None,
    na_weight: float | None = None,
    **stat_kwargs,
) -> DataFrame:
    """Weighted time-window aggregation over a streaming DataFrame.

    Tumbling windows of ``rule`` (fixed-frequency rules only — calendar
    rules need batch ``date_trunc``); epoch-aligned (``origin="epoch"``:
    a stream has no "first row" to anchor ``start_day`` on). Emits
    ``window_start`` plus ``{col}_{stat}`` columns.
    """
    kind, secs = parse_rule(rule)
    if kind != "fixed":
        raise ValueError("streaming resample supports fixed-frequency rules only")
    bad = [s for s in stats if s not in _KERNELS]
    if bad:
        raise ValueError(f"unknown statistics: {bad}")

    wdf = wt(stream, weights, na_weight=na_weight)
    cols = value_cols or [c for c in wdf.numeric_columns() if c != on]
    if not cols:
        raise ValueError("no numeric columns to aggregate")
    w = wdf.weights
    exprs = [
        _KERNELS[s](wdf._value(c), w, **stat_kwargs).alias(f"{c}_{s}")
        for c in cols
        for s in stats
    ]
    return (
        wdf.df.withWatermark(on, watermark)
        .groupBy(F.window(F.col(on), f"{secs} seconds"))
        .agg(*exprs)
        .withColumn("window_start", F.col("window.start"))
        .drop("window")
    )


def weighted_groupby_stream(
    stream: DataFrame,
    weights: Union[str, "F.Column"],
    keys: Sequence[str],
    on: str,
    watermark: str = "1 hour",
    stats: Sequence[str] = ("count", "sum", "mean"),
    value_cols: Sequence[str] | None = None,
    **stat_kwargs,
) -> DataFrame:
    """Keyed weighted aggregation over a stream (running per-key stats).

    The watermark on ``on`` bounds state; output mode ``update`` emits
    refreshed rows per trigger.
    """
    wdf = wt(stream, weights)
    cols = value_cols or [
        c for c in wdf.numeric_columns() if c not in keys and c != on
    ]
    if not cols:
        raise ValueError("no numeric columns to aggregate")
    w = wdf.weights
    exprs = [
        _KERNELS[s](wdf._value(c), w, **stat_kwargs).alias(f"{c}_{s}")
        for c in cols
        for s in stats
    ]
    return (
        wdf.df.withWatermark(on, watermark)
        .groupBy(*keys)
        .agg(*exprs)
    )
