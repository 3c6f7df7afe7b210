"""Weighted ``apply`` — the engine's arbitrary-Python extension point
(reference ``frame.py:287-367``, ``frame.py:662-679``, ``series.py:249-264``,
``series.py:470-481``).

The reference runs user functions over the *pre-weighted* data
(``self.weighted().apply(...)``, frame.py:357). Here:

* :func:`grouped_apply` — the canonical distributed path:
  ``groupBy(keys).applyInPandas`` over each group's weighted rows
  (Arrow-batched, one shuffle).
* :func:`series_apply` — elementwise over weighted values via
  ``mapInPandas`` (no shuffle at all).
* :func:`frame_apply` — whole-frame column-wise apply. An arbitrary
  column-wise Python reduction inherently needs the whole column in one
  place, so this routes through a single-group ``applyInPandas``
  (documented: small/aggregated data only; prefer the built-in moment
  statistics or ``grouped_apply`` at scale).

Spark cannot infer result schemas for Python functions, so all three take
an explicit ``schema`` (DDL string or StructType) — the one API addition
over the reference (SURVEY.md §2.3 row 29).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

    from pandas_weights_spark.frame import WeightedDataFrame, WeightedSeries
    from pandas_weights_spark.groupby import WeightedGroupBy

__all__ = ["frame_apply", "series_apply", "grouped_apply"]


def _normalize_result(res, columns=None) -> "pd.DataFrame":
    """Coerce a user function's scalar / Series / DataFrame result to a
    pandas DataFrame (pandas ``apply`` does the same shape inference)."""
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pd.Series):
        # A Series indexed by column name == one output row (reduction).
        return res.to_frame().T
    return pd.DataFrame([[res]], columns=columns or ["value"])


def frame_apply(
    wdf: "WeightedDataFrame", func: Callable, schema, axis: int = 0
) -> DataFrame:
    """``func`` over the whole pre-weighted frame, pandas-``apply`` style
    (frame.py:339-367). Runs in a single Arrow-batched task."""

    def _run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return _normalize_result(pdf.apply(func, axis=axis))

    weighted = wdf.weighted()
    return weighted.groupBy(F.lit(1).alias("__pw_g__")).applyInPandas(
        lambda pdf: _run(pdf.drop(columns="__pw_g__", errors="ignore")), schema
    )


def series_apply(ws: "WeightedSeries", func: Callable, schema) -> DataFrame:
    """Elementwise ``func`` over weighted values (series.py:249-264).

    Pure ``mapInPandas`` — Arrow batches, no shuffle, scales linearly.
    """
    name = ws.name

    def _run(batches):
        for pdf in batches:
            yield pdf.assign(**{name: pdf[name].apply(func)})

    return ws.weighted().mapInPandas(_run, schema)


def grouped_apply(gb: "WeightedGroupBy", func: Callable, schema) -> DataFrame:
    """``func`` per group over the group's pre-weighted rows
    (frame.py:662-679). Distributed: one shuffle on the group keys.

    The declared ``schema`` must lead with the group key columns; the
    wrapper injects the key values into each group's result (the Spark
    analog of the reference's group-keyed result index).
    """
    keys = gb._keys

    def _run(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        res = _normalize_result(func(pdf))
        for i, k in enumerate(keys):
            res.insert(i, k, key[i])
        return res

    # Weighted projection of keys + data columns (keys pass through intact,
    # numeric data gets multiplied — reference _weighted, frame.py:505-510).
    wdf = gb._wdf
    num = set(wdf.numeric_columns())
    data_cols = [c for c in wdf.columns if c not in keys]
    exprs = [F.col(k) for k in keys] + [
        (wdf._value(c) * wdf.weights).alias(c) if c in num else F.col(c)
        for c in data_cols
    ]
    df = wdf.df.select(*exprs)
    if gb._dropna:
        for k in keys:
            df = df.where(F.col(k).isNotNull())
    out = df.groupBy(*keys).applyInPandas(_run, schema)
    if gb._sort:
        out = out.orderBy(*keys)
    return out
