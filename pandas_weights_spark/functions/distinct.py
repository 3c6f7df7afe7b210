"""Distinct-count surfaces: exact, approximate, and MERGEABLE
(HyperLogLog sketches) — the cardinality companion to the t-digest
quantile sketch (the reference has no distinct-count surface,
SURVEY.md §2.6).

Three paths, by scale:

* ``distinct_counts(exact=True)`` — ``count_distinct``: exact, but the
  de-dup state is proportional to the cardinality. Fine for bounded
  domains; the wrong default at 100 TB.
* ``distinct_counts(exact=False)`` — ``approx_count_distinct``
  (HyperLogLog++, JVM-side): fixed-size state, ``rsd`` relative error,
  one ordinary aggregate pass.
* ``hll_sketches`` / ``merge_hll_sketches`` — Apache DataSketches HLL
  via Spark's ``hll_sketch_agg`` family: the sketch itself is a binary
  column you can STORE (e.g. one row per day/partition) and later
  union-merge without rescanning the raw data — the same incremental
  pattern as ``tdigest.merge_digests``. ``estimate`` turns a sketch
  column back into a count.

All three are pure built-in aggregates — whole-stage codegen, map-side
partials, one shuffle per grouping, no Python anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_counts", "hll_sketches", "merge_hll_sketches"]


def distinct_counts(
    df: DataFrame,
    cols: Sequence[str],
    by: Optional[Sequence[str]] = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group distinct counts of each column: ``keys…,
    {col}_distinct``. NULLs are not counted as a distinct value
    (``count_distinct``/HLL convention)."""
    keys = list(by or [])
    cols = list(cols)
    if not cols:
        raise ValueError("cols must name at least one column")
    for c in [*cols, *keys]:
        if c not in df.columns:
            raise KeyError(f"column {c!r} not in frame")
    if exact:
        aggs = [
            F.count_distinct(F.col(c)).alias(f"{c}_distinct") for c in cols
        ]
    else:
        aggs = [
            F.approx_count_distinct(F.col(c), rsd).alias(f"{c}_distinct")
            for c in cols
        ]
    g = df.groupBy(*[F.col(k) for k in keys]) if keys else df.groupBy()
    return g.agg(*aggs)


def hll_sketches(
    df: DataFrame,
    cols: Sequence[str],
    by: Optional[Sequence[str]] = None,
    lg_config_k: int = 12,
) -> DataFrame:
    """One DataSketches-HLL binary sketch per (group, column):
    ``keys…, {col}_hll`` — store these (a few KB each) instead of raw
    data; merge later with :func:`merge_hll_sketches`. ``lg_config_k``
    trades size (2^k registers) against error (~1.04/√2^k)."""
    keys = list(by or [])
    cols = list(cols)
    if not cols:
        raise ValueError("cols must name at least one column")
    aggs = [
        F.hll_sketch_agg(F.col(c), F.lit(lg_config_k)).alias(f"{c}_hll")
        for c in cols
    ]
    g = df.groupBy(*[F.col(k) for k in keys]) if keys else df.groupBy()
    return g.agg(*aggs)


def merge_hll_sketches(
    sketches: DataFrame,
    cols: Sequence[str],
    by: Optional[Sequence[str]] = None,
    estimate: bool = True,
) -> DataFrame:
    """Union-merge sketch rows (e.g. daily partials) per group:
    ``keys…, {col}_hll`` (merged sketch) and, with ``estimate=True``,
    ``{col}_distinct`` (the estimated cardinality of the union). The
    raw data is never rescanned — ``estimate(merge(A, B)) ≈
    |distinct(A ∪ B)|``."""
    keys = list(by or [])
    cols = list(cols)
    aggs = [
        F.hll_union_agg(F.col(f"{c}_hll")).alias(f"{c}_hll") for c in cols
    ]
    g = (
        sketches.groupBy(*[F.col(k) for k in keys])
        if keys
        else sketches.groupBy()
    )
    out = g.agg(*aggs)
    if estimate:
        for c in cols:
            out = out.withColumn(
                f"{c}_distinct",
                F.hll_sketch_estimate(F.col(f"{c}_hll")),
            )
    return out
