"""Cohort retention analysis over event streams.

``cohort_retention`` buckets events on a fixed time rule, assigns each
user to the cohort of their FIRST bucket, and counts how many users
(and how much weight mass) from each cohort are active ``period``
buckets later — the standard retention triangle of product/engagement
analytics, here as a weighted engine extension (SURVEY.md §2.6).

Scale shape: the first-seen bucket comes from ONE unordered
``min() over (partition by user)`` window (hash exchange on user, no
sort — min needs no order); the triangle is then one hash aggregate on
``(cohort, period)`` with ``count(distinct user)`` (Spark's two-phase
distinct expansion — the only extra exchange) plus the plain mass sum.
Nothing collects; cohort × period cardinality is rule-bounded.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandas_weights_spark.resample import _as_seconds

__all__ = ["cohort_retention"]


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    rule: Union[str, "dt.timedelta"] = "1d",  # noqa: F821
    weight: Optional[Column] = None,
    max_periods: Optional[int] = None,
) -> DataFrame:
    """Retention triangle: ``(cohort, period, n_users, mass)`` where
    ``cohort`` is the user's first active bucket (epoch-aligned fixed
    ``rule`` buckets), ``period`` counts buckets since the cohort
    (0 = the cohort bucket itself), ``n_users`` = distinct users from
    that cohort active in that period, ``mass`` = their weight sum.

    Fixed-width rules only (``1d``, ``6h``, …) — calendar periods have
    no constant bucket arithmetic. NULL timestamps drop; NULL users are
    one ordinary bucket (a single NULL "user"). ``max_periods`` trims
    the long tail.
    """
    secs = _as_seconds(rule)
    if secs <= 0:
        raise ValueError("rule must be a positive fixed width")
    w = weight if weight is not None else F.lit(1.0)
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(secs)).cast("long")
    )
    rows = df.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("__u__"),
        bucket.alias("__b__"),
        w.cast("double").alias("__w__"),
    )
    first = F.min("__b__").over(Window.partitionBy("__u__"))
    keyed = rows.select(
        "__u__", "__w__",
        first.alias("__c__"),
        (F.col("__b__") - first).cast("long").alias("period"),
    )
    if max_periods is not None:
        keyed = keyed.where(F.col("period") <= int(max_periods))
    return keyed.groupBy(
        (F.col("__c__") * F.lit(secs)).cast("timestamp").alias("cohort"),
        "period",
    ).agg(
        # count_distinct skips NULLs, but the documented contract treats
        # NULL users as one ordinary pseudo-user — add it back explicitly.
        (
            F.countDistinct("__u__")
            + F.max(F.when(F.col("__u__").isNull(), 1).otherwise(0))
        ).alias("n_users"),
        F.sum("__w__").alias("mass"),
    )
