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

__all__ = ["cohort_retention", "funnel"]


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


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: "list[str]",
    weight: Optional[Column] = None,
) -> DataFrame:
    """Ordered-event FUNNEL: how many users progress through ``steps``
    in order — ``(step, step_idx, n_users, mass, conversion)`` where a
    user reaches step *i* iff some step-*i* event occurs at or after
    their earliest qualifying step-*i−1* time (ties allowed: equal
    timestamps progress). ``conversion`` is n_users relative to step 1.
    The classic product-analytics companion to
    :func:`cohort_retention`.

    ``mass`` contract (pinned, r6): per reaching user, the WEIGHT OF THE
    QUALIFYING step-*i* EVENT — the first step-*i* event at/after the
    user's step-*i−1* qualifying time, ties broken by smallest weight —
    summed over reaching users. With per-event-varying weights (e.g.
    revenue as the weight) ``mass`` is therefore "step-*i* value
    captured by users who got this far via the ordered path"; with
    per-user-constant weights it reduces to the survey-weight sum of
    reaching users. (r5 silently used ``MAX`` of all the user's event
    weights — undocumented and meaningless for varying weights.)

    Scale shape: ONE ``groupBy(user)`` collecting each step's sorted
    ``(time, weight)`` array (state per user bounded by that user's OWN
    events, the same bound every sessionizer accepts), then the
    qualifying chain is a row-local expression fold — no joins, no
    window over the full table, and the final step counts aggregate a
    user-cardinality table. NULL users form one pseudo-user (the
    cohort convention); NULL timestamps drop.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    w = weight if weight is not None else F.lit(1.0)
    rows = df.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("__u__"),
        F.col(step_col).alias("__s__"),
        F.col(ts_col).alias("__t__"),
        w.cast("double").alias("__w__"),
    )
    per_user = rows.groupBy("__u__").agg(
        *[
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("__s__") == s,
                        F.struct(
                            F.col("__t__").alias("t"),
                            F.col("__w__").alias("w"),
                        ),
                    )
                )
            ).alias(f"__a{i}__")
            for i, s in enumerate(steps)
        ],
    )
    # qualifying chain: q_i = first (t, w) struct in the SORTED step-i
    # array with t >= t_{i-1} — sort_array orders structs (t asc, then
    # w asc), so ties in time deterministically pick the smallest
    # weight. F.get is NULL-safe on the empty filtered array (no ANSI
    # element_at trap).
    quals = []
    prev = None
    for i in range(len(steps)):
        arr = F.col(f"__a{i}__")
        if prev is None:
            q = F.get(arr, 0)
        else:
            p = prev
            q = F.get(F.filter(arr, lambda x: x["t"] >= p), 0)
        quals.append(q)
        prev = q["t"]
    flagged = per_user.select(
        *[q.isNotNull().alias(f"__r{i}__") for i, q in enumerate(quals)],
        *[q["w"].alias(f"__w{i}__") for i, q in enumerate(quals)],
    )
    agg = flagged.agg(
        *[
            F.sum(F.when(F.col(f"__r{i}__"), 1).otherwise(0))
            .cast("long")
            .alias(f"__n{i}__")
            for i in range(len(steps))
        ],
        *[
            F.sum(F.coalesce(F.col(f"__w{i}__"), F.lit(0.0)))
            .alias(f"__m{i}__")
            for i in range(len(steps))
        ],
    )
    stack = ", ".join(
        f"'{s}', {i}, __n{i}__, __m{i}__" for i, s in enumerate(steps)
    )
    long = agg.select(
        F.expr(
            f"stack({len(steps)}, {stack}) AS (step, step_idx, n_users, mass)"
        ),
        F.col("__n0__").alias("__base__"),
    )
    return long.select(
        "step",
        F.col("step_idx").cast("int").alias("step_idx"),
        "n_users",
        "mass",
        F.try_divide(
            F.col("n_users").cast("double"), F.col("__base__").cast("double")
        ).alias("conversion"),
    )
