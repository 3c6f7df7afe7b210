"""Distributed as-of (nearest-key) join.

``asof_join(left, right, on, by)`` attaches to every left row the
closest right row at-or-before (``backward``) / at-or-after
(``forward``) it on the ordering column, per equality key — the
time-series join behind feature lookup ("latest signal as of this
event"), trade/quote alignment, and slowly-changing-dimension reads.
Semantics mirror ``pandas.merge_asof`` (left outer; ``tolerance``;
``allow_exact_matches``); the reference library has no join surface at
all (SURVEY.md §2.6 — joins out of reference scope), so this is an
engine extension.

Spark has no as-of join primitive, and the naive formulations are both
scale-broken: an inequality join is a BroadcastNestedLoopJoin
(quadratic), and a per-left-row subquery doesn't distribute. The
scalable shape is the UNION + ORDERED CARRY:

1. union the two sides into one frame tagged by origin, with the right
   side's payload packed into ONE struct column (NULL on left rows);
2. one window per ``by`` key ordered by (``on``, tag):
   ``last(payload, ignorenulls=True)`` carries the most recent right
   payload forward onto each left row;
3. keep the left rows, unpack the struct, apply ``tolerance``.

Cost: ONE shuffle, partitioned by the ``by`` key (both inputs shuffle
once, together) — the same price as a single equi-join, regardless of
how many right rows precede each left row. The tag breaks ties at equal
``on`` so ``allow_exact_matches`` is exact, and the payload struct is
carried atomically (per-column ``last(ignorenulls)`` could mix rows
when payload columns contain NULLs). Without ``by`` the window is
global (single-task sort) — same documented caveat as the exact global
quantile; pass ``by`` at scale.
"""

from __future__ import annotations

import datetime as dt
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_PAYLOAD = "__pw_asof_payload__"
_TAG = "__pw_asof_tag__"


def _tolerance_cond(
    left_on: Column,
    right_on: Column,
    tolerance: Union[str, dt.timedelta, int, float, None],
    direction: str,
) -> Column:
    """True iff the matched right row is within ``tolerance``.

    The gap is oriented (backward: left−right ≥ 0; forward:
    right−left ≥ 0), so no abs() is needed. Timestamp gaps compare as
    day-time intervals (works for TIMESTAMP and TIMESTAMP_NTZ alike);
    numeric ``on`` columns take a numeric tolerance.
    """
    if tolerance is None:
        return F.lit(True)
    gap = (left_on - right_on) if direction == "backward" else (right_on - left_on)
    if isinstance(tolerance, (int, float)) and not isinstance(tolerance, bool):
        return gap <= F.lit(tolerance)
    if isinstance(tolerance, dt.timedelta):
        secs = tolerance.total_seconds()
    else:
        # accept both pandas rule codes ("600s", "15min") and natural
        # duration strings ("600 seconds", "2 hours")
        try:
            from pandas_weights_spark.resample import parse_rule

            kind, info = parse_rule(tolerance)
            if kind != "fixed":
                raise ValueError(
                    f"tolerance must be a fixed duration, got {tolerance!r}"
                )
            secs = float(info)
        except ValueError:
            import pandas as pd

            secs = pd.Timedelta(tolerance).total_seconds()
    return gap <= F.make_dt_interval(secs=F.lit(secs))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance: Union[str, dt.timedelta, int, float, None] = None,
    allow_exact_matches: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: nearest right row per left row along ``on``.

    Parameters follow ``pandas.merge_asof``: ``on`` must exist in both
    frames (timestamp or numeric); ``by`` are equality keys; backward
    matches the latest right row with ``r.on <= l.on`` (strict ``<``
    when ``allow_exact_matches=False``), forward the earliest with
    ``r.on >= l.on``; ``tolerance`` bounds the gap (unmatched → NULLs,
    row kept — left outer). Right payload columns that collide with a
    left column name get ``suffix``; the matched ordering value is
    always emitted as ``f"{on}{suffix}"``.

    Ties among right rows at the same (``by``, ``on``) resolve to the
    last one in the right frame's sort order under the window —
    pre-aggregate the right side to unique keys for a fully
    deterministic result (the driver query does).

    NULL ``on`` values: right rows with NULL ``on`` are dropped (they
    have no position on the ordering axis — under the window's NULLS
    FIRST sort they would otherwise be carried into every left row
    with no real match); left rows with NULL ``on`` are kept but never
    match (NULL payload). ``pandas.merge_asof`` raises on NULL keys
    instead — a divergence chosen deliberately: dropping a 100 TB job
    over one NULL row is the wrong default for a distributed engine.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    by = list(by or [])
    if not by:
        import warnings

        warnings.warn(
            "asof_join without `by` sorts BOTH inputs in a single global "
            "window partition (one task). Pass equality keys at scale.",
            stacklevel=2,
        )
    for c in [on, *by]:
        if c not in left.columns:
            raise KeyError(f"column {c!r} not in left frame")
        if c not in right.columns:
            raise KeyError(f"column {c!r} not in right frame")
    payload_cols = [c for c in right.columns if c not in by]  # keeps `on`
    out_names = {
        c: (c + suffix if (c == on or c in left.columns) else c)
        for c in payload_cols
    }
    collisions = sorted(set(out_names.values()) & set(left.columns))
    if collisions:
        raise ValueError(
            f"as-of output column(s) {collisions} already exist in the left "
            f"frame; rename them or pass a different suffix= (got {suffix!r})"
        )

    # NULL `on` right rows have no position on the ordering axis; under
    # the NULLS FIRST window sort they would be carried into left rows
    # that have no real match. Drop them before the union.
    right = right.where(F.col(on).isNotNull())

    payload = F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD)
    payload_type = right.select(payload).schema[0].dataType

    # Matchable right rows must sort BEFORE the left row in traversal
    # order. At equal `on`, allow_exact puts right first (0 < 1),
    # disallow puts right after (2 > 1).
    right_tag = 0 if allow_exact_matches else 2
    left_side = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
        F.lit(1).alias(_TAG),
    )
    right_side = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in by and c != on
            else F.col(c)
            for c in left.columns
        ],
        payload,
        F.lit(right_tag).alias(_TAG),
    )
    def _win(asc: bool):
        order = F.col(on).asc() if asc else F.col(on).desc()
        return (
            Window.partitionBy(*[F.col(c) for c in by])
            .orderBy(order, F.col(_TAG).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    unioned = left_side.unionByName(right_side)
    # A NULL-`on` left row has no position: forward's desc sort puts it
    # last, where a carried payload would reach it — gate it out.
    def _ok(m, d):
        return (
            F.col(on).isNotNull()
            & m.isNotNull()
            & _tolerance_cond(F.col(on), m.getField(on), tolerance, d)
        )

    if direction == "nearest":
        # both carries in one plan: the asc and desc windows share the
        # `by`-key exchange (the second pass re-sorts, no extra
        # shuffle). The closer valid side wins; ties go backward,
        # matching pandas.merge_asof(direction="nearest").
        matched = unioned.select(
            "*",
            F.last(_PAYLOAD, ignorenulls=True)
            .over(_win(asc=True))
            .alias("__pw_asof_b__"),
            F.last(_PAYLOAD, ignorenulls=True)
            .over(_win(asc=False))
            .alias("__pw_asof_f__"),
        )
        mb = F.col("__pw_asof_b__")
        mf = F.col("__pw_asof_f__")
        ok_b = _ok(mb, "backward")
        ok_f = _ok(mf, "forward")
        gap_b = F.col(on) - mb.getField(on)
        gap_f = mf.getField(on) - F.col(on)
        use_b = ok_b & (~ok_f | (gap_b <= gap_f))
        return matched.where(F.col(_TAG) == 1).select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(use_b, mb.getField(c))
                .when(ok_f, mf.getField(c))
                .alias(out_names[c])
                for c in payload_cols
            ],
        )

    carried = F.last(_PAYLOAD, ignorenulls=True).over(
        _win(asc=direction == "backward")
    )
    matched = unioned.select("*", carried.alias("__pw_asof_match__"))
    m = F.col("__pw_asof_match__")
    ok = _ok(m, direction)
    return matched.where(F.col(_TAG) == 1).select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(ok, m.getField(c)).alias(out_names[c])
            for c in payload_cols
        ],
    )
