"""Distributed range (interval) join.

``range_join(left, right, point, lower, upper, by)`` matches every left
row to the right rows whose interval ``[lower, upper]`` contains the
left row's ``point`` (optionally per equality key) — the join behind
IP-range lookup, time-validity (SCD-2) dimensions, genomic intervals,
and price-band assignment. The reference library has no join surface
(SURVEY.md §2.6), so this is an engine extension alongside as-of join.

Spark's own planner turns a bare inequality join into a
BroadcastNestedLoopJoin — quadratic and broadcast-bound. The scalable
shape is the BUCKETIZED EQUI-JOIN:

1. pick a bucket width ``w`` (defaults to the mean interval length — a
   one-scalar aggregate of the right side);
2. each left row gets ONE bucket id ``floor(point / w)``;
3. each right interval explodes into the bucket ids it overlaps
   (``sequence(floor(lower/w), floor(upper/w))`` — with ``w`` at the
   mean length, ~2 rows per interval);
4. equi-join on ``(by…, bucket)`` + the exact containment filter.

A (left, right) pair can only meet in the left point's single bucket,
so no post-join dedup is needed. Cost: one shuffle each side on
``(by, bucket)``; the quadratic term is bounded by rows-per-bucket —
``w`` trades fan-out of long intervals (small ``w``) against bucket
density (large ``w``). Degenerate huge intervals are capped by
``max_buckets_per_interval`` (raise, not silent truncation — a
truncated interval would silently drop matches).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]

_BUCKET = "__pw_rj_bucket__"


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lower: str,
    upper: str,
    by: Optional[Sequence[str]] = None,
    how: str = "inner",
    bucket_width: Optional[float] = None,
    closed: str = "both",
    suffix: str = "_right",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Join left rows to right intervals containing ``point``.

    ``point`` is a numeric (or numeric-castable) column on the left;
    ``lower``/``upper`` numeric columns on the right. ``closed`` picks
    the containment test: ``both`` (default), ``left``, ``right``,
    ``neither``. ``how``: ``inner`` or ``left`` (unmatched left rows
    kept with NULL right payload). Right columns colliding with left
    names get ``suffix``. Right rows with NULL/inverted bounds never
    match; NULL-``point`` left rows never match (kept under
    ``how="left"``).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, got {how!r}")
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"bad closed {closed!r}")
    by = list(by or [])
    for c in [point, *by]:
        if c not in left.columns:
            raise KeyError(f"column {c!r} not in left frame")
    for c in [lower, upper, *by]:
        if c not in right.columns:
            raise KeyError(f"column {c!r} not in right frame")

    payload_cols = [c for c in right.columns if c not in by]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }
    collisions = sorted(set(out_names.values()) & set(left.columns))
    if collisions:
        raise ValueError(
            f"range-join output column(s) {collisions} already exist in "
            f"the left frame; rename them or pass a different suffix="
        )

    lo = F.col(lower).cast("double")
    hi = F.col(upper).cast("double")
    r = right.where(lo.isNotNull() & hi.isNotNull() & (lo <= hi))

    if bucket_width is None:
        row = r.agg(F.avg(hi - lo).alias("m"), F.count(F.lit(1)).alias("n")).first()
        if not row["n"]:
            bucket_width = 1.0
        else:
            bucket_width = float(row["m"]) or 1.0
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be > 0")

    # fail loudly rather than silently dropping matches of huge
    # intervals: assert_true rides the sequence expression, so the
    # check runs executor-side inside the same job (no extra action)
    n_buckets = (F.floor(hi / w) - F.floor(lo / w) + 1).cast("long")
    guard = F.assert_true(
        n_buckets <= F.lit(max_buckets_per_interval),
        F.concat(
            F.lit(
                f"range_join: interval spans more than "
                f"{max_buckets_per_interval} buckets at width {w!r} "
                "(lower="
            ),
            F.col(lower).cast("string"),
            F.lit(", upper="),
            F.col(upper).cast("string"),
            F.lit("); pass a larger bucket_width or raise "
                  "max_buckets_per_interval"),
        ),
    )
    r_exp = r.select(
        *by,
        *[F.col(c).alias(f"__r_{c}__") for c in payload_cols],
        F.explode(
            F.when(
                guard.isNull(),
                F.sequence(
                    F.floor(lo / w).cast("long"),
                    F.floor(hi / w).cast("long"),
                ),
            )
        ).alias(_BUCKET),
    )
    l_keyed = left.withColumn(
        _BUCKET, F.floor(F.col(point).cast("double") / w).cast("long")
    ).alias("__pw_rj_l__")
    r_exp = r_exp.alias("__pw_rj_r__")

    # ONE join for both how= modes: the (by, bucket) equalities are
    # extracted by Catalyst as equi-join keys (shuffled hash / sort-merge,
    # never a nested loop) and the exact containment rides along as the
    # join condition, so under how="left" an unmatched left row — NULL
    # point, no covering interval, NULL by key — surfaces exactly once
    # with NULL payload straight from the outer join. (The previous
    # two-pass anti-join recovery compared on ALL left columns with
    # null-unsafe equality, so a MATCHED left row carrying a NULL in any
    # payload column never equaled its own image and was re-emitted as a
    # spurious all-NULL duplicate; it also cost an extra wide-row
    # shuffle.)
    p = F.col(f"__pw_rj_l__.{point}").cast("double")
    rlo = F.col(f"__pw_rj_r__.__r_{lower}__").cast("double")
    rhi = F.col(f"__pw_rj_r__.__r_{upper}__").cast("double")
    lo_ok = (p >= rlo) if closed in ("both", "left") else (p > rlo)
    hi_ok = (p <= rhi) if closed in ("both", "right") else (p < rhi)
    cond = lo_ok & hi_ok
    for c in [*by, _BUCKET]:
        cond = (F.col(f"__pw_rj_l__.{c}") == F.col(f"__pw_rj_r__.{c}")) & cond

    joined = l_keyed.join(r_exp, on=cond, how=how)
    return joined.select(
        *[F.col(f"__pw_rj_l__.{c}") for c in left.columns],
        *[
            F.col(f"__pw_rj_r__.__r_{c}__").alias(out_names[c])
            for c in payload_cols
        ],
    )
