"""Mergeable weighted quantile sketch (t-digest).

The quantile family has two paths already: exact (per-group ordered
windows — needs bounded groups) and binned (needs a KNOWN value range,
quantile.py). The t-digest (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", arXiv:1902.04023 — public paper)
closes the remaining gap: ONE pass, no range knowledge, bounded size
(O(delta) centroids via the k1 arcsine scale function), and **mergeable** — partial digests combine
associatively, so it fits partition-parallel aggregation, incremental
nightly rollups, and federated summaries.

Scale shape (two-level, like every moment aggregate):

1. ``mapInPandas`` builds one partial digest per (input partition ×
   group) — Arrow-batched, centroid arrays ≤ delta entries;
2. ``groupBy(keys).applyInPandas`` merges each group's partials into
   one digest row.

The shuffle therefore moves ``partitions × groups × delta`` scalars —
independent of row count. Accuracy: rank error is
O(√(q(1−q))/delta) under the k1 scale function — tightest at the
tails; tested empirically against the exact weighted CDF.

Determinism: centroid layout depends on the partitioning of the input
(like any merge order of a non-associative float reduction); the RANK
guarantee holds for every layout. Tests pin the guarantee, not the
layout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)

__all__ = ["tdigest_aggregate", "tdigest_quantiles", "merge_digests"]

_DIGEST_FIELDS = [
    StructField("td_means", ArrayType(DoubleType())),
    StructField("td_weights", ArrayType(DoubleType())),
    StructField("td_min", DoubleType()),
    StructField("td_max", DoubleType()),
    StructField("td_total", DoubleType()),
]


def _k1(q: float, delta: int) -> float:
    """The t-digest k1 scale function ``(δ/2π)·asin(2q−1)`` (Dunning &
    Ertl §2.2): a centroid may span at most one k-unit, which squeezes
    centroid mass to ``O(√(q(1−q))·W/δ)`` — tight at the tails — and
    caps the centroid COUNT at O(δ) (the naive ``4Wq(1−q)/δ`` mass cap
    admits O(δ·log W) centroids: its per-centroid count density
    ``∫dq/q(1−q)`` diverges at the tails)."""
    import math

    return delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def _compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Greedy left-to-right merge of sorted (mean, weight) centroids
    under the k1 one-unit span criterion; returns (means, weights)."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list = []
    out_w: list = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    cum = 0.0  # mass strictly before the current centroid
    k_left = _k1(0.0, delta)
    for m, w in zip(means[1:], weights[1:]):
        q_new = min((cum + cur_w + float(w)) / total, 1.0)
        if _k1(q_new, delta) - k_left <= 1.0:
            # weighted mean update keeps the centroid the mass centroid
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            k_left = _k1(min(cum / total, 1.0), delta)
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _digest_of(values: np.ndarray, weights: np.ndarray, delta: int):
    """(means, weights, vmin, vmax, total) of one batch of raw points."""
    mask = ~(np.isnan(values) | np.isnan(weights)) & (weights > 0)
    values, weights = values[mask], weights[mask]
    if len(values) == 0:
        return None
    m, w = _compress(values.astype(float), weights.astype(float), delta)
    return m, w, float(values.min()), float(values.max()), float(weights.sum())


def tdigest_aggregate(
    df: DataFrame,
    value_col: str,
    weight_col: Union[str, F.Column],
    by: Optional[Sequence[str]] = None,
    delta: int = 100,
) -> DataFrame:
    """One t-digest row per group: ``keys…, td_means, td_weights,
    td_min, td_max, td_total``. Rows with NULL/NaN value, NULL weight,
    or ``w ≤ 0`` carry no mass (the quantile family's rule); an
    all-excluded group emits no row.
    """
    import pandas as pd

    if delta < 10:
        raise ValueError("delta must be >= 10")
    keys = list(by or [])
    w_expr = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    src = df.select(
        *keys,
        F.col(value_col).cast("double").alias("__td_x__"),
        w_expr.cast("double").alias("__td_w__"),
    )
    mid_schema = StructType(
        [src.schema[k] for k in keys] + _DIGEST_FIELDS
    )

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            groups = (
                pdf.groupby(keys, dropna=False, sort=False)
                if keys
                else [((), pdf)]
            )
            rows = []
            for gkey, part in groups:
                d = _digest_of(
                    part["__td_x__"].to_numpy(), part["__td_w__"].to_numpy(),
                    delta,
                )
                if d is None:
                    continue
                m, w, lo, hi, tot = d
                if keys and not isinstance(gkey, tuple):
                    gkey = (gkey,)
                rows.append(
                    [*gkey, list(m), list(w), lo, hi, tot]
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in mid_schema.fields]
                )

    partials = src.mapInPandas(_partials, schema=mid_schema)

    out_schema = mid_schema  # same shape after merging

    def _merge(pdf):
        m = np.concatenate([np.asarray(a, float) for a in pdf["td_means"]])
        w = np.concatenate([np.asarray(a, float) for a in pdf["td_weights"]])
        mm, ww = _compress(m, w, delta)
        row = [
            *(pdf.iloc[0][k] for k in keys),
            list(mm), list(ww),
            float(pdf["td_min"].min()), float(pdf["td_max"].max()),
            float(pdf["td_total"].sum()),
        ]
        return pd.DataFrame([row], columns=[f.name for f in out_schema.fields])

    if keys:
        return partials.groupBy(*keys).applyInPandas(
            _merge, schema=out_schema
        )
    return partials.groupBy().applyInPandas(_merge, schema=out_schema)


def merge_digests(digests: DataFrame, by: Optional[Sequence[str]] = None,
                  delta: int = 100) -> DataFrame:
    """Merge digest rows (e.g. daily partials) into one per group —
    the mergeability surface: ``merge(digest(A), digest(B)) ≈
    digest(A ∪ B)`` at the same rank-error bound."""
    import pandas as pd

    keys = list(by or [])

    def _merge(pdf):
        m = np.concatenate([np.asarray(a, float) for a in pdf["td_means"]])
        w = np.concatenate([np.asarray(a, float) for a in pdf["td_weights"]])
        mm, ww = _compress(m, w, delta)
        row = [
            *(pdf.iloc[0][k] for k in keys),
            list(mm), list(ww),
            float(pdf["td_min"].min()), float(pdf["td_max"].max()),
            float(pdf["td_total"].sum()),
        ]
        return pd.DataFrame(
            [row],
            columns=keys + [f.name for f in _DIGEST_FIELDS],
        )

    schema = StructType(
        [digests.schema[k] for k in keys] + _DIGEST_FIELDS
    )
    if keys:
        return digests.groupBy(*keys).applyInPandas(_merge, schema=schema)
    return digests.groupBy().applyInPandas(_merge, schema=schema)


def _quantile_from_digest(means, weights, lo, hi, total, q):
    """Standard t-digest interpolation: centroid midpoints anchor the
    cumulative curve; clamp to the exact observed min/max."""
    means = np.asarray(means, float)
    weights = np.asarray(weights, float)
    if total <= 0 or len(means) == 0:
        return None
    target = q * total
    cum = 0.0
    prev_mid_mass = 0.0
    prev_mean = lo
    for m, w in zip(means, weights):
        mid = cum + w / 2.0
        if target < mid:
            # interpolate between previous centroid midpoint and this one
            span = mid - prev_mid_mass
            frac = 0.0 if span <= 0 else (target - prev_mid_mass) / span
            return float(prev_mean + frac * (m - prev_mean))
        prev_mid_mass = mid
        prev_mean = m
        cum += w
    return float(hi)


def tdigest_quantiles(
    digests: DataFrame,
    qs: Sequence[float],
    by: Optional[Sequence[str]] = None,
    value_name: str = "value",
) -> DataFrame:
    """Quantile estimates from digest rows: ``keys…, q, {value_name}``
    (long format). Row-local array math over the tiny digest rows —
    Arrow-batched, no shuffle."""
    import pandas as pd

    keys = list(by or [])
    qs = [float(q) for q in qs]
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q}")
    schema = StructType(
        [digests.schema[k] for k in keys]
        + [StructField("q", DoubleType()),
           StructField(value_name, DoubleType())]
    )

    def _rows(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                for q in qs:
                    out.append(
                        [
                            *(r[k] for k in keys),
                            q,
                            _quantile_from_digest(
                                r["td_means"], r["td_weights"],
                                r["td_min"], r["td_max"], r["td_total"], q,
                            ),
                        ]
                    )
            if out:
                yield pd.DataFrame(
                    out, columns=[f.name for f in schema.fields]
                )

    return digests.mapInPandas(_rows, schema=schema)
