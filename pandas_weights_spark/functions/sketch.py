"""Weighted sketches: count-min for heavy-hitter weight mass.

Spark ships a CountMinSketch (``DataFrame.stat.countMinSketch``) that
counts ROWS; training-data pipelines need the WEIGHTED analog — "how
much sampling mass / token count does each domain carry" — over
cardinalities where an exact ``value_counts`` would shuffle billions of
distinct keys. The reference library has no sketch surface; this is an
engine extension in the spirit of SURVEY.md §2.6.

Design (classic Cormode-Muthukrishnan, weights instead of counts):

* ``weighted_cms`` builds a ``depth × width`` table of
  ``Σ weight`` per (hash row, bucket) as ONE hash aggregate — the
  output is ``depth·width`` rows no matter the input size, and sketches
  of disjoint data UNION+SUM to the sketch of the union (mergeable:
  the same property the moment kernels exploit).
* ``cms_lookup`` joins a values frame against the sketch and takes the
  per-row MIN over the depth estimates — the standard one-sided
  estimate: ``est ≥ true`` always, ``est ≤ true + ε·Σw`` with
  probability ``1−δ`` for ``width = ⌈e/ε⌉``, ``depth = ⌈ln(1/δ)⌉``.
* ``weighted_heavy_hitters`` screens candidates through the sketch —
  the candidates come from a cheap per-partition pre-aggregation, so
  the full key cardinality never shuffles.

Hashes: seeded ``xxhash64`` by default (fastest JVM-side hash), or —
with ``portable_hash=True`` — an md5-derived bucket that any SQL engine
reproduces digit-for-digit (the same trick as ``dedup.simhash``), so
the DuckDB oracle can rebuild the identical sketch. Both are
deterministic; the md5 path costs one md5 per (row, depth) pair and is
meant for cross-engine verification, not the 100 TB hot path.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["weighted_cms", "cms_lookup", "weighted_heavy_hitters"]


def _bucket(
    col: Column, row: int, width: int, seed: int, portable: bool = False
) -> Column:
    if not portable:
        return F.pmod(F.xxhash64(col, F.lit(seed + row)), F.lit(width))
    # engine-portable: first 15 hex digits of md5("<key>:<seed+row>")
    # as a base-16 integer (60 bits, exact in a long), mod width. Any
    # SQL engine with md5() reproduces this bucket exactly.
    h = F.md5(F.concat(col.cast("string"), F.lit(f":{seed + row}")))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(width))


def weighted_cms(
    df: DataFrame,
    key: str,
    weights: Union[str, Column],
    depth: int = 5,
    width: int = 2048,
    seed: int = 42,
    portable_hash: bool = False,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, mass)`` with ``depth·width``
    rows. NULL keys and NULL weights carry no mass. One explode (factor
    ``depth``) feeding one hash aggregate with map-side combine."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    w = F.col(weights) if isinstance(weights, str) else weights
    w = w.cast("double")
    k = F.col(key)
    mass = F.when(k.isNotNull() & w.isNotNull(), w).otherwise(F.lit(0.0))
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(k, r, width, seed, portable_hash).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(mass.alias("__m__"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("__m__").alias("mass"))
    )


def cms_lookup(
    sketch: DataFrame,
    values: DataFrame,
    key: str,
    depth: int = 5,
    width: int = 2048,
    seed: int = 42,
    out_col: str = "est_mass",
    portable_hash: bool = False,
) -> DataFrame:
    """Estimate each value's total weight mass: min over the depth
    rows' counters. The sketch is tiny (``depth·width`` rows) and
    broadcast; the values frame streams map-side."""
    est = _estimate(
        sketch, values, key, depth, width, seed, out_col, portable_hash
    )
    return values.join(F.broadcast(est), on=key, how="left")


def _estimate(
    sketch: DataFrame,
    values: DataFrame,
    key: str,
    depth: int,
    width: int,
    seed: int,
    out_col: str,
    portable_hash: bool,
) -> DataFrame:
    """``(key, est_mass)`` per distinct key in ``values`` — the CMS
    min-over-depth estimate without re-attaching the values frame (the
    re-attach in ``cms_lookup`` recomputes the values lineage; callers
    that only need the estimate, like ``weighted_heavy_hitters``, use
    this to keep the input single-scan)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(F.col(key), r, width, seed, portable_hash).alias(
                    "bucket"
                ),
            )
            for r in range(depth)
        ]
    )
    exploded = values.select(
        F.col(key), F.explode(pairs).alias("p")
    ).select(key, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        exploded.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("mass"), F.lit(0.0))).alias(out_col))
    )


def weighted_heavy_hitters(
    df: DataFrame,
    key: str,
    weights: Union[str, Column],
    threshold_frac: float = 0.01,
    depth: int = 5,
    width: int = 2048,
    seed: int = 42,
    candidates_per_partition: int = 64,
    portable_hash: bool = False,
) -> DataFrame:
    """Keys whose estimated weight mass exceeds ``threshold_frac`` of
    the total — WITHOUT shuffling the full key cardinality.

    Candidates come from a per-partition top-N computed INSIDE each
    partition (Arrow-batched ``mapInPandas``, no shuffle): any key
    holding ≥ frac of the TOTAL must hold ≥ frac of at least one
    partition (pigeonhole over Σ_p), and a partition holds at most
    ``1/frac`` keys at ≥ frac local share — so per-partition
    top-``candidates_per_partition`` with ``N ≥ 1/threshold_frac`` is
    a strict superset of the true heavy hitters. Only ≤ partitions × N
    candidate keys ever cross the network; they are then screened
    through the CMS estimate (one-sided: no true heavy hitter is ever
    dropped; borderline keys may need an exact re-check).

    Output: ``(key, est_mass, est_frac)`` for keys with
    ``est_frac ≥ threshold_frac``.
    """
    if not 0 < threshold_frac <= 1:
        raise ValueError("threshold_frac must be in (0, 1]")
    if candidates_per_partition < math.ceil(1.0 / threshold_frac):
        raise ValueError(
            "candidates_per_partition must be >= 1/threshold_frac "
            f"({math.ceil(1.0 / threshold_frac)}) or true heavy hitters "
            "could be missed"
        )
    w = F.col(weights) if isinstance(weights, str) else weights
    w = w.cast("double")
    k = F.col(key)
    mass = F.when(k.isNotNull() & w.isNotNull(), w).otherwise(F.lit(0.0))

    # TWO scans of df total: the sketch aggregate and the candidate
    # mapInPandas pass. The grand total is NOT a third scan — every hash
    # row's buckets partition the full mass, so Σ mass over row 0 IS the
    # total; persist the (depth·width)-row sketch so the action that
    # reads the total also materializes the table cms_lookup broadcasts.
    sketch = weighted_cms(
        df, key, weights, depth, width, seed, portable_hash
    ).persist()
    total_row = (
        sketch.where(F.col("row") == 0).agg(F.sum("mass").alias("t")).first()
    )
    total = float(total_row["t"] or 0.0)
    if total <= 0:
        return (
            df.select(k.alias(key))
            .where(F.lit(False))
            .withColumn("est_mass", F.lit(0.0))
            .withColumn("est_frac", F.lit(0.0))
        )

    # per-partition local mass -> local top-N candidate keys, computed
    # INSIDE each partition (mapInPandas accumulates across the
    # partition's Arrow batches): zero shuffle, <= N rows emitted per
    # partition — the full key cardinality never crosses the network
    key_type = df.schema[key].dataType.simpleString()
    n_cand = int(candidates_per_partition)

    def _local_top(batches):
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            valid = pdf.dropna(subset=[key, "__m__"])
            for kk, vv in valid.groupby(key)["__m__"].sum().items():
                acc[kk] = acc.get(kk, 0.0) + float(vv)
        top = sorted(acc.items(), key=lambda t: (-t[1], str(t[0])))[:n_cand]
        yield pd.DataFrame({key: [t[0] for t in top]})

    cands = (
        df.select(k.alias(key), mass.alias("__m__"))
        .mapInPandas(_local_top, f"`{key}` {key_type}")
        .distinct()
    )
    est = _estimate(
        sketch, cands, key, depth, width, seed, "est_mass", portable_hash
    )
    return (
        est.withColumn("est_frac", F.col("est_mass") / F.lit(total))
        .where(F.col("est_frac") >= threshold_frac)
        .orderBy(F.col("est_mass").desc())
    )
