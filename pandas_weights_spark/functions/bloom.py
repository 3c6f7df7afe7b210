"""Bloom-filter semi-join pruning.

``bloom_semi_join(large, small, key)`` filters the large side to rows
whose key *might* appear in the small side, using a Bloom filter built
FROM the small side — then (``exact=True``, default) an ordinary
``left_semi`` join on the survivors makes the result exactly equal to
``large.join(small, key, "left_semi")``. The point at 100 TB: the
bloom probe is a MAP-SIDE predicate on the large side, so the rows a
plain semi join would shuffle and then discard never enter the
exchange; the bitmap is ``num_bits/64`` longs regardless of the small
side's cardinality (vs collecting the keys themselves, which is
unbounded).

Spark's own runtime row-level filtering covers some of this for
equi-joins it plans itself; this operator makes the pruning explicit,
tunable (bits/hashes/fpp), reusable across queries, and available to
non-join consumers (``bloom_might_contain`` as a bare Column).

Everything is DataFrame-native — the bitmap is built by a word-indexed
``bit_or`` aggregate (map-side combine, ≤ ``num_bits/64`` rows shuffle)
and shipped as ONE broadcast row holding a ``map<word, bits>``; no
driver-side collect anywhere.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_might_contain", "bloom_semi_join",
           "bloom_params"]


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: bits ``m = ⌈−n·ln p / ln²2⌉`` and hash
    count ``k = max(1, round(m/n·ln 2))``."""
    if expected_items < 1:
        raise ValueError("expected_items must be >= 1")
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    m = max(64, int(math.ceil(
        -expected_items * math.log(fpp) / (math.log(2.0) ** 2)
    )))
    k = max(1, round(m / expected_items * math.log(2.0)))
    return m, k


def _positions(key: Column, num_bits: int, num_hashes: int, seed: int):
    return [
        F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    small: DataFrame,
    key: str,
    num_bits: int,
    num_hashes: int,
    seed: int = 42,
) -> DataFrame:
    """ONE-row DataFrame with column ``bf``: a ``map<long, long>`` of
    64-bit words (word index → set bits). NULL keys carry nothing (a
    semi join never matches NULL). Sparse by construction — absent
    words are all-zero."""
    pos = F.array(
        *_positions(F.col(key), num_bits, num_hashes, seed)
    )
    words = (
        small.where(F.col(key).isNotNull())
        .select(F.explode(pos).alias("p"))
        .select(
            F.floor(F.col("p") / F.lit(64)).cast("long").alias("w"),
            # call_function: the python shiftleft() wants a literal
            # shift amount; the SQL function takes a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                (F.col("p") % 64).cast("int"),
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("m"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "m"))).alias("bf")
    )


def bloom_might_contain(
    key: Column,
    bf: Column,
    num_bits: int,
    num_hashes: int,
    seed: int = 42,
) -> Column:
    """Membership probe against a :func:`bloom_build` bitmap — false
    negatives impossible, false-positive rate ≈ the sizing ``fpp``.
    NULL keys probe false."""
    cond = key.isNotNull()
    for p in _positions(key, num_bits, num_hashes, seed):
        w = F.floor(p / F.lit(64)).cast("long")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (
            F.coalesce(F.element_at(bf, w), F.lit(0).cast("long"))
            .bitwiseAND(mask)
            != 0
        )
    return cond


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    expected_items: Optional[int] = None,
    fpp: float = 0.01,
    num_bits: Optional[int] = None,
    num_hashes: Optional[int] = None,
    exact: bool = True,
    seed: int = 42,
) -> DataFrame:
    """``large ⋉ small`` on column ``on`` with Bloom pre-pruning.

    ``exact=True`` (default) follows the probe with a real
    ``left_semi`` join, so the result equals the plain semi join
    row-for-row — the bloom only shrinks what reaches the join's
    exchange. ``exact=False`` returns the probe survivors alone (a
    superset with ≈``fpp`` false positives; no shuffle at all on the
    large side).

    Sizing: pass ``num_bits``/``num_hashes`` directly, or
    ``expected_items`` (+ ``fpp``); with neither, the small side's
    distinct-key count is computed first (one extra action —
    acceptable for an interactive call, pass the estimate in a
    pipeline).
    """
    if on not in large.columns or on not in small.columns:
        raise KeyError(f"join column {on!r} must exist in both frames")
    if num_bits is None or num_hashes is None:
        if expected_items is None:
            expected_items = (
                small.select(on).where(F.col(on).isNotNull())
                .distinct().count()
            ) or 1
        num_bits, num_hashes = bloom_params(int(expected_items), fpp)
    bf_row = bloom_build(small, on, num_bits, num_hashes, seed)
    pruned = (
        large.crossJoin(F.broadcast(bf_row))
        .where(
            bloom_might_contain(
                F.col(on), F.col("bf"), num_bits, num_hashes, seed
            )
        )
        .drop("bf")
    )
    if not exact:
        return pruned
    return pruned.join(
        small.select(on).where(F.col(on).isNotNull()).distinct(),
        on=on,
        how="left_semi",
    )
