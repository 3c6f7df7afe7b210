"""Bloom-filter semi-join pruning (functions/bloom.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_semi_join,
)


def _frames(spark, seed=7, n_large=2000, n_small=60):
    rng = np.random.default_rng(seed)
    large = spark.createDataFrame(
        [(int(k), float(v)) for k, v in
         zip(rng.integers(0, 500, n_large), rng.normal(size=n_large))]
        + [(None, 0.0)],
        "k bigint, v double",
    )
    small = spark.createDataFrame(
        [(int(k),) for k in rng.choice(500, n_small, replace=False)]
        + [(None,)],
        "k bigint",
    )
    return large, small


class TestSemantics:
    def test_exact_equals_left_semi(self, spark):
        large, small = _frames(spark)
        got = sorted(
            (r["k"], r["v"])
            for r in bloom_semi_join(large, small, "k", fpp=0.05).collect()
        )
        exp = sorted(
            (r["k"], r["v"])
            for r in large.join(
                small.where(F.col("k").isNotNull()).distinct(),
                on="k", how="left_semi",
            ).collect()
        )
        assert got == exp

    def test_inexact_is_superset_with_no_false_negatives(self, spark):
        large, small = _frames(spark, seed=11)
        approx = {
            (r["k"], r["v"])
            for r in bloom_semi_join(
                large, small, "k", fpp=0.2, exact=False
            ).collect()
        }
        exact = {
            (r["k"], r["v"])
            for r in large.join(small, on="k", how="left_semi").collect()
        }
        assert exact <= approx
        # NULL keys never probe true
        assert all(k is not None for k, _ in approx)

    def test_tiny_bitmap_forced_collisions_still_exact(self, spark):
        large, small = _frames(spark, seed=13)
        got = sorted(
            r["k"]
            for r in bloom_semi_join(
                large, small, "k", num_bits=64, num_hashes=1
            ).collect()
        )
        exp = sorted(
            r["k"]
            for r in large.join(small, on="k", how="left_semi").collect()
        )
        assert got == exp

    def test_params_and_guards(self, spark):
        m, k = bloom_params(1000, 0.01)
        assert m >= 9000 and 5 <= k <= 10
        with pytest.raises(ValueError):
            bloom_params(0, 0.01)
        with pytest.raises(ValueError):
            bloom_params(10, 1.5)
        large, small = _frames(spark)
        with pytest.raises(KeyError):
            bloom_semi_join(large, small, "missing")


class TestScaleShape:
    def test_probe_is_map_side_broadcast(self, spark):
        import pandas_weights_spark.plans as P

        large, small = _frames(spark)
        pruned = bloom_semi_join(
            large, small, "k", expected_items=64, exact=False
        )
        plan = P.physical_plan(pruned)
        # the bitmap arrives via BroadcastNestedLoopJoin of a 1-row
        # frame; the ONLY exchanges sit on the small side (bitmap agg),
        # never on the large probe side
        assert "BroadcastExchange" in plan
        assert not P.has_python_eval(pruned)
        import re

        # large side scan feeds a Filter with no Exchange in between
        assert re.search(r"might|bitwise|&", plan) or "Filter" in plan

    def test_bitmap_is_bounded(self, spark):
        _, small = _frames(spark)
        bf = bloom_build(small, "k", num_bits=256, num_hashes=3)
        row = bf.collect()[0]["bf"]
        assert len(row) <= 256 // 64
