"""Distinct-count surfaces (functions/distinct.py): exact vs approx
accuracy, HLL sketch merge ≈ whole, NULL handling, plan purity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.distinct import (
    distinct_counts,
    hll_sketches,
    merge_hll_sketches,
)


@pytest.fixture(scope="module")
def cards(spark):
    rng = np.random.default_rng(23)
    rows = [
        (int(i % 2), f"u{int(rng.integers(0, 5000))}",
         f"d{int(rng.integers(0, 50))}")
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "g int, user string, dom string")
    return df, rows


class TestDistinctCounts:
    def test_exact(self, spark, cards):
        df, rows = cards
        out = {
            r["g"]: r
            for r in distinct_counts(df, ["user", "dom"], by=["g"]).collect()
        }
        for g in (0, 1):
            users = {u for gg, u, _ in rows if gg == g}
            doms = {d for gg, _, d in rows if gg == g}
            assert out[g]["user_distinct"] == len(users)
            assert out[g]["dom_distinct"] == len(doms)

    def test_approx_within_rsd(self, spark, cards):
        df, rows = cards
        out = distinct_counts(
            df, ["user"], exact=False, rsd=0.02
        ).collect()[0]
        exact = len({u for _, u, _ in rows})
        assert out["user_distinct"] == pytest.approx(exact, rel=0.06)

    def test_nulls_not_counted(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), ("a",), ("b",)], "x string"
        )
        out = distinct_counts(df, ["x"]).collect()[0]
        assert out["x_distinct"] == 2

    def test_missing_col_raises(self, spark):
        df = spark.createDataFrame([("a",)], "x string")
        with pytest.raises(KeyError):
            distinct_counts(df, ["nope"])
        with pytest.raises(ValueError):
            distinct_counts(df, [])


class TestHllSketches:
    def test_merge_matches_whole(self, spark, cards):
        df, rows = cards
        # partials per group g, merged globally, vs one whole-table pass
        partials = hll_sketches(df, ["user"], by=["g"])
        merged = merge_hll_sketches(partials, ["user"]).collect()[0]
        whole = hll_sketches(df, ["user"])
        whole_est = merge_hll_sketches(whole, ["user"]).collect()[0]
        exact = len({u for _, u, _ in rows})
        assert merged["user_distinct"] == pytest.approx(exact, rel=0.05)
        # merging partials must agree with the single-pass sketch
        assert merged["user_distinct"] == whole_est["user_distinct"]

    def test_sketch_is_compact_binary(self, spark, cards):
        df, _ = cards
        row = hll_sketches(df, ["user"], lg_config_k=10).collect()[0]
        assert isinstance(row["user_hll"], (bytes, bytearray))
        assert len(row["user_hll"]) < 64_000

    def test_jvm_only_plan(self, spark, cards):
        import pandas_weights_spark.plans as P

        df, _ = cards
        out = distinct_counts(df, ["user"], by=["g"], exact=False)
        assert not P.has_python_eval(out)
        assert not P.has_python_eval(hll_sketches(df, ["user"], by=["g"]))
