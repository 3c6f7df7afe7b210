"""Winsorize (quantile.weighted_winsorize): quantile-bound clipping,
NULL/empty-group semantics, binned path, plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import wt


def _bounds(vals, ws, q):
    """Inverted-CDF weighted quantile (the engine's definition)."""
    pairs = sorted((v, w) for v, w in zip(vals, ws) if v is not None and w > 0)
    tot = sum(w for _, w in pairs)
    cum = 0.0
    for v, w in pairs:
        cum += w
        if cum >= q * tot:
            return v
    return pairs[-1][0]


class TestWinsorize:
    def test_matches_weighted_quantile_bounds(self, spark):
        rng = np.random.default_rng(5)
        rows = [
            (int(i % 3), float(rng.normal(0, 10)), float(rng.integers(1, 5)))
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "g int, v double, w double")
        out = wt(df, "w").groupby("g").winsorize(
            ["v"], lower=0.1, upper=0.9
        )
        got = {(r["g"], r["v"]): r["v_wins"] for r in out.collect()}
        by_g = {}
        for g, v, w in rows:
            by_g.setdefault(g, ([], []))
            by_g[g][0].append(v)
            by_g[g][1].append(w)
        for (g, v), clipped in got.items():
            lo = _bounds(*by_g[g], 0.1)
            hi = _bounds(*by_g[g], 0.9)
            assert clipped == pytest.approx(min(max(v, lo), hi)), (g, v)

    def test_null_value_stays_null(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0, 1.0), (1, None, 1.0), (1, 100.0, 1.0)],
            "g int, v double, w double",
        )
        out = wt(df, "w").groupby("g").winsorize(["v"], lower=0.25, upper=0.75)
        vals = {r["v"]: r["v_wins"] for r in out.collect()}
        assert vals[None] is None

    def test_zero_mass_group_passes_through(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0, 0.0), (1, 99.0, 0.0)], "g int, v double, w double"
        )
        out = wt(df, "w").groupby("g").winsorize(["v"])
        vals = sorted(r["v_wins"] for r in out.collect())
        assert vals == [5.0, 99.0]

    def test_lower_zero_clips_at_weighted_min(self, spark):
        # lower=0 must behave as "no lower clipping beyond the weighted
        # support min" — mass-carrying min, not the raw min
        df = spark.createDataFrame(
            [(1, -50.0, 0.0), (1, 1.0, 1.0), (1, 2.0, 1.0), (1, 9.0, 1.0)],
            "g int, v double, w double",
        )
        out = wt(df, "w").groupby("g").winsorize(["v"], lower=0.0, upper=1.0)
        got = {r["v"]: r["v_wins"] for r in out.collect()}
        assert got[-50.0] == 1.0  # zero-weight outlier clipped to support
        assert got[9.0] == 9.0

    def test_global_winsorize(self, spark):
        df = spark.createDataFrame(
            [(float(i), 1.0) for i in range(1, 11)], "v double, w double"
        )
        with pytest.warns(UserWarning, match="single partition|SINGLE"):
            out = wt(df, "w").winsorize(["v"], lower=0.2, upper=0.8)
        got = {r["v"]: r["v_wins"] for r in out.collect()}
        assert got[1.0] == 2.0 and got[10.0] == 8.0 and got[5.0] == 5.0

    def test_binned_close_to_exact(self, spark):
        rng = np.random.default_rng(11)
        rows = [
            (int(i % 2), float(rng.uniform(0, 100)), 1.0) for i in range(500)
        ]
        df = spark.createDataFrame(rows, "g int, v double, w double")
        exact = {
            (r["g"], r["v"]): r["v_wins"]
            for r in wt(df, "w").groupby("g").winsorize(["v"]).collect()
        }
        binned = {
            (r["g"], r["v"]): r["v_wins"]
            for r in wt(df, "w")
            .groupby("g")
            .winsorize(["v"], exact=False, range_bounds=(0.0, 100.0),
                       bands=2000)
            .collect()
        }
        for k, v in exact.items():
            assert binned[k] == pytest.approx(v, abs=100.0 / 2000 + 1e-9)

    def test_binned_requires_range(self, spark):
        df = spark.createDataFrame([(1, 1.0, 1.0)], "g int, v double, w double")
        with pytest.raises(ValueError, match="range_bounds"):
            wt(df, "w").groupby("g").winsorize(["v"], exact=False)

    def test_bad_bounds_raise(self, spark):
        df = spark.createDataFrame([(1, 1.0, 1.0)], "g int, v double, w double")
        with pytest.raises(ValueError, match="lower"):
            wt(df, "w").groupby("g").winsorize(["v"], lower=0.9, upper=0.1)

    def test_no_python_eval_and_single_fat_shuffle(self, spark):
        import pandas_weights_spark.plans as P

        df = spark.createDataFrame(
            [(1, 2.0, 1.0)], "g int, v double, w double"
        )
        out = wt(df, "w").groupby("g").winsorize(["v"])
        assert not P.has_python_eval(out)
