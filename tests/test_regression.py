"""Weighted line fit (regression.py) vs numpy.polyfit + plan pins."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import wt


def _pdf(seed=31, n=300):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 3, n)
    x = rng.normal(10, 3, n)
    y = 2.5 * x - 4.0 + rng.normal(0, 1.5, n) + g * 3.0
    w = rng.integers(1, 6, n).astype(float)
    x[rng.random(n) < 0.1] = np.nan
    y[rng.random(n) < 0.1] = np.nan
    return pd.DataFrame({"g": g, "x": x, "y": y, "w": w})


class TestVsNumpy:
    def test_grouped_vs_polyfit(self, spark):
        pdf = _pdf()
        out = {
            r["g"]: r
            for r in wt(spark.createDataFrame(pdf), "w")
            .linfit("x", "y", by=["g"])
            .collect()
        }
        for g, grp in pdf.groupby("g"):
            m = grp.dropna(subset=["x", "y"])
            slope, intercept = np.polyfit(m["x"], m["y"], 1, w=m["w"])
            # np.polyfit minimizes Σ(w·resid)² (weights enter squared);
            # replicate the frequency-weight fit directly instead
            W = m["w"].sum()
            xb = (m["w"] * m["x"]).sum() / W
            yb = (m["w"] * m["y"]).sum() / W
            sxx = (m["w"] * (m["x"] - xb) ** 2).sum()
            sxy = (m["w"] * (m["x"] - xb) * (m["y"] - yb)).sum()
            assert out[g]["slope"] == pytest.approx(sxy / sxx, rel=1e-9)
            assert out[g]["intercept"] == pytest.approx(
                yb - (sxy / sxx) * xb, rel=1e-9
            )
            # r² == weighted Pearson² on the same mask
            syy = (m["w"] * (m["y"] - yb) ** 2).sum()
            assert out[g]["r2"] == pytest.approx(
                sxy * sxy / (sxx * syy), rel=1e-9
            )
            sse = syy - (sxy / sxx) ** 2 * sxx
            assert out[g]["rmse"] == pytest.approx(
                np.sqrt(sse / (W - 2.0)), rel=1e-9
            )

    def test_unit_weights_match_polyfit(self, spark):
        pdf = _pdf(seed=37)
        pdf["w"] = 1.0
        m = pdf.dropna(subset=["x", "y"])
        slope, intercept = np.polyfit(m["x"], m["y"], 1)
        row = wt(spark.createDataFrame(pdf), "w").linfit("x", "y").collect()[0]
        assert row["slope"] == pytest.approx(slope, rel=1e-9)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-9)


class TestGuardsAndTransform:
    def test_degenerate_groups_null(self, spark):
        df = spark.createDataFrame(
            [("one", 1.0, 5.0, 1.0),            # single point
             ("flat", 2.0, 1.0, 1.0), ("flat", 2.0, 9.0, 3.0)],  # zero var x
            "g string, x double, y double, w double",
        )
        out = {
            r["g"]: r
            for r in wt(df, "w").linfit("x", "y", by=["g"]).collect()
        }
        assert out["one"]["slope"] is None
        assert out["flat"]["slope"] is None and out["flat"]["r2"] is None

    def test_transform_residuals(self, spark):
        pdf = _pdf(seed=41)
        sdf = spark.createDataFrame(pdf)
        wdf = wt(sdf, "w")
        coef = {
            r["g"]: (r["slope"], r["intercept"])
            for r in wdf.linfit("x", "y", by=["g"]).collect()
        }
        rows = wdf.linfit_transform("x", "y", by=["g"]).collect()
        assert len(rows) == len(pdf)
        def missing(v):
            return v is None or (isinstance(v, float) and np.isnan(v))

        for r in rows:
            if missing(r["x"]):
                # NaN means missing (nanvl), like every kernel
                assert r["y_fitted"] is None
            else:
                b, a = coef[r["g"]]
                assert r["y_fitted"] == pytest.approx(
                    a + b * r["x"], rel=1e-12
                )
                if not missing(r["y"]):
                    assert r["y_resid"] == pytest.approx(
                        r["y"] - r["y_fitted"], rel=1e-9, abs=1e-12
                    )

    def test_plan_one_aggregate_no_window(self, spark):
        import pandas_weights_spark.plans as P

        df = spark.createDataFrame(
            [(1, float(i), float(2 * i), 1.0) for i in range(40)],
            "g int, x double, y double, w double",
        )
        fit = wt(df, "w").linfit("x", "y", by=["g"])
        plan = P.physical_plan(fit)
        assert "Window" not in plan, plan
        assert "partial_" in plan  # map-side combine
        assert P.count_exchanges(fit) == 1, plan
        # transform: agg -> join-back -> map, never a keys-only window
        tr = wt(df, "w").linfit_transform("x", "y", by=["g"])
        assert "Window" not in P.physical_plan(tr)
        assert not P.has_python_eval(tr)


class TestLinreg:
    """Multiple WLS (regression.weighted_linreg) vs numpy lstsq on
    weight-expanded data."""

    @staticmethod
    def _data(n=300, seed=4):
        import numpy as np

        rng = np.random.default_rng(seed)
        x1 = rng.uniform(-2, 2, n)
        x2 = rng.uniform(0, 5, n)
        y = 1.5 + 2.0 * x1 - 0.7 * x2 + rng.normal(0, 0.3, n)
        w = rng.integers(1, 4, n)
        g = np.where(np.arange(n) % 2 == 0, "a", "b")
        return x1, x2, y, w, g

    @staticmethod
    def _ref(x1, x2, y, w):
        import numpy as np

        X = np.column_stack([np.ones_like(x1), x1, x2])
        WX = X * w[:, None]
        beta = np.linalg.solve(X.T @ WX, WX.T @ y)
        resid = y - X @ beta
        sse = (w * resid ** 2).sum()
        mu = (w * y).sum() / w.sum()
        sst = (w * (y - mu) ** 2).sum()
        return beta, 1 - sse / sst

    def test_matches_numpy_global(self, spark):
        from pandas_weights_spark import wt
        from pandas_weights_spark.regression import weighted_linreg

        x1, x2, y, w, g = self._data()
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), int(d))
             for a, b, c, d in zip(x1, x2, y, w)],
            "x1 double, x2 double, y double, w int",
        )
        out = weighted_linreg(wt(df, "w"), ["x1", "x2"], "y").collect()[0]
        beta, r2 = self._ref(x1, x2, y, w)
        assert out["intercept"] == pytest.approx(beta[0], rel=1e-9)
        assert out["coef"][0] == pytest.approx(beta[1], rel=1e-9)
        assert out["coef"][1] == pytest.approx(beta[2], rel=1e-9)
        assert out["r2"] == pytest.approx(r2, rel=1e-9)
        assert out["n"] == float(w.sum())

    def test_grouped(self, spark):
        import numpy as np

        from pandas_weights_spark import wt
        from pandas_weights_spark.regression import weighted_linreg

        x1, x2, y, w, g = self._data()
        df = spark.createDataFrame(
            [(str(gg), float(a), float(b), float(c), int(d))
             for gg, a, b, c, d in zip(g, x1, x2, y, w)],
            "g string, x1 double, x2 double, y double, w int",
        )
        outs = {
            r["g"]: r
            for r in weighted_linreg(
                wt(df, "w"), ["x1", "x2"], "y", by=["g"]
            ).collect()
        }
        for gg in ("a", "b"):
            mask = g == gg
            beta, r2 = self._ref(x1[mask], x2[mask], y[mask], w[mask])
            assert outs[gg]["intercept"] == pytest.approx(beta[0], rel=1e-8)
            assert outs[gg]["coef"] == pytest.approx(list(beta[1:]), rel=1e-8)

    def test_reduces_to_linfit(self, spark):
        from pandas_weights_spark import wt
        from pandas_weights_spark.regression import (
            weighted_linfit,
            weighted_linreg,
        )

        x1, x2, y, w, g = self._data()
        df = spark.createDataFrame(
            [(float(a), float(c), int(d)) for a, c, d in zip(x1, y, w)],
            "x double, y double, w int",
        )
        multi = weighted_linreg(wt(df, "w"), ["x"], "y").collect()[0]
        single = weighted_linfit(wt(df, "w"), "x", "y").collect()[0]
        assert multi["intercept"] == pytest.approx(single["intercept"], rel=1e-9)
        assert multi["coef"][0] == pytest.approx(single["slope"], rel=1e-9)

    def test_underdetermined_nulls(self, spark):
        from pandas_weights_spark import wt
        from pandas_weights_spark.regression import weighted_linreg

        df = spark.createDataFrame(
            [(1.0, 2.0, 3.0, 1)], "x1 double, x2 double, y double, w int"
        )
        out = weighted_linreg(wt(df, "w"), ["x1", "x2"], "y").collect()[0]
        assert out["intercept"] is None and out["coef"] is None

    def test_python_only_on_aggregated_rows(self, spark):
        from pandas_weights_spark import wt
        from pandas_weights_spark.regression import weighted_linreg

        x1, x2, y, w, g = self._data()
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), int(d))
             for a, b, c, d in zip(x1, x2, y, w)],
            "x1 double, x2 double, y double, w int",
        )
        out = weighted_linreg(wt(df, "w"), ["x1", "x2"], "y")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # python stage must sit ABOVE the aggregate (solve on tiny rows),
        # and the raw scan below must feed a codegen'd hash aggregate
        assert "FlatMapGroupsInPandas" in plan
        assert plan.index("HashAggregate") > plan.index("FlatMapGroupsInPandas"), \
            "aggregate must run below the python solve"
