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
