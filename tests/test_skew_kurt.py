"""Weighted skewness / kurtosis (population definition) — extensions
beyond the reference, built on the same one-pass moment kernels."""

import math

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import wt


def _pop_moments(xs, ws):
    rows = [(x, w) for x, w in zip(xs, ws) if x is not None and w is not None]
    W = sum(w for _, w in rows)
    mu = sum(w * x for x, w in rows) / W
    m2 = sum(w * (x - mu) ** 2 for x, w in rows) / W
    m3 = sum(w * (x - mu) ** 3 for x, w in rows) / W
    m4 = sum(w * (x - mu) ** 4 for x, w in rows) / W
    return W, mu, m2, m3, m4


def _skew(xs, ws):
    _, _, m2, m3, _ = _pop_moments(xs, ws)
    return m3 / (m2 * math.sqrt(m2))


def _kurt(xs, ws):
    _, _, m2, _, m4 = _pop_moments(xs, ws)
    return m4 / (m2 * m2) - 3.0


XS = [1.0, 2.0, 2.5, 4.0, 10.0, 3.0]
WS = [1.0, 2.0, 1.0, 3.0, 1.0, 2.0]


@pytest.fixture(scope="module")
def wdf(spark):
    return wt(
        spark.createDataFrame(list(zip(XS, WS)), "x double, w double"), "w"
    )


class TestGlobal:
    def test_skew_matches_oracle(self, wdf):
        got = wdf.skew().collect()[0]["x"]
        assert got == pytest.approx(_skew(XS, WS), rel=1e-12)

    def test_kurt_matches_oracle(self, wdf):
        got = wdf.kurt().collect()[0]["x"]
        assert got == pytest.approx(_kurt(XS, WS), rel=1e-12)

    def test_weight_replication_equivalence(self, spark):
        # integer weights == replicating rows (frequency-weights meaning)
        flat = [x for x, w in zip(XS, WS) for _ in range(int(w))]
        wdf1 = wt(
            spark.createDataFrame([(x, 1.0) for x in flat], "x double, w double"),
            "w",
        )
        assert wdf1.skew().collect()[0]["x"] == pytest.approx(
            _skew(XS, WS), rel=1e-12
        )

    def test_symmetric_zero_skew(self, spark):
        rows = [(-2.0, 1.0), (-1.0, 2.0), (0.0, 3.0), (1.0, 2.0), (2.0, 1.0)]
        wdf = wt(spark.createDataFrame(rows, "x double, w double"), "w")
        assert wdf.skew().collect()[0]["x"] == pytest.approx(0.0, abs=1e-12)

    def test_degenerate_null(self, spark):
        wdf = wt(
            spark.createDataFrame([(5.0, 2.0), (5.0, 3.0)], "x double, w double"),
            "w",
        )
        assert wdf.skew().collect()[0]["x"] is None  # m2 == 0
        assert wdf.kurt().collect()[0]["x"] is None

    def test_null_data_skipped(self, spark):
        rows = [(1.0, 1.0), (None, 9.0), (2.0, 1.0), (7.0, 2.0)]
        wdf = wt(spark.createDataFrame(rows, "x double, w double"), "w")
        xs = [r[0] for r in rows]
        ws = [r[1] for r in rows]
        assert wdf.skew().collect()[0]["x"] == pytest.approx(
            _skew(xs, ws), rel=1e-12
        )


class TestGrouped:
    def test_per_group_values(self, spark):
        rows = [("a", x, w) for x, w in zip(XS, WS)] + [
            ("b", 1.0, 1.0), ("b", 5.0, 2.0), ("b", 9.0, 1.0), ("b", 2.0, 1.0)
        ]
        wdf = wt(
            spark.createDataFrame(rows, "g string, x double, w double"), "w"
        )
        got = {r["g"]: r["x"] for r in wdf.groupby("g").skew().collect()}
        assert got["a"] == pytest.approx(_skew(XS, WS), rel=1e-12)
        bx = [1.0, 5.0, 9.0, 2.0]
        bw = [1.0, 2.0, 1.0, 1.0]
        assert got["b"] == pytest.approx(_skew(bx, bw), rel=1e-12)

    def test_agg_all_fusion(self, spark):
        rows = [("a", x, w) for x, w in zip(XS, WS)]
        wdf = wt(
            spark.createDataFrame(rows, "g string, x double, w double"), "w"
        )
        out = wdf.groupby("g").agg_all(["mean", "var", "skew", "kurt"])
        r = out.collect()[0]
        assert r["x_skew"] == pytest.approx(_skew(XS, WS), rel=1e-12)
        assert r["x_kurt"] == pytest.approx(_kurt(XS, WS), rel=1e-12)


class TestSem:
    def test_sem_vs_pandas_unit_weights(self, spark):
        import numpy as np
        import pandas as pd

        from pandas_weights_spark import wt

        rng = np.random.default_rng(3)
        pdf = pd.DataFrame(
            {
                "g": rng.integers(0, 3, 200),
                "x": rng.normal(size=200),
                "w": np.ones(200),
            }
        )
        pdf.loc[rng.random(200) < 0.1, "x"] = np.nan
        out = {
            r["g"]: r["x_sem"]
            for r in wt(spark.createDataFrame(pdf), "w")
            .groupby("g")[["x"]]
            .agg_all(["sem"])
            .collect()
        }
        exp = pdf.groupby("g")["x"].sem()
        for g, v in exp.items():
            assert out[g] == pytest.approx(v, rel=1e-9)

    def test_sem_weighted_identity(self, spark):
        # sem == std / sqrt(count) by definition, same one-pass agg
        import pandas as pd

        from pandas_weights_spark import wt

        pdf = pd.DataFrame(
            {"x": [1.0, 2.0, 5.0, 9.0], "w": [1.0, 2.0, 1.0, 3.0]}
        )
        import math

        from pyspark.sql import functions as F

        from pandas_weights_spark import _stats
        from pandas_weights_spark.frame import wt as _wt

        wdf = _wt(spark.createDataFrame(pdf), "w")
        x = wdf._value("x")
        w = wdf.weights
        row = wdf.df.agg(
            _stats.w_count(x, w).alias("x_count"),
            _stats.w_std(x, w).alias("x_std"),
            _stats.w_sem(x, w).alias("x_sem"),
        ).collect()[0]
        assert row["x_sem"] == pytest.approx(
            row["x_std"] / math.sqrt(row["x_count"]), rel=1e-12
        )

    def test_sem_frame_and_groupby_methods(self, spark):
        # the public .sem() surface (frame 1-row agg + per-group)
        # matches pandas under unit weights
        import numpy as np
        import pandas as pd

        from pandas_weights_spark import wt

        rng = np.random.default_rng(7)
        pdf = pd.DataFrame(
            {
                "g": rng.integers(0, 3, 120),
                "x": rng.normal(size=120),
                "w": np.ones(120),
            }
        )
        wdf = wt(spark.createDataFrame(pdf), "w")
        whole = wdf.sem(subset=["x"]).collect()[0]["x"]
        assert whole == pytest.approx(pdf["x"].sem(), rel=1e-9)
        per_g = {
            r["g"]: r["x"] for r in wdf.groupby("g")[["x"]].sem().collect()
        }
        for g, v in pdf.groupby("g")["x"].sem().items():
            assert per_g[g] == pytest.approx(v, rel=1e-9)
