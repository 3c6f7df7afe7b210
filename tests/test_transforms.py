"""Grouped ordered transforms (transforms.py) vs pandas + plan pins."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import wt


def _pdf(seed=19, n=240, nan_frac=0.2):
    rng = np.random.default_rng(seed)
    x = rng.normal(50, 10, n)
    x[rng.random(n) < nan_frac] = np.nan
    return pd.DataFrame(
        {
            "g": rng.integers(0, 3, n),
            "i": np.arange(n),
            "x": x,
            "w": rng.integers(1, 5, n).astype(float),
        }
    )


def _got(spark, pdf, method, **kw):
    t = wt(spark.createDataFrame(pdf), "w").ordered(
        order_by=["i"], partition_by=["g"]
    )
    out = getattr(t, method)(**kw).toPandas()
    return (
        out.sort_values(["g", "i"]).reset_index(drop=True)["x"].to_numpy()
    )


def _exp(pdf, fn):
    parts = []
    for g, grp in pdf.sort_values("i").groupby("g"):
        parts.append(pd.DataFrame({"g": g, "i": grp["i"], "x": fn(grp["x"])}))
    return (
        pd.concat(parts)
        .sort_values(["g", "i"])
        .reset_index(drop=True)["x"]
        .to_numpy()
    )


class TestVsPandas:
    @pytest.mark.parametrize(
        "method,kw,fn",
        [
            ("shift", {"periods": 1}, lambda s: s.shift(1)),
            ("shift", {"periods": -2}, lambda s: s.shift(-2)),
            ("diff", {"periods": 1}, lambda s: s.diff(1)),
            ("ffill", {}, lambda s: s.ffill()),
            ("bfill", {}, lambda s: s.bfill()),
            ("interpolate", {}, lambda s: s.interpolate("linear")),
        ],
    )
    def test_unit_parity(self, spark, method, kw, fn):
        pdf = _pdf()
        np.testing.assert_allclose(
            _got(spark, pdf, method, **kw), _exp(pdf, fn),
            rtol=1e-12, equal_nan=True,
        )

    def test_pct_change(self, spark):
        pdf = _pdf(seed=23)
        got = _got(spark, pdf, "pct_change")
        exp = _exp(pdf, lambda s: s.pct_change(fill_method=None))
        np.testing.assert_allclose(got, exp, rtol=1e-12, equal_nan=True)

    def test_shift_fill_value(self, spark):
        pdf = _pdf(seed=29, nan_frac=0.0)
        got = _got(spark, pdf, "shift", periods=1, fill_value=-1.0)
        exp = _exp(pdf, lambda s: s.shift(1, fill_value=-1.0))
        np.testing.assert_allclose(got, exp, rtol=1e-12)


class TestWeightedCumulative:
    def test_cumsum_is_mass_prefix(self, spark):
        # running Σ w·x skipping NULL rows, NULL echoed at NULL rows
        df = spark.createDataFrame(
            [("a", 0, 2.0, 1.0), ("a", 1, None, 5.0), ("a", 2, 3.0, 2.0),
             ("b", 0, 4.0, 0.5)],
            "g string, i int, x double, w double",
        )
        out = {
            (r["g"], r["i"]): r["x"]
            for r in wt(df, "w")
            .ordered(order_by=["i"], partition_by=["g"]).cumsum()
            .collect()
        }
        assert out[("a", 0)] == 2.0
        assert out[("a", 1)] is None
        assert out[("a", 2)] == 2.0 + 6.0
        assert out[("b", 0)] == 2.0

    def test_cummax_ignores_zero_weight(self, spark):
        df = spark.createDataFrame(
            [("a", 0, 5.0, 1.0), ("a", 1, 9.0, 0.0), ("a", 2, 6.0, 1.0)],
            "g string, i int, x double, w double",
        )
        out = [
            r["x"]
            for r in wt(df, "w")
            .ordered(order_by=["i"], partition_by=["g"]).cummax()
            .orderBy("i").collect()
        ]
        # the w=0 row's 9.0 carries no mass: max stays 5 then 6
        assert out == [5.0, 5.0, 6.0]


class TestPlanAndGuards:
    def test_assemble_single_exchange(self, spark):
        import pandas_weights_spark.plans as P

        df = spark.createDataFrame(
            [(1, i, float(i), 1.0) for i in range(50)],
            "g int, i int, x double, w double",
        )
        t = wt(df, "w").ordered(order_by=["i"], partition_by=["g"])
        out = t.assemble(
            lag=t.col("x", "shift"),
            d=t.col("x", "diff"),
            pc=t.col("x", "pct_change"),
            ff=t.col("x", "ffill"),
            bf=t.col("x", "bfill"),
            cs=t.col("x", "cumsum"),
        )
        # forward + backward + running frames all share one hash
        # partitioning: ONE exchange for six transforms (bfill adds a
        # reverse SortExec, never a second shuffle)
        assert P.count_exchanges(out) == 1, P.physical_plan(out)
        assert not P.has_python_eval(out)
        # and no O(rows²) unbounded-following frame anywhere: bfill must
        # ride the reversed incremental prefix frame
        plan = P.physical_plan(out)
        assert "unboundedfollowing" not in plan.lower().replace(" ", ""), plan

    def test_keyless_warns(self, spark):
        df = spark.createDataFrame([(0, 1.0, 1.0)], "i int, x double, w double")
        with pytest.warns(UserWarning, match="single partition"):
            wt(df, "w").ordered(order_by=["i"])

    def test_unknown_kind_raises(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 1.0, 1.0)], "g int, i int, x double, w double"
        )
        t = wt(df, "w").ordered(order_by=["i"], partition_by=["g"])
        with pytest.raises(ValueError, match="unknown transform"):
            t.col("x", "nope")


class TestRankTransforms:
    """rank_col family (transforms.py) vs pandas groupby rank/cumcount."""

    @staticmethod
    def _df(spark):
        rows = [
            ("a", 1, 10.0, 2.0), ("a", 2, 10.0, 1.0), ("a", 3, 30.0, 3.0),
            ("b", 4, 5.0, 1.0), ("b", 5, 7.0, 0.0), ("b", 6, 7.0, 4.0),
        ]
        return spark.createDataFrame(rows, "g string, id long, v double, w double")

    def test_rank_family_with_ties(self, spark):
        from pandas_weights_spark import wt

        df = self._df(spark)
        t = wt(df, "w").ordered(order_by=["v"], partition_by=["g"])
        tot = wt(df, "w").ordered(order_by=["v", "id"], partition_by=["g"])
        out = {
            r["id"]: r
            for r in tot.assemble(
                id=F.col("id"),
                rk=t.rank_col("rank"),
                dr=t.rank_col("dense_rank"),
                pr=t.rank_col("percent_rank"),
                rn=tot.rank_col("row_number"),
                cc=tot.rank_col("cumcount"),
                cm=tot.rank_col("cummass"),
            ).collect()
        }
        import pandas as pd

        pdf = pd.DataFrame(
            [(g, i, v, w) for g, i, v, w in self._df(spark).collect()],
            columns=["g", "id", "v", "w"],
        )
        rk = pdf.groupby("g")["v"].rank("min")
        dr = pdf.groupby("g")["v"].rank("dense")
        for row, exp_rk, exp_dr in zip(pdf.itertuples(), rk, dr):
            assert out[row.id]["rk"] == exp_rk, row
            assert out[row.id]["dr"] == exp_dr, row
        # percent_rank: (rank-1)/(n-1) with min-ties — spot check group b
        assert out[5]["pr"] == pytest.approx(0.5)
        assert out[6]["pr"] == pytest.approx(0.5)
        # row_number / cumcount along the total order
        assert [out[i]["rn"] for i in (1, 2, 3)] == [1, 2, 3]
        assert [out[i]["cc"] for i in (4, 5, 6)] == [0, 1, 2]
        # cummass: running positive weight mass (w=0 contributes 0)
        assert [out[i]["cm"] for i in (4, 5, 6)] == [1.0, 1.0, 5.0]

    def test_shared_windowexec_with_value_transforms(self, spark):
        from pandas_weights_spark import wt

        df = self._df(spark)
        t = wt(df, "w").ordered(order_by=["v", "id"], partition_by=["g"])
        out = t.assemble(
            lag=t.col("v", "shift"),
            rk=t.rank_col("rank"),
            cm=t.rank_col("cummass"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan

    def test_bad_kind(self, spark):
        from pandas_weights_spark import wt

        t = wt(self._df(spark), "w").ordered(order_by=["v"], partition_by=["g"])
        with pytest.raises(ValueError, match="unknown rank kind"):
            t.rank_col("median")
