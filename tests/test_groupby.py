"""Golden-value ports of the reference grouped tests (FIXTURES.md §A2;
reference /root/reference/tests/test_frame.py:165-244)."""

import pytest

from pandas_weights_spark import wt
from tests.conftest import approx


@pytest.fixture(scope="module")
def grouped(spark):
    return spark.createDataFrame(
        [("A", 10.0, 1.0), ("A", 20.0, 2.0), ("B", 30.0, 1.5), ("B", 40.0, 2.5)],
        "Group string, Value double, weights double",
    )


@pytest.fixture(scope="module")
def grouped_nan(spark):
    # Value NaN variant: 10, 20, NULL, 40 (tests/test_frame.py:210-226)
    return spark.createDataFrame(
        [("A", 10.0, 1.0), ("A", 20.0, 2.0), ("B", None, 1.5), ("B", 40.0, 2.5)],
        "Group string, Value double, weights double",
    )


def by_group(df):
    return {r["Group"]: r.asDict() for r in df.collect()}


class TestGroupedAggregates:
    def test_sum(self, grouped):
        g = by_group(wt(grouped, "weights").groupby("Group").sum())
        assert g["A"]["Value"] == approx(50.0)
        assert g["B"]["Value"] == approx(145.0)

    def test_mean(self, grouped):
        g = by_group(wt(grouped, "weights").groupby("Group").mean())
        assert g["A"]["Value"] == approx(16.666666666666668)
        assert g["B"]["Value"] == approx(36.25)

    def test_var(self, grouped):
        g = by_group(wt(grouped, "weights").groupby("Group").var())
        assert g["A"]["Value"] == approx(33.333333333333314, rel=1e-9)
        assert g["B"]["Value"] == approx(31.25)

    def test_std(self, grouped):
        g = by_group(wt(grouped, "weights").groupby("Group").std())
        assert g["A"]["Value"] == approx(5.773502691896255, rel=1e-9)
        assert g["B"]["Value"] == approx(5.5901699437494745)

    def test_count_skipna(self, grouped_nan):
        g = by_group(wt(grouped_nan, "weights").groupby("Group").count())
        assert g["A"]["Value"] == approx(3.0)
        assert g["B"]["Value"] == approx(2.5)

    def test_count_no_skipna(self, grouped_nan):
        g = by_group(
            wt(grouped_nan, "weights").groupby("Group").count(skipna=False)
        )
        assert g["A"]["Value"] == approx(3.0)
        assert g["B"]["Value"] == approx(4.0)

    def test_mean_nan_skipna(self, grouped_nan):
        g = by_group(wt(grouped_nan, "weights").groupby("Group").mean())
        assert g["A"]["Value"] == approx(16.666666666666668)
        assert g["B"]["Value"] == approx(40.0)

    def test_mean_nan_no_skipna(self, grouped_nan):
        g = by_group(
            wt(grouped_nan, "weights").groupby("Group").mean(skipna=False)
        )
        assert g["A"]["Value"] == approx(16.666666666666668)
        assert g["B"]["Value"] == approx(25.0)

    def test_numeric_group_keys(self, spark):
        # numeric-key variant (tests/test_frame.py:13-21)
        df = spark.createDataFrame(
            [(1, 10.0, 1.0), (1, 20.0, 2.0), (2, 30.0, 1.5), (2, 40.0, 2.5)],
            "Group int, Value double, weights double",
        )
        rows = {r["Group"]: r for r in wt(df, "weights").groupby("Group").sum().collect()}
        assert rows[1]["Value"] == approx(50.0)
        assert rows[2]["Value"] == approx(145.0)
        # numeric key is never aggregated (exclusions, frame.py:485-487)
        assert set(rows[1].asDict()) == {"Group", "Value"}

    def test_multi_key(self, spark):
        df = spark.createDataFrame(
            [("A", "x", 10.0, 1.0), ("A", "y", 20.0, 2.0), ("B", "x", 30.0, 1.5)],
            "G1 string, G2 string, Value double, weights double",
        )
        rows = wt(df, "weights").groupby("G1", "G2", sort=True).sum().collect()
        assert [(r["G1"], r["G2"]) for r in rows] == [("A", "x"), ("A", "y"), ("B", "x")]

    def test_dropna_key(self, spark):
        df = spark.createDataFrame(
            [("A", 10.0, 1.0), (None, 20.0, 2.0), ("B", 30.0, 1.5)],
            "Group string, Value double, weights double",
        )
        assert wt(df, "weights").groupby("Group").sum().count() == 2
        assert wt(df, "weights").groupby("Group", dropna=False).sum().count() == 3

    def test_getitem_narrows(self, spark):
        df = spark.createDataFrame(
            [("A", 10.0, 5.0, 1.0), ("B", 20.0, 6.0, 2.0)],
            "Group string, V1 double, V2 double, weights double",
        )
        out = wt(df, "weights").groupby("Group")[["V1"]].sum()
        assert out.columns == ["Group", "V1"]

    def test_agg_all_single_pass(self, grouped):
        g = by_group(
            wt(grouped, "weights").groupby("Group").agg_all(["mean", "var"])
        )
        assert g["A"]["Value_mean"] == approx(16.666666666666668)
        assert g["A"]["Value_var"] == approx(33.333333333333314, rel=1e-9)

    def test_iteration(self, grouped):
        keys = []
        for key, wdf in wt(grouped, "weights").groupby("Group"):
            keys.append(key)
            if key == "A":
                assert wdf.sum().collect()[0]["Value"] == approx(50.0)
        assert keys == ["A", "B"]

    def test_rollup(self, grouped):
        rows = wt(grouped, "weights").rollup("Group").sum().collect()
        total = {r["Group"]: r["Value"] for r in rows}
        assert total[None] == approx(195.0)  # grand total row
        assert total["A"] == approx(50.0)


class TestSaltedAggAll:
    """agg_all_salted must equal agg_all (two-stage moment merge)."""

    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # one hot key (90% of rows), NULLs sprinkled in data and weights
        rows = []
        for i in range(2000):
            g = "hot" if i % 10 else f"cold{i % 7}"
            v = None if i % 97 == 0 else float(i % 50)
            w = None if i % 101 == 0 else 1.0 + (i % 5)
            rows.append((g, v, w))
        return wt(
            spark.createDataFrame(rows, "g string, x double, w double"), "w"
        )

    @pytest.mark.parametrize("stats", [["count", "sum", "mean", "var", "std"],
                                       ["mean", "skew", "kurt"]])
    def test_matches_agg_all(self, skewed, stats):
        plain = {
            r["g"]: r.asDict()
            for r in skewed.groupby("g").agg_all(stats).collect()
        }
        salted = {
            r["g"]: r.asDict()
            for r in skewed.groupby("g").agg_all_salted(stats, 8).collect()
        }
        assert set(plain) == set(salted)
        for g, row in plain.items():
            for k, v in row.items():
                if k == "g":
                    continue
                if v is None:
                    assert salted[g][k] is None, (g, k)
                else:
                    assert salted[g][k] == pytest.approx(v, rel=1e-9), (g, k)

    def test_two_exchanges(self, skewed):
        from pandas_weights_spark import plans as P

        df = skewed.groupby("g").agg_all_salted(["mean", "var"], 8)
        plan = P.physical_plan(df)
        assert plan.count("Exchange hashpartitioning") == 2, plan

    def test_skipna_false(self, skewed):
        plain = {
            r["g"]: r["x_count"]
            for r in skewed.groupby("g").agg_all(["count"], skipna=False).collect()
        }
        salted = {
            r["g"]: r["x_count"]
            for r in skewed.groupby("g").agg_all_salted(
                ["count"], 4, skipna=False
            ).collect()
        }
        for g in plain:
            assert salted[g] == pytest.approx(plain[g], rel=1e-9)


class TestCubeRollupGuards:
    def test_non_additive_ops_raise(self, spark):
        rows = [("a", "x", 1.0, 1.0), ("b", "y", 2.0, 2.0)]
        wdf = wt(
            spark.createDataFrame(rows, "g string, h string, v double, w double"),
            "w",
        )
        for grouped in (wdf.cube("g", "h"), wdf.rollup("g", "h")):
            for op in ("corr", "cov", "apply", "mode"):
                with pytest.raises(NotImplementedError):
                    if op == "apply":
                        grouped.apply(lambda pdf: pdf, "g string")
                    else:
                        getattr(grouped, op)()


class TestZScore:
    def test_matches_group_stats(self, spark):
        rows = [
            ("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 4.0, 1.0),
            ("b", 10.0, 1.0), ("b", 20.0, 3.0),
        ]
        wdf = wt(
            spark.createDataFrame(rows, "g string, x double, w double"), "w"
        )
        stats = {
            r["g"]: (r["x_mean"], r["x_std"])
            for r in wdf.groupby("g").agg_all(["mean", "std"]).collect()
        }
        out = wdf.groupby("g").zscore().collect()
        for r in out:
            mu, sd = stats[r["g"]]
            assert r["x_z"] == pytest.approx((r["x"] - mu) / sd, rel=1e-12)

    def test_degenerate_group_null(self, spark):
        rows = [("a", 5.0, 1.0), ("a", 5.0, 2.0)]  # zero variance
        wdf = wt(
            spark.createDataFrame(rows, "g string, x double, w double"), "w"
        )
        out = wdf.groupby("g").zscore().collect()
        assert all(r["x_z"] is None for r in out)

    def test_null_value_has_null_z(self, spark):
        rows = [("a", 1.0, 1.0), ("a", None, 2.0), ("a", 3.0, 1.0)]
        wdf = wt(
            spark.createDataFrame(rows, "g string, x double, w double"), "w"
        )
        out = {(r["g"], r["x"]): r["x_z"] for r in wdf.groupby("g").zscore().collect()}
        assert out[("a", None)] is None


class TestDescribe:
    """describe() = the fused moment/extremum agg joined with quantiles;
    integer weights checked against pandas row-repetition semantics."""

    def test_grouped_matches_components(self, grouped):
        g = wt(grouped, "weights").groupby("Group")
        d = by_group(g.describe())
        mean = by_group(g.mean())
        med = by_group(g.quantile(0.5))
        for k in ("A", "B"):
            assert d[k]["Value_mean"] == mean[k]["Value"]
            assert d[k]["Value_p50"] == med[k]["Value_p50"]
        # weighted extremes over mass-carrying rows
        assert d["A"]["Value_min"] == 10.0 and d["A"]["Value_max"] == 20.0
        assert d["A"]["Value_count"] == approx(3.0)

    def test_grouped_binned_mode(self, grouped):
        g = wt(grouped, "weights").groupby("Group")
        d = by_group(g.describe(exact=False, lo=0.0, hi=50.0, bins=5000))
        # bin width 0.01 -> binned median within one bin of exact
        assert abs(d["B"]["Value_p50"] - 40.0) <= 0.011

    def test_global_against_repetition(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(3)
        v = rng.normal(50, 10, 40).round(3)
        w = rng.integers(1, 5, 40)
        pdf = pd.DataFrame({"v": v, "w": w.astype(float)})
        rep = pd.Series(np.repeat(v, w))
        out = (
            wt(spark.createDataFrame(pdf), "w")
            .describe(qs=[0.5])
            .collect()[0]
            .asDict()
        )
        assert out["v_count"] == approx(float(w.sum()))
        assert out["v_mean"] == approx(rep.mean())
        assert out["v_min"] == rep.min() and out["v_max"] == rep.max()
        # inverted-CDF median = smallest value with cum weight >= half
        cum = pdf.sort_values("v").assign(c=lambda d: d.w.cumsum())
        exp_med = cum.loc[cum.c >= w.sum() * 0.5, "v"].iloc[0]
        assert out["v_p50"] == exp_med

    def test_zero_weight_rows_carry_no_mass(self, spark):
        df = spark.createDataFrame(
            [(1.0, 0.0), (2.0, 1.0), (3.0, 2.0)], "v double, w double"
        )
        out = wt(df, "w").describe().collect()[0].asDict()
        assert out["v_min"] == 2.0  # the zero-weight 1.0 is massless
        assert out["v_max"] == 3.0

    def test_min_max_methods(self, grouped):
        g = wt(grouped, "weights").groupby("Group")
        mn = by_group(g.min())
        mx = by_group(g.max())
        assert mn["A"]["Value"] == 10.0 and mx["A"]["Value"] == 20.0
        assert mn["B"]["Value"] == 30.0 and mx["B"]["Value"] == 40.0


class TestDictAgg:
    def test_dict_spec_one_pass(self, spark):
        import pandas_weights_spark.plans as P
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [("a", 1.0, 10.0, 2.0), ("a", 3.0, 30.0, 1.0),
             ("b", 5.0, 50.0, 4.0)],
            "g string, x double, y double, w double",
        )
        out = wt(df, "w").groupby("g").agg({"x": ["mean", "sum"], "y": "max"})
        assert set(out.columns) == {"g", "x_mean", "x_sum", "y_max"}
        # plan check BEFORE collect: the AQE-finalized plan string
        # repeats the exchange under "Initial Plan"
        assert P.count_exchanges(out) == 1
        rows = {r["g"]: r for r in out.collect()}
        assert rows["a"]["x_mean"] == pytest.approx((2.0 + 3.0) / 3.0)
        assert rows["a"]["x_sum"] == pytest.approx(5.0)
        assert rows["a"]["y_max"] == 30.0

    def test_list_spec_is_agg_all(self, spark):
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [("a", 1.0, 1.0)], "g string, x double, w double"
        )
        a = wt(df, "w").groupby("g").agg(["count", "mean"]).collect()
        b = wt(df, "w").groupby("g").agg_all(["count", "mean"]).collect()
        assert a == b

    def test_bad_specs_raise(self, spark):
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [("a", 1.0, 1.0)], "g string, x double, w double"
        )
        g = wt(df, "w").groupby("g")
        with pytest.raises(ValueError, match="non-empty"):
            g.agg({})
        with pytest.raises(KeyError):
            g.agg({"nope": "mean"})
        with pytest.raises(ValueError, match="unknown"):
            g.agg({"x": "frobnicate"})


class TestImpute:
    def test_weighted_mean_fill(self, spark):
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [
                ("a", 1.0, 1.0), ("a", None, 5.0), ("a", 3.0, 3.0),
                ("b", 10.0, 2.0), ("b", None, 1.0),
            ],
            "g string, x double, w double",
        )
        out = {
            (r["g"], r["x"]): r["x_imp"]
            for r in wt(df, "w")[["x"]].groupby("g").impute().collect()
        }
        # group a: weighted mean of non-null = (1*1 + 3*3) / 4 = 2.5
        assert out[("a", None)] == 2.5
        assert out[("a", 1.0)] == 1.0  # non-null untouched
        assert out[("b", None)] == 10.0

    def test_all_null_group_stays_null(self, spark):
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [("a", None, 1.0), ("a", None, 2.0), ("b", 5.0, 1.0)],
            "g string, x double, w double",
        )
        rows = wt(df, "w")[["x"]].groupby("g").impute().collect()
        a_rows = [r for r in rows if r["g"] == "a"]
        assert all(r["x_imp"] is None for r in a_rows)

    def test_zero_strategy_no_shuffle(self, spark):
        from pandas_weights_spark import plans as P
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [("a", None, 1.0), ("b", 5.0, 1.0)],
            "g string, x double, w double",
        )
        out = wt(df, "w")[["x"]].groupby("g").impute(strategy="zero")
        assert P.count_exchanges(out) == 0
        got = {r["g"]: r["x_imp"] for r in out.collect()}
        assert got == {"a": 0.0, "b": 5.0}

    def test_matches_pandas_transform(self, spark):
        import numpy as np
        import pandas as pd

        from pandas_weights_spark import wt

        rng = np.random.default_rng(31)
        x = rng.normal(size=120)
        x[::7] = np.nan
        pdf = pd.DataFrame(
            {
                "g": rng.integers(0, 3, 120),
                "x": x,
                "w": np.ones(120),
            }
        )
        got = (
            wt(spark.createDataFrame(pdf), "w")[["x"]]
            .groupby("g")
            .impute()
            .toPandas()
            .sort_values(["g", "x"], na_position="first")["x_imp"]
            .to_numpy()
        )
        exp = (
            pdf.assign(
                x_imp=pdf.groupby("g")["x"].transform(
                    lambda s: s.fillna(s.mean())
                )
            )
            .sort_values(["g", "x"], na_position="first")["x_imp"]
            .to_numpy()
        )
        np.testing.assert_allclose(np.sort(got), np.sort(exp), rtol=1e-9)

    def test_rejected_for_cube(self, spark):
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [("a", 1.0, 1.0)], "g string, x double, w double"
        )
        with pytest.raises(NotImplementedError):
            wt(df, "w")[["x"]].cube("g").impute()


class TestImputeMedian:
    def test_median_fill(self, spark):
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [
                ("a", 1.0, 1.0), ("a", 100.0, 1.0), ("a", 3.0, 1.0),
                ("a", None, 1.0),
                ("b", 7.0, 1.0), ("b", None, 1.0),
            ],
            "g string, x double, w double",
        )
        out = {
            (r["g"], r["x"]): r["x_imp"]
            for r in wt(df, "w")[["x"]]
            .groupby("g")
            .impute(strategy="median")
            .collect()
        }
        # weighted median of {1, 3, 100} at unit mass = 3 (robust: the
        # mean would be 34.7)
        assert out[("a", None)] == 3.0
        assert out[("b", None)] == 7.0
        assert out[("a", 100.0)] == 100.0  # non-null untouched

    def test_median_binned_path(self, spark):
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [("a", float(v), 1.0) for v in range(1, 102)]
            + [("a", None, 1.0)],
            "g string, x double, w double",
        )
        out = {
            r["x"]: r["x_imp"]
            for r in wt(df, "w")[["x"]]
            .groupby("g")
            .impute(strategy="median", exact=False, lo=0.0, hi=102.0,
                    bins=2048)
            .collect()
        }
        assert out[None] == pytest.approx(51.0, abs=0.1)


class TestGroupedValueCounts:
    @pytest.fixture(scope="class")
    def vc_df(self, spark):
        rows = [
            ("a", 1.0, 3.0), ("a", 1.0, 2.0), ("a", 2.0, 1.0),
            ("a", 3.0, 4.0),
            ("b", 9.0, 1.0), ("b", 9.0, 1.0), ("b", 8.0, 5.0),
        ]
        return spark.createDataFrame(rows, "g string, v double, w double")

    def test_masses_and_normalize(self, vc_df):
        from pandas_weights_spark import wt

        out = {
            (r["g"], r["v"]): (r["count"], r["share"])
            for r in wt(vc_df, "w")[["v"]]
            .groupby("g")
            .value_counts(normalize=True)
            .collect()
        }
        assert out[("a", 1.0)][0] == 5.0
        assert out[("a", 3.0)][0] == 4.0
        assert out[("b", 8.0)][0] == 5.0
        assert out[("a", 1.0)][1] == pytest.approx(5.0 / 10.0)
        assert sum(s for (g, _), (_, s) in out.items() if g == "a") == (
            pytest.approx(1.0)
        )

    def test_topk_per_group(self, vc_df):
        from pandas_weights_spark import wt

        out = wt(vc_df, "w")[["v"]].groupby("g").value_counts(k=1).collect()
        got = {r["g"]: r["v"] for r in out}
        assert got == {"a": 1.0, "b": 8.0}
        assert len(out) == 2

    def test_reserved_output_names_raise(self, vc_df, spark):
        # ADVICE r5: a value/key column literally named 'count' (or
        # 'share' under normalize) would collide with the output
        from pandas_weights_spark import wt
        from pyspark.sql import functions as F

        clash = vc_df.select(
            "g", F.col("v").alias("count"), "w"
        )
        with pytest.raises(ValueError, match="reserves"):
            wt(clash, "w")[["count"]].groupby("g").value_counts()
        share = vc_df.select(
            F.col("g").alias("share"), "v", "w"
        )
        with pytest.raises(ValueError, match="reserves"):
            wt(share, "w")[["v"]].groupby("share").value_counts(
                normalize=True
            )
        # without normalize, 'share' is NOT reserved
        assert wt(share, "w")[["v"]].groupby("share").value_counts(
        ).count() > 0

    def test_matches_pandas_on_unit_weights(self, spark):
        import numpy as np
        import pandas as pd

        from pandas_weights_spark import wt

        rng = np.random.default_rng(12)
        pdf = pd.DataFrame(
            {
                "g": rng.integers(0, 3, 200),
                "v": rng.integers(0, 6, 200).astype(float),
                "w": np.ones(200),
            }
        )
        got = {
            (r["g"], r["v"]): r["count"]
            for r in wt(spark.createDataFrame(pdf), "w")[["v"]]
            .groupby("g")
            .value_counts()
            .collect()
        }
        exp = pdf.groupby("g")["v"].value_counts()
        for (g, v), n in exp.items():
            assert got[(g, v)] == float(n)

    def test_needs_single_column(self, vc_df):
        from pandas_weights_spark import wt
        from pyspark.sql import functions as FF

        two = vc_df.withColumn("v2", FF.col("v") * 2)
        with pytest.raises(ValueError, match="exactly one"):
            wt(two, "w").groupby("g").value_counts()
