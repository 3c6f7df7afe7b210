"""Golden-value ports of the reference frame tests (FIXTURES.md §A1;
reference /root/reference/tests/test_frame.py:8-111). All expected values
are the reference's hand-computed goldens, asserted at rel tol 1e-12
(bit-exactness with pandas is a non-goal — SURVEY.md §7.6)."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import wt
from tests.conftest import approx


@pytest.fixture(scope="module")
def basic(spark):
    return spark.createDataFrame(
        [(1.0, 4.0, 0.5), (2.0, 5.0, 1.5), (3.0, 6.0, 2.0)],
        "A double, B double, weights double",
    )


@pytest.fixture(scope="module")
def basic_nan(spark):
    # NaN variant: A = 1, 2, NULL; B = 4, NULL, 6 (tests/test_frame.py:56-69)
    return spark.createDataFrame(
        [(1.0, 4.0, 0.5), (2.0, None, 1.5), (None, 6.0, 2.0)],
        "A double, B double, weights double",
    )


def row(df):
    return df.collect()[0].asDict()


class TestBind:
    def test_weight_column_dropped_from_data(self, basic):
        wdf = wt(basic, "weights")
        assert wdf.columns == ["A", "B"]
        assert wdf.numeric_columns() == ["A", "B"]

    def test_column_expression_weights(self, basic):
        wdf = wt(basic, F.col("weights") * 2)
        r = row(wdf.sum(subset=["A"]))
        assert r["A"] == approx(19.0)

    def test_missing_weight_column_raises(self, basic):
        with pytest.raises(KeyError):
            wt(basic, "nope")

    def test_array_binding_rejected(self, basic):
        with pytest.raises(TypeError):
            wt(basic, [0.5, 1.5, 2.0])

    def test_na_weight_fill(self, spark):
        # weights 0.5, NULL, 2.0 with na_weight=1.0 (tests/test_frame.py:34-40)
        df = spark.createDataFrame(
            [(1.0, 0.5), (2.0, None), (3.0, 2.0)], "A double, weights double"
        )
        r = row(wt(df, "weights", na_weight=1.0).sum())
        assert r["A"] == approx(0.5 + 2.0 + 6.0)

    def test_getitem_single_and_list(self, basic):
        wdf = wt(basic, "weights")
        assert wdf["A"].name == "A"
        assert wdf[["A"]].columns == ["A"]


class TestAggregates:
    def test_sum(self, basic):
        r = row(wt(basic, "weights").sum())
        assert r["A"] == approx(9.5)
        assert r["B"] == approx(21.5)

    def test_mean(self, basic):
        r = row(wt(basic, "weights").mean())
        assert r["A"] == approx(2.375)
        assert r["B"] == approx(5.375)

    def test_var(self, basic):
        r = row(wt(basic, "weights").var())
        assert r["A"] == approx(0.6458333333333334)

    def test_std(self, basic):
        r = row(wt(basic, "weights").std())
        assert r["A"] == approx(0.8036375634160796)

    def test_count_skipna(self, basic_nan):
        r = row(wt(basic_nan, "weights").count())
        assert r["A"] == approx(2.0)  # 0.5 + 1.5
        assert r["B"] == approx(2.5)  # 0.5 + 2.0

    def test_count_no_skipna(self, basic_nan):
        r = row(wt(basic_nan, "weights").count(skipna=False))
        assert r["A"] == approx(4.0)
        assert r["B"] == approx(4.0)

    def test_count_null_weight_contributes_zero(self, spark):
        df = spark.createDataFrame(
            [(1.0, 0.5), (2.0, None), (3.0, 2.0)], "A double, weights double"
        )
        r = row(wt(df, "weights").count())
        assert r["A"] == approx(2.5)

    def test_sum_min_count_all_null_gives_null(self, spark):
        # tests/test_frame.py:80-87: all-NA column with min_count=1 → NA not 0
        df = spark.createDataFrame(
            [(1.0, None, 0.5), (2.0, None, 1.5)],
            "A double, B double, weights double",
        )
        r0 = row(wt(df, "weights").sum())
        assert r0["B"] == approx(0.0)
        r1 = row(wt(df, "weights").sum(min_count=1))
        assert r1["B"] is None
        assert r1["A"] == approx(3.5)

    def test_mean_all_null_gives_null(self, spark):
        df = spark.createDataFrame(
            [(None, 0.5), (None, 1.5)], "A double, weights double"
        )
        assert row(wt(df, "weights").mean())["A"] is None

    def test_nan_treated_as_null(self, spark):
        # F.sum skips NULL, not NaN — nan_as_null normalizes (SURVEY §7.4)
        df = spark.createDataFrame(
            [(1.0, 0.5), (float("nan"), 1.5), (3.0, 2.0)],
            "A double, weights double",
        )
        r = row(wt(df, "weights").count())
        assert r["A"] == approx(2.5)
        r = row(wt(df, "weights").sum())
        assert r["A"] == approx(6.5)

    def test_non_numeric_pruned(self, spark):
        df = spark.createDataFrame(
            [(1.0, "x", 0.5), (2.0, "y", 1.5)], "A double, L string, weights double"
        )
        wdf = wt(df, "weights")
        assert wdf.numeric_columns() == ["A"]
        assert set(row(wdf.sum()).keys()) == {"A"}

    def test_bool_cast_to_numeric(self, spark):
        df = spark.createDataFrame(
            [(True, 0.5), (False, 1.5), (True, 2.0)], "A boolean, weights double"
        )
        r = row(wt(df, "weights").sum())
        assert r["A"] == approx(2.5)

    def test_weighted_view(self, basic):
        vals = [r["A"] for r in wt(basic, "weights").weighted().collect()]
        assert sorted(vals) == [approx(0.5), approx(3.0), approx(6.0)]


class TestInstallAccessor:
    def test_df_wt_call_parity(self, spark):
        import pandas_weights_spark as pws

        pws.install_accessor()
        df = spark.createDataFrame(
            [(1.0, 2.0), (3.0, 4.0)], "x double, w double"
        )
        got = df.wt("w").mean().collect()[0]["x"]
        want = pws.wt(df, "w").mean().collect()[0]["x"]
        assert got == want


def test_frame_min_max(spark):
    from pandas_weights_spark import wt

    df = spark.createDataFrame(
        [(1.0, 0.0), (2.0, 1.0), (3.0, 2.0)], "v double, w double"
    )
    assert wt(df, "w").min().collect()[0]["v"] == 2.0  # massless row excluded
    assert wt(df, "w").max().collect()[0]["v"] == 3.0
