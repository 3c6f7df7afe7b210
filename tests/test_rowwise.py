"""Row-wise (axis=1) weighted statistics (reference frame.py:189-251:
``weighted()`` scales each row by its weight, then pandas reduces across
the row). Goldens hand-computed from the same fixtures as test_frame.py."""

import math

import pytest

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
    return spark.createDataFrame(
        [(1.0, 4.0, 0.5), (2.0, None, 1.5), (None, 6.0, 2.0)],
        "A double, B double, weights double",
    )


def vals(df, col):
    # deterministic row order via A-or-B sort key
    return [r[col] for r in df.orderBy("B").collect()]


class TestRowStats:
    def test_row_count(self, basic):
        assert vals(wt(basic, "weights").row_count(), "row_count") == [
            approx(1.0),
            approx(3.0),
            approx(4.0),
        ]

    def test_row_sum(self, basic):
        # w * (A + B) per row
        assert vals(wt(basic, "weights").row_sum(), "row_sum") == [
            approx(2.5),
            approx(10.5),
            approx(18.0),
        ]

    def test_row_mean(self, basic):
        # weight cancels when no cell is null: (A + B) / 2
        assert vals(wt(basic, "weights").row_mean(), "row_mean") == [
            approx(2.5),
            approx(3.5),
            approx(4.5),
        ]

    def test_row_var_and_std(self, basic):
        # (w·Σx² − (w·Σx)²/(2w)) / (2w − 1); row 1 has 2w−1 = 0 → NULL
        var = vals(wt(basic, "weights").row_var(), "row_var")
        assert var[0] is None
        assert var[1] == approx((43.5 - 10.5 * 10.5 / 3.0) / 2.0)
        assert var[2] == approx((90.0 - 18.0 * 18.0 / 4.0) / 3.0)
        std = vals(wt(basic, "weights").row_std(), "row_std")
        assert std[0] is None
        assert std[1] == approx(math.sqrt(var[1]))
        assert std[2] == approx(math.sqrt(var[2]))

    def test_row_count_skipna_nan(self, basic_nan):
        # skipna=True: NULL cells drop out of the row count (w · n_valid)
        got = sorted(
            r["row_count"] for r in wt(basic_nan, "weights").row_count().collect()
        )
        assert got == [approx(1.0), approx(1.5), approx(2.0)]

    def test_row_count_no_skipna_nan(self, basic_nan):
        # skipna=False: NULLs count as 1 cell each (w · n_cols)
        got = sorted(
            r["row_count"]
            for r in wt(basic_nan, "weights").row_count(skipna=False).collect()
        )
        assert got == [approx(1.0), approx(3.0), approx(4.0)]

    def test_row_sum_skips_nulls(self, basic_nan):
        got = sorted(
            r["row_sum"] for r in wt(basic_nan, "weights").row_sum().collect()
        )
        assert got == [approx(2.5), approx(3.0), approx(12.0)]

    def test_row_sum_min_count(self, basic_nan):
        # min_count=2: rows with a NULL cell have n_valid=1 → NULL
        got = [
            r["row_sum"]
            for r in wt(basic_nan, "weights")
            .row_sum(min_count=2)
            .orderBy("A")
            .collect()
        ]
        # NULLS FIRST ascending: [A=NULL row, A=1.0 row, A=2.0 row]
        assert got == [None, approx(2.5), None]

    def test_row_mean_nan(self, basic_nan):
        got = sorted(
            r["row_mean"] for r in wt(basic_nan, "weights").row_mean().collect()
        )
        assert got == [approx(2.0), approx(2.5), approx(6.0)]

    def test_null_weight_poisons_row(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0, None)], "A double, B double, weights double"
        )
        wdf = wt(df, "weights")
        assert wdf.row_count().collect()[0]["row_count"] == approx(0.0)
        assert wdf.row_sum().collect()[0]["row_sum"] == approx(0.0)
        assert wdf.row_sum(min_count=1).collect()[0]["row_sum"] is None
        assert wdf.row_mean().collect()[0]["row_mean"] is None

    def test_subset(self, basic):
        got = vals(wt(basic, "weights").row_sum(subset=["A"]), "row_sum")
        assert got == [approx(0.5), approx(3.0), approx(6.0)]

    def test_no_numeric_columns_raises(self, spark):
        df = spark.createDataFrame([("x", 1.0)], "s string, weights double")
        with pytest.raises(ValueError):
            wt(df, "weights").row_sum()
