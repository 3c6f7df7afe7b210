"""Golden-value ports of the reference apply tests (FIXTURES.md §A7;
reference /root/reference/tests/test_frame.py:247-278,
tests/test_series.py:279-307)."""

import pytest

from pandas_weights_spark import wt
from tests.conftest import approx


@pytest.fixture(scope="module")
def grouped(spark):
    return spark.createDataFrame(
        [("A", 10.0, 1.0), ("A", 20.0, 2.0), ("B", 30.0, 1.5), ("B", 40.0, 2.5)],
        "Group string, Value double, weights double",
    )


class TestFrameApply:
    def test_column_reduction(self, grouped):
        # max - min over the weighted Value column → 100 - 10 = 90
        out = wt(grouped, "weights")[["Value"]].apply(
            lambda col: col.max() - col.min(), "Value double"
        )
        assert out.collect()[0]["Value"] == approx(90.0)


class TestSeriesApply:
    def test_elementwise(self, grouped):
        # x + 2 on weighted values → 12, 42, 47, 102
        out = wt(grouped, "weights")["Value"].apply(lambda x: x + 2, "Value double")
        vals = sorted(r["Value"] for r in out.collect())
        assert vals == [approx(12.0), approx(42.0), approx(47.0), approx(102.0)]


class TestGroupedApply:
    def test_group_min_max(self, grouped):
        import pandas as pd

        def min_max(pdf: "pd.DataFrame") -> "pd.Series":
            return pd.Series(
                {"mn": pdf["Value"].min(), "mx": pdf["Value"].max()}
            )

        out = (
            wt(grouped, "weights")
            .groupby("Group", sort=True)
            .apply(min_max, "Group string, mn double, mx double")
        )
        rows = {r["Group"]: r for r in out.collect()}
        assert rows["A"]["mn"] == approx(10.0)
        assert rows["A"]["mx"] == approx(40.0)
        assert rows["B"]["mn"] == approx(45.0)
        assert rows["B"]["mx"] == approx(100.0)

    def test_group_frame_result(self, grouped):
        def top_row(pdf):
            return pdf.nlargest(1, "Value")[["Value"]]

        out = (
            wt(grouped, "weights")
            .groupby("Group")
            .apply(top_row, "Group string, Value double")
        )
        rows = {r["Group"]: r["Value"] for r in out.collect()}
        assert rows["A"] == approx(40.0)
        assert rows["B"] == approx(100.0)
