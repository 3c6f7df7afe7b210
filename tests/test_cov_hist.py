"""Weighted covariance matrices, value_counts, and histogram
(extensions beyond the reference — corr.py / frame.py)."""

import math

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import wt
from pandas_weights_spark.frame import WeightedSeries


def _wcov(xs, ys, ws, ddof=1):
    """Driver-side oracle: frequency-weights covariance, pairwise-complete."""
    rows = [
        (x, y, w)
        for x, y, w in zip(xs, ys, ws)
        if x is not None and y is not None and w is not None
    ]
    W = sum(w for _, _, w in rows)
    if W <= ddof:
        return None
    mx = sum(w * x for x, _, w in rows) / W
    my = sum(w * y for _, y, w in rows) / W
    return sum(w * (x - mx) * (y - my) for x, y, w in rows) / (W - ddof)


class TestCov:
    @pytest.fixture(scope="class")
    def data(self):
        return {
            "a": [1.0, 2.0, 3.0, 4.0, 5.0],
            "b": [2.0, 1.0, 4.0, 3.0, 6.0],
            "w": [1.0, 2.0, 1.0, 3.0, 1.0],
        }

    @pytest.fixture(scope="class")
    def wdf(self, spark, data):
        rows = list(zip(data["a"], data["b"], data["w"]))
        return wt(spark.createDataFrame(rows, "a double, b double, w double"), "w")

    def test_matrix_values(self, wdf, data):
        got = {
            (r["col_x"], r["col_y"]): r["cov"] for r in wdf.cov().collect()
        }
        assert len(got) == 4
        for cx in ("a", "b"):
            for cy in ("a", "b"):
                want = _wcov(data[cx], data[cy], data["w"])
                assert got[(cx, cy)] == pytest.approx(want, rel=1e-12)

    def test_diagonal_matches_var(self, wdf):
        var_a = wdf.var(subset=["a"]).collect()[0]["a"]
        cov_aa = {
            (r["col_x"], r["col_y"]): r["cov"] for r in wdf.cov().collect()
        }[("a", "a")]
        assert cov_aa == pytest.approx(var_a, rel=1e-12)

    def test_pairwise_complete_nulls(self, spark):
        rows = [
            (1.0, None, 1.0),
            (2.0, 1.0, 2.0),
            (3.0, 5.0, 1.0),
            (None, 2.0, 1.0),
            (5.0, 4.0, 1.0),
        ]
        wdf = wt(spark.createDataFrame(rows, "a double, b double, w double"), "w")
        got = {
            (r["col_x"], r["col_y"]): r["cov"] for r in wdf.cov().collect()
        }
        a = [r[0] for r in rows]
        b = [r[1] for r in rows]
        w = [r[2] for r in rows]
        assert got[("a", "b")] == pytest.approx(_wcov(a, b, w), rel=1e-12)
        assert got[("a", "a")] == pytest.approx(_wcov(a, a, w), rel=1e-12)

    def test_insufficient_weight_null(self, spark):
        wdf = wt(
            spark.createDataFrame([(1.0, 2.0, 0.5)], "a double, b double, w double"),
            "w",
        )
        got = wdf.cov().collect()
        assert all(r["cov"] is None for r in got)  # W=0.5 <= ddof=1

    def test_grouped_cov(self, spark):
        rows = [
            ("g1", 1.0, 2.0, 1.0),
            ("g1", 2.0, 1.0, 2.0),
            ("g1", 3.0, 4.0, 1.0),
            ("g2", 1.0, 5.0, 1.0),
            ("g2", 4.0, 2.0, 1.0),
            ("g2", 6.0, 1.0, 2.0),
        ]
        wdf = wt(
            spark.createDataFrame(rows, "g string, a double, b double, w double"),
            "w",
        )
        out = wdf.groupby("g").cov()
        got = {
            (r["g"], r["col_x"], r["col_y"]): r["cov"] for r in out.collect()
        }
        for g in ("g1", "g2"):
            sub = [r for r in rows if r[0] == g]
            want = _wcov([r[1] for r in sub], [r[2] for r in sub], [r[3] for r in sub])
            assert got[(g, "a", "b")] == pytest.approx(want, rel=1e-12)


class TestValueCounts:
    def test_weight_mass_per_value(self, spark):
        rows = [("x", 1.0), ("x", 2.0), ("y", 5.0), (None, 3.0), ("z", None)]
        s = WeightedSeries(
            spark.createDataFrame(rows, "v string, w double"), "v", "w"
        )
        got = {r["v"]: r["count"] for r in s.value_counts().collect()}
        assert got == {"x": 3.0, "y": 5.0, "z": 0.0}

    def test_keep_null_values(self, spark):
        rows = [("x", 1.0), (None, 3.0)]
        s = WeightedSeries(
            spark.createDataFrame(rows, "v string, w double"), "v", "w"
        )
        got = {r["v"]: r["count"] for r in s.value_counts(dropna=False).collect()}
        assert got == {"x": 1.0, None: 3.0}

    def test_sort_order(self, spark):
        rows = [("a", 1.0), ("b", 5.0), ("c", 3.0)]
        s = WeightedSeries(
            spark.createDataFrame(rows, "v string, w double"), "v", "w"
        )
        vals = [r["v"] for r in s.value_counts().collect()]
        assert vals == ["b", "c", "a"]


class TestHistogram:
    def test_bucket_masses(self, spark):
        rows = [(0.5, 1.0), (1.5, 2.0), (2.5, 4.0), (9.9, 1.0), (10.0, 7.0),
                (11.0, 1.0), (-0.1, 1.0)]
        s = WeightedSeries(
            spark.createDataFrame(rows, "v double, w double"), "v", "w"
        )
        got = {r["bin"]: (r["bin_lo"], r["count"]) for r in
               s.histogram(0.0, 10.0, 5).collect()}
        # width 2: [0,2) w=3, [2,4) w=4, [8,10] w=8 (hi lands in last bin)
        assert got[0] == (0.0, 3.0)
        assert got[1] == (2.0, 4.0)
        assert got[4] == (8.0, 8.0)
        assert set(got) == {0, 1, 4}  # out-of-range rows dropped

    def test_validation(self, spark):
        s = WeightedSeries(
            spark.createDataFrame([(1.0, 1.0)], "v double, w double"), "v", "w"
        )
        with pytest.raises(ValueError):
            s.histogram(0, 10, 0)
        with pytest.raises(ValueError):
            s.histogram(5, 5, 3)


class TestMode:
    def test_global_mode(self, spark):
        rows = [("x", 1.0), ("x", 2.0), ("y", 5.0), ("z", 2.0)]
        s = WeightedSeries(
            spark.createDataFrame(rows, "v string, w double"), "v", "w"
        )
        r = s.mode().collect()
        assert len(r) == 1
        assert (r[0]["v"], r[0]["count"]) == ("y", 5.0)

    def test_global_mode_tie_smallest(self, spark):
        rows = [(2.0, 3.0), (1.0, 3.0), (5.0, 1.0)]
        s = WeightedSeries(
            spark.createDataFrame(rows, "v double, w double"), "v", "w"
        )
        r = s.mode().collect()[0]
        assert (r["v"], r["count"]) == (1.0, 3.0)

    def test_grouped_mode(self, spark):
        from pandas_weights_spark import wt

        rows = [
            ("a", 1.0, 1.0), ("a", 1.0, 1.0), ("a", 2.0, 5.0),
            ("b", 3.0, 2.0), ("b", 4.0, 1.0), ("b", None, 9.0),
        ]
        wdf = wt(
            spark.createDataFrame(rows, "g string, v double, w double"), "w"
        )
        got = {
            r["g"]: (r["v"], r["count"])
            for r in wdf.groupby("g")[["v"]].mode().collect()
        }
        assert got == {"a": (2.0, 5.0), "b": (3.0, 2.0)}

    def test_grouped_mode_needs_one_column(self, spark):
        from pandas_weights_spark import wt

        rows = [("a", 1.0, 2.0, 1.0)]
        wdf = wt(
            spark.createDataFrame(rows, "g string, v double, u double, w double"),
            "w",
        )
        import pytest as _pytest

        with _pytest.raises(ValueError):
            wdf.groupby("g").mode()
