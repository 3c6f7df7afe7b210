"""Golden-value ports of the reference correlation tests (FIXTURES.md
§A4-A6; reference /root/reference/tests/test_frame.py:365-499 and
tests/test_series.py:103-127, 230-276)."""

import pytest

from pandas_weights_spark import wt
from pandas_weights_spark.corr import aligned_corr
from pandas_weights_spark.frame import WEIGHT_COL
from tests.conftest import approx


@pytest.fixture(scope="module")
def corr_frame(spark):
    return spark.createDataFrame(
        [
            (1.0, 2.0, 4.0, "x", 1.0),
            (2.0, 4.0, 3.0, "y", 2.0),
            (3.0, 6.0, 2.0, "z", 3.0),
            (4.0, 8.0, 1.0, "w", 4.0),
        ],
        "A double, B double, C double, Label string, weights double",
    )


def corr_map(df):
    return {(r["col_x"], r["col_y"]): r["corr"] for r in df.collect()}


class TestFrameCorr:
    def test_perfect_correlations(self, corr_frame):
        m = corr_map(wt(corr_frame, "weights").corr())
        assert m[("A", "B")] == approx(1.0)
        assert m[("A", "C")] == approx(-1.0)
        assert m[("A", "A")] == approx(1.0)
        assert m[("B", "C")] == approx(-1.0)
        # symmetric mirror present
        assert m[("B", "A")] == approx(1.0)

    def test_non_numeric_excluded(self, corr_frame):
        m = corr_map(wt(corr_frame, "weights").corr())
        assert not any("Label" in k for k in m)
        assert len(m) == 9  # 3x3

    def test_min_periods_nullifies(self, spark):
        # B has a NULL → only 3 valid pairs; min_periods=4 → NULL row/col
        df = spark.createDataFrame(
            [
                (1.0, 2.0, 1.0),
                (2.0, 4.0, 1.0),
                (3.0, None, 1.0),
                (4.0, 8.0, 1.0),
            ],
            "A double, B double, weights double",
        )
        m = corr_map(wt(df, "weights").corr(min_periods=4))
        assert m[("A", "B")] is None
        assert m[("B", "B")] is None
        assert m[("A", "A")] == approx(1.0)

    def test_unsupported_method(self, corr_frame):
        # r5: spearman routes to the rank matrix; kendall still raises
        with pytest.raises(NotImplementedError):
            wt(corr_frame, "weights").corr(method="kendall")
        m = corr_map(wt(corr_frame, "weights").corr(method="spearman"))
        assert m[("A", "B")] == approx(1.0)  # monotone pair

    def test_zero_variance_is_null(self, spark):
        df = spark.createDataFrame(
            [(1.0, 5.0, 1.0), (2.0, 5.0, 1.0)], "A double, B double, weights double"
        )
        m = corr_map(wt(df, "weights").corr())
        assert m[("A", "B")] is None  # var(B) == 0 guard (_stats.py:70-71)

    def test_corr_matrix_pandas(self, corr_frame):
        mat = wt(corr_frame, "weights").corr_matrix()
        assert mat.loc["A", "C"] == approx(-1.0)
        assert list(mat.columns) == ["A", "B", "C"]

    def test_corr_pair_bit_identical_to_matrix_cell(self, spark):
        # r7: the single-pair path (7 aggregates, no matrix) must
        # return the EXACT float the matrix's (x, y) cell returns —
        # same moment expressions, same kernel — including under the
        # pairwise-complete NULL mask and NaN weights
        from pandas_weights_spark.corr import corr_pair

        df = spark.createDataFrame(
            [
                (1.0, 2.5, 1.0),
                (2.0, None, 2.0),
                (3.0, 8.5, 1.5),
                (4.0, 3.0, float("nan")),
                (5.0, 1.0, 3.0),
                (None, 9.0, 1.0),
            ],
            "A double, B double, weights double",
        )
        wdf = wt(df, "weights")
        cell = corr_map(wdf.corr(subset=["A", "B"]))[("A", "B")]
        got = corr_pair(wdf, "A", "B").collect()[0]["corr"]
        assert got == cell  # bit-identical, not approx
        # min_periods flows through identically
        gotn = corr_pair(wdf, "A", "B", min_periods=10).collect()[0][
            "corr"
        ]
        assert gotn is None

    def test_fused_corr_cov_matches_separate(self, corr_frame):
        wdf = wt(corr_frame, "weights")
        fused = {
            (r["col_x"], r["col_y"]): (r["corr"], r["cov"])
            for r in wdf.corr_cov().collect()
        }
        corr = corr_map(wdf.corr())
        cov = {
            (r["col_x"], r["col_y"]): r["cov"] for r in wdf.cov().collect()
        }
        assert set(fused) == set(corr) == set(cov)
        for k, (c, v) in fused.items():
            assert c == corr[k] and v == cov[k]  # bit-identical kernels


class TestGroupedCorr:
    def test_per_group_matrices(self, spark):
        # FIXTURES A5: group A → corr(X,Y)=1, corr(X,Z)=−1; B → −1, 1
        df = spark.createDataFrame(
            [
                ("A", 1.0, 2.0, 3.0, 1.0),
                ("A", 2.0, 4.0, 2.0, 2.0),
                ("A", 3.0, 6.0, 1.0, 3.0),
                ("B", 1.0, 3.0, 1.0, 1.5),
                ("B", 2.0, 2.0, 2.0, 2.5),
                ("B", 3.0, 1.0, 3.0, 3.5),
            ],
            "Group string, X double, Y double, Z double, weights double",
        )
        out = wt(df, "weights").groupby("Group").corr()
        m = {(r["Group"], r["col_x"], r["col_y"]): r["corr"] for r in out.collect()}
        assert m[("A", "X", "Y")] == approx(1.0)
        assert m[("A", "X", "Z")] == approx(-1.0)
        assert m[("B", "X", "Y")] == approx(-1.0)
        assert m[("B", "X", "Z")] == approx(1.0)
        assert m[("A", "X", "X")] == approx(1.0)

    def test_min_periods_pairwise_complete(self, spark):
        # Y variant with NULLs: per-pair validity, not per-row deletion
        df = spark.createDataFrame(
            [
                ("A", 1.0, 2.0, 1.0),
                ("A", 2.0, 4.0, 1.0),
                ("A", 3.0, None, 1.0),
                ("B", 1.0, 3.0, 1.0),
                ("B", 2.0, None, 1.0),
                ("B", 3.0, 1.0, 1.0),
            ],
            "Group string, X double, Y double, weights double",
        )
        out = wt(df, "weights").groupby("Group").corr(min_periods=3)
        m = {(r["Group"], r["col_x"], r["col_y"]): r["corr"] for r in out.collect()}
        assert m[("A", "X", "Y")] is None  # only 2 valid pairs
        assert m[("A", "X", "X")] == approx(1.0)  # 3 valid


class TestAlignedCorr:
    def _left(self, spark):
        df = spark.createDataFrame(
            [
                ("A", 1, 1.0, 1.0),
                ("A", 2, 2.0, 2.0),
                ("B", 1, 3.0, 1.5),
                ("B", 2, 4.0, 2.5),
            ],
            "key string, row_id int, vals double, weights double",
        )
        return wt(df, "weights").df  # carries WEIGHT_COL

    def test_duplicate_key_fanout_matches_pandas_cross_pairing(self, spark):
        # FIXTURES A6: duplicate join keys → cross-pairing → corr 0.0 per group
        left = self._left(spark)
        other = spark.createDataFrame(
            [("A", 2.0), ("A", 4.0), ("B", 8.0), ("B", 6.0)],
            "key string, other double",
        )
        out = aligned_corr(
            left, "vals", other, "other", on="key", by=["key"]
        )
        m = {r["key"]: r["corr"] for r in out.collect()}
        assert m["A"] == approx(0.0, rel=1e-9)
        assert m["B"] == approx(0.0, rel=1e-9)

    def test_fused_aligned_corr_cov_matches_separate(self, spark):
        from pandas_weights_spark.corr import aligned_corr_cov, aligned_cov

        left = self._left(spark)
        other = spark.createDataFrame(
            [("A", 1, 2.0), ("A", 2, 4.0), ("B", 1, 9.0), ("B", 2, 5.0)],
            "key string, row_id int, other double",
        )
        fused = {
            r["key"]: (r["corr"], r["cov"])
            for r in aligned_corr_cov(
                left, "vals", other, "other", on=["key", "row_id"], by=["key"]
            ).collect()
        }
        corr = {
            r["key"]: r["corr"]
            for r in aligned_corr(
                left, "vals", other, "other", on=["key", "row_id"], by=["key"]
            ).collect()
        }
        cov = {
            r["key"]: r["cov"]
            for r in aligned_cov(
                left, "vals", other, "other", on=["key", "row_id"], by=["key"]
            ).collect()
        }
        assert set(fused) == {"A", "B"}
        for k, (c, v) in fused.items():
            assert c == corr[k] and v == cov[k]  # bit-identical kernels

    def test_unique_composite_key(self, spark):
        # unique-key variant (README.md:111-135): join on (key, row_id)
        left = self._left(spark)
        other = spark.createDataFrame(
            [("A", 1, 2.0), ("A", 2, 4.0), ("B", 1, 8.0), ("B", 2, 6.0)],
            "key string, row_id int, other double",
        )
        out = aligned_corr(
            left, "vals", other, "other", on=["key", "row_id"], by=["key"]
        )
        m = {r["key"]: r["corr"] for r in out.collect()}
        assert m["A"] == approx(1.0)
        assert m["B"] == approx(-1.0)

    def test_partial_other(self, spark):
        # other covers A only → B group disappears (inner join)
        left = self._left(spark)
        other = spark.createDataFrame(
            [("A", 1, 10.0), ("A", 2, 20.0)], "key string, row_id int, other double"
        )
        out = aligned_corr(
            left, "vals", other, "other", on=["key", "row_id"], by=["key"]
        )
        m = {r["key"]: r["corr"] for r in out.collect()}
        assert m["A"] == approx(1.0)
        assert "B" not in m

    def test_min_periods(self, spark):
        left = self._left(spark)
        other = spark.createDataFrame(
            [("A", 1, 2.0), ("A", 2, 4.0), ("B", 1, 8.0), ("B", 2, 6.0)],
            "key string, row_id int, other double",
        )
        out = aligned_corr(
            left, "vals", other, "other", on=["key", "row_id"], by=["key"],
            min_periods=3,
        )
        assert all(r["corr"] is None for r in out.collect())

    def test_global_scalar(self, spark):
        left = self._left(spark)
        other = spark.createDataFrame(
            [("A", 1, 2.0), ("A", 2, 4.0), ("B", 1, 6.0), ("B", 2, 8.0)],
            "key string, row_id int, other double",
        )
        out = aligned_corr(left, "vals", other, "other", on=["key", "row_id"])
        assert out.collect()[0]["corr"] == approx(1.0)

    def test_series_corr_api(self, spark):
        df = spark.createDataFrame(
            [("A", 1.0, 1.0), ("B", 2.0, 2.0), ("C", 3.0, 1.0)],
            "k string, v double, weights double",
        )
        other = spark.createDataFrame(
            [("A", 2.0), ("B", 4.0), ("C", 6.0)], "k string, y double"
        )
        ws = wt(df, "weights")["v"]
        out = ws.corr(other, "y", on="k")
        assert out.collect()[0]["corr"] == approx(1.0)


class TestSpearman:
    """spearman_corr extension (reference raises for non-pearson,
    frame.py:263-266): average-tie ranks + weighted pearson kernel."""

    def test_unit_weights_match_pandas(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(11)
        x = rng.normal(size=80)
        y = 0.6 * x + rng.normal(scale=0.8, size=80)
        # inject ties and NULL pairs
        x[::9] = 1.5
        y[::7] = np.nan
        pdf = pd.DataFrame({"x": x, "y": y, "w": np.ones(80)})
        from pandas_weights_spark.corr import spearman_corr

        got = spearman_corr(
            wt(spark.createDataFrame(pdf), "w"), "x", "y"
        ).collect()[0]["corr"]
        # pandas spearman needs scipy (absent here): rank over the
        # pairwise-complete mask, then plain pearson on the ranks
        m = pdf.dropna(subset=["x", "y"])
        exp = m["x"].rank(method="average").corr(m["y"].rank(method="average"))
        assert got == approx(exp)

    def test_explicit_band_bounds_same_result(self, spark):
        # band_bounds pins the banding literally (reproducible plans,
        # no probe job); values must be identical to the probed path —
        # even with deliberately terrible bounds (everything clamps
        # into the edge bands), because ranks are band-assignment-
        # invariant.
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(17)
        pdf = pd.DataFrame(
            {
                "x": rng.normal(size=60),
                "y": rng.normal(size=60),
                "w": rng.integers(1, 4, size=60).astype(float),
            }
        )
        from pandas_weights_spark.corr import spearman_corr

        wdf = wt(spark.createDataFrame(pdf), "w")
        probed = spearman_corr(wdf, "x", "y").collect()[0]["corr"]
        pinned = spearman_corr(
            wdf, "x", "y", band_bounds={"x": (-1.0, 1.0), "y": (-1.0, 1.0)}
        ).collect()[0]["corr"]
        terrible = spearman_corr(
            wdf, "x", "y",
            band_bounds={"x": (100.0, 200.0), "y": (-5.0, -4.0)},
        ).collect()[0]["corr"]
        assert pinned == approx(probed, rel=1e-12)
        assert terrible == approx(probed, rel=1e-12)

    def test_integer_weights_equal_row_repetition(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(5)
        x = rng.normal(size=40)
        y = rng.normal(size=40)
        w = rng.integers(1, 4, size=40)
        pdf = pd.DataFrame({"x": x, "y": y, "w": w.astype(float)})
        from pandas_weights_spark.corr import spearman_corr

        got = spearman_corr(
            wt(spark.createDataFrame(pdf), "w"), "x", "y"
        ).collect()[0]["corr"]

        # NOTE: repetition changes the RANKS too, so the right oracle is
        # weighted-pearson-on-original-ranks, not pandas on the expanded
        # frame. Ranks from the unexpanded frame, weighted moments by w:
        rx = pdf["x"].rank(method="average")
        ry = pdf["y"].rank(method="average")
        ws = pdf["w"]
        sw = ws.sum()
        cov = ((rx * ry * ws).sum() - (rx * ws).sum() * (ry * ws).sum() / sw) / (sw - 1)
        vx = ((rx * rx * ws).sum() - (rx * ws).sum() ** 2 / sw) / (sw - 1)
        vy = ((ry * ry * ws).sum() - (ry * ws).sum() ** 2 / sw) / (sw - 1)
        assert got == approx(cov / (vx * vy) ** 0.5)

    def test_grouped(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(3)
        n = 60
        pdf = pd.DataFrame(
            {
                "g": np.repeat(["a", "b", "c"], n // 3),
                "x": rng.normal(size=n),
                "y": rng.normal(size=n),
                "w": np.ones(n),
            }
        )
        from pandas_weights_spark.corr import spearman_corr

        got = {
            r["g"]: r["corr"]
            for r in spearman_corr(
                wt(spark.createDataFrame(pdf), "w"), "x", "y", by=["g"]
            ).collect()
        }
        for g, sub in pdf.groupby("g"):
            exp = (
                sub["x"].rank(method="average")
                .corr(sub["y"].rank(method="average"))
            )
            assert got[g] == approx(exp), g

    def test_matrix_method_now_routes(self, corr_frame):
        # r5: the frame surface routes method='spearman' to
        # spearman_matrix (listwise ranks); grouped matrices still
        # raise (use spearman_corr(by=...) per pair)
        m = corr_map(wt(corr_frame, "weights").corr(method="spearman"))
        assert m[("A", "C")] == approx(-1.0)
        with pytest.raises(NotImplementedError):
            wt(corr_frame, "weights").groupby("Label").corr(
                method="spearman"
            )


class TestAutocorr:
    def test_unit_weight_matches_pandas_shifted_corr(self, spark):
        import numpy as np
        import pandas as pd
        from pandas_weights_spark import wt

        rng = np.random.default_rng(12)
        n = 300
        # AR(1)-ish series so lag-1 corr is strongly positive
        x = np.zeros(n)
        for i in range(1, n):
            x[i] = 0.8 * x[i - 1] + rng.normal()
        df = spark.createDataFrame(
            [(i, float(v), 1.0) for i, v in enumerate(x)],
            "i int, x double, w double",
        )
        with pytest.warns(UserWarning, match="single"):
            out = {
                r["lag"]: r["corr"]
                for r in wt(df, "w")
                .autocorr("x", lags=[1, 3], order_by=["i"])
                .collect()
            }
        s = pd.Series(x)
        for k in (1, 3):
            want = s.corr(s.shift(k))
            assert out[k] == pytest.approx(want, rel=1e-9), k

    def test_grouped_weighted_matches_replication(self, spark):
        import numpy as np
        import pandas as pd
        from pandas_weights_spark import wt

        rng = np.random.default_rng(5)
        rows = [
            (int(i % 2), i, float(rng.normal()), int(rng.integers(1, 4)))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "g int, i int, x double, w int")
        out = {
            (r["g"], r["lag"]): r["corr"]
            for r in wt(df, "w")
            .autocorr("x", lags=[1], order_by=["i"], by=["g"])
            .collect()
        }
        # convention: pair (x_t, x_{t-1}) weighted by w_t -> replicate
        # the PAIR w_t times and take plain pearson
        for g in (0, 1):
            sub = [(i, x, w) for gg, i, x, w in rows if gg == g]
            sub.sort()
            xs, ys = [], []
            for (i0, x0, w0), (i1, x1, w1) in zip(sub[1:], sub[:-1]):
                xs += [x0] * w0
                ys += [x1] * w0
            want = pd.Series(xs).corr(pd.Series(ys))
            assert out[(g, 1)] == pytest.approx(want, rel=1e-9), g

    def test_short_group_null(self, spark):
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [("a", 1, 5.0, 1.0)], "g string, i int, x double, w double"
        )
        out = wt(df, "w").autocorr(
            "x", lags=[1], order_by=["i"], by=["g"]
        ).collect()
        assert out[0]["corr"] is None

    def test_bad_lags_raise(self, spark):
        from pandas_weights_spark import wt

        df = spark.createDataFrame([(1, 1.0, 1.0)], "i int, x double, w double")
        with pytest.raises(ValueError, match="lags"):
            wt(df, "w").autocorr("x", lags=[0], order_by=["i"])
        with pytest.raises(ValueError, match="order_by"):
            wt(df, "w").autocorr("x", lags=[1])

    def test_one_window_one_agg(self, spark):
        import pandas_weights_spark.plans as P
        from pandas_weights_spark import wt

        df = spark.createDataFrame(
            [("a", 1, 1.0, 1.0)], "g string, i int, x double, w double"
        )
        out = wt(df, "w").autocorr(
            "x", lags=[1, 2, 5], order_by=["i"], by=["g"]
        )
        plan = P.physical_plan(out)
        assert plan.count("Window") <= 1
        assert not P.has_python_eval(out)
        assert P.count_exchanges(out) <= 2, plan


class TestSpearmanMatrix:
    def test_matches_pandas_on_complete_data(self, spark):
        # no NULLs -> listwise == pairwise; unit weights -> pandas
        # .corr(method='spearman') is the exact oracle
        import numpy as np
        import pandas as pd

        from pandas_weights_spark.corr import spearman_matrix

        rng = np.random.default_rng(41)
        pdf = pd.DataFrame(
            {
                "a": rng.normal(size=90),
                "b": rng.normal(size=90),
                "c": rng.integers(0, 5, 90).astype(float),  # heavy ties
                "w": np.ones(90),
            }
        )
        got = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in spearman_matrix(
                wt(spark.createDataFrame(pdf), "w"), subset=["a", "b", "c"]
            ).collect()
        }
        exp = pdf[["a", "b", "c"]].corr(method="spearman")
        for cx in "abc":
            for cy in "abc":
                assert got[(cx, cy)] == approx(exp.loc[cx, cy], rel=1e-9), (
                    cx, cy,
                )

    def test_matrix_diag_and_symmetry(self, spark):
        import numpy as np
        import pandas as pd

        from pandas_weights_spark.corr import spearman_matrix

        rng = np.random.default_rng(3)
        pdf = pd.DataFrame(
            {
                "a": rng.normal(size=50),
                "b": rng.normal(size=50),
                "w": rng.integers(1, 4, 50).astype(float),
            }
        )
        got = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in spearman_matrix(
                wt(spark.createDataFrame(pdf), "w"), subset=["a", "b"]
            ).collect()
        }
        assert got[("a", "a")] == approx(1.0)
        assert got[("b", "b")] == approx(1.0)
        assert got[("a", "b")] == got[("b", "a")]

    def test_matrix_band_bounds_literal(self, spark):
        # ADVICE r5: band_bounds skips the partition-order-dependent
        # probe job; values must be identical (band-invariant ranks)
        import numpy as np
        import pandas as pd

        from pandas_weights_spark.corr import spearman_matrix

        rng = np.random.default_rng(7)
        pdf = pd.DataFrame(
            {
                "a": rng.normal(size=80),
                "b": rng.normal(size=80),
                "w": np.ones(80),
            }
        )
        wdf = wt(spark.createDataFrame(pdf), "w")
        probed = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in spearman_matrix(wdf, subset=["a", "b"]).collect()
        }
        literal = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in spearman_matrix(
                wdf, subset=["a", "b"],
                band_bounds={"a": (-2.0, 2.0), "b": (-2.0, 2.0)},
            ).collect()
        }
        for k, v in probed.items():
            assert literal[k] == approx(v, rel=1e-12), k
        with pytest.raises(ValueError, match="unselected"):
            spearman_matrix(
                wdf, subset=["a"], band_bounds={"zzz": (0.0, 1.0)}
            )

    def test_listwise_mask_matches_pair_operator(self, spark):
        # with NULLs, the matrix's listwise entry equals spearman_corr
        # run on the listwise-filtered frame
        import numpy as np
        import pandas as pd

        from pandas_weights_spark.corr import spearman_corr, spearman_matrix

        from pyspark.sql import functions as F

        rng = np.random.default_rng(9)
        a = rng.normal(size=80)
        b = rng.normal(size=80)
        a[::9] = np.nan
        b[::7] = np.nan
        pdf = pd.DataFrame({"a": a, "b": b, "w": np.ones(80)})
        df = spark.createDataFrame(pdf)
        got = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in spearman_matrix(
                wt(df, "w"), subset=["a", "b"]
            ).collect()
        }
        complete = df.where(
            F.col("a").isNotNull() & F.col("b").isNotNull()
        )
        exp = spearman_corr(wt(complete, "w"), "a", "b").collect()[0][
            "corr"
        ]
        assert got[("a", "b")] == approx(exp, rel=1e-9)

    def test_banded_plan_no_global_window(self, spark):
        import re

        import numpy as np
        import pandas as pd

        from pandas_weights_spark.corr import spearman_matrix

        rng = np.random.default_rng(2)
        pdf = pd.DataFrame(
            {
                "a": rng.normal(size=60),
                "b": rng.normal(size=60),
                "w": np.ones(60),
            }
        )
        out = spearman_matrix(
            wt(spark.createDataFrame(pdf), "w"), subset=["a", "b"]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "__band" in spec.split(",")[0], spec
