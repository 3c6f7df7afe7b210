"""Weighted crosstab (pivot.weighted_crosstab): differential vs pandas
``pd.crosstab(..., values=w, aggfunc='sum')`` across the normalize ×
margins matrix, NULL handling, plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import wt
from pandas_weights_spark.pivot import weighted_crosstab


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    n = 300
    return pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "c": rng.choice(["x", "y", "z", "q"], n),
            "w": rng.integers(1, 6, n).astype(float),
        }
    )


@pytest.fixture(scope="module")
def sdf(spark, data):
    return spark.createDataFrame(data)


def _expected(data, normalize, margins):
    return pd.crosstab(
        data["g"],
        data["c"],
        values=data["w"],
        aggfunc="sum",
        normalize=normalize,
        margins=margins,
        margins_name="All",
    ).fillna(0.0)


class TestCrosstab:
    @pytest.mark.parametrize("normalize", [False, "index", "columns", "all"])
    @pytest.mark.parametrize("margins", [False, True])
    def test_matches_pandas(self, sdf, data, normalize, margins):
        out = wt(sdf, "w").groupby("g").crosstab(
            "c", margins=margins, normalize=normalize
        )
        got = {r["g"]: r.asDict() for r in out.collect()}
        want = _expected(data, normalize, margins)
        # pandas puts margins in row/col 'All'; ours uses the same name
        assert set(got) == set(want.index.astype(str))
        for gkey, row in want.iterrows():
            for ckey, val in row.items():
                assert got[str(gkey)][str(ckey)] == pytest.approx(
                    float(val)
                ), (normalize, margins, gkey, ckey)

    def test_normalize_true_is_all(self, sdf):
        a = wt(sdf, "w").groupby("g").crosstab("c", normalize=True)
        b = wt(sdf, "w").groupby("g").crosstab("c", normalize="all")
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_null_column_value_is_a_bucket(self, spark):
        df = spark.createDataFrame(
            [("a", "x", 2.0), ("a", None, 3.0), ("b", "x", 1.0)],
            "g string, c string, w double",
        )
        out = wt(df, "w").groupby("g").crosstab("c")
        got = {r["g"]: r.asDict() for r in out.collect()}
        assert got["a"]["NULL"] == 3.0
        assert got["b"]["NULL"] == 0.0
        assert got["a"]["x"] == 2.0

    def test_explicit_column_values_no_scan(self, spark):
        df = spark.createDataFrame(
            [("a", "x", 1.0), ("a", "y", 2.0)], "g string, c string, w double"
        )
        out = wt(df, "w").groupby("g").crosstab(
            "c", column_values=["x", "y", "missing"]
        )
        row = out.collect()[0].asDict()
        assert row["missing"] == 0.0

    def test_empty_mass_cells_zero_not_null(self, spark):
        df = spark.createDataFrame(
            [("a", "x", 1.0), ("b", "y", 1.0)], "g string, c string, w double"
        )
        out = wt(df, "w").groupby("g").crosstab("c")
        got = {r["g"]: r.asDict() for r in out.collect()}
        assert got["a"]["y"] == 0.0 and got["b"]["x"] == 0.0

    def test_cell_collision_raises(self, spark):
        df = spark.createDataFrame(
            [("a", "g", 1.0)], "g string, c string, w double"
        )
        with pytest.raises(ValueError, match="collision"):
            wt(df, "w").groupby("g").crosstab("c")

    def test_bad_normalize_raises(self, sdf):
        with pytest.raises(ValueError, match="normalize"):
            wt(sdf, "w").groupby("g").crosstab("c", normalize="rows")

    def test_single_aggregate_no_python(self, sdf):
        import pandas_weights_spark.plans as P

        out = wt(sdf, "w").groupby("g").crosstab("c", column_values=list("xyzq"))
        assert not P.has_python_eval(out)
        # margins/normalize derive from the aggregated table: exactly
        # one exchange keyed on the index for the plain table
        assert P.count_exchanges(out) == 1, P.physical_plan(out)
