"""Property-based tests (hypothesis): invariants that hold for ANY data,
complementing the golden-value ports.

Kept deliberately small (few examples, tiny frames) — each example pays
a Spark job; the properties, not the volume, carry the value:

* integer weights == row replication (the frequency-weights contract)
* weighted stats with unit weights == unweighted pandas stats
* quantiles are monotone in q and bracketed by min/max
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandas_weights_spark import wt

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=2,
    max_size=8,
)
int_weights = st.lists(st.integers(min_value=1, max_value=4), min_size=8, max_size=8)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


class TestReplicationEquivalence:
    @given(vals=values, ws=int_weights)
    @settings(**SETTINGS)
    def test_mean_var_match_replicated_rows(self, sp, vals, ws):
        ws = ws[: len(vals)]
        weighted = wt(
            sp.createDataFrame(
                [(float(v), float(w)) for v, w in zip(vals, ws)],
                "x double, w double",
            ),
            "w",
        )
        flat = [v for v, w in zip(vals, ws) for _ in range(w)]
        replicated = wt(
            sp.createDataFrame([(float(v), 1.0) for v in flat], "x double, w double"),
            "w",
        )
        for stat in ("mean", "var"):
            a = getattr(weighted, stat)().collect()[0]["x"]
            b = getattr(replicated, stat)().collect()[0]["x"]
            if a is None or b is None:
                assert a == b
            else:
                assert a == pytest.approx(b, rel=1e-9, abs=1e-9)


class TestUnitWeightsMatchPandas:
    @given(vals=values)
    @settings(**SETTINGS)
    def test_unit_weight_stats(self, sp, vals):
        import pandas as pd

        wdf = wt(
            sp.createDataFrame([(float(v), 1.0) for v in vals], "x double, w double"),
            "w",
        )
        s = pd.Series(vals, dtype=float)
        assert wdf.mean().collect()[0]["x"] == pytest.approx(s.mean(), rel=1e-9)
        got_var = wdf.var().collect()[0]["x"]
        want_var = s.var(ddof=1)
        if math.isnan(want_var):
            assert got_var is None
        else:
            assert got_var == pytest.approx(want_var, rel=1e-9, abs=1e-12)


class TestQuantileInvariants:
    @given(vals=values, ws=int_weights)
    @settings(**SETTINGS)
    def test_monotone_and_bracketed(self, sp, vals, ws):
        ws = ws[: len(vals)]
        wdf = wt(
            sp.createDataFrame(
                [(float(v), float(w)) for v, w in zip(vals, ws)],
                "x double, w double",
            ),
            "w",
        )
        row = wdf.quantile([0.1, 0.5, 0.9], subset=["x"]).collect()[0]
        q10, q50, q90 = row["x_p10"], row["x_p50"], row["x_p90"]
        assert q10 <= q50 <= q90
        assert min(vals) <= q10 and q90 <= max(vals)
