"""DIFFERENTIAL conformance: run the actual reference library
(`/root/reference/src/pandas_weights`, path-imported with two in-process
shims — `np.bool` alias and a package-metadata stub; nothing on disk is
touched) against the engine on seeded random frames and assert equal
results for every shared operator.

This is the strongest parity evidence available: not hand-copied
goldens, but the reference's own code executing next to ours on data it
never saw. NaN (reference missing) maps to NULL (engine missing).
"""

import math
import random

import pytest

# -- load the reference with in-process shims --------------------------------
try:
    import numpy as _np

    if not hasattr(_np, "bool"):
        _np.bool = _np.bool_  # alias removed in numpy>=1.24, used by typing_
    import importlib.metadata as _md

    _orig_version = _md.version

    def _version(name):
        if name == "pandas-weights":
            return "0.2.0"
        return _orig_version(name)

    _md.version = _version
    import sys as _sys

    _sys.path.insert(0, "/root/reference/src")
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        import pandas_weights  # noqa: F401  (registers the .wt accessor)
    import pandas as pd

    HAVE_REFERENCE = True
except Exception:  # pragma: no cover - environment without the reference
    HAVE_REFERENCE = False

# r16: randomized differential vs the reference — deep verification,
# env-gated (PWS_SLOW_TESTS=1) so the default suite fits the driver's
# verify window
pytestmark = [
    pytest.mark.skipif(
        not HAVE_REFERENCE, reason="reference library not importable"
    ),
    pytest.mark.slow,
]

from pyspark.sql import functions as F  # noqa: E402

from pandas_weights_spark import wt  # noqa: E402

SEEDS = [1, 7, 42]


def make_frame(seed: int, n: int = 17):
    """Random frame with NaNs in data and weights."""
    rng = random.Random(seed)

    def col(p_nan=0.2):
        return [
            None if rng.random() < p_nan else round(rng.uniform(-50, 50), 3)
            for _ in range(n)
        ]

    return {
        "g": [rng.choice(["x", "y", "z"]) for _ in range(n)],
        "a": col(),
        "b": col(),
        "w": [
            None if rng.random() < 0.1 else round(rng.uniform(0.5, 5.0), 3)
            for _ in range(n)
        ],
    }


def pdf_of(data):
    return pd.DataFrame({k: v for k, v in data.items()})


def sdf_of(spark, data):
    rows = list(zip(data["g"], data["a"], data["b"], data["w"]))
    return spark.createDataFrame(
        rows, "g string, a double, b double, w double"
    )


def eq(spark_val, pandas_val, tag):
    if pandas_val is None or (
        isinstance(pandas_val, float) and math.isnan(pandas_val)
    ):
        assert spark_val is None, f"{tag}: engine={spark_val} ref=NaN"
    else:
        assert spark_val == pytest.approx(pandas_val, rel=1e-12, abs=1e-12), (
            f"{tag}: engine={spark_val} ref={pandas_val}"
        )


class TestGlobalAggs:
    @pytest.mark.parametrize("seed", SEEDS)
    @pytest.mark.parametrize(
        "stat,kwargs",
        [
            ("count", {}),
            ("count", {"skipna": False}),
            ("sum", {}),
            ("sum", {"min_count": 1}),
            ("mean", {}),
            ("var", {}),
            ("var", {"ddof": 0}),
            ("std", {}),
        ],
    )
    def test_matches_reference(self, spark, seed, stat, kwargs):
        data = make_frame(seed)
        # the reference's GLOBAL aggregates do not numeric-prune (only
        # groupby/corr do, frame.py:496-503/268) and TypeError on string
        # columns — compare on the numeric frame only
        pdf = pdf_of(data).drop(columns=["g"])
        ref = getattr(pdf.wt("w"), stat)(**kwargs)
        got = getattr(wt(sdf_of(spark, data), "w"), stat)(**kwargs).collect()[0]
        for c in ("a", "b"):
            eq(got[c], ref[c], f"{stat}{kwargs} seed={seed} col={c}")


class TestGroupedAggs:
    @pytest.mark.parametrize("seed", SEEDS)
    @pytest.mark.parametrize(
        "stat,kwargs",
        [("count", {}), ("sum", {}), ("mean", {}), ("var", {}), ("std", {})],
    )
    def test_matches_reference(self, spark, seed, stat, kwargs):
        data = make_frame(seed)
        ref = getattr(pdf_of(data).wt("w").groupby("g"), stat)(**kwargs)
        rows = getattr(
            wt(sdf_of(spark, data), "w").groupby("g"), stat
        )(**kwargs).collect()
        got = {r["g"]: r for r in rows}
        assert set(got) == set(ref.index)
        for key in ref.index:
            for c in ("a", "b"):
                eq(got[key][c], ref.loc[key, c], f"grouped {stat} {key}.{c}")


class TestCorr:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_corr_matrix_matches(self, spark, seed):
        data = make_frame(seed, n=23)
        ref = pdf_of(data).wt("w").corr()
        got = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in wt(sdf_of(spark, data), "w")
            .corr(subset=["a", "b"])
            .collect()
        }
        for cx in ("a", "b"):
            for cy in ("a", "b"):
                eq(got[(cx, cy)], ref.loc[cx, cy], f"corr {cx}x{cy}")

    @pytest.mark.parametrize("seed", SEEDS)
    def test_grouped_corr_matches(self, spark, seed):
        data = make_frame(seed, n=29)
        ref = pdf_of(data).wt("w").groupby("g").corr()
        got = {
            (r["g"], r["col_x"], r["col_y"]): r["corr"]
            for r in wt(sdf_of(spark, data), "w").groupby("g").corr().collect()
        }
        for (key, cx) in ref.index:
            for cy in ("a", "b"):
                eq(
                    got[(key, cx, cy)],
                    ref.loc[(key, cx), cy],
                    f"gcorr {key} {cx}x{cy}",
                )


class TestResample:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_resample_stats_match(self, spark, seed):
        import datetime as dt

        rng = random.Random(seed)
        n = 11
        ts = pd.date_range("2024-03-01", periods=n, freq="D")
        vals = [None if rng.random() < 0.2 else float(rng.randint(1, 9)) for _ in range(n)]
        ws = [float(rng.randint(1, 4)) for _ in range(n)]
        # fresh frame per stat: the reference's cached accessor drops the
        # weight column from its obj on first bind (frame.py:103-104)
        def ref_df():
            return pd.DataFrame({"v": vals, "w": ws}, index=ts)

        sdf = spark.createDataFrame(
            [
                (t.to_pydatetime(), v, w)
                for t, v, w in zip(ts, vals, ws)
            ],
            "ts timestamp, v double, w double",
        )
        for stat in ("sum", "count", "mean", "var", "std"):
            ref = getattr(ref_df().wt("w").resample("3D"), stat)()["v"]
            rows = getattr(
                wt(sdf, "w").resample("3D", on="ts"), stat
            )().collect()
            got = {r["ts"]: r["v"] for r in rows}
            for bucket, want in ref.items():
                b = bucket.to_pydatetime()
                if b not in got:
                    # engine omits empty buckets (documented divergence)
                    assert want is None or (
                        isinstance(want, float) and math.isnan(want)
                    ) or want == 0.0
                    continue
                eq(got[b], want, f"resample {stat} {b}")


class TestSeriesCorr:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_aligned_corr_matches(self, spark, seed):
        rng = random.Random(seed)
        n = 13
        xs = [round(rng.uniform(-10, 10), 3) for _ in range(n)]
        ys = [round(rng.uniform(-10, 10), 3) for _ in range(n)]
        ws = [round(rng.uniform(0.5, 3.0), 3) for _ in range(n)]
        ref = (
            pd.Series(xs).wt(ws).corr(pd.Series(ys))
        )
        from pandas_weights_spark.corr import aligned_corr
        from pandas_weights_spark.frame import WEIGHT_COL

        left = spark.createDataFrame(
            [(i, x, w) for i, (x, w) in enumerate(zip(xs, ws))],
            "k long, x double, w double",
        ).withColumn(WEIGHT_COL, F.col("w"))
        right = spark.createDataFrame(
            [(i, y) for i, y in enumerate(ys)], "k long, y double"
        )
        got = aligned_corr(left, "x", right, "y", on="k").collect()[0]["corr"]
        eq(got, ref, f"series corr seed={seed}")


class TestNaWeight:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_na_weight_fill_matches(self, spark, seed):
        data = make_frame(seed)
        pdf = pdf_of(data).drop(columns=["g"])
        ref = pdf.wt("w", na_weight=1.5).mean()
        got = wt(sdf_of(spark, data), "w", na_weight=1.5).mean().collect()[0]
        for c in ("a", "b"):
            eq(got[c], ref[c], f"na_weight mean seed={seed} col={c}")


class TestMultiKeyGroupBy:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_two_key_grouped_sum(self, spark, seed):
        rng = random.Random(seed * 31)
        n = 23
        data = {
            "g": [rng.choice(["x", "y"]) for _ in range(n)],
            "h": [rng.choice([1, 2, 3]) for _ in range(n)],
            "a": [round(rng.uniform(-5, 5), 3) for _ in range(n)],
            "w": [round(rng.uniform(0.5, 2.0), 3) for _ in range(n)],
        }
        pdf = pd.DataFrame(data)
        ref = pdf.wt("w").groupby(["g", "h"]).sum()
        sdf = spark.createDataFrame(
            list(zip(data["g"], data["h"], data["a"], data["w"])),
            "g string, h long, a double, w double",
        )
        rows = wt(sdf, "w").groupby("g", "h").sum().collect()
        got = {(r["g"], r["h"]): r["a"] for r in rows}
        assert set(got) == set(ref.index)
        for key in ref.index:
            eq(got[key], ref.loc[key, "a"], f"2key sum {key}")
