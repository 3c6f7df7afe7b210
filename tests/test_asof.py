"""As-of join: differential vs pandas.merge_asof + edge semantics."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.asof import asof_join


def _frames(seed=0, n_left=200, n_right=150, n_keys=5):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": [
                base + dt.timedelta(seconds=int(s))
                for s in rng.integers(0, 100_000, n_left)
            ],
            "lval": rng.normal(size=n_left).round(6),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "ts": [
                base + dt.timedelta(seconds=int(s))
                for s in rng.integers(0, 100_000, n_right)
            ],
            "rval": rng.normal(size=n_right).round(6),
        }
    )
    # unique (k, ts) on the right so the tie rule can't differ
    right = right.drop_duplicates(["k", "ts"])
    return left, right


def _run_both(spark, left, right, **kw):
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got = (
        asof_join(sl, sr, on="ts", by=["k"], **kw)
        .toPandas()
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    pd_kw = dict(kw)
    if "tolerance" in pd_kw and isinstance(pd_kw["tolerance"], str):
        num = int(pd_kw["tolerance"].split()[0])
        unit = pd_kw["tolerance"].split()[1]
        pd_kw["tolerance"] = pd.Timedelta(**{unit if unit.endswith("s") else unit + "s": num})
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        suffixes=("", "_right"),
        **pd_kw,
    ).sort_values(["k", "ts", "lval"]).reset_index(drop=True)
    return got, exp


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_differential_vs_pandas(spark, direction, allow_exact):
    left, right = _frames(seed=1)
    got, exp = _run_both(
        spark, left, right, direction=direction, allow_exact_matches=allow_exact
    )
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["rval"], exp["rval"], check_exact=True, check_names=False
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_tolerance(spark, direction):
    left, right = _frames(seed=2)
    got, exp = _run_both(
        spark, left, right, direction=direction, tolerance="600 seconds"
    )
    pd.testing.assert_series_equal(
        got["rval"], exp["rval"], check_exact=True, check_names=False
    )
    # matched ts is within tolerance; oriented except nearest (both sides)
    m = got.dropna(subset=["ts_right"])
    if direction == "nearest":
        gap = (m["ts"] - m["ts_right"]).abs()
    else:
        gap = (
            (m["ts"] - m["ts_right"])
            if direction == "backward"
            else (m["ts_right"] - m["ts"])
        )
        assert (gap >= pd.Timedelta(0)).all()
    assert (gap <= pd.Timedelta(seconds=600)).all()


def test_left_outer_and_collision_suffix(spark):
    left = pd.DataFrame(
        {"k": [1, 1], "ts": [10.0, 20.0], "v": [1.0, 2.0]}
    )
    right = pd.DataFrame({"k": [1], "ts": [15.0], "v": [9.0]})
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="ts", by=["k"]
    )
    assert set(out.columns) == {"k", "ts", "v", "ts_right", "v_right"}
    rows = {r["ts"]: r for r in out.collect()}
    assert rows[10.0]["v_right"] is None  # nothing at-or-before 10
    assert rows[20.0]["v_right"] == 9.0
    assert rows[20.0]["v"] == 2.0  # left value untouched


def test_numeric_on_numeric_tolerance(spark):
    left = pd.DataFrame({"k": [1, 1, 1], "x": [5.0, 10.0, 30.0], "a": [1, 2, 3]})
    right = pd.DataFrame({"k": [1, 1], "x": [4.0, 9.0], "b": [10.0, 20.0]})
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="x",
        by=["k"],
        tolerance=2,
    ).orderBy("x")
    got = [r["b"] for r in out.collect()]
    assert got == [10.0, 20.0, None]  # 30 is 21 past 9 -> beyond tolerance


def test_atomic_payload_with_nulls(spark):
    # right payload columns containing NULLs must be carried from ONE
    # row, never mixed across rows (the per-column last() bug).
    left = pd.DataFrame({"k": [1], "ts": [100.0], "z": [0.0]})
    right = spark.createDataFrame(
        [(1, 10.0, 1.0, "a"), (1, 50.0, None, "b")],
        "k long, ts double, p1 double, p2 string",
    )
    out = asof_join(
        spark.createDataFrame(left), right, on="ts", by=["k"]
    ).collect()[0]
    assert out["p2"] == "b" and out["p1"] is None  # row at ts=50, as one unit


def test_no_by_global(spark):
    left = pd.DataFrame({"ts": [1.0, 5.0], "a": [1, 2]})
    right = pd.DataFrame({"ts": [2.0], "b": [7.0]})
    out = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right), on="ts")
        .orderBy("ts")
        .collect()
    )
    assert [r["b"] for r in out] == [None, 7.0]


def test_null_on_right_rows_dropped(spark):
    # a right row with NULL `on` sorts NULLS FIRST under backward asc —
    # without the filter its payload is carried into left rows that
    # have no real at-or-before match.
    left = spark.createDataFrame([(1, 5.0, 1.0)], "k long, ts double, a double")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 50.0, 7.0)], "k long, ts double, b double"
    )
    out = asof_join(left, right, on="ts", by=["k"]).collect()[0]
    assert out["b"] is None  # the NULL-ts phantom must not match


def test_null_on_left_rows_kept_unmatched(spark):
    # pandas.merge_asof raises on NULL keys; we keep the row, unmatched
    # — both directions (forward's desc sort puts NULL left rows last,
    # where a carried payload would otherwise reach them).
    left = spark.createDataFrame(
        [(1, None, 1.0), (1, 10.0, 2.0)], "k long, ts double, a double"
    )
    right = spark.createDataFrame([(1, 5.0, 7.0)], "k long, ts double, b double")
    for direction in ("backward", "forward"):
        rows = {
            r["a"]: r
            for r in asof_join(
                left, right, on="ts", by=["k"], direction=direction
            ).collect()
        }
        assert len(rows) == 2
        assert rows[1.0]["b"] is None  # NULL-ts left row never matches
    assert rows[2.0]["b"] is None  # forward: nothing at-or-after 10
    back = {
        r["a"]: r for r in asof_join(left, right, on="ts", by=["k"]).collect()
    }
    assert back[2.0]["b"] == 7.0


def test_output_name_collision_raises(spark):
    # left already has the computed f"{on}{suffix}" name — silently
    # emitting duplicate column names breaks downstream select-by-name.
    left = spark.createDataFrame(
        [(1, 5.0, 1.0)], "k long, ts double, ts_right double"
    )
    right = spark.createDataFrame([(1, 4.0, 7.0)], "k long, ts double, b double")
    with pytest.raises(ValueError, match="ts_right"):
        asof_join(left, right, on="ts", by=["k"])
    # a different suffix resolves it
    out = asof_join(left, right, on="ts", by=["k"], suffix="_r")
    assert set(out.columns) == {"k", "ts", "ts_right", "ts_r", "b"}
