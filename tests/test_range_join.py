"""Bucketized range join vs a naive cross-join filter oracle, plus plan
shape (equi-join, no nested loop) and edge semantics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import plans as P
from pandas_weights_spark.functions.range_join import range_join


def _frames(seed=0, n_left=300, n_right=80, n_keys=4):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "x": rng.uniform(0, 1000, n_left).round(3),
            "lid": np.arange(n_left),
        }
    )
    lo = rng.uniform(0, 950, n_right)
    length = rng.exponential(30, n_right)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "lo": lo.round(3),
            "hi": (lo + length).round(3),
            "rid": np.arange(n_right),
        }
    )
    return left, right


def _naive(left, right, by_key=True, closed="both"):
    j = left.merge(right, on="k") if by_key else left.merge(right, how="cross")
    lo_ok = j["x"] >= j["lo"] if closed in ("both", "left") else j["x"] > j["lo"]
    hi_ok = j["x"] <= j["hi"] if closed in ("both", "right") else j["x"] < j["hi"]
    return set(zip(j.loc[lo_ok & hi_ok, "lid"], j.loc[lo_ok & hi_ok, "rid"]))


@pytest.mark.parametrize("width", [None, 10.0, 200.0])
def test_differential_vs_naive(spark, width):
    left, right = _frames(seed=3)
    out = range_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        point="x",
        lower="lo",
        upper="hi",
        by=["k"],
        bucket_width=width,
    )
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    assert got == _naive(left, right)


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
def test_closed_variants(spark, closed):
    left = pd.DataFrame({"k": [1] * 3, "x": [5.0, 10.0, 7.5], "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": [1], "lo": [5.0], "hi": [10.0], "rid": [0]})
    out = range_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        point="x", lower="lo", upper="hi", by=["k"],
        closed=closed, bucket_width=5.0,
    )
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    assert got == _naive(left, right, closed=closed)


def test_left_outer_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, 5.0, 0), (1, 500.0, 1), (1, None, 2)],
        "k long, x double, lid long",
    )
    right = spark.createDataFrame(
        [(1, 0.0, 10.0, 0), (1, None, 20.0, 1), (1, 30.0, 20.0, 2)],
        "k long, lo double, hi double, rid long",
    )
    out = range_join(
        left, right, point="x", lower="lo", upper="hi", by=["k"],
        how="left", bucket_width=10.0,
    ).collect()
    by_lid = {}
    for r in out:
        by_lid.setdefault(r["lid"], []).append(r["rid"])
    assert by_lid[0] == [0]          # contained
    assert by_lid[1] == [None]       # no interval covers 500 -> NULL row
    assert by_lid[2] == [None]       # NULL point never matches, kept
    assert len(out) == 3


def test_left_outer_matched_row_with_null_payload_not_duplicated(spark):
    # regression (round-3 verdict): a MATCHED left row carrying a NULL in
    # a non-join column must appear exactly once — the old anti-join
    # recovery compared all left columns null-unsafely and re-emitted it
    # as a spurious all-NULL-payload duplicate
    left = spark.createDataFrame(
        [(1, 5.0, None), (1, 500.0, "b")],
        "k long, x double, note string",
    )
    right = spark.createDataFrame(
        [(1, 0.0, 10.0, 7)], "k long, lo double, hi double, rid long"
    )
    out = range_join(
        left, right, point="x", lower="lo", upper="hi", by=["k"],
        how="left", bucket_width=10.0,
    ).collect()
    assert len(out) == 2
    by_x = {r["x"]: r for r in out}
    assert by_x[5.0]["rid"] == 7 and by_x[5.0]["note"] is None
    assert by_x[500.0]["rid"] is None and by_x[500.0]["note"] == "b"


def test_left_outer_single_join_no_extra_shuffle(spark):
    # the left-outer path is ONE equi-join: no anti-join recovery pass,
    # no union of two branches
    left, right = _frames(seed=7)
    out = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        point="x", lower="lo", upper="hi", by=["k"], how="left",
        bucket_width=25.0,
    )
    plan = P.physical_plan(out)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Union" not in plan, plan
    assert plan.count("Join") <= 1 or "LeftOuter" in plan


def test_no_nested_loop_in_plan(spark):
    left, right = _frames(seed=4)
    out = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        point="x", lower="lo", upper="hi", by=["k"], bucket_width=25.0,
    )
    plan = P.physical_plan(out)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert not P.has_python_eval(out)


def test_huge_interval_raises_not_truncates(spark):
    left = spark.createDataFrame([(1, 5.0)], "k long, x double")
    right = spark.createDataFrame(
        [(1, 0.0, 1e9)], "k long, lo double, hi double"
    )
    with pytest.raises(Exception, match="buckets"):
        range_join(
            left, right, point="x", lower="lo", upper="hi", by=["k"],
            bucket_width=1.0, max_buckets_per_interval=100,
        ).collect()


def test_collision_and_validation(spark):
    left = spark.createDataFrame([(1, 5.0, 1.0)], "k long, x double, lo double")
    right = spark.createDataFrame(
        [(1, 0.0, 10.0)], "k long, lo double, hi double"
    )
    # right `lo` collides with left `lo` -> suffixed, no error
    out = range_join(
        left, right, point="x", lower="lo", upper="hi", by=["k"],
        bucket_width=10.0,
    )
    assert set(out.columns) == {"k", "x", "lo", "lo_right", "hi"}
    with pytest.raises(ValueError):
        range_join(left, right, point="x", lower="lo", upper="hi",
                   by=["k"], how="full")
