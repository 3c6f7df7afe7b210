"""partitioned_topk: the salted plan must select EXACTLY the rows (and
ranks) of the plain single-window top-k, and the automatic plan choice
must track the group-limit threshold."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pandas_weights_spark.topk import partitioned_topk


@pytest.fixture(scope="module")
def scored(spark):
    # 3 partitions × ~200 rows, scores with deliberate ties
    rows = []
    for p in range(3):
        for i in range(200):
            rows.append((f"p{p}", i, float((i * 37 + p * 11) % 50)))
    return spark.createDataFrame(rows, "part string, id int, score double")


def _unsalted(df, k):
    w = Window.partitionBy("part").orderBy(F.col("score").desc(), F.col("id"))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


@pytest.mark.parametrize("k,buckets", [(1, 32), (7, 4), (25, 32), (500, 8)])
def test_salted_matches_unsalted_window(scored, k, buckets):
    got = {
        (r["part"], r["id"], r["rank"])
        for r in partitioned_topk(
            scored,
            part_by=["part"],
            order_by=[F.col("score").desc(), F.col("id")],
            k=k,
            salt_by=["id"],
            salt_buckets=buckets,
            rank_col="rank",
            force_salt=True,
        ).collect()
    }
    exp = {
        (r["part"], r["id"], r["rank"]) for r in _unsalted(scored, k).collect()
    }
    assert got == exp


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_small_k_uses_single_window_with_group_limit(scored):
    # below the threshold: ONE window, and the optimizer's Partial
    # WindowGroupLimit pre-filters each map task before the exchange —
    # the property that makes the plain window scale-safe
    df = partitioned_topk(
        scored,
        part_by=["part"],
        order_by=[F.col("score").desc(), F.col("id")],
        k=5,
        salt_by=["id"],
    )
    plan = _plan(df)
    assert plan.count("Window [") == 1, plan
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_huge_k_salts(scored):
    df = partitioned_topk(
        scored,
        part_by=["part"],
        order_by=[F.col("score").desc(), F.col("id")],
        k=5000,  # above spark.sql.optimizer.windowGroupLimitThreshold
        salt_by=["id"],
    )
    plan = _plan(df)
    assert plan.count("Window [") == 2, plan
    assert "pmod" in plan, plan


def test_validation(scored):
    with pytest.raises(ValueError):
        partitioned_topk(scored, ["part"], ["score"], 0, ["id"])
    with pytest.raises(ValueError):
        partitioned_topk(scored, ["part"], ["score"], 5, ["id"], salt_buckets=0)
