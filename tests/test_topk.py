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


class TestGlobalTopByMass:
    def test_same_rows_as_take_ordered(self, spark):
        from pandas_weights_spark.topk import global_top_by_mass

        rows = [(f"t{i}", float((i * 7) % 40 + 1)) for i in range(500)]
        df = spark.createDataFrame(rows, "term string, mass double")
        order = [F.col("mass").desc(), F.col("term")]
        ref = {
            (r["term"], r["mass"])
            for r in df.orderBy(*order).limit(120).collect()
        }
        got = {
            (r["term"], r["mass"])
            for r in global_top_by_mass(df, "mass", order, 120).collect()
        }
        assert got == ref and len(got) == 120

    def test_no_take_ordered_in_plan_above_threshold(self, spark):
        # the point: a huge-cap global cut must not compile to the
        # TakeOrdered driver merge (partitions x cap rows on the
        # driver); it routes through the salted executor-side windows
        from pandas_weights_spark.topk import global_top_by_mass

        df = spark.range(10_000).select(
            F.col("id").cast("string").alias("term"),
            (F.col("id") % 97).cast("double").alias("mass"),
        )
        out = global_top_by_mass(
            df, "mass", [F.col("mass").desc(), F.col("term")], 5000
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrdered" not in plan, plan
        assert out.count() == 5000

    def test_fewer_rows_than_cap(self, spark):
        from pandas_weights_spark.topk import global_top_by_mass

        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], "term string, mass double"
        )
        got = global_top_by_mass(
            df, "mass", [F.col("mass").desc(), F.col("term")], 99
        ).count()
        assert got == 2


class TestGlobalTopSaltColumns:
    def test_map_typed_column_does_not_break_salting(self, spark):
        # ADVICE r14: salting hashed ALL columns, so a map-typed
        # payload column failed xxhash64 at analysis time in the
        # salted regime. The salt only routes rows to stage-1
        # sub-sorts, so hashing the hashable columns only yields the
        # same top-cap row set.
        from pandas_weights_spark.topk import global_top_by_mass

        df = spark.range(2000).select(
            F.col("id").cast("string").alias("term"),
            (F.col("id") % 97).cast("double").alias("mass"),
            F.create_map(F.lit("k"), F.col("id")).alias("payload"),
        )
        order = [F.col("mass").desc(), F.col("term")]
        out = global_top_by_mass(df, "mass", order, 1500)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrdered" not in plan, plan
        ref = {
            (r["term"], r["mass"])
            for r in df.orderBy(*order).limit(1500).collect()
        }
        got = {(r["term"], r["mass"]) for r in out.collect()}
        assert got == ref and len(got) == 1500

    def test_all_map_columns_fall_back_to_full_salt(self, spark):
        from pandas_weights_spark.topk import _hashable_type

        df = spark.range(5).select(
            F.create_map(F.lit("k"), F.col("id")).alias("m")
        )
        # fallback keeps the old behavior (and its analysis error
        # surface) rather than salting on nothing
        assert [f.name for f in df.schema.fields
                if _hashable_type(f.dataType)] == []
