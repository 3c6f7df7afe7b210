"""Weighted sampling operators (sample.py): determinism, weight
proportionality, stratified quotas, split assignment, and bit-exact
DuckDB mirroring of the hash uniform."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.sample import (
    hash_split,
    stratified_sample,
    uniform_hash,
    uniform_hash_sql,
    weighted_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet").cache()


class TestUniformHash:
    def test_matches_duckdb_bit_exact(self, lineitem):
        got = {
            (r[0], r[1]): r[2]
            for r in lineitem.select(
                "l_orderkey",
                "l_linenumber",
                uniform_hash(
                    [F.col("l_orderkey"), F.col("l_linenumber")], 7
                ).alias("u"),
            ).collect()
        }
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
        )
        usql = uniform_hash_sql(["l_orderkey", "l_linenumber"], 7)
        want = {
            (r[0], r[1]): r[2]
            for r in con.sql(
                f"SELECT l_orderkey, l_linenumber, {usql} FROM lineitem"
            ).fetchall()
        }
        assert got == want  # exact float equality, not approx

    def test_range_and_spread(self, lineitem):
        stats = lineitem.select(
            uniform_hash([F.col("l_orderkey"), F.col("l_linenumber")], 1).alias("u")
        ).agg(
            F.min("u"), F.max("u"), F.avg("u"), F.count("u")
        ).first()
        assert 0 < stats[0] and stats[1] < 1
        assert 0.45 < stats[2] < 0.55

    def test_seed_changes_values(self, lineitem):
        keys = [F.col("l_orderkey"), F.col("l_linenumber")]
        diff = lineitem.select(
            (uniform_hash(keys, 1) == uniform_hash(keys, 2)).alias("same")
        ).where("same").count()
        assert diff == 0


class TestWeightedSample:
    def test_size_and_determinism(self, lineitem):
        a = weighted_sample(
            lineitem, F.col("l_quantity"), 100,
            ["l_orderkey", "l_linenumber"], seed=3,
        )
        b = weighted_sample(
            lineitem, F.col("l_quantity"), 100,
            ["l_orderkey", "l_linenumber"], seed=3,
        )
        rows_a = sorted(r["l_orderkey"] * 10 + r["l_linenumber"] for r in a.collect())
        rows_b = sorted(r["l_orderkey"] * 10 + r["l_linenumber"] for r in b.collect())
        assert len(rows_a) == 100
        assert rows_a == rows_b

    def test_weight_proportionality(self, spark):
        # two weight classes 10:1 — the heavy class should dominate
        rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, w double")
        out = weighted_sample(df, F.col("w"), 400, ["id"], seed=5)
        heavy = out.where("w = 10.0").count()
        assert heavy > 300  # E[heavy] ≈ 364 of 400

    def test_nonpositive_weights_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0), (2, 0.0), (3, -1.0), (4, None), (5, 1.0)],
            "id long, w double",
        )
        out = weighted_sample(df, F.col("w"), 10, ["id"])
        assert {r["id"] for r in out.collect()} == {1, 5}


class TestStratifiedSample:
    def test_quota_per_stratum(self, lineitem):
        out = stratified_sample(
            lineitem, F.col("l_quantity"), 50,
            by=["l_returnflag"], key_cols=["l_orderkey", "l_linenumber"],
        )
        counts = {
            r["l_returnflag"]: r["n"]
            for r in out.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
        }
        flags = {
            r["l_returnflag"]
            for r in lineitem.select("l_returnflag").distinct().collect()
        }
        assert set(counts) == flags
        assert all(n == 50 for n in counts.values())

    def test_small_stratum_returned_whole(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 1.0), (3, "b", 1.0)],
            "id long, g string, w double",
        )
        out = stratified_sample(df, F.col("w"), 10, by=["g"], key_cols=["id"])
        assert out.count() == 3


class TestHashSplit:
    def test_fractions_and_disjoint(self, lineitem):
        out = hash_split(
            lineitem, {"train": 0.8, "val": 0.1, "test": 0.1},
            ["l_orderkey", "l_linenumber"],
        )
        total = lineitem.count()
        counts = {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert sum(counts.values()) == total
        assert abs(counts["train"] / total - 0.8) < 0.03
        assert abs(counts["val"] / total - 0.1) < 0.02

    def test_stable_under_repartition(self, lineitem):
        a = hash_split(lineitem, {"train": 0.5, "test": 0.5}, ["l_orderkey", "l_linenumber"])
        b = hash_split(
            lineitem.repartition(13), {"train": 0.5, "test": 0.5},
            ["l_orderkey", "l_linenumber"],
        )
        ka = {(r["l_orderkey"], r["l_linenumber"]): r["split"] for r in a.collect()}
        kb = {(r["l_orderkey"], r["l_linenumber"]): r["split"] for r in b.collect()}
        assert ka == kb

    def test_bad_fractions_raise(self, lineitem):
        with pytest.raises(ValueError):
            hash_split(lineitem, {"a": 0.5, "b": 0.2}, ["l_orderkey"])


class TestPoissonSample:
    def test_expected_size_and_determinism(self, lineitem):
        from pandas_weights_spark.sample import poisson_sample

        a = poisson_sample(
            lineitem, F.col("l_quantity"), 500,
            ["l_orderkey", "l_linenumber"], seed=3,
        )
        b = poisson_sample(
            lineitem, F.col("l_quantity"), 500,
            ["l_orderkey", "l_linenumber"], seed=3,
        )
        na, nb = a.count(), b.count()
        assert na == nb  # deterministic
        assert 350 < na < 650  # mean 500, sd ~22

    def test_heavy_rows_oversampled(self, spark):
        from pandas_weights_spark.sample import poisson_sample

        rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(4000)]
        df = spark.createDataFrame(rows, "id long, w double")
        out = poisson_sample(df, F.col("w"), 600, ["id"]).collect()
        heavy = sum(1 for r in out if r["w"] == 10.0)
        light = len(out) - heavy
        assert heavy > 5 * max(light, 1) * 0.7  # ~10x inclusion ratio

    def test_zero_total_weight_empty(self, spark):
        from pandas_weights_spark.sample import poisson_sample

        df = spark.createDataFrame([(1, 0.0), (2, None)], "id long, w double")
        assert poisson_sample(df, F.col("w"), 10, ["id"]).count() == 0

    def test_map_only_plan(self, lineitem):
        from pandas_weights_spark import plans as P
        from pandas_weights_spark.sample import poisson_sample

        df = poisson_sample(
            lineitem, F.col("l_quantity"), 100,
            ["l_orderkey", "l_linenumber"], total_weight=117000.0,
        )
        assert P.count_exchanges(df) == 0
        assert not P.has_python_eval(df)


class TestCapPerGroup:
    def test_cap_and_order(self, spark):
        from pandas_weights_spark.sample import cap_per_group

        rows = [(g, i, float(i)) for g in "ab" for i in range(10)]
        df = spark.createDataFrame(rows, "g string, id long, q double")
        out = cap_per_group(
            df, ["g"], 3, order_by=[F.col("q").desc()]
        )
        got = {}
        for r in out.collect():
            got.setdefault(r["g"], []).append(r["id"])
        for g in "ab":
            assert sorted(got[g]) == [7, 8, 9]  # top-3 by q

    def test_random_cap_deterministic(self, spark):
        from pandas_weights_spark.sample import cap_per_group

        rows = [(g, i) for g in "ab" for i in range(50)]
        df = spark.createDataFrame(rows, "g string, id long")
        a = sorted(map(tuple, cap_per_group(
            df, ["g"], 5, key_cols=["g", "id"]).collect()))
        b = sorted(map(tuple, cap_per_group(
            df, ["g"], 5, key_cols=["g", "id"]).collect()))
        assert a == b and len(a) == 10
        c = sorted(map(tuple, cap_per_group(
            df, ["g"], 5, key_cols=["g", "id"], seed=7).collect()))
        assert c != a  # seed changes the survivors

    def test_small_groups_untouched(self, spark):
        from pandas_weights_spark.sample import cap_per_group

        df = spark.createDataFrame([("a", 1), ("b", 2)], "g string, id long")
        out = cap_per_group(df, ["g"], 10, key_cols=["id"])
        assert out.count() == 2

    def test_needs_order_or_keys(self, spark):
        from pandas_weights_spark.sample import cap_per_group

        df = spark.createDataFrame([("a", 1)], "g string, id long")
        with pytest.raises(ValueError, match="key_cols"):
            cap_per_group(df, ["g"], 1)


class TestKFold:
    def test_folds_cover_and_balance(self, spark):
        from pandas_weights_spark.sample import kfold_split

        df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
        out = kfold_split(df, 5, ["id"])
        counts = {r["fold"]: r["n"] for r in
                  out.groupBy("fold").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {0, 1, 2, 3, 4}
        for n in counts.values():
            assert 800 < n < 1200  # ~uniform

    def test_deterministic_and_disjoint(self, spark):
        from pandas_weights_spark.sample import kfold_split

        df = spark.createDataFrame([(i,) for i in range(500)], "id long")
        a = dict((r["id"], r["fold"]) for r in kfold_split(df, 4, ["id"]).collect())
        b = dict((r["id"], r["fold"]) for r in kfold_split(df, 4, ["id"]).collect())
        assert a == b
        # train/test of fold i partition the data
        out = kfold_split(df, 4, ["id"])
        test0 = out.where(F.col("fold") == 0).count()
        train0 = out.where(F.col("fold") != 0).count()
        assert test0 + train0 == 500

    def test_no_shuffle(self, spark):
        from pandas_weights_spark.sample import kfold_split

        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        out = kfold_split(df, 5, ["l_orderkey", "l_linenumber"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


class TestTemperatureSampling:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # heavy skew: en 1000 rows, fr 100, sw 10
        rows = []
        rid = 0
        for lang, n in (("en", 1000), ("fr", 100), ("sw", 10)):
            for _ in range(n):
                rows.append((rid, lang))
                rid += 1
        return spark.createDataFrame(rows, "id long, lang string")

    def test_rates_interpolate_natural_and_uniform(self, skewed):
        from pandas_weights_spark.sample import temperature_rates

        nat = {
            r["group"]: r["p_temp"]
            for r in temperature_rates(skewed, "lang", alpha=1.0).collect()
        }
        uni = {
            r["group"]: r["p_temp"]
            for r in temperature_rates(skewed, "lang", alpha=0.0).collect()
        }
        mid = {
            r["group"]: r["p_temp"]
            for r in temperature_rates(skewed, "lang", alpha=0.5).collect()
        }
        assert nat["en"] == pytest.approx(1000 / 1110)
        assert uni["en"] == pytest.approx(1 / 3)
        # smoothing strictly boosts the low-resource group
        assert nat["sw"] < mid["sw"] < uni["sw"]
        assert sum(mid.values()) == pytest.approx(1.0)

    def test_sample_rebalances_distribution(self, skewed):
        from pandas_weights_spark.sample import temperature_sample

        out = temperature_sample(
            skewed, "lang", target_rows=300, key_cols=["id"], alpha=0.5,
        ).collect()
        got = {}
        for r in out:
            got[r["lang"]] = got.get(r["lang"], 0) + 1
        # sw saturates (takes all 10); fr boosted well above its
        # natural 300*100/1110 ≈ 27
        assert got["sw"] == 10
        assert got["fr"] > 40
        # overall size near target (binomial noise)
        assert 0.6 * 300 < sum(got.values()) < 1.4 * 300

    def test_deterministic_and_repartition_invariant(self, skewed):
        from pandas_weights_spark.sample import temperature_sample

        a = sorted(
            r["id"]
            for r in temperature_sample(
                skewed, "lang", 200, ["id"]
            ).collect()
        )
        b = sorted(
            r["id"]
            for r in temperature_sample(
                skewed.repartition(7), "lang", 200, ["id"]
            ).collect()
        )
        assert a == b and len(a) > 0

    def test_alpha_one_matches_uniform_subsample_rate(self, skewed):
        from pandas_weights_spark.sample import temperature_sample

        # alpha=1: every group sampled at the same target/N rate
        out = temperature_sample(
            skewed, "lang", 111, ["id"], alpha=1.0
        ).collect()
        # expected ~10% of every group
        got = {}
        for r in out:
            got[r["lang"]] = got.get(r["lang"], 0) + 1
        assert 60 < got.get("en", 0) < 140


def test_temperature_sample_preserves_user_group_column(spark):
    # regression: a data column literally named "group" must survive
    from pandas_weights_spark.sample import temperature_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", f"g{i % 3}") for i in range(60)],
        "id long, lang string, group string",
    )
    out = temperature_sample(df, "lang", 30, ["id"])
    assert set(out.columns) == {"id", "lang", "group"}
    assert out.count() > 0


class TestMixtureMaterialize:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [(i, "abc"[i % 3], float(i % 5 + 1)) for i in range(900)],
            "id long, dom string, tok double",
        )

    def test_targets_hit_in_expectation(self, corpus):
        from pandas_weights_spark.sample import mixture_materialize

        out = mixture_materialize(
            corpus, "dom", {"a": 2400.0, "b": 300.0}, ["id"],
            weight=F.col("tok"),
        )
        got = {
            r["dom"]: (r["m"], r["maxep"])
            for r in out.groupBy("dom").agg(
                F.sum("tok").alias("m"), F.max("epoch").alias("maxep")
            ).collect()
        }
        # each domain has 300 rows, mass 900: a upsamples ~2.67x with
        # epochs 0..2, b thins to ~1/3, c (untargeted) drops
        assert set(got) == {"a", "b"}
        assert got["a"][0] == pytest.approx(2400.0, rel=0.1)
        assert got["a"][1] == 2
        assert got["b"][0] == pytest.approx(300.0, rel=0.25)
        assert got["b"][1] == 0

    def test_full_epochs_always_materialize(self, corpus):
        from pandas_weights_spark.sample import mixture_materialize

        out = mixture_materialize(
            corpus, "dom", {"a": 1800.0}, ["id"], weight=F.col("tok"),
        )
        # k = 2.0 exactly: every 'a' row appears at epochs 0 and 1;
        # epoch 2 (frac = 0) never
        per = out.groupBy("id").count().collect()
        assert all(r["count"] == 2 for r in per)
        assert out.agg(F.max("epoch")).first()[0] == 1

    def test_deterministic_under_repartition(self, corpus):
        from pandas_weights_spark.sample import mixture_materialize

        t = {"a": 2000.0, "c": 450.0}
        a = sorted(
            (r["id"], r["epoch"])
            for r in mixture_materialize(
                corpus, "dom", t, ["id"], weight=F.col("tok")
            ).collect()
        )
        b = sorted(
            (r["id"], r["epoch"])
            for r in mixture_materialize(
                corpus.repartition(13), "dom", t, ["id"],
                weight=F.col("tok"),
            ).collect()
        )
        assert a == b

    def test_guards(self, corpus, spark):
        from pandas_weights_spark.sample import mixture_materialize

        with pytest.raises(ValueError, match="at least one"):
            mixture_materialize(corpus, "dom", {}, ["id"])
        with pytest.raises(ValueError, match=">= 0"):
            mixture_materialize(corpus, "dom", {"a": -1.0}, ["id"])
        with pytest.raises(ValueError, match="max_repeat"):
            mixture_materialize(
                corpus, "dom", {"a": 1e9}, ["id"], weight=F.col("tok"),
            )
        with pytest.raises(ValueError, match="no available mass"):
            mixture_materialize(corpus, "dom", {"zzz": 10.0}, ["id"])
        # zero target for a missing domain is fine (vacuous)
        out = mixture_materialize(
            corpus, "dom", {"zzz": 0.0, "a": 100.0}, ["id"],
            weight=F.col("tok"),
        )
        assert out.where(F.col("dom") != "a").count() == 0

    def test_null_domain_targetable(self, spark):
        from pandas_weights_spark.sample import mixture_materialize

        df = spark.createDataFrame(
            [(1, None, 1.0), (2, "x", 1.0), (3, None, 1.0)],
            "id long, dom string, tok double",
        )
        out = mixture_materialize(
            df, "dom", {None: 4.0}, ["id"], weight=F.col("tok")
        ).collect()
        # k = 2.0 for the NULL domain: both NULL rows twice, 'x' drops
        assert sorted((r["id"], r["epoch"]) for r in out) == [
            (1, 0), (1, 1), (3, 0), (3, 1)
        ]


class TestScaleGuardedSelection:
    """r14: above the session's window group-limit threshold,
    weighted_sample and dsir_gumbel_topk route through the salted
    executor-side two-stage (topk.global_top_by_mass) instead of
    ``orderBy().limit(n)`` — TakeOrdered's driver merge holds
    ``partitions × n`` candidate rows, the exact OOM topk.py:50-54
    documents for million-row selections over a 100 TB scan. Both
    regimes must select EXACTLY the same rows."""

    THRESH = "spark.sql.optimizer.windowGroupLimitThreshold"

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_weighted_sample_salted_regime_same_rows(self, spark):
        # unique keys -> (u/w, keys) is a TOTAL order (the operator's
        # documented precondition; the synthetic lineitem table has
        # duplicate (orderkey, linenumber) pairs, so a frame with a
        # real key column is the right exactness fixture)
        df = spark.range(3000).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") % 17) + 1).cast("double").alias("w"),
        )
        ref = {
            r["doc_id"]
            for r in weighted_sample(df, F.col("w"), 60, ["doc_id"]).collect()
        }
        old = spark.conf.get(self.THRESH)
        spark.conf.set(self.THRESH, "10")
        try:
            salted = weighted_sample(df, F.col("w"), 60, ["doc_id"])
            plan = self._plan(salted)
            assert "TakeOrdered" not in plan, plan
            assert "pmod" in plan, plan  # salted stage-1 routing
            got = {r["doc_id"] for r in salted.collect()}
        finally:
            spark.conf.set(self.THRESH, old)
        assert got == ref and len(got) == 60

    def test_weighted_sample_small_n_keeps_take_ordered(self, lineitem):
        # under the threshold the driver merge is bounded (<= 1000 x
        # partitions rows) and TakeOrdered's no-shuffle plan wins
        df = weighted_sample(
            lineitem, F.col("l_quantity"), 60,
            ["l_orderkey", "l_linenumber"],
        )
        assert "TakeOrderedAndProject" in self._plan(df)

    def test_dsir_gumbel_topk_salted_regime_same_rows(self, spark):
        from pandas_weights_spark.functions.dsir import dsir_gumbel_topk

        df = spark.createDataFrame(
            [(i, float(i % 13) / 3.0) for i in range(400)],
            "doc_id long, lw double",
        )
        ref = {
            r["doc_id"]
            for r in dsir_gumbel_topk(
                df, F.col("lw"), 50, ["doc_id"], seed=3
            ).collect()
        }
        old = spark.conf.get(self.THRESH)
        spark.conf.set(self.THRESH, "10")
        try:
            salted = dsir_gumbel_topk(df, F.col("lw"), 50, ["doc_id"], seed=3)
            plan = self._plan(salted)
            assert "TakeOrdered" not in plan, plan
            assert "pmod" in plan, plan
            got = {r["doc_id"] for r in salted.collect()}
        finally:
            spark.conf.set(self.THRESH, old)
        assert got == ref and len(got) == 50
        # gumbel key column survives in both regimes
        assert "gumbel_key" in salted.columns


class TestUnimaxRates:
    """r14: UniMax (Chung et al. 2023) — epoch-capped uniform budget
    allocation across groups (the multilingual mixing algorithm that
    replaces temperature sampling's α knob)."""

    def _frame(self, spark):
        # token masses: a, b tiny (will cap), c, d large (will split)
        rows = (
            [("a", 10.0)] * 4        # mass 40
            + [("b", 30.0)] * 4      # mass 120
            + [("c", 100.0)] * 30    # mass 3000
            + [("d", 100.0)] * 50    # mass 5000
        )
        return spark.createDataFrame(rows, "g string, tok double")

    def _py_ref(self, masses, budget, max_epochs):
        caps = sorted(
            ((m * max_epochs, g) for g, m in masses.items())
        )
        k = len(caps)
        remaining = budget
        alloc = {}
        for idx, (cap, g) in enumerate(caps):
            share = remaining / (k - idx)
            take = cap if cap <= share else share
            alloc[g] = take
            remaining -= take
        return alloc

    def test_matches_python_reference(self, spark):
        import math

        from pandas_weights_spark.sample import unimax_rates

        df = self._frame(spark)
        budget, me = 2000.0, 4.0
        got = {
            r["group"]: r
            for r in unimax_rates(
                df, "g", budget, weight=F.col("tok"), max_epochs=me
            ).collect()
        }
        masses = {"a": 40.0, "b": 120.0, "c": 3000.0, "d": 5000.0}
        want = self._py_ref(masses, budget, me)
        for g, m in masses.items():
            assert got[g]["mass"] == m
            assert math.isclose(got[g]["alloc"], want[g], rel_tol=1e-12)
            assert got[g]["epochs"] <= me + 1e-9
        # tiny groups take their whole capped supply
        assert got["a"]["capped"] and got["b"]["capped"]
        assert math.isclose(got["a"]["alloc"], 160.0)  # 40 x 4 epochs
        # the big groups split the rest EQUALLY (the UniMax fairness)
        assert not got["c"]["capped"] and not got["d"]["capped"]
        assert math.isclose(got["c"]["alloc"], got["d"]["alloc"])
        # total spend is the budget
        assert math.isclose(
            sum(r["alloc"] for r in got.values()), budget
        )
        assert math.isclose(
            sum(r["p_alloc"] for r in got.values()), 1.0
        )

    def test_budget_exceeds_supply_all_capped(self, spark):
        import math

        from pandas_weights_spark.sample import unimax_rates

        df = self._frame(spark)
        got = {
            r["group"]: r
            for r in unimax_rates(
                df, "g", 1e9, weight=F.col("tok"), max_epochs=2.0
            ).collect()
        }
        assert all(r["capped"] for r in got.values())
        # everything allocates its full 2-epoch supply; leftover unspent
        assert math.isclose(
            sum(r["alloc"] for r in got.values()),
            2.0 * (40 + 120 + 3000 + 5000),
        )

    def test_composes_with_mixture_materialize(self, spark):
        from pandas_weights_spark.sample import (
            mixture_materialize,
            unimax_rates,
        )

        # deterministic per-row ids, NOT monotonically_increasing_id:
        # that id encodes the partition layout, so the Bernoulli
        # fractional-epoch draws (keyed on id) — and therefore the
        # realized masses this test tolerances — would change with
        # the session's parallelism (r16: it did). Tied rows are
        # byte-identical, so each group's ID SET is deterministic
        # under this order whatever the tie order. The frame is the
        # class fixture's masses at 10× finer row granularity so the
        # Bernoulli noise (σ ∝ per-row mass) sits well inside the
        # 0.35·target tolerance instead of at ~1σ of it.
        from pyspark.sql import Window

        rows = (
            [("a", 1.0)] * 40        # mass 40
            + [("b", 3.0)] * 40      # mass 120
            + [("c", 10.0)] * 300    # mass 3000
            + [("d", 10.0)] * 500    # mass 5000
        )
        df = spark.createDataFrame(
            rows, "g string, tok double"
        ).withColumn(
            "id", F.row_number().over(Window.orderBy("g", "tok"))
        )
        rates = unimax_rates(
            df, "g", 2000.0, weight=F.col("tok"), max_epochs=4.0
        ).collect()
        targets = {r["group"]: r["alloc"] for r in rates}
        out = mixture_materialize(
            df, "g", targets, ["id"], weight=F.col("tok"),
            max_repeat=8.0,
        )
        got_mass = {
            r["g"]: r["m"]
            for r in out.groupBy("g")
            .agg(F.sum("tok").alias("m"))
            .collect()
        }
        # realized masses land near targets (Bernoulli fractional
        # epochs; exact when the repeat factor is integral)
        for g, t in targets.items():
            assert abs(got_mass[g] - t) <= max(0.35 * t, 120.0), (
                g, got_mass[g], t,
            )

    def test_validation(self, spark):
        from pandas_weights_spark.sample import unimax_rates

        df = self._frame(spark)
        with pytest.raises(ValueError, match="budget"):
            unimax_rates(df, "g", 0.0)
        with pytest.raises(ValueError, match="max_epochs"):
            unimax_rates(df, "g", 10.0, max_epochs=0.0)
