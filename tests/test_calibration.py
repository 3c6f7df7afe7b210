"""Raking / post-stratification / weight diagnostics (calibration.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.calibration import (
    poststratify_weights,
    rake_weights,
    weight_diagnostics,
)


@pytest.fixture(scope="module")
def survey(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(400):
        region = "NEWS"[i % 4]
        age = ["young", "mid", "old"][int(rng.integers(0, 3))]
        rows.append((i, region, age, float(rng.uniform(0.5, 2.0))))
    return spark.createDataFrame(rows, "id long, region string, age string, w double")


def _masses(df, wcol, dim):
    return {
        r[dim]: r["m"]
        for r in df.groupBy(dim).agg(F.sum(wcol).alias("m")).collect()
    }


REGION_T = {"N": 100.0, "E": 120.0, "W": 90.0, "S": 110.0}
AGE_T = {"young": 140.0, "mid": 160.0, "old": 120.0}


class TestRake:
    def test_margins_converge(self, survey):
        out, info = rake_weights(
            survey, "w", {"region": REGION_T, "age": AGE_T},
            max_iter=50, tol=1e-10,
        )
        assert info["converged"], info
        got_r = _masses(out, "weight_cal", "region")
        got_a = _masses(out, "weight_cal", "age")
        for k, v in REGION_T.items():
            assert got_r[k] == pytest.approx(v, rel=1e-8)
        for k, v in AGE_T.items():
            assert got_a[k] == pytest.approx(v, rel=1e-8)

    def test_matches_ipfn_style_reference(self, survey):
        rows = survey.collect()
        w = np.array([r["w"] for r in rows])
        reg = [r["region"] for r in rows]
        age = [r["age"] for r in rows]
        ref = w.copy()
        for _ in range(5):
            for dim, tgt in (("region", REGION_T), ("age", AGE_T)):
                vals = reg if dim == "region" else age
                for v, t in tgt.items():
                    mask = np.array([x == v for x in vals])
                    m = ref[mask].sum()
                    ref[mask] *= t / m
        out, info = rake_weights(
            survey, "w", {"region": REGION_T, "age": AGE_T},
            max_iter=5, tol=0.0,
        )
        got = {r["id"]: r["weight_cal"] for r in out.collect()}
        for r, refw in zip(rows, ref):
            assert got[r["id"]] == pytest.approx(refw, rel=1e-9), r["id"]

    def test_factor_product_plan_no_join(self, survey):
        out, _ = rake_weights(
            survey, "w", {"region": REGION_T, "age": AGE_T}, max_iter=3,
            tol=0.0,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the application is one row-local projection: no join, no
        # exchange, no python
        assert "Join" not in plan, plan
        assert "Exchange" not in plan, plan

    def test_sequential_strategy_agrees_with_joint(self, survey):
        a, ia = rake_weights(
            survey, "w", {"region": REGION_T, "age": AGE_T},
            max_iter=4, tol=0.0, strategy="joint",
        )
        b, ib = rake_weights(
            survey, "w", {"region": REGION_T, "age": AGE_T},
            max_iter=4, tol=0.0, strategy="sequential",
        )
        ga = {r["id"]: r["weight_cal"] for r in a.collect()}
        gb = {r["id"]: r["weight_cal"] for r in b.collect()}
        for i in ga:
            assert ga[i] == pytest.approx(gb[i], rel=1e-9)
        for d in ia["factors"]:
            for v in ia["factors"][d]:
                assert ia["factors"][d][v] == pytest.approx(
                    ib["factors"][d][v], rel=1e-9
                )

    def test_joint_cell_guard(self, survey):
        with pytest.raises(ValueError, match="max_cells"):
            rake_weights(
                survey, "w", {"region": REGION_T, "age": AGE_T},
                max_cells=3,
            )

    def test_missing_margin_category_raises(self, survey):
        bad = {k: v for k, v in REGION_T.items() if k != "N"}
        with pytest.raises(ValueError, match="missing from the margin"):
            rake_weights(survey, "w", {"region": bad})

    def test_unreachable_target_raises(self, survey):
        bad = dict(REGION_T, X=5.0)
        with pytest.raises(ValueError, match="no mass"):
            rake_weights(survey, "w", {"region": bad})

    def test_null_bucket_calibrates(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), (None, 1.0), ("a", 3.0)], "g string, w double"
        )
        out, info = rake_weights(
            df, "w", {"g": {"a": 8.0, None: 5.0}}, max_iter=1, tol=0.0
        )
        m = {r["g"]: r["m"] for r in
             out.groupBy("g").agg(F.sum("weight_cal").alias("m")).collect()}
        assert m["a"] == pytest.approx(8.0)
        assert m[None] == pytest.approx(5.0)

    def test_nonpositive_base_weights_drop(self, spark):
        df = spark.createDataFrame(
            [("a", 2.0), ("a", -1.0), ("a", None)], "g string, w double"
        )
        out, _ = rake_weights(df, "w", {"g": {"a": 10.0}}, max_iter=1)
        vals = sorted(
            r["weight_cal"] for r in out.select("weight_cal").collect()
        )
        assert vals == pytest.approx([0.0, 0.0, 10.0])


class TestPoststratify:
    def test_exact_in_one_step(self, survey):
        out, info = poststratify_weights(survey, "w", "region", REGION_T)
        assert info["iterations"] == 1
        got = _masses(out, "weight_cal", "region")
        for k, v in REGION_T.items():
            assert got[k] == pytest.approx(v, rel=1e-12)


class TestDiagnostics:
    def test_kish_formula(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (1.0,), (2.0,), (4.0,)], "w double"
        )
        r = weight_diagnostics(df, "w").collect()[0]
        w = np.array([1.0, 1.0, 2.0, 4.0])
        assert r["n"] == 4
        assert r["sum_w"] == pytest.approx(w.sum())
        assert r["n_eff"] == pytest.approx(w.sum() ** 2 / (w * w).sum())
        assert r["deff"] == pytest.approx(4 / (w.sum() ** 2 / (w * w).sum()))
        assert r["cv_w"] == pytest.approx(w.std() / w.mean())
        assert (r["min_w"], r["max_w"]) == (1.0, 4.0)

    def test_uniform_weights_no_deff(self, spark):
        df = spark.createDataFrame([(2.0,)] * 6, "w double")
        r = weight_diagnostics(df, "w").collect()[0]
        assert r["n_eff"] == pytest.approx(6.0)
        assert r["deff"] == pytest.approx(1.0)
        assert r["cv_w"] == pytest.approx(0.0, abs=1e-12)

    def test_grouped(self, survey):
        rows = weight_diagnostics(survey, "w", by=["region"]).collect()
        assert len(rows) == 4
        for r in rows:
            assert r["deff"] >= 1.0 - 1e-12


class TestBootstrap:
    def test_deterministic_and_close_to_analytic(self, spark):
        import numpy as np

        from pandas_weights_spark.calibration import bootstrap_se

        rng = np.random.default_rng(5)
        rows = [(i, float(rng.normal(50, 10)), float(rng.uniform(0.5, 2)))
                for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, x double, w double")
        a = bootstrap_se(df, "w", "x", ["id"], n_replicates=100).collect()[0]
        b = bootstrap_se(df, "w", "x", ["id"], n_replicates=100).collect()[0]
        assert a == b  # deterministic draws
        xs = np.array([x for _, x, _ in rows])
        ws = np.array([w for _, _, w in rows])
        mu = (ws * xs).sum() / ws.sum()
        assert a["estimate"] == pytest.approx(mu, rel=1e-12)
        # Poisson bootstrap SE ~ sqrt(sum w^2 (x-mu)^2)/W (multiplier
        # variance 1); B=100 gives ~15% Monte-Carlo noise
        analytic = float(np.sqrt((ws ** 2 * (xs - mu) ** 2).sum()) / ws.sum())
        assert 0.6 * analytic < a["se_boot"] < 1.5 * analytic, (
            a["se_boot"], analytic,
        )

    def test_one_pass_plan(self, spark):
        from pandas_weights_spark.calibration import bootstrap_se

        df = spark.createDataFrame([(1, 2.0, 1.0)], "id long, x double, w double")
        out = bootstrap_se(df, "w", "x", ["id"], n_replicates=10)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ") <= 1, plan

    def test_seed_changes_draws(self, spark):
        from pandas_weights_spark.calibration import bootstrap_se

        df = spark.createDataFrame(
            [(i, float(i % 7), 1.0) for i in range(500)],
            "id long, x double, w double",
        )
        a = bootstrap_se(df, "w", "x", ["id"], n_replicates=20, seed=1).collect()[0]
        b = bootstrap_se(df, "w", "x", ["id"], n_replicates=20, seed=2).collect()[0]
        assert a["estimate"] == b["estimate"]
        assert a["se_boot"] != b["se_boot"]

    def test_min_replicates(self, spark):
        from pandas_weights_spark.calibration import bootstrap_se

        df = spark.createDataFrame([(1, 2.0, 1.0)], "id long, x double, w double")
        with pytest.raises(ValueError, match="n_replicates"):
            bootstrap_se(df, "w", "x", ["id"], n_replicates=1)


class TestTrimWeights:
    @pytest.fixture(scope="class")
    def skew_w(self, spark):
        # 99 unit weights + one extreme weight of 100
        rows = [(i, 1.0) for i in range(99)] + [(99, 100.0)]
        return spark.createDataFrame(rows, "id long, w double")

    def test_caps_and_redistributes(self, skew_w):
        from pandas_weights_spark.calibration import trim_weights

        out = trim_weights(skew_w, "w", upper_q=0.99, rescale=True)
        rows = {r["id"]: r["weight_trimmed"] for r in out.collect()}
        # the p99 bound of the weight distribution (unit mass,
        # inverted CDF) is 1.0: the extreme weight caps to 1 and the
        # total mass (199) redistributes over 100 unit-ish weights
        assert rows[99] == pytest.approx(rows[0])
        total = sum(rows.values())
        assert total == pytest.approx(199.0, rel=1e-9)

    def test_no_rescale_keeps_cap(self, skew_w):
        from pandas_weights_spark.calibration import trim_weights

        out = trim_weights(skew_w, "w", upper_q=0.99, rescale=False)
        rows = {r["id"]: r["weight_trimmed"] for r in out.collect()}
        assert rows[99] == pytest.approx(1.0)
        assert rows[0] == pytest.approx(1.0)

    def test_diagnostics_improve(self, skew_w):
        from pandas_weights_spark.calibration import (
            trim_weights,
            weight_diagnostics,
        )

        before = weight_diagnostics(
            skew_w.withColumnRenamed("w", "weight_cal"), "weight_cal"
        ).collect()[0]
        trimmed = trim_weights(skew_w, "w", upper_q=0.99)
        after = weight_diagnostics(trimmed, "weight_trimmed").collect()[0]
        # trimming must recover effective sample size
        assert after["n_eff"] > before["n_eff"] * 2
        assert after["sum_w"] == pytest.approx(before["sum_w"], rel=1e-9)

    def test_nonpositive_weights_pass_through(self, spark):
        from pandas_weights_spark.calibration import trim_weights

        df = spark.createDataFrame(
            [(0, 1.0), (1, 5.0), (2, -2.0), (3, None)],
            "id long, w double",
        )
        rows = {
            r["id"]: r["weight_trimmed"]
            for r in trim_weights(df, "w", upper_q=0.5).collect()
        }
        assert rows[2] == -2.0 and rows[3] is None

    def test_binned_close_to_exact(self, spark):
        import numpy as np

        from pandas_weights_spark.calibration import trim_weights

        rng = np.random.default_rng(8)
        ws = np.abs(rng.lognormal(0, 1, 300)) + 0.1
        df = spark.createDataFrame(
            [(i, float(w)) for i, w in enumerate(ws)], "id long, w double"
        )
        ex = {
            r["id"]: r["weight_trimmed"]
            for r in trim_weights(df, "w", upper_q=0.9).collect()
        }
        bn = {
            r["id"]: r["weight_trimmed"]
            for r in trim_weights(
                df, "w", upper_q=0.9, exact=False,
                lo=0.0, hi=float(ws.max()) + 1.0, bins=8192,
            ).collect()
        }
        diffs = [abs(ex[i] - bn[i]) for i in ex]
        assert max(diffs) < 0.05
