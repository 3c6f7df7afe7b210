"""Weighted ANOVA / entropy / mutual information (inference.py) and
Gini / two-sample KS (quantile.py banded machinery) vs transparent
numpy references on frequency-replicated data."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import wt
from pandas_weights_spark.inference import (
    weighted_anova,
    weighted_entropy,
    weighted_mutual_information,
)
from pandas_weights_spark.quantile import weighted_gini, weighted_ks


@pytest.fixture(scope="module")
def rows():
    rng = np.random.default_rng(7)
    out = []
    for i in range(300):
        g = "abc"[i % 3]
        c = "uv"[i % 2]
        v = float(rng.normal(ord(g) % 5, 1.5))
        w = int(rng.integers(1, 5))
        out.append((g, c, v, w))
    return out


@pytest.fixture(scope="module")
def df(spark, rows):
    return spark.createDataFrame(rows, "grp string, cat string, v double, w int")


class TestAnova:
    def test_matches_expanded_f(self, df, rows):
        out = weighted_anova(wt(df, "w"), "v", "grp").collect()[0]
        expanded = {}
        for g, c, v, w in rows:
            expanded.setdefault(g, []).extend([v] * w)
        allv = [v for vs in expanded.values() for v in vs]
        gm = np.mean(allv)
        ssb = sum(len(vs) * (np.mean(vs) - gm) ** 2 for vs in expanded.values())
        ssw = sum(((np.array(vs) - np.mean(vs)) ** 2).sum()
                  for vs in expanded.values())
        k, n = len(expanded), len(allv)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert out["f_stat"] == pytest.approx(f, rel=1e-9)
        assert out["df_between"] == k - 1
        assert out["df_within"] == n - k
        assert out["n"] == n and out["k"] == k

    def test_single_level_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 1), ("a", 2.0, 2)], "grp string, v double, w int"
        )
        out = weighted_anova(wt(df, "w"), "v", "grp").collect()[0]
        assert out["f_stat"] is None

    def test_null_values_masked(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 1), ("a", None, 9), ("b", 2.0, 1), ("b", 3.0, 1)],
            "grp string, v double, w int",
        )
        out = weighted_anova(wt(df, "w"), "v", "grp").collect()[0]
        assert out["n"] == 3.0  # the NULL-value mass contributes nothing


class TestEntropy:
    def test_matches_numpy(self, df, rows):
        out = weighted_entropy(wt(df, "w"), "grp").collect()[0]
        mass = {}
        for g, c, v, w in rows:
            mass[g] = mass.get(g, 0) + w
        W = sum(mass.values())
        p = np.array([m / W for m in mass.values()])
        h = float(-(p * np.log(p)).sum())
        assert out["entropy"] == pytest.approx(h, rel=1e-12)
        assert out["n_categories"] == len(mass)
        assert out["n"] == W

    def test_base2(self, df, rows):
        nats = weighted_entropy(wt(df, "w"), "grp").collect()[0]["entropy"]
        bits = weighted_entropy(wt(df, "w"), "grp", base=2).collect()[0][
            "entropy"
        ]
        assert bits == pytest.approx(nats / math.log(2), rel=1e-12)

    def test_uniform_is_log_k(self, spark):
        df = spark.createDataFrame(
            [("a", 2), ("b", 2), ("c", 2)], "cat string, w int"
        )
        out = weighted_entropy(wt(df, "w"), "cat").collect()[0]
        assert out["entropy"] == pytest.approx(math.log(3), rel=1e-12)

    def test_by_groups(self, df, rows):
        outs = {
            r["cat"]: r["entropy"]
            for r in weighted_entropy(wt(df, "w"), "grp", by=["cat"]).collect()
        }
        for cat in ("u", "v"):
            mass = {}
            for g, c, v, w in rows:
                if c == cat:
                    mass[g] = mass.get(g, 0) + w
            W = sum(mass.values())
            p = np.array([m / W for m in mass.values()])
            assert outs[cat] == pytest.approx(float(-(p * np.log(p)).sum()))


class TestMutualInformation:
    def test_matches_numpy(self, df, rows):
        out = weighted_mutual_information(wt(df, "w"), "grp", "cat").collect()[0]
        joint = {}
        for g, c, v, w in rows:
            joint[(g, c)] = joint.get((g, c), 0) + w
        W = sum(joint.values())
        pj = {k: m / W for k, m in joint.items()}
        px, py = {}, {}
        for (g, c), p in pj.items():
            px[g] = px.get(g, 0) + p
            py[c] = py.get(c, 0) + p
        mi = sum(p * math.log(p / (px[g] * py[c]))
                 for (g, c), p in pj.items())
        hx = -sum(p * math.log(p) for p in px.values())
        hy = -sum(p * math.log(p) for p in py.values())
        assert out["mi"] == pytest.approx(mi, rel=1e-9, abs=1e-12)
        assert out["h_x"] == pytest.approx(hx, rel=1e-12)
        assert out["h_y"] == pytest.approx(hy, rel=1e-12)
        assert out["nmi"] == pytest.approx(mi / math.sqrt(hx * hy),
                                           rel=1e-9, abs=1e-12)
        assert out["n"] == W

    def test_independent_is_zero(self, spark):
        # product-form masses => MI exactly 0 up to float
        rows = [(g, c, wg * wc)
                for g, wg in [("a", 1), ("b", 3)]
                for c, wc in [("u", 2), ("v", 5)]]
        df = spark.createDataFrame(rows, "g string, c string, w int")
        out = weighted_mutual_information(wt(df, "w"), "g", "c").collect()[0]
        assert out["mi"] == pytest.approx(0.0, abs=1e-12)

    def test_one_scan_plan(self, df):
        out = weighted_mutual_information(wt(df, "w"), "grp", "cat")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ") <= 1, plan


class TestInfoPanel:
    def test_matches_standalone_kernels(self, df):
        from pandas_weights_spark.inference import weighted_info_panel

        got = {
            r["t"]: r["v"]
            for r in weighted_info_panel(
                wt(df, "w"), "v", "grp", "cat", "a", "b"
            ).collect()
        }
        assert set(got) == {"anova", "entropy", "mi", "gini", "ks"}
        w = wt(df, "w")
        exp = {
            "anova": weighted_anova(w, "v", "grp").collect()[0]["f_stat"],
            "entropy": weighted_entropy(w, "grp").collect()[0]["entropy"],
            "mi": weighted_mutual_information(w, "grp", "cat").collect()[0][
                "mi"
            ],
            "gini": weighted_gini(w, "v").collect()[0]["gini"],
            "ks": weighted_ks(w, "v", "grp", "a", "b").collect()[0][
                "ks_stat"
            ],
        }
        for t, v in exp.items():
            assert got[t] == pytest.approx(v, rel=1e-9), t

    def test_scan_count_below_naive_union(self, df, spark):
        # two pass FAMILIES: one grouping-sets scan (anova+entropy+mi,
        # which now also donates the value range) + one banded-cums
        # spine (gini+ks) embedding the raw relation 3x (band totals,
        # main frame, offset join-back) — the min/max probe rides a
        # ReusedExchange of the grouping-sets pass (r6, VERDICT r5
        # item 6): 4 raw-relation reads total, down from r5's 5 and
        # the naive union's 11. Exchange reuse resolves at PLANNING
        # only with AQE off (with AQE on it happens at runtime and the
        # adaptive plan string re-prints stage subtrees), so pin the
        # structural count on the non-adaptive plan.
        from pandas_weights_spark.inference import weighted_info_panel

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            out = weighted_info_panel(
                wt(df, "w"), "v", "grp", "cat", "a", "b"
            )
            plan = out._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        n_scans = plan.count("Scan ExistingRDD") + plan.count("Scan parquet")
        assert n_scans <= 4, plan
        assert "ReusedExchange" in plan, plan


def _gini_ref(xs, ws):
    xs, ws = np.asarray(xs, float), np.asarray(ws, float)
    num = sum(wi * wj * abs(xi - xj)
              for xi, wi in zip(xs, ws) for xj, wj in zip(xs, ws))
    W, S = ws.sum(), (ws * xs).sum()
    return num / (2 * W * S)


class TestGini:
    def test_matches_pairwise_reference(self, df, rows):
        out = weighted_gini(wt(df, "w"), "v").collect()[0]
        # shift values positive so the reference denominator is sane
        xs = [v for g, c, v, w in rows]
        ws = [w for g, c, v, w in rows]
        if min(xs) < 0:
            df2 = df.select("grp", (F.col("v") - min(xs) + 1.0).alias("v"), "w")
            out = weighted_gini(wt(df2, "w"), "v").collect()[0]
            xs = [x - min(xs) + 1.0 for x in xs]
        assert out["gini"] == pytest.approx(_gini_ref(xs, ws), rel=1e-9)

    def test_equal_values_zero(self, spark):
        df = spark.createDataFrame([(5.0, 2), (5.0, 3)], "v double, w int")
        out = weighted_gini(wt(df, "w"), "v").collect()[0]
        assert out["gini"] == pytest.approx(0.0, abs=1e-12)

    def test_grouped(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 1), ("a", 3.0, 1), ("b", 2.0, 2), ("b", 2.0, 1)],
            "g string, v double, w int",
        )
        outs = {r["g"]: r["gini"]
                for r in weighted_gini(wt(df, "w"), "v", keys=["g"]).collect()}
        assert outs["a"] == pytest.approx(_gini_ref([1.0, 3.0], [1, 1]))
        assert outs["b"] == pytest.approx(0.0, abs=1e-12)

    def test_no_full_group_window(self, df):
        out = weighted_gini(wt(df, "w"), "v", keys=["grp"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs
        for s in specs:
            assert "__band__" in s, s  # banded, never whole-group


def _ks_ref(a_vals, a_w, b_vals, b_w):
    pts = sorted(set(a_vals) | set(b_vals))
    Wa, Wb = sum(a_w), sum(b_w)
    best = 0.0
    for t in pts:
        fa = sum(w for v, w in zip(a_vals, a_w) if v <= t) / Wa
        fb = sum(w for v, w in zip(b_vals, b_w) if v <= t) / Wb
        best = max(best, abs(fa - fb))
    return best


class TestKS:
    def test_matches_reference(self, df, rows):
        out = weighted_ks(wt(df, "w"), "v", "grp", "a", "b").collect()[0]
        a = [(v, w) for g, c, v, w in rows if g == "a"]
        b = [(v, w) for g, c, v, w in rows if g == "b"]
        exp = _ks_ref([v for v, w in a], [w for v, w in a],
                      [v for v, w in b], [w for v, w in b])
        assert out["ks_stat"] == pytest.approx(exp, rel=1e-9)
        assert out["n_a"] == sum(w for v, w in a)
        assert out["n_b"] == sum(w for v, w in b)

    def test_identical_samples_zero(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 1), ("a", 2.0, 2), ("b", 1.0, 2), ("b", 2.0, 4)],
            "g string, v double, w int",
        )
        out = weighted_ks(wt(df, "w"), "v", "g", "a", "b").collect()[0]
        assert out["ks_stat"] == pytest.approx(0.0, abs=1e-12)

    def test_disjoint_samples_one(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 1), ("a", 2.0, 1), ("b", 10.0, 1), ("b", 11.0, 1)],
            "g string, v double, w int",
        )
        out = weighted_ks(wt(df, "w"), "v", "g", "a", "b").collect()[0]
        assert out["ks_stat"] == pytest.approx(1.0)

    def test_missing_side_null(self, spark):
        df = spark.createDataFrame([("a", 1.0, 1)], "g string, v double, w int")
        out = weighted_ks(wt(df, "w"), "v", "g", "a", "b").collect()[0]
        assert out["ks_stat"] is None


def _mwu_ref(a, aw, b, bw):
    u = 0.0
    for xa, wa in zip(a, aw):
        for xb, wb in zip(b, bw):
            if xa > xb:
                u += wa * wb
            elif xa == xb:
                u += wa * wb / 2.0
    return u


class TestMannWhitney:
    def test_matches_pairwise_reference(self, df, rows):
        from pandas_weights_spark.quantile import weighted_mannwhitney

        out = weighted_mannwhitney(
            wt(df, "w"), "v", "grp", "a", "b"
        ).collect()[0]
        a = [(v, w) for g, c, v, w in rows if g == "a"]
        b = [(v, w) for g, c, v, w in rows if g == "b"]
        exp = _mwu_ref([v for v, w in a], [w for v, w in a],
                       [v for v, w in b], [w for v, w in b])
        assert out["u_stat"] == pytest.approx(exp, rel=1e-9)
        na, nb = sum(w for _, w in a), sum(w for _, w in b)
        mu = na * nb / 2
        sg = math.sqrt(na * nb * (na + nb + 1) / 12)
        assert out["z_stat"] == pytest.approx((exp - mu) / sg, rel=1e-9)

    def test_matches_scipy_convention_on_replication(self, spark):
        # frequency weights == replication: compare against the
        # pairwise count on expanded data
        import numpy as np

        rng = np.random.default_rng(3)
        rows = [("ab"[i % 2], float(rng.normal(i % 2, 1)), int(rng.integers(1, 4)))
                for i in range(60)]
        df = spark.createDataFrame(rows, "g string, v double, w int")
        from pandas_weights_spark.quantile import weighted_mannwhitney

        out = weighted_mannwhitney(wt(df, "w"), "v", "g", "a", "b").collect()[0]
        a = [v for g, v, w in rows if g == "a" for _ in range(w)]
        b = [v for g, v, w in rows if g == "b" for _ in range(w)]
        exp = _mwu_ref(a, [1] * len(a), b, [1] * len(b))
        assert out["u_stat"] == pytest.approx(exp, rel=1e-9)

    def test_ties_half_credit(self, spark):
        from pandas_weights_spark.quantile import weighted_mannwhitney

        df = spark.createDataFrame(
            [("a", 1.0, 2.0), ("b", 1.0, 3.0)], "g string, v double, w double"
        )
        out = weighted_mannwhitney(wt(df, "w"), "v", "g", "a", "b").collect()[0]
        assert out["u_stat"] == pytest.approx(3.0)  # 2*3/2

    def test_empty_side_null(self, spark):
        from pandas_weights_spark.quantile import weighted_mannwhitney

        df = spark.createDataFrame([("a", 1.0, 1.0)], "g string, v double, w double")
        out = weighted_mannwhitney(wt(df, "w"), "v", "g", "a", "b").collect()[0]
        assert out["u_stat"] is None and out["z_stat"] is None

    def test_banded_plan(self, df):
        from pandas_weights_spark.quantile import weighted_mannwhitney

        out = weighted_mannwhitney(wt(df, "w"), "v", "grp", "a", "b",
                                   keys=["cat"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re
        for s in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "__band__" in s, s
