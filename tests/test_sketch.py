"""Weighted count-min sketch: one-sided estimate guarantees, merge
property, and heavy-hitter screening vs exact ground truth."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.sketch import (
    cms_lookup,
    weighted_cms,
    weighted_heavy_hitters,
)


def _pdf(seed=0, n=4000, n_keys=300):
    rng = np.random.default_rng(seed)
    # zipf-ish: a few keys carry most of the mass
    keys = rng.zipf(1.5, n) % n_keys
    return pd.DataFrame(
        {
            "k": [f"key_{v}" for v in keys],
            "w": rng.uniform(0.5, 2.0, n),
        }
    )


class TestCms:
    def test_one_sided_and_bounded(self, spark):
        pdf = _pdf()
        sdf = spark.createDataFrame(pdf)
        depth, width = 5, 1024
        sketch = weighted_cms(sdf, "k", "w", depth=depth, width=width)
        truth = pdf.groupby("k")["w"].sum()
        values = spark.createDataFrame(
            pd.DataFrame({"k": truth.index})
        )
        est = {
            r["k"]: r["est_mass"]
            for r in cms_lookup(
                sketch, values, "k", depth=depth, width=width
            ).collect()
        }
        total = pdf["w"].sum()
        eps = np.e / width
        over = 0
        for kk, true_mass in truth.items():
            assert est[kk] >= true_mass - 1e-9, kk  # never underestimates
            if est[kk] > true_mass + eps * total:
                over += 1
        # the eps*total bound holds per-key with prob 1-delta; allow a
        # tiny failure budget
        assert over <= max(3, 0.02 * len(truth))

    def test_sketch_rows_bounded(self, spark):
        sdf = spark.createDataFrame(_pdf(n=1000))
        sk = weighted_cms(sdf, "k", "w", depth=3, width=64)
        assert sk.count() <= 3 * 64

    def test_mergeable(self, spark):
        pdf = _pdf(seed=5)
        a, b = pdf.iloc[:2000], pdf.iloc[2000:]
        sa = weighted_cms(spark.createDataFrame(a), "k", "w", 3, 256)
        sb = weighted_cms(spark.createDataFrame(b), "k", "w", 3, 256)
        merged = (
            sa.unionByName(sb)
            .groupBy("row", "bucket")
            .agg(F.sum("mass").alias("mass"))
        )
        direct = weighted_cms(spark.createDataFrame(pdf), "k", "w", 3, 256)
        m = {(r["row"], r["bucket"]): r["mass"] for r in merged.collect()}
        d = {(r["row"], r["bucket"]): r["mass"] for r in direct.collect()}
        assert set(m) == set(d)
        for kk in d:
            assert abs(m[kk] - d[kk]) < 1e-6

    def test_unknown_key_estimates_small(self, spark):
        pdf = _pdf()
        sdf = spark.createDataFrame(pdf)
        sketch = weighted_cms(sdf, "k", "w", depth=5, width=2048)
        values = spark.createDataFrame(pd.DataFrame({"k": ["nope"]}))
        est = cms_lookup(sketch, values, "k", depth=5, width=2048).first()
        # collisions only: bounded by eps * total whp
        assert est["est_mass"] <= np.e / 2048 * pdf["w"].sum() * 3


class TestPortableHash:
    def test_bucket_matches_python_md5(self, spark):
        # portable_hash=True buckets must be reproducible by ANY engine
        # with md5(): first 15 hex digits as base-16 int, mod width —
        # verified here against Python's hashlib
        import hashlib

        pdf = _pdf(n=200, n_keys=50)
        sdf = spark.createDataFrame(pdf)
        depth, width, seed = 3, 128, 42
        sk = weighted_cms(
            sdf, "k", "w", depth=depth, width=width, seed=seed,
            portable_hash=True,
        )
        got = {(r["row"], r["bucket"]): r["mass"] for r in sk.collect()}
        exp: dict = {}
        for kk, ww in zip(pdf["k"], pdf["w"]):
            for r in range(depth):
                h = hashlib.md5(f"{kk}:{seed + r}".encode()).hexdigest()
                b = int(h[:15], 16) % width
                exp[(r, b)] = exp.get((r, b), 0.0) + float(ww)
        assert set(got) == set(exp)
        for cell in exp:
            assert abs(got[cell] - exp[cell]) < 1e-9

    def test_portable_estimates_one_sided(self, spark):
        pdf = _pdf(seed=11)
        sdf = spark.createDataFrame(pdf)
        truth = pdf.groupby("k")["w"].sum()
        sk = weighted_cms(sdf, "k", "w", 5, 1024, portable_hash=True)
        values = spark.createDataFrame(pd.DataFrame({"k": truth.index}))
        est = {
            r["k"]: r["est_mass"]
            for r in cms_lookup(
                sk, values, "k", 5, 1024, portable_hash=True
            ).collect()
        }
        for kk, true_mass in truth.items():
            assert est[kk] >= true_mass - 1e-9


class TestHeavyHitters:
    def test_finds_true_heavy_hitters(self, spark):
        pdf = _pdf(seed=7)
        sdf = spark.createDataFrame(pdf).repartition(8)
        total = pdf["w"].sum()
        truth = pdf.groupby("k")["w"].sum()
        true_heavy = set(truth[truth / total >= 0.02].index)
        got = weighted_heavy_hitters(
            sdf, "k", "w", threshold_frac=0.02,
            candidates_per_partition=64,
        )
        got_keys = {r["k"] for r in got.collect()}
        # one-sided: every true heavy hitter must be present
        assert true_heavy <= got_keys
        # and the estimate can't be below truth
        for r in got.collect():
            assert r["est_mass"] >= truth.get(r["k"], 0.0) - 1e-9

    def test_two_scans_total_read_from_sketch(self, spark):
        # the grand total comes from the persisted sketch's hash-row 0
        # (every hash row partitions the full mass), NOT a third pass
        # over the input: the final plan reads the input exactly once
        # (the candidate mapInPandas pass) plus the cached sketch
        from pandas_weights_spark import plans as P

        sdf = spark.createDataFrame(_pdf(n=1000)).repartition(4)
        got = weighted_heavy_hitters(
            sdf, "k", "w", threshold_frac=0.02, candidates_per_partition=64
        )
        plan = P.physical_plan(got)
        # the InMemoryRelation subtree is the already-materialized sketch
        # build (its scan already ran, when the total was read) — live
        # scans are only those above the cache boundary
        live = plan.split("InMemoryRelation")[0]
        input_scans = live.count("Scan ExistingRDD") + live.count(
            "LocalTableScan"
        )
        assert input_scans == 1, plan
        assert "InMemoryTableScan" in live, plan

    def test_candidate_budget_validated(self, spark):
        sdf = spark.createDataFrame(_pdf(n=100))
        with pytest.raises(ValueError, match="candidates_per_partition"):
            weighted_heavy_hitters(
                sdf, "k", "w", threshold_frac=0.01,
                candidates_per_partition=10,
            )
