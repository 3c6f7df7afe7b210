"""t-digest quantile sketch (functions/tdigest.py): rank-error bound
vs exact weighted quantiles, mergeability, mass-exclusion rules, size
bound."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.tdigest import (
    merge_digests,
    tdigest_aggregate,
    tdigest_quantiles,
)


def _rank_error(values, weights, estimate, q):
    """|F(estimate) - q| under the weighted empirical CDF."""
    order = np.argsort(values)
    v, w = np.asarray(values)[order], np.asarray(weights)[order]
    total = w.sum()
    cdf_at = w[v <= estimate].sum() / total
    cdf_before = w[v < estimate].sum() / total
    # estimate may fall between jumps; distance to the nearest attained
    # cdf level on either side of it
    if cdf_before <= q <= cdf_at:
        return 0.0
    return min(abs(cdf_at - q), abs(cdf_before - q))


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(17)
    vals = np.exp(rng.normal(0, 2, 20_000))  # heavy-tailed lognormal
    ws = rng.integers(1, 5, 20_000).astype(float)
    df = spark.createDataFrame(
        [(float(v), float(w)) for v, w in zip(vals, ws)],
        "v double, w double",
    ).repartition(8)
    return df, vals, ws


class TestTDigest:
    def test_rank_error_bound(self, spark, skewed):
        df, vals, ws = skewed
        d = tdigest_aggregate(df, "v", "w", delta=200)
        qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        out = {r["q"]: r["value"] for r in tdigest_quantiles(d, qs).collect()}
        for q in qs:
            err = _rank_error(vals, ws, out[q], q)
            # k1 rank error is O(sqrt(q(1-q))/delta); allow 4x slack
            # for the two-level merge
            assert err <= max(
                4.0 * np.sqrt(q * (1 - q)) / 200, 0.002
            ), (q, err)

    def test_extremes_clamped_to_min_max(self, spark, skewed):
        df, vals, ws = skewed
        d = tdigest_aggregate(df, "v", "w", delta=100)
        row = d.collect()[0]
        out = {r["q"]: r["value"]
               for r in tdigest_quantiles(d, [0.0, 1.0]).collect()}
        assert row["td_min"] == pytest.approx(vals.min())
        assert row["td_max"] == pytest.approx(vals.max())
        assert out[1.0] == pytest.approx(vals.max())
        assert out[0.0] >= vals.min() - 1e-12

    def test_size_bounded(self, spark, skewed):
        df, _, _ = skewed
        d = tdigest_aggregate(df, "v", "w", delta=100).collect()[0]
        # the k1 scale function caps centroid count at O(delta)
        assert len(d["td_means"]) <= int(1.5 * 100)
        assert sum(d["td_weights"]) == pytest.approx(d["td_total"])

    def test_grouped(self, spark):
        rng = np.random.default_rng(3)
        rows = [
            (int(i % 3), float(rng.normal(i % 3, 1.0)), 1.0)
            for i in range(6000)
        ]
        df = spark.createDataFrame(rows, "g int, v double, w double")
        d = tdigest_aggregate(df, "v", "w", by=["g"], delta=150)
        med = {
            r["g"]: r["value"]
            for r in tdigest_quantiles(d, [0.5], by=["g"]).collect()
        }
        for g in (0, 1, 2):
            vals = [v for gg, v, _ in rows if gg == g]
            assert med[g] == pytest.approx(np.median(vals), abs=0.1)

    def test_merge_matches_whole(self, spark):
        rng = np.random.default_rng(9)
        a = [(float(v), 1.0) for v in rng.normal(0, 1, 5000)]
        b = [(float(v), 1.0) for v in rng.normal(3, 1, 5000)]
        schema = "v double, w double"
        da = tdigest_aggregate(spark.createDataFrame(a, schema), "v", "w")
        db = tdigest_aggregate(spark.createDataFrame(b, schema), "v", "w")
        merged = merge_digests(da.unionByName(db))
        whole = tdigest_aggregate(
            spark.createDataFrame(a + b, schema), "v", "w"
        )
        qm = {r["q"]: r["value"]
              for r in tdigest_quantiles(merged, [0.25, 0.5, 0.75]).collect()}
        qw = {r["q"]: r["value"]
              for r in tdigest_quantiles(whole, [0.25, 0.5, 0.75]).collect()}
        allv = np.array([v for v, _ in a + b])
        for q in (0.25, 0.5, 0.75):
            exact = np.quantile(allv, q)
            assert qm[q] == pytest.approx(exact, abs=0.08)
            assert qw[q] == pytest.approx(exact, abs=0.08)

    def test_mass_rules(self, spark):
        # NULL value / NULL weight / w<=0 carry no mass
        df = spark.createDataFrame(
            [(1.0, 1.0), (None, 5.0), (2.0, None), (3.0, 0.0), (9.0, 1.0)],
            "v double, w double",
        )
        d = tdigest_aggregate(df, "v", "w").collect()
        assert len(d) == 1
        assert d[0]["td_total"] == 2.0
        assert d[0]["td_min"] == 1.0 and d[0]["td_max"] == 9.0

    def test_all_excluded_group_emits_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, None, 1.0), (2, 5.0, 1.0)], "g int, v double, w double"
        )
        d = tdigest_aggregate(df, "v", "w", by=["g"])
        assert [r["g"] for r in d.collect()] == [2]

    def test_bad_delta_raises(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "v double, w double")
        with pytest.raises(ValueError, match="delta"):
            tdigest_aggregate(df, "v", "w", delta=2)

    def test_bad_q_raises(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "v double, w double")
        d = tdigest_aggregate(df, "v", "w")
        with pytest.raises(ValueError, match="quantile"):
            tdigest_quantiles(d, [1.5]).collect()
