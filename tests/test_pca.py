"""PCA over embedding columns (functions/pca.py) vs numpy on the
collected data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.pca import (
    pca_fit,
    pca_transform,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(23)
    # anisotropic cloud: variance concentrated along a few axes
    base = rng.normal(size=(300, 3)) @ rng.normal(size=(3, 8))
    noise = rng.normal(scale=0.05, size=(300, 8))
    x = base + noise + rng.normal(size=8)  # non-zero mean
    rows = [(i, [float(v) for v in x[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, x


class TestPCAFit:
    def test_moments_exact(self, vecs):
        from pandas_weights_spark.functions.pca import _embedding_moments

        df, x = vecs
        n, s, g = _embedding_moments(df, "embedding")
        assert n == 300
        np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-12)
        np.testing.assert_allclose(g, x.T @ x, rtol=1e-12)

    def test_two_level_merge_bounds_driver_ingest(self, spark):
        # VERDICT r5 item 4: at d=512 across 64 partitions the driver
        # must collect <= _MERGE_PARTITIONS tree-merged rows, not one
        # per partition — and the moments stay exact
        from pandas_weights_spark.functions.pca import (
            _MERGE_PARTITIONS,
            _embedding_moments,
            _moment_rows,
        )

        rng = np.random.default_rng(41)
        d, rows_n = 512, 256
        x = rng.normal(size=(rows_n, d))
        rows = [(i, [float(v) for v in x[i]]) for i in range(rows_n)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(64)
        collected = _moment_rows(df, "embedding")
        assert len(collected) <= _MERGE_PARTITIONS
        n, s, g = _embedding_moments(df, "embedding")
        assert n == rows_n
        np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-9)
        np.testing.assert_allclose(g, x.T @ x, rtol=1e-9)

    def test_single_level_below_threshold(self, vecs):
        # few partitions: no merge round — one partial row per
        # non-empty partition reaches the driver unchanged
        from pandas_weights_spark.functions.pca import _moment_rows

        df, _ = vecs
        collected = _moment_rows(df, "embedding")
        assert 1 <= len(collected) <= df.rdd.getNumPartitions()

    def test_matches_numpy_eigh(self, vecs):
        df, x = vecs
        m = pca_fit(df, "embedding", k=4)
        cov = np.cov(x, rowvar=False, ddof=1)
        vals, vecs_np = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][:4]
        np.testing.assert_allclose(
            m.explained_variance, vals[order], rtol=1e-9
        )
        for i, o in enumerate(order):
            v = vecs_np[:, o]
            j = int(np.argmax(np.abs(v)))
            if v[j] < 0:
                v = -v
            np.testing.assert_allclose(m.components[i], v, atol=1e-9)
        np.testing.assert_allclose(m.mean, x.mean(axis=0), rtol=1e-12)

    def test_variance_descending(self, vecs):
        df, _ = vecs
        m = pca_fit(df, "embedding")
        ev = m.explained_variance
        assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))
        assert m.k == m.d == 8

    def test_deterministic(self, vecs):
        df, _ = vecs
        a = pca_fit(df, "embedding", k=3)
        b = pca_fit(df, "embedding", k=3)
        assert a == b

    def test_guards(self, vecs, spark):
        df, _ = vecs
        with pytest.raises(ValueError, match="k must be"):
            pca_fit(df, "embedding", k=9)
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="no non-NULL"):
            pca_fit(empty, "embedding")


class TestPCATransform:
    def test_projection_matches_numpy(self, vecs):
        df, x = vecs
        m = pca_fit(df, "embedding", k=3)
        out = {
            r["vec_id"]: np.asarray(r["pca"])
            for r in pca_transform(df, "embedding", m).collect()
        }
        W = np.asarray(m.components)
        mu = np.asarray(m.mean)
        for i in range(300):
            np.testing.assert_allclose(
                out[i], (x[i] - mu) @ W.T, rtol=1e-9, atol=1e-9
            )

    def test_top_axes_capture_variance(self, vecs):
        # the fixture is rank-3 + noise: 3 components must explain
        # nearly all variance
        df, x = vecs
        m = pca_fit(df, "embedding")
        ev = np.asarray(m.explained_variance)
        assert ev[:3].sum() / ev.sum() > 0.99

    def test_whiten_unit_variance(self, vecs):
        df, _ = vecs
        m = pca_fit(df, "embedding", k=3)
        out = np.array(
            [
                r["pca"]
                for r in pca_transform(
                    df, "embedding", m, whiten=True
                ).collect()
            ]
        )
        np.testing.assert_allclose(out.var(axis=0, ddof=1), 1.0, rtol=1e-6)

    def test_null_vector_stays_null(self, spark, vecs):
        df, _ = vecs
        m = pca_fit(df, "embedding", k=2)
        withnull = df.unionByName(
            spark.createDataFrame(
                [(999, None)], "vec_id long, embedding array<double>"
            )
        )
        out = {
            r["vec_id"]: r["pca"]
            for r in pca_transform(withnull, "embedding", m).collect()
        }
        assert out[999] is None and out[0] is not None

    def test_pipeline_into_ann(self, vecs):
        # reduced vectors still rank neighbors sensibly: the nearest
        # neighbor in PCA space of a point's noisy copy is the point
        df, x = vecs
        m = pca_fit(df, "embedding", k=3)
        proj = {
            r["vec_id"]: np.asarray(r["pca"])
            for r in pca_transform(df, "embedding", m).collect()
        }
        q = (x[7] + 0.01) - np.asarray(m.mean)
        qp = q @ np.asarray(m.components).T
        dists = {i: float(((p - qp) ** 2).sum()) for i, p in proj.items()}
        assert min(dists, key=dists.get) == 7


class TestRandomProjection:
    def test_matches_numpy_and_portable(self, spark):
        import numpy as np

        from pandas_weights_spark.functions.pca import (
            jl_projection_matrix,
            random_project,
        )

        rng = np.random.default_rng(23)
        X = rng.normal(size=(30, 24))
        rows = [(i, [float(x) for x in X[i]]) for i in range(30)]
        rows.append((99, None))
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        mat = np.asarray(jl_projection_matrix(24, 6, seed=7), float)
        ref = X @ mat.T
        for arrow in (True, False):
            got = {
                r["vec_id"]: r["rp"]
                for r in random_project(
                    df, "v", 6, seed=7, arrow=arrow
                ).collect()
            }
            assert got[99] is None
            for i in range(30):
                np.testing.assert_allclose(got[i], ref[i], rtol=1e-9)

    def test_distance_preservation(self, spark):
        # JL guarantee sanity: relative pairwise distances survive a
        # 64 -> 16 projection within a loose epsilon on average
        import itertools

        import numpy as np

        from pandas_weights_spark.functions.pca import random_project

        rng = np.random.default_rng(4)
        X = rng.normal(size=(40, 64))
        df = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(40)],
            "vec_id long, v array<double>",
        )
        got = {
            r["vec_id"]: np.asarray(r["rp"])
            for r in random_project(df, "v", 16, seed=1).collect()
        }
        ratios = []
        for i, j in itertools.combinations(range(0, 40, 5), 2):
            d0 = float(np.linalg.norm(X[i] - X[j]))
            d1 = float(np.linalg.norm(got[i] - got[j]))
            ratios.append(d1 / d0)
        mean_ratio = sum(ratios) / len(ratios)
        assert 0.75 < mean_ratio < 1.25
        assert all(0.4 < r < 1.8 for r in ratios)

    def test_guards(self, spark):
        from pandas_weights_spark.functions.pca import random_project

        ragged = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [1.0])], "vec_id long, v array<double>"
        )
        with pytest.raises(ValueError, match="ragged"):
            random_project(ragged, "v", 2)
        empty = spark.createDataFrame(
            [(0, None)], "vec_id long, v array<double>"
        )
        with pytest.raises(ValueError, match="non-null"):
            random_project(empty, "v", 2)
