"""Product quantization (functions/pq.py) vs transparent numpy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.pq import (
    pq_encode,
    topk_pq_adc,
    train_pq_codebooks,
)

M, K, D = 4, 3, 16  # 4 subspaces x 3 cells over 16 dims


def _ref_train(X, m, k, iters):
    dsub = X.shape[1] // m
    cbs = [X[:k, s * dsub:(s + 1) * dsub].copy() for s in range(m)]
    for _ in range(iters):
        for s in range(m):
            xs = X[:, s * dsub:(s + 1) * dsub]
            d = ((xs[:, None, :] - cbs[s][None, :, :]) ** 2).sum(-1)
            idx = np.argmin(d, axis=1)
            for c in range(k):
                if (idx == c).any():
                    cbs[s][c] = xs[idx == c].mean(axis=0)
    return cbs


def _ref_encode(X, cbs):
    m = len(cbs)
    dsub = X.shape[1] // m
    out = np.empty((X.shape[0], m), dtype=int)
    for s in range(m):
        xs = X[:, s * dsub:(s + 1) * dsub]
        d = ((xs[:, None, :] - np.asarray(cbs[s])[None, :, :]) ** 2).sum(-1)
        out[:, s] = np.argmin(d, axis=1)
    return out


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(17)
    X = rng.normal(size=(60, D))
    rows = [(i, [float(x) for x in X[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return X, df


class TestTrain:
    def test_matches_numpy(self, spark, data):
        X, df = data
        got = train_pq_codebooks(df, "embedding", "vec_id", m=M, k=K,
                                 iters=2)
        ref = _ref_train(X, M, K, 2)
        assert len(got) == M and all(len(cb) == K for cb in got)
        for s in range(M):
            np.testing.assert_allclose(
                np.asarray(got[s]), ref[s], rtol=1e-9
            )

    def test_guards(self, spark, data):
        X, df = data
        with pytest.raises(ValueError, match="divisible"):
            train_pq_codebooks(df, "embedding", "vec_id", m=5, k=K)
        with pytest.raises(ValueError, match="iters"):
            train_pq_codebooks(df, "embedding", "vec_id", m=M, k=K,
                               iters=0)
        with pytest.raises(ValueError, match="seed"):
            train_pq_codebooks(df, "embedding", "vec_id", m=M, k=100)


class TestEncode:
    def test_arrow_matches_numpy_and_portable(self, spark, data):
        X, df = data
        cbs = _ref_train(X, M, K, 2)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        ref = _ref_encode(X, cbs)
        got_a = {
            r["vec_id"]: r["pq_code"]
            for r in pq_encode(df, "embedding", cbs).collect()
        }
        got_p = {
            r["vec_id"]: r["pq_code"]
            for r in pq_encode(
                df, "embedding", cbs, arrow=False
            ).collect()
        }
        for i in range(60):
            assert got_a[i] == list(ref[i])
        assert got_a == got_p

    def test_null_vector(self, spark):
        cbs = [[[0.0] * 8, [1.0] * 8]]
        df = spark.createDataFrame(
            [(0, [0.1] * 8), (1, None)], "vec_id long, embedding array<double>"
        )
        for arrow in (True, False):
            got = {
                r["vec_id"]: r["pq_code"]
                for r in pq_encode(
                    df, "embedding", cbs, arrow=arrow
                ).collect()
            }
            assert got[0] == [0] and got[1] is None

    def test_ragged_guard(self, spark, data):
        _, df = data
        with pytest.raises(ValueError, match="ragged"):
            pq_encode(df, "embedding", [[[0.0], [1.0, 2.0]]])


class TestADC:
    def test_dist_is_reconstruction_distance(self, spark, data):
        X, df = data
        cbs = _ref_train(X, M, K, 2)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        codes_df = pq_encode(df, "embedding", cbs)
        queries = df.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = topk_pq_adc(queries, codes_df, cbs, k=60).collect()
        ref_codes = _ref_encode(X, cbs)
        dsub = D // M
        # reconstructed corpus vectors from codes
        recon = np.stack(
            [
                np.concatenate(
                    [np.asarray(cbs[s][ref_codes[i, s]]) for s in range(M)]
                )
                for i in range(60)
            ]
        )
        for r in out:
            want = float(
                ((X[r["query_id"]] - recon[r["neighbor_id"]]) ** 2).sum()
            )
            assert r["dist"] == pytest.approx(want, abs=2e-6)
        # rank 1 for query i is a vector sharing all its codes (usually
        # itself): dist must equal min over corpus
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, rows in by_q.items():
            top = min(rows, key=lambda r: (r["dist"], r["neighbor_id"]))
            assert top["rank"] == 1

    def test_arrow_matches_column_path(self, spark, data):
        X, df = data
        cbs = _ref_train(X, M, K, 2)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        codes_df = pq_encode(df, "embedding", cbs)
        queries = df.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        a = sorted(
            map(tuple, topk_pq_adc(queries, codes_df, cbs, k=7).collect())
        )
        b = sorted(
            map(
                tuple,
                topk_pq_adc(
                    queries, codes_df, cbs, k=7, arrow=False
                ).collect(),
            )
        )
        assert a == b

    def test_rank_deterministic_and_k_bound(self, spark, data):
        X, df = data
        cbs = _ref_train(X, M, K, 1)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        codes_df = pq_encode(df, "embedding", cbs)
        queries = df.where(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        a = topk_pq_adc(queries, codes_df, cbs, k=5).collect()
        b = topk_pq_adc(
            queries, codes_df.repartition(7), cbs, k=5
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) == 5
        assert [r["rank"] for r in sorted(a, key=lambda r: r["rank"])] == [
            1, 2, 3, 4, 5,
        ]


class TestIVFPQ:
    def _index(self, spark, X, df, cbs):
        from pandas_weights_spark.functions.similarity import (
            assign_cells_arrow,
            train_ivf_centroids,
        )

        cents = train_ivf_centroids(df, "embedding", 4, "vec_id",
                                    iters=2, arrow=True)
        codes = pq_encode(df, "embedding", cbs)
        indexed = assign_cells_arrow(
            codes, "embedding", cents, out_col="cell"
        ).drop("embedding")
        return cents, indexed

    @pytest.mark.slow
    def test_probe_all_equals_full_adc(self, spark, data):
        from pandas_weights_spark.functions.pq import topk_ivfpq

        X, df = data
        cbs = _ref_train(X, M, K, 2)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        cents, indexed = self._index(spark, X, df, cbs)
        queries = df.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        full = sorted(
            map(
                tuple,
                topk_pq_adc(
                    queries, indexed, cbs, k=8, arrow=False
                ).collect(),
            )
        )
        for arrow in (True, False):
            ivq = sorted(
                map(
                    tuple,
                    topk_ivfpq(
                        queries, indexed, cbs, cents, k=8,
                        nprobe=len(cents), arrow=arrow,
                    ).collect(),
                )
            )
            assert ivq == full, f"arrow={arrow}"

    @pytest.mark.slow
    def test_pruning_and_recall(self, spark, data):
        from pandas_weights_spark.functions.pq import topk_ivfpq

        X, df = data
        cbs = _ref_train(X, M, K, 2)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        cents, indexed = self._index(spark, X, df, cbs)
        queries = df.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        full = topk_pq_adc(queries, indexed, cbs, k=3).collect()
        part = topk_ivfpq(
            queries, indexed, cbs, cents, k=3, nprobe=2
        ).collect()
        # arrow and column pruning agree at partial nprobe too
        part_col = topk_ivfpq(
            queries, indexed, cbs, cents, k=3, nprobe=2, arrow=False
        ).collect()
        assert sorted(map(tuple, part)) == sorted(map(tuple, part_col))
        # each query still gets answers, every (q, n, dist) that
        # nprobe=2 returns appears in the full ranking's candidate
        # universe with the identical distance
        fd = {(r["query_id"], r["neighbor_id"]): r["dist"] for r in full}
        got_q = {r["query_id"] for r in part}
        assert got_q == {0, 1, 2, 3, 4}
        for r in part:
            key = (r["query_id"], r["neighbor_id"])
            if key in fd:
                assert fd[key] == r["dist"]
        # a query's own vector lives in its nearest cell -> top-1
        # self-hit survives pruning
        own = {r["query_id"]: r["neighbor_id"]
               for r in part if r["rank"] == 1}
        assert sum(own[q] == q for q in own) >= 4

    def test_nprobe_guard(self, spark, data):
        from pandas_weights_spark.functions.pq import topk_ivfpq

        X, df = data
        cbs = _ref_train(X, M, K, 1)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        cents, indexed = self._index(spark, X, df, cbs)
        q = df.limit(1).select(F.col("vec_id").alias("query_id"),
                               "embedding")
        with pytest.raises(ValueError, match="nprobe"):
            topk_ivfpq(q, indexed, cbs, cents, k=1, nprobe=0)

def _ref_cells(X, cents):
    u = np.asarray(
        [np.asarray(c) / (np.linalg.norm(c) or 1.0) for c in cents]
    )
    s = X @ u.T
    kc = u.shape[0]
    # engine tie rule: larger cell index wins
    return (kc - 1) - np.argmax(s[:, ::-1], axis=1)


def _ref_residual_adc(Xq, qids, X, ids, cells, cents, cbs, codes, k):
    """Transparent per-pair IVFADC at probe-all: dist(q, x) =
    sum_s ||(q - c_cell(x))_s - cb[s][code_s(x)]||^2, 6-dp rounded."""
    m = len(cbs)
    dsub = X.shape[1] // m
    cents = np.asarray(cents, float)
    out = []
    for qi, q in zip(qids, Xq):
        d = np.empty(len(ids))
        for i in range(len(ids)):
            r = q - cents[cells[i]]
            tot = 0.0
            for s in range(m):
                e = r[s * dsub:(s + 1) * dsub] - np.asarray(
                    cbs[s][codes[i, s]], float
                )
                tot += float((e * e).sum())
            d[i] = round(tot, 6)
        order = np.lexsort((np.asarray(ids), d))[:k]
        for rk, j in enumerate(order, 1):
            out.append((qi, int(ids[j]), float(d[j]), rk))
    return sorted(out)


class TestResidual:
    """IVFADC residual mode (Jégou 2011 §IV-A): codes quantize
    x − centroid(cell), query tables shift per probed cell."""

    def _cents(self):
        rng = np.random.default_rng(5)
        return [[float(v) for v in rng.normal(size=D)] for _ in range(4)]

    def _indexed(self, spark, X, df, cents):
        from pandas_weights_spark.functions.similarity import (
            assign_cells_arrow,
        )

        return assign_cells_arrow(df, "embedding", cents, out_col="cell")

    def test_residual_train_matches_numpy(self, spark, data):
        X, df = data
        cents = self._cents()
        celled = self._indexed(spark, X, df, cents)
        got = train_pq_codebooks(
            celled, "embedding", "vec_id", m=M, k=K, iters=2,
            centroids=cents,
        )
        R = X - np.asarray(cents)[_ref_cells(X, cents)]
        ref = _ref_train(R, M, K, 2)
        for s in range(M):
            np.testing.assert_allclose(np.asarray(got[s]), ref[s],
                                       rtol=1e-9)

    def test_residual_encode_paths_agree_and_match_numpy(self, spark, data):
        X, df = data
        cents = self._cents()
        celled = self._indexed(spark, X, df, cents)
        R = X - np.asarray(cents)[_ref_cells(X, cents)]
        cbs = _ref_train(R, M, K, 2)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        ref = _ref_encode(R, cbs)
        got_a = {
            r["vec_id"]: r["pq_code"]
            for r in pq_encode(
                celled, "embedding", cbs, centroids=cents
            ).collect()
        }
        got_p = {
            r["vec_id"]: r["pq_code"]
            for r in pq_encode(
                celled, "embedding", cbs, arrow=False, centroids=cents
            ).collect()
        }
        for i in range(60):
            assert got_a[i] == list(ref[i])
        assert got_a == got_p

    def test_residual_probe_all_matches_numpy_adc(self, spark, data):
        from pandas_weights_spark.functions.pq import topk_ivfpq

        X, df = data
        cents = self._cents()
        celled = self._indexed(spark, X, df, cents)
        cells = _ref_cells(X, cents)
        R = X - np.asarray(cents)[cells]
        cbs = _ref_train(R, M, K, 2)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        codes = _ref_encode(R, cbs)
        indexed = pq_encode(
            celled, "embedding", cbs, centroids=cents
        ).drop("embedding")
        queries = df.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        ref = _ref_residual_adc(
            X[:3], list(range(3)), X, list(range(60)), cells,
            cents, cbs, codes, k=8,
        )
        for arrow in (True, False):
            got = sorted(
                map(
                    tuple,
                    topk_ivfpq(
                        queries, indexed, cbs, cents, k=8,
                        nprobe=len(cents), arrow=arrow, residual=True,
                    ).collect(),
                )
            )
            assert got == ref, f"arrow={arrow}"

    @pytest.mark.slow
    def test_residual_recall_geq_raw_at_fixed_budget(self, spark):
        """The point of residual coding: at the same (m, k) code size,
        recall@10 against exact L2 neighbors is at least the raw-code
        recall (strictly better on this clustered fixture)."""
        from pandas_weights_spark.functions.pq import topk_ivfpq
        from pandas_weights_spark.functions.similarity import (
            assign_cells_arrow,
        )

        rng = np.random.default_rng(23)
        means = rng.normal(size=(4, D)) * 5.0
        X = np.vstack([
            means[c] + rng.normal(size=(50, D)) for c in range(4)
        ])
        n = X.shape[0]
        df = spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        cents = [[float(v) for v in m_] for m_ in means]
        celled = assign_cells_arrow(df, "embedding", cents,
                                    out_col="cell")
        cells = _ref_cells(X, cents)
        kq = 10
        qn = 8
        queries = df.where(F.col("vec_id") < qn).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # exact L2 ground truth (ascending, ties by id)
        dall = ((X[:qn, None, :] - X[None, :, :]) ** 2).sum(-1)
        exact = [
            set(np.lexsort((np.arange(n), dall[i]))[:kq])
            for i in range(qn)
        ]

        def recall(residual):
            cbs = train_pq_codebooks(
                celled, "embedding", "vec_id", m=4, k=4, iters=3,
                centroids=cents if residual else None,
            )
            codes = pq_encode(
                celled, "embedding", cbs,
                centroids=cents if residual else None,
            ).drop("embedding")
            got = topk_ivfpq(
                queries, codes, cbs, cents, k=kq, nprobe=4,
                residual=residual,
            ).collect()
            byq = {}
            for r in got:
                byq.setdefault(r["query_id"], set()).add(
                    r["neighbor_id"]
                )
            return np.mean(
                [len(byq[q] & exact[q]) / kq for q in range(qn)]
            )

        r_res = recall(True)
        r_raw = recall(False)
        assert r_res >= r_raw, (r_res, r_raw)
        # on this clustered fixture the gap is material, not a tie
        assert r_res > r_raw + 0.02, (r_res, r_raw)

    def test_residual_guards_and_nulls(self, spark, data):
        X, df = data
        cents = self._cents()
        cbs = [[[0.0] * 4] * K] * M
        with pytest.raises(ValueError, match="cell"):
            pq_encode(df, "embedding", cbs, centroids=cents)
        with pytest.raises(ValueError, match="cell"):
            train_pq_codebooks(
                df, "embedding", "vec_id", m=M, k=K, centroids=cents
            )
        rows = [(0, [0.1] * D, 0), (1, None, None), (2, [0.2] * D, None)]
        df2 = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, cell int"
        )
        for arrow in (True, False):
            got = {
                r["vec_id"]: r["pq_code"]
                for r in pq_encode(
                    df2, "embedding", cbs, arrow=arrow, centroids=cents
                ).collect()
            }
            assert got[0] is not None
            assert got[1] is None and got[2] is None


class TestRefine:
    """topk_ivfpq_refined — FAISS IndexRefineFlat over the IVFPQ base:
    exact re-rank of ADC candidates on raw vectors."""

    def _setup(self, spark, X, df):
        from pandas_weights_spark.functions.similarity import (
            assign_cells_arrow,
            train_ivf_centroids,
        )

        cents = train_ivf_centroids(df, "embedding", 4, "vec_id",
                                    iters=2, arrow=True)
        cbs = _ref_train(X, M, K, 2)
        cbs = [[list(map(float, c)) for c in cb] for cb in cbs]
        codes = pq_encode(df, "embedding", cbs)
        indexed = assign_cells_arrow(
            codes, "embedding", cents, out_col="cell"
        ).drop("embedding")
        return cents, cbs, indexed

    def test_full_refine_probe_all_is_exact_bruteforce(self, spark, data):
        from pandas_weights_spark.functions.pq import topk_ivfpq_refined

        X, df = data
        cents, cbs, indexed = self._setup(spark, X, df)
        queries = df.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        kq = 6
        got = sorted(
            map(tuple, topk_ivfpq_refined(
                queries, indexed, df, cbs, cents, k=kq,
                refine_factor=10,  # k*r = 60 = |corpus|: all candidates
                nprobe=len(cents),
            ).collect())
        )
        # transparent exact reference (squared L2, 6-dp, ties by id)
        ref = []
        for qi in range(3):
            d = np.round(((X[qi][None, :] - X) ** 2).sum(-1), 6)
            order = np.lexsort((np.arange(60), d))[:kq]
            for rk, j in enumerate(order, 1):
                ref.append((qi, int(j), float(d[j]), rk))
        assert got == sorted(ref)

    @pytest.mark.slow
    def test_refine_recall_geq_unrefined(self, spark, data):
        from pandas_weights_spark.functions.pq import (
            topk_ivfpq,
            topk_ivfpq_refined,
        )

        X, df = data
        cents, cbs, indexed = self._setup(spark, X, df)
        queries = df.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        kq = 5
        exact = {}
        for qi in range(5):
            d = np.round(((X[qi][None, :] - X) ** 2).sum(-1), 6)
            exact[qi] = set(np.lexsort((np.arange(60), d))[:kq])

        def recall(rows):
            byq = {}
            for r in rows:
                byq.setdefault(r["query_id"], set()).add(
                    r["neighbor_id"]
                )
            return np.mean(
                [len(byq.get(q, set()) & exact[q]) / kq for q in range(5)]
            )

        raw = recall(topk_ivfpq(
            queries, indexed, cbs, cents, k=kq, nprobe=len(cents)
        ).collect())
        ref = recall(topk_ivfpq_refined(
            queries, indexed, df, cbs, cents, k=kq, refine_factor=4,
            nprobe=len(cents),
        ).collect())
        assert ref >= raw
        # refined distances are EXACT: each reported pair's dist
        # equals the true squared L2
        for r in topk_ivfpq_refined(
            queries, indexed, df, cbs, cents, k=kq, refine_factor=4,
            nprobe=len(cents),
        ).collect():
            true = round(float(((X[r["query_id"]] -
                                 X[r["neighbor_id"]]) ** 2).sum()), 6)
            assert r["dist"] == true

    def test_refine_factor_guard(self, spark, data):
        from pandas_weights_spark.functions.pq import topk_ivfpq_refined

        X, df = data
        cents, cbs, indexed = self._setup(spark, X, df)
        q = df.limit(1).select(F.col("vec_id").alias("query_id"),
                               "embedding")
        with pytest.raises(ValueError, match="refine_factor"):
            topk_ivfpq_refined(q, indexed, df, cbs, cents, k=1,
                               refine_factor=0)


class TestOPQ:
    """r14 (VERDICT r13 missing #4): parametric OPQ rotation (Ge et
    al. CVPR'13 eigenvalue allocation) — PCA-decorrelated, variance-
    product-balanced subspaces before PQ coding."""

    def _aniso(self, n=240, seed=31):
        # correlated, anisotropic data: decaying spectrum under a
        # random rotation, so raw coordinate blocks mix variance and
        # correlate across subspace boundaries — the regime OPQ's two
        # optimality conditions target
        rng = np.random.default_rng(seed)
        spectrum = np.array(
            [8.0, 6.0, 5.0, 4.0, 2.0, 1.5, 1.0, 0.8,
             0.5, 0.4, 0.3, 0.2, 0.1, 0.08, 0.05, 0.02]
        )
        q, _ = np.linalg.qr(rng.normal(size=(D, D)))
        z = rng.normal(size=(n, D))
        return (z * spectrum[None, :]) @ q.T

    def _df(self, spark, X):
        return spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in range(X.shape[0])],
            "vec_id long, embedding array<double>",
        )

    def test_rotation_is_orthonormal_and_isometric(self, spark):
        from pandas_weights_spark.functions.pq import (
            opq_rotate,
            train_opq_rotation,
        )

        X = self._aniso(n=120)
        df = self._df(spark, X)
        rot = train_opq_rotation(df, "embedding", m=M)
        R = np.asarray(rot)
        assert R.shape == (D, D)
        assert np.allclose(R @ R.T, np.eye(D), atol=1e-9)
        # isometry: pairwise distances preserved -> exact brute-force
        # rankings identical in the rotated space
        Y = X @ R.T
        da = ((X[:10, None, :] - X[None, :20, :]) ** 2).sum(-1)
        db = ((Y[:10, None, :] - Y[None, :20, :]) ** 2).sum(-1)
        assert np.allclose(da, db, rtol=1e-9)
        got = opq_rotate(df, "embedding", rot).collect()
        by_id = {r["vec_id"]: np.asarray(r["opq_vec"]) for r in got}
        for i in range(10):
            assert np.allclose(by_id[i], Y[i], atol=1e-9)

    def test_arrow_and_column_paths_agree(self, spark):
        from pandas_weights_spark.functions.pq import (
            opq_rotate,
            train_opq_rotation,
        )

        X = self._aniso(n=60)
        df = self._df(spark, X)
        rot = train_opq_rotation(df, "embedding", m=M)
        a = {
            r["vec_id"]: r["opq_vec"]
            for r in opq_rotate(df, "embedding", rot, arrow=True).collect()
        }
        c = {
            r["vec_id"]: r["opq_vec"]
            for r in opq_rotate(df, "embedding", rot, arrow=False).collect()
        }
        for i in a:
            assert np.allclose(a[i], c[i], atol=1e-9)
        # NULL vectors stay NULL on both paths
        nl = spark.createDataFrame(
            [(0, None)], "vec_id long, embedding array<double>"
        )
        assert (
            opq_rotate(nl, "embedding", rot, arrow=True).first()["opq_vec"]
            is None
        )
        assert (
            opq_rotate(nl, "embedding", rot, arrow=False).first()["opq_vec"]
            is None
        )

    @pytest.mark.slow
    def test_recall_geq_plain_pq_at_fixed_budget(self, spark):
        """The OPQ promise: at the same (m, k) code budget, ADC
        recall@10 against exact L2 neighbors is at least plain PQ's
        (strictly better on this anisotropic fixture)."""
        from pandas_weights_spark.functions.pq import (
            opq_rotate,
            train_opq_rotation,
        )

        X = self._aniso(n=240)
        n = X.shape[0]
        df = self._df(spark, X)
        kq, qn = 10, 12
        dall = ((X[:qn, None, :] - X[None, :, :]) ** 2).sum(-1)
        exact = [
            set(np.lexsort((np.arange(n), dall[i]))[:kq])
            for i in range(qn)
        ]

        def recall(rot):
            vec = "embedding"
            base = df
            if rot is not None:
                base = opq_rotate(df, "embedding", rot, out_col="rv")
                vec = "rv"
            cbs = train_pq_codebooks(base, vec, "vec_id", m=M, k=8,
                                     iters=3)
            codes = pq_encode(base, vec, cbs, out_col="pq_code")
            codes = codes.select("vec_id", "pq_code")
            queries = base.where(F.col("vec_id") < qn).select(
                F.col("vec_id").alias("query_id"),
                F.col(vec).alias("embedding"),
            )
            got = topk_pq_adc(
                queries, codes, cbs, k=kq,
            ).collect()
            byq = {}
            for r in got:
                byq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return np.mean(
                [len(byq[q] & exact[q]) / kq for q in range(qn)]
            )

        rot = train_opq_rotation(df, "embedding", m=M)
        r_opq = recall(rot)
        r_raw = recall(None)
        assert r_opq >= r_raw, (r_opq, r_raw)
        # material gap on the anisotropic fixture, not a tie
        assert r_opq > r_raw + 0.02, (r_opq, r_raw)

    def test_guards(self, spark):
        from pandas_weights_spark.functions.pq import (
            opq_rotate,
            train_opq_rotation,
        )

        X = self._aniso(n=30)
        df = self._df(spark, X)
        with pytest.raises(ValueError, match="divisible"):
            train_opq_rotation(df, "embedding", m=5)
        with pytest.raises(ValueError, match="square"):
            opq_rotate(df, "embedding", [[1.0, 0.0]])
