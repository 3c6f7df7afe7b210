"""PageRank (functions/graph.py) vs a transparent numpy power
iteration with identical damping/dangling semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.graph import pagerank


def _ref_pagerank(n, edges, d=0.85, iters=10, weights=None):
    """edges: list of (s, t); weights parallel list or None."""
    w = weights or [1.0] * len(edges)
    out = np.zeros(n)
    for (s, t), ww in zip(edges, w):
        out[s] += ww
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        c = np.zeros(n)
        for (s, t), ww in zip(edges, w):
            c[t] += r[s] * ww / out[s]
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (c + dang / n)
    return r


def _run(spark, n, edges, weights=None, **kw):
    if weights is None:
        df = spark.createDataFrame(edges, "src long, dst long")
        wcol = None
    else:
        df = spark.createDataFrame(
            [(s, t, w) for (s, t), w in zip(edges, weights)],
            "src long, dst long, w double",
        )
        wcol = F.col("w")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    out = pagerank(
        df, weight=wcol, nodes=nodes, node_col="node", **kw
    )
    return {r["node"]: r["rank"] for r in out.collect()}


class TestPageRank:
    def test_matches_numpy_power_iteration(self, spark):
        rng = np.random.default_rng(5)
        n = 12
        edges = list(
            {
                (int(a), int(b))
                for a, b in rng.integers(0, n, size=(40, 2))
                if a != b
            }
        )
        got = _run(spark, n, edges, iters=8)
        ref = _ref_pagerank(n, edges, iters=8)
        for i in range(n):
            assert got[i] == pytest.approx(ref[i], rel=1e-9)

    def test_weighted_matches_numpy(self, spark):
        edges = [(0, 1), (0, 2), (3, 0), (2, 0)]
        weights = [3.0, 1.0, 1.0, 2.0]
        got = _run(spark, 4, edges, weights=weights, iters=6)
        ref = _ref_pagerank(4, edges, weights=weights, iters=6)
        for i in range(4):
            assert got[i] == pytest.approx(ref[i], rel=1e-9)
        # 3x edge weight -> node 1 outranks node 2
        assert got[1] > got[2]

    def test_ranks_sum_to_one_with_dangling(self, spark):
        # node 3 is a pure sink (dangling); mass must not leak
        edges = [(0, 3), (1, 3), (2, 3)]
        got = _run(spark, 4, edges, iters=7)
        assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)
        assert got[3] > got[0]

    def test_hub_authority(self, spark):
        # star: everyone links to 0
        edges = [(i, 0) for i in range(1, 8)]
        got = _run(spark, 8, edges, iters=10)
        assert got[0] == max(got.values())
        leaves = [got[i] for i in range(1, 8)]
        assert max(leaves) == pytest.approx(min(leaves), rel=1e-12)

    def test_symmetric_cycle_uniform(self, spark):
        edges = [(i, (i + 1) % 5) for i in range(5)]
        got = _run(spark, 5, edges, iters=12)
        for v in got.values():
            assert v == pytest.approx(0.2, rel=1e-9)

    def test_default_universe_and_guards(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
        assert set(got) == {1, 2, 3}
        with pytest.raises(ValueError, match="iters"):
            pagerank(df, iters=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping=1.0)
        with pytest.raises(ValueError, match="node_col"):
            pagerank(df, nodes=df)

    def test_subset_universe_rejected(self, spark):
        # an explicit universe that misses an edge endpoint would
        # silently lose rank mass (sums-to-1 broken) — must raise
        df = spark.createDataFrame(
            [(1, 2), (2, 3)], "src long, dst long"
        )
        nodes = spark.createDataFrame([(1,), (2,)], "id long")
        with pytest.raises(ValueError, match="superset"):
            pagerank(df, nodes=nodes, node_col="id", iters=2)
        # a proper superset (isolated node 9) stays fine and sums to 1
        ok_nodes = spark.createDataFrame(
            [(1,), (2,), (3,), (9,)], "id long"
        )
        got = pagerank(
            df, nodes=ok_nodes, node_col="id", iters=3
        ).collect()
        assert abs(sum(r["rank"] for r in got) - 1.0) < 1e-9

    def test_null_and_nonpositive_edges_drop(self, spark):
        df = spark.createDataFrame(
            [(0, 1, 1.0), (None, 1, 1.0), (0, None, 1.0), (2, 0, 0.0),
             (2, 0, None)],
            "src long, dst long, w double",
        )
        nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
        got = {
            r["node"]: r["rank"]
            for r in pagerank(
                df, weight=F.col("w"), nodes=nodes, node_col="node",
                iters=4,
            ).collect()
        }
        ref = _ref_pagerank(3, [(0, 1)], iters=4)
        for i in range(3):
            assert got[i] == pytest.approx(ref[i], rel=1e-12)

    @pytest.mark.slow
    def test_tol_early_stop_matches_converged(self, spark):
        # symmetric 5-cycle converges to uniform after 1 iteration in
        # exact arithmetic; tol must stop early with the same answer
        # a full iters=12 run reaches
        edges = [(i, (i + 1) % 5) for i in range(5)]
        full = _run(spark, 5, edges, iters=12)
        early = _run(spark, 5, edges, iters=12, tol=1e-12)
        for i in range(5):
            assert early[i] == pytest.approx(full[i], rel=1e-9)

    @pytest.mark.slow
    def test_tol_reaches_same_fixed_point_on_asym_graph(self, spark):
        edges = [(0, 1), (1, 2), (2, 0), (3, 0)]
        tight = _run(spark, 4, edges, iters=60)
        tolled = _run(spark, 4, edges, iters=60, tol=1e-10)
        for i in range(4):
            assert tolled[i] == pytest.approx(tight[i], abs=1e-8)
