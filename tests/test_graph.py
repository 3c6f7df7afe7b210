"""Connected components (functions/graph.py): correctness vs a
driver-side union-find, convergence on adversarial shapes, cluster
wrapper semantics."""

import random

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.graph import (
    connected_components,
    neardup_clusters,
)


def _uf(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min of component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(v) for r, v in comp.items() for n in v}


def _run(spark, edges, nodes=None, sgt=0):
    # sgt=0 forces the DISTRIBUTED large/small-star loop (the original
    # coverage); the hybrid driver-union-find fast path is exercised by
    # TestHybridFastPath
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    nd = None
    if nodes is not None:
        nd = spark.createDataFrame([(n,) for n in nodes], "id long")
    out = connected_components(
        e, nodes=nd, node_col="id" if nd is not None else None,
        small_graph_threshold=sgt,
    )
    return {r["node"]: r["component"] for r in out.collect()}


class TestConnectedComponents:
    def test_two_triangles_and_bridge(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10)]
        got = _run(spark, edges)
        assert got == {n: 1 for n in (1, 2, 3, 10, 11, 12)}

    def test_long_chain_converges_fast(self, spark):
        # a 200-node path is the worst case for plain min-propagation
        # (200 rounds); large/small-star must finish inside the default
        # max_iterations=25 ≈ O(log^2)
        edges = [(i, i + 1) for i in range(200)]
        got = _run(spark, edges)
        assert set(got.values()) == {0}
        assert len(got) == 201

    def test_isolated_nodes_label_themselves(self, spark):
        got = _run(spark, [(5, 6)], nodes=[1, 5, 6, 9])
        assert got == {1: 1, 5: 5, 6: 5, 9: 9}

    def test_self_loops_and_duplicate_edges(self, spark):
        got = _run(spark, [(4, 4), (4, 7), (7, 4), (4, 7)])
        assert got == {4: 4, 7: 4}

    @pytest.mark.slow
    def test_differential_random_graph(self, spark):
        rng = random.Random(7)
        nodes = list(range(120))
        edges = [
            (rng.randrange(120), rng.randrange(120)) for _ in range(90)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        got = _run(spark, edges, nodes=nodes)
        want = _uf(edges, nodes)
        assert got == want

    def test_string_ids(self, spark):
        e = spark.createDataFrame(
            [("b", "c"), ("c", "a"), ("x", "y")], "id_a string, id_b string"
        )
        for sgt in (0, 100_000):  # both paths must agree on string ids
            out = {
                r["node"]: r["component"]
                for r in connected_components(
                    e, small_graph_threshold=sgt
                ).collect()
            }
            assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


class TestHybridFastPath:
    @pytest.mark.slow
    def test_parity_with_distributed_loop(self, spark):
        rng = random.Random(13)
        nodes = list(range(150))
        edges = [
            (rng.randrange(150), rng.randrange(150)) for _ in range(110)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        fast = _run(spark, edges, nodes=nodes, sgt=100_000)
        dist = _run(spark, edges, nodes=nodes, sgt=0)
        assert fast == dist == _uf(edges, nodes)

    def test_chain_fast_path(self, spark):
        edges = [(i, i + 1) for i in range(200)]
        got = _run(spark, edges, sgt=100_000)
        assert set(got.values()) == {0} and len(got) == 201

    def test_probe_overflow_falls_back(self, spark):
        # threshold below the edge count -> the distributed loop runs
        # and still produces the right labels
        edges = [(i, i + 1) for i in range(50)]
        got = _run(spark, edges, sgt=10)
        assert set(got.values()) == {0} and len(got) == 51

    def test_nonconvergence_raises(self, spark):
        e = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        with pytest.raises(RuntimeError, match="converge"):
            connected_components(
                e, max_iterations=0, small_graph_threshold=0
            )

    def test_nodes_requires_node_col(self, spark):
        e = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with pytest.raises(ValueError, match="node_col"):
            connected_components(e, nodes=e)


class TestNeardupClusters:
    def test_clusters_and_survivors(self, spark, docs_df):
        out = neardup_clusters(docs_df, "text", "doc_id", threshold=0.5)
        rows = out.collect()
        # every document labelled exactly once
        assert len(rows) == docs_df.count()
        by_id = {r["doc_id"]: r for r in rows}
        # cluster label is a member id and the minimum of its cluster
        clusters = {}
        for r in rows:
            clusters.setdefault(r["cluster"], []).append(r["doc_id"])
        for label, members in clusters.items():
            assert label == min(members)
        # survivor flag marks exactly the label row
        for r in rows:
            assert r["is_survivor"] == (r["doc_id"] == r["cluster"])

    def test_transitive_closure_of_pairs(self, spark, docs_df):
        from pandas_weights_spark.functions.dedup import (
            minhash_near_duplicates,
        )

        pairs = [
            (r["id_a"], r["id_b"])
            for r in minhash_near_duplicates(
                docs_df, "text", "doc_id", threshold=0.5
            ).collect()
        ]
        ids = [r["doc_id"] for r in docs_df.select("doc_id").collect()]
        want = _uf(pairs, ids)
        got = {
            r["doc_id"]: r["cluster"]
            for r in neardup_clusters(
                docs_df, "text", "doc_id", threshold=0.5
            ).collect()
        }
        assert got == want


@pytest.fixture(scope="module")
def docs_df(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return df.select("doc_id", "text")


class TestHits:
    """r10: hits — Kleinberg hubs/authorities, alternating L2-normed
    power iterations over the weighted adjacency."""

    def test_differential_vs_numpy(self, spark):
        import numpy as np

        from pandas_weights_spark.functions.graph import hits

        rng = np.random.RandomState(7)
        n = 9
        W = np.zeros((n, n))
        rows = []
        for _ in range(25):
            s, d = rng.randint(0, n, 2)
            if s == d:
                continue
            w = float(rng.randint(1, 4))
            W[s, d] += w
            rows.append((f"n{s}", f"n{d}", w))
        df = spark.createDataFrame(rows, ["src", "dst", "w"])
        got = {
            r["node"]: (r["hub"], r["authority"])
            for r in hits(df, weight=F.col("w"), iters=4).collect()
        }
        h = np.ones(n)
        for _ in range(4):
            a = W.T @ h
            a = a / np.sqrt((a * a).sum())
            h = W @ a
            h = h / np.sqrt((h * h).sum())
        present = sorted({i for e in np.argwhere(W) for i in e})
        assert set(got) == {f"n{i}" for i in present}
        for i in present:
            assert got[f"n{i}"][0] == pytest.approx(h[i], abs=1e-9)
            assert got[f"n{i}"][1] == pytest.approx(a[i], abs=1e-9)

    def test_hub_authority_structure(self, spark):
        from pandas_weights_spark.functions.graph import hits

        # star: hubby h0 points at a1..a3; a1 also pointed at by h1
        df = spark.createDataFrame(
            [("h0", "a1"), ("h0", "a2"), ("h0", "a3"), ("h1", "a1")],
            ["src", "dst"],
        )
        got = {
            r["node"]: (r["hub"], r["authority"])
            for r in hits(df, iters=8).collect()
        }
        # pure hubs have zero authority and vice versa
        assert got["h0"][1] == 0.0 and got["h1"][1] == 0.0
        assert all(got[a][0] == 0.0 for a in ("a1", "a2", "a3"))
        # h0 out-links 3 authorities vs h1's 1 -> bigger hub score;
        # a1 has 2 in-links vs a2/a3's 1 -> biggest authority
        assert got["h0"][0] > got["h1"][0] > 0
        assert got["a1"][1] > got["a2"][1] > 0
        assert got["a2"][1] == got["a3"][1]

    def test_validation_and_drops(self, spark):
        from pandas_weights_spark.functions.graph import hits

        df = spark.createDataFrame(
            [("a", "b", 1.0)], ["src", "dst", "w"]
        )
        with pytest.raises(ValueError, match="iters"):
            hits(df, iters=0)
        empty = spark.createDataFrame(
            [("a", "b", -1.0), ("a", None, 2.0)],
            "src string, dst string, w double",
        )
        with pytest.raises(ValueError, match="at least one"):
            hits(empty, weight=F.col("w"))
