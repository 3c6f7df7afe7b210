"""Connected components over a pair graph — the last stage of every
near-dup pipeline (the reference has no graph surface, SURVEY.md §2.6;
pair emitters live in functions/dedup.py).

``minhash_near_duplicates`` & co. emit PAIRS; deduplication needs
CLUSTERS: the transitive closure of the pair relation, with one
survivor per cluster. At 100 TB the naive approaches fail —
driver-side union-find needs all edges on the driver, and plain
min-label propagation needs O(graph diameter) rounds (a 10M-node chain
is 10M rounds). This module implements the alternating
**large-star / small-star** algorithm (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", SoCC 2014 — public paper): each round is two shuffles keyed
on node id, edge count never grows beyond 2|E|, and convergence is
O(log²) rounds in the worst case (2-3 rounds for the shallow clusters
near-dup graphs produce). Every step is a plain DataFrame
groupBy/join — no driver-side edge materialization; the driver loop
runs O(log) iterations with an eager ``localCheckpoint`` per round to
truncate lineage (without it the plan doubles every iteration and
Catalyst analysis time explodes).

Semantics: nodes are any orderable id type; a component is labelled by
its MINIMUM node id (deterministic, so SQL-oracle-checkable — DuckDB
replays it as a recursive reachability CTE).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "neardup_clusters", "pagerank", "hits"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: "Optional[F.Column]" = None,
    damping: float = 0.85,
    iters: int = 10,
    nodes: "Optional[DataFrame]" = None,
    node_col: Optional[str] = None,
    tol: Optional[float] = None,
) -> DataFrame:
    """Weighted PageRank (Brin & Page 1998 — public) over an edge
    list: ``(node, rank)`` after ``iters`` power iterations with
    damping ``d`` and full dangling-mass redistribution, so ranks sum
    to 1 every iteration. The data-pipeline use is DOMAIN AUTHORITY —
    rank the web-corpus link graph and carry the score into quality
    filtering/sampling (the classic link-quality signal n-gram
    heuristics miss).

    ``weight`` (default 1 per edge) makes a source's contribution
    proportional to edge weight over its total out-mass; NULL
    endpoints and non-positive weights drop. ``nodes``/``node_col``
    fixes the node universe explicitly (isolated nodes then receive
    the teleport + dangling share); default is the set of edge
    endpoints. An explicit universe must be a SUPERSET of the edge
    endpoints — validated up front with one anti-join count, because
    an endpoint outside it would silently lose rank mass and break
    the sums-to-1 contract (filter the edge list first if you want a
    subgraph). ``tol`` adds early convergence: iteration stops once
    the L1 rank delta ``Σ|r_t − r_{t−1}|`` falls below it (one extra
    scalar aggregate per iteration — still nothing node-sized on the
    driver), with ``iters`` as the cap.

    Scale shape: the degree-normalized edge table materializes ONCE
    (per-src groupBy + join, then an eager ``localCheckpoint`` — it
    is reused every iteration); each iteration is one broadcast-able
    1-row dangling aggregate plus one join + groupBy(dst) keyed
    shuffle, checkpointed to truncate lineage (the connected-
    components loop's discipline — without it Catalyst analysis
    doubles per round). Nothing node- or edge-sized ever reaches the
    driver; the only scalar collected is |V| once up front.

    Determinism: pure algebra over the edge multiset; distributed
    sums vary at ulp level across partitionings (oracle rows round).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not (0.0 <= damping < 1.0):
        raise ValueError("damping must be in [0, 1)")
    w = weight if weight is not None else F.lit(1.0)
    e = (
        edges.select(
            F.col(src).alias("__s__"),
            F.col(dst).alias("__d__"),
            w.cast("double").alias("__w__"),
        )
        .where(
            F.col("__s__").isNotNull()
            & F.col("__d__").isNotNull()
            & (F.col("__w__") > 0)
        )
    )
    if nodes is not None:
        if node_col is None:
            raise ValueError("node_col is required with nodes")
        universe = nodes.select(F.col(node_col).alias("__n__")).where(
            F.col("__n__").isNotNull()
        ).distinct()
    else:
        universe = (
            e.select(F.col("__s__").alias("__n__"))
            .unionByName(e.select(F.col("__d__").alias("__n__")))
            .distinct()
        )
    universe = universe.localCheckpoint(eager=True)
    if nodes is not None:
        # an explicit universe MUST cover every edge endpoint: a
        # destination outside it would silently lose its contribution
        # in the rank join (and an outside source still holds
        # out-mass), breaking the ranks-sum-to-1 contract — one cheap
        # anti-join count up front instead of a silent drift
        endpoints = (
            e.select(F.col("__s__").alias("__n__"))
            .unionByName(e.select(F.col("__d__").alias("__n__")))
            .distinct()
        )
        n_outside = endpoints.join(universe, "__n__", "left_anti").count()
        if n_outside:
            raise ValueError(
                f"nodes= must be a superset of edge endpoints: "
                f"{n_outside} endpoint(s) fall outside the supplied "
                "universe (their rank mass would silently vanish — "
                "filter the edge list to the universe first)"
            )
    n = universe.count()
    if n == 0:
        raise ValueError("pagerank needs at least one node")
    outm = e.groupBy("__s__").agg(F.sum("__w__").alias("__out__"))
    frac = (
        e.join(outm, "__s__")
        .select(
            "__s__",
            "__d__",
            (F.col("__w__") / F.col("__out__")).alias("__f__"),
        )
        .localCheckpoint(eager=True)
    )
    d = float(damping)
    base = (1.0 - d) / n
    ranks = universe.select("__n__", F.lit(1.0 / n).alias("__r__"))
    for _ in range(iters):
        contrib = (
            frac.join(ranks, frac["__s__"] == ranks["__n__"])
            .groupBy("__d__")
            .agg(F.sum(F.col("__f__") * F.col("__r__")).alias("__c__"))
        )
        dangling = F.broadcast(
            ranks.join(
                outm, ranks["__n__"] == outm["__s__"], "left_anti"
            ).agg(F.coalesce(F.sum("__r__"), F.lit(0.0)).alias("__dm__"))
        )
        new_ranks = (
            universe.join(
                contrib, universe["__n__"] == contrib["__d__"], "left"
            )
            .crossJoin(dangling)
            .select(
                "__n__",
                (
                    F.lit(base)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("__c__"), F.lit(0.0))
                        + F.col("__dm__") / F.lit(float(n))
                    )
                ).alias("__r__"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            prev = ranks.select(
                F.col("__n__").alias("__pn__"),
                F.col("__r__").alias("__pr__"),
            )
            delta = (
                new_ranks.join(
                    prev, new_ranks["__n__"] == prev["__pn__"]
                )
                .agg(
                    F.sum(F.abs(F.col("__r__") - F.col("__pr__"))).alias(
                        "__delta__"
                    )
                )
                .collect()[0]["__delta__"]
            )
            ranks = new_ranks
            if delta is not None and delta < float(tol):
                break
        else:
            ranks = new_ranks
    return ranks.select(
        F.col("__n__").alias("node"), F.col("__r__").alias("rank")
    )


def _canon(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges as (hi, lo) with lo < hi."""
    u, v = F.col("__u__"), F.col("__v__")
    return (
        edges.where(u != v)
        .select(
            F.greatest(u, v).alias("__u__"), F.least(u, v).alias("__v__")
        )
        .distinct()
    )


def _driver_union_find(edges: list) -> dict:
    """Min-label union-find over a SMALL collected edge list — the
    hybrid fast path below ``small_graph_threshold``. Path-compressed;
    component label = minimum node id (same contract as the
    distributed loop)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    seen: set = set()
    for u, v in edges:
        seen.add(u)
        seen.add(v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN so the root is always the component minimum
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    # every edge node gets a label (roots label themselves), matching
    # the distributed loop's output contract
    return {x: find(x) for x in seen}


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: Optional[DataFrame] = None,
    node_col: Optional[str] = None,
    small_graph_threshold: int = 100_000,
    max_iterations: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """``(node, component)`` for every node in ``pairs`` (plus isolated
    nodes of ``nodes[node_col]`` if given, labelled by themselves).
    ``component`` is the minimum node id of the connected component.

    Driver loop = O(log) alternating large-star/small-star rounds, each
    two node-keyed shuffles; stops when the edge set is stable (every
    edge then points directly at its component root). Raises after
    ``max_iterations`` instead of returning a partial labelling.

    Hybrid fast path: when the canonical edge set is at most
    ``small_graph_threshold`` rows (one guarded ``limit(k+1)`` probe —
    the calibration-style bounded collect, never data-sized), the
    transitive closure runs as driver union-find instead of ~10
    distributed rounds. Identical labels by construction (union by
    minimum); at 100 TB the pair graph blows past the threshold and the
    distributed loop runs — the probe is the only added cost (one job
    over the deduped edges, which round 1 would compute anyway). Pass
    ``small_graph_threshold=0`` to force the distributed loop.
    """
    e = _canon(
        pairs.select(F.col(src).alias("__u__"), F.col(dst).alias("__v__"))
    )
    sc = pairs.sparkSession.sparkContext

    if small_graph_threshold and small_graph_threshold > 0:
        probe = e.limit(small_graph_threshold + 1).collect()
        if len(probe) <= small_graph_threshold:
            comp = _driver_union_find(
                [(r["__u__"], r["__v__"]) for r in probe]
            )
            spark = pairs.sparkSession
            schema = e.select(
                F.col("__u__").alias("node"),
                F.col("__v__").alias("component"),
            ).schema
            labels = spark.createDataFrame(
                sorted(comp.items()), schema
            )
            if nodes is not None:
                if node_col is None:
                    raise ValueError("nodes= requires node_col=")
                allnodes = nodes.select(
                    F.col(node_col).alias("node")
                ).distinct()
                labels = allnodes.join(
                    F.broadcast(labels), "node", "left"
                ).select(
                    "node",
                    F.coalesce(F.col("component"), F.col("node")).alias(
                        "component"
                    ),
                )
            return labels

    prev = None
    n_edges, n_hash = -1, None
    for _ in range(max_iterations):
        if checkpoint:
            e = e.localCheckpoint(eager=True)
        prev, prev_n, prev_h = e, n_edges, n_hash

        # large-star: for every node u, attach each LARGER neighbor to
        # the minimum of N(u) ∪ {u}. Emitted per directed adjacency
        # (u, v): group on u, m = least(min(v), u), edge (v, m) for
        # v > u. Keeps big-neighborhood nodes from funneling everything
        # through one reducer key forever: larger nodes re-point in
        # parallel.
        adj = e.select("__u__", "__v__").union(
            e.select(F.col("__v__").alias("__u__"), F.col("__u__").alias("__v__"))
        )
        m = adj.groupBy("__u__").agg(F.min("__v__").alias("__mv__")).select(
            "__u__", F.least(F.col("__mv__"), F.col("__u__")).alias("__m__")
        )
        large = (
            adj.join(m, "__u__")
            .where(F.col("__v__") > F.col("__u__"))
            .select(F.col("__v__").alias("__u__"), F.col("__m__").alias("__v__"))
        )
        e = _canon(large)

        # small-star: for every node u, attach each SMALLER-or-equal
        # neighbor (and u itself) to the minimum of N≤(u) ∪ {u}. On the
        # (hi=u, lo=v) canonical edges: group on u, m = min(v), emit
        # (v, m) for the other small neighbors plus (u, m).
        ms = e.groupBy("__u__").agg(F.min("__v__").alias("__m__"))
        small = (
            e.join(ms, "__u__")
            .select(F.col("__v__").alias("__u__"), F.col("__m__").alias("__v__"))
            .union(ms.select("__u__", F.col("__m__").alias("__v__")))
        )
        e = _canon(small)

        # fixed point = edge SET unchanged (star graphs: every edge is
        # (node, root)). Count equality alone is NOT enough — on a path
        # graph the count stays |V|-1 every round while edges re-point;
        # stopping on count converges to a WRONG labelling. Cheap
        # pre-filter first: (count, order-free hash sum) in ONE job; the
        # authoritative exceptAll set-compare runs only when both match
        # (a hash collision could slip past the pre-filter, so it never
        # decides convergence on its own).
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-free and overflow-free (ANSI sum of int64
            # hashes overflows); edges are distinct so xor is a sound
            # set fingerprint
            F.bit_xor(F.xxhash64("__u__", "__v__")).alias("h"),
        ).first()
        n, h = row["n"], row["h"]
        if n == prev_n and h == prev_h and e.exceptAll(prev).isEmpty():
            break
        n_edges, n_hash = n, h
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; raise max_iterations"
        )

    labels = e.select(
        F.col("__u__").alias("node"), F.col("__v__").alias("component")
    ).union(
        # roots label themselves
        e.select(F.col("__v__").alias("node"), F.col("__v__").alias("component"))
    ).groupBy("node").agg(F.min("component").alias("component"))

    if nodes is not None:
        if node_col is None:
            raise ValueError("nodes= requires node_col=")
        allnodes = nodes.select(F.col(node_col).alias("node")).distinct()
        labels = (
            allnodes.join(labels, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("component"), F.col("node")).alias(
                    "component"
                ),
            )
        )
    return labels


def neardup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    small_graph_threshold: int = 100_000,
    max_iterations: int = 25,
    portable: bool = True,
) -> DataFrame:
    """Full near-dup clustering: MinHash+LSH pairs → connected
    components → ``(id, cluster, is_survivor)``. Every document appears
    exactly once; ``cluster`` is the minimum id of its near-dup
    cluster (itself when unique); ``is_survivor`` marks the one row per
    cluster a dedup keeps (``cluster == id``).
    """
    from pandas_weights_spark.functions.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(
        df,
        text_col,
        id_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_size=shingle_size,
        portable=portable,
    )
    labels = connected_components(
        pairs,
        "id_a",
        "id_b",
        nodes=df,
        node_col=id_col,
        small_graph_threshold=small_graph_threshold,
        max_iterations=max_iterations,
    )
    return labels.select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
    )


def cluster_survivors(
    labels: DataFrame,
    score: Column,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Re-pick each cluster's survivor by QUALITY (r7): real dedup
    keeps the best member of a near-dup family — longest document,
    highest LM/quality score, most recent crawl — not the minimum id
    :func:`neardup_clusters` defaults to. Input: a cluster membership
    table (``neardup_clusters`` output joined with whatever columns
    ``score`` needs); output: the same rows with ``is_survivor``
    recomputed as "member with the maximum score, ties → minimum id,
    NULL scores lowest" (an all-NULL cluster falls back to min-id).

    Shape: :func:`~pandas_weights_spark.functions.dedup.
    argmax_survivors` on the cluster key — two cluster-keyed
    aggregates + two cluster-keyed joins, partitioning reused; no
    window over raw rows."""
    from pandas_weights_spark.functions.dedup import argmax_survivors

    surv = argmax_survivors(
        labels, [cluster_col], id_col, score
    ).withColumnRenamed(id_col, "__sid__")
    return (
        labels.join(surv, cluster_col)
        .withColumn("is_survivor", F.col(id_col) == F.col("__sid__"))
        .drop("__sid__")
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: "Optional[F.Column]" = None,
    iters: int = 10,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, public) over a
    weighted edge list: ``(node, hub, authority)`` after ``iters``
    alternating power iterations with L2 normalization each half-step
    — ``a ← Wᵀh / ||Wᵀh||₂``, then ``h ← Wa / ||Wa||₂`` from
    ``h₀ = 1``. The data-pipeline use is crawl-seed quality on the
    host link graph: authorities are the pages the web points AT with
    good hubs, hubs are the directories/link pages that point at good
    authorities — complementary to :func:`pagerank`'s single
    authority axis.

    ``weight`` (default 1 per edge) scales each endpoint's
    contribution; NULL endpoints and non-positive weights drop.
    Nodes with no in-edges score authority 0, no out-edges hub 0;
    the node universe is the set of edge endpoints.

    Scale shape: the cleaned edge table materializes ONCE (eager
    ``localCheckpoint``, reused every iteration); each iteration is
    two keyed join+groupBy shuffles (one per direction) and two
    broadcast 1-row L2 aggregates, checkpointed to truncate lineage —
    the :func:`pagerank` discipline. Nothing node- or edge-sized
    reaches the driver.

    Determinism: pure algebra over the edge multiset; distributed
    sums vary at ulp level across partitionings (oracle rows round).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    w = weight if weight is not None else F.lit(1.0)
    e = (
        edges.select(
            F.col(src).alias("__s__"),
            F.col(dst).alias("__d__"),
            w.cast("double").alias("__w__"),
        )
        .where(
            F.col("__s__").isNotNull()
            & F.col("__d__").isNotNull()
            & (F.col("__w__") > 0)
        )
        .localCheckpoint(eager=True)
    )
    universe = (
        e.select(F.col("__s__").alias("__n__"))
        .unionByName(e.select(F.col("__d__").alias("__n__")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if universe.isEmpty():
        raise ValueError("hits needs at least one positive-weight edge")

    def _norm_step(
        scores: DataFrame, key: str, other: str, out: str
    ) -> DataFrame:
        # one half-step: raw = Σ w·score(other endpoint) grouped by
        # `key`; normalize by the L2 norm of the raw vector (zeros
        # contribute nothing to the norm, so summing over the contrib
        # table equals summing over the universe)
        raw = (
            e.join(scores, e[other] == scores["__n__"])
            .groupBy(e[key].alias("__k__"))
            .agg(F.sum(F.col("__w__") * F.col("__v__")).alias("__c__"))
        )
        nrm = F.broadcast(
            raw.agg(
                F.sqrt(F.sum(F.col("__c__") * F.col("__c__"))).alias(
                    "__nm__"
                )
            )
        )
        return (
            universe.join(raw, universe["__n__"] == raw["__k__"], "left")
            .crossJoin(nrm)
            .select(
                "__n__",
                (
                    F.coalesce(F.col("__c__"), F.lit(0.0))
                    / F.col("__nm__")
                ).alias(out),
            )
        )

    hub = universe.select("__n__", F.lit(1.0).alias("__v__"))
    auth = None
    for _ in range(iters):
        auth = _norm_step(hub, "__d__", "__s__", "__v__").localCheckpoint(
            eager=True
        )
        hub = _norm_step(auth, "__s__", "__d__", "__v__").localCheckpoint(
            eager=True
        )
    return (
        hub.select(F.col("__n__").alias("node"), F.col("__v__").alias("hub"))
        .join(
            auth.select(
                F.col("__n__").alias("node"),
                F.col("__v__").alias("authority"),
            ),
            "node",
        )
    )
