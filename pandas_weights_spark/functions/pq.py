"""Product quantization for ANN at corpus scale (Jégou, Douze,
Schmid, "Product Quantization for Nearest Neighbor Search", IEEE
TPAMI 2011 — public paper). Completes the engine's quantization
family: IVF cells prune WHERE to look, int8 SQ shrinks bytes 4×, PQ
shrinks them ~32× (d floats → m byte codes) while still supporting
distance computation AGAINST THE CODES — the standard billion-vector
memory layout (FAISS's IVFPQ storage side).

Pieces:

* :func:`train_pq_codebooks` — per-subspace k-means. ONE
  ``mapInPandas`` pass per Lloyd iteration covers ALL ``m``
  subspaces: each partition emits (sub, cell, count, sum-vector)
  partials — at most ``m·k`` rows of ``d/m`` doubles per partition,
  bounded by the codebook size, never the data — tree-merged past 32
  partitions (the classifier/PCA discipline) and finalized on the
  driver. Only codebooks (m·k·d/m doubles) ever reach the driver.
* :func:`pq_encode` — code assignment. ``arrow=True`` (default) is
  one batched ``(n, k)`` distance matmul per subspace per Arrow
  batch; ``arrow=False`` is the Column-expression twin (nested
  codebook literal + struct-min argmin — interpreted, slower, but
  DuckDB-replayable: the oracle path). Both use squared-L2 with ties
  to the LOWEST cell index.
* :func:`topk_pq_adc` — asymmetric distance computation: each FLOAT
  query builds its m×k distance table (Column algebra over the
  codebook literal), queries broadcast against the streamed code
  corpus, per-pair distance is m table lookups + a sum — no float
  vectors move, the corpus side is m small ints per row. Ranking is
  squared-L2 ASCENDING (PQ is a distance method; the cosine family
  ranks descending), ties by neighbor id.
* :func:`topk_ivfpq` — the composed IVF+PQ read path: coarse IVF
  cells prune the candidate set BEFORE ADC (cell equi-join against
  the broadcast probe table), so per-query work is
  ``|corpus|·nprobe/n_cells`` code lookups. ``residual=True`` is the
  FAISS IVFADC design (Jégou 2011 §IV-A: codes quantize
  ``x − centroid(cell)``, one query table per probed cell — the
  recall-efficient layout); ``residual=False`` runs against
  raw-vector codes (documented divergence: simpler, lower recall at
  fixed code size; ``nprobe == n_cells`` then reproduces
  :func:`topk_pq_adc` exactly, the raw anchor).

Determinism: codebooks are driver-side lists (plan literals); the
portable encode path and the ADC algebra are fixed-order IEEE
arithmetic, so a SQL oracle replays codes and distances exactly
(distance sums rounded at 6 dp for rank stability).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "train_pq_codebooks",
    "train_opq_rotation",
    "opq_rotate",
    "pq_encode",
    "topk_pq_adc",
    "topk_ivfpq",
    "topk_ivfpq_refined",
]


def _check_codebooks(codebooks) -> "tuple[int, int, int]":
    m = len(codebooks)
    if m < 1:
        raise ValueError("codebooks must have >= 1 subspace")
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    for cb in codebooks:
        if len(cb) != k or any(len(c) != dsub for c in cb):
            raise ValueError("ragged codebooks (need m × k × d/m)")
    return m, k, dsub


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
    k: int = 256,
    iters: int = 2,
    centroids: "Optional[list[list[float]]]" = None,
    cell_col: str = "cell",
) -> "list[list[list[float]]]":
    """Train per-subspace codebooks: ``m`` independent k-means over
    the ``d/m``-wide subvectors, deterministic init from the ``k``
    lowest-id vectors (the IVF rule). Returns ``m × k × d/m`` plain
    floats (picklable — persist between runs, train-once/encode-many).
    ``d`` must divide evenly by ``m``. Empty cells keep their previous
    centroid (the Lloyd convention the IVF trainer uses).

    ``centroids`` switches on RESIDUAL training (Jégou et al. 2011
    §IV-A, the IVFADC layout): codebooks are fit to ``x −
    centroid(cell(x))`` instead of raw ``x`` — residuals concentrate
    near zero, so a fixed (m, k) code budget buys materially better
    distance resolution once an IVF coarse quantizer exists. ``df``
    must already carry the coarse cell id in ``cell_col`` (assign with
    :func:`~pandas_weights_spark.functions.similarity.
    assign_cells_arrow` — the same assignment MUST be used at
    :func:`pq_encode` time). Rows with a NULL cell are skipped.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if centroids is not None and cell_col not in df.columns:
        raise ValueError(
            f"residual training needs the coarse cell id: column "
            f"{cell_col!r} not in df (run assign_cells_arrow first)"
        )
    cent_np = np.asarray(centroids, float) if centroids is not None else None
    seed_cols = [vec_col] if cent_np is None else [vec_col, cell_col]
    not_null = F.col(vec_col).isNotNull()
    if cent_np is not None:
        not_null = not_null & F.col(cell_col).isNotNull()
    first = (
        df.where(not_null)
        .orderBy(id_col)
        .limit(k)
        .select(*seed_cols)
        .collect()
    )
    if len(first) < k:
        raise ValueError(
            f"need >= k={k} non-null vectors to seed codebooks, "
            f"got {len(first)}"
        )
    d = len(first[0][vec_col])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m

    def _seed_vec(r):
        v = np.asarray([float(x) for x in r[vec_col]], float)
        if cent_np is not None:
            v = v - cent_np[int(r[cell_col])]
        return v

    seeds = np.vstack([_seed_vec(r) for r in first])
    cbs = [
        seeds[:, s * dsub:(s + 1) * dsub].copy() for s in range(m)
    ]

    schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("cnt", T.DoubleType()),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
        ]
    )
    src = df.where(not_null).select(*seed_cols)

    for _ in range(iters):
        cb_local = [c.copy() for c in cbs]

        def partials(batches, _cb=cb_local):
            import pandas as pd

            cnt = [np.zeros(k) for _ in range(m)]
            sums = [np.zeros((k, dsub)) for _ in range(m)]
            seen = False
            for pdf in batches:
                vals = pdf[vec_col]
                keep = vals.notna()
                if cent_np is not None:
                    keep = keep & pdf[cell_col].notna()
                vals = vals[keep]
                if not len(vals):
                    continue
                seen = True
                x = np.vstack([np.asarray(v, float) for v in vals])
                if cent_np is not None:
                    cells = pdf[cell_col][keep].to_numpy(dtype=np.int64)
                    x = x - cent_np[cells]
                for s in range(m):
                    xs = x[:, s * dsub:(s + 1) * dsub]
                    # ||x-c||² = ||x||² - 2x·c + ||c||²; row-constant
                    # ||x||² cancels in the argmin
                    dists = (
                        -2.0 * (xs @ _cb[s].T)
                        + (_cb[s] * _cb[s]).sum(axis=1)[None, :]
                    )
                    idx = np.argmin(dists, axis=1)  # first (lowest) min
                    np.add.at(cnt[s], idx, 1.0)
                    np.add.at(sums[s], idx, xs)
            if seen:
                yield pd.DataFrame(
                    {
                        "sub": [s for s in range(m) for _ in range(k)],
                        "cell": [c for _ in range(m) for c in range(k)],
                        "cnt": [
                            float(cnt[s][c])
                            for s in range(m)
                            for c in range(k)
                        ],
                        "sums": [
                            list(sums[s][c])
                            for s in range(m)
                            for c in range(k)
                        ],
                    }
                )

        def merge(batches):
            import pandas as pd

            cnt = np.zeros((m, k))
            sums = np.zeros((m, k, dsub))
            seen = False
            for pdf in batches:
                for i in range(len(pdf)):
                    seen = True
                    s = int(pdf["sub"].iloc[i])
                    c = int(pdf["cell"].iloc[i])
                    cnt[s, c] += float(pdf["cnt"].iloc[i])
                    sums[s, c] += np.asarray(pdf["sums"].iloc[i], float)
            if seen:
                yield pd.DataFrame(
                    {
                        "sub": [s for s in range(m) for _ in range(k)],
                        "cell": [c for _ in range(m) for c in range(k)],
                        "cnt": [cnt[s, c] for s in range(m) for c in range(k)],
                        "sums": [
                            list(sums[s, c])
                            for s in range(m)
                            for c in range(k)
                        ],
                    }
                )

        part = src.mapInPandas(partials, schema)
        if src.rdd.getNumPartitions() > 32:
            part = part.repartition(8).mapInPandas(merge, schema)
        rows = part.collect()
        cnt = np.zeros((m, k))
        sums = np.zeros((m, k, dsub))
        for r in rows:
            cnt[r["sub"], r["cell"]] += r["cnt"]
            sums[r["sub"], r["cell"]] += np.asarray(r["sums"], float)
        for s in range(m):
            nz = cnt[s] > 0
            cbs[s][nz] = sums[s][nz] / cnt[s][nz, None]
    return [[list(map(float, c)) for c in cb] for cb in cbs]


def train_opq_rotation(
    df: DataFrame,
    vec_col: str,
    m: int,
    center: bool = False,
) -> "list[list[float]]":
    """Parametric OPQ rotation (Ge, He, Ke, Sun, "Optimized Product
    Quantization for Approximate Nearest Neighbor Search", CVPR 2013
    §4 — the eigenvalue-allocation solution, public paper): an
    orthonormal ``d × d`` matrix ``R`` (rows = output coordinates)
    such that PQ on ``R·x`` quantizes strictly better than PQ on raw
    ``x`` when dimensions are correlated or variance is unbalanced —
    the paper's two conditions for optimality are (1) independence
    across subspaces (PCA decorrelates) and (2) balanced per-subspace
    variance PRODUCTS (greedy eigenvalue allocation: eigenvalues
    descending, each assigned to the unfilled bucket with the
    smallest log-product). Typically ~halves ADC error at the same
    code size on anisotropic embeddings.

    Rotation is an ISOMETRY: ``‖Rx − Ry‖ = ‖x − y‖``, so exact
    brute-force rankings are preserved and ADC distances in the
    rotated space estimate ORIGINAL-space distances — compose as
    ``opq_rotate`` → ``train_pq_codebooks`` → ``pq_encode`` →
    ``topk_pq_adc``/``topk_ivfpq`` with queries rotated by the same
    ``R``.

    Scale shape: one :func:`~pandas_weights_spark.functions.pca.
    _embedding_moments` pass (d² doubles per partition, tree-merged
    past 32 partitions), then a driver-side d×d ``eigh`` — the
    pca_fit discipline, driver math on AGGREGATED data only.
    ``center=False`` (default) fits axes on raw second moments (the
    normalized-embedding convention); either way ``R`` applies
    WITHOUT mean subtraction, keeping the isometry exact. Returns
    plain floats (picklable, plan-literal for the SQL oracle).
    """
    from pandas_weights_spark.functions.pca import _embedding_moments

    n, s, g = _embedding_moments(df, vec_col)
    d = len(s)
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n < 2:
        raise ValueError("OPQ needs at least 2 vectors")
    dsub = d // m
    mu = s / n if center else np.zeros(d)
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1]
    # deterministic sign (the pca_fit convention): largest-|coeff|
    # entry of each axis positive, ties to the earliest index
    axes = []
    for idx in order:
        v = vecs[:, idx].copy()
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        axes.append((float(vals[idx]), v))
    # greedy eigenvalue allocation: balance per-bucket log-products
    buckets: "list[list[np.ndarray]]" = [[] for _ in range(m)]
    logp = [0.0] * m
    for lam, v in axes:
        cands = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(cands, key=lambda i: (logp[i], i))
        buckets[b].append(v)
        logp[b] += float(np.log(max(lam, 1e-12)))
    rows = [v for b in buckets for v in b]
    return [[float(x) for x in v] for v in rows]


def opq_rotate(
    df: DataFrame,
    vec_col: str,
    rotation: "list[list[float]]",
    out_col: str = "opq_vec",
    arrow: bool = True,
) -> DataFrame:
    """Apply an OPQ rotation: append ``out_col = R·x`` (length d,
    NULL vectors stay NULL). ``arrow=True`` is one batched matmul per
    Arrow batch (the pca_transform shape); ``arrow=False`` is the
    Column-expression twin — one zip_with/aggregate dot product per
    output coordinate over the rotation LITERAL, the DuckDB-
    replayable oracle path (fold-order sums; agrees with the matmul
    to ulps, tests pin round-6 parity)."""
    rot = [list(map(float, r)) for r in rotation]
    d = len(rot)
    if any(len(r) != d for r in rot):
        raise ValueError("rotation must be a square d × d matrix")
    if not arrow:
        v = F.col(vec_col)

        def dot(row: "list[float]") -> Column:
            return F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(x) for x in row]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        out = F.array(*[dot(r) for r in rot])
        return df.select(
            *df.columns, F.when(v.isNotNull(), out).alias(out_col)
        )
    rmat = np.asarray(rot, float)
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )
    cols = df.columns

    def run(batches):
        import pandas as pd

        for pdf in batches:
            vals = pdf[vec_col]
            mask = vals.notna().to_numpy()
            res = np.empty(len(pdf), dtype=object)
            res[~mask] = None
            if mask.any():
                x = np.vstack([np.asarray(v, float) for v in vals[mask]])
                proj = x @ rmat.T
                lists = np.empty(proj.shape[0], dtype=object)
                for i in range(proj.shape[0]):
                    lists[i] = list(proj[i])
                res[mask] = lists
            yield pd.DataFrame({**{c: pdf[c] for c in cols}, out_col: res})

    return df.mapInPandas(run, out_schema)


def _sub_slice(vec: Column, s: int, dsub: int) -> Column:
    return F.slice(vec, s * dsub + 1, dsub)


def _sub_dist(sub_vec: Column, entry: "list[float]") -> Column:
    """Squared L2 distance of a subvector against one codebook entry —
    sequential fold (deterministic, SQL-replayable as a + chain)."""
    return F.aggregate(
        F.zip_with(
            sub_vec,
            F.array(*[F.lit(float(x)) for x in entry]),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sub_code(vec: Column, s: int, dsub: int, codebook) -> Column:
    """Argmin-distance code for subspace ``s`` — struct-min over
    (dist, idx): ties pick the LOWEST index, matching np.argmin."""
    sv = _sub_slice(vec, s, dsub)
    scored = F.array(
        *[
            F.struct(
                _sub_dist(sv, entry).alias("d"), F.lit(j).alias("i")
            )
            for j, entry in enumerate(codebook)
        ]
    )
    return F.array_min(scored)["i"]


def _residual_expr(vec: Column, cell: Column, centroids) -> Column:
    """``vec − centroid(cell)`` as one zip_with over the centroid
    matrix literal — the portable residual the SQL oracle replays as
    the same ``(x − c)`` term-by-term subtraction."""
    cent = F.lit([[float(x) for x in c] for c in centroids])
    return F.zip_with(
        vec, F.element_at(cent, cell + 1),
        lambda a, b: a.cast("double") - b,
    )


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: "list[list[list[float]]]",
    out_col: str = "pq_code",
    arrow: bool = True,
    centroids: "Optional[list[list[float]]]" = None,
    cell_col: str = "cell",
) -> DataFrame:
    """Append the ``m``-int code array: per subspace, the index of the
    nearest codebook entry (squared L2, ties → lowest index). NULL
    vectors get NULL codes. ``arrow=False`` is the Column-expression
    oracle path (identical argmin up to fold-vs-matmul ulps at exact
    ties — on real data the two agree exactly; tests pin it).

    ``centroids`` switches on RESIDUAL encoding (IVFADC): the encoded
    vector is ``x − centroid(cell)``, with the coarse cell read from
    ``cell_col`` (must be the same assignment the index serves at
    query time — build it once with ``assign_cells_arrow`` and train
    the codebooks with the same ``centroids``). Rows with a NULL cell
    get NULL codes."""
    m, k, dsub = _check_codebooks(codebooks)
    if centroids is not None and cell_col not in df.columns:
        raise ValueError(
            f"residual encoding needs the coarse cell id: column "
            f"{cell_col!r} not in df (run assign_cells_arrow first)"
        )
    if not arrow:
        v = F.col(vec_col)
        ok = v.isNotNull()
        target = v
        if centroids is not None:
            ok = ok & F.col(cell_col).isNotNull()
            target = _residual_expr(v, F.col(cell_col), centroids)
        codes = F.array(
            *[_sub_code(target, s, dsub, codebooks[s]) for s in range(m)]
        )
        return df.select(
            *df.columns, F.when(ok, codes).alias(out_col)
        )
    cbs = [np.asarray(cb, float) for cb in codebooks]
    cent_np = np.asarray(centroids, float) if centroids is not None else None
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )
    cols = df.columns

    def run(batches):
        import pandas as pd

        for pdf in batches:
            vals = pdf[vec_col]
            keep = vals.notna()
            if cent_np is not None:
                keep = keep & pdf[cell_col].notna()
            mask = keep.to_numpy()
            res = np.empty(len(pdf), dtype=object)
            res[~mask] = None
            if mask.any():
                x = np.vstack([np.asarray(v, float) for v in vals[mask]])
                if cent_np is not None:
                    cells = pdf[cell_col].to_numpy()[mask].astype(np.int64)
                    x = x - cent_np[cells]
                codes = np.empty((x.shape[0], m), dtype=np.int64)
                for s in range(m):
                    xs = x[:, s * dsub:(s + 1) * dsub]
                    dists = (
                        -2.0 * (xs @ cbs[s].T)
                        + (cbs[s] * cbs[s]).sum(axis=1)[None, :]
                    )
                    codes[:, s] = np.argmin(dists, axis=1)
                lists = np.empty(codes.shape[0], dtype=object)
                for i in range(codes.shape[0]):
                    lists[i] = [int(c) for c in codes[i]]
                res[mask] = lists
            yield pd.DataFrame({**{c: pdf[c] for c in cols}, out_col: res})

    return df.mapInPandas(run, out_schema)


def topk_pq_adc(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: "list[list[list[float]]]",
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    code_col: str = "pq_code",
    arrow: bool = True,
) -> DataFrame:
    """Asymmetric-distance top-k: float queries against the CODED
    corpus. Each query precomputes its m×k squared-L2 distance table
    (|Q|·m·k work total, not per pair); per (query, code) distance is
    ``Σ_s T[s][code_s]`` — m table lookups, no float vectors on the
    corpus side. Output ``(query_id, neighbor_id, dist, rank)``,
    ``dist`` ascending (squared L2, 6-dp rounded), ties by neighbor.

    ``arrow=True`` (default — the scale path): queries ship in the
    task closure (they are small by the same contract every top-k
    path here broadcasts them under), each Arrow batch is one fancy-
    indexed numpy sum per query, and each PARTITION emits only its
    local top-k per query (argpartition) — candidate traffic is
    |Q|·k·partitions, not |Q|·|corpus|. ``arrow=False`` is the
    Column-algebra twin the DuckDB oracle replays (interpreted
    nested-array lookups — measured 30× slower at 100k codes).
    """
    from pandas_weights_spark.topk import partitioned_topk

    m, kk, dsub = _check_codebooks(codebooks)
    qv = F.col(query_vec)
    if arrow:
        cbs = [np.asarray(cb, float) for cb in codebooks]
        qrows = (
            queries.where(qv.isNotNull())
            .select(F.col(query_id).alias("query_id"), qv.alias("__q__"))
            .collect()
        )
        tables = []
        for r in qrows:
            x = np.asarray(r["__q__"], float)
            t = np.empty((m, kk))
            for s in range(m):
                xs = x[s * dsub:(s + 1) * dsub]
                t[s] = ((xs[None, :] - cbs[s]) ** 2).sum(axis=1)
            tables.append((r["query_id"], t))
        out_schema = T.StructType(
            [
                queries.schema[query_id],
                T.StructField(
                    "neighbor_id", codes.schema[corpus_id].dataType
                ),
                T.StructField("dist", T.DoubleType()),
            ]
        )
        sub_idx = np.arange(m)

        def run(batches):
            import pandas as pd

            ids: list = []
            code_rows: list = []
            for pdf in batches:
                vals = pdf[code_col]
                mask = vals.notna().to_numpy()
                if mask.any():
                    ids.extend(pdf[corpus_id].to_numpy()[mask])
                    code_rows.extend(
                        np.asarray(v, dtype=np.int64) for v in vals[mask]
                    )
            if not ids:
                return
            C = np.vstack(code_rows)  # n × m
            idv = np.asarray(ids)
            outs = {query_id: [], "neighbor_id": [], "dist": []}
            for qid, t in tables:
                d = np.round(t[sub_idx[None, :], C].sum(axis=1), 6)
                take = min(int(k), len(d))
                # lexsort (dist, neighbor): the partition-local cut
                # honors the SAME tie rule as the final rank — a
                # plain argpartition could drop the lower-id member
                # of a tie straddling the k boundary
                order = np.lexsort((idv, d))[:take]
                outs[query_id].extend([qid] * take)
                outs["neighbor_id"].extend(idv[order])
                outs["dist"].extend(d[order])
            yield pd.DataFrame(outs)

        cand = codes.mapInPandas(run, out_schema).withColumnRenamed(
            query_id, "query_id"
        )
        return partitioned_topk(
            cand,
            part_by=["query_id"],
            order_by=[F.col("dist").asc(), F.col("neighbor_id")],
            k=k,
            salt_by=["neighbor_id"],
            rank_col="rank",
        ).select("query_id", "neighbor_id", "dist", "rank")
    table = F.array(
        *[
            F.array(
                *[
                    _sub_dist(_sub_slice(qv, s, dsub), entry)
                    for entry in codebooks[s]
                ]
            )
            for s in range(m)
        ]
    )
    q = F.broadcast(
        queries.where(qv.isNotNull()).select(
            F.col(query_id).alias("query_id"), table.alias("__t__")
        )
    )
    c = codes.where(F.col(code_col).isNotNull()).select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(code_col).alias("__c__"),
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("__t__"),
            F.col("__c__"),
            lambda t, cc: F.get(t, cc),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = c.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        F.round(dist, 6).alias("dist"),
    )
    return partitioned_topk(
        scored,
        part_by=["query_id"],
        order_by=[F.col("dist").asc(), F.col("neighbor_id")],
        k=k,
        salt_by=["neighbor_id"],
        rank_col="rank",
    ).select("query_id", "neighbor_id", "dist", "rank")

def topk_ivfpq(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: "list[list[list[float]]]",
    centroids: "list[list[float]]",
    k: int,
    nprobe: int = 4,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    code_col: str = "pq_code",
    cell_col: str = "cell",
    arrow: bool = True,
    residual: bool = False,
) -> DataFrame:
    """IVF + PQ composed: each query probes its ``nprobe`` nearest
    coarse cells (cosine argmax over the ``centroids`` literal), and
    asymmetric PQ distance is evaluated ONLY inside probed cells —
    candidate work is ``|corpus| · nprobe / n_cells`` per query
    instead of the full corpus, and the corpus side still moves only
    ``m`` small ints per row.

    ``residual=True`` is the FAISS IVFADC read path (Jégou et al.
    2011 §IV-A): codes must have been produced by :func:`pq_encode`
    ``(centroids=...)`` — they quantize ``x − centroid(cell)`` — and
    each query builds ONE m×k distance table PER PROBED CELL from
    ``q − centroid(cell)`` (nprobe small tables instead of one; the
    corpus side is unchanged). Residual coding is what buys recall at
    a fixed (m, k) code budget once a coarse quantizer exists.

    ``residual=False`` (default) runs ADC against RAW-vector PQ codes
    — a documented divergence from the FAISS design: simpler (one
    table per query, and the codes double as a cell-free
    :func:`topk_pq_adc` corpus) but measurably lower recall at the
    same code size (tests pin recall(residual) ≥ recall(raw)).

    ``arrow=True`` (default) mirrors :func:`topk_pq_adc`'s scale
    path: queries, their probe sets, and their distance tables ship
    in the task closure; the corpus pre-filters to the UNION of
    probed cells (partition-prunable predicate), each Arrow batch is
    per-query masked fancy-indexed sums, and each partition emits
    only its local top-k with the final tie rule. ``arrow=False`` is
    the Column twin the oracle replays.

    ``codes`` must carry the coarse ``cell_col`` — build the index
    table once with :func:`pq_encode` +
    :func:`~pandas_weights_spark.functions.similarity.
    assign_cells_arrow` while the float vectors are still present,
    then drop the vectors (the whole point of the layout).

    The probe table (|Q|·nprobe rows with each query's m×k distance
    table) broadcasts; the cell equi-join IS the pruning — no shuffle
    of the corpus. In raw mode ``nprobe == len(centroids)`` probes
    everything and must reproduce :func:`topk_pq_adc` exactly (the
    IVF family's correctness anchor; pinned by tests and the driver
    oracle); in residual mode probe-all equals the closed-form
    per-cell ADC the SQL oracle replays.
    Output ``(query_id, neighbor_id, dist, rank)``, squared-L2
    ascending, ties by neighbor; missed true neighbors in unprobed
    cells are the approximation, recall is tunable via ``nprobe``.
    """
    from pandas_weights_spark.functions.similarity import probe_cells
    from pandas_weights_spark.topk import partitioned_topk

    m, kk, dsub = _check_codebooks(codebooks)
    if not 1 <= nprobe <= len(centroids):
        raise ValueError("nprobe must be in [1, n_cells]")
    qv = F.col(query_vec)
    if arrow:
        import math as _math

        from pandas_weights_spark.topk import partitioned_topk

        cbs = [np.asarray(cb, float) for cb in codebooks]
        units = []
        for c in centroids:
            nrm = _math.sqrt(sum(x * x for x in c)) or 1.0
            units.append([x / nrm for x in c])
        u = np.asarray(units, float)
        qrows = (
            queries.where(qv.isNotNull())
            .select(F.col(query_id).alias("query_id"), qv.alias("__q__"))
            .collect()
        )
        cent_np = np.asarray(centroids, float)

        def _table(vec):
            t = np.empty((m, kk))
            for s in range(m):
                xs = vec[s * dsub:(s + 1) * dsub]
                t[s] = ((xs[None, :] - cbs[s]) ** 2).sum(axis=1)
            return t

        plans = []
        union_cells: set = set()
        for r in qrows:
            x = np.asarray(r["__q__"], float)
            scores = u @ x
            # probe_cells order: similarity desc, ties -> larger index
            order = sorted(
                range(len(centroids)),
                key=lambda j: (-scores[j], -j),
            )[: int(nprobe)]
            cells = frozenset(order)
            union_cells |= cells
            if residual:
                # IVFADC: one table per probed cell from q − c_cell
                tmap = {cell: _table(x - cent_np[cell]) for cell in cells}
                plans.append((r["query_id"], tmap, cells))
            else:
                plans.append((r["query_id"], _table(x), cells))
        out_schema = T.StructType(
            [
                queries.schema[query_id],
                T.StructField(
                    "neighbor_id", codes.schema[corpus_id].dataType
                ),
                T.StructField("dist", T.DoubleType()),
            ]
        )
        sub_idx = np.arange(m)

        def run(batches):
            import pandas as pd

            ids: list = []
            code_rows: list = []
            cell_vals: list = []
            for pdf in batches:
                vals = pdf[code_col]
                mask = (
                    vals.notna() & pdf[cell_col].notna()
                ).to_numpy()
                if mask.any():
                    ids.extend(pdf[corpus_id].to_numpy()[mask])
                    cell_vals.extend(pdf[cell_col].to_numpy()[mask])
                    code_rows.extend(
                        np.asarray(v, dtype=np.int64) for v in vals[mask]
                    )
            if not ids:
                return
            C = np.vstack(code_rows)
            idv = np.asarray(ids)
            cellv = np.asarray(cell_vals, dtype=np.int64)
            outs = {query_id: [], "neighbor_id": [], "dist": []}
            for qid, t, cells in plans:
                qmask = np.isin(cellv, list(cells))
                if not qmask.any():
                    continue
                subC = C[qmask]
                sub_ids = idv[qmask]
                if residual:
                    sub_cells = cellv[qmask]
                    d = np.empty(len(sub_ids))
                    for cell in cells:
                        cm = sub_cells == cell
                        if cm.any():
                            d[cm] = t[cell][
                                sub_idx[None, :], subC[cm]
                            ].sum(axis=1)
                    d = np.round(d, 6)
                else:
                    d = np.round(
                        t[sub_idx[None, :], subC].sum(axis=1), 6
                    )
                take = min(int(k), len(d))
                order = np.lexsort((sub_ids, d))[:take]
                outs[query_id].extend([qid] * take)
                outs["neighbor_id"].extend(sub_ids[order])
                outs["dist"].extend(d[order])
            yield pd.DataFrame(outs)

        filtered = codes.where(
            F.col(cell_col).isin(sorted(union_cells))
        )
        cand = filtered.mapInPandas(run, out_schema).withColumnRenamed(
            query_id, "query_id"
        )
        return partitioned_topk(
            cand,
            part_by=["query_id"],
            order_by=[F.col("dist").asc(), F.col("neighbor_id")],
            k=k,
            salt_by=["neighbor_id"],
            rank_col="rank",
        ).select("query_id", "neighbor_id", "dist", "rank")
    if residual:
        # per-(query, probed-cell) table over q − c_cell: the explode
        # runs first, then the residual/table algebra on each probe
        # row (the oracle path — expression size is m·k·d per probe
        # row, fine at oracle scale; arrow=True is the scale path)
        base = queries.where(qv.isNotNull()).select(
            F.col(query_id).alias("query_id"),
            qv.alias("__qv__"),
            F.explode(probe_cells(qv, centroids, nprobe)).alias(
                cell_col
            ),
        )
        rvec = _residual_expr(
            F.col("__qv__"), F.col(cell_col), centroids
        )
        table = F.array(
            *[
                F.array(
                    *[
                        _sub_dist(_sub_slice(rvec, s, dsub), entry)
                        for entry in codebooks[s]
                    ]
                )
                for s in range(m)
            ]
        )
        probes = F.broadcast(
            base.select(
                "query_id", table.alias("__t__"), F.col(cell_col)
            )
        )
    else:
        table = F.array(
            *[
                F.array(
                    *[
                        _sub_dist(_sub_slice(qv, s, dsub), entry)
                        for entry in codebooks[s]
                    ]
                )
                for s in range(m)
            ]
        )
        probes = F.broadcast(
            queries.where(qv.isNotNull())
            .select(
                F.col(query_id).alias("query_id"),
                table.alias("__t__"),
                F.explode(probe_cells(qv, centroids, nprobe)).alias(
                    cell_col
                ),
            )
        )
    c = codes.where(F.col(code_col).isNotNull()).select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(code_col).alias("__c__"),
        F.col(cell_col),
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("__t__"),
            F.col("__c__"),
            lambda t, cc: F.get(t, cc),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = c.join(probes, cell_col).select(
        "query_id",
        "neighbor_id",
        F.round(dist, 6).alias("dist"),
    )
    return partitioned_topk(
        scored,
        part_by=["query_id"],
        order_by=[F.col("dist").asc(), F.col("neighbor_id")],
        k=k,
        salt_by=["neighbor_id"],
        rank_col="rank",
    ).select("query_id", "neighbor_id", "dist", "rank")

def topk_ivfpq_refined(
    queries: DataFrame,
    codes: DataFrame,
    vectors: DataFrame,
    codebooks: "list[list[list[float]]]",
    centroids: "list[list[float]]",
    k: int,
    refine_factor: int = 4,
    nprobe: int = 4,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    code_col: str = "pq_code",
    cell_col: str = "cell",
    arrow: bool = True,
    residual: bool = False,
) -> DataFrame:
    """IVFPQ + EXACT re-rank — the FAISS refine stage (IndexRefineFlat
    over an IVFPQ base): :func:`topk_ivfpq` retrieves ``k ·
    refine_factor`` candidates from the CODED corpus (cheap,
    approximate distances), then the final ``k`` are re-ranked with
    exact squared-L2 against the RAW float vectors — fetched by a
    candidate-keyed join against ``vectors``, so float vectors move
    only for the ``|Q|·k·refine_factor`` candidate rows, never the
    corpus. Code-quantization error then affects only WHICH candidates
    surface, not the reported distances or their order; recall is
    tunable with ``refine_factor`` (and ``nprobe``) instead of code
    size. Output ``(query_id, neighbor_id, dist, rank)``, exact
    squared-L2 ascending (6-dp rounded), ties by neighbor.

    With ``nprobe == n_cells`` and ``k · refine_factor ≥ |corpus|``
    the result IS exact brute-force top-k (pinned by tests).
    """
    from pandas_weights_spark.topk import partitioned_topk

    if refine_factor < 1:
        raise ValueError("refine_factor must be >= 1")
    cand = topk_ivfpq(
        queries, codes, codebooks, centroids, k=int(k) * int(refine_factor),
        nprobe=nprobe, query_id=query_id, corpus_id=corpus_id,
        query_vec=query_vec, code_col=code_col, cell_col=cell_col,
        arrow=arrow, residual=residual,
    ).select("query_id", "neighbor_id")
    cvec = vectors.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv__"),
    )
    qvec = F.broadcast(
        queries.where(F.col(query_vec).isNotNull()).select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("__qv__"),
        )
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("__qv__"),
            F.col("__cv__"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = (
        cand.join(cvec, "neighbor_id")
        .join(qvec, "query_id")
        .select(
            "query_id", "neighbor_id", F.round(dist, 6).alias("dist")
        )
    )
    return partitioned_topk(
        exact,
        part_by=["query_id"],
        order_by=[F.col("dist").asc(), F.col("neighbor_id")],
        k=k,
        salt_by=["neighbor_id"],
        rank_col="rank",
    ).select("query_id", "neighbor_id", "dist", "rank")
