"""PCA over embedding columns — the dimensionality-reduction /
whitening step in front of ANN indexes and embedding dedup (reduce
``array<float>`` columns before IVF/LSH; the reference has no vector
surface at all, SURVEY.md §2.6).

Scale shape (the regression.py pattern — numpy ABOVE the aggregate):

1. ``_embedding_moments`` — ``mapInPandas`` partials: each input
   partition reduces to ONE row carrying (n, Σx vector, XᵀX Gram
   matrix, flattened) — d² doubles per partition regardless of row
   count; the driver sums the ≤ #partitions rows (bounded collect,
   like calibration's joint-cell table).
2. ``pca_fit`` — covariance from the moments, ``numpy.linalg.eigh`` on
   the d×d matrix DRIVER-side (d is embedding width: 64–4096 — driver
   math on aggregated data only), top-k eigenvectors with a
   deterministic sign convention (largest-|coefficient| entry made
   positive, ties to the earliest index).
3. ``pca_transform`` — Arrow-batched matmul per batch
   (``(X − μ) @ Wᵀ``): the one place numpy beats JVM expressions
   honestly (k×d multiply-adds per row vectorize across the batch).

Determinism: moments are exact sums; eigenvalues are LAPACK-stable;
the sign convention removes the eigenvector ambiguity. Eigenvector
DEGENERACY (repeated eigenvalues) remains inherently unstable —
documented, as in every PCA implementation.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["PCAModel", "pca_fit", "pca_transform",
           "jl_projection_matrix", "random_project"]


class PCAModel(NamedTuple):
    """Driver-side PCA state: plain Python lists (broadcastable,
    picklable, JSON-serializable for checkpointing)."""

    mean: list  # length d
    components: list  # k rows of length d (rows = principal axes)
    explained_variance: list  # length k, descending
    n: int

    @property
    def d(self) -> int:
        return len(self.mean)

    @property
    def k(self) -> int:
        return len(self.components)


# two-level merge trigger/width (r6, VERDICT r5 item 4): partials are
# d² doubles per partition — at d=2048 with hundreds of partitions the
# single-level driver collect ingests GBs. Above _MERGE_THRESHOLD
# input partitions, one intermediate mapInPandas round (the tdigest
# two-level pattern) reduces the partials to ≤ _MERGE_PARTITIONS rows
# before the driver sum, bounding driver ingest at
# _MERGE_PARTITIONS · d² doubles regardless of cluster width.
_MERGE_THRESHOLD = 32
_MERGE_PARTITIONS = 8


def _moment_rows(df: DataFrame, vec_col: str) -> list:
    """The collected (n, Σx, XᵀX) partial rows — one per partition
    below ``_MERGE_THRESHOLD`` input partitions, at most
    ``_MERGE_PARTITIONS`` above (tree-merged executor-side). Split out
    from :func:`_embedding_moments` so the bounded-ingest contract is
    directly testable."""
    src = df.select(F.col(vec_col).alias("__v__")).where(
        F.col("__v__").isNotNull()
    )
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches):
        import pandas as pd

        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, float) for v in pdf["__v__"]])
            if x.ndim != 2:
                raise ValueError(
                    f"{vec_col!r} must be fixed-width arrays (got ragged "
                    "or empty vectors)"
                )
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [list(s)], "g": [list(g.ravel())]}
            )

    def merge(batches):
        import pandas as pd

        n = 0
        s = None
        g = None
        for pdf in batches:
            for i in range(len(pdf)):
                n += int(pdf["n"].iloc[i])
                sv = np.asarray(pdf["s"].iloc[i], float)
                gv = np.asarray(pdf["g"].iloc[i], float)
                s = sv if s is None else s + sv
                g = gv if g is None else g + gv
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [list(s)], "g": [list(g)]}
            )

    part = src.mapInPandas(partials, schema)
    if src.rdd.getNumPartitions() > _MERGE_THRESHOLD:
        part = part.repartition(_MERGE_PARTITIONS).mapInPandas(
            merge, schema
        )
    return part.collect()


def _embedding_moments(df: DataFrame, vec_col: str):
    """(n, sum vector, Gram matrix) of an ``array`` column: per-
    partition numpy partials (tree-merged executor-side past
    ``_MERGE_THRESHOLD`` partitions) → driver sum of a BOUNDED row
    set. Rows with NULL vectors drop; a ragged width raises
    (embeddings must be fixed-width)."""
    rows = _moment_rows(df, vec_col)
    if not rows:
        raise ValueError("no non-NULL vectors to fit")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"], float) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"], float) for r in rows], axis=0)
    d = len(s)
    return n, s, g.reshape(d, d)


def pca_fit(
    df: DataFrame,
    vec_col: str,
    k: Optional[int] = None,
    center: bool = True,
) -> PCAModel:
    """Fit PCA on an embedding column: top-``k`` principal axes of the
    (centered) covariance, deterministic signs, descending explained
    variance. ``center=False`` fits on raw second moments (the common
    choice for already-normalized embeddings)."""
    n, s, g = _embedding_moments(df, vec_col)
    d = len(s)
    k = d if k is None else int(k)
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    mu = s / n if center else np.zeros(d)
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k × d
    # deterministic sign: the largest-|coeff| entry (earliest on ties)
    # of each axis is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=[float(x) for x in mu],
        components=[[float(x) for x in row] for row in comps],
        explained_variance=[float(vals[o]) for o in order],
        n=int(n),
    )


def pca_transform(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Project the embedding column onto the model's axes: input schema
    + ``out_col array<double>`` of length k (NULL vectors stay NULL).
    ``whiten=True`` scales each coordinate by 1/√variance (unit-
    variance output — the preprocessing IVF k-means likes).

    Arrow-batched ``mapInPandas`` matmul; the model travels in the
    task closure (k·d floats)."""
    mu = np.asarray(model.mean, float)
    w = np.asarray(model.components, float)
    if whiten:
        scale = 1.0 / np.sqrt(
            np.maximum(np.asarray(model.explained_variance, float), 1e-30)
        )
        w = w * scale[:, None]
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
                # ONE batch matmul over the non-null rows (the per-row
                # loop measured ~3x slower at 1M vectors)
                x = np.vstack(
                    [np.asarray(v, float) for v in vals[mask]]
                )
                proj = (x - mu) @ w.T
                lists = np.empty(proj.shape[0], dtype=object)
                for i in range(proj.shape[0]):
                    lists[i] = list(proj[i])
                res[mask] = lists
            yield pd.DataFrame(
                {**{c: pdf[c] for c in cols}, out_col: res}
            )

    return df.mapInPandas(run, out_schema)


def jl_projection_matrix(
    d_in: int, d_out: int, seed: int = 42
) -> "list[list[float]]":
    """Deterministic Johnson–Lindenstrauss projection matrix
    (``d_out`` rows of ``d_in`` Gaussians scaled by ``1/√d_out`` —
    Johnson & Lindenstrauss 1984 / Indyk & Motwani 1998, public):
    driver-side plain floats, a plan literal, identical on every
    executor and every run. Pairwise distances are preserved within
    ``ε`` for ``d_out = O(log n / ε²)`` — the data-INDEPENDENT
    complement to :func:`pca_fit` (no training pass, streaming-safe,
    fixed for the lifetime of a corpus so incremental batches embed
    consistently)."""
    import random as _random

    if d_out < 1 or d_in < 1:
        raise ValueError("d_in and d_out must be >= 1")
    rng = _random.Random(seed)
    scale = 1.0 / math.sqrt(float(d_out))
    return [
        [rng.gauss(0.0, 1.0) * scale for _ in range(d_in)]
        for _ in range(d_out)
    ]


def random_project(
    df: DataFrame,
    vec_col: str,
    d_out: int,
    seed: int = 42,
    out_col: str = "rp",
    arrow: bool = True,
) -> DataFrame:
    """Append the JL random projection of the embedding column:
    input schema + ``out_col array<double>`` of length ``d_out``
    (NULL vectors stay NULL). ``arrow=True`` is one batch matmul per
    Arrow batch (the :func:`pca_transform` shape); ``arrow=False``
    is the Column-expression twin — per output dim a sequential
    zip_with/aggregate dot against the matrix-row literal, fixed
    IEEE order, so a SQL oracle replays it digit-for-digit.

    The input width is probed from the data (max non-null size —
    NOT ``.first()``, which a NULL first row would poison); ragged
    vector columns are an error.
    """
    probe = df.where(F.col(vec_col).isNotNull()).agg(
        F.min(F.size(F.col(vec_col))).alias("lo"),
        F.max(F.size(F.col(vec_col))).alias("hi"),
    ).collect()[0]
    if probe["hi"] is None:
        raise ValueError("no non-null vectors to project")
    if probe["lo"] != probe["hi"]:
        raise ValueError(
            f"ragged vector column: sizes {probe['lo']}..{probe['hi']}"
        )
    d_in = int(probe["hi"])
    mat = jl_projection_matrix(d_in, int(d_out), seed)
    if not arrow:
        v = F.col(vec_col)
        dots = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(float(x)) for x in row]),
                        lambda a, b: a.cast("double") * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for row in mat
            ]
        )
        return df.select(
            *df.columns, F.when(v.isNotNull(), dots).alias(out_col)
        )
    w = np.asarray(mat, float)  # d_out x d_in
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
                proj = x @ w.T
                lists = np.empty(proj.shape[0], dtype=object)
                for i in range(proj.shape[0]):
                    lists[i] = list(proj[i])
                res[mask] = lists
            yield pd.DataFrame({**{c: pdf[c] for c in cols}, out_col: res})

    return df.mapInPandas(run, out_schema)
