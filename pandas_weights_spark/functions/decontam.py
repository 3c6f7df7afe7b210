"""Benchmark decontamination: n-gram overlap against a reference set.

The standard pretraining hygiene step (GPT-3 appendix C / Llama
style): a training document is contaminated when a large fraction of
its word n-grams (n=13 is the common choice) also occur in an
evaluation benchmark. This is ASYMMETRIC containment — the doc's
shingles against the benchmark's shingle SET — not the symmetric
Jaccard the near-dup pipelines use (functions/dedup.py).

Scale design: shingle sets stay distributed end to end —

1. per-doc DISTINCT shingles (row-local ``array_distinct`` before the
   explode, so a shingle repeated inside one doc costs one row);
2. the benchmark's distinct shingle set, built the same way;
3. ONE left join doc-shingle → benchmark-shingle. The benchmark side
   is a benchmark (thousands of eval rows vs billions of training
   docs), so it is broadcast by default — the join is map-side, and
   the only shuffle in the whole pipeline is the per-doc hit-count
   aggregation, which combines map-side first.
4. ``hash_shingles=True`` joins on ``xxhash64(shingle)`` instead of
   the string — ~8 bytes vs ~80 through both the broadcast and the
   shuffle. Results are identical absent 64-bit collisions; the
   driver oracle row runs with strings so DuckDB replays it exactly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_weights_spark.functions.text import word_ngrams

__all__ = [
    "ngram_overlap",
    "decontaminate",
    "semantic_overlap",
    "semantic_decontaminate",
]


def _shingle_rows(
    df: DataFrame, text_col: str, n: int, hash_shingles: bool, keep
) -> DataFrame:
    sh = F.explode(
        F.array_distinct(word_ngrams(F.col(text_col), n))
    ).alias("__sh__")
    out = df.select(*keep, sh)
    if hash_shingles:
        out = out.select(*keep, F.xxhash64("__sh__").alias("__sh__"))
    return out


def ngram_overlap(
    df: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: DataFrame,
    bench_text_col: Optional[str] = None,
    n: int = 13,
    threshold: float = 0.8,
    hash_shingles: bool = True,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document benchmark overlap: ``(id_col, n_shingles, n_hits,
    overlap_frac, contaminated)``.

    ``overlap_frac`` = fraction of the doc's distinct word ``n``-grams
    present in ``benchmark``'s distinct shingle set;  ``contaminated``
    = ``overlap_frac >= threshold``. Docs shorter than ``n`` words
    contribute their whole text as one shingle (word_ngrams semantics),
    so short exact copies of benchmark rows are still caught.

    ``broadcast_benchmark=False`` switches to a shuffled join for a
    benchmark too large to broadcast; same semantics.
    """
    bt = bench_text_col or text_col
    doc_sh = _shingle_rows(df, text_col, n, hash_shingles, [id_col])
    bench_sh = (
        _shingle_rows(benchmark, bt, n, hash_shingles, [])
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    joined = doc_sh.join(bench_sh, "__sh__", "left")
    frac = F.try_divide(
        F.sum("__hit__").cast("double"),
        F.count(F.lit(1)).cast("double"),
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(F.sum("__hit__"), F.lit(0)).cast("long").alias("n_hits"),
        F.coalesce(frac, F.lit(0.0)).alias("overlap_frac"),
        (F.coalesce(frac, F.lit(0.0)) >= F.lit(float(threshold))).alias(
            "contaminated"
        ),
    )


def decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: DataFrame,
    bench_text_col: Optional[str] = None,
    n: int = 13,
    threshold: float = 0.8,
    hash_shingles: bool = True,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """``df`` minus contaminated documents (same columns as ``df``).

    One extra broadcast-able join of the contaminated id list back to
    the corpus — the id list is ≤ the contamination rate × corpus,
    typically tiny; for a pathological benchmark that flags most of
    the corpus, pre-filter with :func:`ngram_overlap` instead.
    """
    flagged = ngram_overlap(
        df, text_col, id_col, benchmark, bench_text_col,
        n=n, threshold=threshold, hash_shingles=hash_shingles,
        broadcast_benchmark=broadcast_benchmark,
    ).where(F.col("contaminated")).select(id_col)
    return df.join(F.broadcast(flagged), id_col, "left_anti")


def semantic_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    bench_id: str = "vec_id",
    bench_vec: str = "embedding",
    arrow: bool = False,
) -> DataFrame:
    """Embedding-level decontamination: for every corpus vector, the
    maximum cosine against the benchmark's embedding set, the nearest
    benchmark row, and ``contaminated = max_cosine >= threshold``.

    The semantic complement of :func:`ngram_overlap` — paraphrased or
    reformatted benchmark leakage that shares no 13-gram still lands
    at cosine ≈ 1 (the D4/"semantic decontamination" step of modern
    pipelines, e.g. Phi/DataComp-style near-match filtering).

    Scale shape: the benchmark is an EVAL SET — thousands of rows by
    definition — so it broadcasts; the corpus streams through a
    map-side broadcast nested-loop pass, and the only shuffle is the
    per-corpus-id max aggregation (map-side combine first, one row per
    corpus vector survives the map side). Nothing is ever collected;
    argmax ties break to the smaller benchmark id via the struct-max
    fold. Output: ``(corpus_id, max_cosine, nearest_bench_id,
    contaminated)``.

    ``arrow=True`` is the fast path: the benchmark COLLECTS to a
    model-sized numpy matrix (eval sets are LID-profile-sized, the
    sanctioned bounded collect) and one ``mapInPandas`` matmul scores
    each corpus batch — ZERO shuffle, no join node at all; the
    interpreted per-pair HOF dot (2.9 s at the sf0.1 bench shape)
    drops to matmul speed. Same ties-to-smaller-id argmax; cosines
    differ only at matmul-reduction-order ulps (the
    ``assign_cells_arrow`` duality), so threshold flags agree except
    exactly AT the threshold boundary.
    """
    if arrow:
        return _semantic_overlap_arrow(
            corpus, benchmark, threshold,
            corpus_id, corpus_vec, bench_id, bench_vec,
        )
    from pandas_weights_spark.functions.similarity import dot, l2_norm

    b = F.broadcast(
        benchmark.select(
            F.col(bench_id).alias("__bid__"),
            F.col(bench_vec).alias("__bv__"),
            l2_norm(F.col(bench_vec)).alias("__bn__"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias(corpus_id),
        F.col(corpus_vec).alias("__cv__"),
        l2_norm(F.col(corpus_vec)).alias("__cn__"),
    )
    cos = F.try_divide(
        dot(F.col("__cv__"), F.col("__bv__")),
        F.col("__cn__") * F.col("__bn__"),
    )
    scored = c.crossJoin(b).select(
        corpus_id,
        cos.alias("__cos__"),
        F.col("__bid__"),
    )
    best = F.max(
        F.struct(
            F.col("__cos__").alias("c"),
            (-F.col("__bid__")).alias("negid"),
        )
    )
    return scored.groupBy(corpus_id).agg(
        best.alias("__best__")
    ).select(
        corpus_id,
        F.col("__best__.c").alias("max_cosine"),
        (-F.col("__best__.negid")).alias("nearest_bench_id"),
        (F.col("__best__.c") >= F.lit(float(threshold))).alias(
            "contaminated"
        ),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    bench_id: str = "vec_id",
    bench_vec: str = "embedding",
) -> DataFrame:
    """``corpus`` minus rows whose embedding sits within ``threshold``
    cosine of any benchmark embedding (same columns as ``corpus``);
    the flagged-id list is contamination-sized, so the anti-join
    broadcasts."""
    flagged = semantic_overlap(
        corpus, benchmark, threshold,
        corpus_id, corpus_vec, bench_id, bench_vec,
    ).where(F.col("contaminated")).select(corpus_id)
    return corpus.join(F.broadcast(flagged), corpus_id, "left_anti")


def _semantic_overlap_arrow(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    corpus_id: str,
    corpus_vec: str,
    bench_id: str,
    bench_vec: str,
) -> DataFrame:
    """Arrow fast path of :func:`semantic_overlap` — see its docstring
    for the collect-bounded design argument."""
    import numpy as np
    from pyspark.sql import types as T

    rows = benchmark.select(bench_id, bench_vec).collect()
    if not rows:
        raise ValueError("benchmark is empty")
    bids = np.asarray([r[0] for r in rows])
    bmat = np.vstack([np.asarray(r[1], float) for r in rows])
    bn = np.sqrt((bmat * bmat).sum(axis=1))
    # ties to the SMALLER benchmark id: pre-sort columns by id so the
    # first argmax hit is the smallest id
    order = np.argsort(bids, kind="stable")
    bids = bids[order]
    bmat = bmat[order]
    bn = bn[order]
    thr = float(threshold)

    id_type = corpus.schema[corpus_id].dataType
    out_schema = T.StructType(
        [
            T.StructField(corpus_id, id_type),
            T.StructField("max_cosine", T.DoubleType()),
            T.StructField(
                "nearest_bench_id", benchmark.schema[bench_id].dataType
            ),
            T.StructField("contaminated", T.BooleanType()),
        ]
    )
    base = corpus.select(
        F.col(corpus_id).alias("__id__"),
        F.col(corpus_vec).alias("__v__"),
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            # NULL corpus vectors: the JVM twin's struct-max sees
            # all-NULL cosines, falls through to the negid field, and
            # emits (NULL max_cosine, smallest bench id, NULL flag) —
            # mirror that exactly instead of crashing in np.vstack
            if not len(pdf):  # empty Arrow batch: nothing to score
                continue
            vals = list(pdf["__v__"])
            ok = np.asarray([v is not None for v in vals])
            if ok.all():
                # fast path (the normal batch): plain numpy columns,
                # no nullable-dtype conversion cost
                x = np.vstack([np.asarray(v, float) for v in vals])
                cn = np.sqrt((x * x).sum(axis=1))
                s = (x @ bmat.T) / np.outer(cn, bn)
                j = np.argmax(s, axis=1)  # first max = smallest id
                best = s[np.arange(len(vals)), j]
                yield pd.DataFrame(
                    {
                        corpus_id: pdf["__id__"],
                        "max_cosine": best,
                        "nearest_bench_id": bids[j],
                        "contaminated": best >= thr,
                    }
                )
                continue
            m = len(pdf)
            best = np.full(m, np.nan)
            nearest = np.full(m, bids[0], dtype=object)
            if ok.any():
                x = np.vstack(
                    [np.asarray(v, float) for v, o in zip(vals, ok) if o]
                )
                cn = np.sqrt((x * x).sum(axis=1))
                s = (x @ bmat.T) / np.outer(cn, bn)
                j = np.argmax(s, axis=1)  # first max = smallest id
                best[ok] = s[np.arange(len(x)), j]
                nearest[ok] = bids[j]
            yield pd.DataFrame(
                {
                    corpus_id: pdf["__id__"],
                    # nullable Float64 so null-vector rows arrive as
                    # SQL NULL (a bare float NaN would stay NaN)
                    "max_cosine": pd.array(
                        [None if not o else b for o, b in zip(ok, best)],
                        dtype="Float64",
                    ),
                    "nearest_bench_id": nearest,
                    "contaminated": pd.array(
                        [
                            None if not o else bool(b >= thr)
                            for o, b in zip(ok, best)
                        ],
                        dtype="boolean",
                    ),
                }
            )

    return base.mapInPandas(run, out_schema)
