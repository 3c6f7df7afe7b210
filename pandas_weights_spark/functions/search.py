"""BM25 ranked retrieval over a document corpus — the data-curation
search operator (find documents matching an eval prompt, audit a
topic's coverage, pull seed sets for classifiers) built as a pure
inverted-index join, no UDF anywhere.

Public formula (Robertson–Spärck Jones / Okapi BM25, the Lucene
variant of the idf):

    score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
                               / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t) = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

Scale shape: one tokenize+explode pass builds (doc, term, tf) and the
doc-length table (map-side combining aggregates); term document
frequencies are one more aggregate over the SAME table; N and avgdl
are two scalars off aggregated tables. Queries join the posting table
on term (query side broadcast — query sets are small by contract),
one (query, doc) aggregate sums the per-term scores, and
``partitioned_topk`` cuts per-query top-k without a global sort.
Everything is fixed-order Column algebra: the DuckDB oracle replays
scores bit-for-bit at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_weights_spark.functions.text import tokens

__all__ = ["bm25_topk", "rrf_fuse"]


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    queries: DataFrame,
    query_id: str,
    query_text: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
) -> DataFrame:
    """Per-query BM25 top-k: ``(query_id, doc_id, score, rank)`` with
    ``score`` descending (6-dp rounded; ties → lower doc id). Query
    terms are DISTINCT (standard short-query convention — repeating a
    term in the query does not double its weight). Documents or
    queries with no tokens simply produce no pairs; a query whose
    terms miss the corpus entirely emits no rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if k1 < 0 or not 0.0 <= b <= 1.0:
        raise ValueError("need k1 >= 0 and 0 <= b <= 1")
    from pandas_weights_spark.topk import partitioned_topk

    dt = F.col(text_col)
    dtoks = tokens(F.lower(dt) if lowercase else dt)
    base = docs.where(dt.isNotNull()).select(
        F.col(id_col).alias("__doc__"),
        F.explode(dtoks).alias("term"),
    ).where(F.length("term") > 0)
    postings = base.groupBy("__doc__", "term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf__")
    )
    dlen = base.groupBy("__doc__").agg(
        F.count(F.lit(1)).cast("double").alias("__dl__")
    )
    stats = dlen.agg(
        F.count(F.lit(1)).cast("double").alias("N"),
        F.avg("__dl__").alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = float(stats["N"] or 0.0), float(stats["avgdl"] or 0.0)
    if n_docs == 0:
        raise ValueError("bm25_topk needs at least one tokenizable doc")
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df__")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("__df__") + F.lit(0.5))
        / (F.col("__df__") + F.lit(0.5))
    )
    index = postings.join(dlen, "__doc__").join(dfreq, "term").select(
        "term",
        "__doc__",
        (
            idf
            * (F.col("__tf__") * F.lit(float(k1) + 1.0))
            / (
                F.col("__tf__")
                + F.lit(float(k1))
                * (
                    F.lit(1.0 - float(b))
                    + F.lit(float(b)) * F.col("__dl__") / F.lit(avgdl)
                )
            )
        ).alias("__s__"),
    )
    qt = F.col(query_text)
    qtoks = tokens(F.lower(qt) if lowercase else qt)
    qterms = F.broadcast(
        queries.where(qt.isNotNull())
        .select(
            F.col(query_id).alias("query_id"),
            F.explode(F.array_distinct(qtoks)).alias("term"),
        )
        .where(F.length("term") > 0)
    )
    scored = (
        index.join(qterms, "term")
        .groupBy("query_id", "__doc__")
        .agg(F.round(F.sum("__s__"), 6).alias("score"))
    )
    return partitioned_topk(
        scored.select(
            "query_id", F.col("__doc__").alias("doc_id"), "score"
        ),
        part_by=["query_id"],
        order_by=[F.col("score").desc(), F.col("doc_id")],
        k=k,
        salt_by=["doc_id"],
        rank_col="rank",
    ).select("query_id", "doc_id", "score", "rank")


def rrf_fuse(
    rankings: "list[DataFrame]",
    query_col: str,
    id_col: str,
    rank_col: str = "rank",
    k: float = 60.0,
    topk: "int | None" = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009 —
    public; k=60 is the paper's constant): combine any number of
    per-query rankings — lexical BM25, embedding cosine, freshness —
    into one list by ``score(q, d) = Σ_r 1/(k + rank_r(q, d))``,
    re-ranked (score desc, id asc).  Rank-based, so no per-ranking
    score calibration is needed — THE standard hybrid-retrieval
    combiner.  A document missing from a ranking simply contributes
    nothing from it.  Output ``(query_col, id_col, rrf_score, rank)``;
    ``topk`` keeps the fused top-k per query.

    Scale: a union of the (already top-k-bounded) input rankings, one
    (query, id) aggregate, and one per-query window over ≤ Σk_r
    candidate rows per query — never corpus-sized.  Determinism: with
    two rankings the fused sum is IEEE-commutative (bit-exact across
    engines and partitionings); with three or more it is
    associativity-bound at ulp level — round before comparing across
    engines.
    """
    if not rankings:
        raise ValueError("rankings must name at least one DataFrame")
    if not float(k) > 0:
        raise ValueError(f"k must be > 0, got {k}")
    if topk is not None and topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    parts = [
        df.select(
            F.col(query_col).alias("__q__"),
            F.col(id_col).alias("__i__"),
            (
                F.lit(1.0)
                / (F.lit(float(k)) + F.col(rank_col).cast("double"))
            ).alias("__c__"),
        )
        for df in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("__q__", "__i__").agg(
        F.sum("__c__").alias("rrf_score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__q__").orderBy(
        F.col("rrf_score").desc(), F.col("__i__").asc()
    )
    out = fused.select(
        F.col("__q__").alias(query_col),
        F.col("__i__").alias(id_col),
        "rrf_score",
        F.row_number().over(w).alias("rank"),
    )
    if topk is not None:
        out = out.where(F.col("rank") <= int(topk))
    return out
