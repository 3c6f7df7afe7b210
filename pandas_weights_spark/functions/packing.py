"""Token-budget sequence packing (training-data pipeline extension).

LLM pre-training pipelines pack variable-length documents into
fixed-size token windows ("concat and chunk"). The distributed shape of
that operation: assign every document a deterministic bucket, order
documents within the bucket, take the exclusive running token total, and
cut packs every ``budget`` tokens. Documents can straddle a pack
boundary exactly as concat-and-chunk does; the pack id and offset tell
the materialization step where each document's tokens land.

Scale posture: ONE window shuffle, partitioned by bucket — no global
ordering, no driver state. Bucket count controls parallelism (each
bucket's running sum is independent), so the operator handles any corpus
size; buckets are md5-deterministic (sample.uniform_hash), so the
packing is reproducible run-to-run and engine-to-engine, which makes the
whole operator expressible as ANSI window SQL for the oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandas_weights_spark.sample import uniform_hash

__all__ = ["pack_sequences", "pack_sequences_bestfit", "chunk_documents"]


def pack_sequences(
    df: DataFrame,
    token_col: Column,
    budget: int,
    key_cols: Sequence[str],
    n_buckets: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Assign each document to a fixed-budget token pack.

    Output adds ``bucket``, ``pack_id`` (globally unique:
    ``bucket * ceil-free arithmetic`` — pack ids are dense within a
    bucket, ``bucket``-prefixed across buckets), ``pack_offset`` (token
    offset of this document inside its pack), and ``tokens``.
    Documents with NULL or non-positive token counts are excluded.

    One window shuffle on ``bucket``; within a bucket the order is the
    key columns (deterministic). A document whose tokens cross the
    boundary belongs to the pack where it starts, mirroring
    concat-and-chunk materialization.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    t = token_col.cast("long")
    u = uniform_hash([F.col(c) for c in key_cols], seed)
    bucket = F.floor(u * F.lit(float(n_buckets))).cast("int")
    base = (
        df.where(t.isNotNull() & (t > 0))
        .withColumn("tokens", t)  # withColumn replaces an existing column
        .withColumn("bucket", bucket)
    )
    win = (
        Window.partitionBy("bucket")
        .orderBy(*[F.col(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("tokens").over(win), F.lit(0).cast("long"))
    return base.select(
        "*",
        (F.col("bucket").cast("long") * F.lit(1_000_000_000)
         + F.floor(start / F.lit(budget))).alias("pack_id"),
        (start % F.lit(budget)).alias("pack_offset"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-token sliding chunks with overlap —
    the context-window preprocessing step every LLM pipeline runs
    before packing: ``(id, chunk_id, n_tokens, chunk_text)``.

    Chunks start every ``chunk_tokens − overlap`` tokens while the
    start is ≤ n − overlap, which guarantees complete coverage (the
    last chunk reaches the final token) with no chunk fully contained
    in its predecessor; a document of ≤ ``chunk_tokens`` tokens yields
    itself as one chunk. Whitespace tokenization (text.tokens).

    Row-local construction (sequence of starts + per-start slice) then
    ONE posexplode — the shuffle-free fan-out shape; chunk_id derives
    from the start offset, not array position, so the output is
    deterministic without ordering.
    """
    from pandas_weights_spark.functions.text import tokens

    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - F.lit(overlap)), F.lit(step)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            ((s - 1) / F.lit(step)).cast("long").alias("chunk_id"),
            F.least(F.lit(chunk_tokens), n - s + 1)
            .cast("long")
            .alias("n_tokens"),
            F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias(
                "chunk_text"
            ),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("__c__")
    ).select(
        id_col,
        F.col("__c__.chunk_id").alias("chunk_id"),
        F.col("__c__.n_tokens").alias("n_tokens"),
        F.col("__c__.chunk_text").alias("chunk_text"),
    )


def pack_sequences_bestfit(
    df: DataFrame,
    token_col: Column,
    budget: int,
    key_cols: Sequence[str],
    n_buckets: int = 64,
    seed: int = 42,
    oversize: str = "error",
) -> DataFrame:
    """NO-STRADDLE packing: best-fit-decreasing bin packing per bucket
    — the padding-efficient alternative to :func:`pack_sequences`'
    concat-and-chunk (documents never cross a pack boundary, so no
    training example starts mid-document; the trade is pad tokens in
    the unfilled tail of each pack — BFD keeps that waste near the
    theoretical floor, cf. the classical 11/9·OPT+1 guarantee for
    first-fit-decreasing, public algorithmics).

    Output = input + ``bucket``, ``pack_id`` (globally unique:
    ``bucket·10⁹ + local``), ``pack_tokens`` (the pack's total AFTER
    packing — identical on every row of the pack, so downstream pad
    accounting is one distinct), ``tokens``. ``oversize`` controls
    documents longer than ``budget``: ``"error"`` raises inside the
    task, ``"drop"`` removes them, ``"own_pack"`` gives each its own
    singleton pack (the caller chunks them first in a real pipeline —
    :func:`chunk_documents` composes).

    Scale shape: documents hash into ``n_buckets`` md5-deterministic
    buckets (same fan-out knob as :func:`pack_sequences`); each bucket
    packs INDEPENDENTLY in one ``applyInPandas`` group — the sanctioned
    Python surface for a genuinely sequential heuristic (best-fit's
    bin state has no window/SQL analog). Bucket size bounds task
    memory: size ``n_buckets`` so a bucket's (key, token) rows fit an
    executor — the packing runs on 3 small columns, not the payloads.
    Deterministic: BFD iterates docs sorted by (tokens desc, keys) and
    bins by (remaining asc, bin id asc), so the same bucket contents
    always pack identically.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if oversize not in ("error", "drop", "own_pack"):
        raise ValueError("oversize must be error|drop|own_pack")
    import pandas as pd  # noqa: F401

    t = token_col.cast("long")
    u = uniform_hash([F.col(c) for c in key_cols], seed)
    bucket = F.floor(u * F.lit(float(n_buckets))).cast("int")
    base = (
        df.where(t.isNotNull() & (t > 0))
        .withColumn("tokens", t)
        .withColumn("bucket", bucket)
    )
    from pyspark.sql import types as _T

    # fresh StructType — .add() mutates in place and would corrupt the
    # input DataFrame's schema object
    out_schema = _T.StructType(
        list(base.schema.fields)
        + [
            _T.StructField("pack_id", _T.LongType()),
            _T.StructField("pack_tokens", _T.LongType()),
        ]
    )
    keys = list(key_cols)
    budget_l = int(budget)
    mode = oversize

    def pack(pdf):
        import bisect

        pdf = pdf.sort_values(
            ["tokens"] + keys, ascending=[False] + [True] * len(keys),
            kind="mergesort",
        ).reset_index(drop=True)
        bucket_id = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        base_id = bucket_id * 1_000_000_000
        # bins kept sorted by (remaining, bin_idx) for best-fit lookup
        bins: "list[tuple[int, int]]" = []  # (remaining, bin_idx)
        totals: "list[int]" = []  # bin_idx -> packed tokens
        assign = [0] * len(pdf)
        drop_mask = [False] * len(pdf)
        for i, tok in enumerate(pdf["tokens"]):
            tok = int(tok)
            if tok > budget_l:
                if mode == "error":
                    raise ValueError(
                        f"document of {tok} tokens exceeds budget "
                        f"{budget_l}; chunk first or pass "
                        "oversize='drop'/'own_pack'"
                    )
                if mode == "drop":
                    drop_mask[i] = True
                    continue
                assign[i] = len(totals)  # own_pack: singleton bin
                totals.append(tok)
                continue
            # best fit: the bin with the SMALLEST remaining >= tok
            j = bisect.bisect_left(bins, (tok, -1))
            if j < len(bins):
                rem, bidx = bins.pop(j)
                assign[i] = bidx
                totals[bidx] += tok
                nrem = rem - tok
                if nrem > 0:
                    bisect.insort(bins, (nrem, bidx))
            else:
                bidx = len(totals)
                assign[i] = bidx
                totals.append(tok)
                nrem = budget_l - tok
                if nrem > 0:
                    bisect.insort(bins, (nrem, bidx))
        if any(drop_mask):
            keep = [not d for d in drop_mask]
            pdf = pdf[keep].reset_index(drop=True)
            assign = [a for a, k in zip(assign, keep) if k]
        pdf["pack_id"] = [base_id + a for a in assign]
        pdf["pack_tokens"] = [totals[a] for a in assign]
        return pdf

    return base.groupBy("bucket").applyInPandas(
        pack, schema=out_schema
    )
