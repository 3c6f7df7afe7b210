"""Corpus datasheet — the one-call "data card" rollup every corpus
release ships (the reporting niche of Datasheets for Datasets,
Gebru et al. 2021, and the Dolma/RedPajama release tables): per group
(source, language, …) the document/token volumes, length quantiles,
quality/code score means, and the exact-duplicate fraction.

Composition of existing row-local kernels + three group-sized
aggregates (moments, fingerprint-dup counts, inverted-CDF length
quantiles) joined on the group keys — every stage is an operator this
engine already tests; the datasheet only fuses them. Scale shape:
three shuffles on the group keys (group cardinality is tiny), no
driver-side data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_datasheet", "token_budget", "zipf_stats"]


def corpus_datasheet(
    df: DataFrame,
    text_col: str,
    group_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """One row per group: ``n_docs, n_empty, total_chars,
    total_tokens, mean_tokens, p50_tokens, p90_tokens, mean_quality,
    mean_code, dup_frac``. ``n_empty`` counts NULL/blank docs (their
    token count participates as 0); ``dup_frac`` is the fraction of
    docs whose exact content fingerprint (order-insensitive token-set
    md5) appears more than once WITHIN the group; means/fractions
    round to 6 dp (the oracle-replay convention)."""
    from pandas_weights_spark.functions.quality import code_score
    from pandas_weights_spark.functions.text import (
        fingerprint,
        quality_score,
        token_count,
    )

    g = [F.col(c) for c in group_cols]
    t = F.col(text_col)
    base = df.select(
        *g,
        token_count(t).alias("__nt__"),
        F.coalesce(F.length(t), F.lit(0)).alias("__nc__"),
        quality_score(t).alias("__q__"),
        code_score(t).alias("__c__"),
        fingerprint(t).alias("__fp__"),
        (t.isNull() | (F.length(F.trim(t)) == 0)).alias("__empty__"),
    )
    stats = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("__empty__").cast("long"))
        .cast("long")
        .alias("n_empty"),
        F.sum("__nc__").cast("long").alias("total_chars"),
        F.sum(F.coalesce(F.col("__nt__"), F.lit(0)))
        .cast("long")
        .alias("total_tokens"),
        F.round(
            F.avg(F.coalesce(F.col("__nt__"), F.lit(0)).cast("double")),
            6,
        ).alias("mean_tokens"),
        F.round(F.avg("__q__"), 6).alias("mean_quality"),
        F.round(F.avg("__c__"), 6).alias("mean_code"),
    )
    fp = (
        base.groupBy(*group_cols, "__fp__")
        .agg(F.count(F.lit(1)).alias("__n__"))
        .groupBy(*group_cols)
        .agg(
            F.round(
                F.try_divide(
                    F.sum(
                        F.when(F.col("__n__") > 1, F.col("__n__"))
                        .otherwise(F.lit(0))
                        .cast("double")
                    ),
                    F.sum(F.col("__n__").cast("double")),
                ),
                6,
            ).alias("dup_frac")
        )
    )
    from pandas_weights_spark import wt

    wq = wt(
        base.select(
            *group_cols,
            F.coalesce(F.col("__nt__"), F.lit(0))
            .cast("double")
            .alias("ntok"),
            F.lit(1.0).alias("__w__"),
        ),
        "__w__",
    )
    from pandas_weights_spark.quantile import weighted_quantiles

    q = weighted_quantiles(
        wq, [0.5, 0.9], subset=["ntok"], keys=list(group_cols)
    ).select(
        *group_cols,
        F.col("ntok_p50").alias("p50_tokens"),
        F.col("ntok_p90").alias("p90_tokens"),
    )
    return stats.join(fp, list(group_cols)).join(q, list(group_cols))


def token_budget(
    df: DataFrame,
    text_col: str = "text",
    by: "Sequence[str]" = ("lang",),
) -> DataFrame:
    """Per-group token-budget report — the numbers a mixture/budget
    plan needs BEFORE paying for a real tokenizer pass: document
    count, whitespace tokens, sub-word-ish tokens
    (:func:`~pandas_weights_spark.functions.text.bpe_token_count`,
    the regex upper bound every merge only shrinks), UTF-8 bytes, and
    the fertility ratios ``tokens_per_kib`` / ``bytes_per_token``
    (how expensive each group's bytes are in tokens — CJK and
    code-heavy groups differ by 2-4x, which is exactly what skews a
    naive bytes-proportioned mixture).

    ONE aggregate with map-side combine on the tiny ``by`` key space;
    the per-row counts are row-local regexes pipelined into the scan.
    Ratios are single IEEE divisions of exact integer sums (NULL for
    an all-empty group), so the DuckDB oracle replays them bit-exactly.
    """
    from pandas_weights_spark.functions.text import (
        bpe_token_count,
        token_count,
    )

    t = F.col(text_col)
    staged = df.select(
        *[F.col(c) for c in by],
        token_count(t).cast("long").alias("__wt__"),
        bpe_token_count(t).cast("long").alias("__bt__"),
        F.coalesce(F.octet_length(t), F.lit(0))
        .cast("long")
        .alias("__nb__"),
    )
    bpe = F.sum("__bt__").cast("long")
    nb = F.sum("__nb__").cast("long")
    return staged.groupBy(*[F.col(c) for c in by]).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__wt__").cast("long").alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        nb.alias("utf8_bytes"),
        F.round(
            F.try_divide(bpe.cast("double") * F.lit(1024.0),
                         nb.cast("double")),
            6,
        ).alias("tokens_per_kib"),
        F.round(
            F.try_divide(nb.cast("double"), bpe.cast("double")), 6
        ).alias("bytes_per_token"),
    )


def zipf_stats(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
    lowercase: bool = True,
) -> DataFrame:
    """Zipf/type-token corpus statistics — the lexical-health block of
    a data card (Zipf 1949; the head-slope and hapax mass are the
    standard corpus sanity signals: scraped boilerplate flattens the
    slope, OCR noise inflates the hapax fraction, and tokenizer/vocab
    planning reads the type counts).

    One row per HEAD token (exact global top-``top_k`` by (freq desc,
    token asc) — :func:`~pandas_weights_spark.topk.global_top_by_mass`,
    never a vocabulary-sized global sort): ``(rank, token, freq)``
    plus the corpus scalars repeated per row (the datasheet
    convention): ``n_tokens``, ``n_types``, ``type_token_ratio``,
    ``hapax_frac`` (fraction of TYPES occurring once), and
    ``zipf_slope`` — the least-squares slope of ``ln(freq)`` on
    ``ln(rank)`` over the head rows (ideal Zipf ≈ −1; computed from
    the four regression sums in ONE aggregate over the ≤``top_k``
    table).

    Scale shape: one explode + one token-keyed count aggregate
    (map-side combined) feeds everything; the type-level scalars are
    a second 1-row aggregate over the count table; ranking and the
    regression run on the capped head only. Exact integer counts and
    single IEEE divisions — the DuckDB oracle replays it closed-form.
    """
    from pyspark.sql import Window as W

    from pandas_weights_spark.functions.text import tokens
    from pandas_weights_spark.topk import global_top_by_mass

    if top_k < 2:
        raise ValueError("top_k must be >= 2 (the slope needs 2 points)")
    t = F.col(text_col)
    tok = F.explode(
        tokens(F.lower(t) if lowercase else t)
    ).alias("token")
    counts = (
        df.select(tok)
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    scalars = counts.agg(
        F.sum("freq").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("long")
        .alias("__hapax__"),
    )
    head = global_top_by_mass(
        counts, "freq", [F.col("freq").desc(), F.col("token")],
        int(top_k),
    )
    # rank within the ≤top_k head — a bounded-table window (the
    # classifier_eval discipline), never vocabulary-sized
    ranked = head.withColumn(
        "rank",
        F.row_number()
        .over(W.orderBy(F.col("freq").desc(), F.col("token")))
        .cast("long"),
    )
    lr = F.log(F.col("rank").cast("double"))
    lf = F.log(F.col("freq").cast("double"))
    reg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("__n__"),
        F.sum(lr).alias("__sx__"),
        F.sum(lf).alias("__sy__"),
        F.sum(lr * lr).alias("__sxx__"),
        F.sum(lr * lf).alias("__sxy__"),
    )
    slope = F.try_divide(
        F.col("__n__") * F.col("__sxy__")
        - F.col("__sx__") * F.col("__sy__"),
        F.col("__n__") * F.col("__sxx__")
        - F.col("__sx__") * F.col("__sx__"),
    )
    return (
        ranked.crossJoin(F.broadcast(scalars))
        .crossJoin(F.broadcast(reg))
        .select(
            "rank",
            "token",
            "freq",
            "n_tokens",
            "n_types",
            F.round(
                F.try_divide(
                    F.col("n_types").cast("double"),
                    F.col("n_tokens").cast("double"),
                ),
                6,
            ).alias("type_token_ratio"),
            F.round(
                F.try_divide(
                    F.col("__hapax__").cast("double"),
                    F.col("n_types").cast("double"),
                ),
                6,
            ).alias("hapax_frac"),
            F.round(slope, 6).alias("zipf_slope"),
        )
    )
