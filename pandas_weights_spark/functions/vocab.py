"""Vocabulary building + document encoding — the tokenizer-prep stage
of a training pipeline (count-vectorizer semantics: top-V terms by
corpus mass, stable integer ids, OOV handling).

Scale design:

* :func:`build_vocabulary` — ONE explode + map-side-combining term
  aggregate; the top-V cut is ``orderBy(...).limit(V)`` which Spark
  executes as TakeOrdered (per-partition heaps of V, never a global
  sort), and ids come from one window over the V-row result (V is
  vocabulary-sized: thousands, not data-sized).
* :func:`encode_documents` — posexplode + a BROADCAST join against the
  V-row vocabulary (map-side lookup), then one groupBy(doc) rebuilding
  the id sequence with ``sort_array`` on (position, id) structs. One
  data-sized shuffle total (the regroup), which is the floor for an
  order-preserving encode.

Deterministic throughout: ties in mass rank by term text, so the same
corpus always produces the same vocabulary and ids.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandas_weights_spark.functions.text import tokens

__all__ = ["build_vocabulary", "encode_documents"]


def build_vocabulary(
    df: DataFrame,
    text_col: str,
    max_size: int = 50_000,
    min_mass: float = 1.0,
    weight: Optional[Column] = None,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``max_size`` terms by (weighted) corpus mass:
    ``(term, term_id, mass)`` with ``term_id`` in ``[0, V)`` assigned
    by descending mass (ties by term text — fully deterministic).

    ``weight`` scales each document's token contributions (doc-level
    quality/duplication weights); default 1 per occurrence.
    ``min_mass`` drops the long tail before the cut.
    """
    if max_size < 1:
        raise ValueError("max_size must be >= 1")
    w = weight if weight is not None else F.lit(1.0)
    t = F.col(text_col)
    toks = tokens(F.lower(t) if lowercase else t)
    rows = df.select(
        w.alias("__w__"), F.explode(toks).alias("term")
    ).where(F.length("term") > 0)
    masses = (
        rows.groupBy("term")
        .agg(F.sum("__w__").alias("mass"))
        .where(F.col("mass") >= float(min_mass))
        .orderBy(F.col("mass").desc(), F.col("term"))
        .limit(max_size)
    )
    ids = Window.orderBy(F.col("mass").desc(), F.col("term"))
    return masses.select(
        "term",
        (F.row_number().over(ids) - 1).cast("int").alias("term_id"),
        "mass",
    )


def encode_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: DataFrame,
    oov_id: int = -1,
    drop_oov: bool = False,
    lowercase: bool = True,
) -> DataFrame:
    """Encode each document's token sequence against ``vocab``:
    ``(id_col, token_ids array<int>, n_tokens, n_oov)``. Order is
    preserved; out-of-vocabulary tokens become ``oov_id`` (or are
    dropped with ``drop_oov=True``).
    """
    t = F.col(text_col)
    toks = tokens(F.lower(t) if lowercase else t)
    pos = df.select(
        F.col(id_col), F.posexplode(toks).alias("__pos__", "term")
    )
    joined = pos.join(
        F.broadcast(vocab.select("term", "term_id")), "term", "left"
    )
    tid = F.coalesce(F.col("term_id"), F.lit(int(oov_id)))
    enc = joined.groupBy(id_col).agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("__pos__").alias("p"),
                                        tid.alias("i")))
            ),
            lambda e: e["i"],
        ).alias("token_ids"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(
            F.when(F.col("term_id").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_oov"),
    )
    if drop_oov:
        enc = enc.select(
            id_col,
            F.filter(
                "token_ids", lambda i: i != F.lit(int(oov_id))
            ).alias("token_ids"),
            "n_tokens",
            "n_oov",
        )
    return enc
