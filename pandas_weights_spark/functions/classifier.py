"""Hashed-feature logistic-regression text classifier — the
fastText/CCNet-style quality-filter trainer every LLM data pipeline
runs (train a linear model on a small labeled set — "looks like
Wikipedia" vs "looks like raw crawl" — then score the whole corpus
and keep/reweight by probability; cf. GPT-3 appendix A, CCNet §4.3,
public literature; the reference has no ML surface at all,
SURVEY.md §2.6).

Scale design:

* **Features** (:func:`hashed_token_features`) — the hashing trick:
  token + n-gram strings hash straight to ``[0, n_features)`` buckets,
  entirely row-local Column expressions (md5 → first-8-hex-digits int,
  the engine's portable ``uniform_hash`` arithmetic, so the DuckDB
  oracle replays the bucket ids digit-for-digit). No vocabulary pass,
  no fit-before-transform, no shuffle.
* **Training** (:func:`train_text_classifier`) — full-batch gradient
  descent: each iteration is ONE ``mapInPandas`` pass emitting
  per-partition dense gradient partials (``n_features + 1`` doubles —
  bounded by the hash width, not the data), tree-merged executor-side
  past 32 partitions (the PCA two-level pattern) and summed on the
  driver; the weight vector ships back in the task closure. The
  featurized frame is persisted across iterations (one tokenization,
  k gradient passes).
* **Scoring** (:func:`score_text_classifier`) — Arrow-batched
  ``mapInPandas`` margins; the model travels in the closure
  (``n_features`` floats).

Determinism: hashing is md5-seeded; the gradient is a fixed algebra
over exact per-occurrence counts (partial-sum order varies across
partitionings only at IEEE ulp level, like every distributed sum).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandas_weights_spark.functions.text import tokens, word_ngrams

__all__ = [
    "TextClassifierModel",
    "hashed_token_features",
    "train_text_classifier",
    "score_text_classifier",
    "classifier_eval",
]


class TextClassifierModel(NamedTuple):
    """Driver-side model state: plain Python lists (picklable,
    JSON-serializable for checkpointing)."""

    weights: list  # length n_features
    bias: float
    n_features: int
    ngrams: tuple
    seed: int
    lowercase: bool
    losses: list  # per-iteration mean regularized log-loss
    portable: bool = True  # hash family (md5 vs xxhash64) — bind scoring to it


def hashed_token_features(
    text: Column,
    n_features: int = 1 << 16,
    ngrams: Sequence[int] = (1, 2),
    lowercase: bool = True,
    seed: int = 42,
    portable: bool = True,
) -> Column:
    """Feature-index array for a document: every token / word n-gram
    hashes to ``[0, n_features)`` via the engine's portable md5
    arithmetic (first 8 hex digits as a 32-bit int, mod the width —
    :func:`~pandas_weights_spark.sample.uniform_hash`'s int form, so
    a SQL oracle replays the buckets exactly). Repeated grams repeat
    in the output — indices carry term COUNTS by multiplicity.

    ``portable=False`` switches the bucket hash from md5 to seeded
    ``xxhash64`` (JVM-native, no hex round-trip) — the 100 TB hot
    path, the same portable/fast duality the MinHash family has
    (dedup.py): either hash family is a valid hashing-trick instance;
    only the portable one is DuckDB-replayable, so oracles pin the
    md5 path and the fast path is covered by behavioral agreement
    tests. Downstream models are hash-family-bound: score with the
    same ``portable`` you trained with.

    Entirely row-local; a doc shorter than ``n`` words contributes its
    whole text as that n-gram (``word_ngrams``' ≥1-shingle rule).
    """
    if n_features < 2:
        raise ValueError("n_features must be >= 2")
    t = F.lower(text) if lowercase else text
    toks = tokens(t)
    streams = [word_ngrams(t, int(n), toks=toks) for n in ngrams]
    grams = streams[0]
    for s in streams[1:]:
        grams = F.concat(grams, s)
    grams = F.filter(grams, lambda g: g != F.lit(""))
    if portable:
        idx = lambda g: (  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(F.concat(g, F.lit("|"), F.lit(str(seed)))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % F.lit(int(n_features))
        )
    else:
        idx = lambda g: F.pmod(  # noqa: E731
            F.xxhash64(g, F.lit(int(seed))), F.lit(int(n_features))
        )
    return F.when(
        text.isNotNull(), F.transform(grams, idx)
    )


def _grad_pass(
    feats: DataFrame, w: np.ndarray, b: float, n_features: int
) -> "tuple[np.ndarray, float, float, float]":
    """One full-batch pass: Σ residual·x gradient partials per
    partition (dense ``n_features + 2`` doubles + loss + mass),
    tree-merged past 32 partitions, driver-summed. Returns
    (grad_w, grad_b, total_loss, total_mass)."""
    schema = T.StructType(
        [
            T.StructField("g", T.ArrayType(T.DoubleType())),
            T.StructField("gb", T.DoubleType()),
            T.StructField("loss", T.DoubleType()),
            T.StructField("mass", T.DoubleType()),
        ]
    )

    def partials(batches):
        import pandas as pd

        g = np.zeros(n_features)
        gb = 0.0
        loss = 0.0
        mass = 0.0
        any_rows = False
        for pdf in batches:
            for f_idx, y, sw in zip(
                pdf["__f__"], pdf["__y__"], pdf["__sw__"]
            ):
                if f_idx is None or y is None or sw is None or sw <= 0:
                    continue
                any_rows = True
                ii = np.asarray(f_idx, dtype=np.int64)
                m = b + (w[ii].sum() if len(ii) else 0.0)
                # numerically-stable sigmoid + log-loss
                if m >= 0:
                    em = np.exp(-m)
                    p = 1.0 / (1.0 + em)
                    ll = np.log1p(em) + (1.0 - y) * m
                else:
                    em = np.exp(m)
                    p = em / (1.0 + em)
                    ll = np.log1p(em) - y * m
                r = sw * (p - y)
                if len(ii):
                    np.add.at(g, ii, r)
                gb += r
                loss += sw * ll
                mass += sw
        if any_rows:
            yield pd.DataFrame(
                {
                    "g": [list(g)],
                    "gb": [gb],
                    "loss": [loss],
                    "mass": [mass],
                }
            )

    def merge(batches):
        import pandas as pd

        g = np.zeros(n_features)
        gb = loss = mass = 0.0
        seen = False
        for pdf in batches:
            for i in range(len(pdf)):
                seen = True
                g += np.asarray(pdf["g"].iloc[i], float)
                gb += float(pdf["gb"].iloc[i])
                loss += float(pdf["loss"].iloc[i])
                mass += float(pdf["mass"].iloc[i])
        if seen:
            yield pd.DataFrame(
                {"g": [list(g)], "gb": [gb], "loss": [loss],
                 "mass": [mass]}
            )

    part = feats.mapInPandas(partials, schema)
    if feats.rdd.getNumPartitions() > 32:
        part = part.repartition(8).mapInPandas(merge, schema)
    rows = part.collect()
    if not rows:
        raise ValueError("no trainable rows (labels/weights all NULL?)")
    g = np.sum([np.asarray(r["g"], float) for r in rows], axis=0)
    gb = sum(float(r["gb"]) for r in rows)
    loss = sum(float(r["loss"]) for r in rows)
    mass = sum(float(r["mass"]) for r in rows)
    return g, gb, loss, mass


def train_text_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_features: int = 1 << 16,
    ngrams: Sequence[int] = (1, 2),
    iters: int = 20,
    lr: float = 1.0,
    l2: float = 1e-6,
    weight: Optional[Column] = None,
    lowercase: bool = True,
    seed: int = 42,
    portable: bool = True,
) -> TextClassifierModel:
    """Train the quality classifier: full-batch gradient descent on
    L2-regularized weighted logistic loss over hashed features.
    ``label_col`` must be 0/1 (cast to double); rows with NULL
    text/label or non-positive weight carry no mass. Returns a
    :class:`TextClassifierModel` (with per-iteration ``losses`` so
    convergence is inspectable).

    Each iteration is one bounded-gradient pass (see module
    docstring); the featurized frame persists across iterations —
    tokenize once, descend ``iters`` times. Mean-loss gradient
    (``Σr·x / Σsw``), constant step ``lr``: deterministic given the
    data, no randomness anywhere.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    sw = weight if weight is not None else F.lit(1.0)
    feats = df.select(
        hashed_token_features(
            F.col(text_col), n_features=n_features, ngrams=ngrams,
            lowercase=lowercase, seed=seed, portable=portable,
        ).alias("__f__"),
        F.col(label_col).cast("double").alias("__y__"),
        sw.cast("double").alias("__sw__"),
    ).where(
        F.col("__f__").isNotNull()
        & F.col("__y__").isNotNull()
        & (F.col("__sw__") > 0)
    )
    feats = feats.persist()
    try:
        w = np.zeros(int(n_features))
        b = 0.0
        losses = []
        for _ in range(iters):
            g, gb, loss, mass = _grad_pass(feats, w, b, int(n_features))
            if mass <= 0:
                raise ValueError("total training mass is zero")
            losses.append(
                float(loss / mass + 0.5 * l2 * float(w @ w))
            )
            w = w - lr * (g / mass + l2 * w)
            b = b - lr * (gb / mass)
    finally:
        feats.unpersist()
    return TextClassifierModel(
        weights=[float(x) for x in w],
        bias=float(b),
        n_features=int(n_features),
        ngrams=tuple(int(n) for n in ngrams),
        seed=int(seed),
        lowercase=bool(lowercase),
        losses=losses,
        portable=bool(portable),
    )


def score_text_classifier(
    df: DataFrame,
    text_col: str,
    model: TextClassifierModel,
    out_col: str = "quality_score",
) -> DataFrame:
    """Score documents with a trained model: input schema +
    ``out_col`` = P(label=1) in (0, 1); NULL text stays NULL. The
    margin is the same hashed-index sum training used, computed in
    Arrow-batched ``mapInPandas`` with the model in the closure."""
    w = np.asarray(model.weights, float)
    b = float(model.bias)
    feat_col = hashed_token_features(
        F.col(text_col), n_features=model.n_features,
        ngrams=model.ngrams, lowercase=model.lowercase, seed=model.seed,
        portable=getattr(model, "portable", True),
    )
    src = df.withColumn("__f__", feat_col)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    )
    cols = df.columns

    def run(batches):
        import pandas as pd

        for pdf in batches:
            scores = []
            for f_idx in pdf["__f__"]:
                if f_idx is None:
                    scores.append(None)
                    continue
                ii = np.asarray(f_idx, dtype=np.int64)
                m = b + (w[ii].sum() if len(ii) else 0.0)
                if m >= 0:
                    s = 1.0 / (1.0 + np.exp(-m))
                else:
                    e = np.exp(m)
                    s = e / (1.0 + e)
                scores.append(float(s))
            yield pd.DataFrame(
                {**{c: pdf[c] for c in cols}, out_col: scores}
            )

    return src.mapInPandas(run, out_schema)


def classifier_eval(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Threshold sweep + calibration + binned ROC-AUC for a ``[0,1]``
    score column against binary labels — the evaluation report that
    decides WHERE to cut a quality-classifier score before filtering
    a corpus with it.

    One row per occupied score bin (``floor(score·n_bins)``, top bin
    clamped), descending threshold order:

    - ``bin``, ``threshold`` (= bin/n_bins, the cut "keep score ≥ t"),
      ``n``, ``n_pos``, ``mean_score``, ``frac_pos`` (calibration:
      a well-calibrated model has ``frac_pos ≈ mean_score``);
    - ``precision`` / ``recall`` / ``f1`` of the cut at this bin's
      threshold (cumulative from the top bin down);
    - ``auc`` — trapezoidal area under the binned ROC (same value on
      every row). Binned-exact, not rank-exact: ties inside a bin are
      invisible, which is the standard thresholded-ROC construction
      and the price of scale-safety.

    Scale shape: ONE bin aggregate (≤ ``n_bins`` keys, map-side
    combined), a window over the AGGREGATED bin rows (bounded by
    ``n_bins``, never the data — the rank-over-40-rows discipline),
    and a 1-row AUC aggregate joined back by broadcast. Integer
    masses + single divisions: the DuckDB oracle replays bit-exactly.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    from pyspark.sql import Window as _W

    nb = int(n_bins)
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    b = F.least(F.floor(s * nb).cast("int"), F.lit(nb - 1))
    binned = (
        df.where(s.isNotNull() & y.isNotNull())
        .select(b.alias("bin"), s.alias("__s__"), y.alias("__y__"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__y__").cast("long").alias("n_pos"),
            F.sum("__s__").alias("__ssum__"),
        )
    )
    w = _W.orderBy(F.col("bin").desc()).rowsBetween(
        _W.unboundedPreceding, _W.currentRow
    )
    cum = binned.select(
        "bin",
        "n",
        "n_pos",
        (F.col("__ssum__") / F.col("n").cast("double")).alias(
            "mean_score"
        ),
        (F.col("n_pos").cast("double") / F.col("n").cast("double"))
        .alias("frac_pos"),
        F.sum("n_pos").over(w).cast("long").alias("cum_tp"),
        (F.sum("n").over(w) - F.sum("n_pos").over(w))
        .cast("long")
        .alias("cum_fp"),
    )
    totals = cum.agg(
        F.sum("n_pos").cast("double").alias("__P__"),
        F.sum(F.col("n") - F.col("n_pos"))
        .cast("double")
        .alias("__N__"),
    )
    scored = cum.crossJoin(F.broadcast(totals))
    # try_divide like precision/recall: a single-class eval sample
    # (no positives or no negatives) yields NULL roc segments and a
    # NULL auc, not Infinity/NaN
    tpr = F.try_divide(F.col("cum_tp").cast("double"), F.col("__P__"))
    fpr = F.try_divide(F.col("cum_fp").cast("double"), F.col("__N__"))
    prec = F.try_divide(
        F.col("cum_tp").cast("double"),
        (F.col("cum_tp") + F.col("cum_fp")).cast("double"),
    )
    rec = F.try_divide(F.col("cum_tp").cast("double"), F.col("__P__"))
    f1 = F.try_divide(
        F.lit(2.0) * prec * rec, prec + rec
    )
    # trapezoid over consecutive ROC points (descending threshold):
    # lag window over the SAME bounded bin table
    w2 = _W.orderBy(F.col("bin").desc())
    prev_tpr = F.lag(tpr, 1, 0.0).over(w2)
    prev_fpr = F.lag(fpr, 1, 0.0).over(w2)
    with_auc = scored.withColumn(
        "__seg__", (fpr - prev_fpr) * (tpr + prev_tpr) / F.lit(2.0)
    )
    # no coalesce: a single-class input has every __seg__ NULL (the
    # try_divide above), so the sum — and the auc column — is NULL
    auc_row = with_auc.agg(F.sum("__seg__").alias("__auc__"))
    return (
        with_auc.crossJoin(F.broadcast(auc_row))
        .select(
            "bin",
            (F.col("bin").cast("double") / F.lit(float(nb))).alias(
                "threshold"
            ),
            "n",
            "n_pos",
            F.round("mean_score", 6).alias("mean_score"),
            F.round("frac_pos", 6).alias("frac_pos"),
            "cum_tp",
            "cum_fp",
            F.round(prec, 6).alias("precision"),
            F.round(rec, 6).alias("recall"),
            F.round(f1, 6).alias("f1"),
            F.round("__auc__", 6).alias("auc"),
        )
    )
