"""Hashed-feature logistic-regression quality classifier
(functions/classifier.py) vs a transparent numpy implementation of the
same full-batch GD on the same hashed features."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.classifier import (
    hashed_token_features,
    score_text_classifier,
    train_text_classifier,
)


def _ref_bucket(gram: str, seed: int, n: int) -> int:
    h = hashlib.md5(f"{gram}|{seed}".encode()).hexdigest()
    return int(h[:8], 16) % n


def _ref_features(text: str, n: int, seed: int = 42):
    toks = text.lower().split()
    grams = list(toks)
    if len(toks) >= 2:
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    elif toks:
        grams += [" ".join(toks)]
    return [_ref_bucket(g, seed, n) for g in grams if g != ""]


def _ref_train(rows, n, iters, lr, l2):
    w = np.zeros(n)
    b = 0.0
    feats = [(_ref_features(t, n), float(y)) for t, y in rows]
    mass = float(len(feats))
    for _ in range(iters):
        g = np.zeros(n)
        gb = 0.0
        for ii, y in feats:
            m = b + sum(w[i] for i in ii)
            p = 1.0 / (1.0 + np.exp(-m))
            r = p - y
            for i in ii:
                g[i] += r
            gb += r
        w = w - lr * (g / mass + l2 * w)
        b = b - lr * (gb / mass)
    return w, b


@pytest.fixture(scope="module")
def corpus(spark):
    import random

    rng = random.Random(3)
    good = "the quick analysis shows careful measured results".split()
    bad = "click here buy now free casino winner jackpot".split()
    rows = []
    for i in range(120):
        words = good if i % 2 else bad
        rows.append((i, " ".join(rng.choices(words, k=10)), i % 2))
    return spark.createDataFrame(
        rows, "doc_id long, text string, label int"
    ), rows


class TestHashedFeatures:
    def test_buckets_match_reference(self, spark):
        df = spark.createDataFrame(
            [(0, "Alpha beta gamma"), (1, "x"), (2, "")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["f"]
            for r in df.select(
                "doc_id",
                hashed_token_features(
                    F.col("text"), n_features=1024
                ).alias("f"),
            ).collect()
        }
        assert got[0] == _ref_features("Alpha beta gamma", 1024)
        assert got[1] == _ref_features("x", 1024)
        assert got[2] == []  # empty text: all grams filtered

    def test_null_text_stays_null(self, spark):
        df = spark.createDataFrame([(0, None)], "doc_id long, text string")
        r = df.select(
            hashed_token_features(F.col("text")).alias("f")
        ).first()
        assert r["f"] is None

    def test_bucket_range(self, corpus):
        df, _ = corpus
        mx = df.select(
            F.explode(
                hashed_token_features(F.col("text"), n_features=256)
            ).alias("f")
        ).agg(F.max("f"), F.min("f")).first()
        assert 0 <= mx[1] and mx[0] < 256


class TestTraining:
    def test_matches_numpy_reference(self, corpus):
        df, rows = corpus
        n = 1 << 10
        m = train_text_classifier(
            df, "text", "label", n_features=n, iters=5, lr=0.5,
            l2=1e-4,
        )
        w_ref, b_ref = _ref_train(
            [(t, y) for _, t, y in rows], n, 5, 0.5, 1e-4
        )
        np.testing.assert_allclose(m.weights, w_ref, atol=1e-9)
        assert m.bias == pytest.approx(b_ref, abs=1e-9)

    def test_loss_decreases_and_separates(self, corpus):
        df, _ = corpus
        m = train_text_classifier(
            df, "text", "label", n_features=1 << 12, iters=10, lr=2.0
        )
        assert m.losses[0] == pytest.approx(np.log(2), rel=1e-6)
        assert m.losses[-1] < m.losses[0] / 10
        scored = score_text_classifier(df, "text", m).collect()
        good = [r["quality_score"] for r in scored if r["label"] == 1]
        bad = [r["quality_score"] for r in scored if r["label"] == 0]
        assert min(good) > max(bad)
        assert all(0.0 < s < 1.0 for s in good + bad)

    def test_sample_weights_shift_the_boundary(self, spark):
        # same text on both labels; upweighting label-1 rows must pull
        # the bias (and so the score) above 1/2
        df = spark.createDataFrame(
            [(i, "same text here", i % 2, 9.0 if i % 2 else 1.0)
             for i in range(40)],
            "doc_id long, text string, label int, sw double",
        )
        m = train_text_classifier(
            df, "text", "label", n_features=64, iters=30, lr=1.0,
            weight=F.col("sw"),
        )
        s = score_text_classifier(
            df.limit(1), "text", m
        ).first()["quality_score"]
        assert s > 0.8  # mass ratio 9:1 → p -> 0.9

    def test_null_rows_carry_no_mass(self, spark):
        df = spark.createDataFrame(
            [(0, "good text", 1), (1, None, 0), (2, "bad text", None),
             (3, "more good text", 1), (4, "awful words", 0)],
            "doc_id long, text string, label int",
        )
        m = train_text_classifier(
            df, "text", "label", n_features=256, iters=3, lr=1.0
        )
        assert len(m.losses) == 3  # trains on the 3 valid rows

    def test_score_null_text_is_null(self, corpus, spark):
        df, _ = corpus
        m = train_text_classifier(
            df, "text", "label", n_features=256, iters=2
        )
        nd = spark.createDataFrame(
            [(0, None), (1, "quick analysis")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["quality_score"]
            for r in score_text_classifier(nd, "text", m).collect()
        }
        assert got[0] is None and got[1] is not None

    def test_deterministic(self, corpus):
        df, _ = corpus
        a = train_text_classifier(
            df, "text", "label", n_features=512, iters=3
        )
        b = train_text_classifier(
            df, "text", "label", n_features=512, iters=3
        )
        assert a.weights == b.weights and a.bias == b.bias


class TestStreamingScore:
    def test_stream_scores_match_batch(self, corpus, spark, tmp_path):
        # scoring is a pure Arrow map — it must run unchanged on a
        # Structured Streaming frame and emit the same scores
        df, _ = corpus
        m = train_text_classifier(
            df, "text", "label", n_features=1 << 10, iters=5, lr=1.0
        )
        src = tmp_path / "clf_stream"
        df.select("doc_id", "text").coalesce(2).write.parquet(str(src))
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(str(src))
        out = score_text_classifier(stream, "text", m)
        q = (
            out.writeStream.format("memory")
            .queryName("clf_scores")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r["quality_score"]
            for r in spark.sql("SELECT * FROM clf_scores").collect()
        }
        exp = {
            r["doc_id"]: r["quality_score"]
            for r in score_text_classifier(
                df.select("doc_id", "text"), "text", m
            ).collect()
        }
        assert got == exp


class TestClassifierEval:
    """classifier_eval — pure-Python differential of the bin sweep,
    calibration, cumulative precision/recall/F1, and the binned
    trapezoidal AUC."""

    def _ref(self, pairs, nb):
        import collections

        bins = collections.defaultdict(lambda: [0, 0, 0.0])
        for s, y in pairs:
            b = min(int(s * nb), nb - 1)
            bins[b][0] += 1
            bins[b][1] += y
            bins[b][2] += s
        P = sum(v[1] for v in bins.values())
        N = sum(v[0] - v[1] for v in bins.values())
        out = {}
        cum_tp = cum_fp = 0
        prev_tpr = prev_fpr = 0.0
        auc = 0.0
        for b in sorted(bins, reverse=True):
            n, npos, ssum = bins[b]
            cum_tp += npos
            cum_fp += n - npos
            tpr, fpr = cum_tp / P, cum_fp / N
            auc += (fpr - prev_fpr) * (tpr + prev_tpr) / 2
            prev_tpr, prev_fpr = tpr, fpr
            prec = cum_tp / (cum_tp + cum_fp)
            rec = cum_tp / P
            out[b] = dict(
                n=n, n_pos=npos, mean_score=ssum / n,
                frac_pos=npos / n, cum_tp=cum_tp, cum_fp=cum_fp,
                precision=prec, recall=rec,
                f1=2 * prec * rec / (prec + rec) if prec + rec else None,
            )
        return out, auc

    def test_differential(self, spark):
        import numpy as np

        from pandas_weights_spark.functions.classifier import (
            classifier_eval,
        )

        rng = np.random.RandomState(13)
        scores = rng.rand(400)
        labels = (scores + rng.randn(400) * 0.3 > 0.5).astype(int)
        pairs = list(zip(scores.tolist(), labels.tolist()))
        df = spark.createDataFrame(
            pairs, "score double, label int"
        )
        got = {
            r["bin"]: r
            for r in classifier_eval(df, "score", "label", 10)
            .collect()
        }
        exp, auc = self._ref(pairs, 10)
        assert set(got) == set(exp)
        for b, e in exp.items():
            g = got[b]
            for k in ("n", "n_pos", "cum_tp", "cum_fp"):
                assert g[k] == e[k], (b, k)
            for k in (
                "mean_score", "frac_pos", "precision", "recall", "f1"
            ):
                assert g[k] == pytest.approx(e[k], abs=2e-6), (b, k)
            assert g["auc"] == pytest.approx(auc, abs=2e-6)
            assert g["threshold"] == pytest.approx(b / 10)
        # a correlated score must beat coin-flip AUC comfortably
        assert auc > 0.7

    def test_perfect_classifier_auc_one(self, spark):
        from pandas_weights_spark.functions.classifier import (
            classifier_eval,
        )

        rows = [(i / 100.0, 1 if i >= 50 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, "score double, label int")
        r = classifier_eval(df, "score", "label", 10).first()
        assert r["auc"] == pytest.approx(1.0)

    @pytest.mark.parametrize("label", [0, 1])
    def test_single_class_null_auc(self, spark, label):
        # r12 ADVICE: a single-class eval sample (no positives or no
        # negatives) must yield NULL auc — try_divide'd tpr/fpr — not
        # Infinity/NaN ROC segments
        import math

        from pandas_weights_spark.functions.classifier import (
            classifier_eval,
        )

        rows = [(i / 20.0, label) for i in range(20)]
        df = spark.createDataFrame(rows, "score double, label int")
        out = classifier_eval(df, "score", "label", 5).collect()
        assert out
        for r in out:
            assert r["auc"] is None
            for k in ("precision", "recall", "f1"):
                v = r[k]
                assert v is None or math.isfinite(v), (k, v)

    def test_validation_and_bounded_plan(self, spark):
        from pandas_weights_spark.functions.classifier import (
            classifier_eval,
        )

        df = spark.createDataFrame(
            [(0.5, 1)], "score double, label int"
        )
        with pytest.raises(ValueError):
            classifier_eval(df, "score", "label", 1)
        plan = (
            classifier_eval(df, "score", "label", 5)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # windows run over the AGGREGATED bin table, after the bin
        # Aggregate node — never over the raw data
        agg_pos = plan.rfind("Aggregate")
        win_pos = plan.find("Window")
        assert win_pos >= 0 and agg_pos > win_pos
