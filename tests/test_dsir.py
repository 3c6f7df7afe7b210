"""DSIR importance resampling (functions/dsir.py) vs a transparent
pure-Python implementation of the same bag-of-hashed-n-grams model
(Xie et al. 2023) on the same md5 buckets."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.dsir import (
    dsir_bucket_counts,
    dsir_gumbel_topk,
    dsir_log_ratio,
    dsir_score,
)

N = 64  # buckets
SEED = 7


def _bucket(gram: str) -> int:
    h = hashlib.md5(f"{gram}|{SEED}".encode()).hexdigest()
    return int(h[:8], 16) % N


def _feats(text: str):
    toks = text.lower().split()
    grams = list(toks)
    if len(toks) >= 2:
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    elif toks:
        grams += [" ".join(toks)]
    return [_bucket(g) for g in grams if g != ""]


def _counts(texts):
    c = {}
    for t in texts:
        for b in _feats(t):
            c[b] = c.get(b, 0.0) + 1.0
    return c


def _log_ratio(ct, cr, alpha=1.0):
    tt, tr = sum(ct.values()), sum(cr.values())
    out = {}
    for b in set(ct) | set(cr):
        pt = (ct.get(b, 0.0) + alpha) / (tt + alpha * N)
        pr = (cr.get(b, 0.0) + alpha) / (tr + alpha * N)
        out[b] = math.log(pt) - math.log(pr)
    return out


def _uniform(key: str, seed: int) -> float:
    h = hashlib.md5(f"{key}|{seed}".encode()).hexdigest()
    return int(h[:8], 16) * 2.0**-32 + 2.0**-33


TARGET = [
    "the sun rises over quiet hills",
    "the river bends through quiet valleys",
    "morning light settles on the hills",
]
RAW = [
    "click here to win big prizes now",
    "the sun sets over the hills",
    "buy one get one free today only",
    "quiet morning light on the river",
    "limited offer ends tonight click now",
    "the hills and the river at dawn",
]


@pytest.fixture(scope="module")
def frames(spark):
    tgt = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TARGET)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
    )
    return tgt, raw


class TestBucketCounts:
    def test_matches_reference(self, spark, frames):
        tgt, _ = frames
        got = {
            r["bucket"]: r["cnt"]
            for r in dsir_bucket_counts(
                tgt, "text", n_buckets=N, seed=SEED
            ).collect()
        }
        assert got == _counts(TARGET)

    def test_null_text_contributes_nothing(self, spark):
        df = spark.createDataFrame(
            [(0, None), (1, "one two")], "doc_id long, text string"
        )
        got = dsir_bucket_counts(df, "text", n_buckets=N, seed=SEED)
        assert sum(r["cnt"] for r in got.collect()) == 3.0  # 2 uni + 1 bi


class TestLogRatio:
    def test_matches_reference(self, spark, frames):
        tgt, raw = frames
        ct = dsir_bucket_counts(tgt, "text", n_buckets=N, seed=SEED)
        cr = dsir_bucket_counts(raw, "text", n_buckets=N, seed=SEED)
        got = {
            r["bucket"]: r["log_ratio"]
            for r in dsir_log_ratio(ct, cr, N).collect()
        }
        ref = _log_ratio(_counts(TARGET), _counts(RAW))
        assert set(got) == set(ref)
        for b in ref:
            assert got[b] == pytest.approx(ref[b], rel=1e-12)

    def test_alpha_guard(self, spark, frames):
        tgt, raw = frames
        ct = dsir_bucket_counts(tgt, "text", n_buckets=N, seed=SEED)
        with pytest.raises(ValueError, match="alpha"):
            dsir_log_ratio(ct, ct, N, alpha=0.0)


class TestScore:
    def test_matches_reference(self, spark, frames):
        tgt, raw = frames
        ct = dsir_bucket_counts(tgt, "text", n_buckets=N, seed=SEED)
        cr = dsir_bucket_counts(raw, "text", n_buckets=N, seed=SEED)
        lr = dsir_log_ratio(ct, cr, N)
        got = {
            r["doc_id"]: r["log_importance"]
            for r in dsir_score(
                raw, "text", lr, ["doc_id"], n_buckets=N, seed=SEED
            ).collect()
        }
        ref_lr = _log_ratio(_counts(TARGET), _counts(RAW))
        for i, t in enumerate(RAW):
            want = sum(ref_lr[b] for b in _feats(t))
            assert got[i] == pytest.approx(want, rel=1e-9)
        # target-like raw docs outscore spam: doc 3 shares target
        # vocabulary, doc 2 partially, docs 0/4 are pure spam
        assert got[3] > got[0] and got[3] > got[4]

    def test_null_text_stays_null_empty_scores_zero(self, spark, frames):
        tgt, raw = frames
        ct = dsir_bucket_counts(tgt, "text", n_buckets=N, seed=SEED)
        cr = dsir_bucket_counts(raw, "text", n_buckets=N, seed=SEED)
        lr = dsir_log_ratio(ct, cr, N)
        df = spark.createDataFrame(
            [(0, None), (1, ""), (2, "the hills")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["log_importance"]
            for r in dsir_score(
                df, "text", lr, ["doc_id"], n_buckets=N, seed=SEED
            ).collect()
        }
        assert got[0] is None
        assert got[1] == 0.0
        assert got[2] != 0.0

    def test_preserves_input_columns(self, spark, frames):
        tgt, raw = frames
        ct = dsir_bucket_counts(tgt, "text", n_buckets=N, seed=SEED)
        lr = dsir_log_ratio(ct, ct, N)
        out = dsir_score(raw, "text", lr, ["doc_id"], n_buckets=N, seed=SEED)
        assert out.columns == ["doc_id", "text", "log_importance"]
        assert out.count() == len(RAW)


class TestHashFamilyAgreement:
    """portable=False (xxhash64) is a different but equally valid
    hashing-trick instance: same state bound, same model shape, and
    the scores it produces must discriminate the same way."""

    def test_fast_path_counts_and_discrimination(self, spark, frames):
        tgt, raw = frames
        ct = dsir_bucket_counts(
            tgt, "text", n_buckets=N, seed=SEED, portable=False
        )
        cr = dsir_bucket_counts(
            raw, "text", n_buckets=N, seed=SEED, portable=False
        )
        # identical TOTAL gram mass — the family changes bucket ids,
        # never how many grams exist
        tot = sum(r["cnt"] for r in ct.collect())
        assert tot == sum(_counts(TARGET).values())
        lr = dsir_log_ratio(ct, cr, N)
        got = {
            r["doc_id"]: r["log_importance"]
            for r in dsir_score(
                raw, "text", lr, ["doc_id"], n_buckets=N, seed=SEED,
                portable=False,
            ).collect()
        }
        # same qualitative ordering as the md5 family: target-like
        # raw docs outscore pure spam
        assert got[3] > got[0] and got[3] > got[4]

    def test_fast_path_deterministic(self, spark, frames):
        _, raw = frames
        a = dsir_bucket_counts(
            raw, "text", n_buckets=N, seed=SEED, portable=False
        ).collect()
        b = dsir_bucket_counts(
            raw.repartition(5), "text", n_buckets=N, seed=SEED,
            portable=False,
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestGumbelTopK:
    def test_matches_reference_selection(self, spark, frames):
        _, raw = frames
        scored = raw.withColumn("lw", F.col("doc_id").cast("double") / 10.0)
        got = [
            r["doc_id"]
            for r in dsir_gumbel_topk(
                scored, F.col("lw"), 3, ["doc_id"], seed=11
            ).collect()
        ]
        keys = sorted(
            (
                (i / 10.0)
                - math.log(-math.log(_uniform(str(i), 11))),
                -i,
            )
            for i in range(len(RAW))
        )[::-1]
        want = [-k[1] for k in keys[:3]]
        assert got == want

    def test_deterministic_and_seed_sensitive(self, spark, frames):
        _, raw = frames
        scored = raw.withColumn("lw", F.lit(0.0))
        a = [
            r["doc_id"]
            for r in dsir_gumbel_topk(
                scored, F.col("lw"), 2, ["doc_id"], seed=1
            ).collect()
        ]
        b = [
            r["doc_id"]
            for r in dsir_gumbel_topk(
                scored.repartition(5), F.col("lw"), 2, ["doc_id"], seed=1
            ).collect()
        ]
        assert a == b  # repartition-invariant
        seeds = {
            tuple(
                r["doc_id"]
                for r in dsir_gumbel_topk(
                    scored, F.col("lw"), 2, ["doc_id"], seed=s
                ).collect()
            )
            for s in range(8)
        }
        assert len(seeds) > 1

    def test_weight_bias(self, spark):
        # one doc with +5 log-weight should be selected in nearly
        # every seed's top-1 over 16 uniform competitors
        df = spark.createDataFrame(
            [(i, 5.0 if i == 0 else 0.0) for i in range(17)],
            "doc_id long, lw double",
        )
        wins = sum(
            dsir_gumbel_topk(df, F.col("lw"), 1, ["doc_id"], seed=s)
            .collect()[0]["doc_id"]
            == 0
            for s in range(12)
        )
        assert wins >= 9

    def test_null_weight_never_selected_and_k_guard(self, spark):
        df = spark.createDataFrame(
            [(0, None), (1, 0.0)], "doc_id long, lw double"
        )
        got = dsir_gumbel_topk(df, F.col("lw"), 5, ["doc_id"]).collect()
        assert [r["doc_id"] for r in got] == [1]
        with pytest.raises(ValueError, match="k"):
            dsir_gumbel_topk(df, F.col("lw"), 0, ["doc_id"])
