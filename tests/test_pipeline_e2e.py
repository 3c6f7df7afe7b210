"""End-to-end training-data pipeline over the real sf0.001 documents:
quality filter → near-dup clustering dedup → benchmark decontamination
→ chunking → token-budget packing. Asserts the stage contracts compose
(each stage consumes the previous stage's frame) and the invariants
that make the output trainable: no duplicate survivors, no
contaminated docs, chunk budgets respected, packs under budget."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.decontam import decontaminate
from pandas_weights_spark.functions.graph import neardup_clusters
from pandas_weights_spark.functions.packing import (
    chunk_documents,
    pack_sequences,
)
from pandas_weights_spark.functions.quality import quality_flags
from pandas_weights_spark.functions.text import bpe_token_count


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")


def test_full_pipeline(spark, docs):
    n0 = docs.count()

    # 1. quality filter (loose thresholds — the synthetic docs are short)
    fl = quality_flags(F.col("text"), min_words=5, min_stop_words=0,
                       min_alpha_frac=0.5)
    kept = docs.where(fl["keep"])
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. near-dup dedup: cluster, keep survivors
    clusters = neardup_clusters(kept, "text", "doc_id", threshold=0.6)
    survivors = kept.join(
        clusters.where(F.col("is_survivor")).select("doc_id"),
        "doc_id", "left_semi",
    )
    n2 = survivors.count()
    assert 0 < n2 <= n1
    # survivor set has no near-dup pair inside it at the SAME clustering
    again = neardup_clusters(survivors, "text", "doc_id", threshold=0.6)
    assert again.where(~F.col("is_survivor")).count() == 0

    # 3. decontaminate against a fake benchmark (every 10th doc's text)
    bench = docs.where(F.col("doc_id") % 10 == 0).select("text")
    clean = decontaminate(survivors, "text", "doc_id", bench, n=8,
                          threshold=0.8)
    n3 = clean.count()
    assert 0 < n3 <= n2
    # none of the benchmark's exact texts survive
    leaked = clean.join(
        bench.withColumnRenamed("text", "btext"),
        F.col("text") == F.col("btext"),
    ).count()
    assert leaked == 0

    # 4. chunk to a 32-token window
    chunks = chunk_documents(clean, "text", "doc_id", chunk_tokens=32,
                             overlap=4)
    assert chunks.where(F.col("n_tokens") > 32).count() == 0
    assert chunks.select("doc_id").distinct().count() == n3

    # 4b. chunk-level repeated-span sweep (r5): after document-level
    # dedup + decontam, no copied span should remain ACROSS surviving
    # documents at a high threshold — the substring-dedup 80% check
    from pandas_weights_spark.functions.dedup import chunk_near_duplicates

    spans = chunk_near_duplicates(
        clean, "text", "doc_id", chunk_tokens=32, overlap=4,
        threshold=0.9,
    )
    assert spans.count() == 0, spans.limit(5).collect()

    # 5. pack chunks into 256-token training rows
    with_counts = chunks.withColumn(
        "bpe", bpe_token_count(F.col("chunk_text")).cast("double")
    )
    packed = pack_sequences(
        with_counts, F.col("bpe"), budget=256,
        key_cols=["doc_id", "chunk_id"], n_buckets=4, seed=7,
    )
    assert packed.count() == chunks.count()  # every chunk lands somewhere
    # concat-and-chunk contract: every item STARTS inside its pack's
    # budget window (straddling items intentionally spill into the
    # next pack at training time — that is what pack_offset encodes)
    assert packed.where(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 256)
    ).count() == 0
