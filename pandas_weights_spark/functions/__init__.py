"""Large-scale data-pipeline operators beyond the reference's surface
(SURVEY.md §2.6 'north-star extensions'; BASELINE.json north star).

Everything here is expression-first: built-in ``pyspark.sql.functions``
(JVM, whole-stage codegen) wherever the semantics allow, Arrow-batched
Pandas UDFs only where they genuinely don't (multimodal decode).
"""

from pandas_weights_spark.functions import (  # noqa: F401
    asof,
    bloom,
    cdx,
    classifier,
    datasheet,
    decontam,
    dedup,
    distinct,
    dsir,
    fuzzy,
    graph,
    html,
    multimodal,
    packing,
    pca,
    pq,
    quality,
    range_join,
    robots,
    search,
    similarity,
    sketch,
    tdigest,
    text,
    vocab,
    webdataset,
)
