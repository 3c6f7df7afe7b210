"""JSONL shard interchange — the de-facto text-corpus format (Dolma,
RedPajama, The Pile all ship ``*.jsonl.gz``: one JSON object per line,
gzip per shard). Same no-side-effect design as the webdataset and WARC
modules: a shard is ONE ROW carrying the file bytes, so any binary
sink persists it and everything stays deterministic and testable.

* :func:`to_jsonl_shards` — ``F.to_json`` per row (JVM-side; JSON
  string escaping makes embedded newlines safe), hash-sharded, one
  ``applyInPandas`` per shard joins lines (+ optional whole-shard gzip,
  mtime=0 → byte-deterministic). Rows order by the serialized line
  inside a shard — deterministic under any partitioning.
* :func:`from_jsonl_shards` — the decode is COLUMN-LEVEL for plain
  shards (split on newline → explode → ``F.from_json`` — whole-stage
  codegen, no Python); gzip shards pass through one tiny
  ``mapInPandas`` gunzip first (auto-detected via the magic bytes).

Scale shape: serialize is row-local, sharding is one hash shuffle,
parse is scan-shaped. Shard size is the executor-memory bound, like
every archive writer.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandas_weights_spark.sample import uniform_hash

__all__ = ["to_jsonl_shards", "from_jsonl_shards"]


def to_jsonl_shards(
    df: DataFrame,
    cols: Sequence[str],
    n_shards: int = 64,
    gzip_shard: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Pack rows into JSONL shards: returns ``(shard, n_records,
    data)`` with one row per shard; ``data`` is the UTF-8 file bytes
    (every line newline-terminated), gzipped whole when
    ``gzip_shard=True`` (mtime=0 — byte-deterministic)."""
    if not cols:
        raise ValueError("cols must name at least one column")
    line = F.to_json(F.struct(*[F.col(c) for c in cols]))
    base = df.select(
        line.alias("__line__"),
        (uniform_hash([line], seed=seed) * n_shards)
        .cast("int")
        .alias("shard"),
    )

    schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__line__", kind="mergesort")
        body = ("\n".join(pdf["__line__"]) + "\n").encode("utf-8")
        if gzip_shard:
            body = gzip.compress(body, compresslevel=6, mtime=0)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_records": [len(pdf)],
                "data": [body],
            }
        )

    return base.groupBy("shard").applyInPandas(build, schema)


def from_jsonl_shards(
    df: DataFrame,
    schema,
    data_col: str = "data",
    shard_col: str = "shard",
) -> DataFrame:
    """Inverse of :func:`to_jsonl_shards`: one row per JSON line,
    parsed into ``schema`` (a DDL string like ``"doc_id long, text
    string"`` or a StructType), plus the originating ``shard``.
    Gzip shards (magic ``1f 8b``) are inflated in one small
    ``mapInPandas``; everything after that — newline split, explode,
    ``from_json`` — is JVM-side. Lines that fail to parse yield NULL
    fields (Spark's PERMISSIVE mode), they are not dropped."""
    plain_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def inflate(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            texts = []
            for blob in pdf[data_col]:
                b = bytes(blob)
                if b[:2] == b"\x1f\x8b":
                    b = gzip.decompress(b)
                texts.append(b.decode("utf-8"))
            yield pd.DataFrame(
                {"shard": pdf[shard_col].astype("int32"),
                 "text": texts}
            )

    text = df.select(shard_col, data_col).mapInPandas(
        inflate, plain_schema
    )
    lines = text.select(
        "shard",
        F.explode(
            F.filter(
                F.split(F.col("text"), "\n"),
                lambda s: F.length(s) > 0,
            )
        ).alias("__line__"),
    )
    return lines.select(
        "shard", F.from_json("__line__", schema).alias("__r__")
    ).select("shard", "__r__.*")
