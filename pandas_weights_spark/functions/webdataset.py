"""WebDataset-style tar sharding for multimodal training corpora.

The de-facto interchange format for image/audio-text training data is
"a directory of .tar shards, each member named ``<key>.<ext>``, all
files of one sample adjacent" (the public WebDataset convention used
by img2dataset / OpenCLIP / NeMo et al.). This module materializes
that layout from a DataFrame — and reads it back — WITHOUT side
effects: a shard is one ROW carrying the complete tar archive as
bytes, so any binary sink (parquet, object store put, foreachBatch)
can persist it, and the operation stays deterministic and testable.

Scale shape:

* :func:`to_webdataset_shards` — samples hash into shards via the
  engine's md5 uniform (reproducible under any partitioning), then
  ONE ``applyInPandas`` per shard builds the tar in memory (stdlib
  ``tarfile``; members sorted by key — the convention's "sample files
  adjacent" rule). Shard size is the memory bound: size
  ``samples_per_shard × payload`` to executor memory, exactly like
  every shard writer.
* :func:`from_webdataset_shards` — the inverse: one ``mapInPandas``
  over shard rows, emitting ``(shard, key, ext, payload)`` member
  rows; regroup by key downstream if a columnar per-sample layout is
  wanted (one shuffle, the encode_documents shape).

Determinism: member bytes are fixed (mtime=0, uid/gid=0, mode 0644),
so the SAME data always produces byte-identical shards — diffable,
cacheable, oracle-friendly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandas_weights_spark.sample import uniform_hash

__all__ = ["to_webdataset_shards", "from_webdataset_shards"]


def to_webdataset_shards(
    df: DataFrame,
    key_col: str,
    file_cols: "dict[str, str]",
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Pack samples into WebDataset tar shards: returns ``(shard,
    n_samples, tar)`` with one row per shard. ``file_cols`` maps
    extension → source column (e.g. ``{"txt": "text", "jpg":
    "image_payload"}``); string columns are UTF-8 encoded, binary
    columns pass through, NULL members are skipped (a sample may have
    a subset of files). ``key_col`` must be unique per sample — it
    becomes the member basename, so collisions would silently merge
    samples; keys are stringified.

    Tar members are emitted sorted by ``(key, ext)`` with zeroed
    metadata — byte-identical output for identical input, any
    partitioning.
    """
    if not file_cols:
        raise ValueError("file_cols must map at least one extension")
    for ext in file_cols:
        if not ext or "/" in ext or "." in ext:
            raise ValueError(f"bad extension {ext!r}")
    cols = list(file_cols.items())
    u = uniform_hash([F.col(key_col)], seed)
    shard = F.floor(u * F.lit(float(n_shards))).cast("int")
    src = df.select(
        shard.alias("__shard__"),
        F.col(key_col).cast("string").alias("__key__"),
        *[
            F.col(c).alias(f"__f{i}__")
            for i, (_, c) in enumerate(cols)
        ],
    )
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("tar", T.BinaryType()),
        ]
    )
    exts = [e for e, _ in cols]

    def build(pdf):
        import io
        import tarfile

        import pandas as pd

        pdf = pdf.sort_values("__key__", kind="mergesort")
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for _, row in pdf.iterrows():
                key = row["__key__"]
                wrote = False
                for i, ext in enumerate(exts):
                    v = row[f"__f{i}__"]
                    if v is None:
                        continue
                    data = (
                        v.encode("utf-8") if isinstance(v, str)
                        else bytes(v)
                    )
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.mode = 0o644
                    tf.addfile(info, io.BytesIO(data))
                    wrote = True
                if wrote:
                    n += 1
        return pd.DataFrame(
            {
                "shard": [int(pdf["__shard__"].iloc[0])],
                "n_samples": [n],
                "tar": [buf.getvalue()],
            }
        )

    return src.groupBy("__shard__").applyInPandas(build, out_schema)


def from_webdataset_shards(
    shards: DataFrame,
    tar_col: str = "tar",
    shard_col: str = "shard",
    extensions: "Sequence[str] | None" = None,
) -> DataFrame:
    """Unpack shard rows back into members: ``(shard, key, ext,
    payload)``, one row per tar member (``key`` = basename before the
    FIRST dot — multi-dot extensions like ``seg.png`` stay in ``ext``,
    the WebDataset rule). ``extensions`` optionally filters members
    early (column-pruning for tar files). One ``mapInPandas`` pass —
    no shuffle; regroup by key downstream for a per-sample layout.
    """
    keep = set(extensions) if extensions is not None else None
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("key", T.StringType()),
            T.StructField("ext", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def unpack(batches):
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            shards_o, keys, exts, payloads = [], [], [], []
            for sid, blob in zip(pdf[shard_col], pdf[tar_col]):
                if blob is None:
                    continue
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(blob)), mode="r"
                ) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        name = m.name.rsplit("/", 1)[-1]
                        if "." not in name:
                            continue
                        key, ext = name.split(".", 1)
                        if keep is not None and ext not in keep:
                            continue
                        shards_o.append(
                            int(sid) if sid is not None else None
                        )
                        keys.append(key)
                        exts.append(ext)
                        payloads.append(tf.extractfile(m).read())
            yield pd.DataFrame(
                {
                    "shard": pd.array(shards_o, dtype="Int32"),
                    "key": keys,
                    "ext": exts,
                    "payload": payloads,
                }
            )

    return shards.mapInPandas(unpack, out_schema)
