"""WARC (Web ARChive, ISO 28500 / the public WARC 1.0 spec) source and
sink — the container format of Common Crawl and every web-scale text
corpus. Mirrors the webdataset module's no-side-effect design: a WARC
file is ONE ROW carrying the complete archive as bytes, so any binary
sink persists it and the operation stays deterministic and testable.

* :func:`warc_record` — a pure Column expression building one WARC/1.0
  record (``resource`` payload-as-is, or ``response`` with a minimal
  HTTP/1.1 wrapper) as BINARY. Record-IDs are deterministic
  ``urn:uuid`` values derived from md5(uri, date) — reproducible under
  any partitioning, and the reason the DuckDB oracle can replay record
  construction byte-for-byte.
* :func:`to_warc_shards` — rows hash into shards (engine md5 uniform),
  one ``applyInPandas`` per shard concatenates the records — plain, or
  one gzip MEMBER per record (``gzip=True``), the framing Common Crawl
  uses so a reader can seek to a record without decompressing the
  file. Shard size is the executor-memory bound, exactly like every
  archive writer.
* :func:`parse_warc_bytes` / :func:`from_warc_shards` — the inverse:
  pure-Python record walk (plain or member-gzip, auto-detected) inside
  ``mapInPandas``, emitting one row per record with parsed headers and
  the payload; ``response`` records also split the HTTP header block
  off the body.
* :func:`read_warc` — ``binaryFile`` scan → :func:`from_warc_shards`.
  NOTE: ``binaryFile`` materializes a whole file per row, so this path
  is sized for shard-sized files (the ~1 GiB Common Crawl convention
  is fine at executor memory); record-level gzip members mean the
  parse itself never needs more than one record in memory.

Scale shape: building records is row-local Column algebra (scan
speed); sharding is one hash shuffle; parsing is one mapInPandas with
per-record memory. No driver traffic anywhere.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandas_weights_spark.sample import uniform_hash

__all__ = [
    "warc_record",
    "to_warc_shards",
    "parse_warc_bytes",
    "from_warc_shards",
    "read_warc",
]

_CRLF = "\r\n"


def _enc(col_or_str) -> Column:
    c = F.lit(col_or_str) if isinstance(col_or_str, str) else col_or_str
    return F.encode(c, "UTF-8")


def warc_record(
    uri: Column,
    date: Column,
    payload: Column,
    warc_type: str = "resource",
    content_type: str = "text/html",
) -> Column:
    """One WARC/1.0 record as a BINARY Column. ``payload`` must be
    binary (``F.encode`` strings first); ``date`` is the
    ``YYYY-MM-DDTHH:MM:SSZ`` string the spec requires. ``resource``
    records carry the payload verbatim; ``response`` records wrap it
    in a minimal ``HTTP/1.1 200 OK`` block (Content-Length set), the
    Common Crawl shape. The record id is ``urn:uuid`` over
    md5(uri, '|', date) — deterministic by construction."""
    if warc_type not in ("resource", "response"):
        raise ValueError(
            "warc_type must be 'resource' or 'response', got "
            f"{warc_type!r}"
        )
    rid = F.md5(F.concat(uri, F.lit("|"), date))
    rid = F.concat(
        F.lit("<urn:uuid:"),
        F.substring(rid, 1, 8), F.lit("-"),
        F.substring(rid, 9, 4), F.lit("-"),
        F.substring(rid, 13, 4), F.lit("-"),
        F.substring(rid, 17, 4), F.lit("-"),
        F.substring(rid, 21, 12),
        F.lit(">"),
    )
    if warc_type == "response":
        block = F.concat(
            _enc(
                "HTTP/1.1 200 OK" + _CRLF
                + f"Content-Type: {content_type}" + _CRLF
                + "Content-Length: "
            ),
            _enc(F.length(payload).cast("string")),
            _enc(_CRLF + _CRLF),
            payload,
        )
        block_ct = "application/http; msgtype=response"
    else:
        block = payload
        block_ct = content_type
    header = F.concat(
        _enc("WARC/1.0" + _CRLF + f"WARC-Type: {warc_type}" + _CRLF),
        _enc("WARC-Target-URI: "), _enc(uri), _enc(_CRLF),
        _enc("WARC-Date: "), _enc(date), _enc(_CRLF),
        _enc("WARC-Record-ID: "), _enc(rid), _enc(_CRLF),
        _enc(f"Content-Type: {block_ct}" + _CRLF),
        _enc("Content-Length: "),
        _enc(F.length(block).cast("string")),
        _enc(_CRLF + _CRLF),
    )
    return F.concat(header, block, _enc(_CRLF + _CRLF))


def to_warc_shards(
    df: DataFrame,
    record_col: str,
    n_shards: int = 64,
    order_col: str | None = None,
    gzip_records: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Pack record-bytes rows into WARC files: returns ``(shard,
    n_records, warc)``, one row per shard. Records are ordered by
    ``order_col`` (default: the record bytes themselves) inside a
    shard, so the output is deterministic under any partitioning.
    ``gzip_records=True`` writes one gzip member per record (mtime=0 —
    byte-deterministic), the Common Crawl framing."""
    oc = order_col or "__rec__"
    base = df.select(
        F.col(record_col).alias("__rec__"),
        *([F.col(order_col).alias("__ord__")] if order_col else []),
        # base64 the binary before hashing: a binary->string cast
        # mangles invalid-UTF8 bytes to replacement chars, which would
        # collide distinct payloads onto one shard (balance, not
        # correctness — but base64 is exact)
        (uniform_hash([F.base64(F.col(record_col))], seed=seed)
         * n_shards)
        .cast("int")
        .alias("shard"),
    )
    if not order_col:
        base = base.withColumn("__ord__", F.col("__rec__"))

    schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("warc", T.BinaryType()),
        ]
    )

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__ord__", kind="mergesort")
        out = io.BytesIO()
        for rec in pdf["__rec__"]:
            b = bytes(rec)
            if gzip_records:
                # one gzip member per record, mtime pinned for
                # byte-determinism (RFC 1952 allows concatenated
                # members; readers seek record boundaries this way)
                b = gzip.compress(b, compresslevel=6, mtime=0)
            out.write(b)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_records": [len(pdf)],
                "warc": [out.getvalue()],
            }
        )

    return base.groupBy("shard").applyInPandas(build, schema)


def _split_gzip_members(data: bytes) -> "list[bytes]":
    """Decompress a stream of concatenated gzip members into the list
    of member payloads (each WARC record is one member)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out.append(d.decompress(data[pos:]))
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt trailer: stop cleanly
            break
        pos += consumed
    return out


def parse_warc_bytes(data: bytes) -> "list[dict]":
    """Parse one WARC file (plain or member-gzip, auto-detected) into
    record dicts: ``warc_type, target_uri, date, record_id,
    content_type, block`` plus — for ``response`` records —
    ``http_body`` (block minus the HTTP header section). Tolerant of
    trailing garbage; raises ``ValueError`` only when no record
    parses."""
    if data[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(data)
        data = b"".join(chunks)
    records = []
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/1.0\r\n", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers = {}
        for line in data[start + 10 : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        block = data[hdr_end + 4 : hdr_end + 4 + clen]
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", ""),
            "content_type": headers.get("content-type", ""),
            "block": block,
        }
        if rec["warc_type"] == "response":
            split = block.find(b"\r\n\r\n")
            rec["http_body"] = (
                block[split + 4 :] if split >= 0 else block
            )
        else:
            rec["http_body"] = None
        records.append(rec)
        pos = hdr_end + 4 + clen
    if not records and n > 0:
        raise ValueError("no WARC/1.0 record found in payload")
    return records


_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("block", T.BinaryType()),
        T.StructField("http_body", T.BinaryType()),
    ]
)


def from_warc_shards(
    df: DataFrame, warc_col: str = "warc", shard_col: str = "shard"
) -> DataFrame:
    """Inverse of :func:`to_warc_shards`: one row per WARC record.
    ``mapInPandas`` — per-record memory, no shuffle."""

    def emit(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for shard, blob in zip(pdf[shard_col], pdf[warc_col]):
                for i, rec in enumerate(parse_warc_bytes(bytes(blob))):
                    rows.append(
                        {
                            "shard": int(shard),
                            "rec_idx": i,
                            "warc_type": rec["warc_type"],
                            "target_uri": rec["target_uri"],
                            "date": rec["date"],
                            "record_id": rec["record_id"],
                            "content_type": rec["content_type"],
                            "block": rec["block"],
                            "http_body": rec["http_body"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RECORD_SCHEMA.fields]
            )

    return df.select(shard_col, warc_col).mapInPandas(
        emit, _RECORD_SCHEMA
    )


def read_warc(spark, path: str) -> DataFrame:
    """Scan ``.warc`` / ``.warc.gz`` files into record rows: one
    ``binaryFile`` read (whole file per row — size files to executor
    memory, the Common Crawl ~1 GiB convention) then
    :func:`from_warc_shards`. ``shard`` carries a stable per-file hash
    of the path."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            (uniform_hash([F.col("path")]) * (1 << 30))
            .cast("int")
            .alias("shard"),
            F.col("content").alias("warc"),
        )
    )
    return from_warc_shards(files)
