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
  is fine at executor memory); the parse inflates the whole file
  before walking records (r10 docstring fix — the member-gzip framing
  lets seek-based readers do one record at a time, but THIS reader
  holds the inflated shard, so budget executor memory for it).
* :func:`decode_http_body` / :func:`sniff_charset` (r10) — charset-
  aware transcode of response bodies: BOM, then the ``charset=``
  parameter of the HTTP ``Content-Type`` header, then a ``<meta
  charset>`` / ``http-equiv`` sniff of the head bytes, then UTF-8
  with replacement. A real crawl is a few percent GBK / Shift-JIS /
  windows-125x — decoding blind as UTF-8 turns those pages into
  mojibake that silently poisons dedup keys and LM scores downstream.

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
    "wat_record",
    "wat_envelope_schema",
    "parse_wat_records",
    "to_warc_shards",
    "parse_warc_bytes",
    "from_warc_shards",
    "warc_shard_index",
    "read_warc_ranges",
    "read_warc",
    "sniff_charset",
    "encode_text",
    "decode_http_body",
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
    content_type: "str | Column" = "text/html",
    refers_to: "Column | None" = None,
) -> Column:
    """One WARC/1.0 record as a BINARY Column. ``payload`` must be
    binary (``F.encode`` strings first); ``date`` is the
    ``YYYY-MM-DDTHH:MM:SSZ`` string the spec requires. ``resource``
    records carry the payload verbatim; ``response`` records wrap it
    in a minimal ``HTTP/1.1 200 OK`` block (Content-Length set), the
    Common Crawl shape; ``conversion`` records (r13) carry the
    payload verbatim with an optional ``WARC-Refers-To`` header
    naming the source record — pass ``content_type='text/plain'``
    and the extracted text as payload and the file IS a Common Crawl
    WET file (WET is WARC with conversion records; shard with
    :func:`to_warc_shards`, parse with :func:`from_warc_shards` —
    ``refers_to`` comes back as a column). ``content_type`` may be a
    per-row Column (r10 — e.g. ``text/html; charset=shift_jis``).
    The record id is ``urn:uuid`` over md5(uri, '|', date) —
    deterministic by construction."""
    if warc_type not in ("resource", "response", "conversion", "metadata"):
        raise ValueError(
            "warc_type must be 'resource', 'response', 'conversion', "
            f"or 'metadata', got {warc_type!r}"
        )
    if refers_to is not None and warc_type not in (
        "conversion", "metadata",
    ):
        raise ValueError(
            "refers_to is only meaningful on conversion/metadata "
            "records"
        )
    ct = (
        F.lit(content_type)
        if isinstance(content_type, str)
        else content_type
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
            _enc("HTTP/1.1 200 OK" + _CRLF + "Content-Type: "),
            _enc(ct),
            _enc(_CRLF + "Content-Length: "),
            _enc(F.length(payload).cast("string")),
            _enc(_CRLF + _CRLF),
            payload,
        )
        block_ct = F.lit("application/http; msgtype=response")
    else:
        block = payload
        block_ct = ct
    refers = (
        F.concat(
            _enc("WARC-Refers-To: "), _enc(refers_to), _enc(_CRLF)
        )
        if refers_to is not None
        else _enc("")
    )
    header = F.concat(
        _enc("WARC/1.0" + _CRLF + f"WARC-Type: {warc_type}" + _CRLF),
        _enc("WARC-Target-URI: "), _enc(uri), _enc(_CRLF),
        _enc("WARC-Date: "), _enc(date), _enc(_CRLF),
        _enc("WARC-Record-ID: "), _enc(rid), _enc(_CRLF),
        refers,
        _enc("Content-Type: "), _enc(block_ct), _enc(_CRLF),
        _enc("Content-Length: "),
        _enc(F.length(block).cast("string")),
        _enc(_CRLF + _CRLF),
    )
    return F.concat(header, block, _enc(_CRLF + _CRLF))


def wat_record(
    uri: Column,
    date: Column,
    html: Column,
    refers_to: "Column | None" = None,
) -> Column:
    """One WAT metadata record as a BINARY Column — the third Common
    Crawl format next to WARC (:func:`warc_record` ``response``) and
    WET (``conversion``): a WARC ``metadata`` record whose payload is
    the JSON "envelope" describing a crawled page — target URI/date,
    ``<title>``, and the outlink table — so link-graph pipelines read
    WAT instead of re-parsing response HTML (the public WAT layout,
    commoncrawl.org/the-data/get-started; field names follow its
    ``Envelope``/``Payload-Metadata``/``HTML-Metadata`` nesting, the
    link rows its ``{path, url, text}`` shape with ``path =
    'A@/href'``).

    Extraction is the html module's row-local Column algebra
    (:func:`~pandas_weights_spark.functions.html.extract_title`,
    :func:`~pandas_weights_spark.functions.html.extract_anchors` —
    entity-decoded, whitespace-collapsed, document order), the JSON
    is ``to_json`` over a fixed struct (deterministic field and
    array order — the reason the DuckDB oracle can replay the
    envelope byte-for-byte), and the WARC framing is
    :func:`warc_record` with ``content_type='application/json'`` and
    ``WARC-Refers-To`` naming the source response record. Shard with
    :func:`to_warc_shards`, parse back with :func:`from_warc_shards`
    → :func:`parse_wat_records`. Zero shuffle, scan-pipelined.
    """
    from pandas_weights_spark.functions.html import (
        extract_anchors,
        extract_title,
    )

    links = F.transform(
        extract_anchors(html),
        lambda a: F.struct(
            F.lit("A@/href").alias("path"),
            a["href"].alias("url"),
            a["anchor"].alias("text"),
        ),
    )
    envelope = F.struct(
        F.struct(
            F.struct(
                uri.alias("WARC-Target-URI"),
                date.alias("WARC-Date"),
                F.lit("response").alias("WARC-Type"),
            ).alias("WARC-Header-Metadata"),
            F.struct(
                F.struct(
                    F.struct(
                        F.struct(
                            extract_title(html).alias("Title")
                        ).alias("Head"),
                        links.alias("Links"),
                    ).alias("HTML-Metadata")
                ).alias("HTTP-Response-Metadata")
            ).alias("Payload-Metadata"),
        ).alias("Envelope")
    )
    return warc_record(
        uri,
        date,
        F.encode(F.to_json(envelope), "UTF-8"),
        "metadata",
        "application/json",
        refers_to=refers_to,
    )


def wat_envelope_schema() -> T.StructType:
    """Schema of the WAT envelope JSON :func:`wat_record` writes —
    feed to ``from_json`` over a metadata record's decoded block
    (:func:`parse_wat_records` does exactly that)."""
    links_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("path", T.StringType()),
                T.StructField("url", T.StringType()),
                T.StructField("text", T.StringType()),
            ]
        )
    )
    return T.StructType(
        [
            T.StructField(
                "Envelope",
                T.StructType(
                    [
                        T.StructField(
                            "WARC-Header-Metadata",
                            T.StructType(
                                [
                                    T.StructField(
                                        "WARC-Target-URI", T.StringType()
                                    ),
                                    T.StructField(
                                        "WARC-Date", T.StringType()
                                    ),
                                    T.StructField(
                                        "WARC-Type", T.StringType()
                                    ),
                                ]
                            ),
                        ),
                        T.StructField(
                            "Payload-Metadata",
                            T.StructType(
                                [
                                    T.StructField(
                                        "HTTP-Response-Metadata",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "HTML-Metadata",
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "Head",
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "Title",
                                                                            T.StringType(),
                                                                        )
                                                                    ]
                                                                ),
                                                            ),
                                                            T.StructField(
                                                                "Links",
                                                                links_t,
                                                            ),
                                                        ]
                                                    ),
                                                )
                                            ]
                                        ),
                                    )
                                ]
                            ),
                        ),
                    ]
                ),
            )
        ]
    )


def parse_wat_records(records: DataFrame) -> DataFrame:
    """Decode the WAT envelopes out of a :func:`from_warc_shards`
    record table: keeps ``metadata`` records and returns ``(shard,
    rec_idx, target_uri, date, record_id, refers_to, env_uri, title,
    links)`` with ``links`` the ``array<struct<path, url, text>>``
    outlink table — ready to explode into
    :func:`~pandas_weights_spark.functions.html.link_graph`-shaped
    edges without touching response HTML. Column-level ``from_json``
    — no Python beyond the container walk that produced ``records``.
    """
    env = F.from_json(
        F.decode(F.col("block"), "UTF-8"), wat_envelope_schema()
    )["Envelope"]
    html_md = env["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"
    ]
    return records.where(F.col("warc_type") == "metadata").select(
        "shard",
        "rec_idx",
        "target_uri",
        "date",
        "record_id",
        "refers_to",
        env["WARC-Header-Metadata"]["WARC-Target-URI"].alias("env_uri"),
        html_md["Head"]["Title"].alias("title"),
        html_md["Links"].alias("links"),
    )


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
            "refers_to": headers.get("warc-refers-to", ""),
            "block": block,
        }
        if rec["warc_type"] == "response":
            split = block.find(b"\r\n\r\n")
            rec["http_body"] = (
                block[split + 4 :] if split >= 0 else block
            )
            # r10: keep the HTTP header block (latin-1 is byte-
            # transparent) — decode_http_body reads charset= from it
            rec["http_headers"] = (
                block[:split].decode("latin-1") if split >= 0 else ""
            )
        else:
            rec["http_body"] = None
            rec["http_headers"] = None
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
        T.StructField("refers_to", T.StringType()),
        T.StructField("block", T.BinaryType()),
        T.StructField("http_body", T.BinaryType()),
        T.StructField("http_headers", T.StringType()),
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
                            "refers_to": rec["refers_to"],
                            "block": rec["block"],
                            "http_body": rec["http_body"],
                            "http_headers": rec["http_headers"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RECORD_SCHEMA.fields]
            )

    return df.select(shard_col, warc_col).mapInPandas(
        emit, _RECORD_SCHEMA
    )


def _record_spans(data: bytes) -> "list[tuple[int, int, dict]]":
    """Byte spans of each record in one STORED shard — ``(offset,
    length, parsed record)`` where the span slices the shard bytes
    AS WRITTEN (a whole gzip member in the member-gzip framing, the
    raw record otherwise), so ``data[offset:offset+length]`` is
    independently parseable. The random-access contract the CDX
    index points through.

    The raw framing walks records by Content-Length exactly as
    :func:`parse_warc_bytes` does (r15, ADVICE r14): the previous
    magic-scan found ``WARC/1.0\\r\\n`` INSIDE record blocks too (a
    realistic payload in crawled web text, or nested WARC), silently
    truncating spans and usually killing the whole job with
    ``ValueError('no WARC/1.0 record found')`` on the bogus start.
    Each span runs to the next record's header (or end of data), so
    the trailing CRLFCRLF separator stays inside the span and the
    slice reparses standalone."""
    spans = []
    if data[:2] == b"\x1f\x8b":
        pos = 0
        n = len(data)
        while pos < n:
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            payload = d.decompress(data[pos:])
            consumed = n - pos - len(d.unused_data)
            if consumed <= 0:
                break
            recs = parse_warc_bytes(payload)
            if recs:
                spans.append((pos, consumed, recs[0]))
            pos += consumed
        return spans
    starts = []
    pos = 0
    while True:
        s = data.find(b"WARC/1.0\r\n", pos)
        if s < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", s)
        if hdr_end < 0:
            break
        clen = None
        for line in data[s + 10 : hdr_end].split(b"\r\n"):
            k, sep, v = line.partition(b":")
            if sep and k.strip().lower() == b"content-length":
                try:
                    clen = int(v.strip())
                except ValueError:
                    clen = None
        if clen is None:
            # not a parseable record header (parse_warc_bytes skips
            # it the same way) — resume the scan after the header
            pos = hdr_end + 4
            continue
        # r16 (ADVICE r15): keep each span TIGHT around the record as
        # written — header + block + trailing CRLFCRLF — instead of
        # running to the next valid start. Otherwise the bytes of a
        # skipped (unparseable-header) record are absorbed into the
        # PREVIOUS record's span and cdx_fetch_plan's total_bytes /
        # ranges over-report on corrupt shards. Capped at the next
        # start / end of data so truncated or overlapping lengths
        # never produce overlapping spans. Well-formed shards are
        # byte-identical (records are back-to-back, so the tight end
        # IS the next start / end of data).
        starts.append((s, hdr_end + 4 + clen + 4))
        pos = hdr_end + 4 + clen  # skip the BLOCK: magic inside it
        #                           is payload, not a record start
    for i, (s, tight_end) in enumerate(starts):
        nxt = starts[i + 1][0] if i + 1 < len(starts) else len(data)
        end = min(tight_end, nxt, len(data))
        recs = parse_warc_bytes(data[s:end])
        if recs:
            spans.append((s, end - s, recs[0]))
    return spans


_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("content_type", T.StringType()),
    ]
)


def warc_shard_index(
    df: DataFrame, warc_col: str = "warc", shard_col: str = "shard"
) -> DataFrame:
    """BUILD the URL index of a WARC shard table — one row per record
    with its STORED byte span ``(offset, length)`` plus the header
    fields a CDX line carries: exactly what Common Crawl's cdx-index
    job computes over its crawl output. Compose with
    :func:`~pandas_weights_spark.functions.cdx.surt_key` +
    ``to_json``-style line building for CDXJ output, and feed
    selections back through :func:`read_warc_ranges` — the full
    index → filter → random-access-fetch loop without touching
    unselected records. ``mapInPandas``, per-record memory, no
    shuffle."""

    def emit(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for shard, blob in zip(pdf[shard_col], pdf[warc_col]):
                for i, (off, ln, rec) in enumerate(
                    _record_spans(bytes(blob))
                ):
                    rows.append(
                        {
                            "shard": int(shard),
                            "rec_idx": i,
                            "offset": off,
                            "length": ln,
                            "warc_type": rec["warc_type"],
                            "target_uri": rec["target_uri"],
                            "date": rec["date"],
                            "record_id": rec["record_id"],
                            "content_type": rec["content_type"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _INDEX_SCHEMA.fields]
            )

    return df.select(shard_col, warc_col).mapInPandas(
        emit, _INDEX_SCHEMA
    )


def read_warc_ranges(
    df: DataFrame,
    ranges_col: str,
    warc_col: str = "warc",
    shard_col: str = "shard",
) -> DataFrame:
    """Random-access record fetch: ``df`` carries whole shard bytes
    plus a bounded ``array<struct<offset, length>>`` column of spans
    to extract (the
    :func:`~pandas_weights_spark.functions.cdx.cdx_fetch_plan`
    ``ranges`` output joined back by shard/filename) — only the
    selected spans are parsed, the rest of the shard is skipped, the
    read path a CDX index exists for. Output schema matches
    :func:`from_warc_shards` (one row per fetched record; ``rec_idx``
    is the position in the RANGE LIST, offsets having been sorted
    forward by the plan). NULL/empty range lists fetch nothing.

    NOTE on I/O: this still materializes each shard row's bytes
    before slicing (the binaryFile/one-row-per-shard model of this
    module); the operator saves PARSE/decompress work per record,
    not shard I/O — on object storage a reader would push the byte
    ranges into the GET itself.
    """

    def emit(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for shard, blob, ranges in zip(
                pdf[shard_col], pdf[warc_col], pdf[ranges_col]
            ):
                if ranges is None:
                    continue
                data = bytes(blob)
                for i, r in enumerate(ranges):
                    off, ln = int(r["offset"]), int(r["length"])
                    sl = data[off : off + ln]
                    for rec in parse_warc_bytes(sl):
                        rows.append(
                            {
                                "shard": int(shard),
                                "rec_idx": i,
                                "warc_type": rec["warc_type"],
                                "target_uri": rec["target_uri"],
                                "date": rec["date"],
                                "record_id": rec["record_id"],
                                "content_type": rec["content_type"],
                                "refers_to": rec["refers_to"],
                                "block": rec["block"],
                                "http_body": rec["http_body"],
                                "http_headers": rec["http_headers"],
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RECORD_SCHEMA.fields]
            )

    return df.select(shard_col, warc_col, ranges_col).mapInPandas(
        emit, _RECORD_SCHEMA
    )


# --- charset-aware HTTP body decode (r10) --------------------------
#
# Detection order (the order every production HTML pipeline uses —
# WHATWG encoding sniffing, w3lib/trafilatura convention):
#   1. byte-order mark (UTF-8 / UTF-16 LE / UTF-16 BE);
#   2. ``charset=`` parameter of the HTTP ``Content-Type`` header;
#   3. ``<meta charset=…>`` / ``http-equiv Content-Type`` in the first
#      1024 body bytes (the WHATWG prescan window);
#   4. UTF-8 with replacement characters.
# Labels resolve through Python's codec registry with the WHATWG
# superset remaps (iso-8859-1 family and us-ascii are decoded as
# windows-1252, gb2312/gbk as gb18030 — real pages routinely declare
# the narrower label while using the superset's code points).

import codecs as _codecs_mod
import re as _re

#: WHATWG encoding-standard remaps: label -> codec actually used
_WHATWG_REMAP = {
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "us-ascii": "cp1252",
    "ascii": "cp1252",
    "gb2312": "gb18030",
    "gbk": "gb18030",
}

_CHARSET_PARAM_RE = _re.compile(
    r"""charset\s*=\s*["']?\s*([A-Za-z0-9._][A-Za-z0-9._:-]*)""",
    _re.IGNORECASE,
)

#: name="value" / name='value' / name=bare attribute pairs of one tag
#: (quoted values consume greedily, so a ``charset=`` INSIDE an
#: unrelated attribute value is never read as an attribute — r11,
#: WHATWG-prescan conformance)
_TAG_ATTR_RE = _re.compile(
    r"""([a-zA-Z][a-zA-Z0-9-]*)\s*=\s*(?:"([^"]*)"|'([^']*)'"""
    r"""|([^\s"'>]*))"""
)


def _resolve_charset(label: "str | None") -> "str | None":
    """Charset label -> canonical Python codec name (WHATWG remaps
    applied), or None when the label is missing/unknown."""
    if not label:
        return None
    lab = _WHATWG_REMAP.get(label.strip().lower(), label.strip().lower())
    try:
        return _codecs_mod.lookup(lab).name
    except LookupError:
        return None


def sniff_charset(
    body: "bytes | None", http_headers: "str | None"
) -> "tuple[str, str]":
    """Detect the charset of one HTTP body: returns ``(codec_name,
    source)`` where source is ``bom`` / ``header`` / ``meta`` /
    ``default``. Pure Python — the per-row kernel behind
    :func:`decode_http_body`, exposed for direct use and testing."""
    body = bytes(body) if body is not None else b""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8", "bom"
    if body[:2] == b"\xff\xfe":
        return "utf-16-le", "bom"
    if body[:2] == b"\xfe\xff":
        return "utf-16-be", "bom"
    if http_headers:
        m = _CHARSET_PARAM_RE.search(http_headers)
        cs = _resolve_charset(m.group(1)) if m else None
        if cs:
            return cs, "header"
    # WHATWG prescan: <meta charset=…> or http-equiv Content-Type
    # inside the first 1024 bytes (latin-1 is byte-transparent, and
    # the declarations themselves are ASCII in every ASCII-compatible
    # encoding this sniff can act on). r11 (ADVICE): only a real
    # ``charset`` ATTRIBUTE or the ``content`` param of an
    # http-equiv="Content-Type" meta counts — ``charset=`` inside an
    # unrelated attribute value is ignored, and commented-out markup
    # is skipped (an unclosed comment hides the rest of the window),
    # matching the spec's prescan.
    head = body[:1024].decode("latin-1", "replace")
    head = _re.sub(r"<!--.*?-->", " ", head, flags=_re.S)
    cut = head.find("<!--")
    if cut != -1:
        head = head[:cut]
    for tag in _re.finditer(r"<meta\b[^>]*>", head, _re.IGNORECASE):
        attrs = {
            m.group(1).lower(): (
                m.group(2)
                if m.group(2) is not None
                else m.group(3) if m.group(3) is not None
                else m.group(4) or ""
            )
            for m in _TAG_ATTR_RE.finditer(tag.group(0))
        }
        label = attrs.get("charset")
        if (
            label is None
            and attrs.get("http-equiv", "").strip().lower()
            == "content-type"
        ):
            m = _CHARSET_PARAM_RE.search(attrs.get("content", ""))
            label = m.group(1) if m else None
        cs = _resolve_charset(label)
        if cs:
            return cs, "meta"
    return "utf-8", "default"


def _decode_one(body, http_headers) -> "tuple[str, str, str]":
    cs, src = sniff_charset(body, http_headers)
    raw = bytes(body) if body is not None else b""
    if src == "bom":  # strip the mark itself
        raw = raw[3:] if cs == "utf-8" else raw[2:]
    return cs, src, raw.decode(cs, "replace")


def decode_http_body(
    body: Column, http_headers: Column
) -> Column:
    """Charset-aware transcode of an HTTP response body: a STRUCT
    Column ``(charset, charset_source, text)`` — the detected codec
    (canonical Python name, WHATWG remaps applied), where it was
    found (``bom``/``header``/``meta``/``default``), and the decoded
    text (undecodable bytes become U+FFFD, never an error). Arrow-
    batched pandas UDF — the per-row transcode has no Column-algebra
    analog (Spark's ``decode`` takes a constant charset), and this is
    the sanctioned Python surface for it. Replaces the blind
    ``F.decode(http_body, 'UTF-8')`` of r8/r9 pipelines, which turned
    the few percent of GBK/Shift-JIS/windows-125x pages in any real
    crawl into mojibake."""
    from pyspark.sql import functions as _F

    @_F.pandas_udf(
        "charset string, charset_source string, text string"
    )
    def _decode(b, h):
        import pandas as pd

        rows = [_decode_one(x, y) for x, y in zip(b, h)]
        return pd.DataFrame(
            rows, columns=["charset", "charset_source", "text"]
        )

    return _decode(body, http_headers)


def encode_text(text: Column, charset: "Column | str") -> Column:
    """Write-side complement of :func:`decode_http_body`: encode
    ``text`` to BINARY in a per-row ``charset`` (label resolved like
    the sniffer — WHATWG remaps + codec registry; unknown labels fall
    back to UTF-8; unencodable characters become ``?`` rather than an
    error). NULL text stays NULL, like Spark's own ``encode`` — a
    missing document is distinguishable from an empty one (r11,
    ADVICE). Arrow-batched pandas UDF — Spark's ``encode`` takes a
    constant charset only."""
    from pyspark.sql import functions as _F

    cs = F.lit(charset) if isinstance(charset, str) else charset

    @_F.pandas_udf("binary")
    def _encode(t, c):
        import pandas as pd

        out = []
        for txt, lab in zip(t, c):
            if not isinstance(txt, str):  # None / NaN null spelling
                out.append(None)
                continue
            codec = _resolve_charset(lab) or "utf-8"
            out.append(txt.encode(codec, "replace"))
        return pd.Series(out)

    return _encode(text, cs)


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
