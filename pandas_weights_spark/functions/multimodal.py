"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (SURVEY.md §2.6 north-star extension).

The Spark-side plumbing — schemas, Arrow batch shapes, partition-size
control — is real and tested; the *decoders* are stubbed behind
:data:`DECODERS` because media libraries (PIL/ffmpeg/torchaudio) are not
in this container. ``deterministic_fake`` produces a seeded feature
vector from the payload bytes so pipelines are testable end-to-end;
``unavailable`` raises ``NotImplementedError`` with the library name, as
a clearly-marked integration point.

Scale notes:
* Decode runs in ``mapInPandas`` (Arrow-batched, no shuffle). Batches of
  large blobs are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — set it low (e.g. 64) for multi-MB payloads.
* Feature vectors come back as ``array<float>`` and flow directly into
  :mod:`pandas_weights_spark.functions.similarity` (centroids, top-k,
  near-dup) without further conversion.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_struct",
    "deterministic_fake_features",
    "decode_features",
    "frame_sample_plan",
]

#: Canonical schema for a multimodal column: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def media_struct(
    payload: Column,
    mime: Column,
    width: Column = None,
    height: Column = None,
    duration_ms: Column = None,
) -> Column:
    """Assemble a media struct column from parts."""
    null_i = F.lit(None).cast("int")
    null_l = F.lit(None).cast("long")
    return F.struct(
        payload.alias("payload"),
        mime.alias("mime"),
        (width if width is not None else null_i).cast("int").alias("width"),
        (height if height is not None else null_i).cast("int").alias("height"),
        (duration_ms if duration_ms is not None else null_l)
        .cast("long")
        .alias("duration_ms"),
    )


def deterministic_fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Seeded fake feature extractor: sha256-expanded floats in [-1, 1].

    Stands in for a real encoder so the distributed pipeline (schema,
    batching, downstream similarity ops) is exercised with stable values.
    The expansion counter is appended as ASCII (``payload + b"0"``,
    ``b"1"``…) so the whole expansion is expressible in engines whose
    ``sha256`` is string-typed (the DuckDB oracle mirrors it digit-for-
    digit; each float is ``u/2³¹ − 1`` with ``u`` an exact 32-bit
    integer, so both engines produce bit-identical doubles).
    """
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + str(counter).encode("ascii")).digest()
        for i in range(0, 32, 4):
            (u,) = struct.unpack(">I", h[i : i + 4])
            out.append((u / 2**31) - 1.0)
            if len(out) == dim:
                break
        counter += 1
    return out


def _unavailable(lib: str) -> Callable:
    def _raise(payload: bytes, dim: int):
        raise NotImplementedError(
            f"media decoding requires {lib}, which is not available in this "
            "environment — plug a real decoder into DECODERS"
        )

    return _raise


#: mime prefix → decoder(payload, dim) -> list[float]. Real deployments
#: replace these entries; 'fake/' is the test/demo path.
DECODERS: dict[str, Callable] = {
    "fake/": lambda payload, dim: deterministic_fake_features(payload, dim),
    "image/": _unavailable("PIL/opencv"),
    "audio/": _unavailable("torchaudio/ffmpeg"),
    "video/": _unavailable("ffmpeg"),
}


def decode_features(
    df: DataFrame,
    media_col: str,
    dim: int = 8,
    out_col: str = "features",
    batch_size: int = 64,
    on_error: str = "raise",
) -> DataFrame:
    """Arrow-batched feature extraction over a media struct column.

    ``mapInPandas``: linear scan, no shuffle; output schema is the input
    schema plus ``out_col array<float>``.

    ``on_error="null"`` records decode failures as NULL features instead
    of failing the job — at pipeline scale one corrupt blob must not kill
    a million-row task; filter ``out_col IS NULL`` afterwards to audit.
    """
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            for m in pdf[media_col]:
                if m is None or m.get("payload") is None:
                    feats.append(None)
                    continue
                mime = m.get("mime") or ""
                decoder = next(
                    (fn for p, fn in DECODERS.items() if mime.startswith(p)), None
                )
                if decoder is None:
                    feats.append(None)
                    continue
                try:
                    feats.append(decoder(bytes(m["payload"]), dim))
                except Exception:
                    if on_error == "raise":
                        raise
                    feats.append(None)
            yield pd.DataFrame({**{c: pdf[c] for c in pdf.columns}, out_col: feats})

    return df.mapInPandas(run, out_schema)


def frame_sample_plan(
    df: DataFrame, media_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (payload decode stubbed — the row explosion, which is the Spark-side
    concern, is real). Uses ``duration_ms`` metadata; media without
    duration yields a single frame at t=0."""
    m = F.col(media_col)
    n_frames = F.greatest(
        F.lit(1),
        (F.coalesce(m["duration_ms"], F.lit(0)) / F.lit(every_ms)).cast("int"),
    )
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * F.lit(every_ms)
            )
        ),
    )


def resize_media(
    df: DataFrame,
    media_col: str,
    width: int,
    height: int,
    out_col: str = "resized",
    batch_size: int = 64,
) -> DataFrame:
    """Arrow-batched media resize: adds ``out_col`` as a media struct with
    the target dimensions.

    The Spark-side contract (mapInPandas linear scan, struct-in /
    struct-out schema, batch sizing) is real; the pixel work is behind
    DECODE-style dispatch — the ``fake/`` mime family produces a
    deterministic payload (truncated/cycled to width*height bytes) for
    tests, real image mimes raise NotImplementedError until a codec is
    plugged in (this container ships none).
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    media_field = next(f for f in df.schema.fields if f.name == media_col)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, media_field.dataType)]
    )

    def _fake_resize(payload: bytes) -> bytes:
        need = width * height
        if not payload:
            return b"\x00" * need
        reps = need // len(payload) + 1
        return (payload * reps)[:need]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for m in pdf[media_col]:
                if m is None or m.get("payload") is None:
                    out.append(None)
                    continue
                mime = m.get("mime") or ""
                if mime.startswith("fake/"):
                    r = dict(m)
                    r["payload"] = _fake_resize(bytes(m["payload"]))
                    r["width"] = width
                    r["height"] = height
                    out.append(r)
                else:
                    raise NotImplementedError(
                        "image resize requires PIL/opencv, not available in "
                        "this environment — plug a codec into resize_media"
                    )
            yield pd.DataFrame(
                {**{c: pdf[c] for c in pdf.columns}, out_col: out}
            )

    return df.mapInPandas(run, out_schema)
