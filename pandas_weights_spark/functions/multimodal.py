"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (SURVEY.md §2.6 north-star extension).

The Spark-side plumbing — schemas, Arrow batch shapes, partition-size
control — is real and tested, and so is the decode path: PNG / BMP /
WAV / baseline-JPEG payloads are decoded by the pure-stdlib+numpy
codecs in :mod:`pandas_weights_spark.functions._codecs` (zlib inflate
+ full PNG filter reconstruction, BMP pixel walk, RIFF PCM, and — r6 —
a real JPEG entropy decoder with Huffman + IDCT — baseline AND, r7,
progressive with spectral selection + successive approximation),
producing feature vectors from actual pixel/sample statistics with no
PIL anywhere; PIL remains only as an optional fallback for
arithmetic-coded / exotic files. MP4/MOV containers
(r6) parse real duration/track/dimension metadata via the ISO-BMFF box
walk; frame PIXEL decode genuinely needs ffmpeg and raises
``NotImplementedError`` until one is plugged into :data:`DECODERS`;
``deterministic_fake`` remains as the seeded, oracle-mirrorable test
path.

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
import math
import struct
from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandas_weights_spark.functions import _codecs

__all__ = [
    "MEDIA_SCHEMA",
    "media_struct",
    "deterministic_fake_features",
    "image_feature_vector",
    "audio_feature_vector",
    "decode_features",
    "probe_media",
    "pdf_extract_text",
    "frame_sample_plan",
    "resize_media",
    "perceptual_hash",
    "image_near_duplicates",
    "spectral_audio_features",
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


def image_feature_vector(img: "_codecs.ImageData", dim: int) -> list[float]:
    """Real-pixel image features: [log1p(w), log1p(h), channels,
    aspect, (mean, std)/255 per channel (≤3), luminance histogram
    filling the remaining slots]. Deterministic, codec-independent."""
    out = [
        math.log1p(img.width),
        math.log1p(img.height),
        float(img.channels),
        img.width / img.height if img.height else 0.0,
    ]
    for m, s in img.channel_stats()[:3]:
        out += [m / 255.0, s / 255.0]
    if len(out) < dim:
        out += img.luminance_histogram(bins=dim - len(out))
    return out[:dim]


def audio_feature_vector(audio: "_codecs.AudioData", dim: int) -> list[float]:
    """Real-sample audio features: [log1p(duration_ms), log1p(rate),
    channels, rms, peak, zero-crossing rate, |amplitude| histogram]."""
    out = [
        math.log1p(audio.duration_ms),
        math.log1p(audio.rate),
        float(audio.channels),
        audio.rms(),
        audio.peak(),
        audio.zero_crossing_rate(),
    ]
    if len(out) < dim:
        import numpy as np

        bins = dim - len(out)
        n = len(audio.samples)
        if n:
            a = np.minimum(np.abs(audio.samples), 1.0)
            b = np.minimum(bins - 1, (a * bins).astype(np.int64))
            counts = np.bincount(b, minlength=bins)
            out += [float(c) / n for c in counts]
        else:
            out += [0.0] * bins
    return out[:dim]


def _byte_histogram_features(
    payload: bytes, head: list[float], dim: int
) -> list[float]:
    """head + byte-value histogram over the raw payload (the honest
    fallback when only metadata is decodable, e.g. JPEG without PIL)."""
    out = list(head)
    if len(out) < dim:
        import numpy as np

        bins = dim - len(out)
        n = len(payload)
        if n:
            b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            counts = np.bincount(b * bins // 256, minlength=bins)
            out += [float(c) / n for c in counts]
        else:
            out += [0.0] * bins
    return out[:dim]


def _png_features(payload: bytes, dim: int) -> list[float]:
    return image_feature_vector(_codecs.decode_png(payload), dim)


def _bmp_features(payload: bytes, dim: int) -> list[float]:
    return image_feature_vector(_codecs.decode_bmp(payload), dim)


def _wav_features(payload: bytes, dim: int) -> list[float]:
    return audio_feature_vector(_codecs.decode_wav(payload), dim)


def _jpeg_features(payload: bytes, dim: int) -> list[float]:
    try:
        # r6/r7: baseline AND progressive JPEGs decode with the
        # pure-numpy codec (_codecs.decode_jpeg) — environment-
        # INDEPENDENT pixel features, no PIL needed
        return image_feature_vector(_codecs.decode_jpeg(payload), dim)
    except Exception:
        pass
    try:  # arithmetic-coded/exotic: PIL when present on the executor
        from PIL import Image  # type: ignore
        import io as _io

        with Image.open(_io.BytesIO(payload)) as im:
            im = im.convert("RGB")
            img = _codecs.ImageData(
                im.width, im.height, 3, im.tobytes()
            )
        return image_feature_vector(img, dim)
    except Exception:
        # not just ImportError: a valid SOF header with truncated or
        # corrupt entropy data raises from the decode — fall through
        # to the metadata + byte-histogram features either way, so the
        # output is environment-independent for broken payloads
        pass
    w, h, comps = _codecs.jpeg_dimensions(payload)
    head = [
        math.log1p(w),
        math.log1p(h),
        float(comps),
        w / h if h else 0.0,
    ]
    return _byte_histogram_features(payload, head, dim)


def _mp4_features(payload: bytes, dim: int) -> list[float]:
    """Container-metadata features for MP4/MOV (r6): real duration/
    track/dimension metadata from the ISO-BMFF box walk + the honest
    byte-histogram tail — frame PIXEL decode still needs a video
    stack (the documented boundary; plug one into DECODERS)."""
    m = _codecs.mp4_metadata(payload)
    head = [
        math.log1p(m["duration_ms"] or 0),
        float(m["n_tracks"]),
        float(m["width"] or 0),
        float(m["height"] or 0),
        1.0 if m["has_video"] else 0.0,
        1.0 if m["has_audio"] else 0.0,
    ]
    return _byte_histogram_features(payload, head, dim)


def _generic_image_features(payload: bytes, dim: int) -> list[float]:
    """Dispatch on magic bytes for untyped 'image/*' mimes; PIL when
    importable, else the stdlib codecs, else a clear error."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_features(payload, dim)
    if payload[:2] == b"BM":
        return _bmp_features(payload, dim)
    if payload[:2] == b"\xff\xd8":
        return _jpeg_features(payload, dim)
    try:
        from PIL import Image  # type: ignore
        import io as _io

        with Image.open(_io.BytesIO(payload)) as im:
            im = im.convert("RGB")
            return image_feature_vector(
                _codecs.ImageData(im.width, im.height, 3, im.tobytes()), dim
            )
    except ImportError:
        raise ValueError(
            "unrecognized image payload (not PNG/BMP/JPEG) and PIL is not "
            "available — plug a decoder into DECODERS"
        )


def _unavailable(lib: str) -> Callable:
    def _raise(payload: bytes, dim: int):
        raise NotImplementedError(
            f"media decoding requires {lib}, which is not available in this "
            "environment — plug a real decoder into DECODERS"
        )

    return _raise


#: mime prefix → decoder(payload, dim) -> list[float]; first matching
#: prefix wins (insertion order), so specific entries precede generic
#: families. 'fake/' is the seeded test/demo path.
DECODERS: dict[str, Callable] = {
    "fake/": lambda payload, dim: deterministic_fake_features(payload, dim),
    "image/png": _png_features,
    "image/bmp": _bmp_features,
    "image/x-ms-bmp": _bmp_features,
    "image/jpeg": _jpeg_features,
    "image/jpg": _jpeg_features,
    "image/": _generic_image_features,
    "audio/wav": _wav_features,
    "audio/x-wav": _wav_features,
    "audio/wave": _wav_features,
    "audio/": _unavailable("ffmpeg/torchaudio (non-WAV audio)"),
    "video/mp4": lambda payload, dim: _mp4_features(payload, dim),
    "video/quicktime": lambda payload, dim: _mp4_features(payload, dim),
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


#: probe_media output: parsed-from-payload metadata.
PROBE_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def probe_media(
    df: DataFrame,
    media_col: str,
    out_col: str = "probe",
    batch_size: int = 64,
) -> DataFrame:
    """Parse REAL metadata out of the payload bytes (magic-byte
    dispatch, pure-stdlib codecs): PNG/BMP → width/height/channels,
    WAV → rate/channels/duration, JPEG → SOF dimensions. Unrecognized
    payloads probe to NULL. Arrow-batched ``mapInPandas``, no shuffle —
    the step that FILLS the media struct's typed metadata columns when
    upstream only has raw blobs."""
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, PROBE_SCHEMA)]
    )

    def probe_one(payload: bytes):
        try:
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                img = _codecs.decode_png(payload)
                return ("png", img.width, img.height, img.channels, None, None)
            if payload[:2] == b"BM":
                img = _codecs.decode_bmp(payload)
                return ("bmp", img.width, img.height, img.channels, None, None)
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                a = _codecs.decode_wav(payload)
                return ("wav", None, None, a.channels, a.rate,
                        a.duration_ms)
            if payload[:2] == b"\xff\xd8":
                w, h, comps = _codecs.jpeg_dimensions(payload)
                return ("jpeg", w, h, comps, None, None)
            if payload[:5] == b"%PDF-":
                return ("pdf", None, None, None, None, None)
            if payload[4:8] == b"ftyp" or payload[4:8] == b"moov":
                m = _codecs.mp4_metadata(payload)
                return ("mp4", m["width"], m["height"], m["n_tracks"],
                        None, m["duration_ms"])
        except Exception:
            return None
        return None

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            probes = []
            for m in pdf[media_col]:
                if m is None or m.get("payload") is None:
                    probes.append(None)
                else:
                    probes.append(probe_one(bytes(m["payload"])))
            yield pd.DataFrame(
                {**{c: pdf[c] for c in pdf.columns}, out_col: probes}
            )

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
    method: str = "nearest",
) -> DataFrame:
    """Arrow-batched media resize: adds ``out_col`` as a media struct with
    the target dimensions. ``method`` picks the pixel kernel:
    ``"nearest"`` (default — the deterministic dHash-compatible path)
    or ``"bilinear"`` (r8 — half-pixel-center anti-aliased resample,
    the model-input preprocessing standard).

    PNG, BMP, and (r6) baseline-JPEG payloads take the REAL pixel
    path: pure stdlib+numpy decode → resample → PNG
    re-encode (output mime becomes ``image/png``). The ``fake/`` mime
    family keeps its deterministic truncate/cycle payload for
    oracle-friendly tests; other mimes (arithmetic JPEG without PIL,
    video) raise NotImplementedError.
    """
    if method not in ("nearest", "bilinear"):
        raise ValueError(
            f"method must be 'nearest' or 'bilinear', got {method!r}"
        )
    kernel = (
        _codecs.resize_nearest if method == "nearest"
        else _codecs.resize_bilinear
    )
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
                payload = bytes(m["payload"])
                if mime.startswith("fake/"):
                    r = dict(m)
                    r["payload"] = _fake_resize(payload)
                    r["width"] = width
                    r["height"] = height
                    out.append(r)
                elif (
                    payload[:8] == b"\x89PNG\r\n\x1a\n"
                    or payload[:2] == b"BM"
                    or payload[:2] == b"\xff\xd8"  # baseline JPEG (r6)
                ):
                    if payload[:8] == b"\x89PNG\r\n\x1a\n":
                        img = _codecs.decode_png(payload)
                    elif payload[:2] == b"BM":
                        img = _codecs.decode_bmp(payload)
                    else:
                        img = _codecs.decode_jpeg(payload)
                    resized = kernel(img, width, height)
                    r = dict(m)
                    r["payload"] = _codecs.encode_png(resized)
                    r["mime"] = "image/png"
                    r["width"] = width
                    r["height"] = height
                    out.append(r)
                else:
                    raise NotImplementedError(
                        "resize of non-PNG/BMP/baseline-JPEG media "
                        "requires PIL/ffmpeg — plug a codec into "
                        "resize_media"
                    )
            yield pd.DataFrame(
                {**{c: pdf[c] for c in pdf.columns}, out_col: out}
            )

    return df.mapInPandas(run, out_schema)


def _decode_image(payload: bytes, mime: str) -> "_codecs.ImageData":
    """Payload → decoded raster: stdlib/numpy codecs (PNG, BMP, and —
    r6/r7 — baseline AND progressive JPEG), PIL only for what they
    can't express (arithmetic-coded JPEG, exotic formats)."""
    if mime.startswith("image/png") or payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _codecs.decode_png(payload)
    if (
        mime.startswith("image/bmp")
        or mime.startswith("image/x-ms-bmp")
        or payload[:2] == b"BM"
    ):
        return _codecs.decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        try:
            return _codecs.decode_jpeg(payload)
        except ValueError:
            pass  # arithmetic-coded / corrupt → PIL below
    from PIL import Image  # type: ignore
    import io as _io

    with Image.open(_io.BytesIO(payload)) as im:
        im = im.convert("RGB")
        return _codecs.ImageData(im.width, im.height, 3, im.tobytes())


def perceptual_hash(
    df: DataFrame,
    media_col: str,
    out_col: str = "phash",
    hash_size: int = 8,
    batch_size: int = 64,
    on_error: str = "null",
) -> DataFrame:
    """dHash perceptual fingerprint column over a media struct column:
    input schema + ``out_col`` (a ``hash_size²``-char '0'/'1' string —
    the same bit-string form :func:`~pandas_weights_spark.functions.
    dedup.hamming_distance` and simhash use, so the whole Hamming
    toolchain applies).

    Arrow-batched ``mapInPandas`` — linear scan, no shuffle. PNG/BMP/
    JPEG (baseline and, r7, progressive) decode via the pure
    stdlib+numpy codecs — no PIL needed; only arithmetic-coded JPEG
    still wants PIL on executors (absent → per-row NULL under
    ``on_error="null"``, the default, since a fingerprint from
    undecodable pixels would be meaningless).
    """
    if on_error not in ("raise", "null"):
        raise ValueError(
            f"on_error must be 'raise' or 'null', got {on_error!r}"
        )
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.StringType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            hashes = []
            for m in pdf[media_col]:
                if m is None or m.get("payload") is None:
                    hashes.append(None)
                    continue
                mime = m.get("mime") or ""
                if not mime.startswith("image/"):
                    hashes.append(None)
                    continue
                try:
                    img = _decode_image(bytes(m["payload"]), mime)
                    hashes.append(_codecs.dhash_bits(img, hash_size))
                except Exception:
                    if on_error == "raise":
                        raise
                    hashes.append(None)
            yield pd.DataFrame(
                {**{c: pdf[c] for c in pdf.columns}, out_col: hashes}
            )

    return df.mapInPandas(run, out_schema)


def image_near_duplicates(
    df: DataFrame,
    media_col: str,
    id_col: str,
    max_distance: int = 7,
    bands: int = 8,
    hash_size: int = 8,
) -> DataFrame:
    """Image-level near-dup pairs WITHOUT embeddings: dHash each image,
    band the bit-string, bucket-join band collisions, verify by exact
    Hamming distance — ``(id_a, id_b, hamming)`` with
    ``hamming ≤ max_distance``.

    The banded join is the same no-all-pairs LSH shape as MinHash/
    SimHash dedup: two hashes within Hamming ``d`` share an identical
    band whenever ``d < bands`` (pigeonhole), so recall is EXACT for
    ``max_distance < bands`` (the defaults: 7 < 8) and the quadratic
    term is bounded by per-band bucket sizes. Undecodable images (NULL
    phash) drop out.
    """
    nbits = hash_size * hash_size
    if nbits % bands != 0:
        raise ValueError(f"bands={bands} must divide {nbits} bits")
    if max_distance >= bands:
        import warnings

        warnings.warn(
            f"max_distance={max_distance} >= bands={bands}: banded recall "
            "is no longer exhaustive (pairs may be missed)",
            stacklevel=2,
        )
    width = nbits // bands
    from pandas_weights_spark.functions.dedup import hamming_distance

    hashed = perceptual_hash(
        df.select(id_col, media_col), media_col, out_col="__ph__",
        hash_size=hash_size,
    ).where(F.col("__ph__").isNotNull()).select(id_col, "__ph__")
    band_arr = F.array(
        *[
            F.substring(F.col("__ph__"), b * width + 1, width)
            for b in range(bands)
        ]
    )
    banded = hashed.select(
        F.col(id_col),
        F.col("__ph__"),
        F.posexplode(band_arr).alias("band_idx", "band_bits"),
    )
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_bits") == F.col("r.band_bits"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.__ph__").alias("__pa__"),
            F.col("r.__ph__").alias("__pb__"),
        )
        .distinct()
    )
    return pairs.select(
        "id_a",
        "id_b",
        hamming_distance(
            F.col("__pa__"), F.col("__pb__"), bits=nbits
        ).alias("hamming"),
    ).where(F.col("hamming") <= max_distance)


SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("centroid_hz", T.DoubleType()),
        T.StructField("bandwidth_hz", T.DoubleType()),
        T.StructField("rolloff_hz", T.DoubleType()),
        T.StructField("flux", T.DoubleType()),
        T.StructField("flatness", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def spectral_audio_features(
    df: DataFrame,
    media_col: str,
    out_col: str = "spectral",
    n_fft: int = 256,
    hop: int = 128,
    batch_size: int = 64,
    on_error: str = "null",
) -> DataFrame:
    """Spectral descriptors for WAV payloads (r6): adds ``out_col`` as
    a struct of frame-averaged ``centroid_hz / bandwidth_hz /
    rolloff_hz / flux / flatness / n_frames``
    (:func:`~pandas_weights_spark.functions._codecs.spectral_features`
    — numpy rfft over Hann-windowed frames, deterministic). Non-WAV or
    undecodable payloads yield NULL under ``on_error="null"``.

    Arrow-batched ``mapInPandas`` — linear scan, no shuffle; FFT is a
    genuine no-SQL-analog kernel (the sanctioned Python surface),
    pinned by direct-numpy differentials in tests/test_codecs.py.
    """
    if on_error not in ("raise", "null"):
        raise ValueError(
            f"on_error must be 'raise' or 'null', got {on_error!r}"
        )
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, SPECTRAL_SCHEMA)]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for m in pdf[media_col]:
                if m is None or m.get("payload") is None:
                    rows.append(None)
                    continue
                payload = bytes(m["payload"])
                try:
                    if not (
                        payload[:4] == b"RIFF"
                        and payload[8:12] == b"WAVE"
                    ):
                        raise ValueError("not a WAV payload")
                    a = _codecs.decode_wav(payload)
                    s = _codecs.spectral_features(a, n_fft, hop)
                    rows.append((
                        s["centroid_hz"], s["bandwidth_hz"],
                        s["rolloff_hz"], s["flux"], s["flatness"],
                        s["n_frames"],
                    ))
                except Exception:
                    if on_error == "raise":
                        raise
                    rows.append(None)
            yield pd.DataFrame(
                {**{c: pdf[c] for c in pdf.columns}, out_col: rows}
            )

    return df.mapInPandas(run, out_schema)


def pdf_extract_text(
    df: DataFrame,
    payload_col: str,
    out_col: str = "pdf_text",
    batch_size: int = 64,
) -> DataFrame:
    """Text layer of PDF payloads (pure-stdlib ``_codecs.pdf_to_text``:
    FlateDecode streams + Tj/TJ/' text-showing operators, Td/TD/T*
    line moves → newlines, pages join with ``\\f``). NULL / non-PDF /
    corrupt payloads yield NULL (batch-safe — one bad document never
    kills a 100 TB scan). Arrow-batched ``mapInPandas``, no shuffle —
    the documents-modality sibling of :func:`decode_features`."""
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
    )
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.StringType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                if payload is None:
                    out.append(None)
                    continue
                try:
                    out.append(_codecs.pdf_to_text(bytes(payload)))
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {**{c: pdf[c] for c in pdf.columns}, out_col: out}
            )

    return df.mapInPandas(run, out_schema)
