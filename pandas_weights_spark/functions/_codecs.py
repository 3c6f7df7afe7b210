"""Pure-stdlib media codecs for the multimodal column pipeline.

This container ships no media libraries (PIL/opencv/ffmpeg), so the
image/audio paths are implemented directly against the public file
formats — real decoders, not stubs:

* PNG (RFC 2083): chunk walk, IHDR parse, zlib-inflated IDAT, full
  scanline filter reconstruction (None/Sub/Up/Average/Paeth) for 8-bit
  greyscale / RGB / greyscale+alpha / RGBA. Interlaced or non-8-bit
  images raise with a clear message.
* BMP (BITMAPINFOHEADER): uncompressed 24/32-bit bottom-up or top-down.
* WAV (RIFF PCM): header via the stdlib ``wave`` module, 8/16/32-bit
  integer PCM samples unpacked with ``struct``.
* JPEG: marker scan to the SOF frame header for dimensions/components
  (entropy-coded pixel decode is out of scope for a pure-Python path —
  callers get real metadata and byte-level features; plugging PIL into
  ``DECODERS`` upgrades it transparently).

Everything is deterministic and dependency-free for DECODE (stdlib
``struct``/``zlib``/``wave``); the per-pixel FEATURE math — channel
stats, luminance histogram, nearest-neighbor resize, PCM conversion —
runs on numpy (``frombuffer`` + reshape), which is 10-100× faster than
byte loops on megapixel payloads and is already a hard dependency of
the engine. Only the PNG scanline filters with a loop-carried
dependency along x (Sub/Average/Paeth) remain Python loops; None/Up
rows are vectorized.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

__all__ = [
    "ImageData",
    "AudioData",
    "decode_png",
    "encode_png",
    "decode_bmp",
    "decode_wav",
    "jpeg_dimensions",
    "decode_jpeg",
    "encode_jpeg",
    "mp4_metadata",
    "spectral_features",
    "resize_nearest",
    "dhash_bits",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channels (8-bit only; palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class ImageData:
    """Decoded raster: ``pixels`` is row-major interleaved 8-bit bytes,
    ``len(pixels) == width * height * channels``."""

    __slots__ = ("width", "height", "channels", "pixels")

    def __init__(self, width: int, height: int, channels: int, pixels: bytes):
        self.width = width
        self.height = height
        self.channels = channels
        self.pixels = pixels

    def _array(self) -> "np.ndarray":
        """(n_pixels, channels) uint8 view — zero-copy off the bytes."""
        return np.frombuffer(self.pixels, dtype=np.uint8).reshape(
            -1, self.channels
        )

    def channel_stats(self) -> list[tuple[float, float]]:
        """(mean, std) per channel over [0, 255] values (population std).

        Exact integer moments via a 256-bin bincount per channel — one
        pass over the bytes, no float accumulation error."""
        n = self.width * self.height
        if not n:
            return [(0.0, 0.0)] * self.channels
        a = self._array()
        vals = np.arange(256, dtype=np.int64)
        sq = vals * vals
        out = []
        for c in range(self.channels):
            cnt = np.bincount(a[:, c], minlength=256)
            s = int((cnt * vals).sum())
            ss = int((cnt * sq).sum())
            mean = s / n
            var = max(0.0, ss / n - mean * mean)
            out.append((mean, var**0.5))
        return out

    def luminance_histogram(self, bins: int = 8) -> list[float]:
        """Normalized histogram of per-pixel luminance (first 3 channels
        averaged; greyscale uses the single channel)."""
        n = self.width * self.height
        if not n:
            return [0.0] * bins
        ch = min(self.channels, 3)
        # luminance takes at most 256*ch distinct values — bincount the
        # integer channel SUM, then fold the tiny sum->bin table
        s = self._array()[:, :ch].sum(axis=1, dtype=np.int64)
        cnt = np.bincount(s, minlength=256 * ch)
        sum_vals = np.arange(len(cnt), dtype=np.float64)
        b = np.minimum(bins - 1, (sum_vals / ch * bins / 256.0).astype(np.int64))
        counts = np.bincount(b, weights=cnt, minlength=bins)
        return [float(c) / n for c in counts]


class AudioData:
    """Decoded PCM audio: ``samples`` is a float64 ndarray in [-1, 1]
    with channels interleaved-averaged (mono mix-down)."""

    __slots__ = ("rate", "channels", "samples")

    def __init__(self, rate: int, channels: int, samples):
        self.rate = rate
        self.channels = channels
        self.samples = np.asarray(samples, dtype=np.float64)

    @property
    def duration_ms(self) -> int:
        return int(len(self.samples) * 1000 / self.rate) if self.rate else 0

    def rms(self) -> float:
        n = len(self.samples)
        return float(np.sqrt((self.samples * self.samples).sum() / n)) if n else 0.0

    def peak(self) -> float:
        return float(np.abs(self.samples).max()) if len(self.samples) else 0.0

    def zero_crossing_rate(self) -> float:
        s = self.samples
        if len(s) < 2:
            return 0.0
        neg = s < 0
        crossings = int(np.count_nonzero(neg[:-1] != neg[1:]))
        return crossings / (len(s) - 1)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> ImageData:
    """Full PNG decode for 8-bit non-interlaced images (color types
    0/2/4/6): chunk walk -> IHDR -> concatenated IDAT zlib stream ->
    per-scanline filter reconstruction.

    Corrupt/foreign streams always fail as ``ValueError`` (struct and
    zlib errors re-raised — same one-exception-class contract as
    :func:`decode_jpeg`; fuzz-pinned in tests/test_codecs.py)."""
    try:
        return _decode_png_impl(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, zlib.error) as e:
        raise ValueError(
            f"corrupt PNG stream ({type(e).__name__} while parsing)"
        ) from e


def _decode_png_impl(payload: bytes) -> ImageData:
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = io.BytesIO()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat.write(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (8 only)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG color type {color_type} (palette unsupported)"
        )
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(idat.getvalue())
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: decompressed size mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = scan[:, 0]
    lines = scan[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        if f == 0:  # None — straight copy
            out[y] = lines[y]
        elif f == 2:  # Up — vectorized (uint8 addition wraps mod 256)
            out[y] = lines[y] + out[y - 1] if y > 0 else lines[y]
        elif f in (1, 3, 4):
            # loop-carried dependency along x: each byte needs the
            # reconstructed byte `channels` to its left — inherently
            # sequential, so run it over plain int lists (cheaper than
            # numpy scalar indexing)
            ln = lines[y].tolist()
            up_row = out[y - 1].tolist() if y > 0 else [0] * stride
            cur = [0] * stride
            if f == 1:  # Sub
                for x in range(stride):
                    left = cur[x - channels] if x >= channels else 0
                    cur[x] = (ln[x] + left) & 0xFF
            elif f == 3:  # Average
                for x in range(stride):
                    left = cur[x - channels] if x >= channels else 0
                    cur[x] = (ln[x] + (left + up_row[x]) // 2) & 0xFF
            else:  # Paeth
                for x in range(stride):
                    left = cur[x - channels] if x >= channels else 0
                    ul = up_row[x - channels] if x >= channels else 0
                    cur[x] = (ln[x] + _paeth(left, up_row[x], ul)) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return ImageData(width, height, channels, out.tobytes())


def encode_png(img: ImageData) -> bytes:
    """Minimal PNG writer (filter 0 scanlines, one IDAT) — the inverse
    of :func:`decode_png`, used by resize and tests."""
    color_type = {1: 0, 3: 2, 2: 4, 4: 6}[img.channels]
    stride = img.width * img.channels
    raw = bytearray()
    for y in range(img.height):
        raw.append(0)
        raw += img.pixels[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", img.width, img.height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> ImageData:
    """Uncompressed 24/32-bit BMP (BITMAPINFOHEADER); emits RGB bytes
    (BMP stores BGR, bottom-up unless height is negative)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (data_off,) = struct.unpack("<I", payload[10:14])
    # BITMAPINFOHEADER: biSize@14, biWidth@18, biHeight@22, biPlanes@26,
    # biBitCount@28, biCompression@30
    width, height = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp} (24/32 only)")
    top_down = height < 0
    h = abs(height)
    src_ch = bpp // 8
    row_bytes = ((width * src_ch + 3) // 4) * 4  # rows pad to 4 bytes
    data = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_bytes, offset=data_off
    ).reshape(h, row_bytes)
    # strip row padding / alpha, un-BGR, un-bottom-up — all as views
    px = data[:, : width * src_ch].reshape(h, width, src_ch)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    if not top_down:
        rgb = rgb[::-1]
    return ImageData(width, h, 3, np.ascontiguousarray(rgb).tobytes())


def decode_wav(payload: bytes) -> AudioData:
    """RIFF PCM WAV via the stdlib ``wave`` reader; 8-bit unsigned and
    16/32-bit signed samples normalized to [-1, 1], channels mixed to
    mono by averaging."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        rate = wf.getframerate()
        sampwidth = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if sampwidth == 1:  # unsigned 8-bit
        vals = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif sampwidth == 2:
        vals = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 4:
        vals = (
            np.frombuffer(frames, dtype="<i4").astype(np.float64)
            / 2147483648.0
        )
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if n_ch > 1:
        vals = vals[: len(vals) - len(vals) % n_ch].reshape(-1, n_ch).mean(
            axis=1
        )
    return AudioData(rate, n_ch, vals)


def jpeg_dimensions(payload: bytes) -> tuple[int, int, int]:
    """(width, height, components) from the first SOF0-SOF15 marker.

    Real metadata from the real bitstream; pixel decode needs an
    entropy decoder + IDCT and is delegated to PIL when present (see
    multimodal.DECODERS).
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _, h, w, comps = struct.unpack(
                ">BHHB", payload[pos + 4 : pos + 10]
            )
            return w, h, comps
        pos += 2 + seg_len
    raise ValueError("no SOF marker found in JPEG")


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81) — pure stdlib + numpy, r6. Closes the last
# documented codec boundary (r5 "What's missing" item 4: JPEG was
# metadata-only without PIL). Sequential baseline DCT only: 8-bit
# precision, Huffman entropy coding, grayscale or YCbCr with 4:4:4 /
# 4:2:2 / 4:2:0 sampling, restart intervals. Progressive (SOF2) and
# arithmetic coding raise with a clear message — PIL (when importable)
# still upgrades those transparently via multimodal.DECODERS.
# All constant tables below are from the public spec (Annex K).
# ---------------------------------------------------------------------------

#: zig-zag scan order (T.81 Figure 5): index i of the scan -> (row*8+col)
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: Annex K.1/K.2 example quantization tables (natural order)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

#: Annex K.3 example Huffman tables as (bits[1..16], huffval)
_DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_LUMA_VALS = tuple(range(12))
_DC_CHROMA_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
_DC_CHROMA_VALS = tuple(range(12))
_AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)
_AC_CHROMA_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
_AC_CHROMA_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: forward DCT = M @ X @ M.T,
    inverse = M.T @ C @ M (T.81 A.3.3 with the orthonormal scaling)."""
    k = np.arange(8)
    M = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
    M[0, :] *= 1.0 / np.sqrt(2.0)
    return M


_DCT_M = _dct_matrix()


def _build_huffman_decode(bits, vals) -> dict:
    """(code_length, code) -> symbol map per T.81 C.2 canonical order."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman_encode(bits, vals) -> dict:
    """symbol -> (code, length) — the encoder-side twin."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _gen_huffman(freq_in) -> "tuple[list[int], list[int]]":
    """Optimal length-limited Huffman table from symbol frequencies —
    T.81 Annex K.2 (the libjpeg-documented public algorithm): pairwise
    least-frequency merging with a reserved code point (so no real
    symbol gets the all-ones code), then the >16-bit length
    adjustment. Returns (BITS[1..16], HUFFVAL) for a DHT segment.
    Progressive scans NEED generated tables: the Annex K standard
    tables lack the EOBn (r<<4) symbols EOB-run coding emits."""
    freq = list(freq_in[:256]) + [0] * (256 - min(len(freq_in), 256))
    freq.append(1)  # reserved code point 256
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1 = -1
        v = None
        for i in range(257):
            if freq[i] > 0 and (v is None or freq[i] <= v):
                v = freq[i]
                c1 = i
        c2 = -1
        v = None
        for i in range(257):
            if i != c1 and freq[i] > 0 and (v is None or freq[i] <= v):
                v = freq[i]
                c2 = i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:  # length-limit to 16 bits (K.2 Figure K.3)
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved code point
    huffval = [
        j
        for size in range(1, 33)
        for j in range(256)
        if codesize[j] == size
    ]
    return bits[1:17], huffval


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers
    (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # EOI or another marker: pad with 1-bits (spec behavior)
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Consume the RSTn marker at the current byte position."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> ImageData:
    """JPEG decode to 8-bit pixels (grayscale → 1 channel, YCbCr → RGB
    3 channels). Pure stdlib + numpy: marker walk, canonical Huffman,
    dequantize + dezigzag, orthonormal 8×8 IDCT (two 8×8 matmuls per
    block), nearest-neighbor chroma upsample, JFIF YCbCr→RGB.

    Handles baseline sequential (SOF0/SOF1, one interleaved scan) AND
    progressive (SOF2, ITU T.81 Annex G — r7): spectral-selection
    bands, successive-approximation first + refinement scans for DC
    and AC (EOB-run decoding included), coefficients accumulated
    across scans and reconstructed once at EOI. Arithmetic-coded,
    hierarchical, 12-bit, and multi-scan BASELINE files still raise
    with a clear 'needs PIL' contract.

    EVERY failure on a corrupt/foreign stream is ``ValueError`` — a
    fuzz pass (r8, tests/test_codecs.py) pins that no byte corruption
    escapes as IndexError/KeyError/ZeroDivisionError/OverflowError, so
    per-row try/except in the decode UDFs stays one exception class
    wide and a bad image can never kill a 100 TB scan."""
    try:
        return _decode_jpeg_impl(payload)
    except ValueError:
        raise
    except (
        IndexError,
        KeyError,
        ZeroDivisionError,
        OverflowError,
        struct.error,
    ) as e:
        raise ValueError(
            f"corrupt JPEG stream ({type(e).__name__} while parsing)"
        ) from e


def _decode_jpeg_impl(payload: bytes) -> ImageData:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    quant: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    progressive = False
    coefs: "list[np.ndarray]" = []
    got_scan = False
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                for j in range(64):
                    tbl[_ZIGZAG[j]] = seg[i + 1 + j]
                quant[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = tuple(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = tuple(seg[i + 17 : i + 17 + nv])
                tbl = _build_huffman_decode(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
            progressive = marker == 0xC2
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mx = (w + 8 * hmax - 1) // (8 * hmax)
                my = (h + 8 * vmax - 1) // (8 * vmax)
                coefs = [
                    np.zeros(
                        (my * c["v"], mx * c["h"], 64), dtype=np.int32
                    )
                    for c in comps
                ]
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise ValueError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) "
                "JPEG supported — arithmetic/hierarchical needs PIL"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            # a scan header carries 1 + 2·Ns + 3 bytes (T.81 B.2.3) —
            # validate before indexing so a corrupt/short segment is a
            # clean ValueError, not an IndexError
            if len(seg) < 1 or len(seg) < 4 + 2 * seg[0]:
                raise ValueError("truncated SOS header in JPEG")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c : 3 + 2 * c]
                scomps.append((cs, tables >> 4, tables & 0xF))
            data_start = pos + 2 + seg_len
            if not progressive:
                if ns != len(frame["comps"]):
                    # a valid baseline file MAY carry several
                    # non-interleaved scans (ns < nc); the baseline
                    # path reads exactly one interleaved scan — fail
                    # with the same clear contract as the other
                    # unsupported variants instead of a KeyError
                    raise ValueError(
                        "multi-scan baseline JPEG unsupported — "
                        "needs PIL"
                    )
                sel = {cs: (td, ta) for cs, td, ta in scomps}
                return _decode_scan(
                    payload, data_start, frame, sel, quant,
                    huff_dc, huff_ac, restart_interval,
                )
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if not (0 <= ss <= se <= 63):
                # T.81 B.2.3: 0 ≤ Ss ≤ Se ≤ 63 — a corrupt band would
                # otherwise index coefficients outside the 64-slot block
                raise ValueError("bad spectral band (Ss/Se) in JPEG scan")
            pos = _progressive_scan(
                payload, data_start, frame, coefs, scomps,
                ss, se, ahal >> 4, ahal & 0xF,
                huff_dc, huff_ac, restart_interval,
            )
            got_scan = True
            continue
        pos += 2 + seg_len
    if progressive and got_scan:
        return _finish_progressive(frame, coefs, quant)
    raise ValueError("no SOS marker found in JPEG")


def _decode_scan(
    payload, start, frame, sel, quant, huff_dc, huff_ac, restart_interval
) -> ImageData:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    reader = _BitReader(payload, start)
    pred = [0] * len(comps)
    M, Mt = _DCT_M, _DCT_M.T
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.align_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            blk = _decode_block(
                                reader, huff_dc[dc_t], huff_ac[ac_t]
                            )
                        except _RestartMarker:
                            raise ValueError(
                                "unexpected restart marker (bad DRI?)"
                            )
                        pred[ci] += blk[0]
                        blk[0] = pred[ci]
                        coef = np.zeros(64, dtype=np.float64)
                        coef[list(_ZIGZAG)] = blk
                        pix = Mt @ (coef.reshape(8, 8) * q) @ M
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
    return _planes_to_image(planes, comps, w, h, hmax, vmax)


def _planes_to_image(planes, comps, w, h, hmax, vmax) -> ImageData:
    """Shared reconstruction tail: +128 level shift, nearest-neighbor
    chroma upsample, crop to frame, JFIF YCbCr→RGB."""
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return ImageData(w, h, 1, g.tobytes())
    if len(comps) != 3:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(x), 0, 255) for x in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return ImageData(w, h, 3, rgb.tobytes())


def _comp_block_grid(frame, c) -> "tuple[int, int]":
    """Non-interleaved (single-component) scan grid: the component's
    OWN sampled dimensions padded to whole blocks (T.81 A.2.2) — NOT
    the MCU-padded grid interleaved scans cover."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8  # (block rows, block cols)


def _progressive_scan(
    payload, start, frame, coefs, scomps, ss, se, ah, al,
    huff_dc, huff_ac, restart_interval,
) -> int:
    """Decode ONE progressive scan (T.81 G.1.2) into the per-component
    zigzag-order coefficient arrays; returns the byte position of the
    next marker. DC scans (Ss=0) may interleave several components
    over the frame MCU grid; AC scans are single-component over the
    component's own block grid, with EOB-run decoding. ``Ah == 0`` is
    a successive-approximation FIRST scan (values arrive shifted left
    by Al), ``Ah > 0`` a refinement scan (one more magnitude bit)."""
    comps = frame["comps"]
    byid = {c["id"]: i for i, c in enumerate(comps)}
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(payload, start)

    if ss == 0:  # --- DC scan ---
        if se != 0:
            raise ValueError("bad progressive DC scan (Se != 0)")
        idxs = [byid[cs] for cs, _td, _ta in scomps]
        tabs = []
        if ah == 0:
            for cs, td, _ta in scomps:
                if td not in huff_dc:
                    raise ValueError("missing DC Huffman table")
                tabs.append(huff_dc[td])
        pred = [0] * len(scomps)

        def dc_unit(si, blk):
            if ah == 0:
                t = _huff_decode(reader, tabs[si])
                diff = _extend(reader.receive(t), t) if t else 0
                pred[si] += diff
                blk[0] = pred[si] << al
            else:
                if reader.read_bit():
                    blk[0] |= 1 << al

        if len(scomps) > 1:  # interleaved over the frame MCU grid
            mcu_count = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and mcu_count and (
                        mcu_count % restart_interval == 0
                    ):
                        reader.align_restart()
                        pred = [0] * len(scomps)
                    mcu_count += 1
                    for si, ci in enumerate(idxs):
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_unit(
                                    si,
                                    coefs[ci][
                                        my * c["v"] + by,
                                        mx * c["h"] + bx,
                                    ],
                                )
        else:
            ci = idxs[0]
            bh, bw = _comp_block_grid(frame, comps[ci])
            cnt = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and cnt and (
                        cnt % restart_interval == 0
                    ):
                        reader.align_restart()
                        pred = [0] * len(scomps)
                    cnt += 1
                    dc_unit(0, coefs[ci][by, bx])
    else:  # --- AC scan: single component, band [Ss, Se] ---
        if len(scomps) != 1:
            raise ValueError(
                "progressive AC scan must be single-component"
            )
        cs, _td, ta = scomps[0]
        if ta not in huff_ac:
            raise ValueError("missing AC Huffman table")
        ac_tab = huff_ac[ta]
        ci = byid[cs]
        bh, bw = _comp_block_grid(frame, comps[ci])
        eobrun = 0
        p1, m1 = 1 << al, -(1 << al)

        def ac_first(blk):
            nonlocal eobrun
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                rs = _huff_decode(reader, ac_tab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past Se in progressive scan")
                blk[k] = _extend(reader.receive(s), s) << al
                k += 1

        def refine_one(blk, k):
            # correction bit for a history-nonzero coefficient
            if reader.read_bit():
                if (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1

        def ac_refine(blk):
            nonlocal eobrun
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(reader, ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        # r == 15: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError(
                                "bad magnitude in AC refinement scan"
                            )
                        newval = p1 if reader.read_bit() else m1
                    while k <= se:
                        if blk[k] != 0:
                            refine_one(blk, k)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if newval:
                        if k > se:
                            # mirror ac_first's guard: a zero-run that
                            # overshoots the band is a corrupt stream —
                            # fail cleanly instead of writing outside
                            # the scan's spectral band.
                            raise ValueError(
                                "AC run past Se in progressive scan"
                            )
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if blk[k] != 0:
                        refine_one(blk, k)
                    k += 1
                eobrun -= 1

        unit = ac_first if ah == 0 else ac_refine
        cnt = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and cnt and (
                    cnt % restart_interval == 0
                ):
                    reader.align_restart()
                    eobrun = 0
                cnt += 1
                unit(coefs[ci][by, bx])

    # advance to the next real marker (skip stuffing + RSTn)
    p = reader.pos
    n = len(payload)
    while p + 1 < n and not (
        payload[p] == 0xFF
        and payload[p + 1] != 0x00
        and not (0xD0 <= payload[p + 1] <= 0xD7)
    ):
        p += 1
    return p


def _finish_progressive(frame, coefs, quant) -> ImageData:
    """Reconstruct pixels from the accumulated progressive
    coefficients: dezigzag, dequantize, IDCT every block (vectorized
    einsum over all blocks of a component), then the shared tail."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    M, Mt = _DCT_M, _DCT_M.T
    zig = list(_ZIGZAG)
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in quant:
            raise ValueError("missing quantization table")
        blocks = coefs[ci]
        nb_y, nb_x = blocks.shape[0], blocks.shape[1]
        nat = np.zeros((nb_y * nb_x, 64), dtype=np.float64)
        nat[:, zig] = blocks.reshape(-1, 64)
        mats = nat.reshape(-1, 8, 8) * quant[c["tq"]][None, :, :]
        pix = np.einsum("ij,njk,kl->nil", Mt, mats, M)
        planes.append(
            pix.reshape(nb_y, nb_x, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nb_y * 8, nb_x * 8)
        )
    return _planes_to_image(planes, comps, w, h, hmax, vmax)


def _decode_block(reader, dc_table, ac_table) -> np.ndarray:
    blk = np.zeros(64, dtype=np.int64)
    t = _huff_decode(reader, dc_table)
    blk[0] = _extend(reader.receive(t), t) if t else 0
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(reader.receive(s), s)
        k += 1
    return blk


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _scale_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (tbl * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _encode_block(wr, blk, pred, dc_enc, ac_enc) -> int:
    """Huffman-encode one quantized zig-zag block; returns its DC."""
    diff = int(blk[0]) - pred
    mag = abs(diff)
    t = int(mag).bit_length()
    code, ln = dc_enc[t]
    wr.write(code, ln)
    if t:
        wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last = 63
    while last > 0 and blk[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            wr.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        wr.write(code, ln)
        wr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]
        wr.write(code, ln)
    return int(blk[0])


def encode_jpeg(
    img: ImageData,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """JPEG encoder (Annex K quant tables, IJG quality scaling) —
    exists so the decoder is testable WITHOUT PIL and so the
    multimodal pipeline can materialize thumbnails; 1-channel input
    writes grayscale, 3-channel writes YCbCr at ``subsample`` 444 or
    420. ``restart_interval`` > 0 emits DRI/RSTn every N MCUs.

    ``progressive=True`` (r7) writes an SOF2 file with the classic
    10-scan (6-scan grayscale) script: successive-approximation DC
    first + refinement, spectral-selection AC bands at two precision
    levels, AC refinement scans — with per-scan OPTIMAL Huffman
    tables (T.81 K.2; required, since the standard tables lack the
    EOBn symbols progressive EOB-run coding emits) and EOB-run
    aggregation. Round-trips through :func:`decode_jpeg`'s
    progressive path. Restart markers are not emitted in progressive
    mode."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if progressive and restart_interval:
        raise ValueError(
            "restart_interval is not supported with progressive=True"
        )
    ch = img.channels
    if ch not in (1, 3):
        raise ValueError("encode_jpeg needs 1- or 3-channel input")
    w, h = img.width, img.height
    px = np.frombuffer(img.pixels, dtype=np.uint8).reshape(h, w, ch)
    if ch == 1:
        planes = [px[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            # average 2x2 chroma (pad odd edges by edge replication)
            def down(p):
                ph = p[: h + (h % 2), :]
                if h % 2:
                    ph = np.vstack([p, p[-1:, :]])
                pw = ph
                if w % 2:
                    pw = np.hstack([ph, ph[:, -1:]])
                return (
                    pw[0::2, 0::2] + pw[1::2, 0::2]
                    + pw[0::2, 1::2] + pw[1::2, 1::2]
                ) / 4.0

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qids = [0, 1, 1]
    ql = _scale_quant(_QUANT_LUMA, quality)
    qc = _scale_quant(_QUANT_CHROMA, quality)
    qtabs = [ql, qc] if ch == 3 else [ql]
    qmats = [q.reshape(8, 8) for q in qtabs]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its MCU grid (edge replication)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcus_y * 8 * sv, mcus_x * 8 * sh
        pp = np.empty((ph, pw))
        src_h, src_w = p.shape
        pp[:src_h, :src_w] = p
        if src_h < ph:
            pp[src_h:, :src_w] = p[-1:, :]
        if src_w < pw:
            pp[:, src_w:] = pp[:, src_w - 1 : src_w]
        padded.append(pp - 128.0)
    if progressive:
        return _encode_progressive_bytes(
            w, h, padded, samp, qids, qtabs, qmats, mcus_x, mcus_y
        )
    M, Mt = _DCT_M, _DCT_M.T
    dc_l = _build_huffman_encode(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_huffman_encode(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_huffman_encode(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_huffman_encode(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    enc_tabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    for ti, q in enumerate(qtabs):
        zz = bytes(int(q[_ZIGZAG[j]]) for j in range(64))
        seg(0xDB, bytes([ti]) + zz)
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
    seg(0xC0, sof)
    for tc, th, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    )[: 2 * (2 if nc == 3 else 1)]:
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        td = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | td])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    wr = _BitWriter()
    pred = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                wr.flush()
                out.extend(wr.out)
                wr = _BitWriter()
                out.extend(b"\xff" + bytes([0xD0 + (rst % 8)]))
                rst += 1
                pred = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                sh, sv = samp[ci]
                qm = qmats[qids[ci]]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blkpix = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = M @ blkpix @ Mt
                        qz = np.round(coef / qm).astype(np.int64)
                        zz = qz.reshape(64)[list(_ZIGZAG)]
                        dc_e, ac_e = enc_tabs[ci]
                        pred[ci] = _encode_block(
                            wr, zz, pred[ci], dc_e, ac_e
                        )
    wr.flush()
    out.extend(wr.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


class _CountSink:
    """Pass-1 scan sink: symbol frequencies only (bits ignored)."""

    def __init__(self):
        self.freq = [0] * 256

    def sym(self, s):
        self.freq[s] += 1

    def bits(self, v, n):
        pass


class _WriteSink:
    """Pass-2 scan sink: Huffman symbols + raw bits to a _BitWriter."""

    def __init__(self, wr, enc):
        self.wr = wr
        self.enc = enc

    def sym(self, s):
        code, ln = self.enc[s]
        self.wr.write(code, ln)

    def bits(self, v, n):
        self.wr.write(v, n)


def _encode_progressive_bytes(
    w, h, padded, samp, qids, qtabs, qmats, mcus_x, mcus_y
) -> bytes:
    """Progressive (SOF2) encoding over precomputed quantized blocks:
    libjpeg's standard scan script, two passes per scan (count →
    optimal DHT → encode). Algorithms per T.81 G.1.2 (public spec)."""
    nc = len(padded)
    M, Mt = _DCT_M, _DCT_M.T
    zig = list(_ZIGZAG)
    blocks = []
    for ci in range(nc):
        p = padded[ci]
        nb_y, nb_x = p.shape[0] // 8, p.shape[1] // 8
        bl = (
            p.reshape(nb_y, 8, nb_x, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coef = np.einsum("ij,njk,kl->nil", M, bl, Mt)
        qz = np.round(coef / qmats[qids[ci]][None]).astype(np.int64)
        blocks.append(qz.reshape(-1, 64)[:, zig].reshape(nb_y, nb_x, 64))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def grid(ci):  # non-interleaved scan grid (component-padded)
        cw = (w * samp[ci][0] + hmax - 1) // hmax
        ch = (h * samp[ci][1] + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    if nc == 3:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    def run_scan(cs_list, ss, se, ah, al, sink):
        if ss == 0:  # DC scan
            pred = [0] * len(cs_list)

            def dc_unit(si, blk):
                if ah == 0:
                    sv = int(blk[0]) >> al  # arithmetic shift
                    diff = sv - pred[si]
                    pred[si] = sv
                    t = abs(diff).bit_length()
                    sink.sym(t)
                    if t:
                        sink.bits(
                            diff if diff >= 0 else diff + (1 << t) - 1, t
                        )
                else:
                    sink.bits((int(blk[0]) >> al) & 1, 1)

            if len(cs_list) > 1:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        for si, ci in enumerate(cs_list):
                            sh, sv_ = samp[ci]
                            for by in range(sv_):
                                for bx in range(sh):
                                    dc_unit(
                                        si,
                                        blocks[ci][
                                            my * sv_ + by, mx * sh + bx
                                        ],
                                    )
            else:
                ci = cs_list[0]
                bh, bw = grid(ci)
                for by in range(bh):
                    for bx in range(bw):
                        dc_unit(0, blocks[ci][by, bx])
            return

        # AC scan: single component, band [ss, se]
        ci = cs_list[0]
        bh, bw = grid(ci)
        state = {"eobrun": 0, "br": []}

        def flush_eob():
            if state["eobrun"] > 0:
                nb = state["eobrun"].bit_length() - 1
                sink.sym(nb << 4)
                if nb:
                    sink.bits(state["eobrun"] - (1 << nb), nb)
                state["eobrun"] = 0
                for b in state["br"]:
                    sink.bits(b, 1)
                state["br"] = []

        if ah == 0:  # first scan: point transform + EOB runs

            def unit(blk):
                r = 0
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    tv = abs(v) >> al
                    if v < 0:
                        tv = -tv
                    if tv == 0:
                        r += 1
                        continue
                    flush_eob()
                    while r > 15:
                        sink.sym(0xF0)
                        r -= 16
                    s = abs(tv).bit_length()
                    sink.sym((r << 4) | s)
                    sink.bits(
                        tv if tv >= 0 else tv + (1 << s) - 1, s
                    )
                    r = 0
                if r > 0:
                    state["eobrun"] += 1
                    if state["eobrun"] == 0x7FFF:
                        flush_eob()

        else:  # refinement scan (G.1.2.3 / libjpeg AC_refine shape)

            def unit(blk):
                absv = [
                    abs(int(blk[k])) >> al for k in range(ss, se + 1)
                ]
                eob = -1  # band index of last newly-significant coef
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = i
                r = 0
                br: list = []
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob:
                        flush_eob()
                        sink.sym(0xF0)
                        r -= 16
                        for b in br:
                            sink.bits(b, 1)
                        br = []
                    if t > 1:
                        # history-nonzero: buffer its correction bit
                        br.append(t & 1)
                        continue
                    flush_eob()
                    sink.sym((r << 4) | 1)
                    r = 0
                    sink.bits(1 if int(blk[ss + i]) >= 0 else 0, 1)
                    for b in br:
                        sink.bits(b, 1)
                    br = []
                if r > 0 or br:
                    state["eobrun"] += 1
                    state["br"].extend(br)
                    if (
                        state["eobrun"] == 0x7FFF
                        or len(state["br"]) > 900
                    ):
                        flush_eob()

        for by in range(bh):
            for bx in range(bw):
                unit(blocks[ci][by, bx])
        flush_eob()

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    for ti, q in enumerate(qtabs):
        zzq = bytes(int(q[_ZIGZAG[j]]) for j in range(64))
        seg(0xDB, bytes([ti]) + zzq)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes(
            [ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]]
        )
    seg(0xC2, sof)  # SOF2: progressive

    for cs_list, ss, se, ah, al in script:
        counter = _CountSink()
        run_scan(cs_list, ss, se, ah, al, counter)
        enc = {}
        if any(counter.freq):
            bits16, vals = _gen_huffman(counter.freq)
            tc = 0 if ss == 0 else 1
            seg(
                0xC4,
                bytes([(tc << 4) | 0]) + bytes(bits16) + bytes(vals),
            )
            enc = _build_huffman_encode(bits16, vals)
        sos = bytes([len(cs_list)])
        for ci in cs_list:
            sos += bytes([ci + 1, 0])  # both table ids 0
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        wr = _BitWriter()
        run_scan(cs_list, ss, se, ah, al, _WriteSink(wr, enc))
        wr.flush()
        out.extend(wr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def resize_nearest(img: ImageData, width: int, height: int) -> ImageData:
    """Nearest-neighbor resample — the Spark-side resize path's real
    pixel kernel (deterministic, codec-free); one fancy-index gather."""
    ch = img.channels
    src = np.frombuffer(img.pixels, dtype=np.uint8).reshape(
        img.height, img.width, ch
    )
    sy = np.minimum(
        img.height - 1, np.arange(height) * img.height // height
    )
    sx = np.minimum(img.width - 1, np.arange(width) * img.width // width)
    out = src[sy][:, sx]
    return ImageData(width, height, ch, np.ascontiguousarray(out).tobytes())


def dhash_bits(img: ImageData, hash_size: int = 8) -> str:
    """Difference hash (dHash) of a decoded raster as a bit-string of
    ``hash_size²`` '0'/'1' chars — the classic perceptual fingerprint
    (public algorithm; widely described, e.g. Krawetz's "Kind of Like
    That"): downscale luminance to ``(hash_size+1) × hash_size`` and
    emit 1 where each pixel is brighter than its left neighbor.
    Robust to re-encoding, scaling, and mild brightness shifts; near
    images differ in a few bits (Hamming distance).

    Deterministic: nearest-neighbor resample (resize_nearest) + exact
    integer luminance sums — no antialias filter variation across
    library versions.
    """
    g = resize_nearest(img, hash_size + 1, hash_size)
    ch = g.channels
    a = np.frombuffer(g.pixels, dtype=np.uint8).reshape(
        g.height, g.width, ch
    )
    lum = a[:, :, : min(ch, 3)].sum(axis=2, dtype=np.int64)
    bits = lum[:, 1:] > lum[:, :-1]
    return "".join("1" if b else "0" for b in bits.flatten())


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container metadata (r6) — pure struct box walk, no
# ffmpeg: the "video as opaque binary with typed metadata" contract
# gets REAL duration / track / dimension metadata out of the container
# (frame pixel decode still needs a real video stack — that boundary
# stays documented). Box grammar per ISO/IEC 14496-12 (public spec):
# [size u32][type 4cc][payload], size 1 → 64-bit largesize follows.
# ---------------------------------------------------------------------------

#: container boxes whose payload is a sequence of child boxes
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _mp4_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            return  # corrupt size: stop walking, keep what we have
        yield btype, pos + hdr, pos + size
        pos += size


def mp4_metadata(payload: bytes) -> dict:
    """Parse MP4/ISO-BMFF container metadata: ``{brand, duration_ms,
    n_tracks, width, height, has_video, has_audio}``. Width/height come
    from the first video track's ``tkhd`` (16.16 fixed point); duration
    from ``mvhd`` (version 0 and 1). Raises ``ValueError`` when the
    payload has no ``ftyp``/``moov`` structure."""
    n = len(payload)
    brand = None
    duration_ms = None
    n_tracks = 0
    width = height = None
    has_video = has_audio = False
    saw_moov = False

    def walk(start: int, end: int, in_trak: bool, ctx: dict):
        nonlocal brand, duration_ms, n_tracks, width, height
        nonlocal has_video, has_audio, saw_moov
        for btype, b0, b1 in _mp4_boxes(payload, start, end):
            body = payload[b0:b1]
            if btype == b"ftyp" and len(body) >= 4:
                brand = body[:4].decode("ascii", "replace")
            elif btype == b"moov":
                saw_moov = True
                walk(b0, b1, False, ctx)
            elif btype == b"mvhd" and len(body) >= 20:
                ver = body[0]
                # v1 needs 32 bytes for timescale@20 + duration@24..31;
                # a truncated v1 body falls through to the v0 read like
                # every other corrupt-box path (no struct.error)
                if ver == 1 and len(body) >= 32:
                    ts, dur = struct.unpack(">IQ", body[20:32])
                else:
                    ts, dur = struct.unpack(">II", body[12:20])
                if ts:
                    duration_ms = int(dur * 1000 // ts)
            elif btype == b"trak":
                n_tracks += 1
                tctx = {"w": None, "h": None}
                walk(b0, b1, True, tctx)
            elif btype == b"tkhd" and in_trak and len(body) >= 84:
                ver = body[0]
                # width/height are the LAST 8 bytes of the box: v0
                # body is 84 bytes, v1 is 96 (T.14496-12 8.3.2)
                off = 96 if ver == 1 else 84
                if len(body) >= off:
                    w16, h16 = struct.unpack(
                        ">II", body[off - 8 : off]
                    )
                    ctx["w"] = w16 >> 16
                    ctx["h"] = h16 >> 16
            elif btype == b"mdia":
                walk(b0, b1, in_trak, ctx)
            elif btype == b"hdlr" and in_trak and len(body) >= 12:
                handler = body[8:12]
                if handler == b"vide":
                    has_video = True
                    if ctx.get("w"):
                        width = width or ctx["w"]
                        height = height or ctx["h"]
                elif handler == b"soun":
                    has_audio = True
            elif btype in _MP4_CONTAINERS:
                walk(b0, b1, in_trak, ctx)

    walk(0, n, False, {})
    if brand is None and not saw_moov:
        raise ValueError("not an MP4/ISO-BMFF payload (no ftyp/moov)")
    return {
        "brand": brand,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "has_video": has_video,
        "has_audio": has_audio,
    }


def spectral_features(
    audio: "AudioData", n_fft: int = 256, hop: int = 128
) -> dict:
    """Frame-averaged spectral descriptors of decoded PCM — the real
    DSP layer over :func:`decode_wav` (numpy rfft; deterministic):
    ``centroid_hz`` (amplitude-weighted mean frequency), ``bandwidth_hz``
    (weighted std around the centroid), ``rolloff_hz`` (85 % energy
    point), ``flux`` (mean L2 frame-to-frame magnitude change,
    normalized), ``flatness`` (geometric/arithmetic mean ratio — 1 for
    white noise, →0 for pure tones). Multi-channel input averages to
    mono first. Short signals (< n_fft samples) zero-pad one frame.
    """
    if n_fft < 8 or hop < 1:
        raise ValueError("n_fft must be >= 8 and hop >= 1")
    # AudioData.samples is already a mono mix-down (class contract)
    x = np.asarray(audio.samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(n_fft)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / audio.rate)
    tot = mag.sum(axis=1)
    ok = tot > 0
    centroid = np.zeros(n_frames)
    bw = np.zeros(n_frames)
    roll = np.zeros(n_frames)
    if ok.any():
        centroid[ok] = (mag[ok] * freqs[None, :]).sum(axis=1) / tot[ok]
        bw[ok] = np.sqrt(
            (mag[ok] * (freqs[None, :] - centroid[ok, None]) ** 2).sum(
                axis=1
            )
            / tot[ok]
        )
        energy = mag[ok] ** 2
        cume = np.cumsum(energy, axis=1)
        target = 0.85 * cume[:, -1:]
        roll_idx = (cume >= target).argmax(axis=1)
        roll[ok] = freqs[roll_idx]
    if n_frames > 1:
        d = np.diff(mag, axis=0)
        denom = np.linalg.norm(mag[:-1], axis=1)
        denom = np.where(denom > 0, denom, 1.0)
        flux = float((np.linalg.norm(d, axis=1) / denom).mean())
    else:
        flux = 0.0
    eps = 1e-12
    p = mag**2 + eps
    flat = float(
        np.exp(np.log(p).mean(axis=1)).mean() / (p.mean(axis=1)).mean()
    )
    return {
        "centroid_hz": float(centroid[ok].mean()) if ok.any() else 0.0,
        "bandwidth_hz": float(bw[ok].mean()) if ok.any() else 0.0,
        "rolloff_hz": float(roll[ok].mean()) if ok.any() else 0.0,
        "flux": flux,
        "flatness": flat,
        "n_frames": int(n_frames),
    }


def resize_bilinear(img: ImageData, width: int, height: int) -> ImageData:
    """Bilinear resample with half-pixel sample centers (the
    OpenCV/PIL "align_corners=False" convention): source coordinate
    ``(i + 0.5) * src/dst − 0.5``, edge-clamped, float64 accumulate,
    round-half-away rounding — deterministic across platforms. The
    anti-aliased sibling of :func:`resize_nearest` for model-input
    preprocessing."""
    if width < 1 or height < 1:
        raise ValueError("target size must be >= 1")
    ch = img.channels
    src = np.frombuffer(img.pixels, dtype=np.uint8).reshape(
        img.height, img.width, ch
    ).astype(np.float64)

    def axis_coords(dst: int, n: int):
        c = (np.arange(dst) + 0.5) * (n / dst) - 0.5
        c = np.clip(c, 0.0, n - 1.0)
        lo = np.floor(c).astype(np.int64)
        hi = np.minimum(lo + 1, n - 1)
        return lo, hi, c - lo

    ylo, yhi, fy = axis_coords(height, img.height)
    xlo, xhi, fx = axis_coords(width, img.width)
    top = src[ylo][:, xlo] * (1 - fx)[None, :, None] + \
        src[ylo][:, xhi] * fx[None, :, None]
    bot = src[yhi][:, xlo] * (1 - fx)[None, :, None] + \
        src[yhi][:, xhi] * fx[None, :, None]
    out = top * (1 - fy)[:, None, None] + bot * fy[:, None, None]
    out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return ImageData(width, height, ch, np.ascontiguousarray(out).tobytes())


def center_crop(img: ImageData, width: int, height: int) -> ImageData:
    """Centered crop (the classifier-preprocessing standard). The
    target must fit inside the source — compose with a resize first
    for the usual shorter-side-resize + crop recipe."""
    if width > img.width or height > img.height:
        raise ValueError(
            f"crop {width}x{height} exceeds source "
            f"{img.width}x{img.height}"
        )
    ch = img.channels
    src = np.frombuffer(img.pixels, dtype=np.uint8).reshape(
        img.height, img.width, ch
    )
    y0 = (img.height - height) // 2
    x0 = (img.width - width) // 2
    out = src[y0 : y0 + height, x0 : x0 + width]
    return ImageData(width, height, ch, np.ascontiguousarray(out).tobytes())


def resample_linear(audio: "AudioData", new_rate: int) -> "AudioData":
    """Linear-interpolation resample to ``new_rate`` Hz (the cheap
    deterministic path; no windowed-sinc dependency). Output length is
    ``round(n * new_rate / rate)``; sample positions map with the same
    half-open convention both directions, so
    ``resample(resample(a, 2r), r)`` returns a same-length signal."""
    if new_rate < 1:
        raise ValueError("new_rate must be >= 1")
    s = audio.samples
    n = len(s)
    if n == 0 or new_rate == audio.rate:
        return AudioData(new_rate, audio.channels, s.copy())
    m = max(1, int(round(n * new_rate / audio.rate)))
    pos = np.arange(m) * (n / m)
    lo = np.minimum(np.floor(pos).astype(np.int64), n - 1)
    hi = np.minimum(lo + 1, n - 1)
    frac = pos - lo
    out = s[lo] * (1 - frac) + s[hi] * frac
    return AudioData(new_rate, audio.channels, out)


def trim_silence(
    audio: "AudioData", threshold: float = 0.01, pad_ms: int = 0
) -> "AudioData":
    """Strip leading/trailing samples whose |amplitude| is below
    ``threshold`` (absolute, samples are in [-1, 1]), keeping
    ``pad_ms`` of context on each side. All-silent input yields an
    empty signal (duration 0) rather than raising — the batch-safe
    contract for a corpus full of dead air."""
    s = audio.samples
    loud = np.flatnonzero(np.abs(s) >= threshold)
    if len(loud) == 0:
        return AudioData(audio.rate, audio.channels, s[:0])
    pad = int(audio.rate * pad_ms / 1000)
    a = max(0, int(loud[0]) - pad)
    b = min(len(s), int(loud[-1]) + 1 + pad)
    return AudioData(audio.rate, audio.channels, s[a:b].copy())


# --- PDF (text documents) --------------------------------------------
# Public spec: ISO 32000-1 / the Adobe PDF 1.4 reference. Pure stdlib:
# the only compression is FlateDecode (zlib). encode_pdf writes the
# minimal conforming single-font document (the fixture/round-trip
# counterpart, like encode_jpeg for the JPEG decoder); pdf_to_text
# walks content streams and replays the text-showing operators.


def _pdf_escape(line: str) -> bytes:
    out = bytearray()
    for ch in line:
        o = ord(ch)
        if o > 255:
            raise ValueError(
                "encode_pdf supports Latin-1 text only "
                f"(codepoint {o} cannot be a PDFDocEncoded literal)"
            )
        if ch in "\\()":
            out += b"\\" + ch.encode("latin-1")
        elif o < 32 or o > 126:
            out += ("\\%03o" % o).encode("ascii")
        else:
            out.append(o)
    return bytes(out)


def encode_pdf(pages: "list[str]", compress: bool = True) -> bytes:
    """Minimal valid PDF 1.4: one Helvetica text page per input
    string (lines split on ``\\n``, one ``Tj`` per line, ``0 -14 Td``
    line advance), FlateDecode-compressed content streams by default.
    Deterministic bytes for the same input."""
    if not pages:
        raise ValueError("encode_pdf needs at least one page")
    n_pages = len(pages)
    font_num = 3 + n_pages
    objs: "list[bytes]" = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    content_nums = []
    for i in range(n_pages):
        cnum = font_num + 1 + i
        content_nums.append(cnum)
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {cnum} 0 R >>"
            ).encode()
        )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    streams = []
    for text in pages:
        body = bytearray(b"BT /F1 11 Tf 50 750 Td\n")
        for j, line in enumerate(text.split("\n")):
            if j:
                body += b"0 -14 Td\n"
            body += b"(" + _pdf_escape(line) + b") Tj\n"
        body += b"ET"
        raw = bytes(body)
        if compress:
            comp = zlib.compress(raw, 6)
            streams.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(comp) + comp + b"\nendstream"
            )
        else:
            streams.append(
                b"<< /Length %d >>\nstream\n" % len(raw)
                + raw + b"\nendstream"
            )
    objs.extend(streams)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def encode_pdf_objstm(pages: "list[str]") -> bytes:
    """PDF 1.5 fixture writer (r11): the catalog, /Pages node, page
    dictionaries, and font dictionary are packed into a FlateDecode'd
    ``/Type /ObjStm`` object stream, and the file carries a REAL
    cross-reference STREAM (``/Type /XRef``, ``/W [1 4 2]``, type-2
    entries pointing into the ObjStm) instead of a classic table —
    the layout most post-2005 writers emit, which the r10 reader
    silently extracted nothing from. Content streams stay regular
    objects (the spec forbids streams inside an ObjStm).
    Deterministic bytes for the same input."""
    if not pages:
        raise ValueError("encode_pdf_objstm needs at least one page")
    n = len(pages)
    font_num = 3 + n
    first_content = font_num + 1  # content streams: regular objects
    objstm_num = first_content + n
    xref_num = objstm_num + 1

    # --- packed objects (dictionaries only) ---
    packed: "list[tuple[int, bytes]]" = []
    packed.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    kids = " ".join(f"{3 + i} 0 R" for i in range(n))
    packed.append(
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    )
    for i in range(n):
        packed.append(
            (
                3 + i,
                (
                    f"<< /Type /Page /Parent 2 0 R "
                    f"/MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                    f"/Contents {first_content + i} 0 R >>"
                ).encode(),
            )
        )
    packed.append(
        (
            font_num,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        )
    )
    bodies = b" ".join(b for _, b in packed)
    offs = []
    at = 0
    for _, b in packed:
        offs.append(at)
        at += len(b) + 1  # the single joining space
    pair_hdr = (
        " ".join(f"{num} {off}" for (num, _), off in zip(packed, offs))
        + "\n"
    ).encode()
    stm_plain = pair_hdr + bodies
    stm_comp = zlib.compress(stm_plain, 6)
    objstm_obj = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n"
        % (len(packed), len(pair_hdr), len(stm_comp))
        + stm_comp
        + b"\nendstream"
    )

    # --- regular objects: content streams, then the ObjStm ---
    out = bytearray(b"%PDF-1.5\n")
    offsets: "dict[int, int]" = {}
    for i, text in enumerate(pages):
        body = bytearray(b"BT /F1 11 Tf 50 750 Td\n")
        for j, line in enumerate(text.split("\n")):
            if j:
                body += b"0 -14 Td\n"
            body += b"(" + _pdf_escape(line) + b") Tj\n"
        body += b"ET"
        comp = zlib.compress(bytes(body), 6)
        num = first_content + i
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        out += (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
            % len(comp)
            + comp
            + b"\nendstream\nendobj\n"
        )
    offsets[objstm_num] = len(out)
    out += b"%d 0 obj\n" % objstm_num + objstm_obj + b"\nendobj\n"

    # --- cross-reference STREAM: W [1 4 2], uncompressed rows ---
    size = xref_num + 1
    rows = bytearray()

    def row(t: int, f2: int, f3: int) -> bytes:
        return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

    xref_at = len(out)
    for num in range(size):
        if num == 0:
            rows += row(0, 0, 65535)
        elif num in offsets:
            rows += row(1, offsets[num], 0)
        elif num == xref_num:
            rows += row(1, xref_at, 0)
        else:  # packed into the ObjStm
            idx = next(
                i for i, (pn, _) in enumerate(packed) if pn == num
            )
            rows += row(2, objstm_num, idx)
    out += b"%d 0 obj\n" % xref_num
    out += (
        b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
        b"/Length %d >>\nstream\n" % (size, len(rows))
        + rows
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def encode_pdf_subset(
    pages: "list[str]", compress: bool = True
) -> bytes:
    """Subset-font fixture writer (r10, the round-trip counterpart of
    the ToUnicode reader): text is shown as HEX strings of 1-byte
    codes assigned in first-appearance order, and a ``/ToUnicode``
    CMap (``beginbfchar`` entries) maps the codes back — the shape
    every real-world subset-embedded font uses, where the byte codes
    are MEANINGLESS without the CMap (a latin-1 replay would be pure
    mojibake). Any unicode text works, up to 255 distinct characters
    per document (1-byte code space)."""
    if not pages:
        raise ValueError("encode_pdf_subset needs at least one page")
    charset: "dict[str, int]" = {}
    for text in pages:
        for ch in text:
            if ch != "\n" and ch not in charset:
                charset[ch] = len(charset) + 1
    if len(charset) > 255:
        raise ValueError(
            "encode_pdf_subset supports <= 255 distinct characters "
            f"(1-byte code space), got {len(charset)}"
        )
    n_pages = len(pages)
    font_num = 3 + n_pages
    tounicode_num = font_num + 1
    objs: "list[bytes]" = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i in range(n_pages):
        cnum = tounicode_num + 1 + i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {cnum} 0 R >>"
            ).encode()
        )
    objs.append(
        (
            f"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+Subset "
            f"/ToUnicode {tounicode_num} 0 R >>"
        ).encode()
    )
    bfchars = "\n".join(
        "<%02X> <%s>"
        % (
            code,
            ch.encode("utf-16-be").hex().upper(),
        )
        for ch, code in sorted(charset.items(), key=lambda kv: kv[1])
    )
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        f"{len(charset)} beginbfchar\n{bfchars}\nendbfchar\n"
        "endcmap\nCMapName currentdict /CMap defineresource pop\n"
        "end\nend\n"
    ).encode("ascii")
    objs.append(
        b"<< /Length %d >>\nstream\n" % len(cmap)
        + cmap + b"\nendstream"
    )
    for text in pages:
        body = bytearray(b"BT /F1 11 Tf 50 750 Td\n")
        for j, line in enumerate(text.split("\n")):
            if j:
                body += b"0 -14 Td\n"
            hx = "".join("%02X" % charset[ch] for ch in line)
            body += b"<" + hx.encode("ascii") + b"> Tj\n"
        body += b"ET"
        raw = bytes(body)
        if compress:
            comp = zlib.compress(raw, 6)
            objs.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(comp) + comp + b"\nendstream"
            )
        else:
            objs.append(
                b"<< /Length %d >>\nstream\n" % len(raw)
                + raw + b"\nendstream"
            )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def _pdf_string(data: bytes, i: int) -> "tuple[bytes, int]":
    """Parse a PDF literal string starting at the '(' — returns
    (raw string BYTES, index past the ')').  Decoding to text happens
    at the call site (latin-1, or the font's ToUnicode CMap — r10)."""
    assert data[i : i + 1] == b"("
    i += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0x5C:  # backslash
            nxt = data[i + 1 : i + 2]
            if nxt.isdigit():
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and data[j : j + 1].isdigit():
                    oct_digits += data[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            mapping = {
                b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
                b"(": 40, b")": 41, b"\\": 92,
            }
            if nxt in mapping:
                out.append(mapping[nxt])
                i += 2
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
                continue
            i += 1  # lone backslash: drop (spec: ignore)
            continue
        if b == 0x28:  # (
            depth += 1
        elif b == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out.append(b)
        i += 1
    raise ValueError("unterminated PDF string literal")


def _pdf_hex_string(data: bytes, i: int) -> "tuple[bytes, int]":
    """Parse a PDF hex string starting at the '<' (NOT '<<') —
    returns (raw bytes, index past the '>'); whitespace inside is
    legal, an odd final digit pads with 0 (ISO 32000 §7.3.4.3)."""
    j = data.find(b">", i + 1)
    if j < 0:
        raise ValueError("unterminated PDF hex string")
    hx = b"".join(data[i + 1 : j].split())
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")), j + 1
    except (ValueError, UnicodeDecodeError):
        return b"", j + 1  # malformed hex: empty string, keep walking


def _apply_cmap(bts: bytes, cmap) -> str:
    """Decode shown-string bytes through a ToUnicode CMap ``(table,
    max_code_len)`` — greedy longest-code match; an unmapped code
    emits U+FFFD (the LOUD mojibake boundary — a subset font without
    a mapping is unrecoverable without OCR). ``cmap=None`` falls back
    to latin-1, the pre-r10 behavior for unmapped simple fonts."""
    if cmap is None:
        return bts.decode("latin-1")
    table, clen = cmap
    out = []
    i, n = 0, len(bts)
    while i < n:
        for length in range(min(clen, n - i), 0, -1):
            hit = table.get(bts[i : i + length])
            if hit is not None:
                out.append(hit)
                i += length
                break
        else:
            out.append("�")
            i += 1
    return "".join(out)


def _parse_tounicode(cmap_stream: bytes):
    """Parse a ToUnicode CMap stream (ISO 32000 §9.10.3): returns
    ``(code->text table, max code byte-length)`` from the
    ``beginbfchar``/``beginbfrange`` sections, or None when nothing
    parses. Destination hex is UTF-16BE code units; bfrange
    increments apply to the LAST code unit (the spec's convention);
    ranges are capped at 65536 entries as a corrupt-input guard."""
    import re as _re

    table: "dict[bytes, str]" = {}
    clen = 1

    def _hx(h: bytes) -> bytes:  # hex with legal internal whitespace
        return b"".join(h.split())

    try:
        for m in _re.finditer(
            rb"beginbfchar(.*?)endbfchar", cmap_stream, _re.S
        ):
            for a, b in _re.findall(
                rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]*)>", m.group(1)
            ):
                a, b = _hx(a), _hx(b)
                if not a or len(a) % 2 or len(b) % 2:
                    continue
                src = bytes.fromhex(a.decode("ascii"))
                table[src] = bytes.fromhex(b.decode("ascii")).decode(
                    "utf-16-be", "replace"
                )
                clen = max(clen, len(src))
        for m in _re.finditer(
            rb"beginbfrange(.*?)endbfrange", cmap_stream, _re.S
        ):
            entries = _re.findall(
                rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*"
                rb"(?:<([0-9A-Fa-f\s]+)>|\[(.*?)\])",
                m.group(1),
                _re.S,
            )
            for lo_h, hi_h, base_h, arr in entries:
                lo_h, hi_h = _hx(lo_h), _hx(hi_h)
                base_h = _hx(base_h)
                if not lo_h or len(lo_h) % 2 or len(lo_h) != len(hi_h):
                    continue
                width = len(lo_h) // 2
                lo = int(lo_h, 16)
                hi = int(hi_h, 16)
                if hi < lo or hi - lo >= 0x10000:
                    continue
                clen = max(clen, width)
                if base_h:
                    blen = max(2, len(base_h) // 2)
                    base = int(base_h, 16)
                    for k in range(hi - lo + 1):
                        dst = base + k
                        nbytes = max(blen, (dst.bit_length() + 7) // 8)
                        if nbytes % 2:
                            # r11 (ADVICE): a 2-byte base whose range
                            # crosses U+FFFF yields a 3-byte value —
                            # raw big-endian bytes are odd/non-UTF-16
                            # and decoded to a wrong char + U+FFFD.
                            # The destination is a CODEPOINT: emit it
                            # via chr() (Python encodes the surrogate
                            # pair when the string is used).
                            s = (
                                chr(dst)
                                if dst <= 0x10FFFF
                                else "�"
                            )
                        else:
                            s = dst.to_bytes(nbytes, "big").decode(
                                "utf-16-be", "replace"
                            )
                        table[(lo + k).to_bytes(width, "big")] = s
                else:
                    dsts = [
                        _hx(x)
                        for x in _re.findall(rb"<([0-9A-Fa-f\s]*)>", arr)
                    ]
                    for k, dh in enumerate(dsts[: hi - lo + 1]):
                        if len(dh) % 2:
                            continue
                        table[(lo + k).to_bytes(width, "big")] = (
                            bytes.fromhex(dh.decode("ascii")).decode(
                                "utf-16-be", "replace"
                            )
                        )
    except (ValueError, OverflowError):
        return None
    return (table, clen) if table else None


def _pdf_content_text(
    stream: bytes, fonts: "dict[str, tuple] | None" = None
) -> "list[str]":
    """Text chunks of one content stream in operator order: every
    Tj / ' / \" string and every TJ array's string pieces (joined),
    literal AND hex strings (r10); a Td/TD/T*/' between showings
    starts a new chunk. ``fonts`` maps resource names (``F1``) to
    parsed ToUnicode CMaps — ``/Fx … Tf`` switches the active decode
    (latin-1 when the font has no CMap)."""
    chunks: "list[str]" = []
    cur: "list[str]" = []
    i, n = 0, len(stream)
    pending: "list[str]" = []
    fonts = fonts or {}
    cmap = None
    last_name = None

    def flush_line():
        if pending:
            cur.append("".join(pending))
            pending.clear()

    while i < n:
        b = stream[i : i + 1]
        if b == b"(":
            s, i = _pdf_string(stream, i)
            pending.append(_apply_cmap(s, cmap))
            continue
        if b == b"<":
            if stream[i : i + 2] == b"<<":  # inline dict: skip opener
                i += 2
                continue
            s, i = _pdf_hex_string(stream, i)
            pending.append(_apply_cmap(s, cmap))
            continue
        if b == b"/":  # name token — remembered for a following Tf
            j = i + 1
            while j < n and stream[j : j + 1] not in (
                b" ", b"\t", b"\r", b"\n", b"\f", b"(", b"<", b"[",
                b"/", b">", b"]",
            ):
                j += 1
            last_name = stream[i + 1 : j].decode("latin-1")
            i = j
            continue
        if b == b"[":  # TJ array: strings + kerning numbers
            i += 1
            continue
        if stream[i : i + 2] == b"Tf":
            cmap = fonts.get(last_name)
            i += 2
            continue
        if stream[i : i + 2] in (b"Td", b"TD", b"T*"):
            flush_line()
            i += 2
            continue
        if b == b"'":
            # ' is T* + Tj: ITS OWN string (the last one scanned)
            # starts the new line; everything before it flushes first
            own = pending.pop() if pending else ""
            flush_line()
            if own:
                pending.append(own)
            i += 1
            continue
        i += 1
    flush_line()
    chunks.extend(cur)
    return chunks


def _pdf_inflate(header: bytes, raw: bytes) -> "bytes | None":
    """Apply the stream's filter: FlateDecode inflates, no filter
    passes through, anything else (or corrupt zlib) yields None."""
    if b"/FlateDecode" in header:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    if b"/Filter" in header:
        return None
    return raw


def _pdf_object_stream(body: bytes) -> "bytes | None":
    """The (inflated) stream of one object body, or None."""
    import re as _re

    s = body.find(b"stream")
    if s < 0:
        return None
    header = body[:s]
    data_start = s + 6
    if body[data_start : data_start + 2] == b"\r\n":
        data_start += 2
    elif body[data_start : data_start + 1] == b"\n":
        data_start += 1
    e = body.find(b"endstream", data_start)
    if e < 0:
        return None
    m = _re.search(rb"/Length\s+(\d+)(?!\s+0\s+R)", header)
    if m:
        raw = body[data_start : data_start + int(m.group(1))]
    else:
        raw = body[data_start:e]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
    return _pdf_inflate(header, raw)


def _pdf_unpack_objstm(body: bytes) -> "dict[int, bytes] | None":
    """Unpack one ``/Type /ObjStm`` object stream (ISO 32000 §7.5.7 —
    the PDF 1.5+ container most post-2005 writers pack their page /
    font / catalog dictionaries into): the inflated stream carries
    ``/N`` (objnum, offset) integer pairs followed by the object
    bodies at ``/First``-relative offsets. Returns objnum → body, or
    None when the stream is corrupt / the header lies. Packed objects
    are dictionaries only (the spec forbids streams inside an
    ObjStm), so the returned bodies feed the page-graph resolution
    exactly like scanned ``N 0 obj`` bodies."""
    import re as _re

    s = body.find(b"stream")
    header = body[:s] if s >= 0 else body
    nm = _re.search(rb"/N\s+(\d+)", header)
    fm = _re.search(rb"/First\s+(\d+)", header)
    if not (nm and fm):
        return None
    n, first = int(nm.group(1)), int(fm.group(1))
    if not (0 < n <= 100_000) or first <= 0:
        return None
    data = _pdf_object_stream(body)
    if data is None or first > len(data):
        return None
    head = data[:first].split()
    if len(head) < 2 * n:
        return None
    try:
        pairs = [
            (int(head[2 * i]), int(head[2 * i + 1])) for i in range(n)
        ]
    except ValueError:
        return None
    out: "dict[int, bytes]" = {}
    body_len = len(data) - first
    for i, (num, off) in enumerate(pairs):
        end = pairs[i + 1][1] if i + 1 < n else body_len
        if not (0 <= off <= end <= body_len):
            return None
        out[num] = data[first + off : first + end]
    return out


def _pdf_fonts(
    body: bytes, objs: "dict[int, bytes]", cmap_cache: dict
) -> dict:
    """Resource-name → ToUnicode CMap map of one object body's
    ``/Resources /Font`` dictionary (fonts without a parsable CMap
    are omitted — they decode latin-1)."""
    import re as _re

    fonts: dict = {}
    fm = _re.search(rb"/Font\s*<<(.*?)>>", body, _re.S)
    if not fm:
        return fonts
    for name, fnum in _re.findall(
        rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fm.group(1)
    ):
        fbody = objs.get(int(fnum))
        if fbody is None:
            continue
        tm = _re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fbody)
        if not tm:
            continue
        tn = int(tm.group(1))
        if tn not in cmap_cache:
            tb = objs.get(tn)
            ts = _pdf_object_stream(tb) if tb else None
            cmap_cache[tn] = _parse_tounicode(ts) if ts else None
        if cmap_cache[tn]:
            fonts[name.decode("latin-1")] = cmap_cache[tn]
    return fonts


def _pdf_pages(objs: "dict[int, bytes]"):
    """Resolve the page graph: list of ``(content_streams, fonts)``
    per page in /Kids order (object-number order when no /Pages node
    parses), where fonts maps resource names to ToUnicode CMaps from
    the page's /Resources — INHERITED from the /Pages node when the
    page has none of its own (ISO 32000 §7.7.3.4 inheritable
    attributes; one level, the shape every common writer emits), the
    page's own entries winning on name collisions. None when no
    /Type /Page object exists (the legacy whole-file walk takes
    over)."""
    import re as _re

    page_nums = [
        num
        for num, body in objs.items()
        if _re.search(rb"/Type\s*/Page\b", body)
    ]
    if not page_nums:
        return None
    cmap_cache: dict = {}
    order = None
    parent_fonts: dict = {}
    for body in objs.values():
        if _re.search(rb"/Type\s*/Pages\b", body):
            km = _re.search(rb"/Kids\s*\[(.*?)\]", body, _re.S)
            if km:
                order = [
                    int(x)
                    for x in _re.findall(rb"(\d+)\s+\d+\s+R", km.group(1))
                ]
            parent_fonts = _pdf_fonts(body, objs, cmap_cache)
            break
    if order:
        in_kids = [n for n in order if n in set(page_nums)]
        rest = sorted(set(page_nums) - set(in_kids))
        page_nums = in_kids + rest
    else:
        page_nums = sorted(page_nums)
    pages = []
    for num in page_nums:
        body = objs[num]
        refs = []
        cm = _re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        if cm:
            refs = [int(cm.group(1))]
        else:
            am = _re.search(rb"/Contents\s*\[(.*?)\]", body, _re.S)
            if am:
                refs = [
                    int(x)
                    for x in _re.findall(rb"(\d+)\s+\d+\s+R", am.group(1))
                ]
        fonts = dict(parent_fonts)
        fonts.update(_pdf_fonts(body, objs, cmap_cache))
        raws = []
        for r in refs:
            rb_ = objs.get(r)
            if rb_ is None:
                continue
            data = _pdf_object_stream(rb_)
            if data is not None:
                raws.append(data)
        pages.append((raws, fonts))
    return pages


def pdf_to_text(payload: bytes) -> str:
    """Text of a (simple, text-based) PDF: the text-showing operators
    (``Tj``, ``'``, ``TJ`` — literal and hex strings) are replayed in
    order; ``Td`` / ``TD`` / ``T*`` line moves become newlines, pages
    join with ``\\f``.

    r10 — **ToUnicode CMaps are honored**: when the page graph parses
    (``/Type /Page`` objects with ``/Contents`` + direct
    ``/Resources /Font``), each shown string decodes through the
    active font's ``beginbfchar``/``beginbfrange`` mapping (``/Fx …
    Tf`` tracked through the stream), so subset-font PDFs — most
    real-world ones — extract real text instead of mojibake; a code
    the CMap misses emits U+FFFD, the LOUD boundary. Fonts without a
    CMap (and documents without a parsable page graph, which fall
    back to the whole-file stream walk) decode latin-1 as before.
    Image-only or exotic PDFs (cross-reference streams, LZW,
    encrypted) yield whatever literal text parses — or raise
    ``ValueError`` when the payload is not a PDF at all. Scanned PDFs
    have no text layer (that is OCR's job, out of scope)."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF: bad header")
    import re as _re

    objs: "dict[int, bytes]" = {}
    for m in _re.finditer(rb"(\d{1,9})\s+\d+\s+obj\b", payload):
        end = payload.find(b"endobj", m.end())
        objs[int(m.group(1))] = payload[
            m.end() : end if end >= 0 else len(payload)
        ]
    # r11: PDF 1.5+ object streams — unpack /Type /ObjStm containers
    # so the page/font/catalog dictionaries most post-2005 writers
    # compress into them are visible to the page-graph walk (they
    # were silently invisible before, extracting empty/partial text).
    # A present-but-corrupt ObjStm raises: pdf_extract_text turns it
    # into a per-doc NULL — loud, never a silent partial extract.
    for num in sorted(objs):
        body = objs[num]
        if _re.search(rb"/Type\s*/ObjStm\b", body):
            packed = _pdf_unpack_objstm(body)
            if packed is None:
                raise ValueError(
                    "corrupt PDF object stream (/Type /ObjStm "
                    f"object {num} failed to unpack)"
                )
            for pn, pb in packed.items():
                # a directly-scanned `N 0 obj` wins on collisions
                objs.setdefault(pn, pb)
    graph = _pdf_pages(objs) if objs else None
    if graph:
        texts: "list[str]" = []
        for raws, fonts in graph:
            chunks: "list[str]" = []
            for raw in raws:
                chunks.extend(_pdf_content_text(raw, fonts))
            if chunks:
                texts.append("\n".join(chunks))
        if texts:
            return "\f".join(texts)
        # page graph parsed but yielded nothing: fall through to the
        # legacy whole-file walk (damaged refs, unusual writers)
    pages: "list[str]" = []
    pos = 0
    n = len(payload)
    while True:
        s = payload.find(b"stream", pos)
        if s < 0:
            break
        dict_start = payload.rfind(b"<<", 0, s)
        header = payload[dict_start:s] if dict_start >= 0 else b""
        data_start = s + 6
        if payload[data_start : data_start + 2] == b"\r\n":
            data_start += 2
        elif payload[data_start : data_start + 1] == b"\n":
            data_start += 1
        e = payload.find(b"endstream", data_start)
        if e < 0:
            break
        import re as _re

        m = _re.search(rb"/Length\s+(\d+)(?!\s+0\s+R)", header)
        if m:
            # direct /Length: the EXACT data byte count (T 7.3.8) —
            # never guess, a stream may legitimately end in \r/\n
            raw = payload[data_start : data_start + int(m.group(1))]
        else:
            # indirect/missing length: strip the writer's EOL-before-
            # endstream heuristically
            raw = payload[data_start:e]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                raw = raw[:-1]
        pos = e + 9
        if b"/FlateDecode" in header:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue  # corrupt/unsupported stream: skip it
        elif b"/Filter" in header:
            continue  # other filters unsupported: skip
        chunks = _pdf_content_text(raw)
        if chunks:
            pages.append("\n".join(chunks))
    return "\f".join(pages)
