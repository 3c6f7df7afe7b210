"""Tests for multimodal column plumbing (functions/multimodal.py)."""

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions import multimodal as MM
from tests.conftest import approx


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, bytearray(b"payload-zero"), "fake/jpeg", 640, 480, None),
        (1, bytearray(b"payload-one"), "fake/wav", None, None, 4500),
        (2, None, "fake/jpeg", None, None, None),
        (3, bytearray(b"real-image"), "image/png", 64, 64, None),
        (4, bytearray(b"unknown"), "application/octet-stream", None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, payload binary, mime string, width int, height int, "
        "duration_ms long",
    )
    return df.select(
        "id",
        MM.media_struct(
            F.col("payload"), F.col("mime"), F.col("width"), F.col("height"),
            F.col("duration_ms"),
        ).alias("media"),
    )


class TestDecode:
    def test_fake_decoder_deterministic(self, media):
        out = MM.decode_features(media, "media", dim=8, on_error="null")
        rows = {r["id"]: r["features"] for r in out.collect()}
        assert len(rows[0]) == 8
        assert all(-1.0 <= v <= 1.0 for v in rows[0])
        # deterministic across runs
        again = {
            r["id"]: r["features"]
            for r in MM.decode_features(media, "media", dim=8, on_error="null").collect()
        }
        assert [approx(v) for v in again[0]] == list(rows[0])

    def test_null_payload_and_unknown_mime(self, media):
        rows = {
            r["id"]: r["features"]
            for r in MM.decode_features(media, "media", dim=4, on_error="null").collect()
        }
        assert rows[2] is None  # null payload
        assert rows[3] is None  # image/png payload isn't a PNG, on_error=null
        assert rows[4] is None  # unknown mime prefix

    def test_corrupt_payload_raises_cleanly(self, media):
        # mime says PNG, bytes are not: the real decoder rejects it
        with pytest.raises(Exception) as exc_info:
            MM.decode_features(media.where("id = 3"), "media", dim=4).collect()
        assert "not a PNG" in str(exc_info.value)

    def test_mp4_mime_with_garbage_payload_raises_cleanly(self, spark):
        # r6: video/mp4 now parses REAL container metadata (ISO-BMFF
        # box walk); non-MP4 bytes under that mime get the clear
        # parse error, not a generic decoder-unavailable message
        df = spark.createDataFrame(
            [(1, bytearray(b"xx"))], "id long, payload binary"
        ).select(
            "id",
            MM.media_struct(F.col("payload"), F.lit("video/mp4")).alias("media"),
        )
        with pytest.raises(Exception) as exc_info:
            MM.decode_features(df, "media", dim=4).collect()
        assert "not an MP4" in str(exc_info.value)

    def test_generic_video_decoder_unavailable(self, spark):
        # non-MP4 video families still need ffmpeg
        df = spark.createDataFrame(
            [(1, bytearray(b"xx"))], "id long, payload binary"
        ).select(
            "id",
            MM.media_struct(
                F.col("payload"), F.lit("video/webm")
            ).alias("media"),
        )
        with pytest.raises(Exception) as exc_info:
            MM.decode_features(df, "media", dim=4).collect()
        assert "NotImplementedError" in str(exc_info.value) or "ffmpeg" in str(
            exc_info.value
        )

    @pytest.mark.slow
    def test_features_flow_into_similarity(self, media, spark):
        from pandas_weights_spark.functions.similarity import cosine_similarity

        feats = MM.decode_features(media.where("id < 2"), "media", dim=8)
        pair = feats.alias("a").crossJoin(feats.alias("b")).where(
            F.col("a.id") < F.col("b.id")
        )
        sim = pair.select(
            cosine_similarity(F.col("a.features"), F.col("b.features")).alias("c")
        ).first()["c"]
        assert sim is not None and -1.0 <= sim <= 1.0


class TestFrameSample:
    def test_row_explosion_by_duration(self, media):
        out = MM.frame_sample_plan(media, "media", every_ms=1000)
        counts = (
            out.groupBy("id").count().collect()
        )
        m = {r["id"]: r["count"] for r in counts}
        assert m[1] == 4  # 4500ms / 1000ms → 4 frames
        assert m[0] == 1  # no duration → single frame at t=0
        ts = sorted(
            r["frame_ts_ms"] for r in out.where("id = 1").collect()
        )
        assert ts == [0, 1000, 2000, 3000]


class TestResize:
    def test_fake_resize_batch_shape(self, spark):
        from pandas_weights_spark.functions.multimodal import (
            media_struct,
            resize_media,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, bytearray(b"abcdef")), (2, bytearray(b"")), (3, None)],
            "id long, payload binary",
        ).select(
            "id",
            media_struct(
                F.col("payload"), F.lit("fake/x"),
                width=F.lit(100), height=F.lit(50),
            ).alias("media"),
        )
        out = {r["id"]: r["resized"] for r in
               resize_media(df, "media", 4, 3).collect()}
        assert out[3] is None  # NULL payload passes through as NULL
        r1 = out[1]
        assert (r1["width"], r1["height"]) == (4, 3)
        assert len(r1["payload"]) == 12
        assert bytes(r1["payload"]) == (b"abcdef" * 2)[:12]
        assert len(out[2]["payload"]) == 12  # empty payload zero-filled

    def test_real_mime_raises(self, spark):
        from pandas_weights_spark.functions.multimodal import (
            media_struct,
            resize_media,
        )
        from pyspark.sql import functions as F
        import pytest as _pytest

        df = spark.createDataFrame(
            [(1, bytearray(b"x"))], "id long, payload binary"
        ).select(
            "id",
            media_struct(F.col("payload"), F.lit("image/png")).alias("media"),
        )
        with _pytest.raises(Exception):
            resize_media(df, "media", 2, 2).collect()


def _png_of(w, h, fn):
    """Synthetic RGB PNG with pixel (x, y) = fn(x, y) -> (r, g, b)."""
    from pandas_weights_spark.functions import _codecs as C

    px = bytearray()
    for y in range(h):
        for x in range(w):
            px.extend(fn(x, y))
    return C.encode_png(C.ImageData(w, h, 3, bytes(px)))


class TestPerceptualHash:
    @pytest.fixture(scope="class")
    def images(self, spark):
        # a horizontal gradient, the same gradient with a tiny blemish,
        # a vertical gradient (structurally different), and a corrupt
        # payload
        grad = _png_of(32, 32, lambda x, y: (x * 8 % 256,) * 3)

        def blemish(x, y):
            if x == 5 and y == 5:
                return (255, 0, 0)
            return (x * 8 % 256,) * 3

        near = _png_of(32, 32, blemish)
        vert = _png_of(32, 32, lambda x, y: (y * 8 % 256,) * 3)
        rows = [
            (1, bytearray(grad), "image/png"),
            (2, bytearray(near), "image/png"),
            (3, bytearray(vert), "image/png"),
            (4, bytearray(b"not a png"), "image/png"),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary, mime string")
        return df.select(
            "id",
            MM.media_struct(F.col("payload"), F.col("mime")).alias("media"),
        )

    def test_hash_shape_and_determinism(self, images):
        out = {
            r["id"]: r["phash"]
            for r in MM.perceptual_hash(images, "media").collect()
        }
        assert len(out[1]) == 64 and set(out[1]) <= {"0", "1"}
        assert out[4] is None  # corrupt payload -> NULL under on_error=null
        again = {
            r["id"]: r["phash"]
            for r in MM.perceptual_hash(images, "media").collect()
        }
        assert out == again

    def test_near_images_close_different_far(self, images):
        out = {
            r["id"]: r["phash"]
            for r in MM.perceptual_hash(images, "media").collect()
        }
        ham = lambda a, b: sum(x != y for x, y in zip(a, b))
        assert ham(out[1], out[2]) <= 4       # blemish: few bits flip
        assert ham(out[1], out[3]) > 16       # different structure

    def test_image_near_duplicates(self, images):
        pairs = MM.image_near_duplicates(
            images, "media", "id", max_distance=7, bands=8
        ).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert got == {(1, 2)}
        (only,) = pairs
        assert only["hamming"] <= 7

    def test_scaled_copy_is_near(self, spark):
        # the same scene at 2x resolution hashes near-identically —
        # the invariance dHash exists for
        a = _png_of(32, 32, lambda x, y: ((x // 4) * 32 % 256,) * 3)
        b = _png_of(64, 64, lambda x, y: ((x // 8) * 32 % 256,) * 3)
        df = spark.createDataFrame(
            [(1, bytearray(a), "image/png"), (2, bytearray(b), "image/png")],
            "id long, payload binary, mime string",
        ).select(
            "id", MM.media_struct(F.col("payload"), F.col("mime")).alias("media")
        )
        pairs = MM.image_near_duplicates(df, "media", "id").collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}

    def test_band_guard(self, images):
        with pytest.raises(ValueError, match="divide"):
            MM.image_near_duplicates(images, "media", "id", bands=7)
        with pytest.warns(UserWarning, match="recall"):
            MM.image_near_duplicates(
                images, "media", "id", max_distance=8, bands=8
            )


class TestResizeMediaBilinear:
    def test_bilinear_method_real_pixels(self, spark):
        import numpy as np

        from pandas_weights_spark.functions import _codecs as C
        from pandas_weights_spark.functions.multimodal import resize_media

        img = C.ImageData(2, 1, 1, bytes([0, 100]))
        png = C.encode_png(img)
        df = spark.createDataFrame(
            [(1, {"mime": "image/png", "payload": png, "width": 2,
                  "height": 1})],
            "id long, media struct<mime:string,payload:binary,"
            "width:int,height:int>",
        )
        out = resize_media(
            df, "media", 4, 1, method="bilinear"
        ).first()["resized"]
        dec = C.decode_png(bytes(out["payload"]))
        assert list(dec.pixels) == [0, 25, 75, 100]

    def test_bad_method_raises(self, spark):
        from pandas_weights_spark.functions.multimodal import resize_media

        df = spark.createDataFrame([(1,)], "id long")
        import pytest as _pt

        with _pt.raises(ValueError, match="method"):
            resize_media(df, "id", 2, 2, method="cubic")
