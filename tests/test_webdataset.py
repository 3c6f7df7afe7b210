"""WebDataset tar sharding (functions/webdataset.py): byte-identical
shards, stdlib-tarfile round-trips, convention compliance."""

import io
import tarfile

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.webdataset import (
    from_webdataset_shards,
    to_webdataset_shards,
)


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        (f"doc{i:04d}", f"caption text {i}", bytes([i % 256] * (10 + i)))
        for i in range(50)
    ]
    return spark.createDataFrame(
        rows, "key string, text string, img binary"
    ), rows


class TestToShards:
    def test_members_and_convention(self, samples):
        df, rows = samples
        out = to_webdataset_shards(
            df, "key", {"txt": "text", "jpg": "img"}, n_shards=4
        ).collect()
        assert 1 <= len(out) <= 4
        assert sum(r["n_samples"] for r in out) == 50
        seen = {}
        for r in out:
            with tarfile.open(fileobj=io.BytesIO(bytes(r["tar"]))) as tf:
                names = [m.name for m in tf.getmembers()]
                # convention: one sample's files adjacent, sorted keys
                keys = [n.split(".", 1)[0] for n in names]
                assert keys == sorted(keys)
                for m in tf.getmembers():
                    assert m.mtime == 0 and m.uid == 0  # deterministic
                    seen[m.name] = tf.extractfile(m).read()
        for key, text, img in rows:
            assert seen[f"{key}.txt"] == text.encode()
            assert seen[f"{key}.jpg"] == img

    def test_byte_identical_under_repartition(self, samples):
        df, _ = samples
        a = {
            r["shard"]: bytes(r["tar"])
            for r in to_webdataset_shards(
                df, "key", {"txt": "text"}, n_shards=4
            ).collect()
        }
        b = {
            r["shard"]: bytes(r["tar"])
            for r in to_webdataset_shards(
                df.repartition(7), "key", {"txt": "text"}, n_shards=4
            ).collect()
        }
        assert a == b

    def test_null_members_skipped(self, spark):
        df = spark.createDataFrame(
            [("a", "hello", None), ("b", None, b"\x01"),
             ("c", None, None)],
            "key string, text string, img binary",
        )
        out = to_webdataset_shards(
            df, "key", {"txt": "text", "jpg": "img"}, n_shards=1
        ).collect()[0]
        with tarfile.open(fileobj=io.BytesIO(bytes(out["tar"]))) as tf:
            names = sorted(m.name for m in tf.getmembers())
        assert names == ["a.txt", "b.jpg"]
        assert out["n_samples"] == 2  # all-NULL sample contributes none

    def test_bad_extension_rejected(self, samples):
        df, _ = samples
        with pytest.raises(ValueError, match="bad extension"):
            to_webdataset_shards(df, "key", {"a.b": "text"})
        with pytest.raises(ValueError, match="at least one"):
            to_webdataset_shards(df, "key", {})


class TestRoundTrip:
    def test_full_round_trip(self, samples):
        df, rows = samples
        shards = to_webdataset_shards(
            df, "key", {"txt": "text", "jpg": "img"}, n_shards=4
        )
        back = from_webdataset_shards(shards).collect()
        got = {(r["key"], r["ext"]): bytes(r["payload"]) for r in back}
        assert len(got) == 100
        for key, text, img in rows:
            assert got[(key, "txt")] == text.encode()
            assert got[(key, "jpg")] == img

    def test_extension_filter(self, samples):
        df, _ = samples
        shards = to_webdataset_shards(
            df, "key", {"txt": "text", "jpg": "img"}, n_shards=2
        )
        back = from_webdataset_shards(
            shards, extensions=["txt"]
        ).collect()
        assert len(back) == 50
        assert all(r["ext"] == "txt" for r in back)

    def test_multidot_extension_rule(self, spark):
        # key = basename before the FIRST dot (WebDataset rule)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            data = b"mask"
            info = tarfile.TarInfo("sample01.seg.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        df = spark.createDataFrame(
            [(0, bytearray(buf.getvalue()))], "shard int, tar binary"
        )
        r = from_webdataset_shards(df).collect()[0]
        assert r["key"] == "sample01" and r["ext"] == "seg.png"
