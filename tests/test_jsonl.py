"""JSONL shard interchange (sources/jsonl.py): roundtrip identity,
byte-determinism under repartitioning, gzip framing, escaped-newline
safety, permissive parse."""

import gzip
import json

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.sources.jsonl import (
    from_jsonl_shards,
    to_jsonl_shards,
)

SCHEMA = "doc_id long, text string, lang string"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"body {i}\nwith a newline and \"quotes\" {'x' * i}", "en")
        for i in range(30)
    ] + [(99, None, None)]
    return spark.createDataFrame(rows, SCHEMA), {
        r[0]: (r[1], r[2]) for r in rows
    }


class TestJsonlShards:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, spark, docs, gz):
        df, orig = docs
        shards = to_jsonl_shards(
            df, ["doc_id", "text", "lang"], n_shards=4, gzip_shard=gz
        )
        back = from_jsonl_shards(shards, SCHEMA)
        got = {
            r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()
        }
        assert got == orig

    def test_byte_identical_under_repartition(self, spark, docs):
        df, _ = docs
        a = {
            r["shard"]: bytes(r["data"])
            for r in to_jsonl_shards(
                df, ["doc_id", "text"], n_shards=4
            ).collect()
        }
        b = {
            r["shard"]: bytes(r["data"])
            for r in to_jsonl_shards(
                df.repartition(5), ["doc_id", "text"], n_shards=4
            ).collect()
        }
        assert a == b and len(a) >= 2

    def test_shard_bytes_are_valid_jsonl(self, spark, docs):
        df, orig = docs
        rows = to_jsonl_shards(
            df, ["doc_id", "text"], n_shards=2
        ).collect()
        seen = 0
        for r in rows:
            body = bytes(r["data"]).decode("utf-8")
            assert body.endswith("\n")
            for line in body.splitlines():
                obj = json.loads(line)  # stdlib parses every line
                seen += 1
                if "text" in obj:
                    assert "\n" not in line  # escaping kept it 1-line
        assert seen == len(orig)

    def test_gzip_shard_is_plain_gzip(self, spark, docs):
        df, _ = docs
        r = to_jsonl_shards(
            df, ["doc_id"], n_shards=1, gzip_shard=True
        ).first()
        body = gzip.decompress(bytes(r["data"]))
        assert body.count(b"\n") == r["n_records"]

    def test_permissive_bad_line_yields_nulls(self, spark):
        blob = b'{"doc_id": 1, "text": "ok"}\nnot json at all\n'
        df = spark.createDataFrame(
            [(0, blob)], "shard int, data binary"
        )
        out = from_jsonl_shards(df, "doc_id long, text string").collect()
        assert len(out) == 2
        parsed = {r["doc_id"] for r in out}
        assert parsed == {1, None}

    def test_empty_cols_raises(self, spark, docs):
        with pytest.raises(ValueError, match="cols"):
            to_jsonl_shards(docs[0], [])
