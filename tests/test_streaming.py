"""Structured Streaming parity tests: the weighted window aggregates must
produce the same results incrementally (availableNow over files) as the
batch resampler does in one pass."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark import wt
from pandas_weights_spark.streaming import (
    weighted_groupby_stream,
    weighted_resample_stream,
)
from tests.conftest import approx

SCHEMA = "ts timestamp, grp string, Value double, w double"


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    # two separate files → two incremental batches under availableNow
    base = dt.datetime(2024, 1, 1)
    rows1 = [
        (base + dt.timedelta(minutes=m), "A" if m % 2 else "B", float(m), 1.0 + m % 3)
        for m in range(0, 60, 5)
    ]
    rows2 = [
        (base + dt.timedelta(minutes=m), "A" if m % 2 else "B", float(m), 1.0 + m % 3)
        for m in range(60, 120, 5)
    ]
    d = tmp_path_factory.mktemp("stream_src")
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.parquet(
        str(d / "part1"), mode="overwrite"
    )
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.parquet(
        str(d / "part2"), mode="overwrite"
    )
    return d


def run_stream(spark, df_stream, name):
    q = (
        df_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


class TestStreamingResample:
    def test_matches_batch(self, spark, source_dir):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        agg = weighted_resample_stream(
            stream, weights="w", on="ts", rule="30min",
            watermark="10 minutes", stats=("count", "sum", "mean"),
            value_cols=["Value"],
        )
        got = {
            r["window_start"]: r
            for r in run_stream(spark, agg, "resample_stream").collect()
        }

        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        expected = {
            r["ts"]: r
            for r in wt(batch, "w")[["Value"]]
            .resample("30min", on="ts", origin="epoch")
            .agg_all(["count", "sum", "mean"])
            .collect()
        }
        assert set(got) == set(expected)
        for k, e in expected.items():
            assert got[k]["Value_count"] == approx(e["Value_count"])
            assert got[k]["Value_sum"] == approx(e["Value_sum"])
            assert got[k]["Value_mean"] == approx(e["Value_mean"])

    def test_calendar_rule_rejected(self, spark, source_dir):
        stream = spark.readStream.schema(SCHEMA).parquet(str(source_dir))
        with pytest.raises(ValueError):
            weighted_resample_stream(stream, weights="w", on="ts", rule="MS")


class TestStreamingGroupBy:
    def test_keyed_stats_match_batch(self, spark, source_dir):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        agg = weighted_groupby_stream(
            stream, weights="w", keys=["grp"], on="ts",
            stats=("sum", "mean"), value_cols=["Value"],
        )
        got = {r["grp"]: r for r in run_stream(spark, agg, "gb_stream").collect()}

        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        expected = {
            r["grp"]: r
            for r in wt(batch, "w")[["Value"]]
            .groupby("grp")
            .agg_all(["sum", "mean"])
            .collect()
        }
        assert set(got) == set(expected)
        for k in expected:
            assert got[k]["Value_sum"] == approx(expected[k]["Value_sum"])
            assert got[k]["Value_mean"] == approx(expected[k]["Value_mean"])
