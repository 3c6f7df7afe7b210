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


class TestSessionWindows:
    def test_sessions_and_weighted_stats(self, spark, tmp_path):
        # two activity bursts per key separated by >10min of silence
        base = dt.datetime(2024, 1, 1)
        rows = [
            (base + dt.timedelta(minutes=m), "A", float(m), 2.0)
            for m in (0, 2, 4)            # session 1
        ] + [
            (base + dt.timedelta(minutes=m), "A", float(m), 1.0)
            for m in (30, 31)             # session 2
        ] + [
            (base + dt.timedelta(minutes=m), "B", 10.0, 1.0)
            for m in (5,)                 # lone session
        ]
        d = tmp_path / "sess_src"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))

        from pandas_weights_spark.streaming import weighted_session_stream

        stream = spark.readStream.schema(SCHEMA).parquet(str(d))
        agg = weighted_session_stream(
            stream, weights="w", keys=["grp"], on="ts", gap="10 minutes",
            watermark="1 minute", stats=("count", "sum", "mean"),
            value_cols=["Value"],
        )
        out = run_stream(spark, agg, "session_stream").collect()
        got = {
            (r["grp"], r["session_start"]): r for r in out
        }
        assert len(got) == 3
        s1 = got[("A", base)]
        # w·x: 2*(0+2+4)=12 over Σw=6
        assert s1["Value_sum"] == approx(12.0)
        assert s1["Value_count"] == approx(6.0)
        assert s1["Value_mean"] == approx(2.0)
        # session end extends gap past the last event
        assert s1["session_end"] == base + dt.timedelta(minutes=14)
        s2 = got[("A", base + dt.timedelta(minutes=30))]
        assert s2["Value_mean"] == approx(30.5)

    def test_batch_dataframe_works_too(self, spark):
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(base, "A", 1.0, 1.0), (base + dt.timedelta(minutes=1), "A", 3.0, 3.0)],
            SCHEMA,
        )
        from pandas_weights_spark.streaming import weighted_session_stream

        out = weighted_session_stream(
            df, weights="w", keys=["grp"], on="ts", gap="5 minutes",
            stats=("mean",), value_cols=["Value"],
        ).collect()
        assert len(out) == 1
        assert out[0]["Value_mean"] == approx(10.0 / 4.0)


class TestStreamingDedup:
    def test_first_occurrence_survives(self, spark, tmp_path):
        base = dt.datetime(2024, 1, 1)
        schema = "ts timestamp, doc_id int, text string"
        rows1 = [
            (base, 1, "alpha beta"),
            (base + dt.timedelta(seconds=30), 2, "gamma delta"),
        ]
        rows2 = [
            (base + dt.timedelta(minutes=1), 3, "  Alpha Beta  "),  # dup of 1
            (base + dt.timedelta(minutes=2), 4, "epsilon"),
        ]
        d = tmp_path / "dedup_src"
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
            str(d / "p1")
        )
        spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
            str(d / "p2")
        )

        from pandas_weights_spark.streaming import streaming_exact_dedup

        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(d))
        )
        out = streaming_exact_dedup(stream, "text", on="ts", watermark="10 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ids = sorted(
            r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()
        )
        assert 4 in ids and len(ids) == 3
        assert (1 in ids) != (3 in ids)  # exactly one of the dup pair


class TestRunningStatsState:
    def test_state_merges_across_batches(self, spark, source_dir):
        from pandas_weights_spark.streaming import weighted_running_stats_stream

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")   # force 2 micro-batches
            .parquet(str(source_dir))
        )
        out = weighted_running_stats_stream(
            stream, weights="w", keys=["grp"], value_col="Value"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("running_stats")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM running_stats").collect()
        # one row per key per batch
        assert len(rows) == 4
        final = {
            r["grp"]: r
            for r in rows
            if r["batch_rows"] > 0
        }
        # last emitted row per key carries the full-stream running stats —
        # compare with the one-pass batch kernel
        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        expect = {
            r["grp"]: r
            for r in wt(batch, "w")[["grp", "Value"]]
            .groupby("grp")
            .agg_all(["count", "sum", "mean", "var"])
            .collect()
        }
        latest = {}
        for r in rows:
            latest[r["grp"]] = r  # memory sink appends in batch order
        for g, e in expect.items():
            got = latest[g]
            assert got["w_count"] == approx(e["Value_count"])
            assert got["w_sum"] == approx(e["Value_sum"])
            assert got["w_mean"] == approx(e["Value_mean"])
            assert got["w_var"] == approx(e["Value_var"])


class TestLoadTableStream:
    def test_stream_matches_batch_rows(self, spark):
        # the replay twin of load_table: same rows, same (truncated-µs)
        # timestamps, single-file table streamed via pathGlobFilter
        from pandas_weights_spark.sources import load_table, load_table_stream

        sf = "/root/testdata/sf0.001"
        stream = load_table_stream(spark, sf, "events").select(
            "event_id", "ts", "value"
        )
        # no aggregation -> append mode (complete needs an agg)
        q = (
            stream.writeStream.format("memory")
            .queryName("load_table_stream_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM load_table_stream_test")
        batch = load_table(spark, sf, "events").select("event_id", "ts", "value")
        assert sorted(got.collect()) == sorted(batch.collect())


class TestStreamingAsof:
    def _frames(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(17)
        base = dt.datetime(2024, 1, 1)
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 4, 120),
                "ts": [
                    base + dt.timedelta(minutes=int(m))
                    for m in rng.integers(0, 600, 120)
                ],
                "a": rng.normal(size=120),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 4, 60),
                "ts": [
                    base + dt.timedelta(minutes=int(m))
                    for m in rng.integers(0, 600, 60)
                ],
                "sig": rng.normal(size=60),
            }
        )
        # dedupe right on (k, ts) so ties don't depend on sort order
        right = right.drop_duplicates(["k", "ts"])
        return left, right

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_stream_matches_batch_asof(self, spark, tmp_path, direction):
        from pandas_weights_spark.functions.asof import asof_join
        from pandas_weights_spark.streaming import streaming_asof_join

        left, right = self._frames(spark)
        ldf = spark.createDataFrame(left)
        rdf = spark.createDataFrame(right)
        expected = {
            (r["k"], r["ts"], r["a"]): (r["ts_right"], r["sig"])
            for r in asof_join(
                ldf, rdf, on="ts", by=["k"], direction=direction
            ).collect()
        }

        d = tmp_path / f"asof_src_{direction}"
        ldf.coalesce(2).write.parquet(str(d), mode="overwrite")
        stream = spark.readStream.schema(
            "k long, ts timestamp, a double"
        ).parquet(str(d))
        out = streaming_asof_join(
            stream, rdf, on="ts", by=["k"], direction=direction
        )
        name = f"asof_mem_{direction}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["k"], r["ts"], r["a"]): (r["ts_right"], r["sig"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert got == expected

    def test_tolerance_and_nulls(self, spark):
        # batch-mode path: tolerance bound + NULL-ts left rows unmatched
        import pandas as pd

        from pandas_weights_spark.streaming import streaming_asof_join

        left = spark.createDataFrame(
            [(1, 100.0, 1.0), (1, 200.0, 2.0), (1, None, 3.0)],
            "k long, ts double, a double",
        )
        right = spark.createDataFrame(
            [(1, 95.0, 7.0)], "k long, ts double, sig double"
        )
        rows = {
            r["a"]: r
            for r in streaming_asof_join(
                left, right, on="ts", by=["k"], tolerance=10
            ).collect()
        }
        assert rows[1.0]["sig"] == 7.0
        assert rows[2.0]["sig"] is None  # 105 past tolerance
        assert rows[3.0]["sig"] is None  # NULL ts never matches

    def test_null_by_keys_match_null_group(self, spark):
        # batch parity (round-3 advice): the batch operator's window
        # partitions NULL by-keys into their own group, so a NULL-k left
        # row matches NULL-k right rows — the streaming path must agree
        from pandas_weights_spark.functions.asof import asof_join
        from pandas_weights_spark.streaming import streaming_asof_join

        left = spark.createDataFrame(
            [(1, 100.0, 1.0), (None, 100.0, 2.0), (None, 50.0, 3.0),
             (2, 100.0, 4.0)],
            "k long, ts double, a double",
        )
        right = spark.createDataFrame(
            [(1, 90.0, 10.0), (None, 80.0, 20.0), (None, 99.0, 30.0)],
            "k long, ts double, sig double",
        )
        kw = dict(on="ts", by=["k"], direction="backward")
        expected = {
            r["a"]: (r["ts_right"], r["sig"])
            for r in asof_join(left, right, **kw).collect()
        }
        got = {
            r["a"]: (r["ts_right"], r["sig"])
            for r in streaming_asof_join(left, right, **kw).collect()
        }
        assert got == expected
        assert got[2.0] == (99.0, 30.0)  # NULL k matched NULL-k group
        assert got[3.0] == (None, None)  # no NULL-group row at ts <= 50
        assert got[4.0] == (None, None)  # k=2 has no right group at all

    def test_max_static_rows_guard(self, spark):
        from pandas_weights_spark.streaming import streaming_asof_join

        left = spark.createDataFrame([(1, 1.0)], "k long, ts double")
        right = spark.createDataFrame(
            [(1, float(i)) for i in range(20)], "k long, ts double"
        )
        with pytest.raises(ValueError, match="max_static_rows"):
            streaming_asof_join(
                left, right, on="ts", by=["k"], max_static_rows=10
            )

    def test_static_right_required(self, spark, tmp_path):
        from pandas_weights_spark.streaming import streaming_asof_join

        d = tmp_path / "asof_stream_right"
        spark.createDataFrame(
            [(1, 1.0)], "k long, ts double"
        ).write.parquet(str(d), mode="overwrite")
        s = spark.readStream.schema("k long, ts double").parquet(str(d))
        with pytest.raises(ValueError, match="STATIC right"):
            streaming_asof_join(s, s, on="ts", by=["k"])


class TestStreamingHeavyHitters:
    def test_superset_and_bounds(self, spark, source_dir):
        from pandas_weights_spark.streaming import streaming_heavy_hitters

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")  # force 2 micro-batches
            .parquet(str(source_dir))
        )
        out = streaming_heavy_hitters(
            stream, item_col="grp", weight_col="w", capacity=8,
            num_shards=4,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("hh_state")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM hh_state").collect()
        # last emission per (shard, item) is the final summary
        final = {}
        for r in rows:
            final[(r["shard"], r["item"])] = r
        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        import pandas as pd

        pdf = batch.select("grp", "w").toPandas().dropna()
        exact = pdf.groupby("grp")["w"].sum()
        total = float(exact.sum())
        # capacity >> distinct items here: every item retained with
        # EXACT mass and zero error
        got = {k[1]: r for k, r in final.items()}
        assert set(got) == set(exact.index)
        for item, r in got.items():
            assert r["err"] == 0.0
            assert r["est_mass"] == pytest.approx(float(exact[item]))
        # shard masses partition the total
        shard_tot = {}
        for (s, _), r in final.items():
            shard_tot[s] = r["shard_mass"]
        assert sum(shard_tot.values()) == pytest.approx(total)

    @pytest.mark.slow
    def test_capacity_eviction_keeps_heavy_item(self, spark, tmp_path):
        from pandas_weights_spark.streaming import streaming_heavy_hitters

        # 1 shard, capacity 2, 10 distinct items; item "big" carries
        # half the mass -> must survive every eviction round, with
        # est <= true <= est + err and err <= total/(capacity+1)
        rows = []
        for b in range(3):
            for i in range(10):
                rows.append((f"it{i}", 1.0, b))
            rows.append(("big", 11.0, b))
        import pandas as pd

        schema = "item string, w double, b int"
        d = tmp_path / "hh_src"
        for b in range(3):
            spark.createDataFrame(
                [r for r in rows if r[2] == b], schema
            ).coalesce(1).write.parquet(str(d / f"p{b}"), mode="overwrite")
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(d))
        )
        out = streaming_heavy_hitters(
            stream, item_col="item", weight_col="w", capacity=2,
            num_shards=1,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("hh_evict")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows_out = spark.sql("SELECT * FROM hh_evict").collect()
        final = {}
        last_batch = {}
        for r in rows_out:
            final[r["item"]] = r
        # state never exceeds capacity
        per_batch = {}
        for r in rows_out:
            per_batch.setdefault(r["shard_mass"], set()).add(r["item"])
        for mass, items in per_batch.items():
            assert len(items) <= 2
        big = final["big"]
        true_big = 33.0
        total = 3 * (10 + 11.0)
        assert big["est_mass"] <= true_big + 1e-9
        assert true_big <= big["est_mass"] + big["err"] + 1e-9
        assert big["err"] <= total / 3 + 1e-9

    def test_bad_params_raise(self, spark, source_dir):
        from pandas_weights_spark.streaming import streaming_heavy_hitters

        stream = spark.readStream.schema(SCHEMA).parquet(str(source_dir))
        with pytest.raises(ValueError, match="capacity"):
            streaming_heavy_hitters(stream, "grp", "w", capacity=0)
        with pytest.raises(ValueError, match="num_shards"):
            streaming_heavy_hitters(stream, "grp", "w", num_shards=0)


class TestStreamingTextPipeline:
    """The row-local text surface (quality flags, repetition metrics,
    PII redaction, chunking) is stateless, so it must run unchanged on
    a stream — the filter/scrub stage of a streaming ingestion
    pipeline."""

    def test_quality_and_redaction_match_batch(self, spark, tmp_path):
        from pandas_weights_spark.functions.quality import quality_flags
        from pandas_weights_spark.functions.text import pii_counts, redact_pii

        rows = [
            (1, "the quick brown fox jumps to be of and that have with "
                + " ".join(f"w{i}" for i in range(60))),
            (2, "short doc with alice@example.com inside"),
            (3, "- bullet\n- bullet\n- bullet"),
        ]
        d = str(tmp_path / "docs")
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(d)

        from pandas_weights_spark.functions.text import (
            remove_duplicate_lines,
        )

        def pipeline(df):
            fl = quality_flags(F.col("text"))
            return df.select(
                "doc_id",
                fl["keep"].alias("keep"),
                pii_counts(F.col("text"))["n_email"].alias("n_email"),
                F.md5(redact_pii(F.col("text"))).alias("red_fp"),
                # r5: intra-doc line dedup is stateless row-local too
                F.md5(remove_duplicate_lines(F.col("text"))).alias(
                    "ddl_fp"
                ),
            )

        batch = {r["doc_id"]: r for r in pipeline(spark.read.parquet(d)).collect()}
        stream = spark.readStream.schema("doc_id long, text string").parquet(d)
        q = (
            pipeline(stream)
            .writeStream.format("memory")
            .queryName("txtpipe")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM txtpipe").collect()}
        assert got.keys() == batch.keys()
        for k in batch:
            assert got[k] == batch[k]

    def test_chunking_streams(self, spark, tmp_path):
        from pandas_weights_spark.functions.packing import chunk_documents

        d = str(tmp_path / "docs2")
        spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(40)))],
            "doc_id long, text string",
        ).write.parquet(d)
        stream = spark.readStream.schema("doc_id long, text string").parquet(d)
        out = chunk_documents(stream, "text", "doc_id", chunk_tokens=16,
                              overlap=4)
        q = (
            out.writeStream.format("memory").queryName("chunkpipe")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM chunkpipe").collect()
        batch = chunk_documents(
            spark.read.parquet(d), "text", "doc_id", chunk_tokens=16, overlap=4
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


class TestStreamingTDigest:
    def test_state_merges_match_batch_digest_guarantee(self, spark, source_dir):
        """Two micro-batches; the final per-key digest must satisfy the
        t-digest rank-error bound against the EXACT weighted CDF of the
        full data — the same guarantee the batch operator pins."""
        from pandas_weights_spark.functions.tdigest import (
            tdigest_quantiles,
        )
        from pandas_weights_spark.streaming import streaming_tdigest

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")  # force 2 micro-batches
            .parquet(str(source_dir))
        )
        out = streaming_tdigest(
            stream, "Value", "w", keys=["grp"], delta=50
        )
        q = (
            out.writeStream.format("memory")
            .queryName("td_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM td_stream").collect()
        assert len(rows) == 4  # one row per key per batch
        latest = {}
        for r in rows:  # memory sink appends in batch order
            latest[r["grp"]] = r

        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        data = {}
        for r in batch.collect():
            data.setdefault(r["grp"], []).append((r["Value"], r["w"]))

        # totals are exact (sums, not sketched)
        for g, rows_g in data.items():
            assert latest[g]["td_total"] == approx(
                sum(w for _, w in rows_g)
            )
            assert latest[g]["td_min"] == min(v for v, _ in rows_g)
            assert latest[g]["td_max"] == max(v for v, _ in rows_g)

        # rank-error bound: estimated quantile's true rank within
        # O(1/delta) of q (loose factor 4/delta, as the batch tests use)
        dig = spark.createDataFrame([latest[g] for g in data], out.schema)
        qs = [0.1, 0.5, 0.9]
        est = {
            (r["grp"], r["q"]): r["value"]
            for r in tdigest_quantiles(dig, qs, by=["grp"]).collect()
        }
        for g, rows_g in data.items():
            W = sum(w for _, w in rows_g)
            for qq in qs:
                v = est[(g, qq)]
                below = sum(w for x, w in rows_g if x < v) / W
                at_or_below = sum(w for x, w in rows_g if x <= v) / W
                assert below - 4.0 / 50 <= qq <= at_or_below + 4.0 / 50, (
                    g, qq, v, below, at_or_below,
                )

    def test_requires_keys(self, spark, source_dir):
        from pandas_weights_spark.streaming import streaming_tdigest

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        with pytest.raises(ValueError, match="key"):
            streaming_tdigest(stream, "Value", "w", keys=[])


class TestStreamingDistinctCounts:
    def test_stream_matches_batch_estimates(self, spark, source_dir):
        from pandas_weights_spark.functions.distinct import hll_sketches
        from pandas_weights_spark.streaming import (
            streaming_distinct_counts,
        )

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")  # 2 micro-batches
            .parquet(str(source_dir))
        )
        out = streaming_distinct_counts(
            stream, ["Value"], keys=["grp"], on="ts"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("sdc")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM sdc").collect()
        latest = {}
        for r in rows:  # batch order: last write per key wins
            latest[r["grp"]] = r["Value_distinct"]

        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        from pyspark.sql import functions as FF

        exact = {
            r["grp"]: r["n"]
            for r in batch.groupBy("grp")
            .agg(FF.countDistinct("Value").alias("n"))
            .collect()
        }
        # sketches merged across micro-batches == the batch sketch; at
        # these cardinalities HLL is exact
        for g, n in exact.items():
            assert latest[g] == pytest.approx(n, rel=0.05)

    def test_batch_dataframe_accepted(self, spark, source_dir):
        from pandas_weights_spark.streaming import (
            streaming_distinct_counts,
        )

        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        out = streaming_distinct_counts(
            batch, ["Value"], keys=["grp"], on="ts"
        ).collect()
        assert len(out) == 2 and all(r["Value_distinct"] > 0 for r in out)

    def test_no_inert_watermark_without_window(self, spark, source_dir):
        # ADVICE r5: without window= the keys never finalize, so no
        # watermark node must appear in the plan (it would be inert)
        from pandas_weights_spark.streaming import (
            streaming_distinct_counts,
        )

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        out = streaming_distinct_counts(
            stream, ["Value"], keys=["grp"], on="ts"
        )
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "EventTimeWatermark" not in plan

    def test_windowed_counts_bound_state(self, spark, source_dir):
        # window= keys the aggregate by event-time window so the
        # watermark genuinely evicts finalized windows; estimates per
        # (window, grp) must match the batch distinct counts
        from pandas_weights_spark.streaming import (
            streaming_distinct_counts,
        )
        from pyspark.sql import functions as FF

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(source_dir))
        )
        out = streaming_distinct_counts(
            stream, ["Value"], keys=["grp"], on="ts",
            window="1 hour", watermark="10 minutes",
        )
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "EventTimeWatermark" in plan
        q = (
            out.writeStream.format("memory")
            .queryName("sdcw")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        latest = {}
        for r in spark.sql("SELECT * FROM sdcw").collect():
            latest[(r["window"]["start"], r["grp"])] = r["Value_distinct"]
        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        exact = {
            (r["win"]["start"], r["grp"]): r["n"]
            for r in batch.groupBy(
                FF.window("ts", "1 hour").alias("win"), "grp"
            ).agg(FF.countDistinct("Value").alias("n")).collect()
        }
        assert set(latest) == set(exact)
        for k, n in exact.items():
            assert latest[k] == pytest.approx(n, rel=0.05)

    def test_window_requires_on(self, spark, source_dir):
        from pandas_weights_spark.streaming import (
            streaming_distinct_counts,
        )

        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        with pytest.raises(ValueError, match="on="):
            streaming_distinct_counts(
                batch, ["Value"], keys=["grp"], window="1 hour"
            )


class TestStreamingNeardup:
    @pytest.mark.slow
    def test_cross_batch_candidate_surfaces(self, spark, tmp_path):
        from pandas_weights_spark.streaming import (
            streaming_neardup_candidates,
        )

        schema = "doc_id long, text string"
        base = "the quick brown fox jumps over the lazy dog tonight again"
        rows1 = [
            (1, base),
            (2, "completely different content about spark engines here"),
        ]
        rows2 = [
            (3, base.replace("quick", "quick")),  # exact dup of 1
            (4, " ".join(base.split()[1:])),      # near dup of 1
            (5, "unrelated zebra quantum lattice overture text"),
        ]
        d = tmp_path / "nd_src"
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
            str(d / "p1")
        )
        spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
            str(d / "p2")
        )
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(d))
        )
        out = streaming_neardup_candidates(
            stream, "text", "doc_id", min_est_jaccard=0.3,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("nd_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        pairs = {
            (r["id_new"], r["id_old"])
            for r in spark.sql("SELECT * FROM nd_stream").collect()
        }
        # batch-2 docs must pair against the batch-1 original
        assert ("3", "1") in pairs
        assert ("4", "1") in pairs or ("4", "3") in pairs
        assert all("5" != a for a, _ in pairs)
        ests = {
            (r["id_new"], r["id_old"]): r["est_jaccard"]
            for r in spark.sql("SELECT * FROM nd_stream").collect()
        }
        assert ests[("3", "1")] == 1.0  # exact dup: all minhashes match

    @pytest.mark.slow
    def test_capacity_evicts_oldest(self, spark, tmp_path):
        from pandas_weights_spark.streaming import (
            streaming_neardup_candidates,
        )

        # identical text -> same buckets; capacity 2 keeps only the 2
        # most recent, so doc 9 pairs with {7, 8} but never 6
        schema = "doc_id long, text string"
        txt = "alpha beta gamma delta epsilon zeta eta theta iota"
        d = tmp_path / "cap_src"
        spark.createDataFrame(
            [(6, txt), (7, txt), (8, txt)], schema
        ).coalesce(1).write.parquet(str(d / "p1"))
        spark.createDataFrame([(9, txt)], schema).coalesce(1).write.parquet(
            str(d / "p2")
        )
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(d))
        )
        out = streaming_neardup_candidates(
            stream, "text", "doc_id", per_bucket_capacity=2,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("nd_cap")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        partners = {
            r["id_old"]
            for r in spark.sql(
                "SELECT * FROM nd_cap WHERE id_new = '9'"
            ).collect()
        }
        assert partners == {"7", "8"}


class TestStreamingSemdedup:
    CENTS = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]

    def _run(self, spark, tmp_path, batches, name, **kw):
        from pandas_weights_spark.streaming import (
            streaming_semdedup_candidates,
        )

        schema = "doc_id long, embedding array<double>"
        d = tmp_path / f"{name}_src"
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(d / f"p{i}")
            )
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(d))
        )
        out = streaming_semdedup_candidates(
            stream, "embedding", "doc_id", self.CENTS, **kw
        )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.sql(f"SELECT * FROM {name}").collect()

    @pytest.mark.slow
    def test_cross_batch_dup_and_no_false_pairs(self, spark, tmp_path):
        rows1 = [
            (1, [1.0, 0.05, 0.0, 0.0]),    # cell 0
            (2, [1.0, -0.4, 0.0, 0.0]),    # cell 0, far from 1
            (5, [0.0, 1.0, 0.1, 0.0]),     # cell 1
            (9, [0.0, 0.0, 0.0, 0.0]),     # zero norm: skipped
        ]
        rows2 = [
            (3, [1.0, 0.06, 0.0, 0.0]),    # semantic dup of 1 (cell 0)
            (6, [0.0, 1.0, 0.11, 0.0]),    # semantic dup of 5 (cell 1)
        ]
        got = self._run(spark, tmp_path, [rows1, rows2], "sdd1",
                        threshold=0.95)
        pairs = {(r["id_new"], r["id_old"]) for r in got}
        assert ("3", "1") in pairs  # cross-batch, same cell
        assert ("6", "5") in pairs  # a different cell's own pair
        # doc 2 is in cell 0 but cos(1,2) ~ 0.72 < 0.95: no false pair
        assert ("3", "2") not in pairs and ("2", "1") not in pairs
        # cross-cell ids never pair; zero-norm id never appears
        assert all({a, b} <= {"1", "3"} or {a, b} <= {"5", "6"}
                   for a, b in pairs)
        cos = {(r["id_new"], r["id_old"]): r["cos"] for r in got}
        import numpy as np
        u = lambda v: np.asarray(v) / np.linalg.norm(v)  # noqa: E731
        exp = round(float(np.dot(u([1.0, 0.06, 0, 0]),
                                 u([1.0, 0.05, 0, 0]))), 6)
        assert cos[("3", "1")] == exp
        cells = {r["cell"] for r in got}
        assert cells == {0, 1}

    @pytest.mark.slow
    def test_capacity_evicts_oldest(self, spark, tmp_path):
        v = [1.0, 0.01, 0.0, 0.0]
        rows1 = [(6, v), (7, v), (8, v)]
        rows2 = [(9, v)]
        got = self._run(spark, tmp_path, [rows1, rows2], "sdd2",
                        threshold=0.99, per_cell_capacity=2)
        partners = {r["id_old"] for r in got if r["id_new"] == "9"}
        assert partners == {"7", "8"}  # 6 evicted, state bound holds

    def test_guards(self, spark, tmp_path):
        from pandas_weights_spark.streaming import (
            streaming_semdedup_candidates,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0])], "doc_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="per_cell_capacity"):
            streaming_semdedup_candidates(
                df, "embedding", "doc_id", self.CENTS,
                per_cell_capacity=0,
            )
        with pytest.raises(ValueError, match="threshold"):
            streaming_semdedup_candidates(
                df, "embedding", "doc_id", self.CENTS, threshold=1.5
            )


class TestStreamingWeightQA:
    def test_diagnostics_exact_batch_parity(self, spark, source_dir):
        # r6 (VERDICT r5 item 8): the last emission per key must EQUAL
        # calibration.weight_diagnostics on the full data — the state
        # merge is associative moments, not an approximation
        from pandas_weights_spark.calibration import weight_diagnostics
        from pandas_weights_spark.streaming import (
            streaming_weight_diagnostics,
        )

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(source_dir))
        )
        out = streaming_weight_diagnostics(stream, "Value", keys=["grp"])
        q = (
            out.writeStream.format("memory")
            .queryName("swd")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        latest = {}
        for r in spark.sql("SELECT * FROM swd").collect():
            latest[r["grp"]] = r
        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        exp = {
            r["grp"]: r
            for r in weight_diagnostics(
                batch, "Value", by=["grp"]
            ).collect()
        }
        assert set(latest) == set(exp)
        for g in exp:
            for c in ("n", "sum_w", "n_eff", "deff", "cv_w",
                      "min_w", "max_w"):
                assert latest[g][c] == pytest.approx(
                    exp[g][c], rel=1e-12
                ), (g, c)

    def test_trim_params_match_batch_quantiles(self, spark, source_dir):
        # digest-estimated bounds/ratio vs the batch exact trimmer —
        # at these sizes the t-digest is near-exact
        import numpy as np

        from pandas_weights_spark.streaming import streaming_trim_params

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(source_dir))
        )
        out = streaming_trim_params(
            stream, "Value", keys=["grp"], upper_q=0.9, lower_q=0.1,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("stp")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        latest = {}
        for r in spark.sql("SELECT * FROM stp").collect():
            latest[r["grp"]] = r
        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        ).collect()
        by_g = {}
        for r in batch:
            v = r["Value"]
            if v is not None and v > 0:
                by_g.setdefault(r["grp"], []).append(float(v))
        assert set(latest) == set(by_g)
        for g, vals in by_g.items():
            w = np.array(sorted(vals))
            up_exact = float(np.quantile(w, 0.9))
            lo_exact = float(np.quantile(w, 0.1))
            row = latest[g]
            span = float(w.max() - w.min()) or 1.0
            assert abs(row["upper_bound"] - up_exact) / span < 0.1, g
            assert abs(row["lower_bound"] - lo_exact) / span < 0.1, g
            clip = np.clip(w, row["lower_bound"], row["upper_bound"])
            assert row["sum_w"] == pytest.approx(w.sum(), rel=1e-12)
            assert row["ratio"] == pytest.approx(
                w.sum() / clip.sum(), rel=0.05
            ), g
            # trim-and-redistribute: ratio restores total mass
            assert (clip * row["ratio"]).sum() == pytest.approx(
                w.sum(), rel=0.05
            )

    def test_requires_keys(self, spark, source_dir):
        from pandas_weights_spark.streaming import (
            streaming_trim_params,
            streaming_weight_diagnostics,
        )

        stream = spark.readStream.schema(SCHEMA).parquet(str(source_dir))
        with pytest.raises(ValueError, match="key"):
            streaming_weight_diagnostics(stream, "Value", keys=[])
        with pytest.raises(ValueError, match="key"):
            streaming_trim_params(stream, "Value", keys=[])
        with pytest.raises(ValueError, match="upper_q"):
            streaming_trim_params(
                stream, "Value", keys=["grp"], upper_q=1.5
            )


class TestStreamingBottomK:
    def test_exact_parity_with_batch_topk(self, spark, source_dir):
        # the deterministic reservoir: final per-key sample == the
        # batch bottom-k of the SAME md5 uniforms — exact, not
        # distributional
        from pandas_weights_spark.sample import uniform_hash
        from pandas_weights_spark.streaming import (
            streaming_bottom_k_sample,
        )

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(source_dir))
        )
        out = streaming_bottom_k_sample(
            stream, keys=["grp"], key_cols=["ts", "Value"], k=3
        )
        q = (
            out.writeStream.format("memory")
            .queryName("sbk")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        latest = {}
        for r in spark.sql("SELECT * FROM sbk").collect():
            latest[r["grp"]] = [
                (e["u"], e["id"]) for e in r["sample"]
            ]
        batch = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        u = uniform_hash([F.col("ts"), F.col("Value")], 42)
        ident = F.concat_ws(
            "|", F.col("ts").cast("string"), F.col("Value").cast("string")
        )
        rows = batch.select(
            "grp", u.alias("u"), ident.alias("id")
        ).collect()
        exp = {}
        for r in rows:
            exp.setdefault(r["grp"], []).append((r["u"], r["id"]))
        for g in exp:
            exp[g] = sorted(exp[g])[:3]
        assert set(latest) == set(exp)
        for g in exp:
            assert latest[g] == exp[g], g

    def test_state_bounded_at_k(self, spark, source_dir):
        from pandas_weights_spark.streaming import (
            streaming_bottom_k_sample,
        )

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(source_dir))
        )
        out = streaming_bottom_k_sample(
            stream, keys=["grp"], key_cols=["ts", "Value"], k=2
        )
        q = (
            out.writeStream.format("memory")
            .queryName("sbk2")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM sbk2").collect()
        assert rows and all(len(r["sample"]) <= 2 for r in rows)

    def test_guards(self, spark, source_dir):
        from pandas_weights_spark.streaming import (
            streaming_bottom_k_sample,
        )

        batch = spark.read.option(
            "recursiveFileLookup", "true"
        ).parquet(str(source_dir))
        with pytest.raises(ValueError, match="k must"):
            streaming_bottom_k_sample(
                batch, keys=["grp"], key_cols=["ts"], k=0
            )
        with pytest.raises(ValueError, match="key"):
            streaming_bottom_k_sample(
                batch, keys=[], key_cols=["ts"], k=2
            )


class TestStreamingSelectionPipeline:
    """r6 selection surface on streams: URL hygiene is stateless
    (runs unchanged); DSIR scoring against a PRE-TRAINED ratio table
    is a stream-static broadcast join + per-doc agg over the stream's
    own rows — the score-as-you-ingest shape (train on yesterday's
    corpus, score today's stream)."""

    def test_url_hygiene_matches_batch(self, spark, tmp_path):
        from pandas_weights_spark.functions.text import (
            canonicalize_url,
            domain_suffixes,
            url_domain,
        )

        rows = [
            (1, "HTTP://A.Example.COM:80/x?utm_source=s&q=1#f"),
            (2, "https://b.example.com:9443/y"),
            (3, None),
        ]
        d = str(tmp_path / "urls")
        spark.createDataFrame(rows, "doc_id long, url string").write.parquet(d)

        def pipeline(df):
            c = canonicalize_url(F.col("url"))
            return df.select(
                "doc_id",
                c.alias("curl"),
                url_domain(c).alias("host"),
                domain_suffixes(url_domain(c)).alias("sfx"),
            )

        batch = {
            r["doc_id"]: r
            for r in pipeline(spark.read.parquet(d)).collect()
        }
        stream = spark.readStream.schema("doc_id long, url string").parquet(d)
        q = (
            pipeline(stream)
            .writeStream.format("memory").queryName("urlpipe")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r
            for r in spark.sql("SELECT * FROM urlpipe").collect()
        }
        assert got.keys() == batch.keys()
        for k in batch:
            assert got[k] == batch[k]

    def test_dsir_scoring_matches_batch(self, spark, tmp_path):
        from pandas_weights_spark.functions.classifier import (
            hashed_token_features,
        )
        from pandas_weights_spark.functions.dsir import (
            dsir_bucket_counts,
            dsir_log_ratio,
        )

        tgt = spark.createDataFrame(
            [(0, "good clean prose about hills"),
             (1, "clean prose about rivers")],
            "doc_id long, text string",
        )
        rows = [
            (10, "clean prose about hills"),
            (11, "spam spam click here now"),
            (12, None),
        ]
        d = str(tmp_path / "sdocs")
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(d)
        raw = spark.read.parquet(d)
        nb = 128
        lr = dsir_log_ratio(
            dsir_bucket_counts(tgt, "text", n_buckets=nb),
            dsir_bucket_counts(raw, "text", n_buckets=nb),
            nb,
        ).localCheckpoint(eager=True)  # the pre-trained model table

        def score(df):
            # stream-side: explode features -> broadcast ratio join ->
            # ONE per-doc agg (streams reject chained stateful aggs,
            # so the per-(doc,bucket) pre-agg stays a batch-only
            # optimization); availableNow + complete emits each doc
            ex = df.select(
                "doc_id",
                F.explode(
                    hashed_token_features(F.col("text"), n_features=nb)
                ).alias("bucket"),
            )
            return (
                ex.join(F.broadcast(lr), "bucket", "left")
                .groupBy("doc_id")
                .agg(
                    F.round(
                        F.sum(
                            F.coalesce(F.col("log_ratio"), F.lit(0.0))
                        ),
                        9,
                    ).alias("lw")
                )
            )

        batch = {r["doc_id"]: r["lw"] for r in score(raw).collect()}
        stream = spark.readStream.schema("doc_id long, text string").parquet(d)
        q = (
            score(stream)
            .writeStream.format("memory").queryName("dsirpipe")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r["lw"]
            for r in spark.sql("SELECT * FROM dsirpipe").collect()
        }
        assert got == batch
        assert got[10] > got[11]  # target-like beats spam on the stream


class TestStreamingContainerReaders:
    """r8: the container record readers (WARC, JSONL) are mapInPandas /
    Column chains, so they compose with readStream unchanged —
    availableNow over shard files must equal the batch parse."""

    def _shard_dir(self, spark, tmp_path_factory, kind):
        from pandas_weights_spark.sources.jsonl import to_jsonl_shards
        from pandas_weights_spark.sources.warc import (
            to_warc_shards,
            warc_record,
        )

        rows = [
            (i, f"https://s.io/{i}", f"stream body {i}")
            for i in range(24)
        ]
        df = spark.createDataFrame(rows, "doc_id long, uri string, text string")
        if kind == "warc":
            rec = warc_record(
                F.col("uri"), F.lit("2026-01-01T00:00:00Z"),
                F.encode(F.col("text"), "UTF-8"), "response",
            )
            shards = to_warc_shards(
                df.select(rec.alias("r")), "r", n_shards=3,
                gzip_records=True,
            )
        else:
            shards = to_jsonl_shards(
                df, ["doc_id", "uri", "text"], n_shards=3,
                gzip_shard=True,
            )
        d = tmp_path_factory.mktemp(f"{kind}_shards")
        shards.write.parquet(str(d), mode="overwrite")
        return d, {r[1]: r[2] for r in rows}, shards.schema

    def test_warc_stream_equals_batch(self, spark, tmp_path_factory):
        from pandas_weights_spark.sources.warc import from_warc_shards

        d, orig, schema = self._shard_dir(spark, tmp_path_factory, "warc")
        stream = spark.readStream.schema(schema).parquet(str(d))
        out = from_warc_shards(stream).select(
            "target_uri", F.decode("http_body", "UTF-8").alias("t")
        )
        q = (
            out.writeStream.format("memory")
            .queryName("warc_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["target_uri"]: r["t"]
            for r in spark.sql("SELECT * FROM warc_stream").collect()
        }
        assert got == orig

    def test_jsonl_stream_equals_batch(self, spark, tmp_path_factory):
        from pandas_weights_spark.sources.jsonl import from_jsonl_shards

        d, orig, schema = self._shard_dir(spark, tmp_path_factory, "jsonl")
        stream = spark.readStream.schema(schema).parquet(str(d))
        out = from_jsonl_shards(
            stream, "doc_id long, uri string, text string"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("jsonl_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["uri"]: r["text"]
            for r in spark.sql("SELECT * FROM jsonl_stream").collect()
        }
        assert got == orig


class TestStreamingCharsetDecode:
    """r10: decode_http_body is an Arrow-batched pandas UDF over
    per-record columns, so it composes with readStream unchanged —
    availableNow over WARC shards with a non-UTF-8 page must equal
    the batch transcode."""

    def test_charset_decode_stream_equals_batch(
        self, spark, tmp_path_factory
    ):
        from pandas_weights_spark.sources.warc import (
            decode_http_body,
            from_warc_shards,
            to_warc_shards,
            warc_record,
        )

        rows = [
            (0, "https://s.io/sjis", "日本語ページ", "Shift_JIS",
             "shift_jis"),
            (1, "https://s.io/w1252", "café naïve", "windows-1252",
             "cp1252"),
            (2, "https://s.io/utf8", "plain page", "utf-8", "utf-8"),
        ]
        df = spark.createDataFrame(
            [
                (u, bytearray(t.encode(codec)),
                 f"text/html; charset={label}")
                for _, u, t, label, codec in rows
            ],
            ["uri", "payload", "ct"],
        )
        rec = warc_record(
            F.col("uri"), F.lit("2026-01-01T00:00:00Z"),
            F.col("payload"), "response", content_type=F.col("ct"),
        )
        shards = to_warc_shards(
            df.select(rec.alias("r")), "r", n_shards=2,
            gzip_records=True,
        )
        d = tmp_path_factory.mktemp("charset_shards")
        shards.write.parquet(str(d), mode="overwrite")

        def pipe(frame):
            recs = from_warc_shards(frame)
            dd = decode_http_body(
                F.col("http_body"), F.col("http_headers")
            )
            return recs.select(
                "target_uri", dd["charset"].alias("cs"),
                dd["text"].alias("t"),
            )

        batch = {
            r["target_uri"]: (r["cs"], r["t"])
            for r in pipe(spark.read.parquet(str(d))).collect()
        }
        stream = spark.readStream.schema(
            "shard int, n_records long, warc binary"
        ).parquet(str(d))
        q = (
            pipe(stream)
            .writeStream.format("memory").queryName("cs_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {
            r["target_uri"]: (r["cs"], r["t"])
            for r in spark.sql("SELECT * FROM cs_stream").collect()
        }
        assert got == batch
        assert got["https://s.io/sjis"] == ("shift_jis", "日本語ページ")
        assert got["https://s.io/w1252"] == ("cp1252", "café naïve")
