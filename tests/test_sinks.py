"""Write-path helpers: layout contracts (directory structure, file counts,
bucketed-join shuffle elimination) rather than golden values."""

import os

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.sources.sinks import (
    write_bucketed,
    write_partitioned,
    write_sorted,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("part"),
        (F.col("id") * 2.0).alias("val"),
    )


def parquet_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    return out


class TestWritePartitioned:
    def test_layout_and_file_count(self, spark, df, tmp_path):
        path = str(tmp_path / "p1")
        write_partitioned(df, path, ["part"], files_per_partition=1)
        dirs = sorted(d for d in os.listdir(path) if d.startswith("part="))
        assert dirs == ["part=0", "part=1", "part=2", "part=3"]
        for d in dirs:
            assert len(parquet_files(os.path.join(path, d))) == 1
        back = spark.read.parquet(path)
        assert back.count() == 1000
        assert back.where("part = '2'").count() == 250

    def test_files_per_partition_salting(self, spark, df, tmp_path):
        path = str(tmp_path / "p2")
        write_partitioned(df, path, ["part"], files_per_partition=3)
        for d in os.listdir(path):
            if d.startswith("part="):
                n = len(parquet_files(os.path.join(path, d)))
                assert 1 <= n <= 3
        assert spark.read.parquet(path).count() == 1000
        assert "__salt__" not in spark.read.parquet(path).columns


@pytest.fixture()
def clean_tables(spark):
    import shutil

    names = ["t_bucket_a", "t_bucket_b", "t_bucket_c"]

    def clean():
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(os.path.join(wh, n), ignore_errors=True)

    clean()
    yield
    clean()


class TestWriteBucketed:
    def test_bucketed_join_has_no_shuffle(self, spark, df, clean_tables):
        write_bucketed(df, "t_bucket_a", ["id"], 4, sort_by=["id"])
        write_bucketed(
            df.select("id", (F.col("val") * 3).alias("v2")),
            "t_bucket_b",
            ["id"],
            4,
        )
        # disable broadcast so the planner actually faces a shuffle
        # decision (tiny test tables would otherwise broadcast)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.table("t_bucket_a")
            b = spark.table("t_bucket_b")
            joined = a.join(b, "id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan, plan
            assert "Bucketed: true" in plan, plan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_bucketed_agg_has_no_shuffle(self, spark, df, clean_tables):
        write_bucketed(df, "t_bucket_c", ["id"], 4)
        plan = (
            spark.table("t_bucket_c")
            .groupBy("id")
            .agg(F.sum("val"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" not in plan, plan


class TestWriteSorted:
    def test_files_cover_disjoint_ranges(self, spark, df, tmp_path):
        path = str(tmp_path / "s1")
        write_sorted(df, path, ["id"])
        import pyarrow.parquet as pq

        ranges = []
        for f in parquet_files(path):
            t = pq.read_table(f, columns=["id"])
            if t.num_rows:
                ids = t.column("id").to_pylist()
                ranges.append((min(ids), max(ids)))
        ranges.sort()
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi < lo  # disjoint, ordered key ranges
        assert spark.read.parquet(path).count() == 1000


class TestWriteShuffled:
    """r13: deterministic keyed global shuffle for training output."""

    def test_deterministic_across_writes(self, spark, df, tmp_path):
        from pandas_weights_spark.sources.sinks import write_shuffled

        import pyarrow.parquet as pq

        a, b = str(tmp_path / "sh1"), str(tmp_path / "sh2")
        write_shuffled(df, a, "id", seed=7, n_files=4)
        write_shuffled(df, b, "id", seed=7, n_files=4)

        def stream(path):
            out = []
            for f in sorted(parquet_files(path)):
                out.extend(
                    pq.read_table(f, columns=["id"]).column("id")
                    .to_pylist()
                )
            return out

        sa, sb = stream(a), stream(b)
        # byte-identical permutation across independent writes
        assert sa == sb and len(sa) == 1000
        # it IS a permutation, and not the identity order
        assert sorted(sa) == list(range(1000)) and sa != sorted(sa)

    def test_seed_changes_permutation(self, spark, df, tmp_path):
        from pandas_weights_spark.sources.sinks import write_shuffled

        import pyarrow.parquet as pq

        a, b = str(tmp_path / "sh3"), str(tmp_path / "sh4")
        write_shuffled(df, a, "id", seed=1, n_files=4)
        write_shuffled(df, b, "id", seed=2, n_files=4)

        def stream(path):
            out = []
            for f in sorted(parquet_files(path)):
                out.extend(
                    pq.read_table(f, columns=["id"]).column("id")
                    .to_pylist()
                )
            return out

        assert stream(a) != stream(b)

    def test_matches_hash_order_exactly(self, spark, df, tmp_path):
        # the written stream order equals sort-by-xxhash64(key, seed)
        from pandas_weights_spark.sources.sinks import write_shuffled

        import pyarrow.parquet as pq

        path = str(tmp_path / "sh5")
        write_shuffled(df, path, "id", seed=7, n_files=4)
        out = []
        for f in sorted(parquet_files(path)):
            out.extend(
                pq.read_table(f, columns=["id"]).column("id")
                .to_pylist()
            )
        want = [
            r["id"]
            for r in df.select("id")
            .orderBy(F.xxhash64(F.col("id"), F.lit(7)), "id")
            .collect()
        ]
        assert out == want

    def test_exact_files_pins_per_file_contents(self, spark, df, tmp_path):
        # r14 (ADVICE r13): exact_files=True pins each FILE's contents
        # (the range mode only pins the concatenated stream — its
        # sampled bounds can shift boundary rows between files)
        from pandas_weights_spark.sources.sinks import write_shuffled

        import pyarrow.parquet as pq

        a, b = str(tmp_path / "ex1"), str(tmp_path / "ex2")
        write_shuffled(df, a, "id", seed=7, n_files=4, exact_files=True)
        write_shuffled(df, b, "id", seed=7, n_files=4, exact_files=True)

        def per_file(path):
            return [
                pq.read_table(f, columns=["id"]).column("id").to_pylist()
                for f in sorted(parquet_files(path))
            ]

        fa, fb = per_file(a), per_file(b)
        assert fa == fb and len(fa) == 4
        assert all(f for f in fa)  # every numbered file non-empty
        # the whole stream is still a permutation, ordered by
        # (bucket, hash) — deterministic, seeded, non-identity
        flat = [x for f in fa for x in f]
        assert sorted(flat) == list(range(1000)) and flat != sorted(flat)
        # file assignment IS pmod(xxhash64(id, seed), n_files)
        want = {}
        for r in df.select(
            "id",
            F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(4))
            .alias("b"),
        ).collect():
            want.setdefault(r["b"], set()).add(r["id"])
        got = {i: set(f) for i, f in enumerate(fa)}
        assert got == {int(k): set(v) for k, v in want.items()}

    def test_exact_files_no_global_sort(self, spark, df):
        # the exact mode must stay a hash repartition + local sort —
        # no sampling range exchange, no single-task global sort
        from pandas_weights_spark.sources.sinks import (
            _identity_partition_reps,
        )

        reps = _identity_partition_reps(spark, 16)
        assert len(reps) == 16
        got = [
            r["p"]
            for r in spark.createDataFrame(
                [(v,) for v in reps], "v int"
            )
            .select(F.pmod(F.hash(F.col("v")), F.lit(16)).alias("p"))
            .collect()
        ]
        assert got == list(range(16))
