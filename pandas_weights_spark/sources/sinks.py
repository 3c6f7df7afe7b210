"""Sinks — the write path for pipeline outputs at scale.

The reference has no I/O layer (SURVEY.md §2.6); these helpers encode the
layout decisions that matter at 100 TB, where a naive ``df.write`` produces
either millions of tiny files (one per shuffle partition per partition-key
value) or a handful of giant ones:

* ``write_partitioned`` — hive-style partition directories with a bounded
  file count per partition: rows are repartitioned on the partition keys
  (plus a salt when one key value is huge) *before* the write, so each
  output directory gets ``files_per_partition`` parquet files regardless
  of the upstream shuffle layout.
* ``write_bucketed`` — persists a table bucketed+sorted on a join key via
  ``saveAsTable``; later equi-joins/aggregations on that key skip the
  shuffle entirely (Spark reads bucket files co-located).
* ``write_sorted`` — global order + max-records-per-file, for downstream
  consumers that range-prune (parquet min/max statistics make predicate
  pushdown effective only when files are key-clustered).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "write_partitioned",
    "write_bucketed",
    "write_sorted",
    "write_shuffled",
    "zorder_value",
    "write_zordered",
]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write hive-partitioned output with a controlled file count.

    ``repartition(partition cols [, salt])`` aligns the shuffle layout
    with the directory layout: every task holds rows of exactly one
    (or ``1/files_per_partition``-th of one) partition value, so each
    directory receives exactly ``files_per_partition`` files instead of
    ``shuffle.partitions`` fragments.
    """
    cols = [F.col(c) for c in partition_by]
    if files_per_partition > 1:
        salt = (F.rand(seed=0) * files_per_partition).cast("int")
        out = df.repartition(*cols, salt.alias("__salt__"))
    else:
        out = df.repartition(*cols)
    (
        out.write.mode(mode)
        .format(format)
        .partitionBy(*partition_by)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    A join or aggregation between two tables bucketed the same way on
    the same key runs shuffle-free — the single biggest win available
    for repeated large-scale joins (e.g. lineitem ⋈ orders every run).
    """
    writer = (
        df.write.mode(mode)
        .format(format)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_by: Sequence[str],
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Globally range-sorted output for min/max-pruning consumers.

    ``repartitionByRange`` + ``sortWithinPartitions`` gives a total
    order across files without a single-task global sort; each parquet
    file then covers a narrow key range, so downstream filters on the
    sort key skip whole files from footer statistics alone.
    """
    out = df.repartitionByRange(*[F.col(c) for c in sort_by]).sortWithinPartitions(
        *sort_by
    )
    writer = out.write.mode(mode).format(format)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def _identity_partition_reps(spark, n: int) -> "list[int]":
    """For each residue ``f`` in 0..n−1, a small int ``v_f`` with
    ``pmod(murmur3(v_f), n) == f`` — the values that make
    ``repartition(n, col)``'s hash partitioning an IDENTITY on bucket
    ids (partition f receives exactly bucket f). Found by one tiny
    Spark job hashing 0..64·n−1 (murmur3 is a fixed function, so the
    mapping is stable across sessions/versions by the same contract
    that makes ``F.hash`` usable in persisted layouts). Driver
    ingest is ``64·n`` two-int rows — ~5 MB even at an absurd
    n_files = 10⁵; real file counts are 10²–10⁴."""
    limit = 64 * n
    rows = (
        spark.range(limit)
        .select(
            F.col("id").cast("int").alias("v"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("f"),
        )
        .collect()
    )
    reps: "dict[int, int]" = {}
    for r in rows:
        if r["f"] not in reps:
            reps[r["f"]] = r["v"]
    if len(reps) != n:
        # astronomically unlikely at 64 candidates per residue; loud
        raise RuntimeError(
            f"could not find hash representatives for all {n} files "
            f"within {limit} candidates"
        )
    return [reps[f] for f in range(n)]


def write_shuffled(
    df: DataFrame,
    path: str,
    key: str,
    seed: int = 0,
    n_files: int = 64,
    mode: str = "overwrite",
    format: str = "parquet",
    exact_files: bool = False,
) -> None:
    """DETERMINISTIC global shuffle for training-data output — the
    "shuffle once at write time, stream sequentially at train time"
    layout every epoch loader wants: a training job reading files
    0..N-1 in order sees examples in seeded-random order without any
    runtime shuffle buffer, and two runs of this writer produce the
    same CONCATENATED file-ordered stream.

    With the default ``exact_files=False`` the per-FILE assignment is
    NOT pinned across runs: ``repartitionByRange`` computes its range
    bounds by sampling with an RDD-id-derived seed, so rows near a
    boundary can land in the adjacent file in another session —
    consume the files as an ordered stream (which is all an epoch
    loader does). ``exact_files=True`` (r14, ADVICE r13) pins the
    files too: each row's file is ``pmod(xxhash64(key, seed),
    n_files)`` — byte-deterministic file CONTENTS across runs and
    sessions, at the cost of one tiny driver job that picks, per
    file id, an int representative whose murmur3 hash-partition IS
    that file (``repartition(n, col)`` routes by ``pmod(hash(col),
    n)``; the representatives make that an identity on bucket ids,
    so every bucket lands alone in its own numbered file). The
    concatenated stream is then ordered by ``(file bucket, hash)`` —
    a different (still seeded-deterministic) permutation than the
    range mode's pure hash order.

    Order is ``xxhash64(key, seed)``: a keyed hash, NOT ``rand()`` —
    re-running the job, retrying a failed stage, or regenerating a
    lost partition reproduces the same permutation (``rand()`` with a
    seed is only deterministic per-partition-layout, which a retry
    can change). Rows land range-partitioned on the hash
    (``repartitionByRange`` + ``sortWithinPartitions`` — no
    single-task global sort), ``n_files`` output files via the
    sampled range split (or the exact bucket map above). Ties (hash
    collisions) are broken by ``key`` so the total order is unique.
    Different ``seed`` → an independent permutation for the next
    epoch/run.
    """
    h = F.xxhash64(F.col(key), F.lit(int(seed)))
    if exact_files:
        reps = _identity_partition_reps(df.sparkSession, int(n_files))
        bucket = F.pmod(h, F.lit(int(n_files)))
        rep = F.element_at(
            F.array(*[F.lit(int(v)) for v in reps]),
            bucket.cast("int") + F.lit(1),
        )
        out = (
            df.withColumn("__shuf__", h)
            .withColumn("__pw_f__", rep)
            .repartition(int(n_files), F.col("__pw_f__"))
            .sortWithinPartitions("__shuf__", key)
            .drop("__shuf__", "__pw_f__")
        )
    else:
        out = (
            df.withColumn("__shuf__", h)
            .repartitionByRange(int(n_files), F.col("__shuf__"))
            .sortWithinPartitions("__shuf__", key)
            .drop("__shuf__")
        )
    out.write.mode(mode).format(format).save(path)


def zorder_value(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> "tuple[DataFrame, str]":
    """Attach a Morton (Z-order) key column interleaving the bits of
    each column's uniform bucket id — returns ``(df_with_key,
    key_column_name)``.

    Buckets come from ``width_bucket`` over each column's [min, max]
    (ONE tiny aggregate for all columns, inlined as literals); the
    interleave is plain integer arithmetic in codegen. NULLs sort
    first (bucket 0)."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    if bits * len(cols) > 63:
        # interleaving past bit 63 of the long would wrap into the sign
        # bit and silently scramble the Morton order (ADVICE r4)
        raise ValueError(
            f"bits * len(cols) = {bits * len(cols)} exceeds 63 — lower "
            f"bits to at most {63 // len(cols)} for {len(cols)} columns"
        )
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"lo_{c}"), F.max(v).alias(f"hi_{c}")]
    rng = df.agg(*aggs).first()
    n = 1 << bits
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        lo, hi = rng[f"lo_{c}"], rng[f"hi_{c}"]
        v = F.col(c).cast("double")
        if lo is None or not (hi > lo):
            b = F.lit(0).cast("long")
        else:
            # width_bucket: 1..n inside, 0/n+1 outside; shift to 0..n-1
            b = F.coalesce(
                F.greatest(
                    F.lit(0).cast("long"),
                    F.least(
                        F.lit(n - 1).cast("long"),
                        (
                            F.width_bucket(
                                v, F.lit(float(lo)), F.lit(float(hi)), F.lit(n)
                            )
                            - F.lit(1)
                        ).cast("long"),
                    ),
                ),
                F.lit(0).cast("long"),
            )
        for bit in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                bit * len(cols) + d,
            ).cast("long")
    name = "__pw_zorder__"
    return df.withColumn(name, z), name


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    num_files: Optional[int] = None,
    max_records_per_file: Optional[int] = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Multi-dimensional file clustering: range-partition + sort on a
    Morton key over ``cols`` so parquet footer min/max statistics prune
    files for range predicates on ANY of the clustered columns — the
    multi-column generalization of :func:`write_sorted` (Delta/Iceberg
    OPTIMIZE ZORDER, in plain Spark).

    The Z key is dropped before writing; cost is one tiny min/max
    aggregate + one range exchange."""
    keyed, name = zorder_value(df, cols, bits=bits)
    parts = [F.col(name)]
    out = (
        keyed.repartitionByRange(num_files, *parts)
        if num_files
        else keyed.repartitionByRange(*parts)
    )
    out = out.sortWithinPartitions(name).drop(name)
    writer = out.write.mode(mode).format(format)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)
