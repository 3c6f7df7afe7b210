"""Scale smoke: run the core operator families on a SYNTHESIZED corpus
10-100x larger than sf0.1 to observe real shuffle/aggregate behavior
(the sf0.1 bench is fixed-overhead-dominated at ~1 s/query).

Data is generated distributed via spark.range — nothing is written to
disk. Not part of the driver gates; a dev tool for perf iteration.

Usage: python tools/scale_smoke.py [rows_millions=20]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    rows_m = float(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = int(rows_m * 1_000_000)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-smoke")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandas_weights_spark import wt
    from pandas_weights_spark.corr import spearman_corr
    from pandas_weights_spark.sample import stratified_sample, weighted_sample

    # synthetic lineitem-ish table: 20M+ rows, 200 groups, skewed key
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % 200).alias("g"),
            # hot: 30% of rows land on group 0
            F.when(F.pmod(F.col("id"), 10) < 3, F.lit(0))
            .otherwise(F.col("id") % 200)
            .alias("hot_g"),
            (F.sin(F.col("id").cast("double")) * 1000 + 5000).alias("x"),
            (F.pmod(F.col("id"), 7).cast("double") + 1).alias("w"),
        )
    )
    wdf = wt(df, "w")

    def bench(name, thunk):
        t0 = time.perf_counter()
        thunk().write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"{name:28s} {dt:7.2f}s  ({n / dt / 1e6:6.1f} M rows/s)")

    # warm
    df.agg(F.count("*")).collect()

    bench("global mean", lambda: wdf.mean())
    bench("grouped agg_all(5)", lambda: wdf.groupby("g")[["x"]].agg_all(
        ["count", "sum", "mean", "var", "std"]))
    bench("grouped agg_all hot key", lambda: wdf.groupby("hot_g")[["x"]].agg_all(
        ["count", "sum", "mean", "var", "std"]))
    bench("salted agg_all hot key", lambda: wdf.groupby("hot_g")[["x"]]
          .agg_all_salted(["count", "sum", "mean", "var", "std"], 32))
    bench("grouped corr", lambda: wt(
        df.select("g", "x", (F.col("x") * 0.5 + F.col("id") % 13).alias("y"), "w"),
        "w").groupby("g").corr())
    bench("weighted quantile p50/p90", lambda: wdf.groupby("g")[["x"]]
          .quantile([0.5, 0.9]))
    bench("pps sample 10k", lambda: weighted_sample(
        df, F.col("w"), 10_000, ["id"]))
    bench("rolling mean w=100", lambda: wt(
        df.select("g", "id", "x", "w"), "w")
        .rolling(100, order_by=["id"], partition_by=["g"]).mean())

    # round-2 additions — the restructured low-cardinality-safe paths.
    # "3 groups" is the adversarial case: a window formulation would
    # funnel all n rows into 3 tasks; these must stay flat-ish vs the
    # 200-group variants above.
    df3 = df.withColumn("g3", F.pmod(F.col("id"), 3))
    wdf3 = wt(df3, "w")
    bench("zscore 3 groups", lambda: wdf3.groupby("g3")[["x"]].zscore())
    bench("mode 3 groups", lambda: wt(
        df3.select("g3", F.pmod(F.col("id"), 1000).alias("v"), "w"), "w")
        .groupby("g3")[["v"]].mode())
    bench("describe binned 3 groups", lambda: wdf3.groupby("g3")[["x"]]
          .describe(qs=[0.5], exact=False, lo=0.0, hi=10000.0, bins=4096))
    bench("stratified 1k x 3 strata", lambda: stratified_sample(
        df3, F.col("w"), 1000, ["g3"], ["id"]))
    bench("spearman 3 groups", lambda: spearman_corr(
        wt(df3.select("g3", "x",
                      (F.col("x") * 0.5 + F.col("id") % 13).alias("y"), "w"),
           "w"), "x", "y", by=["g3"]))

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
