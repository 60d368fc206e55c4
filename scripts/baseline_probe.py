#!/usr/bin/env python
"""Re-measure the STOCK-Spark baseline (BASELINE.md's five survey probes) on
the CURRENT sandbox, so engine-vs-baseline ratios can be read same-environment
each round (the round-6/7 sandboxes measured ~1.5-1.7x slower than the round-1
box that produced BASELINE.md's absolute numbers — see SCALE.md calibration).

Identical method and config to the survey probe: stock DataFrame forms, no
broadcast hints, no fixed-point tricks, local[8], shuffle.partitions=16,
nanosAsLong for events, median of 3 after one warm-up, collect() included.

Run: python scripts/baseline_probe.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line: {"probe": {...}, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("stock-baseline-probe")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Reads are (re)built INSIDE each probed function so every timed run
    # pays scan setup exactly like the engine's registered keys do in
    # bench.py — pre-building DataFrames outside the loop was measured to
    # flatter the stock side by ~50-70 ms/query.
    def docs():
        return spark.read.parquet(f"{sf}/documents.parquet")

    def li():
        return spark.read.parquet(f"{sf}/lineitem.parquet")

    def events():
        # the survey-era sandbox surfaced ts as ns-longs (hence
        # nanosAsLong); the round-4+ sandboxes surface TIMESTAMP_NTZ —
        # normalize either, the same two branches sources/loader.py carries
        e = spark.read.parquet(f"{sf}/events.parquet")
        if dict(e.dtypes)["ts"] == "bigint":
            return e.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        return e.withColumn("ts", F.col("ts").cast("timestamp"))

    def wc_topk():
        return (
            docs().select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word")
            .count()
            .orderBy(F.desc("count"), "word")
            .limit(10)
        )

    # same OUTPUT columns as the registered keys, naive stock style (float
    # sums rounded at the end instead of exact integer cents, no hints)
    def join_star():
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        nation = spark.read.parquet(f"{sf}/nation.parquet")
        return (
            li()
            .join(orders, F.col("l_orderkey") == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(nation, cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
                F.count("*").alias("n_lines"),
            )
        )

    def agg_basic():
        return (
            li().where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                F.count("*").alias("count_order"),
            )
        )

    def stream_tumbling():
        return (
            events().groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 6).alias("avg_value"))
            .select(F.col("window.start").alias("w_start"), "event_type", "cnt", "avg_value")
        )

    def sim_topk_cosine():
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        a = emb.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("ea"))
        b = emb.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("eb"))
        pairs = a.join(b, F.col("ida") < F.col("idb"))
        dot = F.aggregate(
            F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return pairs.select("ida", "idb", dot.alias("cosine")).orderBy(
            F.desc("cosine"), "ida", "idb"
        ).limit(20)

    probes = {
        "wc_topk": wc_topk,
        "join_star": join_star,
        "agg_basic": agg_basic,
        "stream_tumbling": stream_tumbling,
        "sim_topk_cosine": sim_topk_cosine,
    }
    out = {}
    for name, fn in probes.items():
        fn().collect()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().collect()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 3)
        print(f"{name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"probe": out, "sf_dir": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
