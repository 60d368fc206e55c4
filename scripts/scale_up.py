#!/usr/bin/env python
"""Measured scale-up harness: replicate sf0.1 N-fold (default 10) with
consistent key offsets into spark-warehouse/scale_sfN/ (gitignored), then
time a set of operators at sf0.1 and at the replicated scale and print the
ratio table that backs SCALE.md's "measured ×10" section.

Replication keeps per-entity cardinalities realistic: every copy k offsets
the entity keys (doc_id, vec_id, event_id/user_id, orderkey/custkey/...)
by k·ceil(max+1), so joins stay key-correct, per-user/per-order group sizes
stay constant, and the duplicate/text distributions replicate exactly.

Usage:
    python scripts/scale_up.py [N] [key1 key2 ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"

# per-table key columns to offset per replica (column -> stride source col)
OFFSETS = {
    "region": [],
    "nation": [],
    "supplier": [],  # dimension tables: keep one copy (joins fan out naturally)
    "part": [],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_KEYS = [
    "tpch_q1",
    "tpch_q9",
    "tpch_q13",
    "event_funnel",
    "event_retention",
    "event_gap_stats",
    "stream_win_topk",
    "text_entropy",
    "text_bigram_pmi",
    "text_cooccur",
    "sim_centroid",
    "win_ntile",
    "agg_hist",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    keys = sys.argv[2:] or DEFAULT_KEYS

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("pmrwc-scaleup")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import parallel_mapreduce_wordcounting_spark as engine
    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table

    out_dir = os.path.join(REPO, "spark-warehouse", f"scale_sf{n}")
    if True:  # build any MISSING table (an interrupted/older build may be partial)
        os.makedirs(out_dir, exist_ok=True)
        for table, key_cols in OFFSETS.items():
            if os.path.isfile(f"{out_dir}/{table}.parquet/_SUCCESS"):
                continue
            df = load_table(spark, BASE, table)
            if not key_cols:
                df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
                continue
            strides = {
                c: int(df.agg(F.max(c)).collect()[0][0]) + 1 for c in key_cols
            }
            copies = []
            for k in range(n):
                c = df
                for col, stride in strides.items():
                    c = c.withColumn(col, F.col(col) + F.lit(k * stride))
                copies.append(c)
            merged = copies[0]
            for c in copies[1:]:
                merged = merged.unionByName(c)
            merged.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
            print(f"replicated {table} x{n}", file=sys.stderr)

    from parallel_mapreduce_wordcounting_spark.operators import staged_modules

    def resolve(key: str):
        if key.startswith("staged:"):
            # discovered, not hand-listed (ADVICE r7): every staged_rN.py
            # on disk is searchable with no edit here
            name = key.split(":", 1)[1]
            for mod in staged_modules():
                if hasattr(mod, name):
                    return getattr(mod, name)
            raise KeyError(name)
        return engine.REGISTRY[key].fn

    def timed(key: str, sf_dir: str) -> float:
        fn = resolve(key)
        fn(spark, sf_dir).collect()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        return statistics.median(runs)

    print(f"| operator | sf0.1 | sf≈{n}×0.1 | ratio |")
    print("|---|---|---|---|")
    for key in keys:
        t_small = timed(key, BASE)
        t_big = timed(key, out_dir)
        print(f"| {key} | {t_small:.2f}s | {t_big:.2f}s | {t_big / t_small:.1f}× |")

    spark.stop()


if __name__ == "__main__":
    main()
