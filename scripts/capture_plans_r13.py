#!/usr/bin/env python
"""Capture .explain("formatted") for the round-13 optimization targets.

Writes plans/r13/<key>_<tag>.txt for every key named on the command line
(default: the bench set + census heavies). Usage:
    python scripts/capture_plans_r13.py before [key ...]
    python scripts/capture_plans_r13.py after  [key ...]
Config mirrors bench.py (local[$SPARK_GRAFT_CPUS], 32 shuffle partitions,
AQE on) so the captured initial plans match what the bench executes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_KEYS = [
    # bench.py BENCH_KEYS
    "wc_topk",
    "join_star",
    "agg_basic",
    "stream_tumbling",
    "sim_topk_cosine",
    "sim_topk_blocked",
    "dedup_fuzzy_minhash",
    "tpch_q1",
    "tpch_q9",
    "dedup_lines",
    "pipeline_rag_index",
    "cdc_apply",
    "agg_percentile_iterative",
    "pipeline_sft_pack",
    "stat_ks_test",
    "graph_triangle_stats",
    "pipeline_split_leakage",
    "dedup_containment",
    "sim_maxsim",
    # census heavies (TIMING_CENSUS_r13.json tail)
    "graph_pagerank",
    "pipeline_dedup_report",
    "sim_dbscan",
    "dedup_eval_simhash",
    "dedup_ngram_jaccard",
    "graph_bfs_frontier",
    "dedup_capture_recapture",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pmrwc-plan-capture")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import parallel_mapreduce_wordcounting_spark as engine
    from parallel_mapreduce_wordcounting_spark.plans import explain_str

    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    for key in keys:
        spark.sparkContext.setJobDescription(f"plan-capture: {key}")
        try:
            df = engine.REGISTRY[key].fn(spark, sf_dir)
            plan = explain_str(df, "formatted")
        except Exception as exc:  # capture the failure rather than abort the sweep
            plan = f"EXPLAIN FAILED: {exc!r}"
        path = os.path.join(outdir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
