"""CLI entry point — the reference repo's user surface, Spark-first.

The reference is a parallel word-count program you point at text files; this
module reproduces that UX on the engine, plus access to every registered
operator:

    # the reference's own job: count words in raw text file(s)
    python -m parallel_mapreduce_wordcounting_spark wordcount /path/to/*.txt --top 10

    # run any registered operator against a fixture scale factor
    python -m parallel_mapreduce_wordcounting_spark run wc_topk --sf-dir /root/testdata/sf0.001

    # list the operator inventory / show a physical plan
    python -m parallel_mapreduce_wordcounting_spark list
    python -m parallel_mapreduce_wordcounting_spark run join_star --explain
"""

from __future__ import annotations

import argparse
import sys


def _session(cpus: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pmrwc-cli")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="parallel_mapreduce_wordcounting_spark")
    parser.add_argument("--cpus", default="*", help="local[N] parallelism (default: all)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    wc = sub.add_parser("wordcount", help="count words in raw text files (the reference's job)")
    wc.add_argument("paths", nargs="+", help="text file(s) or glob(s)")
    wc.add_argument("--top", type=int, default=10, help="show top-K words (0 = all)")

    run = sub.add_parser("run", help="run a registered operator")
    run.add_argument("key", help="operator key (see `list`)")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    run.add_argument("--limit", type=int, default=20, help="rows to show")
    run.add_argument("--explain", action="store_true", help="print the physical plan instead")

    sql = sub.add_parser("sql", help="run ad-hoc SQL against the fixture tables")
    sql.add_argument("query", help="SQL text; tables: region nation customer supplier "
                     "part orders lineitem events documents embeddings")
    sql.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sql.add_argument("--limit", type=int, default=20, help="rows to show")

    sub.add_parser("list", help="list the operator inventory")

    rpt = sub.add_parser(
        "report",
        help="one-row corpus health report (docs, dup rate, length, "
        "language share, source-mix entropy) — the composed "
        "training-data-pipeline demo",
    )
    rpt.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    rpt.add_argument(
        "--dedup",
        action="store_true",
        help="also print the dedup-detector comparison row (exact / "
        "Jaccard / MinHash / SimHash / embedding / spans)",
    )

    args = parser.parse_args(argv)

    import parallel_mapreduce_wordcounting_spark as engine

    if args.cmd == "list":
        for key, spec in sorted(engine.REGISTRY.items()):
            oracle = "sql-oracled" if spec.oracle else "rows-only"
            print(f"{key:28s} tier={spec.tier} {oracle}")
        return 0

    spark = _session(args.cpus)
    try:
        if args.cmd == "wordcount":
            from pyspark.sql import functions as F

            lines = spark.read.text(list(args.paths))
            counts = (
                lines.select(
                    F.explode(F.split(F.lower(F.col("value")), r"\s+")).alias("word")
                )
                .where(F.col("word") != "")
                .groupBy("word")
                .agg(F.count("*").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("word"))
            )
            if args.top:
                counts = counts.limit(args.top)
            for row in counts.collect():
                print(f"{row.word}\t{row.cnt}")
            return 0

        if args.cmd == "report":
            row = engine.REGISTRY["pipeline_corpus_report"].fn(
                spark, args.sf_dir
            ).collect()[0]
            width = max(len(c) for c in row.asDict())
            print(f"corpus health @ {args.sf_dir}")
            for col, val in row.asDict().items():
                print(f"  {col:<{width}}  {val}")
            if args.dedup:
                from .operators.staged_r10 import pipeline_dedup_report

                drow = pipeline_dedup_report(spark, args.sf_dir).collect()[0]
                dwidth = max(len(c) for c in drow.asDict())
                print("dedup detectors")
                for col, val in drow.asDict().items():
                    print(f"  {col:<{dwidth}}  {val}")
            return 0

        if args.cmd == "sql":
            from parallel_mapreduce_wordcounting_spark.sources.loader import register_views

            register_views(spark, args.sf_dir)
            spark.sql(args.query).show(args.limit, truncate=False)
            return 0

        spec = engine.REGISTRY.get(args.key)
        if spec is None:
            print(f"unknown key {args.key!r}; see `list`", file=sys.stderr)
            return 2
        df = spec.fn(spark, args.sf_dir)
        if args.explain:
            from .plans import explain_str

            print(explain_str(df))
        else:
            df.show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
