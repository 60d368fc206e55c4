#!/usr/bin/env python
"""Driver-shaped pre-flight for STAGED (not-yet-registered) waves: run every
``DEV_CASES`` entry of the named waves at sf0.01 through the same
canonicalize-and-compare the driver's t2 gate applies to registered keys —
columns sorted by name, pandas row sort (where unhashable array columns
crash: the r04 mm_embed / r06 sim_quantize_int8 failure class), value
normalization, positional compare.

The per-wave pytest files already compare fn vs DuckDB, but through the
test-suite's own canonicalizer; THIS tool replicates the gate's semantics,
so a wave that passes here will not red on registration-round verdicts for
canonicalizer reasons. Round-8 provenance: the whole r14–r21 wave was
validated with exactly this loop before its registration round.

Usage:
    python scripts/preflight_staged.py staged_r22 staged_r23 ...
    python scripts/preflight_staged.py            # every staged wave >= r14
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from preflight_window import SF, TABLES, _canon_sort, _norm  # noqa: E402


def main() -> int:
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    from parallel_mapreduce_wordcounting_spark.operators import staged_modules

    want = set(sys.argv[1:])
    known = {
        m.__name__.rsplit(".", 1)[-1] for m in staged_modules()
    }
    unknown = want - known
    if unknown:
        # a misspelled wave name previously skipped silently and the run
        # printed "0/0 clean" — a passing preflight in which nothing ran
        print(f"preflight_staged: unknown wave name(s): {sorted(unknown)}")
        print(f"  known waves: {sorted(known)}")
        return 2
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pmrwc-preflight-staged")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    import parallel_mapreduce_wordcounting_spark as engine

    n_checked = 0
    failures: list[str] = []
    for mod in staged_modules():
        wave = mod.__name__.rsplit(".", 1)[-1]
        if want and wave not in want:
            continue
        if not want and int(re.search(r"\d+", wave).group()) < 14:
            continue  # default: only the unregistered backlog
        for case in getattr(mod, "DEV_CASES", []):
            key, fn = case[0], case[1]
            oracle = case[2] if len(case) > 2 else None
            if key in engine.REGISTRY:
                continue  # already registered: preflight_window covers it
            n_checked += 1
            try:
                sdf = _canon_sort(fn(spark, SF).toPandas())
                if oracle is None:
                    # a 0-row rows-only verdict attests nothing (registry r8)
                    assert len(sdf), "rows-only with 0 rows (non-attesting)"
                    print(f"  {key}: rows-only OK ({len(sdf)} rows)")
                    continue
                res = con.execute(oracle)
                d_cols = [c[0] for c in res.description]
                ddf = _canon_sort(pd.DataFrame(res.fetchall(), columns=d_cols))
                assert sorted(sdf.columns) == sorted(d_cols), (
                    f"schema: {sorted(sdf.columns)} vs {sorted(d_cols)}"
                )
                assert len(sdf) == len(ddf), f"rows: {len(sdf)} vs {len(ddf)}"
                cols = sorted(sdf.columns)
                # positional compare after the pandas sort, exactly like
                # preflight_window (a Python sorted() over the normalized
                # tuples crashes comparing None against a value — e.g.
                # sim_dbscan's NULL cluster_id on noise rows — and the gate
                # never does that sort)
                s_rows = [
                    tuple(_norm(v) for v in row)
                    for row in sdf[cols].itertuples(index=False, name=None)
                ]
                d_rows = [
                    tuple(_norm(v) for v in row)
                    for row in ddf[cols].itertuples(index=False, name=None)
                ]
                if s_rows == d_rows:
                    print(f"  {key}: OK ({len(sdf)} rows)")
                    continue
                from collections import Counter

                if Counter(s_rows) == Counter(d_rows):
                    raise AssertionError(
                        "TIE-ORDER RISK (multiset equal, order differs)"
                    )
                raise AssertionError("value mismatch after canonicalize")
            except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
                failures.append(f"{wave}:{key}: {e}")
                print(f"  {key}: FAIL {str(e)[:160]}")
    spark.stop()
    if failures:
        print(f"preflight_staged: {len(failures)}/{n_checked} FAILED")
        for f in failures:
            print(" ", f)
        return 1
    if n_checked == 0:
        # nothing matched (e.g. every named wave is already registered):
        # exiting 0 here would read as a passing preflight in which
        # nothing ran
        print("preflight_staged: 0 cases checked — nothing matched the filter")
        return 2
    print(f"preflight_staged: {n_checked}/{n_checked} clean at {SF}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
