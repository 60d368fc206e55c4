#!/usr/bin/env python
"""Driver-style t2 dress rehearsal — run this BEFORE ending a round.

Replicates the driver's verify as faithfully as possible, including the
conditions pytest can't: a fresh process, an arbitrary working directory
(run it from /tmp — this catches worker-import/pickling bugs), a session
with default configs (200 shuffle partitions), and full value comparison of
every `queries()` key against its `oracle_sql()` via DuckDB at sf0.01.

Usage:
    cd /tmp && python /root/repo/scripts/dress_rehearsal.py [sf_dir]

Exits 0 on full pass, 1 with a failure list otherwise.
"""

from __future__ import annotations

import os
import sys
from collections import Counter
from datetime import date, datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()  # deliberately default shuffle partitions etc.
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    t1 = entry_mod.entry(spark).collect()
    print(f"t1 entry: {len(t1)} rows {'PASS' if t1 else 'FAIL'}")

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    fails: list[tuple[str, str]] = []
    for k, fn in qs.items():
        try:
            sdf = fn(spark, sf)
            if k not in osql:
                assert sdf.count() >= 0
                continue
            cols = sorted(sdf.columns)
            s = Counter(tuple(_norm(r[c]) for c in cols) for r in sdf.collect())
            res = con.execute(osql[k])
            dcols = [d[0] for d in res.description]
            order = [dcols.index(c) for c in cols]
            d = Counter(tuple(_norm(row[i]) for i in order) for row in res.fetchall())
            if s != d:
                only_s = list((s - d).items())[:2]
                only_d = list((d - s).items())[:2]
                fails.append((k, f"value mismatch spark={only_s} duck={only_d}"))
        except Exception as e:  # noqa: BLE001 - report every failure mode
            fails.append((k, str(e).splitlines()[0][:100]))

    print(f"t2: {len(qs)} queries, {len(osql)} oracles, cwd={os.getcwd()}")
    if fails:
        for k, msg in fails:
            print(f"FAIL {k}: {msg}")
        return 1
    print("ALL PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
