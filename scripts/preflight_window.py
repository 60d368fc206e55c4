#!/usr/bin/env python
"""Pre-flight replica of the driver's t2 gate over the CURRENT verification
window: runs the first ``DRIVER_WINDOW`` keys of ``queries()`` at sf0.01 and
compares each against its oracle the way the driver does — columns sorted by
NAME, rows sorted with pandas (this is where unhashable array columns crash:
the r04 mm_embed / r06 sim_quantize_int8 failures), then value-compared.

Run before a round ends so a would-be red verdict is caught while there is
still time to fix it: python scripts/preflight_window.py [n_keys]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("PMRWC_PREFLIGHT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_sort(df):
    """Driver-shaped canonicalization: columns sorted by name, rows sorted
    with pandas — the row sort is where unhashable cells crash (array
    columns; the r04 mm_embed / r06 sim_quantize_int8 failures), which is
    exactly what this pre-flight exists to catch. Returns the SORTED frame
    (the pre-r8 version discarded the sort_values result, so the positional
    compare below never saw driver order — ADVICE r7 item 2)."""
    df = df[sorted(df.columns)]
    if len(df):
        # NO exception handling here: a sort_values crash (unhashable array
        # cell, mixed-type object column) is precisely the driver
        # canonicalizer crash this tool exists to predict — swallowing it
        # would pass a key the driver will red (r8 review finding). The
        # caller's per-key except records it as FAIL.
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df


def _norm(v):
    """Value normalization matching tests/conftest._norm (floats to 9 dp,
    temporal to isoformat, containers recursively)."""
    import math
    from datetime import date, datetime

    if isinstance(v, float):
        if math.isnan(v):
            # toPandas() coerces Spark SQL NULL in double columns to NaN,
            # while duckdb fetchall keeps Python None — normalize both to
            # None so the compare matches the engines, not pandas coercion
            return None
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def main() -> int:
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else None

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pmrwc-preflight")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import parallel_mapreduce_wordcounting_spark as engine
    from parallel_mapreduce_wordcounting_spark.registry import DRIVER_WINDOW

    qs, osql = engine.queries(), engine.oracle_sql()
    window = list(qs)[: (n_keys or DRIVER_WINDOW)]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    from collections import Counter

    failures: list[str] = []
    for key in window:
        try:
            sdf = qs[key](spark, SF).toPandas()
            sdf = _canon_sort(sdf)  # the canonicalizer crash check (array columns)
            if key not in osql:
                if not len(sdf):
                    # a 0-row rows-only verdict attests nothing and the
                    # rotation now treats it as a failure (registry r8 fix)
                    raise AssertionError("rows-only with 0 rows (non-attesting)")
                print(f"  {key}: rows-only ({len(sdf)} rows)")
                continue
            res = con.execute(osql[key])
            d_cols = [c[0] for c in res.description]
            ddf = _canon_sort(pd.DataFrame(res.fetchall(), columns=d_cols))
            if sorted(sdf.columns) != sorted(d_cols):
                raise AssertionError(
                    f"schema: {sorted(sdf.columns)} vs {sorted(d_cols)}"
                )
            if len(sdf) != len(ddf):
                raise AssertionError(f"rows: {len(sdf)} vs {len(ddf)}")
            cols = sorted(sdf.columns)
            s_rows = [
                tuple(_norm(v) for v in row)
                for row in sdf[cols].itertuples(index=False, name=None)
            ]
            d_rows = [
                tuple(_norm(v) for v in row)
                for row in ddf[cols].itertuples(index=False, name=None)
            ]
            # driver-shaped POSITIONAL compare after the raw-value sort
            # (ADVICE r7: the Counter-only compare under-replicated the gate
            # — a tie-order mismatch in the positional compare passed here
            # and could still red the driver)
            if s_rows == d_rows:
                print(f"  {key}: OK ({len(sdf)} rows)")
            elif Counter(s_rows) == Counter(d_rows):
                # same multiset, different positional order: the driver's
                # verdict depends on its tolerance absorbing the tie-order
                # noise — flag as a risk, not a clean pass
                failures.append(key)
                print(f"  {key}: TIE-ORDER RISK (multiset equal, order differs)")
            else:
                s_set, d_set = Counter(s_rows), Counter(d_rows)
                only_s = list((s_set - d_set).items())[:2]
                only_d = list((d_set - s_set).items())[:2]
                raise AssertionError(f"values: spark-only={only_s} duck-only={only_d}")
        except Exception as ex:  # noqa: BLE001 — report and continue
            failures.append(key)
            print(f"  {key}: FAIL {type(ex).__name__}: {str(ex)[:160]}")

    print(f"preflight: {len(window) - len(failures)}/{len(window)} clean at {SF}")
    if failures:
        print("FAILURES:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
