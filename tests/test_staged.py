"""Round-4-staged operators (operators/staged.py): implemented and
DuckDB-verified now, registered next round when the driver's verification
window rotates (same staging pattern as tpch_q20)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_mapreduce_wordcounting_spark.operators.staged import (
    JOIN_SALTED_ORACLE,
    SAMPLE_STRATIFIED_ORACLE,
    join_salted,
    sample_stratified,
)

SF = "/root/testdata/sf0.001"


def test_sample_stratified_matches_duckdb(spark, duck):
    got = sorted(map(tuple, sample_stratified(spark, SF).collect()))
    want = sorted(map(tuple, duck.execute(SAMPLE_STRATIFIED_ORACLE).fetchall()))
    assert len(got) > 0
    assert got == want


def test_sample_stratified_quota_per_stratum(spark):
    out = sample_stratified(spark, SF, n_per_stratum=7)
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per and all(n <= 7 for n in per.values())
    # full-size strata hit the quota exactly
    totals = {
        r.lang: r.n
        for r in sample_stratified(spark, SF, n_per_stratum=10**9)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in per.items():
        assert n == min(7, totals[lang])


def test_join_salted_matches_unsalted_oracle(spark, duck):
    got = sorted(map(tuple, join_salted(spark, SF).collect()))
    want = sorted(map(tuple, duck.execute(JOIN_SALTED_ORACLE).fetchall()))
    assert len(got) > 0
    assert got == want


def test_join_salted_result_invariant_to_salt_width(spark):
    a = sorted(map(tuple, join_salted(spark, SF, n_salt=2).collect()))
    b = sorted(map(tuple, join_salted(spark, SF, n_salt=16).collect()))
    assert a == b
