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


def test_event_sessionize_matches_duckdb(spark, duck):
    from parallel_mapreduce_wordcounting_spark.operators.staged import (
        EVENT_SESSIONIZE_ORACLE,
        event_sessionize,
    )

    got = sorted(map(tuple, event_sessionize(spark, SF).collect()))
    want = sorted(map(tuple, duck.execute(EVENT_SESSIONIZE_ORACLE).fetchall()))
    assert len(got) > 0
    assert got == want


def test_event_sessionize_sessions_respect_gap(spark):
    from parallel_mapreduce_wordcounting_spark.operators.staged import event_sessionize

    out = event_sessionize(spark, SF, gap_minutes=30).collect()
    # session ids are 1..k contiguous per user; sessions don't overlap in time
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.session_id)
        assert [r.session_id for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert b.start_us - a.end_us > 30 * 60 * 1_000_000


def test_agg_sketch_merge_is_exactly_mergeable(spark):
    """HLL register-max merging is commutative and idempotent, so the
    daily-sketches→union estimate must EQUAL the single-pass estimate, and
    sit within the standard HLL error of the exact distinct count."""
    from pyspark.sql import functions as F

    from parallel_mapreduce_wordcounting_spark.operators.staged import (
        agg_sketch_merge_estimates,
    )
    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table

    out = agg_sketch_merge_estimates(spark, SF).collect()
    merged = [r.est_users for r in out if r.day is None]
    assert len(merged) == 1

    e = load_table(spark, SF, "events")
    single = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est
    assert merged[0] == single  # merge-order independence, exact

    exact = e.select("user_id").distinct().count()
    assert abs(merged[0] - exact) <= max(3, 0.05 * exact)
    # per-day rows cover every day present in the fixture
    days = {r.day for r in out if r.day is not None}
    want_days = {
        r.d for r in e.select(F.date_trunc("day", "ts").alias("d")).distinct().collect()
    }
    assert days == want_days


def test_text_unigram_logprob_matches_duckdb(spark, duck):
    from parallel_mapreduce_wordcounting_spark.operators.staged import (
        TEXT_UNIGRAM_LOGPROB_ORACLE,
        text_unigram_logprob,
    )

    got = sorted(map(tuple, text_unigram_logprob(spark, SF).collect()))
    want = sorted(map(tuple, duck.execute(TEXT_UNIGRAM_LOGPROB_ORACLE).fetchall()))
    assert len(got) == 500  # every sf0.001 document scores
    assert got == want


def test_text_unigram_logprob_bounds(spark):
    from parallel_mapreduce_wordcounting_spark.operators.staged import (
        text_unigram_logprob,
    )

    rows = text_unigram_logprob(spark, SF).collect()
    # log-likelihoods are strictly negative; a 31-word vocab bounds the
    # worst case well above ln(1/total_tokens)
    assert all(r.avg_logprob < 0 for r in rows)
    assert all(r.avg_logprob > -20 for r in rows)
