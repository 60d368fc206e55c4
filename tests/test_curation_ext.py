"""Direct semantic + plan-shape tests for the round-5 curation operators
(operators/curation_ext.py). Value parity vs DuckDB is already covered by the
auto-parametrized tests/test_oracle_parity.py + test_types.py; these pin the
behaviors and plan shapes the oracles can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

import parallel_mapreduce_wordcounting_spark as engine
from parallel_mapreduce_wordcounting_spark.plans import explain_str

from .conftest import SF_DIR


def test_pii_scrub_removes_what_it_counts(spark):
    rows = engine.REGISTRY["text_pii_scrub"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # every doc got exactly the planted email+phone, both redacted
        assert r.n_emails >= 1 and r.n_phones >= 1
        assert "<EMAIL>" in r.scrubbed and "<PHONE>" in r.scrubbed
        assert "@example.com" not in r.scrubbed
        assert "+1-555-" not in r.scrubbed


def test_pii_scrub_is_shuffle_free(spark):
    p = explain_str(engine.REGISTRY["text_pii_scrub"].fn(spark, SF_DIR), "simple")
    assert "Exchange" not in p


def test_contamination_eval_docs_excluded_and_bounded(spark):
    rows = engine.REGISTRY["text_contamination"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.doc_id % 50 != 0  # eval slice never scored as training
        assert 0 <= r.n_contaminated <= r.n_grams
        assert 0.0 <= r.score <= 1.0


def test_repetition_bounds(spark):
    rows = engine.REGISTRY["text_repetition"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.top_bigram_frac <= 1.0
        assert 0.0 <= r.dup_word_frac < 1.0


def test_pack_sequences_conserves_tokens_and_bins_are_dense(spark):
    d = engine.load_table(spark, SF_DIR, "documents")
    total = d.select(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("t")
    ).collect()[0].t
    bins = engine.REGISTRY["pack_sequences"].fn(spark, SF_DIR).collect()
    assert sum(r.n_seq_tokens for r in bins) == total  # every token packed once
    ids = sorted(r.bin_id for r in bins)
    assert ids == list(range(ids[0], ids[-1] + 1))  # no empty bins in range


def test_pack_sequences_distributed_matches_window_form(spark):
    """The registered (two-pass prefix-sum) form must assign bin-for-bin
    identically to the single-window reference form, and the registered key
    must BE the distributed form (round-5 verdict item 3)."""
    from parallel_mapreduce_wordcounting_spark.operators.curation_ext import (
        pack_sequences_distributed,
        pack_sequences_global_window,
    )

    def canon(df):
        return sorted((r.bin_id, r.n_docs, r.n_seq_tokens) for r in df.collect())

    assert engine.REGISTRY["pack_sequences"].fn is pack_sequences_distributed
    window_form = pack_sequences_global_window(spark, SF_DIR)
    dist_form = engine.REGISTRY["pack_sequences"].fn(spark, SF_DIR)
    assert canon(window_form) == canon(dist_form)
    # and the registered form's data-sized window is bucket-parallel:
    # no single-partition exchange feeding a window over the full doc set
    p = explain_str(dist_form, "simple")
    assert "Exchange hashpartitioning(bucket" in p


def test_domain_mix_flattens_the_source_distribution(spark):
    d = engine.load_table(spark, SF_DIR, "documents")
    natural = {r.source: r.c for r in d.groupBy("source").agg(F.count("*").alias("c")).collect()}
    sample = engine.REGISTRY["sample_domain_mix"].fn(spark, SF_DIR).collect()
    got = {}
    for r in sample:
        got[r.source] = got.get(r.source, 0) + 1
    # temperature 0.5 compresses ratios: the sampled max/min ratio must be
    # strictly smaller than the natural one (quota ∝ sqrt(count))
    nat_ratio = max(natural.values()) / min(natural.values())
    got_ratio = max(got.values()) / min(got.values())
    assert set(got) == set(natural)  # every source represented
    assert got_ratio < nat_ratio or nat_ratio == 1.0


def test_dedup_incremental_semantics(spark):
    d = engine.load_table(spark, SF_DIR, "documents")
    kept = engine.REGISTRY["dedup_incremental"].fn(spark, SF_DIR)
    prior_keys = {
        r.k for r in d.where(F.col("doc_id") < 100).select(F.md5("text").alias("k")).collect()
    }
    rows = kept.collect()
    assert all(r.content_key not in prior_keys for r in rows)
    # and nothing eligible was dropped: kept == incoming minus prior-keyed
    incoming = d.where(F.col("doc_id") >= 100).select(
        "doc_id", F.md5("text").alias("k")
    ).collect()
    expect = {r.doc_id for r in incoming if r.k not in prior_keys}
    assert {r.doc_id for r in rows} == expect


def test_event_anomaly_zscores_standardized(spark):
    rows = engine.REGISTRY["event_anomaly"].fn(spark, SF_DIR).collect()
    assert len(rows) >= 2
    zs = [r.z for r in rows]
    # standardized: mean ≈ 0 (sample stddev normalization)
    assert abs(sum(zs) / len(zs)) < 1e-3


def test_domain_mix_temperature_is_honored(spark, tmp_path):
    """ADVICE r5: ``temperature`` was declared but ignored (weight hardcoded
    sqrt(n)), so any α silently returned the 0.5 mixture. On a skewed corpus
    α=1.0 (proportional) and α=0.5 (flattened) must allocate different
    quotas; each must equal the integer quota math computed independently
    here. The fixture's sources are uniform (quotas α-invariant there), so
    this runs on a synthetic skewed table."""
    import math

    from parallel_mapreduce_wordcounting_spark.operators.curation_ext import (
        sample_domain_mix,
    )

    counts = {"big": 160, "mid": 40, "small": 10}
    base = {"big": 0, "mid": 1000, "small": 2000}
    rows = [
        (base[src] + i, f"doc {base[src] + i}", "en", src, 10)
        for src, n in counts.items()
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    def quota(alpha: float) -> dict[str, int]:
        w = {s: math.floor(n**alpha * 1_000_000) for s, n in counts.items()}
        tw = sum(w.values())
        # a quota can exceed the source's size (flattening upsamples small
        # domains); the sample is then capped at every available doc
        return {s: min(counts[s], (200 * wv) // tw) for s, wv in w.items()}

    for alpha in (0.5, 1.0):
        sample = sample_domain_mix(spark, str(tmp_path), temperature=alpha).collect()
        got: dict[str, int] = {}
        for r in sample:
            got[r.source] = got.get(r.source, 0) + 1
        assert got == quota(alpha), f"alpha={alpha}"
    # and the two mixtures genuinely differ on a skewed corpus
    assert quota(0.5) != quota(1.0)


def test_event_anomaly_flat_volume_yields_null_z(spark, tmp_path):
    """ANSI-mode hardening (round-8 division sweep): perfectly flat daily
    volume makes sigma 0 — z must be NULL (the oracle's x/0), not a
    DIVIDE_BY_ZERO job abort."""
    import datetime

    rows = [
        (day * 10 + i, datetime.datetime(2024, 3, 1 + day, 12, 0, i), 1, "click", 1.0, "{}")
        for day in range(4)
        for i in range(5)  # exactly 5 events every day
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = engine.REGISTRY["event_anomaly"].fn(spark, str(tmp_path)).collect()
    assert len(got) == 4
    assert all(r["n_events"] == 5 and r["z"] is None for r in got)
