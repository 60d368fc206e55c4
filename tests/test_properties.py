"""Property-based tests (hypothesis) over the engine's core invariants,
using tiny in-memory corpora rather than the fixtures — these pin the
*algebra* of the operators (SURVEY.md §5.3 item 2)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=5), min_size=0, max_size=30
)


def _wc(spark, docs: list[list[str]]):
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    toks = df.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    return toks.groupBy("word").agg(F.count("*").alias("cnt"))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(WORDS, min_size=1, max_size=5))
def test_wordcount_total_is_token_count(spark, docs):
    """Σ counts == number of tokens, for any corpus."""
    rows = _wc(spark, docs).collect()
    assert sum(r.cnt for r in rows) == sum(len(ws) for ws in docs)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(WORDS, min_size=1, max_size=5))
def test_wordcount_rdd_dataframe_agree(spark, docs):
    """The RDD reduceByKey formulation and the DataFrame groupBy agree."""
    from operator import add

    df_counts = {(r.word, r.cnt) for r in _wc(spark, docs).collect()}
    rdd_counts = set(
        spark.sparkContext.parallelize([" ".join(ws) for ws in docs])
        .flatMap(lambda t: t.lower().split(" "))
        .filter(lambda w: w != "")
        .map(lambda w: (w, 1))
        .reduceByKey(add)
        .collect()
    )
    assert df_counts == rdd_counts


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(alphabet="abc ", min_size=0, max_size=20), min_size=1, max_size=8))
def test_dedup_exact_idempotent(spark, texts):
    """dedup(dedup(x)) == dedup(x): one row per distinct text, keeper stable."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = df.groupBy("text").agg(F.min("doc_id").alias("keep_doc_id"))
    again = once.groupBy("text").agg(F.min("keep_doc_id").alias("keep_doc_id"))
    assert sorted(once.collect()) == sorted(again.collect())
    assert once.count() == len(set(texts))


def test_results_invariant_to_shuffle_partition_count(spark):
    """The README/SCALE.md exactness claim, enforced: float-sensitive keys
    (fixed-point money sums, exact-int averages, rounded divisions) return
    the identical row multiset at shuffle.partitions 3 and 200 — i.e. no
    result depends on summation order / parallelism."""
    import parallel_mapreduce_wordcounting_spark as engine

    from .conftest import SF_DIR

    KEYS = ["agg_basic", "tpch_q1", "tpch_q10", "text_entropy",
            "event_gap_stats", "sim_centroid", "subq_scalar",
            "tpch_q2", "tpch_q11",  # q2: unit-price cents min; q11: cents>frac-of-total cut
            # round-5 keys whose determinism is load-bearing: global-order
            # packing bins, integer-quota mixing, windowed SCD versions,
            # z-scores from a float mean/stddev, rounded contamination scores
            "pack_sequences", "sample_domain_mix", "scd2_build",
            "event_anomaly", "text_contamination",
            # round-6 keys whose determinism is load-bearing: float MSE sums
            # (quantize), iterative float trajectories (kmeans, pagerank),
            # corpus-count thresholds (dedup_lines), fingerprint windows
            # (rag index), money sums through a salted/plain join path
            "sim_quantize_int8", "sim_kmeans", "graph_pagerank",
            "dedup_lines", "pipeline_rag_index", "mm_blob_stats",
            # round-6 second wave: percentile-threshold bucketing (rfm),
            # rounded-ln ranking keys (weighted sample), ignore-nulls
            # window attribution cents, heap top-k over summed pair counts
            "event_rfm", "sample_weighted", "event_attribution",
            "text_bpe_pairs",
            # third wave: hash-u threshold comparisons (bootstrap), sketch
            # min-estimates (countmin), rounded cohort conversion rates
            "sample_bootstrap", "agg_countmin", "event_funnel_windowed",
            # round-7: max_by struct race across partials (cdc), histogram
            # narrowing over partition-split scans (iterative quantiles),
            # rounded-tfidf rank keys (keywords)
            "cdc_apply", "agg_percentile_iterative", "text_keywords",
            # PQ: driver-side hashed-sample codebook fit + per-batch argmin
            # encode must not see partitioning at all
            "sim_pq",
            # round-7 registered wave: the bucketed distributed prefix-sum
            # statistics are EXACTLY where a partitioning bug would hide
            # (bucket-local windows + offset broadcasts must compose to the
            # single-window spec at any parallelism), plus the fold-based
            # Markov iterate and the md5-fingerprint pigeonhole
            "stat_ks_test", "stat_mann_whitney", "event_markov_stationary",
            "dedup_simhash_pairs", "agg_gini", "event_cohort_ltv"]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n in ("3", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in KEYS:
                rows = sorted(map(tuple, engine.REGISTRY[k].fn(spark, SF_DIR).collect()))
                results.setdefault(k, []).append(rows)
        for k, (a, b) in results.items():
            assert a == b, f"{k} differs between 3 and 200 shuffle partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_staged_waves_invariant_to_shuffle_partition_count(spark):
    """Same enforcement for the order-sensitive STAGED ops (waves 14–17)
    before their registration round: log-space tail sums over the
    lf-table window (fisher), exact decimal inequality decisions across
    partial aggregations (permutation test), rank fusion over rounded
    scores (rrf, retrieval eval), fingerprint window minima (winnow),
    iterated float entropies (purity, perplexity), rank-window
    checkpoints (heaps), microcent pseudo-value sums across the 1-row
    totals broadcast (jackknife), lag-spine running Ljung–Box sums
    (autocorr), and double windowed medians (hampel)."""
    from parallel_mapreduce_wordcounting_spark.operators import (
        staged_r14,
        staged_r15,
        staged_r16,
        staged_r17,
        staged_r18,
        staged_r19,
        staged_r20,
        staged_r21,
        staged_r22,
        staged_r23,
        staged_r24,
        staged_r25,
        staged_r26,
        staged_r27,
        staged_r28,
        staged_r29,
        staged_r30,
        staged_r31,
        staged_r32,
        staged_r33,
        staged_r34,
        staged_r35,
        staged_r36,
        staged_r37,
        staged_r38,
        staged_r39,
        staged_r40,
        staged_r41,
    )

    from .conftest import SF_DIR

    FNS = [
        staged_r14.text_bm25,
        staged_r14.sim_rrf_hybrid,
        staged_r15.stat_fisher_exact,
        staged_r15.sim_retrieval_eval,
        staged_r15.dedup_winnow,
        staged_r15.sim_cluster_purity,
        staged_r16.stat_permutation_test,
        staged_r16.stat_log_odds,
        staged_r17.event_markov_perplexity,
        staged_r17.text_heaps_law,
        staged_r18.stat_jackknife,
        staged_r18.stat_autocorr,
        staged_r18.win_hampel,
        staged_r19.sim_silhouette,
        staged_r19.pipeline_filter_funnel,
        staged_r20.dedup_capture_recapture,
        staged_r20.text_burrows_delta,
        staged_r20.graph_local_clustering,
        staged_r21.stat_naive_bayes,
        staged_r21.stat_decision_stump,
        staged_r21.event_cusum_alarm,
        staged_r22.graph_kcore,
        staged_r22.stat_mixture_em,
        staged_r22.pipeline_active_learning,
        staged_r23.sim_dbscan,
        staged_r23.dq_mahalanobis,
        staged_r24.event_ab_sprt,
        staged_r24.text_hash_embed,
        staged_r25.stat_isotonic,
        staged_r25.graph_label_prop,
        staged_r26.win_rolling_corr,
        staged_r26.dedup_cross_lingual,
        staged_r27.sql_pivot,
        staged_r27.event_attribution_shapley,
        staged_r28.stat_wilcoxon,
        staged_r28.event_user_lifecycle,
        staged_r29.stat_cochran_armitage,
        staged_r29.event_window_sweep,
        staged_r30.stat_median_ci,
        staged_r30.warehouse_incremental_stats,
        staged_r31.stat_fit_compare,
        staged_r31.event_intraday_profile,
        staged_r32.text_source_template,
        staged_r32.join_null_safe,
        staged_r33.stat_dispersion,
        staged_r33.scan_fixed_width,
        staged_r34.stat_paired_ttest,
        staged_r34.event_conversion_lag_hist,
        staged_r35.dq_key_uniqueness,
        staged_r35.agg_weighted_median,
        staged_r36.set_except_all,
        staged_r36.stat_kruskal_wallis,
        staged_r37.dq_join_cardinality,
        staged_r37.agg_abc_analysis,
        staged_r38.stat_mantel_haenszel,
        staged_r38.stat_regression_to_mean,
        staged_r39.agg_ratio_pitfall,
        staged_r39.dq_id_continuity,
        staged_r40.split_time_holdout,
        staged_r40.win_group_zscore,
        staged_r41.fn_minmax_scale,
        staged_r41.event_repeat_rate,
    ]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n in ("3", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for fn in FNS:
                rows = sorted(map(tuple, fn(spark, SF_DIR).collect()))
                results.setdefault(fn.__name__, []).append(rows)
        for k, (a, b) in results.items():
            assert a == b, f"{k} differs between 3 and 200 shuffle partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),        # user_id
            st.integers(min_value=0, max_value=10_000),   # minutes offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_sessionize_partitions_stream_with_bounded_gaps(spark, events):
    """For ANY event stream: sessions partition each user's events exactly,
    every between-session gap exceeds the threshold, and every session's
    span is consistent with its event count (within-session consecutive
    gaps ≤ threshold ⇒ span ≤ (n−1)·gap)."""
    from parallel_mapreduce_wordcounting_spark.operators.staged import (
        sessionize_events,
    )

    GAP_MIN = 30
    gap_us = GAP_MIN * 60 * 1_000_000
    rows = [
        (user, i, minutes * 60 * 1_000_000)
        for i, (user, minutes) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_us long")
    out = sessionize_events(df, gap_minutes=GAP_MIN).collect()

    assert sum(r.n_events for r in out) == len(rows)  # exact partition
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r.session_id)
        assert [r.session_id for r in sess] == list(range(1, len(sess) + 1))
        for s in sess:
            assert s.start_us <= s.end_us
            assert s.end_us - s.start_us <= (s.n_events - 1) * gap_us
        for a, b in zip(sess, sess[1:]):
            assert b.start_us - a.end_us > gap_us


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
def test_zorder_interleave_is_bijective(x, y):
    """The Morton interleave must be invertible (even bits -> x, odd -> y)
    and monotone in each argument with the other fixed at 0 — the
    properties that make z-ranges meaningful boxes. Checked against a pure
    Python mirror of the Spark/DuckDB expression."""
    z = 0
    for i in range(16):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    xr = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    yr = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (xr, yr) == (x, y)


def test_zorder_spark_matches_python_mirror(spark):
    """The registered operator's zval equals the pure-Python mirror on real
    fixture rows — pinning that the 64-term column expression implements
    the same interleave the property test verified."""
    import parallel_mapreduce_wordcounting_spark as engine
    from tests.conftest import SF_DIR

    out = {r.o_orderkey: r.zval for r in engine.REGISTRY["layout_zorder"].fn(spark, SF_DIR).collect()}
    orders = engine.load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", F.datediff("o_orderdate", F.lit("1970-01-01")).alias("day")
    ).collect()
    for r in orders[:200]:
        x, y = r.o_custkey & 65535, r.day & 65535
        z = 0
        for i in range(16):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        assert out[r.o_orderkey] == z


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(WORDS, min_size=1, max_size=5), st.integers(min_value=2, max_value=6))
def test_span_hashes_count_and_content(spark, docs, k):
    """The shared shingle helper emits exactly max(0, len-k+1) spans per
    document for ANY corpus and window size — including documents shorter
    than k, which used to crash (round-8 review): they must contribute
    zero rows, not an error. Hashes are md5 of the literal k-token join."""
    import hashlib

    from parallel_mapreduce_wordcounting_spark.operators.staged_r9 import _span_hashes

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = [(r["doc_id"], r["h"]) for r in _span_hashes(df, k).collect()]
    want = []
    for i, ws in enumerate(docs):
        # split(" ") on an empty text yields [""]: mirror the operator's
        # tokenization exactly
        toks = " ".join(ws).split(" ")
        for s in range(max(0, len(toks) - k + 1)):
            joined = " ".join(toks[s : s + k])
            want.append((i, hashlib.md5(joined.encode()).hexdigest()))
    assert sorted(got) == sorted(want)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.sampled_from(["a", "b", "ab", "c"]), min_size=1, max_size=10),
    st.sampled_from([("a", "b"), ("a", "a"), ("ab", "c")]),
)
def test_bpe_merge_fold_matches_python_reference(spark, syms, pair):
    """The staged_r10 BPE merge fold (SQL aggregate over the symbol array)
    must match the reference left-to-right non-overlapping merge for ANY
    symbol sequence — including repeated symbols (a,a), merges whose text
    equals an existing symbol ('ab'), and merge-at-boundary cases."""
    from pyspark.sql import functions as F

    a, b = pair
    merged = a + b

    def reference(seq):
        out = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return out

    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(
        F.expr(
            "aggregate(slice(syms, 2, size(syms) - 1), array(syms[0]), "
            f"(acc, x) -> IF(element_at(acc, -1) = '{a}' AND x = '{b}', "
            f"concat(slice(acc, 1, size(acc) - 1), array('{merged}')), "
            "concat(acc, array(x))))"
        ).alias("m")
    ).collect()[0].m
    assert got == reference(syms)
