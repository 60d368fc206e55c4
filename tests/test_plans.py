"""Physical-plan shape assertions — the 100 TB design claims, checked against
the plans Catalyst actually produces (SURVEY.md brief: '.explain the plan and
iterate until it's the plan you'd want')."""

from __future__ import annotations

import parallel_mapreduce_wordcounting_spark as engine
from parallel_mapreduce_wordcounting_spark.plans import explain_str

from .conftest import SF_DIR


def _plan(spark, key):
    return explain_str(engine.REGISTRY[key].fn(spark, SF_DIR))


def test_scan_parquet_pushdown(spark):
    p = _plan(spark, "scan_parquet")
    assert "PushedFilters:" in p and "GreaterThan(o_totalprice" in p
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>" in p


def test_wc_topk_plan_shape(spark):
    """The MR word-count plan: pruned scan → partial agg → single exchange →
    final agg → top-k heap (no global sort)."""
    p = _plan(spark, "wc_topk")
    assert "ReadSchema: struct<text:string>" in p  # column pruning
    assert "TakeOrderedAndProject" in p  # no global sort for top-k
    assert "partial_count" in p  # map-side combine
    simple = explain_str(engine.REGISTRY["wc_topk"].fn(spark, SF_DIR), "simple")
    assert simple.count("Exchange hashpartitioning") == 1  # exactly one shuffle


def test_join_star_broadcasts_dimensions(spark):
    p = _plan(spark, "join_star")
    assert "BroadcastHashJoin" in p


def test_join_broadcast_has_no_fact_shuffle(spark):
    p = _plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_filters_reach_scan(spark):
    p = _plan(spark, "filt_pred")
    assert "PushedFilters:" in p
    assert "In(o_orderstatus" in p


def test_agg_basic_partial_aggregation(spark):
    p = _plan(spark, "agg_basic")
    assert "partial_" in p  # map-side combine before the exchange


def test_join_range_is_equi_not_nested_loop(spark):
    """The bucketized range join must plan as a hash/sort-merge equi-join,
    never BroadcastNestedLoopJoin/CartesianProduct."""
    p = _plan(spark, "join_range")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_join_bucketed_has_no_exchange(spark):
    """Both sides bucketed on the join key → the sort-merge join's
    distribution requirement is pre-satisfied: zero shuffles."""
    df = engine.REGISTRY["join_bucketed"].fn(spark, SF_DIR)
    p = explain_str(df, "simple")
    assert "SortMergeJoin" in p
    assert "Exchange" not in p


def test_partitioned_sink_prunes_partitions(spark):
    df = engine.REGISTRY["sink_parquet_partitioned"].fn(spark, SF_DIR)
    p = explain_str(df)
    assert "PartitionFilters: [lang" in p or "lang#" in p.split("PartitionFilters:")[1].split("]")[0]


def test_whole_stage_codegen_everywhere_core(spark):
    """Codegen spans only materialize in the AQE *final* plan — run the query,
    then assert the executed plan has fused codegen stages (`*(n)` markers)."""
    for key in ("wc_counts", "agg_basic", "win_rank"):
        df = engine.REGISTRY[key].fn(spark, SF_DIR)
        df.collect()
        assert "*(" in explain_str(df, "simple"), key


def test_tpch_q6_filters_pushed_to_scan(spark):
    """Q6 is the pushdown showcase: shipdate/discount/quantity predicates
    must reach the parquet scan, and only the 4 referenced columns load."""
    p = _plan(spark, "tpch_q6")
    assert "PushedFilters:" in p
    pushed = p.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in schema and "l_orderkey" not in schema


def test_tpch_q19_broadcasts_part(spark):
    p = _plan(spark, "tpch_q19")
    assert "BroadcastHashJoin" in p


def test_tpch_q18_semi_join_no_cartesian(spark):
    p = _plan(spark, "tpch_q18")
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p  # top-100 as heap, not global sort


def test_sample_mod_filter_pushes_to_scan(spark):
    p = _plan(spark, "sample_mod")
    # modulo isn't a parquet-pushable predicate, but it must sit in the scan
    # stage (codegen Filter directly over the scan), not after an exchange
    assert "Exchange" not in _plan_simple(spark, "sample_mod")


def test_subq_lateral_decorrelates_to_aggregate_join(spark):
    """The LATERAL must rewrite to groupBy + join, not a per-row re-scan:
    exactly one aggregate over customer and one join."""
    p = _plan_simple(spark, "subq_lateral")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def _plan_simple(spark, key):
    return explain_str(engine.REGISTRY[key].fn(spark, SF_DIR), "simple")


def test_tpch_q2_broadcasts_all_dimensions(spark):
    """Q2's only shuffles are the pair-cost aggregate and its window-min;
    supplier/nation/region/part all broadcast, and top-100 is a heap."""
    p = _plan(spark, "tpch_q2")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_tpch_q11_scalar_total_broadcasts(spark):
    """The fraction-of-total threshold must come from a broadcast 1-row
    aggregate, never a per-row recompute or a cartesian blow-up."""
    p = _plan_simple(spark, "tpch_q11")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_tpch_q21_single_fact_pass_no_correlated_rescans(spark):
    """Q21's EXISTS/NOT-EXISTS pair is algebraized to one per-order
    aggregate: no nested-loop join anywhere, supplier side broadcast,
    top-100 as a heap."""
    p = _plan(spark, "tpch_q21")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_tpch_q9_plan_shape(spark):
    """Q9 (round-4 bench flag): filtered part + nation broadcast-hinted, the
    p_name predicate pushed to the part scan, lineitem pruned to the 5 join/
    measure columns, and exactly one hash-partitioning exchange (the final
    group-by; orders/supplier joins are AQE-decided and at sf0.001–0.1 plan
    as broadcasts, never a cartesian)."""
    p = _plan(spark, "tpch_q9")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "StringContains(p_name,red)" in p  # filter reached the part scan
    li_schema = [
        line for line in p.splitlines() if "ReadSchema" in line and "l_orderkey" in line
    ][0]
    assert "l_comment" not in li_schema and "l_shipdate" not in li_schema
    simple = _plan_simple(spark, "tpch_q9")
    assert simple.count("Exchange hashpartitioning") <= 1  # only the group-by


def test_tpch_q12_date_range_pushed_to_scan(spark):
    p = _plan(spark, "tpch_q12")
    pushed = p.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed


def test_merge_upsert_is_single_key_join(spark):
    """MERGE compiles to one full-outer equi-join on the merge key — never a
    nested-loop or cartesian. The ONLY nested-loop allowed is the broadcast
    of the 1-row max(key)+1 shift aggregate onto the insert branch (the
    scalar-broadcast pattern used repo-wide; it builds against exactly one
    row, so it is O(n) regardless of SF)."""
    p = _plan_simple(spark, "merge_upsert")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1  # the 1-row shift only
    assert "FullOuter" in p or "full_outer" in p.lower()
    # the merge join itself must be a key-based equi-join, not the NLJ
    full_outer_lines = [ln for ln in p.splitlines() if "FullOuter" in ln]
    assert full_outer_lines and all(
        "NestedLoop" not in ln and "Cartesian" not in ln for ln in full_outer_lines
    )


def test_scd2_single_user_partitioning(spark):
    """All four window/aggregate steps of the SCD2 build must share ONE
    user_id exchange — Catalyst reuses the partitioning, so adding history
    columns costs no extra shuffles."""
    p = _plan_simple(spark, "scd2_build")
    assert p.count("Exchange hashpartitioning") == 1


def test_heavy_hitters_broadcast_total(spark):
    """The corpus total must ride along as a broadcast 1-row join, never a
    recompute per row or a shuffle of the counts against themselves."""
    p = _plan_simple(spark, "agg_heavy_hitters")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_join_dpp_prunes_partitions_dynamically(spark):
    """join_dpp's fact scan must carry a dynamicpruningexpression partition
    filter — proof the partitioned scan is pruned by the dim's RUNTIME key
    set, not read in full (the 100 TB date/tenant-pruning story)."""
    df = engine.REGISTRY["join_dpp"].fn(spark, SF_DIR)
    p = explain_str(df)
    assert "dynamicpruningexpression" in p, p[:2000]
    # and the pruning subquery is hosted on the scan's PartitionFilters
    assert "PartitionFilters" in p


def test_text_chunk_zero_shuffle(spark):
    """Chunking must be embarrassingly parallel: no exchange anywhere."""
    assert "Exchange" not in _plan_simple(spark, "text_chunk")


def test_layout_zorder_single_range_exchange(spark):
    """The layout pass pays exactly one range shuffle; the 64-bit-op Morton
    interleave stays inside codegen (no Python, no extra exchange)."""
    p = _plan_simple(spark, "layout_zorder")
    assert p.count("Exchange rangepartitioning") == 1
    assert p.count("Exchange hashpartitioning") == 0


def test_quantize_int8_zero_shuffle(spark):
    assert "Exchange" not in _plan_simple(spark, "sim_quantize_int8")


def test_triangle_edge_derivation_single_exchange(spark):
    """graph_triangle_stats' capped edge derivation must pay exactly ONE
    hash exchange: the window count (cap tagging) and the posting-array
    groupBy share the hash(h) partitioning — a second exchange means the
    groupBy stopped reusing the window's shuffle (r8 review: the cap must
    ride the pairing's own shuffle, not add a counting pass)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from parallel_mapreduce_wordcounting_spark.operators.staged_r9 import (
        _span_hashes,
    )
    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table

    sh = _span_hashes(load_table(spark, SF_DIR, "documents"), 7)
    grouped = (
        sh.withColumn("n_post", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .where(F.col("n_post") <= 128)
        .groupBy("h")
        .agg(F.collect_list("doc_id").alias("ds"))
    )
    p = explain_str(grouped, "simple")
    assert p.count("Exchange") == 1, p


def test_adamic_adar_no_join_nodes(spark):
    """graph_adamic_adar's pair generation must contain NO join operator:
    the degree cap binds as a window filter BEFORE any pair exists and
    the ordered pairs explode JVM-side from bounded supplier lists (r9
    finding: the previous self-join-then-cap-join shape fanned out a
    super-connector's d² pairs before the cap's inner join dropped them).
    A Join node reappearing means the cap stopped binding pre-fan-out."""
    p = _plan_simple(spark, "graph_adamic_adar")
    assert "Join" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_dedup_lines_bcast_no_blocktext_shuffle(spark):
    """The broadcast form must not shuffle the block stream on block text:
    exactly two hash exchanges remain (the count aggregate and the per-doc
    regroup) and the heavy-set join is a BroadcastHashJoin."""
    p = _plan_simple(spark, "dedup_lines_bcast")
    assert "BroadcastHashJoin" in p
    assert p.count("Exchange hashpartitioning") == 2


def test_aqe_splits_skewed_join(spark):
    """The 100 TB skew story, demonstrated live: a join with one pathological
    hot key runs under AQE with skew-join enabled and the FINAL adaptive
    plan must show the skewed partition split (SortMergeJoin tagged
    skew=true) — i.e., stragglers are handled by the runtime re-planner,
    not by hand-salting (join_salted demonstrates the manual form for
    engines/joins where AQE can't apply)."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # the groupBy above the join wants the join's hash partitioning, so
        # splitting the skewed partition adds a shuffle — allow that trade
        # (exactly the call a real pipeline makes: one extra small shuffle
        # beats a straggler task holding the whole stage)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # ~300k-row left side, 2/3 on ONE key; small-but-not-broadcast right
        left = (
            spark.range(300_000)
            .select(
                F.when(F.col("id") % 3 < 2, 0)
                .otherwise(F.col("id") % 1000)
                .alias("k"),
                F.col("id").alias("v"),
            )
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k").groupBy("k").agg(F.count("*").alias("n"))
        rows = {r.k: r.n for r in joined.collect()}
        # 200k from the %3 rule plus the %1000==0 stragglers that also map
        # to 0 — the hot key's fan-in must survive the split intact
        assert rows[0] == 200_100
        final = explain_str(joined, "simple")
        assert "skew=true" in final, final
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --- r31–r41 backlog: pre-registration plan sweep (r9 verdict item 6) --------

# Keys whose plan legitimately contains a BroadcastNestedLoopJoin: every one
# is the 1-row-broadcast crossJoin convention (a scalar aggregate — grand
# total, pooled variance, global horizon — broadcast against the stream;
# Catalyst renders a crossJoin of a broadcast 1-row side as BNLJ). The
# allowlist is PINNED so a new unbounded nested loop can't hide behind it.
_BNLJ_ONE_ROW_BROADCAST = {
    "stat_eb_shrinkage",
    "stat_paired_ttest",
    "event_conversion_lag_hist",
    "event_drawdown",
    "stat_levene",
    "agg_weighted_median",
    "stat_kruskal_wallis",
    "stat_sign_test",
    "dq_join_cardinality",
    "agg_abc_analysis",
    "text_source_shannon",
    "sim_dim_truncation_eval",
    "stat_regression_to_mean",
    "split_time_holdout",
    "pipeline_anneal_mix",  # r42: broadcast 1-row token total
    "stat_durbin_watson",  # r44: broadcast 1-row sufficient statistics
    "stat_het_spearman",  # r45: same shared _trend_residuals 1-row broadcast
    # r44: broadcast BOUNDED needle set (|corpus|/101 rows, not 1) — the
    # multi-pattern substring scan has no equi-key by construction; the
    # sweep still requires the build side to be a BroadcastExchange
    "text_substring_contamination",
    # r46: broadcast BOUNDED query-token set (8 benchmark queries' bigrams,
    # fixed by the eval set, not the corpus) — the late-interaction
    # (query-token × corpus-token) product has no equi-key by construction
    "sim_maxsim",
    "stat_chow",  # r46: broadcast 1-row day count + 1-row segment SSRs
    # r47: broadcast 1-row global bounds / BOUNDED |event-type| grid side
    "layout_prune_sim",
    "stat_friedman",
    "agg_theil_index",  # r49: broadcast 1-row (n, Σx) totals
    # r50: broadcast 1-row arm total / max-day / grid count + 1-row median
    "sample_ab_assignment",
    "warehouse_retention_vacuum",
    "stat_mood_median",
    # r51: broadcast 1-row epoch minimum / variance totals
    "fn_snowflake_decode",
    "stat_mann_kendall_seasonal",
    # r52: broadcast 1-row budget/level/stat frames (|sources|-row plan)
    "pipeline_epoch_scheduler",
    "join_cardinality_estimate",
    # r53: broadcast 1-row corpus max / day count / O-E-V totals
    "stat_logrank",
    "stat_block_bootstrap",
    "stat_icc",
    # r54: broadcast CALENDAR-bounded half-series (days²/4 pair terms) /
    # 1-row median & count frames
    "stat_energy_distance",
    "dq_cardinality_drift",
    # r55: broadcast 1-row totals / containment counts
    "text_prefix_cache_value",
    "join_fk_discovery",
    # r56: broadcast 1-row counts / q-hat order statistic
    "stat_conformal_interval",
    # r57: broadcast 1-row corpus end / totals / replicate spine /
    # trend sufficient statistics
    "stat_km_greenwood_ci",
    "dq_hash_uniformity",
    "sample_poisson_bootstrap",
    "stat_press",
    # r58: broadcast BOUNDED size spine / tiny type grid / 1-row ACF stats
    "stat_hurst_rs",
    "stat_cronbach_alpha",
    "stat_pacf",
}


def _backlog_cases():
    # discovered, not hand-ranged (the r42 hand-range silently skipped a
    # freshly-authored r43): every staged_r31+ module on disk is swept
    from parallel_mapreduce_wordcounting_spark.operators import staged_modules

    out = []
    for mod in staged_modules():
        if int(mod.__name__.rsplit("_r", 1)[1]) >= 31:
            out.extend((c[0], c[1]) for c in mod.DEV_CASES)
    return out


def test_backlog_no_cartesian_no_unbounded_nested_loop(spark):
    """Every key of the registration backlog (staged_r31+, swept through
    the newest staged wave),
    swept BEFORE registration: no CartesianProduct node ever; a
    BroadcastNestedLoopJoin only for the pinned 1-row-broadcast crossJoin
    keys, and even there the nested-loop side must be a BroadcastExchange
    (a bounded build side, not a shuffled quadratic one)."""
    bad = []
    for key, fn in _backlog_cases():
        p = explain_str(fn(spark, SF_DIR))
        if "CartesianProduct" in p:
            bad.append((key, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in p:
            if key not in _BNLJ_ONE_ROW_BROADCAST:
                bad.append((key, "unpinned BroadcastNestedLoopJoin"))
            elif "BroadcastExchange" not in p:
                bad.append((key, "BNLJ without a broadcast build side"))
    assert not bad, bad
