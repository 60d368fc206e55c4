#!/usr/bin/env python
"""Repo-wide physical-plan red-flag sweep.

Explains EVERY registered key at sf0.001 and flags the classic 100 TB
scale-killers:

- ``CartesianProduct`` (quadratic blow-up) — always flagged;
- ``BroadcastNestedLoopJoin`` — flagged unless the build side is a 1-row
  aggregate (the repo-wide broadcast-scalar pattern, audited safe);
- ``Window`` with an empty partition spec (global single-partition window)
  — flagged except inside an already-bounded (<= a few rows) stage, which
  the sweep can't see, so every hit needs a human-readable justification
  in the allowlist below;
- Python row-at-a-time ``BatchEvalPython`` — flagged unless the key is the
  UDF-demo surface itself.

Exit 0 = no unexplained flags. Run: python scripts/plan_audit.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("PMRWC_TEST_SF_DIR", "/root/testdata/sf0.001")

# key -> reason a hit is acceptable (documented judgment, not suppression)
ALLOW = {
    "join_cross": {"CartesianProduct", "BroadcastNestedLoopJoin"},  # IS the cross-join surface
    "udf_scalar": {"BatchEvalPython"},  # IS the row-at-a-time UDF demo
    "udtf_python": {"BatchEvalPython"},  # IS the Python UDTF demo
    # single-partition windows over BOUNDED inputs (not the row stream):
    "sim_kmeans": {"GlobalWindow"},  # row_number over the K=8 seed rows only
    "pack_sequences": {"GlobalWindow"},  # prefix over per-BUCKET totals (shuffle-partition count rows; curation_ext.py:281)
    "pipeline_sft_pack": {"GlobalWindow"},  # same bucket-offset prefix (one row per doc_id-div-64 bucket), staged_r8.py
    "stat_ks_test": {"GlobalWindow"},  # bucket offsets over one row per floor(value) bucket (~330 rows), staged_r9.py (registered round 7)
    "stat_mann_whitney": {"GlobalWindow"},  # same bucket-offset prefix as stat_ks_test (midrank cumulative counts)
    # staged_r10 (both names so registration next round needs no audit edit):
    "staged:stat_auc": {"GlobalWindow"},  # same ~330-row bucket-offset prefix as stat_ks_test
    "stat_auc": {"GlobalWindow"},
    "staged:event_survival": {"GlobalWindow"},  # KM windows order the per-duration aggregate (≤ corpus span in hours, ~720 rows), not the event stream
    "event_survival": {"GlobalWindow"},
    "text_zipf": {"GlobalWindow"},  # rank over the aggregated vocabulary (~|V| rows), not the token stream
    "text_vocab_coverage": {"GlobalWindow"},  # same aggregated-vocabulary rank as text_zipf
    # broadcast NLJs whose build side is a bounded constant (> 1 row, so the
    # keys=[] 1-row-aggregate detector can't clear them):
    "sim_knn_query": {"BroadcastNestedLoopJoin"},  # 1 query row broadcast (range condition)
    "sim_pq": {"BroadcastNestedLoopJoin"},  # same 1-query-row broadcast in the exact re-rank stage
    "sim_range_search": {"BroadcastNestedLoopJoin"},  # 1 query row broadcast (range condition)
    "sim_label_eval": {"BroadcastNestedLoopJoin"},  # 20 query rows broadcast
    "sim_hard_negatives": {"BroadcastNestedLoopJoin"},  # 20 query rows broadcast
    "sim_pair_hist": {"BroadcastNestedLoopJoin"},  # bounded id-range slice self-pairing (documented demo slice)
    "event_active_users": {"BroadcastNestedLoopJoin"},  # day x trailing-7-day calendar join (~30x7 rows)
    # staged_r11 (both names so registration needs no audit edit):
    "staged:sim_hamming_topk": {"BroadcastNestedLoopJoin"},  # 5 probe rows broadcast (inequality condition)
    "sim_hamming_topk": {"BroadcastNestedLoopJoin"},
    "staged:join_bloom": {"BroadcastNestedLoopJoin"},  # 1-row constant-size bitmap broadcast
    "join_bloom": {"BroadcastNestedLoopJoin"},
    "staged:event_ab_bayes": {"GlobalWindow", "BroadcastNestedLoopJoin"},  # lf prefix spine bounded by the user POPULATION (n_C+n_T+4 rows); 1-row counts/p frames broadcast
    "event_ab_bayes": {"GlobalWindow", "BroadcastNestedLoopJoin"},
    "staged:stat_binom_fdr": {"GlobalWindow", "BroadcastNestedLoopJoin"},  # lf spine bounded by max per-group trials; BH family window over |event types| rows; 1-row pool broadcast
    "stat_binom_fdr": {"GlobalWindow", "BroadcastNestedLoopJoin"},
    # staged_r12:
    "staged:event_uplift_qini": {"GlobalWindow", "BroadcastNestedLoopJoin"},  # score-histogram prefix (|distinct scores| rows) + decile cumsum (10 rows); 1-row user-count broadcast
    "event_uplift_qini": {"GlobalWindow", "BroadcastNestedLoopJoin"},
    # staged_r13:
    "staged:stat_spearman": {"GlobalWindow"},  # rank windows over the DAY-GRAIN series (calendar-bounded rows), not the event stream
    "stat_spearman": {"GlobalWindow"},
    # staged_r14:
    "staged:sim_rrf_hybrid": {"BroadcastNestedLoopJoin"},  # 3 probe rows broadcast in the dense arm (sim_knn_query convention)
    "sim_rrf_hybrid": {"BroadcastNestedLoopJoin"},
    # staged_r15:
    "staged:stat_fisher_exact": {"GlobalWindow"},  # lf prefix spine bounded by the user POPULATION (event_ab_bayes precedent)
    "stat_fisher_exact": {"GlobalWindow"},
    "staged:stat_mcnemar": {"GlobalWindow"},  # lf spine bounded by the DISCORDANT-pair count
    "stat_mcnemar": {"GlobalWindow"},
    "staged:sim_retrieval_eval": {"BroadcastNestedLoopJoin"},  # 5 probe rows broadcast (sim_rrf_hybrid convention)
    "sim_retrieval_eval": {"BroadcastNestedLoopJoin"},
    "staged:sim_cluster_purity": {"GlobalWindow"},  # inherits sim_kmeans' K=8 seed window (allowlisted above)
    "sim_cluster_purity": {"GlobalWindow"},
    # staged_r18:
    "staged:stat_autocorr": {"GlobalWindow"},  # row_number over the DAY-GRAIN series (calendar-bounded; stat_spearman precedent) + running Ljung-Box over the 7 lag rows
    "stat_autocorr": {"GlobalWindow"},
    "staged:win_hampel": {"BroadcastNestedLoopJoin"},  # 7-row ±3-day offset spine broadcast (cross with a literal range; neighborhood join itself is a hash join)
    "win_hampel": {"BroadcastNestedLoopJoin"},
    # staged_r19:
    "staged:sim_silhouette": {"GlobalWindow"},  # inherits sim_kmeans' K=8 seed window (allowlisted above); the rank window is per-vec_id partitioned
    "sim_silhouette": {"GlobalWindow"},
    "staged:pipeline_filter_funnel": {"GlobalWindow"},  # running survivors over the 5 ordered stage rows only
    "pipeline_filter_funnel": {"GlobalWindow"},
    # staged_r20:
    "staged:text_burrows_delta": {"BroadcastNestedLoopJoin"},  # |sources| x top-50 literal grid cross (~1000 rows); all corpus-volume joins are hash joins
    "text_burrows_delta": {"BroadcastNestedLoopJoin"},
    # staged_r23: the 33-row literal KDE grid broadcast-crosses the cents
    # stream (histogram-with-kernel shape); all corpus joins are hash joins
    "staged:stat_kde_grid": {"BroadcastNestedLoopJoin"},
    "stat_kde_grid": {"BroadcastNestedLoopJoin"},
    # staged_r24: the SPRT prefix spine and the decomposition windows run
    # over the CALENDAR-BOUNDED day-grain series (stat_spearman precedent);
    # all event-volume work is absorbed by per-day hash aggregates first
    "staged:event_ab_sprt": {"GlobalWindow"},
    "event_ab_sprt": {"GlobalWindow"},
    "staged:event_seasonal_decompose": {"GlobalWindow"},
    "event_seasonal_decompose": {"GlobalWindow"},
    # staged_r25: the isotonic windows and the O(B²) pair enumeration run
    # over the ≤10-row BIN spine (one bin aggregate absorbs the events);
    # bollinger windows ride the day-grain series (stat_spearman
    # precedent); the periodogram broadcast-crosses a 13-row literal
    # period spine with the day series (stat_kde_grid shape)
    "staged:stat_isotonic": {"GlobalWindow", "BroadcastNestedLoopJoin"},
    "stat_isotonic": {"GlobalWindow", "BroadcastNestedLoopJoin"},
    "staged:win_bollinger": {"GlobalWindow"},
    "win_bollinger": {"GlobalWindow"},
    "staged:event_periodogram": {"BroadcastNestedLoopJoin"},
    "event_periodogram": {"BroadcastNestedLoopJoin"},
    # staged_r26: rolling-corr and seasonal-anomaly windows ride the
    # calendar-bounded day-grain series (stat_spearman precedent)
    "staged:win_rolling_corr": {"GlobalWindow"},
    "win_rolling_corr": {"GlobalWindow"},
    "staged:event_anomaly_seasonal": {"GlobalWindow"},
    "event_anomaly_seasonal": {"GlobalWindow"},
    # staged_r28: wilcoxon's bucket-offset prefix rides the |distinct |d||
    # spine (stat_mann_whitney precedent)
    "staged:stat_wilcoxon": {"GlobalWindow"},
    "stat_wilcoxon": {"GlobalWindow"},
    # staged_r29: the window sweep broadcast-crosses a 5-row literal window
    # spine with the per-signup dt table (stat_kde_grid shape)
    "staged:event_window_sweep": {"BroadcastNestedLoopJoin"},
    "event_window_sweep": {"BroadcastNestedLoopJoin"},
    # staged_r30: median-CI rank selection rides the |distinct values|
    # spine (stat_mann_whitney precedent) with 1-row rank frames
    # broadcast; the compaction window rides the ≤40-row FILE-MANIFEST
    # spine (file counts, not row counts)
    "staged:stat_median_ci": {"GlobalWindow", "BroadcastNestedLoopJoin"},
    "stat_median_ci": {"GlobalWindow", "BroadcastNestedLoopJoin"},
    "staged:layout_compaction_plan": {"GlobalWindow"},
    "layout_compaction_plan": {"GlobalWindow"},
    # staged_r31: WoW lag rides the day-grain series (stat_spearman
    # precedent)
    "staged:event_wow_change": {"GlobalWindow"},
    "event_wow_change": {"GlobalWindow"},
    # staged_r32: the EWMA oracle spine window rides the day-grain series;
    # the Spark side is one single-group applyInPandas over day rows
    # (event_holt precedent — calendar-bounded)
    "staged:stat_ewma_chart": {"GlobalWindow"},
    "stat_ewma_chart": {"GlobalWindow"},
    # staged_r33: peak lag/lead rides the day-grain series (stat_spearman
    # precedent)
    "staged:event_peaks": {"GlobalWindow"},
    "event_peaks": {"GlobalWindow"},
    # staged_r34: drawdown prefix/running-max windows ride the day-grain
    # series (stat_spearman precedent)
    "staged:event_drawdown": {"GlobalWindow"},
    "event_drawdown": {"GlobalWindow"},
    # staged_r35: the weighted-median prefix rides the distinct-value
    # spine (stat_mann_whitney precedent)
    "staged:agg_weighted_median": {"GlobalWindow"},
    "agg_weighted_median": {"GlobalWindow"},
    # staged_r36: kruskal-wallis rides the stat_mann_whitney bucket-offset
    # prefix over the |distinct values| spine
    "staged:stat_kruskal_wallis": {"GlobalWindow"},
    "stat_kruskal_wallis": {"GlobalWindow"},
    # staged_r37: the ABC cumulation window rides the aggregated PART
    # spine (text_zipf vocabulary-rank precedent)
    "staged:agg_abc_analysis": {"GlobalWindow"},
    "agg_abc_analysis": {"GlobalWindow"},
    # staged_r38: 50 probe rows broadcast for the truncation eval
    # (sim_label_eval precedent); the RTM cutoff selection prefix rides
    # the distinct-value spine (stat_median_ci precedent)
    "staged:sim_dim_truncation_eval": {"BroadcastNestedLoopJoin"},
    "sim_dim_truncation_eval": {"BroadcastNestedLoopJoin"},
    "staged:stat_regression_to_mean": {"GlobalWindow"},
    "stat_regression_to_mean": {"GlobalWindow"},
    # staged_r40: the seasonality-strength decompose windows ride the
    # day-grain series (event_seasonal_decompose precedent)
    "staged:event_seasonality_strength": {"GlobalWindow"},
    "event_seasonality_strength": {"GlobalWindow"},
    # staged_r44 (audited round 11): the DW lag rides the day-grain
    # residual series (stat_autocorr precedent); the decontamination
    # needle set broadcast is capped at _DECONTAM_MAX_NEEDLES rows by the
    # doc_id < _DECONTAM_ID_CAP slice (bounded broadcast × one big-side
    # scan IS the documented 100 TB shape)
    "staged:stat_durbin_watson": {"GlobalWindow"},
    "stat_durbin_watson": {"GlobalWindow"},
    "staged:text_substring_contamination": {"BroadcastNestedLoopJoin"},
    "text_substring_contamination": {"BroadcastNestedLoopJoin"},
    # staged_r45: Spearman-on-|residual| ranks ride the day-grain series
    # (stat_spearman precedent)
    "staged:stat_het_spearman": {"GlobalWindow"},
    "stat_het_spearman": {"GlobalWindow"},
    # staged_r46: the Chow split regressions ride the day-grain series
    # (stat_spearman precedent)
    "staged:stat_chow": {"GlobalWindow"},
    "stat_chow": {"GlobalWindow"},
    # staged_r57: Greenwood windows ride event_survival's per-duration
    # aggregate (≤ corpus span in hours — the event_survival entry above);
    # PRESS rides the day-grain trend series
    "staged:stat_km_greenwood_ci": {"GlobalWindow"},
    "stat_km_greenwood_ci": {"GlobalWindow"},
    "staged:stat_press": {"GlobalWindow"},
    "stat_press": {"GlobalWindow"},
    # staged_r58: Durbin–Levinson recursion over the 7 ACF lag rows +
    # day-grain indexing (stat_autocorr precedent)
    "staged:stat_pacf": {"GlobalWindow"},
    "stat_pacf": {"GlobalWindow"},
    # staged_r46: the query-token set broadcast is bounded by the
    # benchmark, not the corpus — the late-interaction reranker shape
    # (ColBERT ships the query matrix); corpus cost stays linear
    "staged:sim_maxsim": {"BroadcastNestedLoopJoin"},
    "sim_maxsim": {"BroadcastNestedLoopJoin"},
    # staged_r53/staged_r55: moving-block spine and rank/lag windows ride
    # the day-grain series (stat_spearman precedent)
    "staged:stat_block_bootstrap": {"GlobalWindow"},
    "stat_block_bootstrap": {"GlobalWindow"},
    "staged:stat_bartels_rank": {"GlobalWindow"},
    "stat_bartels_rank": {"GlobalWindow"},
    # staged_r42: greedy whole-source fill — the cumulative-budget window
    # runs over the |sources|-row aggregate (pipeline_filter_funnel
    # precedent), never the corpus
    "staged:pipeline_anneal_mix": {"GlobalWindow"},
    "pipeline_anneal_mix": {"GlobalWindow"},
    # staged_r57: the replicate-spine row_number rides the day-grain
    # series (stat_spearman precedent); the B×rows grid is a bounded
    # generated frame
    "staged:sample_poisson_bootstrap": {"GlobalWindow"},
    "sample_poisson_bootstrap": {"GlobalWindow"},
}


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pmrwc-plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import parallel_mapreduce_wordcounting_spark as engine
    from parallel_mapreduce_wordcounting_spark.operators import (
        operator_fns,
        staged_modules,
    )
    from parallel_mapreduce_wordcounting_spark.plans import explain_str

    # registered keys + staged fns (prefixed) so the next round's
    # registrations start plan-clean. Staged waves are DISCOVERED
    # (pkgutil over the operators package) — a new staged_rN.py joins the
    # audit with no edit here (ADVICE r7: the hand-kept list was duplicated
    # four places and a missed entry silently dropped coverage).
    targets = {k: engine.REGISTRY[k].fn for k in engine.REGISTRY}
    for mod in staged_modules():
        for name, fn in operator_fns(mod).items():
            already_registered = (
                name in engine.REGISTRY and engine.REGISTRY[name].fn is fn
            )  # identity, not name: a staged REWORK of a registered key must
            # still be audited under its staged: prefix
            if not already_registered:
                targets[f"staged:{name}"] = fn

    flags: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for key in sorted(targets):
        try:
            p = explain_str(targets[key](spark, SF), "simple")
        except Exception as ex:  # noqa: BLE001 — audit must visit every key
            errors[key] = str(ex).splitlines()[0][:120]
            continue
        hits = set()
        if "CartesianProduct" in p:
            hits.add("CartesianProduct")
        if "BroadcastNestedLoopJoin" in p:
            # allowed when every NLJ in this plan builds on a 1-row aggregate:
            # the repo's broadcast-scalar idiom plans the build side as a
            # HashAggregate with no grouping keys (keys=[]).
            if "keys=[], functions=[" not in p:
                hits.add("BroadcastNestedLoopJoin")
        # global window: a Window node whose spec has no partition list
        for line in p.splitlines():
            ls = line.strip()
            if ls.startswith(("Window ", "+- Window ", ":- Window ")) or " Window " in ls:
                if "windowspecdefinition(" in ls and re.search(
                    r"windowspecdefinition\((?:[^,()]*? ASC NULLS FIRST|[^,()]*? DESC NULLS LAST)",
                    ls,
                ):
                    # spec starts with an ORDER BY column => no partition cols
                    hits.add("GlobalWindow")
        if "BatchEvalPython" in p:
            hits.add("BatchEvalPython")
        hits -= ALLOW.get(key, set())
        if hits:
            flags[key] = sorted(hits)

    print(f"audited {len(targets)} keys at {SF}")
    if errors:
        print(f"ERRORS ({len(errors)}):")
        for k, e in sorted(errors.items()):
            print(f"  {k}: {e}")
    if flags:
        print(f"FLAGS ({len(flags)}):")
        for k, h in sorted(flags.items()):
            print(f"  {k}: {', '.join(h)}")
    else:
        print("FLAGS: none")
    return 1 if (flags or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
