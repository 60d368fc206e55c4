"""Golden-fixture assertions (SURVEY.md §5.3): exact values measured from the
deterministic seed=42 corpus. These catch silent tokenization or dedup
regressions that a self-consistent oracle comparison would miss."""

from __future__ import annotations

import parallel_mapreduce_wordcounting_spark as engine
from parallel_mapreduce_wordcounting_spark.operators.similarity import (
    sim_topk_blocked_pairs,
)

SF0001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"


def test_top5_words_sf0001(spark):
    rows = engine.REGISTRY["wc_topk"].fn(spark, SF0001).collect()
    top5 = [(r.word, r.cnt) for r in rows[:5]]
    assert top5 == [
        ("scan", 984),
        ("column", 978),
        ("window", 976),
        ("order", 975),
        ("sort", 974),
    ]


def test_vocabulary_size_sf0001(spark):
    (row,) = engine.REGISTRY["wc_distinct_vocab"].fn(spark, SF0001).collect()
    assert row.vocab_size == 31


def test_planted_near_dup_pair_sf0001(spark):
    """FIXTURES.md: docs 8 and 12 are a planted near-duplicate pair."""
    pairs = {
        (r.doc_id_a, r.doc_id_b)
        for r in engine.REGISTRY["dedup_fuzzy_minhash"].fn(spark, SF0001).collect()
    }
    assert (8, 12) in pairs


def test_exact_dups_sf01(spark):
    """FIXTURES.md: 8 texts appear exactly twice at sf0.1."""
    rows = engine.REGISTRY["dedup_exact"].fn(spark, SF01).collect()
    twice = [r for r in rows if r.n_copies == 2]
    assert len(twice) == 8
    assert all(r.n_copies <= 2 for r in rows)


def test_fuzzy_recall_vs_bruteforce_sf0001(spark):
    """LSH must find every pair the brute-force exact-Jaccard path finds at
    the same threshold — zero false negatives (the t2 failure mode)."""
    lsh = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in engine.REGISTRY["dedup_fuzzy_minhash"].fn(spark, SF0001).collect()
    }
    brute = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in engine.REGISTRY["dedup_ngram_jaccard"].fn(spark, SF0001).collect()
        if r.jaccard >= 0.6
    }
    assert lsh == brute


def test_blocked_ann_recall_floor(spark):
    """The IVF path is approximate but deterministic. The ADVICE r3 contract:
    recall@20 against the exact path ≥ 0.75 on the sf0.01 fixture
    (n_centroids=64, nprobe=6); measured 20/20 — regressions in sampling,
    fitting, assignment, or probing would drop it. Round 6 swapped the raw
    hashed-sample quantizer for a spherical k-means fit over the hashed
    sample, lifting sf0.1 recall 18→19/20 (pinned at ≥18 here; the corpus
    is near-uniform, the adversarial case for clustering ANN). sf0.001 is
    additionally pinned (same defaults, smaller corpus)."""
    for sf, floor in (
        (SF0001, 15),
        ("/root/testdata/sf0.01", 15),
        ("/root/testdata/sf0.1", 18),
    ):
        exact = {
            (r.vec_id_a, r.vec_id_b)
            for r in engine.REGISTRY["sim_topk_cosine"].fn(spark, sf).collect()
        }
        approx = {
            (r.vec_id_a, r.vec_id_b)
            for r in sim_topk_blocked_pairs(spark, sf).collect()
        }
        assert len(exact & approx) >= floor, (sf, len(exact & approx))


def test_embedding_norms_are_one(spark):
    """FIXTURES.md: embeddings are L2-normalized (norm_sq rounds to 1.0)."""
    rows = engine.REGISTRY["fn_array"].fn(spark, SF0001).collect()
    assert all(abs(r.norm_sq - 1.0) < 1e-3 for r in rows)
    assert all(r.dim == 64 for r in rows)


def test_round6_golden_pins_sf0001(spark):
    """Exact-value pins for the round-6 operators at sf0.001 — regression
    tripwires against silent semantic drift (tokenization, threshold,
    seeding, or rounding changes all move these)."""
    from pyspark.sql import functions as F

    SF_DIR = SF0001

    dl = (
        engine.REGISTRY["dedup_lines"]
        .fn(spark, SF_DIR)
        .agg(F.sum("n_removed").alias("rm"), F.sum("n_blocks").alias("nb"))
        .collect()[0]
    )
    assert (dl.rm, dl.nb) == (197, 7172)

    km = {
        r.cluster: r["count"]
        for r in engine.REGISTRY["sim_kmeans"].fn(spark, SF_DIR).groupBy("cluster").count().collect()
    }
    assert km == {0: 66, 1: 52, 2: 62, 3: 68, 4: 64, 5: 65, 6: 62, 7: 61}

    ch = (
        engine.REGISTRY["text_chunk"]
        .fn(spark, SF_DIR)
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
        .collect()[0]
    )
    assert (ch.n, ch.t) == (1388, 34546)

    rag = (
        engine.REGISTRY["pipeline_rag_index"]
        .fn(spark, SF_DIR)
        .agg(F.count("*").alias("n"), F.count_if("is_canonical").alias("c"))
        .collect()[0]
    )
    assert (rag.n, rag.c) == (1388, 1345)  # 43 duplicate chunks at sf0.001

    # pagerank: uniform ranks inside symmetric duplicate cliques — pin the
    # top rank value and that the top-3 doc ids are the expected clique
    pr = (
        engine.REGISTRY["graph_pagerank"]
        .fn(spark, SF_DIR)
        .orderBy(F.col("pagerank").desc(), "doc_id")
        .limit(3)
        .collect()
    )
    assert [(r.doc_id, r.pagerank) for r in pr] == [
        (0, 0.022222222),
        (5, 0.022222222),
        (8, 0.022222222),
    ]


def test_round6b_golden_pins_sf0001(spark):
    """Exact-value pins for the round-6 second-wave operators at sf0.001."""
    from pyspark.sql import functions as F

    SF_DIR = SF0001

    gf = engine.REGISTRY["event_gap_fill"].fn(spark, SF_DIR)
    assert (
        gf.count(),
        gf.agg(F.sum("n")).collect()[0][0],
        gf.where(F.col("n") == 0).count(),
    ) == (150, 1000, 0)  # 30 days x 5 types, dense at this sf

    at = engine.REGISTRY["event_attribution"].fn(spark, SF_DIR).orderBy("attr_source")
    assert [(r.attr_source, r.n_purchases, r.revenue_cents) for r in at.collect()] == [
        ("click", 49, 227991),
        ("direct", 3, 3349),
        ("error", 49, 264144),
        ("signup", 52, 302209),
        ("view", 49, 244776),
    ]

    rfm = engine.REGISTRY["event_rfm"].fn(spark, SF_DIR)
    assert (rfm.count(), rfm.agg(F.sum("n_users")).collect()[0][0]) == (9, 15)

    rec = engine.REGISTRY["sql_recursive_cte"].fn(spark, SF_DIR).orderBy("event_type")
    assert [(r.event_type, r.min_hops) for r in rec.collect()] == [
        ("click", 1), ("error", 1), ("purchase", 1), ("signup", 0), ("view", 1),
    ]

    bm = engine.REGISTRY["agg_bitmap_distinct"].fn(spark, SF_DIR).orderBy("l_linestatus")
    assert [(r.l_linestatus, r.uniq_parts) for r in bm.collect()] == [("F", 200), ("O", 200)]

    ws = engine.REGISTRY["sample_weighted"].fn(spark, SF_DIR).limit(3).collect()
    assert [(r.doc_id, r.skey) for r in ws] == [
        (411, -5.636e-06), (106, -2.114e-05), (19, -2.2018e-05),
    ]

    bp = engine.REGISTRY["text_bpe_pairs"].fn(spark, SF_DIR).limit(3).collect()
    assert [(r.pair, r.cnt) for r in bp] == [("er", 4650), ("or", 2880), ("in", 2858)]

    du = engine.REGISTRY["dedup_url"].fn(spark, SF_DIR)
    assert (
        du.count(),
        du.agg(F.sum("n_variants")).collect()[0][0],
        du.where(F.col("n_variants") == 4).count(),
    ) == (125, 500, 125)  # every page collapses its 4 synthesized variants

    fv = engine.REGISTRY["fn_variant"].fn(spark, SF_DIR)
    assert (
        fv.count(),
        fv.agg(F.sum("k")).collect()[0][0],
        fv.where(F.col("k_absent").isNull()).count(),
    ) == (1000, 48876, 1000)

    xr = engine.REGISTRY["scan_xml"].fn(spark, SF_DIR)
    assert (xr.count(), xr.agg(F.sum("n_chars")).collect()[0][0]) == (500, 153156)


def test_round6c_golden_pins_sf0001(spark):
    """Exact-value pins for the round-6 third-wave operators at sf0.001."""
    from pyspark.sql import functions as F

    SF_DIR = SF0001

    co = engine.REGISTRY["fn_collate"].fn(spark, SF_DIR)
    rows = co.orderBy("src_lc").collect()
    assert len(rows) == 20 and all(r.n_docs == 25 for r in rows)

    hs = engine.REGISTRY["text_html_strip"].fn(spark, SF_DIR)
    assert (hs.count(), hs.agg(F.sum("n_tags")).collect()[0][0]) == (500, 5000)
    # entities decode to literal chars; tags themselves are gone
    assert hs.where(F.col("clean_text").endswith(" & more <here>")).count() == 500
    assert hs.where(F.col("clean_text").contains("script")).count() == 0

    fw = engine.REGISTRY["event_funnel_windowed"].fn(spark, SF_DIR).orderBy("cohort_day")
    assert [(r.cohort_day, r.n_signups, r.n_converted) for r in fw.collect()][:3] == [
        (19723, 6, 6), (19724, 3, 3), (19725, 4, 4),
    ]

    bo = engine.REGISTRY["sample_bootstrap"].fn(spark, SF_DIR).agg(
        F.sum("n_docs"), F.sum("n_sampled"), F.sum("n_distinct")
    ).collect()[0]
    assert tuple(bo) == (500, 536, 325)  # ~e^-1 of docs drawn 0 times

    cm = engine.REGISTRY["agg_countmin"].fn(spark, SF_DIR)
    # CMS guarantee: the estimate NEVER underestimates
    assert cm.where(F.col("cms_est") < F.col("exact_cnt")).count() == 0
    top = cm.orderBy(F.col("exact_cnt").desc(), "word").limit(3).collect()
    assert [(r.word, r.exact_cnt, r.cms_est) for r in top] == [
        ("scan", 984, 984), ("column", 978, 978), ("window", 976, 976),
    ]


def test_round7_golden_pins_sf0001(spark):
    """Round-7 keys pinned to values measured from the seed=42 fixture (via
    the hash-verified oracles) — catches silent semantic drift that a
    self-consistent Spark/DuckDB pair could miss together."""
    import pyspark.sql.functions as F

    cdc = engine.REGISTRY["cdc_apply"].fn(spark, SF0001)
    (r,) = cdc.agg(
        F.count("*"), F.sum("n_changes"), F.round(F.sum("last_value"), 2)
    ).collect()
    assert tuple(r) == (12, 793, 559.2)

    st = engine.REGISTRY["event_streaks"].fn(spark, SF0001)
    (r,) = st.agg(
        F.count("*"), F.max("longest_streak"), F.sum("n_active_days")
    ).collect()
    assert tuple(r) == (15, 26, 397)

    kw = engine.REGISTRY["text_keywords"].fn(spark, SF0001)
    assert kw.count() == 1500  # 500 docs x 3 keywords
    doc0 = [(r.rank, r.word, r.tfidf) for r in kw.where("doc_id = 0").collect()]
    assert sorted(doc0) == [
        (1, "dup", 2.95851),
        (2, "batch", 0.774544),
        (3, "window", 0.616017),
    ]

    pct = {
        r.p: r.value
        for r in engine.REGISTRY["agg_percentile_iterative"].fn(spark, SF0001).collect()
    }
    assert pct == {
        0.25: 26648.23,
        0.5: 52738.75,
        0.75: 79837.59,
        0.9: 94254.19,
        0.99: 103869.86,
    }

    (r,) = engine.REGISTRY["obs_metrics"].fn(spark, SF0001).collect()
    assert tuple(r) == (4778, 1568, 25224225928)


def test_round8_staged_golden_pins_sf0001(spark):
    """Round-8 staged keys (operators/staged_r9.py) pinned to values
    measured from the seed=42 fixture via the oracle-verified paths —
    catches silent semantic drift that a self-consistent Spark/DuckDB
    pair could miss together."""
    import pyspark.sql.functions as F

    from parallel_mapreduce_wordcounting_spark.operators import staged_r9 as s9

    lin = sorted(tuple(r) for r in s9.stat_linreg(spark, SF0001).collect())
    assert lin == [
        ("A", 1962, -42.561751, 52906.76046, 0.000406),
        ("N", 2070, -21.120325, 53890.115298, 0.000108),
        ("R", 1968, 0.65978, 53454.949302, 0.0),
    ]

    (an,) = s9.stat_anova(spark, SF0001).collect()
    assert tuple(an) == (2, 5997, 0.758104, 0.000253)

    (c2,) = s9.stat_chi2_independence(spark, SF0001).collect()
    assert tuple(c2) == (24, 1000, 23.493663)

    (mw,) = s9.stat_mann_whitney(spark, SF0001).collect()
    assert tuple(mw) == ("click", "purchase", 210, 202, 20447.5, -0.631059)

    (ks,) = s9.stat_ks_test(spark, SF0001).collect()
    assert tuple(ks) == ("click", "purchase", 210, 202, 0.055257)

    (conc,) = (
        s9.event_concurrency(spark, SF0001)
        .agg(F.count("*"), F.max("peak_concurrency"), F.sum("peak_concurrency"))
        .collect()
    )
    assert tuple(conc) == (30, 4, 77)

    (sp,) = (
        s9.dedup_spans(spark, SF0001)
        .agg(F.count("*"), F.sum("n_occur"), F.max("n_docs"))
        .collect()
    )
    assert tuple(sp) == (1115, 2382, 4)

    (tri,) = s9.graph_triangle_stats(spark, SF0001).collect()
    assert tuple(tri) == (45, 28, 15, 5, 1.0)  # duplication is pure cliques

    sweep = sorted(tuple(r) for r in s9.sim_threshold_sweep(spark, SF0001).collect())
    assert sweep == [(0.3, 920), (0.35, 257), (0.4, 66), (0.45, 7), (0.5, 0)]

    leak = sorted(tuple(r) for r in s9.pipeline_split_leakage(spark, SF0001).collect())
    assert leak == [
        ("test", 25, 1374, 0, 0.0),
        ("val", 23, 1426, 252, 0.176718),
    ]

    (dec,) = (
        s9.event_decay_score(spark, SF0001)
        .agg(F.count("*"), F.round(F.sum("decay_score"), 2))
        .collect()
    )
    assert tuple(dec) == (15, 14878.1)
