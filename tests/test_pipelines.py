"""Corpus-curation pipeline (pipelines/corpus.py): the end-to-end
composition of the quality / language / exact-dedup / near-dedup / sample
gates. The individual gates are oracle-verified operators; these tests pin
the composition: funnel monotonicity, determinism, near-dup keeper
semantics against the planted duplicate pair, and sample-gate arithmetic."""

from __future__ import annotations

from parallel_mapreduce_wordcounting_spark.operators.dedup import dedup_cluster
from parallel_mapreduce_wordcounting_spark.pipelines import curate, funnel

SF = "/root/testdata/sf0.001"


def test_funnel_is_monotone_and_nonempty(spark):
    f = funnel(spark, SF)
    stages = ["total", "quality", "lang", "exact_dedup", "near_dedup", "sample"]
    counts = [f[s] for s in stages]
    assert counts == sorted(counts, reverse=True), f
    assert f["sample"] > 0  # sample_mod=None keeps every survivor
    assert f["total"] == 500  # the sf0.001 documents table


def test_curate_is_deterministic_and_matches_funnel(spark):
    a = sorted(r.doc_id for r in curate(spark, SF).collect())
    b = sorted(r.doc_id for r in curate(spark, SF).collect())
    assert a == b
    assert len(a) == funnel(spark, SF)["sample"]


def test_near_dup_cluster_keeps_exactly_the_min_label(spark):
    """Every near-dup cluster contributes at most its canonical min doc_id
    to the curated set — the planted sf0.001 near-dup pairs collapse."""
    curated = {r.doc_id for r in curate(spark, SF).collect()}
    clusters = dedup_cluster(spark, SF).collect()
    assert len(clusters) > 0  # fixture plants near-dups
    for row in clusters:
        if row.doc_id != row.cluster_id:
            assert row.doc_id not in curated


def test_sample_mod_subsets_the_curated_corpus(spark):
    full = {r.doc_id for r in curate(spark, SF).collect()}
    sampled = {r.doc_id for r in curate(spark, SF, sample_mod=2).collect()}
    assert sampled <= full
    assert len(sampled) < len(full)


def test_lang_gate_filters(spark):
    en = curate(spark, SF)
    both = curate(spark, SF, langs=("en", "de"))
    assert en.count() <= both.count()
    assert {r.lang for r in en.collect()} <= {"en"}


def test_multimodal_embed_feeds_similarity_search(spark):
    """The multimodal→ANN bridge: mm_embed produces L2-normalized
    array<float> vectors from binary payloads; a broadcast query against
    them (the sim_knn_query shape) must rank the query's own near-duplicate
    first — the sf0.001 fixture plants doc 8 ≈ doc 12."""
    from pyspark.sql import functions as F

    from parallel_mapreduce_wordcounting_spark.operators.multimodal import mm_embed
    from parallel_mapreduce_wordcounting_spark.operators.similarity import dot

    emb = mm_embed(spark, SF)
    # schema contract the similarity operators expect
    assert dict(emb.dtypes) == {"vec_id": "bigint", "embedding": "array<float>"}
    # L2-normalized: ||v|| == 1 for non-empty payloads
    norms = emb.select(
        F.aggregate(
            F.col("embedding"), F.lit(0.0), lambda a, x: a + x.cast("double") * x
        ).alias("sq")
    ).collect()
    assert all(abs(r.sq - 1.0) < 1e-5 for r in norms)

    q = F.broadcast(
        emb.where(F.col("vec_id") == 8).select(F.col("embedding").alias("q_emb"))
    )
    top = (
        emb.where(F.col("vec_id") != 8)
        .crossJoin(q)
        .select("vec_id", dot(F.col("embedding"), F.col("q_emb")).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(3)
        .collect()
    )
    # A byte-histogram is a coarse feature; the planted near-dup must still
    # sit in the top-3 with near-unit cosine (exact rank depends on other
    # clique members of the synthetic corpus).
    by_id = {r.vec_id: r.cosine for r in top}
    assert 12 in by_id and by_id[12] > 0.999, top
