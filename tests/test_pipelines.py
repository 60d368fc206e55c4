"""Corpus-curation pipeline (pipelines/corpus.py): the end-to-end
composition of the quality / language / exact-dedup / near-dedup / sample
gates. The individual gates are oracle-verified operators; these tests pin
the composition: funnel monotonicity, determinism, near-dup keeper
semantics against the planted duplicate pair, and sample-gate arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from parallel_mapreduce_wordcounting_spark.operators.dedup import (
    min_label_propagation,
    near_dup_pairs,
    shingle_sets_of,
)
from parallel_mapreduce_wordcounting_spark.pipelines import curate, funnel
from parallel_mapreduce_wordcounting_spark.sources.loader import load_table

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


def test_near_dup_cluster_keeps_exactly_the_min_gate_passing_label(spark):
    """Keeper selection runs over the GATE-SURVIVING subset (ADVICE r3):
    each near-dup cluster of the survivor graph contributes exactly its min
    doc_id to the curated set — and no content is silently lost when a
    full-corpus cluster's canonical doc fails a gate, because clustering
    never sees the gate-failing doc in the first place."""
    curated = {r.doc_id for r in curate(spark, SF).collect()}
    # reproduce the pipeline's survivor set (default gates: en, 20 tokens,
    # TTR >= 0.1) and its near-dup clusters
    d = load_table(spark, SF, "documents")
    toks = F.split(F.lower("text"), " ")
    surv = d.where(
        (F.size(toks) >= 20)
        & (F.size(F.array_distinct(toks)).cast("double") / F.size(toks) >= 0.1)
        & (F.col("lang") == "en")
    ).select("doc_id", "text")
    pairs = near_dup_pairs(shingle_sets_of(surv)).select("doc_id_a", "doc_id_b")
    edges = (
        pairs.select(F.col("doc_id_a").alias("u"), F.col("doc_id_b").alias("v"))
        .unionAll(
            pairs.select(F.col("doc_id_b").alias("u"), F.col("doc_id_a").alias("v"))
        )
        .distinct()
    )
    clusters = min_label_propagation(edges).collect()
    assert len(clusters) > 0  # fixture plants near-dups among survivors
    for row in clusters:
        if row.u == row.label:
            assert row.u in curated, "cluster canonical must survive"
        else:
            assert row.u not in curated, "non-canonical members must drop"
    # and no two curated docs are near-duplicates of each other
    curated_docs = surv.where(F.col("doc_id").isin(*curated))
    assert near_dup_pairs(shingle_sets_of(curated_docs)).count() == 0


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

    from parallel_mapreduce_wordcounting_spark.operators.multimodal import (
        mm_embed_vectors,
    )
    from parallel_mapreduce_wordcounting_spark.operators.similarity import dot

    emb = mm_embed_vectors(spark, SF)
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
