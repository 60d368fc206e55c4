"""End-to-end training-corpus curation — the composition the individual
LLM-pipeline operators exist for, as one reusable API:

    quality gate → language gate → exact dedup → near-dup dedup → sample

Design: one flags DataFrame (`curation_flags`) carries a boolean per stage
per document, so

- `curate()` is a single conjunctive filter over it (one job, no
  intermediate materialization), and
- `funnel()` — the per-stage survivor counts every curation run needs for
  its report — is ONE aggregate over the same flags, not five separate
  count() jobs re-running the pipeline per stage.

Each gate reuses the registered operator's exact semantics (same
expressions as `text_quality`, `text_langid`, `dedup_exact`,
`dedup_cluster`), so everything here is covered by the driver-verified
oracles of its parts.

Scale: the quality gate is one token aggregate on doc_id; exact-dedup
keeper selection is a min-aggregate on the text hash (sha2-256 keying, so
the shuffle key is 32 bytes, not the document); near-dup keepers come from
the MinHash-LSH + connected-components path (`dedup.py` — banded, never
all-pairs); the sample is a deterministic hash-mod, no sort, no collect.
Stage order in `curate` is just filter conjunction — Catalyst is free to
evaluate the cheap flags first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_cluster
from ..sources.loader import load_table


def curation_flags(
    spark: SparkSession,
    sf_dir: str,
    *,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 20,
    min_ttr: float = 0.1,
    sample_mod: int | None = None,
) -> DataFrame:
    """Per-document stage flags: ``(doc_id, pass_quality, pass_lang,
    exact_keeper, near_keeper, in_sample)``.

    - pass_quality: ≥ ``min_tokens`` whitespace tokens and type-token ratio
      ≥ ``min_ttr`` (the `text_quality` keep rule, parameterized).
    - pass_lang: document language ∈ ``langs`` (the labeled column, as in
      `text_langid`).
    - exact_keeper: doc is the min doc_id among byte-identical texts
      (sha2-256 keyed, the `dedup_exact` rule).
    - near_keeper: doc is the canonical min-label of its near-duplicate
      cluster (`dedup_cluster`: MinHash-LSH pairs → connected components).
      Docs in no cluster are their own keeper.
    - in_sample: deterministic systematic sample — xxhash64(doc_id) mod
      ``sample_mod`` == 0 (all true when ``sample_mod`` is None).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    n_tokens = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    flags = d.select(
        "doc_id",
        "text",
        ((n_tokens >= min_tokens) & (ttr >= min_ttr)).alias("pass_quality"),
        F.col("lang").isin(*langs).alias("pass_lang"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_key"),
        (
            F.lit(True)
            if sample_mod is None
            else (F.pmod(F.xxhash64("doc_id"), F.lit(sample_mod)) == 0)
        ).alias("in_sample"),
    )
    exact_min = flags.groupBy("text_key").agg(F.min("doc_id").alias("keep_doc_id"))
    clusters = dedup_cluster(spark, sf_dir)  # (doc_id, cluster_id), clustered docs only
    return (
        flags.join(exact_min, "text_key")
        .withColumn("exact_keeper", F.col("doc_id") == F.col("keep_doc_id"))
        .join(clusters, "doc_id", "left")
        .withColumn(
            "near_keeper",
            F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id")),
        )
        .select(
            "doc_id",
            "pass_quality",
            "pass_lang",
            "exact_keeper",
            "near_keeper",
            "in_sample",
        )
    )


_STAGES = ("pass_quality", "pass_lang", "exact_keeper", "near_keeper", "in_sample")


def curate(spark: SparkSession, sf_dir: str, **kwargs) -> DataFrame:
    """The curated corpus: documents passing every stage, with their text.
    Deterministic — every gate is a pure function of document content/ids."""
    flags = curation_flags(spark, sf_dir, **kwargs)
    cond = F.lit(True)
    for c in _STAGES:
        cond = cond & F.col(c)
    d = load_table(spark, sf_dir, "documents")
    return flags.where(cond).select("doc_id").join(d, "doc_id").select(
        "doc_id", "lang", "text"
    )


def funnel(spark: SparkSession, sf_dir: str, **kwargs) -> dict[str, int]:
    """Survivor count after each successive stage — one aggregate job.

    Returns ``{"total": n, "quality": n1, "lang": n2, "exact_dedup": n3,
    "near_dedup": n4, "sample": n5}`` where each count applies all stages up
    to and including that one (the standard curation funnel report)."""
    flags = curation_flags(spark, sf_dir, **kwargs)
    cum = F.lit(True)
    aggs = [F.count("*").alias("total")]
    names = ["quality", "lang", "exact_dedup", "near_dedup", "sample"]
    for name, c in zip(names, _STAGES):
        cum = cum & F.col(c)
        aggs.append(F.sum(cum.cast("long")).alias(name))
    row = flags.agg(*aggs).collect()[0]
    return row.asDict()
