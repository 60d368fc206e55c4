"""End-to-end training-corpus curation — the composition the individual
LLM-pipeline operators exist for, as one reusable API:

    quality gate → language gate → exact dedup → near-dup dedup → sample

Design: one flags DataFrame (`curation_flags`) carries a boolean per stage
per document, so

- `curate()` is a single conjunctive filter over it (one job, no
  intermediate materialization), and
- `funnel_df()` — the per-stage survivor counts every curation run needs
  for its report — is ONE aggregate over the same flags, not five separate
  count() jobs re-running the pipeline per stage. `funnel()` is the
  convenience dict accessor; library code itself never collects (ADVICE r3).

Keeper selection runs over the GATE-SURVIVING subset, not the full corpus
(ADVICE r3): if a duplicate group's full-corpus canonical representative
fails the quality or language gate, dedup-over-everything would drop the
whole group with no survivor. Filtering first guarantees every surviving
duplicate group keeps exactly one gate-passing representative — and shrinks
the dedup input, which at 100 TB is the difference between shingling the
whole crawl and shingling the ~half that passes cheap gates.

Each gate reuses the registered operator's exact semantics (same
expressions as `text_quality`, `text_langid`, `dedup_exact`,
`dedup_cluster`), so the composed `pipeline_curate` registry key is fully
SQL-oracle-able, recursive near-dup CTE included.

Scale: the quality gate is one token aggregate per row (no shuffle); exact
keeper selection is a min-aggregate on the text key; near-dup keepers come
from the MinHash-LSH + connected-components path (`dedup.py` — banded,
never all-pairs) over survivors only; the sample is a deterministic
hash-mod, no sort, no collect. Stage order in `curate` is just filter
conjunction — Catalyst is free to evaluate the cheap flags first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    JACCARD_THRESHOLD,
    _ORACLE_PAIR_JACCARD,
    min_label_propagation,
    near_dup_pairs,
    shingle_sets_of,
)
from ..registry import register
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
    - exact_keeper: doc is the min doc_id among byte-identical texts WITHIN
      the quality+lang survivors (gate-failing copies don't vote; a doc that
      fails a gate is never a keeper).
    - near_keeper: doc is the canonical min-label of its near-duplicate
      cluster computed over the survivors (`dedup_cluster` semantics:
      MinHash-LSH pairs → connected components). Survivors in no cluster
      are their own keeper.
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
    surv = flags.where(F.col("pass_quality") & F.col("pass_lang")).select(
        "doc_id", "text", "text_key"
    )
    exact_min = surv.groupBy("text_key").agg(F.min("doc_id").alias("keep_doc_id"))
    pairs = near_dup_pairs(shingle_sets_of(surv)).select("doc_id_a", "doc_id_b")
    edges = (
        pairs.select(F.col("doc_id_a").alias("u"), F.col("doc_id_b").alias("v"))
        .unionAll(
            pairs.select(F.col("doc_id_b").alias("u"), F.col("doc_id_a").alias("v"))
        )
        .distinct()
    )
    clusters = min_label_propagation(edges).select(
        F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    return (
        flags.join(exact_min, "text_key", "left")
        .withColumn(
            "exact_keeper",
            F.col("pass_quality")
            & F.col("pass_lang")
            & (F.col("doc_id") == F.col("keep_doc_id")),
        )
        .join(clusters, "doc_id", "left")
        .withColumn(
            "near_keeper",
            F.col("pass_quality")
            & F.col("pass_lang")
            & (F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id"))),
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


def funnel_df(spark: SparkSession, sf_dir: str, **kwargs) -> DataFrame:
    """One-row DataFrame of survivor counts after each successive stage
    (columns ``total, quality, lang, exact_dedup, near_dedup, sample``;
    each count applies all stages up to and including that one). Returned
    un-collected so callers compose it like any other query."""
    flags = curation_flags(spark, sf_dir, **kwargs)
    cum = F.lit(True)
    aggs = [F.count("*").alias("total")]
    names = ["quality", "lang", "exact_dedup", "near_dedup", "sample"]
    for name, c in zip(names, _STAGES):
        cum = cum & F.col(c)
        aggs.append(F.sum(cum.cast("long")).alias(name))
    return flags.agg(*aggs)


def funnel(spark: SparkSession, sf_dir: str, **kwargs) -> dict[str, int]:
    """Convenience accessor: `funnel_df` collapsed to a plain dict (the one
    place the pipeline collects, and it is a single aggregated row)."""
    return funnel_df(spark, sf_dir, **kwargs).collect()[0].asDict()


# Quality/lang gates mirrored in SQL (defaults: min_tokens=20, min_ttr=0.1,
# langs=('en',)) — the token expressions match `curation_flags` op-for-op so
# the >= boundary compares the identical IEEE doubles on both engines.
_ORACLE_QUALITY = (
    "len(string_split(lower(text), ' ')) >= 20 AND "
    "(1.0 * len(list_distinct(string_split(lower(text), ' ')))) "
    "/ len(string_split(lower(text), ' ')) >= 0.1"
)

PIPELINE_CURATE_ORACLE = (
    "WITH RECURSIVE "
    f"surv AS (SELECT doc_id, lang, text FROM documents "
    f"WHERE ({_ORACLE_QUALITY}) AND lang IN ('en')), "
    "ek AS (SELECT text, min(doc_id) AS keep_doc_id FROM surv GROUP BY text), "
    "tok AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM surv), "
    "sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM tok WHERE len(t) >= 3), "
    "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db FROM sh a JOIN sh b "
    f"ON a.doc_id < b.doc_id WHERE {_ORACLE_PAIR_JACCARD} >= {JACCARD_THRESHOLD}), "
    "edges AS (SELECT da AS u, db AS v FROM pairs UNION SELECT db, da FROM pairs), "
    "reach AS ("
    "  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) "
    "  UNION "
    "  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u"
    "), clus AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u) "
    "SELECT s.doc_id, s.lang, s.text FROM surv s "
    "JOIN ek ON s.text = ek.text AND s.doc_id = ek.keep_doc_id "
    "LEFT JOIN clus c ON s.doc_id = c.doc_id "
    "WHERE c.cluster_id IS NULL OR s.doc_id = c.cluster_id"
)


@register("pipeline_curate", oracle=PIPELINE_CURATE_ORACLE, tier="B")
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline as a driver-verified registry key —
    `curate()` at its defaults (en-only, min 20 tokens, TTR ≥ 0.1, no
    sampling). The oracle reproduces every stage in one SQL statement:
    gate filters, exact-keeper min-aggregate, and the near-dup connected
    components as a recursive CTE over exact-Jaccard pairs of the surviving
    docs — the LSH path's miss probability above threshold is < 1e-7
    (dedup.py module docstring), so both sides agree exactly."""
    return curate(spark, sf_dir)
