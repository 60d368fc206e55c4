"""Operators implemented and tested this round but NOT yet registered —
the driver's 50-slot verification window is full (COVERAGE.md, "Driver
verification budget"). Round 4 registers each with the oracle constant
kept beside it; until then tests/test_staged.py compares them to DuckDB
directly. (tpch_q20 in tpch_full.py is staged the same way.)

Both operators here are scale patterns a 100 TB training-data pipeline
needs and the registry does not yet carry:

- ``sample_stratified`` — per-stratum quota sampling (corpus balancing:
  "take N documents per language"). The pseudo-random order inside each
  stratum is md5 of the doc id — deterministic AND identical in Spark and
  DuckDB, so the sample is fully oracle-able (unlike rand()- or
  xxhash64-based sampling).
- ``join_salted`` — the skew-salting join pattern: the fact side's hot
  keys are spread over ``n_salt`` synthetic sub-keys and the dimension
  side is exploded to match, so one hot key becomes ``n_salt`` parallel
  tasks instead of one straggler. The RESULT is provably identical to the
  plain join (salting only changes the partitioning), so the oracle is
  simply the unsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loader import load_table
from .exact import money_sum, money_sum_sql

SAMPLE_STRATIFIED_ORACLE = (
    "SELECT doc_id, lang, rank_in_stratum FROM ("
    "  SELECT doc_id, lang, CAST(row_number() OVER ("
    "    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id"
    "  ) AS INTEGER) AS rank_in_stratum FROM documents"
    ") WHERE rank_in_stratum <= 40"
)


def sample_stratified(
    spark: SparkSession, sf_dir: str, n_per_stratum: int = 40
) -> DataFrame:
    """Deterministic per-language quota sample: the first ``n_per_stratum``
    documents of each ``lang`` under the md5(doc_id) pseudo-random order
    (md5 of the decimal string is bit-identical in Spark and DuckDB, so the
    sampled SET is cross-engine reproducible — a rand()-based sampler is
    not oracle-able at all).

    Scale: one shuffle on ``lang``; each stratum sorts only its own rows
    and the window cuts at the quota. With very few, very large strata the
    per-stratum sort dominates — then switch to an approximate two-pass
    quantile cut on the hash; for corpus-balancing stratum counts
    (languages, domains) this single-window form is the right plan.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rank_in_stratum"))
        .where(F.col("rank_in_stratum") <= n_per_stratum)
    )


JOIN_SALTED_ORACLE = (
    "SELECT s.s_nationkey, "
    f"{money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue, "
    "count(*) AS n_items "
    "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "GROUP BY s.s_nationkey"
)


def join_salted(
    spark: SparkSession, sf_dir: str, n_salt: int = 8
) -> DataFrame:
    """Skew-salted fact⋈dimension join: revenue by supplier nation.

    The fact side tags every row with ``salt = pmod(xxhash64(key), n_salt)``
    and the dimension side is exploded ``n_salt``-fold, joining on
    ``(key, salt)`` — a hot supplier's rows now land in ``n_salt`` tasks
    instead of one straggler. Because every fact row still matches exactly
    one dimension copy, the join output (and thus the aggregate) is
    IDENTICAL to the unsalted join — the oracle is the plain SQL, which is
    what makes the pattern verifiable. Use when a key's row count exceeds
    what one task should own and the dimension is too big to broadcast
    whole but small enough to replicate ``n_salt``× (or let AQE's skew-join
    split do it at runtime; this is the explicit form).
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    salted_fact = l.withColumn(
        "salt", F.pmod(F.xxhash64("l_suppkey", "l_orderkey"), F.lit(n_salt))
    )
    salted_dim = s.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        salted_fact.join(
            salted_dim,
            (salted_fact.l_suppkey == salted_dim.s_suppkey)
            & (salted_fact.salt == salted_dim.salt),
        )
        .groupBy("s_nationkey")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )
