"""Scale-pattern operators staged in round 3 (the driver's 50-slot
verification window was full — COVERAGE.md) and REGISTERED in round 4, each
with the oracle constant kept beside it; tests/test_staged.py additionally
compares them to DuckDB directly. (tpch_q20 in tpch_full.py followed the
same staging path.)

All are scale patterns a 100 TB training-data pipeline needs:

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

from ..registry import register
from ..sources.loader import load_table, ts_us
from .exact import money_sum, money_sum_sql

SAMPLE_STRATIFIED_ORACLE = (
    "SELECT doc_id, lang, rank_in_stratum FROM ("
    "  SELECT doc_id, lang, CAST(row_number() OVER ("
    "    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id"
    "  ) AS INTEGER) AS rank_in_stratum FROM documents"
    ") WHERE rank_in_stratum <= 40"
)


@register("sample_stratified", oracle=SAMPLE_STRATIFIED_ORACLE, tier="B")
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


EVENT_SESSIONIZE_ORACLE = (
    "WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events), "
    "gaps AS ("
    "  SELECT user_id, event_id, ts_us, "
    "    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 "
    "         OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS is_start "
    "  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)"
    "), sess AS ("
    "  SELECT user_id, ts_us, CAST(sum(is_start) OVER ("
    "    PARTITION BY user_id ORDER BY ts_us, event_id"
    "  ) AS BIGINT) AS session_id FROM gaps"
    ") SELECT user_id, session_id, count(*) AS n_events, "
    "min(ts_us) AS start_us, max(ts_us) AS end_us "
    "FROM sess GROUP BY user_id, session_id"
)


@register("event_sessionize", oracle=EVENT_SESSIONIZE_ORACLE, tier="B")
def event_sessionize(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Batch sessionization with explicit session ids: a user's events more
    than ``gap_minutes`` apart start a new session (the lag → boundary-flag
    → running-sum pattern; `stream_session` counts per session window but
    never materializes a joinable session id — this does).

    All arithmetic is exact integer microseconds (engine-independent; same
    convention as events_analytics.py). One shuffle on user_id serves the
    lag window, the running sum, AND the final per-session aggregate —
    Catalyst keeps all three in the same user_id partitioning.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_us("ts").alias("ts_us")
    )
    return sessionize_events(e, gap_minutes)


def sessionize_events(e: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Core sessionization over a ``(user_id, event_id, ts_us)`` DataFrame —
    separated from the table loader so property tests can drive it with
    synthetic streams."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = e.withColumn(
        "is_start",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, 1
        ).when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0),
    )
    with_ids = flagged.withColumn(
        "session_id",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_ids.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


def agg_sketch_merge_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting: one HLL sketch per day
    (``hll_sketch_agg``), then ``hll_union_agg`` folds the daily sketches
    into the period total — the pattern that replaces count-distinct at
    100 TB (per-partition/day sketches are tiny, merge is register-max:
    commutative, idempotent, order-independent, so incremental daily jobs
    and the one-shot batch agree EXACTLY, not just approximately).

    Output: per-day estimates plus the merged period estimate (LIBRARY
    form; the registered ``agg_sketch_merge`` wraps it in the
    hash-certifiable census below)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    per_day = daily.select(
        "day", F.hll_sketch_estimate("sk").alias("est_users")
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    ).select(F.lit(None).cast("timestamp").alias("day"), "est_users")
    return per_day.unionByName(total).orderBy(F.col("day").asc_nulls_last())


#: HLL error budget the census certifies: Spark's default lgConfigK=12
#: gives a relative standard error of 1.04/√4096 ≈ 1.63%; 10% is ~6σ —
#: generous enough to never flap, tight enough that a broken sketch
#: (wrong column, dropped day, corrupted merge) still trips it. The +2
#: absolute slack covers tiny days where one register flip is > 10%.
_HLL_REL_BOUND = 0.10

# ROUND-11 ORACLE (staged; flip with the r11/r12 window): the estimates
# themselves are Spark-sketch-specific (DuckDB's approx_count_distinct is
# a different sketch), but the census facts are SQL truths — the day
# spine, the EXACT per-day/total cardinalities, the 6σ error-bound
# booleans, and the merge-vs-single-pass identity (TRUE by the register-
# max theorem; FALSE would mean the union aggregate broke).
AGG_SKETCH_MERGE_ORACLE = (
    "WITH d AS ("
    "  SELECT CAST(date_trunc('day', make_timestamp(epoch_ns(ts) // 1000)) "
    "  AS TIMESTAMP) AS day, user_id FROM events"
    ") SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, "
    "TRUE AS est_in_bound, TRUE AS merge_consistent FROM d GROUP BY day "
    "UNION ALL "
    "SELECT CAST(NULL AS TIMESTAMP) AS day, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, "
    "TRUE AS est_in_bound, TRUE AS merge_consistent FROM d"
)


@register("agg_sketch_merge", oracle=AGG_SKETCH_MERGE_ORACLE, tier="B")
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REGISTERED form of :func:`agg_sketch_merge_estimates` — the
    same day-spine rows, re-projected onto hash-certifiable facts (the
    dedup_lsh_cosine_census pattern; r9 verdict item 3):

    - ``exact_users``: the exact per-day (and total, day=NULL) distinct
      count, computed here alongside the sketches;
    - ``est_in_bound``: the HLL estimate sits within the documented ~6σ
      envelope of exact (:data:`_HLL_REL_BOUND`);
    - ``merge_consistent``: ``hll_union_agg`` over the daily sketches
      and a single whole-period ``hll_sketch_agg`` give the SAME
      estimate — the register-max merge identity, certified exactly.

    The sketches still do all the estimating (a corrupted sketch or
    merge trips a boolean); the library estimate stream stays available
    as :func:`agg_sketch_merge_estimates`."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").cast("long").alias("exact_users"),
    )
    in_bound = (
        F.abs(F.hll_sketch_estimate(F.col("sk")) - F.col("exact_users"))
        <= F.greatest(_HLL_REL_BOUND * F.col("exact_users"), F.lit(2.0))
    )
    merged_vs_single = F.broadcast(
        daily.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
        ).crossJoin(
            e.agg(
                F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
                    "single_est"
                ),
                F.count_distinct("user_id").cast("long").alias("exact_total"),
            )
        )
    )
    # eqNullSafe / coalesce: on an EMPTY corpus both estimates are null and
    # exact is 0 — the census must still say "consistent, in bound" rather
    # than emit null booleans (empty-corpus sweep convention)
    consistent = F.col("merged_est").eqNullSafe(F.col("single_est"))
    per_day = daily.crossJoin(merged_vs_single).select(
        "day",
        "exact_users",
        in_bound.alias("est_in_bound"),
        consistent.alias("merge_consistent"),
    )
    total = merged_vs_single.select(
        F.lit(None).cast("timestamp").alias("day"),
        F.col("exact_total").alias("exact_users"),
        F.coalesce(
            F.abs(F.col("merged_est") - F.col("exact_total"))
            <= F.greatest(_HLL_REL_BOUND * F.col("exact_total"), F.lit(2.0)),
            F.col("exact_total") == 0,
        ).alias("est_in_bound"),
        consistent.alias("merge_consistent"),
    )
    return per_day.unionByName(total).orderBy(F.col("day").asc_nulls_last())


TEXT_UNIGRAM_LOGPROB_ORACLE = (
    "WITH toks AS ("
    "  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
    "  FROM documents"
    "), freq AS ("
    "  SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY w"
    "), tot AS (SELECT sum(c) AS n FROM freq) "
    "SELECT t.doc_id, count(*) AS n_tokens, "
    "round(sum(ln(f.c / (1.0 * tot.n))) / count(*), 6) AS avg_logprob "
    "FROM toks t JOIN freq f ON t.w = f.w CROSS JOIN tot "
    "WHERE t.w <> '' "
    "GROUP BY t.doc_id"
)


@register("text_unigram_logprob", oracle=TEXT_UNIGRAM_LOGPROB_ORACLE, tier="B")
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average token log-likelihood under the corpus unigram
    model — the classic cheap LM-quality proxy (documents full of rare
    tokens score low; `text_entropy` measures WITHIN-doc diversity, this
    measures typicality AGAINST the corpus). Used as a filter threshold in
    pre-training pipelines where a real LM is too expensive to run on
    everything.

    Scale: the unigram table is vocabulary-sized → broadcast join onto the
    token stream; the global total rides along as a one-row broadcast. One
    shuffle for the frequency aggregate, one for the per-doc group.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    freq = toks.groupBy("w").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("n"))
    return (
        toks.join(F.broadcast(freq), "w")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(F.log(F.col("c") / (1.0 * F.col("n")))) / F.count("*"), 6
            ).alias("avg_logprob"),
        )
    )


JOIN_SALTED_ORACLE = (
    "SELECT s.s_nationkey, "
    f"{money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue, "
    "count(*) AS n_items "
    "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "GROUP BY s.s_nationkey"
)


@register("join_salted", oracle=JOIN_SALTED_ORACLE, tier="C")
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
