"""Operators STAGED for round-8 registration (implemented + oracle-tested
now, deliberately NOT ``@register``-ed yet): the driver verifies only the
first 50 ``queries()`` keys per round and round 7's additions filled the
window to 49/50 (COVERAGE.md "verification budget"), so registering these
now would push never-verified keys outside the window. tests/test_staged_r8.py
runs the same fn-vs-DuckDB compare the registry harness would; round 8 adds
the decorators (and moves each oracle constant into the decorator call)
without touching the bodies.

Contents — the association-rules / radius-search / forecast-eval trio that
rounds out the analytics surface:

- ``event_assoc_rules``: market-basket co-occurrence over (user, day)
  baskets with support / directional confidence / lift.
- ``sim_range_search``: radius (threshold) similarity query — the range
  twin of sim_knn_query's top-k.
- ``event_forecast_baseline``: seasonal-naive (lag-7-day) forecast with
  per-day absolute/relative error — the baseline every forecasting system
  is judged against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table, ts_day
from .exact import floor_day_us_sql
from .similarity import _DOT_ORACLE, dot

EVENT_ASSOC_RULES_ORACLE = (
    "WITH b AS ("
    f"  SELECT DISTINCT user_id, {floor_day_us_sql()} AS day, event_type"
    "  FROM events"
    "), nb AS (SELECT count(*) AS n_baskets FROM (SELECT DISTINCT user_id, day FROM b)), "
    "item AS (SELECT event_type, count(*) AS n FROM b GROUP BY event_type), "
    "pair AS ("
    "  SELECT x.event_type AS ante, y.event_type AS cons, count(*) AS n_ab"
    "  FROM b x JOIN b y ON x.user_id = y.user_id AND x.day = y.day"
    "  AND x.event_type < y.event_type GROUP BY 1, 2"
    ") SELECT p.ante, p.cons, CAST(p.n_ab AS BIGINT) AS n_ab, "
    "round(p.n_ab / (1.0 * nb.n_baskets), 6) AS support, "
    "round(p.n_ab / (1.0 * ia.n), 6) AS conf_ante_cons, "
    "round(p.n_ab / (1.0 * ic.n), 6) AS conf_cons_ante, "
    "round((p.n_ab * nb.n_baskets) / (1.0 * ia.n * ic.n), 6) AS lift "
    "FROM pair p JOIN item ia ON p.ante = ia.event_type "
    "JOIN item ic ON p.cons = ic.event_type CROSS JOIN nb"
)


def event_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over daily per-user event baskets: for every
    unordered event-type pair, its co-occurrence support, both directional
    confidences, and lift — the market-basket statistics (Agrawal et al.
    1993) that turn an event log into "users who error also churn"-style
    findings.

    Exactness: every statistic is ONE double division of exact int64
    products (counts are small enough that n_ab·n_baskets and n_a·n_b stay
    well inside int64), so both engines compute bit-identical doubles
    before the 6-dp round.

    Scale: events collapse to DISTINCT (user, day, type) in one map-side-
    combining aggregate; the pair self-join runs per basket and is bounded
    by (types-per-basket)² — with a bounded event vocabulary this is the
    inverted-index shape, never corpus×corpus. Item counts and the 1-row
    basket total ride as broadcasts."""
    e = load_table(spark, sf_dir, "events")
    b = e.select("user_id", ts_day("ts").alias("day"), "event_type").distinct()
    nb = F.broadcast(
        b.select("user_id", "day").distinct().agg(F.count("*").alias("n_baskets"))
    )
    item = b.groupBy("event_type").agg(F.count("*").alias("n"))
    x, y = b.alias("x"), b.alias("y")
    pair = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.day") == F.col("y.day"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("ante"), F.col("y.event_type").alias("cons")
        )
        .agg(F.count("*").alias("n_ab"))
    )
    ia = F.broadcast(item.select(F.col("event_type").alias("ante"), F.col("n").alias("n_a")))
    ic = F.broadcast(item.select(F.col("event_type").alias("cons"), F.col("n").alias("n_c")))
    return (
        pair.join(ia, "ante")
        .join(ic, "cons")
        .crossJoin(nb)
        .select(
            "ante",
            "cons",
            "n_ab",
            F.round(F.col("n_ab") / (1.0 * F.col("n_baskets")), 6).alias("support"),
            F.round(F.col("n_ab") / (1.0 * F.col("n_a")), 6).alias("conf_ante_cons"),
            F.round(F.col("n_ab") / (1.0 * F.col("n_c")), 6).alias("conf_cons_ante"),
            F.round(
                (F.col("n_ab") * F.col("n_baskets"))
                / (1.0 * F.col("n_a") * F.col("n_c")),
                6,
            ).alias("lift"),
        )
    )


SIM_RANGE_SEARCH_ORACLE = (
    f"SELECT b.vec_id AS vec_id, round({_DOT_ORACLE}, 6) AS cosine, b.label AS label "
    "FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0 "
    f"WHERE round({_DOT_ORACLE}, 6) >= 0.25"
)


def sim_range_search(
    spark: SparkSession, sf_dir: str, threshold: float = 0.25
) -> DataFrame:
    """Radius similarity search: ALL neighbors of the vec_id=0 query above
    a cosine threshold — the range twin of sim_knn_query's top-k (dedup and
    recall-oriented retrieval want "everything closer than τ", not a fixed
    k). The threshold compares the 6-dp ROUNDED cosine so the boundary set
    is identical cross-engine.

    Scale: 1-row query broadcast, corpus streams — same plan as
    sim_knn_query minus the heap; output size is data-dependent, which is
    exactly why range search exists."""
    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    )
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "vec_id",
            F.round(dot(F.col("embedding"), F.col("q_emb")), 6).alias("cosine"),
            "label",
        )
        .where(F.col("cosine") >= threshold)
    )


EVENT_FORECAST_BASELINE_ORACLE = (
    "WITH d AS ("
    f"  SELECT {floor_day_us_sql()} AS day, count(*) AS actual"
    "  FROM events GROUP BY 1"
    ") SELECT c.day, CAST(c.actual AS BIGINT) AS actual, "
    "CAST(p.actual AS BIGINT) AS forecast, "
    "CAST(abs(c.actual - p.actual) AS BIGINT) AS abs_err, "
    "round(abs(c.actual - p.actual) / (1.0 * c.actual), 6) AS rel_err "
    "FROM d c JOIN d p ON c.day = p.day + 7"
)


def event_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each day's event volume
    as the volume 7 days earlier and score per-day absolute/relative error
    — the baseline every real forecasting model must beat, and the shape of
    a data-quality freshness monitor (alert when today diverges from last
    week).

    Plan note: the lag-7 lookup is a self-JOIN of the per-day aggregate on
    day = day+7, NOT a global window — the aggregate is calendar-sized, but
    a partition-less window is the one plan shape this repo bans
    (plan_audit.py), and the join form stays banned-pattern-free at any
    calendar length."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(ts_day("ts").alias("day")).agg(F.count("*").alias("actual"))
    cur, prev = d.alias("c"), d.alias("p")
    return (
        cur.join(prev, F.col("c.day") == F.col("p.day") + 7)
        .select(
            F.col("c.day").alias("day"),
            F.col("c.actual").alias("actual"),
            F.col("p.actual").alias("forecast"),
            F.abs(F.col("c.actual") - F.col("p.actual")).alias("abs_err"),
            F.round(
                F.abs(F.col("c.actual") - F.col("p.actual"))
                / (1.0 * F.col("c.actual")),
                6,
            ).alias("rel_err"),
        )
    )
