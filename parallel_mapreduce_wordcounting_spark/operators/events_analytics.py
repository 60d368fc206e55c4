"""Event-stream analytics in batch-checkable form: conversion funnels,
cohort retention, inter-event gap statistics, and per-window top-k — the
product-analytics layer over the events table.

Timestamps: all arithmetic is in integer microseconds (the loader's ns→µs
conversion; oracles mirror with epoch_ns // 1000), so ordering, gaps, and
day bucketing are exact on both engines. Gap averages divide exact integer
sums — no float accumulation anywhere.

Scale: every query shuffles once on user_id (funnel, retention, gaps) or
(hour, type) (top-k); min/max/sum aggregates are map-side combinable. The
funnel's staged min-after-min computation is three aggregates over the
same user-partitioned shuffle, not a self-join explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table, ts_day, ts_us
from .exact import floor_day_us_sql, money_cents, money_cents_sql


@register(
    "event_funnel",
    oracle=(
        "WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events), "
        "s AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id), "
        "v AS (SELECT e.user_id, min(e.ts_us) AS t2 FROM e JOIN s ON e.user_id = s.user_id "
        "WHERE e.event_type = 'view' AND e.ts_us > s.t1 GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts_us) AS t3 FROM e JOIN v ON e.user_id = v.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts_us > v.t2 GROUP BY e.user_id) "
        "SELECT (SELECT count(*) FROM s) AS n_signup, "
        "(SELECT count(*) FROM v) AS n_view_after, "
        "(SELECT count(*) FROM p) AS n_purchase_after"
    ),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → purchase: users counted at
    stage k only if the stage-k event strictly follows their stage-(k-1)
    event. Three min-aggregates chained by per-user joins. Every exchange
    in the plan is hash(user_id) (plan-read r9: five of them — each stage's
    pre-FILTERED event stream crosses the wire once, plus the chained
    join/agg reuses), so per-stage traffic is the filtered subset, never
    the full event log; a single-shuffle window-chain form would move ALL
    events through one exchange instead — more bytes, fewer barriers —
    and only wins when the three stage types dominate the log."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", ts_us("ts").alias("ts_us")
    )
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    v = (
        e.where(F.col("event_type") == "view")
        .join(s, "user_id")
        .where(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(v.agg(F.count("*").alias("n_view_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after")))
    )


@register(
    "event_retention",
    oracle=(
        "WITH e AS (SELECT user_id, "
        f"{floor_day_us_sql()} AS day FROM events), "
        "first AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id), "
        "activity AS (SELECT DISTINCT e.user_id, f.cohort_day, e.day - f.cohort_day AS day_offset "
        "FROM e JOIN first f ON e.user_id = f.user_id) "
        "SELECT cohort_day, day_offset, count(*) AS n_users "
        "FROM activity WHERE day_offset <= 7 GROUP BY cohort_day, day_offset"
    ),
)
def event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active epoch-day,
    counted on each of their first 7 offset days. Day bucketing is integer
    µs // 86400e6 — exact, no timezone/calendar dependence."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", ts_day("ts").alias("day")
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        e.join(first, "user_id")
        .select(
            "user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .distinct()
    )
    return (
        activity.where(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "event_gap_stats",
    oracle=(
        "WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us FROM events), "
        "gaps AS (SELECT user_id, ts_us - lag(ts_us) OVER "
        "(PARTITION BY user_id ORDER BY ts_us) AS gap FROM e) "
        "SELECT user_id, count(gap) AS n_gaps, "
        "CAST(sum(gap) AS BIGINT) AS total_gap_us, max(gap) AS max_gap_us, "
        "CAST(sum(gap) AS BIGINT) / (1.0 * count(gap)) AS avg_gap_us "
        "FROM gaps WHERE gap IS NOT NULL GROUP BY user_id"
    ),
)
def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user (sessionization's raw material).
    Gaps are exact integer µs; the average is an exact-int division."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", ts_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gaps = e.select(
        "user_id", (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap").alias("n_gaps"),
        F.sum("gap").alias("total_gap_us"),
        F.max("gap").alias("max_gap_us"),
        # no rounding: the division of two exact integers is IEEE-identical
        # on both engines, while round(±3.6e10, 6) differs at the final ulp
        (F.sum("gap") / (1.0 * F.count("gap"))).alias("avg_gap_us"),
    )


@register(
    "stream_win_topk",
    oracle=(
        "WITH w AS (SELECT date_trunc('hour', make_timestamp(epoch_ns(ts) // 1000)) "
        "AS w_start, event_type, count(*) AS cnt FROM events GROUP BY 1, 2) "
        "SELECT w_start, event_type, cnt FROM ("
        "SELECT *, row_number() OVER (PARTITION BY w_start "
        "ORDER BY cnt DESC, event_type) AS rn FROM w) WHERE rn = 1"
    ),
)
def stream_win_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant event type per tumbling hour — windowed aggregation followed
    by per-window rank-1 (the trending-items shape; in streaming mode the
    rank runs on the complete-mode sink of the windowed counts)."""
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("w_start"), "event_type", "cnt")
    )
    w = Window.partitionBy("w_start").orderBy(F.col("cnt").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("w_start", "event_type", "cnt")
    )


EVENT_TRANSITIONS_ORACLE = (
    "WITH e AS ("
    "  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, event_id"
    "  FROM events"
    "), pairs AS ("
    "  SELECT user_id, lag(event_type) OVER ("
    "    PARTITION BY user_id ORDER BY ts_us, event_id"
    "  ) AS prev_type, event_type AS next_type FROM e"
    "), cnt AS ("
    "  SELECT prev_type, next_type, count(*) AS n FROM pairs"
    "  WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type"
    "), tot AS (SELECT prev_type, sum(n) AS t FROM cnt GROUP BY prev_type) "
    "SELECT c.prev_type, c.next_type, CAST(c.n AS BIGINT) AS n, "
    "round(c.n / (1.0 * t.t), 6) AS p "
    "FROM cnt c JOIN tot t ON c.prev_type = t.prev_type"
)


@register("event_transitions", oracle=EVENT_TRANSITIONS_ORACLE)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    count and row-normalized probability for every (prev → next) event-type
    pair — the behavioral fingerprint behind next-action prediction and
    bot detection.

    Scale: one user_id shuffle for the lag, then the pair counts collapse
    to |types|² rows (tiny) — the per-prev totals join is between two
    type-cardinality aggregates, broadcast territory."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", ts_us("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    cnt = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return cnt.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / (1.0 * F.col("t")), 6).alias("p"),
    )


EVENT_ACTIVE_USERS_ORACLE = (
    "WITH du AS ("
    f"  SELECT DISTINCT {floor_day_us_sql()} AS day, user_id"
    "  FROM events"
    "), days AS (SELECT DISTINCT day FROM du) "
    "SELECT d.day, "
    "CAST((SELECT count(DISTINCT u.user_id) FROM du u WHERE u.day = d.day) AS BIGINT) AS dau, "
    "CAST((SELECT count(DISTINCT u.user_id) FROM du u"
    "      WHERE u.day BETWEEN d.day - 6 AND d.day) AS BIGINT) AS wau "
    "FROM days d"
)


@register("event_active_users", oracle=EVENT_ACTIVE_USERS_ORACLE)
def event_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day active users per day — the canonical growth
    metrics. Rolling COUNT(DISTINCT) can't be a window function, so the
    trailing window is an explicit (day, user) × trailing-day equi-ish join
    over the DISTINCT day-user pairs, which are already tiny (≤ days ×
    users, after the events table collapses).

    Scale: the expensive part — deduping events to day-user pairs — is one
    map-side-combining aggregate over events; everything after runs on the
    collapsed pairs. At extreme user counts the trailing distinct becomes
    the HLL-sketch union of per-day sketches (agg_sketch_merge is exactly
    that building block, registered separately)."""
    e = load_table(spark, sf_dir, "events")
    du = (
        e.select(ts_day("ts").alias("day"), "user_id")
        .distinct()
    )
    dau = du.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    days = du.select("day").distinct()
    wau = (
        days.alias("d")
        .join(
            du.alias("u"),
            (F.col("u.day") >= F.col("d.day") - 6) & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("u.user_id").alias("wau"))
    )
    return dau.join(wau, "day").select("day", "dau", "wau")


EVENT_PATHS_ORACLE = (
    "WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, "
    "event_id FROM events), "
    "s AS (SELECT event_type AS e1, "
    "lead(event_type, 1) OVER w AS e2, lead(event_type, 2) OVER w AS e3 "
    "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)) "
    "SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS cnt FROM s "
    "WHERE e3 IS NOT NULL GROUP BY e1, e2, e3 "
    "ORDER BY cnt DESC, e1, e2, e3 LIMIT 20"
)


@register("event_paths", oracle=EVENT_PATHS_ORACLE)
def event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 behavioral trigrams: the most common 3-step event-type
    sequences users actually walk (the path-analysis complement of
    ``event_transitions``' 2-step Markov matrix — funnels you DIDN'T
    design show up here first).

    Plan: one user_id shuffle for the ordered window (lead x2 share one
    sort), one map-side-combined aggregate on the trigram, and the top-20
    as a TakeOrderedAndProject heap with full-column tiebreak — no global
    sort, deterministic under any partitioning."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(ts_us(), "event_id")
    s = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        s.groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "e1", "e2", "e3")
        .limit(20)
    )


EVENT_SEASONALITY_ORACLE = (
    "WITH e AS (SELECT "
    f"({floor_day_us_sql()} + 4) % 7 AS dow, "
    "CAST(extract(hour FROM ts) AS INTEGER) AS hod, event_type FROM events) "
    "SELECT dow, hod, CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(count(DISTINCT event_type) AS BIGINT) AS n_types "
    "FROM e GROUP BY dow, hod"
)


@register("event_seasonality", oracle=EVENT_SEASONALITY_ORACLE)
def event_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x day-of-week activity matrix — the seasonality
    fingerprint behind anomaly baselines and capacity planning (compare a
    live hour against ITS OWN weekday-hour cell, not a global mean).
    Day-of-week is computed arithmetically — (floor epoch-day + 4) % 7,
    0=Sunday — on both engines, dodging the Spark-vs-DuckDB dayofweek()
    indexing mismatch (Spark is 1-based Sunday, DuckDB 0-based) entirely.

    Scale: one map-side-combined aggregate on a 7x24-bounded key space —
    output is <= 168 rows at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            ((ts_day() + 4) % 7).alias("dow"),
            F.hour("ts").alias("hod"),
            "event_type",
        )
        .groupBy("dow", "hod")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )

EVENT_GAP_FILL_ORACLE = (
    f"WITH e AS (SELECT {floor_day_us_sql()} AS day, event_type FROM events), "
    "span AS (SELECT min(day) AS d0, max(day) AS d1 FROM e), "
    "cal AS (SELECT unnest(generate_series(d0, d1)) AS day FROM span), "
    "types AS (SELECT DISTINCT event_type FROM e), "
    "counts AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2) "
    "SELECT t.event_type, c.day, CAST(coalesce(x.n, 0) AS BIGINT) AS n "
    "FROM cal c CROSS JOIN types t "
    "LEFT JOIN counts x ON x.event_type = t.event_type AND x.day = c.day"
)


@register("event_gap_fill", oracle=EVENT_GAP_FILL_ORACLE)
def event_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: a dense (event_type x day) daily-count grid over
    the table's full day span, zero-filled where a type logged nothing — the
    densification step every time-series chart, seasonal model, and
    moving-average window needs (a missing day silently skewing a 7-day
    mean is the classic bug this prevents).

    Plan: the only work proportional to the data is one map-side-combined
    (type, day) aggregate; the calendar is ``explode(sequence(min, max))``
    off a 1-row min/max aggregate and the grid is (days x types) — bounded
    by time span and type cardinality, NOT by corpus size, so at 100 TB the
    grid is still a few-thousand-row broadcast side and AQE picks a
    broadcast join against the (equally bounded) aggregated counts."""
    e = load_table(spark, sf_dir, "events").select(
        ts_day().alias("day"), "event_type"
    )
    span = e.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    types = e.select("event_type").distinct()
    grid = cal.crossJoin(F.broadcast(types))
    counts = e.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    return grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )


EVENT_ATTRIBUTION_ORACLE = (
    "WITH e AS (SELECT user_id, event_id, event_type, value, "
    "epoch_ns(ts) // 1000 AS ts_us FROM events), "
    "a AS (SELECT event_type, value, "
    "last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS) "
    "OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_source FROM e) "
    "SELECT coalesce(attr_source, 'direct') AS attr_source, "
    "CAST(count(*) AS BIGINT) AS n_purchases, "
    f"CAST(sum({money_cents_sql('value')}) AS BIGINT) AS revenue_cents "
    "FROM a WHERE event_type = 'purchase' GROUP BY 1"
)


@register("event_attribution", oracle=EVENT_ATTRIBUTION_ORACLE)
def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most recent
    strictly-preceding non-purchase event of the same user ('direct' when
    none precedes) — the marketing-analytics workhorse that turns an event
    log into a revenue-by-channel report.

    The attributed source is ``last(..., ignorenulls) OVER (rows unbounded
    preceding .. 1 preceding)`` — one user_id shuffle shared with the sort,
    no self-join (the naive as-of formulation is an O(n²) per-user join).
    Revenue sums integer cents (exact.money_cents), so the hash is exact in
    any summation order. Scale: the window state is one scalar per user
    (running last non-null), and the final aggregate has event-type-bounded
    cardinality."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", ts_us().alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attr = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("attr_source", attr)
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("attr_source", F.lit("direct")).alias("attr_source"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(money_cents(F.col("value"))).alias("revenue_cents"),
        )
    )


EVENT_RFM_ORACLE = (
    f"WITH e AS (SELECT user_id, {floor_day_us_sql()} AS day, "
    f"{money_cents_sql('value')} AS cents FROM events), "
    "u AS (SELECT user_id, max(day) AS last_day, "
    "CAST(count(*) AS BIGINT) AS freq, CAST(sum(cents) AS BIGINT) AS monet "
    "FROM e GROUP BY user_id), "
    "g AS (SELECT max(day) AS ref_day FROM e), "
    "r AS (SELECT ref_day - last_day AS rec, freq, monet FROM u CROSS JOIN g), "
    "q AS (SELECT quantile_cont(rec, 0.25) AS r25, quantile_cont(rec, 0.5) AS r50, "
    "quantile_cont(rec, 0.75) AS r75, quantile_cont(freq, 0.25) AS f25, "
    "quantile_cont(freq, 0.5) AS f50, quantile_cont(freq, 0.75) AS f75, "
    "quantile_cont(monet, 0.25) AS m25, quantile_cont(monet, 0.5) AS m50, "
    "quantile_cont(monet, 0.75) AS m75 FROM r) "
    "SELECT CAST(1 + CAST(rec <= r75 AS INTEGER) + CAST(rec <= r50 AS INTEGER) "
    "+ CAST(rec <= r25 AS INTEGER) AS INTEGER) AS r_score, "
    "CAST(1 + CAST(freq > f25 AS INTEGER) + CAST(freq > f50 AS INTEGER) "
    "+ CAST(freq > f75 AS INTEGER) AS INTEGER) AS f_score, "
    "CAST(1 + CAST(monet > m25 AS INTEGER) + CAST(monet > m50 AS INTEGER) "
    "+ CAST(monet > m75 AS INTEGER) AS INTEGER) AS m_score, "
    "CAST(count(*) AS BIGINT) AS n_users "
    "FROM r CROSS JOIN q GROUP BY 1, 2, 3"
)


@register("event_rfm", oracle=EVENT_RFM_ORACLE)
def event_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: each user scored 1–4 on Recency (days since last
    event, lower = better), Frequency (event count), and Monetary (cents
    sum), bucketed at the exact population quartiles; output is the ≤64-cell
    segment census (r, f, m, n_users) that CRM campaigns target.

    Deliberately NOT ``ntile(4)`` — a global ntile is a single-partition
    sort over every user (the pack_sequences scale-killer shape). Instead
    the quartile thresholds are one 9-value exact-percentile aggregate
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, same linear
    interpolation — established by agg_percentile) broadcast back as a
    1-row cross join, and scores are pure comparisons: two bounded shuffles
    total (user_id agg, then the ≤64-key census), no global sort. Monetary
    is integer cents; thresholds interpolate integers at f ∈ {0,.25,.5,.75}
    so the doubles are dyadic-exact on both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", ts_day().alias("day"), money_cents(F.col("value")).alias("cents")
    )
    u = e.groupBy("user_id").agg(
        F.max("day").alias("last_day"),
        F.count("*").alias("freq"),
        F.sum("cents").alias("monet"),
    )
    g = e.agg(F.max("day").alias("ref_day"))
    r = u.crossJoin(F.broadcast(g)).select(
        (F.col("ref_day") - F.col("last_day")).alias("rec"), "freq", "monet"
    )
    q = r.agg(
        *[
            F.percentile(c, F.lit(p)).alias(f"{c[0]}{int(p * 100)}")
            for c in ("rec", "freq", "monet")
            for p in (0.25, 0.5, 0.75)
        ]
    )
    s = r.crossJoin(F.broadcast(q))
    score = lambda m, t, op: sum(
        F.when(op(F.col(m), F.col(f"{m[0]}{pp}")), 1).otherwise(0) for pp in (25, 50, 75)
    )
    return (
        s.select(
            (1 + score("rec", "r", lambda a, b: a <= b)).cast("int").alias("r_score"),
            (1 + score("freq", "f", lambda a, b: a > b)).cast("int").alias("f_score"),
            (1 + score("monet", "m", lambda a, b: a > b)).cast("int").alias("m_score"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_users"))
    )


EVENT_FUNNEL_WINDOWED_ORACLE = (
    "WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events), "
    "s AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'signup' "
    "GROUP BY user_id), "
    "conv AS (SELECT DISTINCT s.user_id FROM e JOIN s ON e.user_id = s.user_id "
    "WHERE e.event_type = 'purchase' AND e.ts_us > s.t1 "
    "AND e.ts_us <= s.t1 + 604800000000), "
    f"c AS (SELECT {floor_day_us_sql('t1')} AS cohort_day, s.user_id, "
    "CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS converted "
    "FROM s LEFT JOIN conv ON s.user_id = conv.user_id) "
    "SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_signups, "
    "CAST(sum(converted) AS BIGINT) AS n_converted, "
    "round(sum(converted) * 100.0 / count(*), 6) AS conv_pct "
    "FROM c GROUP BY cohort_day"
)


@register("event_funnel_windowed", oracle=EVENT_FUNNEL_WINDOWED_ORACLE)
def event_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bound conversion by cohort: of each day's signups, what share
    purchased within 7 days of their signup? Unlike ``event_funnel``'s
    global counts, the conversion window is bounded (the metric product
    teams actually track — unbounded funnels drift upward forever) and the
    result is a per-cohort-day rate.

    Plan: signup min-aggregate, one semi-join-shaped conversion probe
    (purchases against the signup table with the window predicate inside
    the join), then a cohort-day aggregate — every stage shuffles on
    user_id or the bounded cohort key, conversion flagged via left join +
    distinct (never a fan-out count). Rates divide exact integers, rounded
    to 6 d.p. on both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", ts_us().alias("ts_us")
    )
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    week_us = 7 * 86_400_000_000
    conv = (
        e.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where((F.col("ts_us") > F.col("t1")) & (F.col("ts_us") <= F.col("t1") + week_us))
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    day_us = 86_400_000_000
    cohort_day = (
        (F.col("t1") - F.pmod(F.col("t1"), F.lit(day_us))) / F.lit(day_us)
    ).cast("long")
    c = s.join(conv, "user_id", "left").select(
        cohort_day.alias("cohort_day"),
        F.coalesce("converted", F.lit(0)).alias("converted"),
    )
    return c.groupBy("cohort_day").agg(
        F.count("*").alias("n_signups"),
        F.sum("converted").alias("n_converted"),
        F.round(F.sum("converted") * 100.0 / F.count("*"), 6).alias("conv_pct"),
    )


EVENT_STREAKS_ORACLE = (
    "WITH du AS ("
    f"  SELECT DISTINCT user_id, {floor_day_us_sql()} AS day FROM events"
    "), isl AS ("
    "  SELECT user_id, day, day - row_number() OVER ("
    "    PARTITION BY user_id ORDER BY day) AS island FROM du"
    "), s AS ("
    "  SELECT user_id, island, count(*) AS len FROM isl"
    "  GROUP BY user_id, island"
    ") SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak, "
    "CAST(count(*) AS BIGINT) AS n_streaks, "
    "CAST(sum(len) AS BIGINT) AS n_active_days "
    "FROM s GROUP BY user_id"
)


@register("event_streaks", oracle=EVENT_STREAKS_ORACLE)
def event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands query (Duolingo-streak / GitHub-contribution shape):
    distinct active days minus their per-user row_number is constant within
    a run of consecutive days, so grouping on that difference splits each
    user's history into maximal streak islands.

    Scale: events collapse to distinct (user, day) pairs in one map-side-
    combining aggregate (≤ users × days rows — the only pass that touches
    raw events); the row_number window, island groupBy, and per-user
    summary all share the ONE user_id exchange layout, so Catalyst plans a
    single shuffle for the whole cascade. Per-user day counts are bounded
    (≤ days in the retention window), so the window sort cannot straggle
    even on hot users."""
    e = load_table(spark, sf_dir, "events")
    du = e.select("user_id", ts_day("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = du.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("island")
    )
    streaks = isl.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
        F.sum("len").alias("n_active_days"),
    )
