"""Streaming operators in their batch-equivalent form — the t2-checkable
shape. Structured Streaming guarantees batch equivalence for these plans, and
tests/test_streaming.py replays the same queries through a real readStream →
memory-sink pipeline and asserts identical results.

The DuckDB oracles mirror Spark's epoch-aligned window math exactly via
integer µs arithmetic (ns // 1000, the loader's conversion).

100 TB notes: every stateful shape here is watermark-bounded in its streaming
form (state cannot grow without bound); tumbling/sliding windows shuffle on
(window, key); session windows shuffle on user then merge locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table, ts_us
from .exact import money_sum, money_sum_sql

US_15MIN = 900_000_000
US_10MIN = 600_000_000


@register(
    "stream_tumbling",
    oracle=(
        "SELECT date_trunc('hour', make_timestamp(epoch_ns(ts) // 1000)) AS w_start, "
        "event_type, count(*) AS cnt, round(avg(value), 6) AS avg_value "
        "FROM events GROUP BY 1, 2"
    ),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour event counts by type via window('1 hour') — identical in
    batch and streaming (epoch-aligned tumbling ≡ date_trunc('hour'))."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.col("window.start").alias("w_start"), "event_type", "cnt", "avg_value"
        )
    )


@register(
    "stream_sliding",
    oracle=(
        "WITH e AS (SELECT epoch_ns(ts) // 1000 AS ts_us, event_type FROM events) "
        "SELECT make_timestamp((ts_us // 900000000) * 900000000 - CAST(k AS BIGINT) * 900000000) AS w_start, "
        "event_type, count(*) AS cnt "
        "FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks "
        "GROUP BY 1, 2"
    ),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min — each event lands in exactly 4
    windows; the oracle materializes the same 4 epoch-aligned starts."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("w_start"), "event_type", "cnt")
    )


@register(
    "stream_session",
    oracle=(
        "WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us FROM events), "
        "flagged AS ("
        "  SELECT user_id, ts_us, CASE WHEN ts_us - lag(ts_us) OVER "
        "    (PARTITION BY user_id ORDER BY ts_us) >= 1800000000 OR "
        "    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL "
        "    THEN 1 ELSE 0 END AS new_sess FROM e"
        "), sess AS ("
        "  SELECT user_id, ts_us, sum(new_sess) OVER "
        "    (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sess_id "
        "  FROM flagged"
        ") SELECT user_id, make_timestamp(min(ts_us)) AS session_start, "
        "make_timestamp(max(ts_us) + 1800000000) AS session_end, count(*) AS n_events "
        "FROM sess GROUP BY user_id, sess_id"
    ),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per user, via the built-in
    session_window (stateful merging in streaming mode). The oracle states
    the identical gaps-and-islands semantics with lag + cumulative sum."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_watermark",
    oracle=(
        "WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS ts_us FROM events) "
        "SELECT event_type, count(*) AS cnt FROM e "
        "WHERE ts_us >= (SELECT max(ts_us) FROM e) - 600000000 "
        "GROUP BY event_type"
    ),
)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of a 10-minute watermark: only events within 10 min of the
    max event time survive (what a late-data filter retains at stream end).
    The real withWatermark drop behavior is exercised in tests/test_streaming.py.
    The global max rides along as a broadcast 1-row cross join — no collect."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", ts_us("ts").alias("ts_us")
    )
    mx = F.broadcast(e.agg(F.max("ts_us").alias("max_ts_us")))
    return (
        e.crossJoin(mx)
        .where(F.col("ts_us") >= F.col("max_ts_us") - US_10MIN)
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "stream_dedup",
    oracle=(
        "WITH e AS (SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS ts_us "
        "FROM events) "
        "SELECT user_id, event_type, event_id AS first_event_id, "
        "make_timestamp(ts_us) AS first_ts FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY user_id, event_type "
        "  ORDER BY ts_us, event_id) AS rn FROM e"
        ") WHERE rn = 1"
    ),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the earliest event per (user, type) — the batch shape of
    dropDuplicatesWithinWatermark (whose real streaming form is tested in
    tests/test_streaming.py). Deterministic keeper via (ts, event_id) order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "stream_stateful",
    oracle=(
        "SELECT user_id, count(*) AS n_events, "
        "make_timestamp(max(epoch_ns(ts) // 1000)) AS last_ts, "
        f"{money_sum_sql('value')} AS total_value "
        "FROM events GROUP BY user_id"
    ),
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user state (count, last-seen, total) — in streaming this
    is an update-mode groupBy aggregation whose final state equals the batch
    result; the micro-batch form is exercised in tests/test_streaming.py."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("ts").alias("last_ts"),
        money_sum(F.col("value")).alias("total_value"),
    )


@register(
    "stream_wc",
    oracle=(
        "SELECT w AS word, count(*) AS cnt FROM ("
        "  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents"
        ") WHERE w <> '' GROUP BY w"
    ),
    tier="A",
)
def stream_wc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship word count in its STREAMING shape — batch
    form of the incremental query tests/test_streaming.py replays through a
    real documents file-stream (4 micro-batches, complete mode) and proves
    equal to this plan batch-for-batch. Structured Streaming maintains the
    same hash aggregate incrementally: the partial (map-side) aggregate is
    MapReduce's combiner, the state store holds the running reduce — so the
    flagship operator's streaming deployment carries a driver verdict too.

    Scale: unbounded-state complete-mode is the DEMO shape; a production
    stream would window the counts (stream_tumbling) or emit update-mode
    deltas. The batch plan is identical to wc_counts by construction.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


STREAM_STATIC_JOIN_ORACLE = (
    "SELECT c.c_nationkey, count(*) AS cnt, round(avg(e.value), 6) AS avg_value "
    "FROM events e JOIN customer c ON e.user_id = c.c_custkey "
    "GROUP BY c.c_nationkey"
)


@register("stream_static_join", oracle=STREAM_STATIC_JOIN_ORACLE)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join + aggregate, batch-equivalent form:
    events (the stream side) joined to the customer dimension (the static
    side) on user_id = c_custkey, rolled up per nation. In the streaming
    form the static side is broadcast to every micro-batch and needs no
    state at all — stream-static inner joins are stateless by construction
    (each input row joins a fixed table and leaves), which is why dimension
    enrichment is the one join every production stream runs first.
    tests/test_streaming.py replays this exact plan through readStream
    micro-batches and asserts the sink equals this batch result.

    Scale: the stream side never shuffles for the join (broadcast);
    the only stateful shuffle is the final per-nation aggregate, keyed on
    25 nations — trivially bounded state."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


US_30MIN = 1_800_000_000

STREAM_STREAM_JOIN_ORACLE = (
    "WITH e AS (SELECT user_id, event_type, event_id, "
    "epoch_ns(ts) // 1000 AS ts_us FROM events) "
    "SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id, "
    "CAST((p.ts_us - v.ts_us) // 1000000 AS BIGINT) AS lag_s "
    "FROM e v JOIN e p ON v.user_id = p.user_id "
    "AND v.event_type = 'view' AND p.event_type = 'purchase' "
    f"AND p.ts_us >= v.ts_us AND p.ts_us - v.ts_us <= {US_30MIN}"
)


@register("stream_stream_join", oracle=STREAM_STREAM_JOIN_ORACLE)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch-equivalent form: every (view,
    purchase) pair by the same user with the purchase at most 30 minutes
    after the view — the attribution join (ad-click -> conversion) that is
    Structured Streaming's canonical stream-stream example. In the
    streaming form BOTH sides carry watermarks and the time-range predicate
    bounds each side's state retention (a view can be dropped once the
    purchase watermark passes view_ts + 30min); tests/test_streaming.py
    replays this plan through readStream micro-batches against two forks
    of the same event stream and asserts the sink equals this batch
    result.

    Scale: one shuffle of each side on user_id; state is
    watermark-bounded so memory tracks the 30-minute window's event rate,
    not stream length. The µs integer lag arithmetic is exact on both
    engines."""
    e = load_table(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), ts_us().alias("v_us")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        ts_us().alias("p_us"),
    )
    joined = v.join(
        p,
        (v.user_id == p.p_user)
        & (p.p_us >= v.v_us)
        & (p.p_us - v.v_us <= US_30MIN),
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        F.expr("(p_us - v_us) div 1000000").alias("lag_s"),
    )
