"""Window function operators — ranking, lag/lead, running and moving frames,
grouped top-N.

Window evaluation shuffles once on the partition key then sorts within
partitions; every ORDER BY below carries a unique tiebreaker so row_number /
frame contents are deterministic on both engines (SURVEY.md §5.2). Running
sums accumulate in the same row order on both engines, so the float results
are bit-identical before the safety rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table, ts_us


@register(
    "win_rank",
    oracle=(
        "SELECT c_custkey, c_nationkey, c_acctbal, "
        "CAST(row_number() OVER w AS INTEGER) AS rn, CAST(rank() OVER w AS INTEGER) AS rnk, "
        "CAST(dense_rank() OVER w AS INTEGER) AS drnk, CAST(ntile(4) OVER w AS INTEGER) AS quartile "
        "FROM customer "
        "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)"
    ),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle=(
        "WITH e AS (SELECT event_id, user_id, value, epoch_ns(ts) // 1000 AS ts_us FROM events) "
        "SELECT event_id, user_id, value, "
        "lag(value) OVER w AS prev_value, lead(value) OVER w AS next_value, "
        "ts_us - lag(ts_us) OVER w AS dt_us "
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)"
    ),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous/next event value and inter-event gap in µs."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", ts_us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("dt_us"),
    )


@register(
    "win_running",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend "
        "FROM orders"
    ),
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "win_moving",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg "
        "FROM orders"
    ),
)
def win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over an explicit 3-row frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 6).alias("moving_avg"),
    )


@register(
    "win_first_last",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "first_value(o_orderkey) OVER w AS first_order, "
        "last_value(o_orderkey) OVER ("
        "  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order, "
        "nth_value(o_orderkey, 2) OVER ("
        "  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order "
        "FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"
    ),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value per customer order history.
    last_value and nth_value get the full-partition frame explicitly — the
    default frame ends at CURRENT ROW, the classic silent-wrong-answer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


@register(
    "win_topn_group",
    oracle=(
        "SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM ("
        "  SELECT o_custkey, o_orderkey, o_totalprice, "
        "  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn "
        "  FROM orders"
        ") WHERE rn <= 3"
    ),
)
def win_topn_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — rank-then-filter, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )
