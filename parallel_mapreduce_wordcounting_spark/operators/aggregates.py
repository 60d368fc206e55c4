"""Aggregation operators — basic, distinct, approx, rollup/cube/grouping sets,
collect, percentile.

Everything compiles to partial+final HashAggregate around a single key
exchange (the MR combiner pattern). Double aggregates that the oracle also
computes are rounded on both sides: money sums to 2 decimals, averages and
quantiles to 6 — Spark's and DuckDB's summation orders differ at ~1e-12
relative, far below the rounding grain (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table
from .exact import money_sum, money_sum_sql


@register(
    "agg_basic",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        f"{money_sum_sql('l_quantity')} AS sum_qty, "
        f"{money_sum_sql('l_extendedprice')} AS sum_base_price, "
        f"{money_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price, "
        "round(avg(l_quantity), 6) AS avg_qty, "
        "round(avg(l_discount), 6) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (count/sum/avg per group)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    oracle=(
        "SELECT o_orderstatus, count(DISTINCT o_custkey) AS uniq_custs, "
        "count(*) AS n_orders FROM orders GROUP BY o_orderstatus"
    ),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("uniq_custs"),
        F.count("*").alias("n_orders"),
    )


@register("agg_approx_distinct", oracle=None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate count-distinct (rows-only: approximation has no exact
    SQL oracle). At 100 TB this replaces exact distinct where a 1% error is
    acceptable — no per-key exchange of raw values, just sketch merges."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_having",
    oracle=(
        "SELECT c_mktsegment, count(*) AS n_custs, round(avg(c_acctbal), 6) AS avg_bal "
        "FROM customer GROUP BY c_mktsegment HAVING count(*) > 100"
    ),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
        )
        .where(F.col("n_custs") > 100)
    )


def _region_nation_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )


_RNC_SQL = (
    "customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey"
)


@register(
    "agg_rollup",
    oracle=(
        f"SELECT r_name, n_name, count(*) AS n_custs, {money_sum_sql('c_acctbal')} AS sum_bal "
        f"FROM {_RNC_SQL} GROUP BY ROLLUP (r_name, n_name)"
    ),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region → nation → grand total."""
    return (
        _region_nation_customer(spark, sf_dir)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_custs"),
            money_sum(F.col("c_acctbal")).alias("sum_bal"),
        )
    )


@register(
    "agg_cube",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders, "
        f"{money_sum_sql('o_totalprice')} AS sum_price "
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    ),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("sum_price"),
    )


@register(
    "agg_grouping_sets",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders "
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"
    ),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL entry point (Spark SQL parses
    GROUPING SETS natively; this also exercises spark.sql + temp views)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("pmrwc_orders_gs")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders "
        "FROM pmrwc_orders_gs GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"
    )


@register(
    "agg_collect",
    oracle=(
        "SELECT n.n_name, array_to_string(list_sort(list(s.s_name)), ',') AS suppliers "
        "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "GROUP BY n.n_name"
    ),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation, sorted then serialized for a deterministic value hash."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("s_name"))).alias("suppliers")
        )
    )


@register(
    "agg_stats",
    oracle=(
        "SELECT l_returnflag, "
        "round(stddev_samp(l_extendedprice), 4) AS std_price, "
        "round(var_samp(l_extendedprice), 2) AS var_price, "
        "round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price, "
        "round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price, "
        # DuckDB's skewness is the sample-corrected G1; Spark's is the
        # population g1 = m3/m2^1.5 — convert: g1 = G1 * (n-2) / sqrt(n(n-1)).
        "round(skewness(l_extendedprice) * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0)), 6) "
        "AS skew_price "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance/skewness
    per group — single-pass moment computations, partial+final like any agg."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.skewness("l_extendedprice"), 6).alias("skew_price"),
    )


@register(
    "agg_multi_distinct",
    oracle=(
        "SELECT l_linestatus, "
        "count(DISTINCT l_partkey) AS uniq_parts, "
        "count(DISTINCT l_suppkey) AS uniq_supps, "
        "count(*) AS n_rows "
        "FROM lineitem GROUP BY l_linestatus"
    ),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one query — Catalyst's
    RewriteDistinctAggregates expands the input once per distinct set
    (an Expand node) rather than running the query twice."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.countDistinct("l_partkey").alias("uniq_parts"),
        F.countDistinct("l_suppkey").alias("uniq_supps"),
        F.count("*").alias("n_rows"),
    )


@register(
    "agg_pivot",
    oracle=(
        "SELECT o_orderpriority, "
        "count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f, "
        "count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o, "
        "count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p "
        "FROM orders GROUP BY o_orderpriority"
    ),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab): order counts by priority × status. Pivot values are
    declared explicitly — letting Spark discover them is an extra full pass
    and non-deterministic column order at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("cnt_f"),
        F.coalesce("O", F.lit(0)).alias("cnt_o"),
        F.coalesce("P", F.lit(0)).alias("cnt_p"),
    )


@register(
    "agg_salted",
    oracle=(
        "SELECT word, COUNT(*) AS cnt FROM ("
        "  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents"
        ") WHERE word <> '' GROUP BY word"
    ),
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the hot-key (skew) mitigation pattern.

    Word counts skew badly ('the' at web scale): phase 1 aggregates on
    (word, salt) so a hot word spreads over 16 reducers; phase 2 sums the 16
    partials. Result is identical to the direct groupBy (same oracle as
    wc_counts); the salt is deterministic (doc_id hash), not random."""
    from .wordcount import tokens

    toks = tokens(spark, sf_dir).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(16))
    )
    phase1 = toks.groupBy("word", "salt").agg(F.count("*").alias("partial_cnt"))
    return phase1.groupBy("word").agg(F.sum("partial_cnt").alias("cnt"))


@register(
    "agg_time_rollup",
    oracle=(
        "WITH e AS (SELECT make_timestamp(epoch_ns(ts) // 1000) AS tsc, value FROM events) "
        "SELECT CAST(date_trunc('day', tsc) AS TIMESTAMP) AS day, "
        "CAST(date_trunc('hour', tsc) AS TIMESTAMP) AS hour, "
        f"count(*) AS cnt, {money_sum_sql('value')} AS total_value "
        "FROM e GROUP BY ROLLUP (day, hour)"
    ),
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: one pass producing hourly, daily, and
    grand-total aggregates via ROLLUP over truncated timestamps — the
    continuous-aggregate pattern for time-series tables."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(F.count("*").alias("cnt"), money_sum(F.col("value")).alias("total_value"))
    )


@register(
    "agg_percentile",
    oracle=(
        "SELECT o_orderstatus, "
        "round(median(o_totalprice), 6) AS med_price, "
        "round(quantile_cont(o_totalprice, 0.25), 6) AS p25, "
        "round(quantile_cont(o_totalprice, 0.75), 6) AS p75 "
        "FROM orders GROUP BY o_orderstatus"
    ),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolating) median/quartiles — matches DuckDB's quantile_cont."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 6).alias("med_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("p75"),
    )
