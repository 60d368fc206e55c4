"""TPC-H-shaped benchmark queries (Q3, Q5, Q10) adapted to the fixture
schema — the canonical proof that the engine covers real multi-join
analytical SQL, not just isolated operators.

Adaptations (the fixtures are TPC-H-ish, FIXTURES.md): no o_shippriority /
c_address / c_phone / c_comment columns, so Q3 carries o_orderpriority and
Q10 projects the columns that exist; date parameters are shifted into the
fixture's 1995–2001 range. Semantics (join graph, predicates, aggregation,
ordering) are the TPC-H originals.

Scale: dimension sides (nation, region) broadcast explicitly; customer and
supplier broadcast via AQE at small SF and shuffle on their keys at 100 TB;
lineitem⋈orders is the one unavoidable big shuffle. Top-k results use
TakeOrderedAndProject with unique tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table
from .exact import money_sum, money_sum_sql

def _revenue():
    # built lazily: Column arithmetic (the 1-literal) needs an active session
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "tpch_q3",
    oracle=(
        f"SELECT l.l_orderkey, {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue, "
        "o.o_orderdate, o.o_orderpriority "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00' "
        "AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00' "
        "GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority "
        "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
    ),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping-priority: top unshipped orders by revenue for a segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .where(F.col("o_orderdate") < cutoff)
        .join(l, l.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(_revenue()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle=(
        f"SELECT n.n_name, {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA' "
        "AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY n.n_name"
    ),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: revenue where customer and supplier share a
    nation, for one region and year. The c_nationkey = s_nationkey condition
    rides inside the supplier join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(_revenue()).alias("revenue"))
    )


@register(
    "tpch_q10",
    oracle=(
        "SELECT c.c_custkey, c.c_name, "
        f"{money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue, "
        "round(c.c_acctbal, 2) AS c_acctbal, n.n_name "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00' "
        "AND l.l_returnflag = 'R' "
        "GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top 20 customers by lost revenue from
    returned items in one quarter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .join(l.where(F.col("l_returnflag") == "R"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(_revenue()).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
