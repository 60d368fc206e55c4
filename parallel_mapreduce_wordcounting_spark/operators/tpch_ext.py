"""TPC-H-shaped queries Q1/Q4/Q6/Q7/Q8/Q9/Q13/Q14/Q15/Q17/Q18/Q19/Q22
adapted to the fixture schema (tpch.py carries Q3/Q5/Q10).

Adaptations, documented per query: the fixtures lack partsupp,
l_commitdate/l_receiptdate/l_shipmode, o_comment, c_phone/p_container, so
Q4 tests shipped-after-order instead of receipt-after-commit, Q9's profit
drops the supplycost term, Q13's order filter uses o_orderpriority, and
Q22's "country code" is c_nationkey % 5. Join graphs, aggregation shapes,
and ordering semantics are otherwise the TPC-H originals; date parameters
sit inside the fixture's 1995–2001 range.

Exactness: every money aggregate goes through exact.money_sum (integer-cent
fixed point — bit-identical on any engine at any partition count); averages
of two-decimal columns (discount, acctbal) use the same cents trick so no
cross-engine float summation order can flip a rounded value or a threshold
comparison.

Scale: nation/region/part dimension sides broadcast; lineitem⋈orders is
the one big hash shuffle per query; top-k outputs compile to
TakeOrderedAndProject with unique tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table
from .exact import money_sum, money_sum_sql


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _cents_avg(col, decimals: int = 6):
    """Exact average of a 2-decimal money column: integer-cent sum / count."""
    return F.round(
        F.sum(F.floor(col * 100 + F.lit(0.5))) / (100.0 * F.count(F.lit(1))), decimals
    )


def _cents_avg_sql(expr: str, decimals: int = 6) -> str:
    return (
        f"round(CAST(sum(CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)) AS BIGINT)"
        f" / (100.0 * count(*)), {decimals})"
    )


@register(
    "tpch_q1",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
        f"{money_sum_sql('l_extendedprice')} AS sum_base_price, "
        f"{money_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price, "
        f"{money_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge, "
        "round(sum(CAST(l_quantity AS BIGINT)) / (1.0 * count(*)), 6) AS avg_qty, "
        f"{_cents_avg_sql('l_extendedprice')} AS avg_price, "
        f"{_cents_avg_sql('l_discount', 6)} AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary report: the canonical scan→partial-agg→final-agg
    query (cutoff shifted to 90 days before the fixture's max shipdate).
    l_quantity is integral, so its sum is summed as int64 — exact."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= _ts("2001-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(_rev()).alias("sum_disc_price"),
            money_sum(_rev() * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(
                F.sum(F.col("l_quantity").cast("long")) / (1.0 * F.count(F.lit(1))), 6
            ).alias("avg_qty"),
            _cents_avg(F.col("l_extendedprice")).alias("avg_price"),
            _cents_avg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q4",
    oracle=(
        "SELECT o.o_orderpriority, count(*) AS order_count FROM orders o "
        "WHERE o.o_orderdate >= TIMESTAMP '1996-04-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00' "
        "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate) "
        "GROUP BY o.o_orderpriority"
    ),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking, adapted: EXISTS a lineitem shipped after
    the order date (the fixture has no commit/receipt dates). Left-semi
    join — the EXISTS never duplicates order rows."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    q2 = o.where(
        (F.col("o_orderdate") >= _ts("1996-04-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-07-01 00:00:00"))
    )
    return (
        q2.join(
            l,
            (l.l_orderkey == q2.o_orderkey) & (l.l_shipdate > q2.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q6",
    oracle=(
        f"SELECT {money_sum_sql('l_extendedprice * l_discount')} AS revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting revenue change: pure scan+filter+scalar aggregate —
    the predicate-pushdown showcase (all three filters reach the scan)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "tpch_q7",
    oracle=(
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(year(l.l_shipdate) AS INTEGER) AS l_year, "
        f"{money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
        "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' "
        "AND TIMESTAMP '1997-12-31 00:00:00' "
        "GROUP BY 1, 2, 3"
    ),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations, by direction and ship year."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        l.where(
            F.col("l_shipdate").between(
                _ts("1996-01-01 00:00:00"), _ts("1997-12-31 00:00:00")
            )
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money_sum(_rev()).alias("revenue"))
    )


@register(
    "tpch_q8",
    oracle=(
        "WITH allrev AS ("
        "  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year, "
        "  CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents, "
        "  n1.n_name AS supp_nation "
        "  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "  JOIN customer c ON o.o_custkey = c.c_custkey "
        "  JOIN part p ON l.l_partkey = p.p_partkey "
        "  JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
        "  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
        "  JOIN region r ON n2.n_regionkey = r.r_regionkey "
        "  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO' "
        "  AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' "
        "  AND TIMESTAMP '1996-12-31 00:00:00'"
        ") SELECT o_year, "
        "round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS BIGINT)"
        " / (1.0 * CAST(sum(cents) AS BIGINT)), 6) AS mkt_share "
        "FROM allrev GROUP BY o_year"
    ),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_3's fraction of PROMO-part revenue
    among ASIA-region customers, per order year. Numerator and denominator
    are exact integer-cent sums, so the share division is bit-identical
    cross-engine."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key"))
    cents = F.floor(_rev() * 100 + F.lit(0.5))
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(
            F.col("o_orderdate").between(
                _ts("1995-01-01 00:00:00"), _ts("1996-12-31 00:00:00")
            )
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(p.where(F.col("p_type") == "PROMO")), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), F.col("cr_key") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").alias("o_year"), cents.alias("cents"), "supp_nation")
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(F.lit(0)))
            / (1.0 * F.sum("cents")),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_q9",
    oracle=(
        "SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year, "
        f"{money_sum_sql('l.l_extendedprice * (1 - l.l_discount) - 0.6 * l.l_extendedprice')} AS sum_profit "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "WHERE p.p_name LIKE '%red%' "
        "GROUP BY 1, 2"
    ),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit, adapted: the fixture has no partsupp, so
    profit = discounted revenue − 0.6·extendedprice (a fixed 60% cost stand-in
    for ps_supplycost·l_quantity), for parts named like '%red%', grouped by
    supplier nation × order year.

    Plan notes (round-5 audit of the r4 "+66%" bench regression): the same
    committed code measured 0.93 / 1.31 / 1.72 s medians in three separate
    processes at sf0.1 — the regression was JVM run-to-run variance, not a
    plan flip (every process planned the same BHJ tree). What IS consistent
    (~15% median, tighter spread) is projecting orders/supplier/part to the
    joined columns before the join, which shrinks the broadcast builds.
    Only part-filtered and nation are broadcast-HINTED; orders and supplier
    stay AQE-decided so at 100 TB (where both dwarf any threshold) they
    revert to shuffle joins on l_orderkey / l_suppkey with no code change."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = _rev() - 0.6 * F.col("l_extendedprice")
    pf = p.where(F.col("p_name").like("%red%")).select("p_partkey")
    return (
        l.join(F.broadcast(pf), l.l_partkey == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(money_sum(profit).alias("sum_profit"))
    )


@register(
    "tpch_q13",
    oracle=(
        "WITH c_orders AS ("
        "  SELECT c.c_custkey, count(o.o_orderkey) AS c_count "
        "  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "  AND o.o_orderpriority <> '5-LOW' "
        "  GROUP BY c.c_custkey"
        ") SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY c_count"
    ),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution, adapted: the excluded-orders
    predicate is o_orderpriority <> '5-LOW' (no o_comment column). The outer
    join keeps zero-order customers in the c_count = 0 bucket."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.where(F.col("o_orderpriority") != "5-LOW"),
            c.c_custkey == o.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q14",
    oracle=(
        "SELECT round("
        "100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' "
        "THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) "
        "ELSE 0 END) AS BIGINT) "
        "/ (1.0 * CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT))"
        ", 6) AS promo_revenue "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00' "
        "AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"
    ),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: percent of one month's revenue from PROMO-type
    parts. Both sides of the ratio are integer-cent sums."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cents = F.floor(_rev() * 100 + F.lit(0.5))
    return (
        l.where(
            (F.col("l_shipdate") >= _ts("1996-03-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
                / (1.0 * F.sum(cents)),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15",
    oracle=(
        "WITH revenue AS ("
        "  SELECT l_suppkey AS supplier_no, "
        f"  {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue "
        "  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY l_suppkey"
        ") SELECT s.s_suppkey, s.s_name, r.total_revenue "
        "FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no "
        "WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)"
    ),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: supplier(s) achieving the max quarterly revenue.
    money_sum is exact, so the = max(total_revenue) comparison is safe
    cross-engine (no float-noise ties)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.where(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money_sum(_rev()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17",
    oracle=(
        "WITH avg_qty AS ("
        "  SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) / (1.0 * count(*)) AS aq "
        "  FROM lineitem GROUP BY l_partkey"
        ") SELECT round("
        "CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 / 7.0"
        ", 6) AS avg_yearly "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN avg_qty a ON l.l_partkey = a.l_partkey "
        "WHERE p.p_brand = 'Brand#23' AND l.l_quantity < 0.2 * a.aq"
    ),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue for one brand (no p_container in the
    fixture, so brand is the whole part filter). The per-part average
    quantity is an exact int-sum/count, so the 0.2·avg threshold compares
    identically on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    avg_qty = l.groupBy(F.col("l_partkey").alias("aq_partkey")).agg(
        (F.sum(F.col("l_quantity").cast("long")) / (1.0 * F.count(F.lit(1)))).alias("aq")
    )
    return (
        l.join(F.broadcast(p.where(F.col("p_brand") == "Brand#23")), l.l_partkey == p.p_partkey)
        .join(avg_qty, F.col("l_partkey") == F.col("aq_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(
                F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))) / 100.0 / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q18",
    oracle=(
        "SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, "
        "round(o.o_totalprice, 2) AS o_totalprice, "
        "CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "WHERE o.o_orderkey IN ("
        "  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
        "  HAVING sum(CAST(l_quantity AS BIGINT)) > 300"
        ") GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice "
        "ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100"
    ),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds 300
    (fixture max is 458), top 100 by order price. The IN-subquery is a
    left-semi join on the pre-aggregated keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", F.col("o_totalprice").alias("tp_raw"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("tp_raw", 2).alias("o_totalprice"),
            "sum_qty",
            F.col("tp_raw"),
        )
        .orderBy(F.col("tp_raw").desc(), "o_orderkey")
        .limit(100)
        .drop("tp_raw")
    )


@register(
    "tpch_q19",
    oracle=(
        f"SELECT {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11 "
        "AND p.p_size BETWEEN 1 AND 5) "
        "OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20 "
        "AND p.p_size BETWEEN 1 AND 10) "
        "OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30 "
        "AND p.p_size BETWEEN 1 AND 15)"
    ),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under three disjunctive brand/quantity/size
    bands (container/shipmode clauses dropped with the missing columns).
    The part side broadcasts; the disjunction stays in one filter so Catalyst
    can still push the common partkey equi-condition into the join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(band)
        .agg(money_sum(_rev()).alias("revenue"))
    )


@register(
    "tpch_q22",
    oracle=(
        "WITH avg_bal AS ("
        "  SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "  / (100.0 * count(*)) AS ab "
        "  FROM customer WHERE c_acctbal > 0.0"
        ") SELECT c.c_nationkey % 5 AS cntrycode, count(*) AS numcust, "
        f"{money_sum_sql('c.c_acctbal')} AS totacctbal "
        "FROM customer c, avg_bal "
        "WHERE c.c_acctbal > avg_bal.ab "
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderdate >= TIMESTAMP '1999-07-01 00:00:00') "
        "GROUP BY 1"
    ),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity, adapted: 'country code' is
    c_nationkey % 5 (no c_phone column), and 'lapsed' means no order in the
    fixture's final two years (every customer has SOME order, so the
    original's never-ordered form is degenerate here). Rich customers
    (balance above the exact cents-average of positive balances) counted by
    code. The scalar average broadcasts; NOT EXISTS is a left-anti join
    against the date-filtered orders side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)))
            / (100.0 * F.count(F.lit(1)))
        ).alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.where(F.col("o_orderdate") >= _ts("1999-07-01 00:00:00")),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(F.count("*").alias("numcust"), money_sum(F.col("c_acctbal")).alias("totacctbal"))
    )
