"""Subquery shapes — scalar, IN, correlated EXISTS, LATERAL — plus
unpivot (wide→long reshaping) and deterministic systematic sampling.

Catalyst rewrites all four subquery forms into joins (scalar → broadcast of
a 1-row aggregate; IN → left-semi; correlated EXISTS → left-semi with the
correlation as the join key; LATERAL correlated aggregate → group-then-join)
— the implementations below declare them through the DataFrame/SQL API and
let that rewrite happen, which is exactly what survives at 100 TB.

Sampling: TABLESAMPLE is seed/engine-dependent and can never hash-match, so
the deterministic systematic form (key mod k) is the contract key — it is
also the reproducible form a training-data pipeline actually wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table
from .exact import money_sum, money_sum_sql


@register(
    "subq_scalar",
    oracle=(
        "SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice "
        "FROM orders WHERE o_totalprice > 1.5 * ("
        "CAST((SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) FROM orders) AS BIGINT)"
        " / (100.0 * (SELECT count(*) FROM orders)))"
    ),
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above 1.5× the average price (the fixture prices are uniform
    on [1k, 500k], so 2× the mean sits above the max — 1.5× keeps the
    result set non-degenerate). The scalar average is an exact
    integer-cent sum / count (identical on both engines), broadcast to the
    filter — one aggregate job plus one scan, no per-row subquery."""
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg(
        (
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
            / (100.0 * F.count(F.lit(1)))
        ).alias("ap")
    )
    return (
        o.join(F.broadcast(avg_price))
        .where(F.col("o_totalprice") > 1.5 * F.col("ap"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@register(
    "subq_in",
    oracle=(
        "SELECT s_suppkey, s_name, s_nationkey FROM supplier "
        "WHERE s_nationkey IN ("
        "SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA')"
    ),
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in ASIA nations — IN-subquery as a left-semi join against
    the (broadcastable) dimension-derived key set."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia_keys = (
        n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey")
    )
    return s.join(
        F.broadcast(asia_keys), s.s_nationkey == asia_keys.n_nationkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


@register(
    "subq_exists_corr",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 50000)"
    ),
)
def subq_exists_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one large urgent order — correlated EXISTS
    as a left-semi join; the non-correlated predicates filter the orders
    side BEFORE the join, so the semi-join probe side is small."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 50000)
    )
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "subq_lateral",
    oracle=(
        "SELECT n.n_name, t.n_rich, t.bal "
        "FROM nation n, LATERAL ("
        "  SELECT count(*) AS n_rich, "
        f"  coalesce({money_sum_sql('c.c_acctbal')}, 0.0) AS bal "
        "  FROM customer c WHERE c.c_nationkey = n.n_nationkey "
        "  AND c.c_acctbal > 5000"
        ") t"
    ),
)
def subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation lateral aggregate (rich-customer count and balance).
    Declared via SQL so Catalyst's DecorrelateInnerQuery rewrites the
    lateral correlation into an aggregate + outer join on n_nationkey —
    verified plan shape: no per-row re-execution."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("pmrwc_sub_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("pmrwc_sub_customer")
    return spark.sql(
        "SELECT n.n_name, t.n_rich, t.bal "
        "FROM pmrwc_sub_nation n, LATERAL ("
        "  SELECT count(*) AS n_rich, "
        # CAST to DOUBLE: Spark SQL's bigint / 100.0 is DECIMAL arithmetic,
        # DuckDB's is DOUBLE — align the output type explicitly.
        "  CAST(coalesce(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0, 0.0) AS DOUBLE) AS bal "
        "  FROM pmrwc_sub_customer c WHERE c.c_nationkey = n.n_nationkey "
        "  AND c.c_acctbal > 5000"
        ") t"
    )


@register(
    "unpivot_long",
    oracle=(
        "SELECT l_orderkey, l_linenumber, metric, round(val, 2) AS val FROM ("
        "  SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS val FROM lineitem "
        "  UNION ALL "
        "  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem "
        "  UNION ALL "
        "  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem"
        ") WHERE l_orderkey < 100"
    ),
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape of three measure columns via the native unpivot
    (SQL UNPIVOT/MELT equivalent) — no join, no shuffle, a pure Generate."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val_raw",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("metric") == "l_extendedprice", "price")
        .when(F.col("metric") == "l_discount", "discount")
        .otherwise("tax")
        .alias("metric"),
        F.round("val_raw", 2).alias("val"),
    )


@register(
    "sample_mod",
    oracle=(
        "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice "
        "FROM orders WHERE o_orderkey % 20 = 0"
    ),
)
def sample_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% systematic sample by key residue — reproducible
    across engines, runs, and partitionings (which TABLESAMPLE is not);
    the filter pushes to the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


SQL_RECURSIVE_CTE_ORACLE = (
    "WITH RECURSIVE pairs AS ("
    "  SELECT lag(event_type) OVER (PARTITION BY user_id "
    "    ORDER BY epoch_ns(ts) // 1000, event_id) AS prev, event_type AS next"
    "  FROM events"
    "), edges AS ("
    "  SELECT DISTINCT prev, next FROM pairs WHERE prev IS NOT NULL"
    "), r(t, step) AS ("
    "  SELECT CAST('signup' AS VARCHAR), CAST(0 AS INTEGER) "
    "  UNION ALL "
    "  SELECT e.next, r.step + 1 FROM r JOIN edges e ON e.prev = r.t "
    "  WHERE r.step < 3"
    ") "
    "SELECT t AS event_type, CAST(min(step) AS INTEGER) AS min_hops "
    "FROM r GROUP BY t"
)


@register("sql_recursive_cte", oracle=SQL_RECURSIVE_CTE_ORACLE)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): BFS over the event-type
    transition graph — from 'signup', which event types are reachable in
    ≤3 observed hops, and in how few? The anchor seeds the frontier, the
    recursive member joins it to the edge list, and the post-recursion
    ``min(step)`` collapses walks to shortest distances — iterative graph
    traversal stated declaratively, where pre-4.0 Spark needed a driver
    loop (dedup_cluster's shape).

    Scale: the DATA-proportional work is the one windowed pass deriving
    transitions; the recursion itself runs on the DISTINCT edge list —
    bounded by |event_type|² (≤25 here) regardless of corpus size — so
    each iteration is a tiny broadcast join. Depth is capped by the
    ``step < 3`` predicate, the declarative analogue of dedup_cluster's
    round guard."""
    e = load_table(spark, sf_dir, "events")
    e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).createOrReplaceTempView("pmrwc_rec_events")
    return spark.sql(
        "WITH RECURSIVE pairs AS ("
        "  SELECT lag(event_type) OVER (PARTITION BY user_id "
        "    ORDER BY ts_us, event_id) AS prev, event_type AS next"
        "  FROM pmrwc_rec_events"
        "), edges AS ("
        "  SELECT DISTINCT prev, next FROM pairs WHERE prev IS NOT NULL"
        "), r(t, step) AS ("
        "  SELECT CAST('signup' AS STRING), CAST(0 AS INT) "
        "  UNION ALL "
        "  SELECT e.next, r.step + 1 FROM r JOIN edges e ON e.prev = r.t "
        "  WHERE r.step < 3"
        ") "
        "SELECT t AS event_type, CAST(min(step) AS INT) AS min_hops "
        "FROM r GROUP BY t"
    )
