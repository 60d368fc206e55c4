"""The remaining TPC-H-shaped queries — Q2/Q11/Q12/Q16/Q21 — completing
full 22-query coverage (tpch.py: Q3/Q5/Q10; tpch_ext.py: the other 14).

The fixtures have no partsupp table, no l_shipmode/l_commitdate/
l_receiptdate, and no comment columns, so (documented per query):

- Q2/Q11/Q16 derive the part↔supplier relationship from lineitem
  (distinct ``(l_partkey, l_suppkey)`` pairs observed in sales);
- Q2's "supply cost" is the minimum observed unit price
  ``l_extendedprice / l_quantity`` per pair, held as exact integer cents so
  the min / arg-min comparisons are engine-independent;
- Q12's ship-mode dimension becomes ``l_returnflag`` and "late receipt"
  becomes shipped >30 days after the order date;
- Q16's supplier-complaint exclusion becomes ``s_acctbal < 0``;
- Q21's "kept waiting" is shipped >60 days after the order date.

Join graphs, subquery shapes (correlated min, scalar-total fraction,
EXISTS / NOT EXISTS pairs) and output ordering follow the TPC-H originals.

Scale notes: every query shuffles the fact table (lineitem) at most twice
(once to build the pair/cost aggregate, once for the final group) and
broadcasts every dimension side (part, supplier, nation, region and the
one-row scalar totals). Q21's triple self-reference is expressed as one
per-order aggregate (counts of suppliers / late suppliers) instead of two
correlated EXISTS scans — one pass over lineitem, not three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table
from .exact import money_sum, money_sum_sql


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "tpch_q2",
    oracle=(
        "WITH cost AS ("
        "  SELECT l_partkey, l_suppkey, "
        "    min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)) AS cost_cents "
        "  FROM lineitem GROUP BY 1, 2"
        "), eligible AS ("
        "  SELECT c.l_partkey, c.cost_cents, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name "
        "  FROM cost c "
        "  JOIN supplier s ON c.l_suppkey = s.s_suppkey "
        "  JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "  JOIN region r ON n.n_regionkey = r.r_regionkey "
        "  WHERE r.r_name = 'EUROPE'"
        "), ranked AS ("
        "  SELECT e.*, min(cost_cents) OVER (PARTITION BY l_partkey) AS min_cents "
        "  FROM eligible e"
        ") SELECT round(ranked.s_acctbal, 2) AS s_acctbal, ranked.s_name, "
        "ranked.n_name, p.p_partkey, p.p_name, "
        "CAST(ranked.cost_cents AS BIGINT) / 100.0 AS supply_cost "
        "FROM ranked JOIN part p ON ranked.l_partkey = p.p_partkey "
        "WHERE ranked.cost_cents = ranked.min_cents AND p.p_size BETWEEN 10 AND 30 "
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
    ),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier, adapted: for each mid-size part
    (p_size 10–30), the EUROPE suppliers whose observed unit price
    (min l_extendedprice/l_quantity over their lineitems, in exact cents)
    equals the regional minimum for that part. The region and size filters
    are pushed below the pair aggregate as broadcast semi-joins (they
    commute with the per-pair min), so the single fact shuffle carries only
    qualifying rows (~8%); the correlated MIN(ps_supplycost) subquery is a
    window-min over the already-filtered pair set — one pass, no shared
    subplan recompute (a groupBy-min + self-join re-runs the aggregate on
    both sides)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    europe_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part_f = p.where(F.col("p_size").between(10, 30))
    # Both final filters are per-part / per-supplier, and the pair cost is a
    # min over the pair's OWN lineitems — so they commute below the
    # aggregate. Pushing them down as broadcast semi-joins shrinks the one
    # big shuffle from every (part, supp) pair (~|lineitem| keys at this
    # fixture's cardinality) to the ~8% that can reach the output; at 100 TB
    # this is the difference between shuffling the fact table and not.
    cost = (
        l.join(
            F.broadcast(europe_supp.select("s_suppkey")),
            l.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(part_f.select("p_partkey")),
            l.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5))
            ).alias("cost_cents")
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.withColumn("min_cents", F.min("cost_cents").over(w))
        .where(F.col("cost_cents") == F.col("min_cents"))
        .join(F.broadcast(europe_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part_f), F.col("l_partkey") == part_f.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("cost_cents") / 100.0).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11",
    oracle=(
        "WITH v AS ("
        "  SELECT l.l_partkey, "
        "    sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS val_cents "
        "  FROM lineitem l "
        "  JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "  JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "  JOIN region r ON n.n_regionkey = r.r_regionkey "
        "  WHERE r.r_name = 'ASIA' GROUP BY 1"
        ") SELECT l_partkey AS p_partkey, "
        "CAST(val_cents AS BIGINT) / 100.0 AS part_value "
        "FROM v WHERE val_cents > 0.001 * (SELECT CAST(sum(val_cents) AS BIGINT) FROM v) "
        "ORDER BY part_value DESC, p_partkey LIMIT 100"
    ),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock, adapted: per-part discounted revenue through
    ASIA suppliers (no partsupp → value = Σ l_extendedprice·(1−l_discount)
    in exact cents), keeping parts above 0.1% of the regional total. The
    original's scalar-total subquery is a one-row aggregate broadcast-joined
    back; both sides compare int64 cents against the same double threshold,
    so the HAVING cut is engine-independent. One lineitem shuffle on
    l_partkey; supplier/nation/region broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    v = (
        l.join(F.broadcast(asia_supp), l.l_suppkey == asia_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)
                )
            ).alias("val_cents")
        )
    )
    total = v.agg(F.sum("val_cents").alias("total_cents"))
    return (
        v.join(F.broadcast(total))
        .where(F.col("val_cents") > 0.001 * F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("val_cents") / 100.0).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q12",
    oracle=(
        "SELECT l.l_returnflag, "
        "CAST(count(*) FILTER (o.o_orderpriority IN ('1-URGENT', '2-HIGH')) AS BIGINT) "
        "AS high_line_count, "
        "CAST(count(*) FILTER (o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT) "
        "AS low_line_count "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY "
        "AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY l.l_returnflag"
    ),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-priority classes, adapted: the mode dimension is
    l_returnflag (no l_shipmode) and "late" is shipped >30 days after the
    order date (no receipt/commit dates). Conditional counts stay as
    sum(when) expressions inside one hash aggregate — single
    lineitem⋈orders shuffle, shipdate range pushed to the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.where(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16",
    oracle=(
        "SELECT p.p_brand, p.p_type, p.p_size, "
        "CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps "
        "JOIN part p ON ps.l_partkey = p.p_partkey "
        "WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO' "
        "AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25) "
        "AND ps.l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY 1, 2, 3 "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
    ),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship, adapted: the part↔supplier pairs
    come from distinct lineitem sales (no partsupp) and the excluded
    suppliers are those with negative balances (no comment column to match
    complaints in). NOT IN over a provably non-null key column is a
    left-anti join; part filters broadcast. No intermediate pair-distinct:
    ``count_distinct`` dedups inside its own aggregate, so the fact table
    shuffles exactly once — after the broadcast part filter and supplier
    anti-join have dropped ~85% of its rows."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad_supp = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    part_f = p.where(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    )
    return (
        l.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), l.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part_f), F.col("l_partkey") == part_f.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# Q20 oracle (DuckDB), kept beside the implementation so round 4 only adds
# the @register line — the driver's 50-slot verification window is full this
# round (COVERAGE.md, "Driver verification budget").
TPCH_Q20_ORACLE = (
    "WITH shipped AS ("
    "  SELECT l_suppkey, l_partkey, "
    "    CAST(coalesce(sum(CAST(l_quantity AS BIGINT)) FILTER ("
    "      l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
    "      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'), 0) AS BIGINT) AS qty_97, "
    "    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_all "
    "  FROM lineitem GROUP BY 1, 2"
    ") SELECT DISTINCT s.s_name, round(s.s_acctbal, 2) AS s_acctbal "
    "FROM shipped sh "
    "JOIN part p ON sh.l_partkey = p.p_partkey AND p.p_name LIKE '%bolt%' "
    "JOIN supplier s ON sh.l_suppkey = s.s_suppkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "WHERE r.r_name = 'MIDDLE EAST' AND sh.qty_97 > 0.5 * sh.qty_all "
    "ORDER BY s_name"
)


@register("tpch_q20", oracle=TPCH_Q20_ORACLE)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion, adapted: MIDDLE EAST suppliers holding a
    part↔supplier pair (no partsupp — pairs come from lineitem) on a
    '%bolt%' part whose 1997 shipped quantity exceeds half the pair's
    all-time shipped quantity (the original compares ps_availqty against
    half the year's shipments; with no availqty the ratio inverts onto the
    shipment history itself). Quantities are integral, summed as int64 —
    the 0.5× threshold compare is exact on both engines.

    Staged unregistered in round 3 (full driver window), registered in
    round 4; tests/test_round3.py additionally compares it to DuckDB
    directly. Completes 22/22 TPC-H coverage.

    Scale: one lineitem shuffle on (suppkey, partkey); part filter and the
    supplier→nation→region chain broadcast; DISTINCT runs on the tiny
    qualified-supplier set."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    in_97 = (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00")) & (
        F.col("l_shipdate") < _ts("1998-01-01 00:00:00")
    )
    qty = F.col("l_quantity").cast("long")
    shipped = l.groupBy("l_suppkey", "l_partkey").agg(
        F.coalesce(F.sum(F.when(in_97, qty)), F.lit(0)).alias("qty_97"),
        F.sum(qty).alias("qty_all"),
    )
    me_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.where(F.col("r_name") == "MIDDLE EAST")),
            n.n_regionkey == r.r_regionkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return (
        shipped.where(F.col("qty_97") > 0.5 * F.col("qty_all"))
        .join(
            F.broadcast(p.where(F.col("p_name").like("%bolt%")).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(F.broadcast(me_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .distinct()
        .orderBy("s_name")
    )


@register(
    "tpch_q21",
    oracle=(
        "WITH order_stats AS ("
        "  SELECT l.l_orderkey, "
        "    count(DISTINCT l.l_suppkey) AS n_supp, "
        "    count(DISTINCT l.l_suppkey) FILTER "
        "      (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS n_late "
        "  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "  WHERE o.o_orderstatus = 'F' GROUP BY 1"
        ") SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait "
        "FROM lineitem l1 "
        "JOIN orders o ON l1.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l1.l_suppkey = s.s_suppkey "
        "JOIN order_stats os ON l1.l_orderkey = os.l_orderkey "
        "WHERE o.o_orderstatus = 'F' "
        "AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY "
        "AND os.n_supp > 1 AND os.n_late = 1 "
        "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100"
    ),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting, adapted: "late" is shipped
    >60 days after the order date (no receipt/commit dates). The original's
    EXISTS(other supplier) / NOT EXISTS(other late supplier) pair is
    algebraized into one per-order aggregate — distinct supplier count and
    distinct LATE supplier count — so the multi-supplier + sole-late-supplier
    condition is ``n_supp > 1 AND n_late = 1`` checked once per order,
    replacing two correlated scans of lineitem with a single extra
    aggregate on the same l_orderkey shuffle key. Late l1 rows then join the
    qualifying orders; supplier broadcasts."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    of = o.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = l.join(of, l.l_orderkey == of.o_orderkey)
    stats = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
    )
    waiting = stats.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)).select(
        F.col("l_orderkey").alias("w_orderkey")
    )
    return (
        lo.where(late)
        .join(waiting, F.col("l_orderkey") == F.col("w_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
