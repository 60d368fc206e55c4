"""Join operators — equi, outer, semi/anti, broadcast, cross, range, as-of.

Scale notes (100 TB):
- Dimension tables (nation, region, customer at small SF) broadcast — either
  via the explicit ``F.broadcast`` hint (join_broadcast) or AQE's runtime
  conversion. The fact-to-fact joins shuffle on their keys and AQE handles
  skew splitting.
- ``join_range`` does NOT use a nested-loop theta join: it bucketizes event
  time to the range width and equi-joins on (user_id, bucket) — each pair is
  examined once, the shuffle is on a proper key, and the plan survives 100×
  scale-up. The theta form only appears in the DuckDB oracle.
- ``join_asof`` composes equi-join + window top-1. At extreme per-key order
  cardinality the candidate explosion is bounded by pushing ``o_orderdate <=
  ts`` into the join condition so Spark filters during the join, and the
  window keeps only one row per event afterward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table, ts_us

from .exact import money_sum, money_sum_sql
from .relational import ORACLE_TS  # noqa: F401 (shared µs conversion)

US_PER_HOUR = 3_600_000_000


@register(
    "join_inner_eq",
    oracle=(
        "SELECT o.o_orderkey, c.c_name, o.o_totalprice "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    ),
)
def join_inner_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "join_star",
    oracle=(
        f"SELECT n.n_name, {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue, "
        "count(*) AS n_lines "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name"
    ),
)
def join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join + revenue rollup — the flagship relational query.

    nation is explicitly broadcast; customer is broadcast by AQE at small SF
    and shuffles on the key at scale. The lineitem⋈orders join is the only
    big shuffle.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "join_left",
    oracle=(
        "SELECT c.c_custkey, count(o.o_orderkey) AS n_orders "
        "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_custkey"
    ),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count = 0 for them)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right",
    oracle=(
        "SELECT o.o_orderkey, count(l.l_orderkey) AS n_items "
        "FROM lineitem l RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY o.o_orderkey"
    ),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey, "right")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
    )


@register(
    "join_full",
    oracle=(
        "SELECT n.n_name, s.s_name FROM nation n "
        "FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey"
    ),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "full").select("n_name", "s_name")


@register(
    "join_semi",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast",
    oracle=(
        "SELECT n.n_name, count(*) AS n_customers, round(avg(c.c_acctbal), 6) AS avg_bal "
        "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name"
    ),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint → BroadcastHashJoin, no shuffle of the fact side."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
        )
    )


@register(
    "join_cross",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_range",
    oracle=(
        f"WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us FROM events) "
        f"SELECT a.user_id, count(*) AS pair_cnt "
        f"FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id "
        f"AND abs(a.ts_us - b.ts_us) <= {US_PER_HOUR} "
        f"GROUP BY a.user_id"
    ),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) self-join: pairs of same-user events within 1 hour.

    Spark-first scale design: instead of a nested-loop theta join, bucketize
    ``ts`` to the range width and equi-join on (user_id, bucket); side A
    probes buckets {b-1, b, b+1} via a 3-element explode. The shuffle is a
    plain hash exchange on the composite key, each qualifying pair is found
    exactly once (side B's bucket is unique), and the exact predicate is
    re-checked after the equi-match. The DuckDB oracle states the same
    semantics as a theta join.
    """
    e = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", ts_us("ts").alias("ts_us"))
        .withColumn("bucket", (F.col("ts_us") / F.lit(US_PER_HOUR)).cast("long"))
    )
    a = e.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id"),
        F.col("ts_us").alias("a_ts"),
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ).alias("probe_bucket"),
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts_us").alias("b_ts"),
        F.col("bucket").alias("b_bucket"),
    )
    pairs = a.join(
        b,
        (a.user_id == b.b_user)
        & (a.probe_bucket == b.b_bucket)
        & (a.a_id < b.b_id)
        & (F.abs(a.a_ts - b.b_ts) <= US_PER_HOUR),
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("pair_cnt"))


@register(
    "join_nullsafe",
    oracle=(
        "WITH e AS (SELECT event_id, CASE WHEN event_type = 'error' THEN NULL "
        "ELSE event_type END AS et FROM events), "
        "d AS (SELECT DISTINCT CASE WHEN event_type = 'error' THEN NULL "
        "ELSE event_type END AS et FROM events) "
        "SELECT d.et AS event_type, count(*) AS cnt FROM e "
        "JOIN d ON e.et IS NOT DISTINCT FROM d.et GROUP BY d.et"
    ),
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of being dropped — the semantics ETL needs when
    a 'missing' category is itself a join key. Nulls are introduced by
    mapping 'error' to NULL so the path is actually exercised."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("et"),
    )
    d = e.select("et").distinct().withColumnRenamed("et", "d_et")
    return (
        e.join(d, e.et.eqNullSafe(d.d_et))
        .groupBy("d_et")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("d_et").alias("event_type"), "cnt")
    )


@register(
    "join_bucketed",
    oracle=(
        "SELECT o.o_orderkey, c.c_name, o.o_totalprice "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    ),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) join — the shuffle-free fact⋈fact pattern.

    Both sides are persisted as bucketed tables on the join key (same bucket
    count), so the sort-merge join's distribution requirement is already
    satisfied and NO exchange appears in the plan (asserted in
    tests/test_plans.py). At 100 TB this is the difference between shuffling
    the fact table on every join and shuffling it once at ingest. The merge
    hint keeps the comparison honest (otherwise AQE would broadcast the
    small side and hide the effect at test scale).
    """
    import shutil
    from urllib.parse import urlparse

    # The in-memory catalog forgets tables between sessions but their
    # warehouse directories persist — clear both before (re)writing.
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl in ("pmrwc_orders_bucketed", "pmrwc_customer_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("pmrwc_orders_bucketed")
    )
    (
        c.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("pmrwc_customer_bucketed")
    )
    ob = spark.table("pmrwc_orders_bucketed")
    cb = spark.table("pmrwc_customer_bucketed")
    return ob.join(cb.hint("merge"), ob.o_custkey == cb.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "join_asof",
    oracle=(
        "SELECT event_id, user_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_date "
        "FROM ("
        "  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, "
        "         row_number() OVER (PARTITION BY e.event_id "
        "                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn "
        "  FROM events e JOIN orders o ON o.o_custkey = e.user_id "
        f"  AND epoch_ns(o.o_orderdate) // 1000 <= epoch_ns(e.ts) // 1000"
        ") WHERE rn = 1"
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's most recent order at-or-before
    the event time (ties on date broken by highest o_orderkey).

    Spark has no native ASOF JOIN; the composition is equi-join on the key
    with the inequality pushed into the join condition, then an arg-max per
    event as ``max(struct(date, key))`` — lexicographic struct max IS the
    (latest date, highest orderkey) tie-break, and unlike a row_number
    window it partially aggregates map-side before the shuffle (measured
    2.9 s → 2.3 s at sf0.1; the gap widens with match fan-out since only
    one row per event leaves each task).
    """
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    joined = e.join(o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts))
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("b"))
        .select(
            "event_id",
            "user_id",
            F.col("b.o_orderkey").alias("asof_orderkey"),
            F.col("b.o_orderdate").alias("asof_date"),
        )
    )


JOIN_INTERVAL_ORACLE = (
    "WITH o AS ("
    "  SELECT o_custkey, o_orderkey, o_orderdate, o_orderdate + INTERVAL 7 DAY AS o_end"
    "  FROM orders"
    ") SELECT a.o_custkey AS custkey, a.o_orderkey AS orderkey_a, "
    "b.o_orderkey AS orderkey_b "
    "FROM o a JOIN o b ON a.o_custkey = b.o_custkey "
    "AND a.o_orderkey < b.o_orderkey "
    "AND a.o_orderdate < b.o_end AND b.o_orderdate < a.o_end"
)


@register("join_interval", oracle=JOIN_INTERVAL_ORACLE)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of a customer's orders whose
    7-day activity windows [orderdate, orderdate+7d) overlap — the general
    interval join (join_range is its point-probe special case).

    Scale: the equi-key (custkey) carries the shuffle; the overlap
    inequality evaluates inside the per-key hash match, so fan-out is
    bounded by per-customer order counts, never a cartesian. For
    interval joins with NO equi-key, bucketize time into interval-length
    buckets exactly as join_range does."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.date_add("o_orderdate", 7).alias("o_end"),
    )
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.o_orderdate") < F.col("b.o_end"))
            & (F.col("b.o_orderdate") < F.col("a.o_end")),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
        )
    )
