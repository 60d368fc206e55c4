"""Window-function extensions: ntile bucketing, percent_rank/cume_dist,
and value-range (RANGE BETWEEN) frames — completing the §2.6 window surface
begun in windows.py.

Determinism: every window ORDER BY ends in a unique key (c_custkey /
p_partkey), so tie order — and therefore ntile/percent_rank output — is
identical across engines and partition counts.

Scale: one shuffle each, on the partition key. percent_rank/cume_dist need
the whole partition resident like any rank function; partitions here are
nation-sized (thousands of rows per key at 100 TB), never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table


@register(
    "win_ntile",
    oracle=(
        "SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal, "
        "CAST(ntile(4) OVER (PARTITION BY c_nationkey "
        "ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS quartile "
        "FROM customer"
    ),
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance quartiles per nation. ntile's bucket-size rule (first
    n_rows % 4 buckets get the extra row) is the SQL standard on both
    engines; the unique tiebreaker makes assignment deterministic."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_percent_cume",
    oracle=(
        "SELECT p_partkey, p_brand, p_size, "
        "round(percent_rank() OVER w, 6) AS pct_rank, "
        "round(cume_dist() OVER w, 6) AS cume "
        "FROM part WINDOW w AS (PARTITION BY p_brand ORDER BY p_size, p_partkey)"
    ),
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing of each part's size within its brand. Both
    functions are exact rationals ((rank-1)/(n-1), rows≤/n) computed the
    same way by both engines; rounding only guards the division."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "win_range_frame",
    oracle=(
        "SELECT p_partkey, p_brand, p_size, "
        "count(*) OVER (PARTITION BY p_brand ORDER BY p_size "
        "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_near, "
        "CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) OVER ("
        "PARTITION BY p_brand ORDER BY p_size "
        "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 "
        "AS near_price "
        "FROM part"
    ),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: for each part, aggregate over all brand-mates
    within 2 size units below — RANGE semantics (peers by value), not ROWS.
    The framed sum uses integer cents so frame-internal summation order
    can't produce float drift."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-2, 0)
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.count(F.lit(1)).over(w).alias("n_near"),
        (F.sum(cents).over(w) / 100.0).alias("near_price"),
    )
