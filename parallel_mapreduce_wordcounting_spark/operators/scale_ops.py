"""Z-order (Morton) layout — multi-dimensional clustering with an
oracle-checked key. Companion to ``join_salted``/``agg_salted`` (skew),
``join_bucketed`` (co-located joins) and ``join_dpp`` (dynamic partition
pruning): together the standard levers against the shuffle/scan
bottlenecks a 100 TB deployment hits first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table
# --- Z-order (Morton) layout -------------------------------------------------

ZBITS = 16


def _interleave(x, y):
    """Morton-interleave two long columns' low ZBITS bits (x even bits,
    y odd bits). Disjoint bit positions make ``+`` equal to OR, and the
    whole expression stays in whole-stage codegen."""
    z = F.lit(0).cast("long")
    for i in range(ZBITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def _interleave_sql(x, y):
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


LAYOUT_ZORDER_ORACLE = (
    "SELECT o_orderkey, CAST("
    + _interleave_sql(
        "(o_custkey & 65535)",
        "(date_diff('day', DATE '1970-01-01', o_orderdate) & 65535)",
    )
    + " AS BIGINT) AS zval FROM orders"
)


@register("layout_zorder", oracle=LAYOUT_ZORDER_ORACLE, tier="C")
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over (customer, order-day): interleaving the
    two dimensions' bits gives a single sort key under which rows close in
    EITHER dimension land in the same range — so after
    ``repartitionByRange(zval)`` + ``sortWithinPartitions``, every file
    holds a narrow min/max box in BOTH columns and parquet row-group
    statistics prune scans filtered on either one (the Delta/Iceberg
    OPTIMIZE ZORDER layout, reproduced with stock Spark primitives;
    tests/test_round6.py asserts the per-partition range narrowing).

    Scale: the interleave is 64 codegen'd bit ops per row; the range
    repartition is the one shuffle (plus its driver-side range sampling),
    exactly what a periodic layout-compaction job pays. 16 bits/dim keeps
    the demo exact on the fixture's key ranges; production would first
    rank/bucket each dimension to its quantiles to spread skew before
    interleaving."""
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_custkey").cast("long").bitwiseAND(F.lit(65535))
    y = (
        F.datediff("o_orderdate", F.lit("1970-01-01"))
        .cast("long")
        .bitwiseAND(F.lit(65535))
    )
    z = o.select("o_orderkey", _interleave(x, y).cast("long").alias("zval"))
    return z.repartitionByRange(8, "zval").sortWithinPartitions("zval")
