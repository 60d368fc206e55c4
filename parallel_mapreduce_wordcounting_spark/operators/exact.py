"""Exact cross-engine money arithmetic.

``round(sum(double), 2)`` is a correctness hazard between engines: Spark and
DuckDB accumulate in different orders, the sums differ at ~1e-10, and when
the true value sits near a half-cent boundary the rounded results differ by
one cent (observed on tpch_q10 at sf0.01). The fix is fixed-point: round
each TERM to integer cents (per-row products are IEEE-identical on both
engines, so the cents are identical), sum as 64-bit integers — exact and
order-independent — and divide by 100 at the end. The result is
bit-identical on any engine at any partition count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(expr: Column) -> Column:
    """SUM of a money expression, exact to the cent in any summation order."""
    return F.sum(F.round(expr * 100).cast("long")) / 100.0


def money_sum_sql(expr: str) -> str:
    """DuckDB mirror of :func:`money_sum` (sum cast from HUGEINT first)."""
    return f"CAST(sum(CAST(round(({expr}) * 100) AS BIGINT)) AS BIGINT) / 100.0"
