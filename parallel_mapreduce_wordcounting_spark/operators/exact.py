"""Exact cross-engine money arithmetic.

``round(sum(double), 2)`` is a correctness hazard between engines: Spark and
DuckDB accumulate in different orders, the sums differ at ~1e-10, and when
the true value sits near a half-cent boundary the rounded results differ by
one cent (observed on tpch_q10 at sf0.01). The fix is fixed-point: round
each TERM to integer cents (per-row products are IEEE-identical on both
engines, so the cents are identical), sum as 64-bit integers — exact and
order-independent — and divide by 100 at the end. The result is
bit-identical on any engine at any partition count.

The per-term rounding is ``floor(x*100 + 0.5)`` — round-half-toward-+inf —
on BOTH engines, not ``round()``: Spark's ``F.round`` routes every row
through BigDecimal HALF_UP, which profiling showed doubles agg_basic's
runtime at sf0.1 (597 ms → 304 ms with the floor form, identical output).
floor+0.5 and round() agree everywhere except exactly-representable
negative half-cent inputs, which stored 2-decimal columns cannot produce
(they sit within 1 ulp of an integer cent count); mirroring floor on the
DuckDB side makes the two engines identical by construction regardless.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(expr: Column) -> Column:
    """SUM of a money expression, exact to the cent in any summation order.

    ``F.floor`` already returns LONG, so the sum is pure int64 arithmetic
    inside whole-stage codegen — no BigDecimal, no extra cast.
    """
    return F.sum(F.floor(expr * 100 + F.lit(0.5))) / 100.0


def money_sum_sql(expr: str) -> str:
    """DuckDB mirror of :func:`money_sum` (sum cast from HUGEINT first)."""
    return f"CAST(sum(CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0"
