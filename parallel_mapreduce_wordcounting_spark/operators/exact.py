"""Exact cross-engine money arithmetic.

``round(sum(double), 2)`` is a correctness hazard between engines: Spark and
DuckDB accumulate in different orders, the sums differ at ~1e-10, and when
the true value sits near a half-cent boundary the rounded results differ by
one cent (observed on tpch_q10 at sf0.01). The fix is fixed-point: round
each TERM to integer cents (per-row products are IEEE-identical on both
engines, so the cents are identical), sum as 64-bit integers — exact and
order-independent — and divide by 100 at the end. The result is
bit-identical on any engine at any partition count.

The per-term rounding is ``sign(x) * floor(abs(x)*100 + 0.5)`` — round half
AWAY FROM ZERO (HALF_UP), matching ``F.round``'s BigDecimal convention on
negative terms too (a bare ``floor(x*100 + 0.5)`` rounds half toward +inf,
which diverges on exactly-representable negative half-cents; ADVICE r3).
It avoids ``F.round`` itself because that routes every row through
BigDecimal, which profiling showed doubles agg_basic's runtime at sf0.1
(597 ms → 304 ms with the floor form, identical output). The sign/abs/floor
composition stays inside whole-stage codegen; the product sign*floor is an
integer-valued double well under 2^53, so the cast to long is exact.
tests/test_types.py pins the negative-half-cent behavior against both
``F.round`` and the DuckDB mirror.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_cents(expr: Column) -> Column:
    """``expr`` rounded to integer cents, HALF_UP, as int64."""
    return (F.signum(expr) * F.floor(F.abs(expr) * 100 + F.lit(0.5))).cast("long")


def money_sum(expr: Column) -> Column:
    """SUM of a money expression, exact to the cent in any summation order."""
    return F.sum(money_cents(expr)) / 100.0


def money_cents_sql(expr: str) -> str:
    """DuckDB mirror of :func:`money_cents`."""
    return f"CAST(sign(({expr})) * floor(abs(({expr})) * 100 + 0.5) AS BIGINT)"


def money_sum_sql(expr: str) -> str:
    """DuckDB mirror of :func:`money_sum` (sum cast from HUGEINT first)."""
    return f"CAST(sum({money_cents_sql(expr)}) AS BIGINT) / 100.0"


def floor_div_sql(num: str, den: int) -> str:
    """DuckDB FLOOR division of an integer expression by a positive constant.

    DuckDB's ``//`` truncates toward zero (probed: ``-7 // 2`` → -3, where a
    floor gives -4), but Spark-side day bucketing (``sources.loader.ts_day``)
    floors, so oracles bucketing pre-epoch timestamps with a bare ``//``
    would land one day late (ADVICE r5, medium). Subtracting the
    non-negative guarded modulo first makes the numerator an exact multiple
    of ``den``, where truncation and floor coincide — all-integer, exact for
    any int64 input, no float round-trip."""
    return f"((({num}) - (((({num}) % {den}) + {den}) % {den})) // {den})"


def floor_day_us_sql(us_expr: str = "epoch_ns(ts) // 1000") -> str:
    """DuckDB mirror of :func:`...sources.loader.ts_day`: FLOOR epoch-day
    from an integer-µs expression (the default reads the fixture's
    TIMESTAMP_NS column; ns are whole µs so that inner ``//`` is exact)."""
    return f"CAST({floor_div_sql(us_expr, 86_400_000_000)} AS BIGINT)"
