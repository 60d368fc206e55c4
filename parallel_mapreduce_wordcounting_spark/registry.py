"""Central operator registry — the t2 contract surface.

Every operator key from SURVEY.md §2 is registered here as a
:class:`QuerySpec`: a PySpark query callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent DuckDB oracle SQL. The driver
compares the two at sf0.01 (row-count + schema + order-insensitive
value-hash), so:

- every computed column is aliased identically on both sides,
- every ``ORDER BY ... LIMIT`` carries a unique tiebreaker,
- compared double aggregates are rounded identically on both sides
  (summation-order noise between Spark and DuckDB lives below 1e-9;
  rounding to ≤6 decimals absorbs it).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver's rows-only check
    tier: str = "C"  # A = reference word-count surface, B = LLM-pipeline, C = relational/stream
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    key: str,
    oracle: str | None = None,
    tier: str = "C",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as the implementation of operator ``key``."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate operator key: {key}")
        REGISTRY[key] = QuerySpec(key=key, fn=fn, oracle=oracle, tier=tier, tags=tags)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    """The ``queries()`` dict for ``__spark_entry__.py``."""
    return {k: spec.fn for k, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """The ``oracle_sql()`` dict for ``__spark_entry__.py`` (SQL-expressible ops only)."""
    return {k: spec.oracle for k, spec in sorted(REGISTRY.items()) if spec.oracle is not None}
