"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`parallel_mapreduce_wordcounting_spark` — the engine
package registers every operator from SURVEY.md §2 in a central registry
(query callable + DuckDB oracle SQL); this module re-exports that surface in
the driver's expected shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import parallel_mapreduce_wordcounting_spark as engine


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-10 word counts over the sf0.001 documents corpus —
    the reference's raison d'être (tokenize → count → top-k)."""
    return engine.REGISTRY["wc_topk"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return engine.queries()


def oracle_sql() -> dict[str, str]:
    return engine.oracle_sql()
