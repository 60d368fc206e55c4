"""parallel_mapreduce_wordcounting_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first re-expression of the capability surface of
the reference repo ``tangweichang/parallel_mapreduce_wordCounting`` (a
parallel MapReduce word-count engine; see SURVEY.md §0 — the reference tree
is empty, so the surface is reconstructed from canonical MapReduce word-count
semantics), extended with the LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) and relational/streaming coverage
mandated by the build brief.

Design principles (SURVEY.md §1.2, §4):
- DataFrame/SQL first: declare logical plans, let Catalyst + AQE pick the
  physical strategy (partial aggregation, broadcast joins, top-k via
  TakeOrderedAndProject, parquet column pruning / predicate pushdown).
- UDFs are the slow path: built-in ``pyspark.sql.functions`` everywhere the
  semantics allow; Arrow-batched pandas UDFs where Python is unavoidable.
- Every operator is registered in :mod:`.registry` with a DuckDB oracle SQL
  string so correctness is machine-checkable (the t2 contract).
- Designed for 100 TB: no ``collect()`` in any operator, shuffles only on
  declared keys, dimension tables broadcast, O(n²) ops have a blocked
  two-phase scale path (see operators/similarity.py, operators/dedup.py).
"""

from .registry import REGISTRY, register, queries, oracle_sql  # noqa: F401
from .sources.loader import load_table  # noqa: F401

# Import operator modules for their registration side effects.
from .operators import (  # noqa: F401,E402
    wordcount,
    relational,
    joins,
    aggregates,
    windows,
    scalar_fns,
    text,
    dedup,
    similarity,
    streaming_batch,
    udfs,
    multimodal,
    tpch,
    tpch_ext,
    tpch_full,
    windows_ext,
    aggregates_ext,
    subqueries,
    scalar_fns_ext,
    text_ext,
    events_analytics,
    similarity_ext,
    staged,
    curation_ext,
    warehouse,
    chunking,
    scale_ops,
    graph,
    staged_r8,
    staged_r9,
    staged_r10,
    staged_r11,
    staged_r12,
    staged_r13,
    staged_r14,
    staged_r15,
    staged_r16,
    staged_r17,
    staged_r18,
    staged_r19,
    staged_r20,
    staged_r21,
    staged_r22,
    staged_r23,
    staged_r24,
    staged_r25,
    staged_r26,
    staged_r27,
    staged_r28,
    staged_r29,
    staged_r30,
    staged_r31,
    staged_r32,
    staged_r33,
    staged_r34,
    staged_r35,
    staged_r36,
    staged_r37,
    staged_r38,
    staged_r39,
    staged_r40,
    staged_r41,
    staged_r42,
    staged_r43,
    staged_r44,
    staged_r45,
    staged_r46,
    staged_r47,
    staged_r48,
    staged_r49,
    staged_r50,
    staged_r51,
    staged_r52,
    staged_r53,
    staged_r54,
    staged_r55,
    staged_r56,
    staged_r57,
    staged_r58,
)

from . import pipelines  # noqa: F401,E402  (corpus-curation composition API)

__all__ = ["REGISTRY", "register", "queries", "oracle_sql", "load_table", "pipelines"]
__version__ = "0.1.0"
