"""Sketch-certification / bloom-sink / anneal-mix wave, STAGED
behind ``staged_r31``–``r41`` in the verification-window queue
(implemented + oracle-tested now, deliberately NOT ``@register``-ed;
COVERAGE.md "verification budget"). tests/test_staged_r42.py runs the
same fn-vs-DuckDB compare the registry harness would, at sf0.001 AND
sf0.01.

Contents:

- ``agg_approx_percentile`` — the percentile sketch CERTIFIED the
  agg_sketch_merge way: ``percentile_approx`` (Greenwald–Khanna style
  quantile summaries, the only percentile that exists at 100 TB) is
  partition-order-dependent in its exact output (measured: repartition
  flips low digits), so the census emits the EXACT interpolating
  percentiles plus a boolean that the sketch landed inside the
  ±0.01-rank envelope — 100× wider than the accuracy=10000 guarantee
  (rank error ≤ n/accuracy = 1e-4·n), so the boolean is stable under
  any partitioning while a broken sketch still trips it.
- ``agg_freq_items`` — ``df.stat.freqItems`` (Karp–Shenker–Papadimitriou
  / misra-gries family) certified by its published guarantee: every item
  with frequency strictly above support·n MUST appear in the result
  (false positives allowed, false negatives never). The census emits the
  exact heavy hitters (DuckDB-recomputable) with their counts/shares and
  the containment boolean.
- ``sink_parquet_bloom`` — parquet BLOOM FILTER authoring
  (``parquet.bloom.filter.enabled#col``): write a lineitem projection
  with a bloom on l_suppkey, read it back through a point predicate, and
  emit the aggregate the ORIGINAL table must reproduce. At 100 TB the
  bloom lets a point-lookup scan skip every row group that cannot
  contain the key — authoring it at write time is the cheap half of that
  contract (the read-side skip is the format's job; the plan test pins
  the predicate reaching the scan).
- ``pipeline_anneal_mix`` — the two-stage pretrain→anneal data-mix
  allocation (the public FineWeb/LLaMA-style recipe shape): sources
  ranked by mean stopword-ratio quality, annealing budget =
  ``_ANNEAL_FRAC`` of corpus whitespace-token mass, filled greedily by
  WHOLE sources in rank order (the mix is a per-source decision — docs
  within a source ship together). Exact integer token arithmetic; the
  only doubles are 6-dp-rounded means.

Exactness doctrine: counts/tokens are exact integers (token masses in
BIGINT); quality means and percentiles round to 6 dp; the two sketch ops
emit only booleans about their approximate halves, never the
partition-dependent values themselves.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loader import load_table

# --- certified approximate percentiles ----------------------------------------

_PCTL_PS = (0.5, 0.9, 0.99)
_PCTL_ACCURACY = 10000
_PCTL_RANK_EPS = 0.01  # envelope half-width in rank space (100× the guarantee)

# one constant-p branch per percentile: DuckDB's quantile_cont binds only
# constant parameters, so the p-spine cannot be a column
AGG_APPROX_PERCENTILE_ORACLE = " UNION ALL ".join(
    f"SELECT CAST({p} AS DOUBLE) AS p, "
    f"round(quantile_cont(l_extendedprice, {p}), 6) AS exact_pctl, "
    "TRUE AS approx_in_envelope FROM lineitem"
    for p in _PCTL_PS
)


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. One aggregation pass computes the exact
    interpolating percentiles at p−ε/p/p+ε AND the sketch values; the
    output row per p carries the exact value and the envelope boolean.

    The nine exact percentiles (3 ps × {lo, p, hi}) ride ONE
    ``F.percentile`` call: each ``percentile()`` aggregate keeps its own
    full value-count buffer, so three separate calls triple the partial
    buffers and the final-merge work for byte-identical results (every p
    interpolates over the same sorted counts). Measured at sf0.1
    (alternating new/old in ONE session so host-contention waves hit
    both sides — the containment-A/B protocol): 2.60 vs 5.48 s and
    2.74 vs 5.70 s (~2.1×), output tuple-for-tuple equal."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = [max(p - _PCTL_RANK_EPS, 0.0) for p in _PCTL_PS]
    hi = [min(p + _PCTL_RANK_EPS, 1.0) for p in _PCTL_PS]
    k = len(_PCTL_PS)
    agg = li.agg(
        F.percentile(
            "l_extendedprice", F.lit(list(_PCTL_PS) + lo + hi)
        ).alias("exall"),
        F.percentile_approx(
            "l_extendedprice", F.lit(list(_PCTL_PS)), _PCTL_ACCURACY
        ).alias("ap"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"),
                F.round(F.col("exall")[i], 6).alias("exact_pctl"),
                (
                    (F.col("ap")[i] >= F.col("exall")[k + i])
                    & (F.col("ap")[i] <= F.col("exall")[2 * k + i])
                ).alias("approx_in_envelope"),
            )
            for i, p in enumerate(_PCTL_PS)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.p", "r.exact_pctl", "r.approx_in_envelope"
    )


# --- certified frequent items --------------------------------------------------

_FREQ_SUPPORT = 0.1

AGG_FREQ_ITEMS_ORACLE = (
    "WITH n AS (SELECT count(*) AS n FROM events), "
    "h AS ("
    "  SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type"
    f") SELECT event_type, CAST(cnt AS BIGINT) AS cnt, "
    "round(cnt / (1.0 * n.n), 6) AS share, TRUE AS in_freq_items "
    f"FROM h CROSS JOIN n WHERE cnt > {_FREQ_SUPPORT} * n.n"
)


def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. ``freqItems`` returns bounded metadata
    (≲ 1/support candidates), collected driver-side like every quantizer
    fit in this engine; the heavy-hitter truth it must contain is a plain
    exact aggregate."""
    e = load_table(spark, sf_dir, "events")
    fi = set(e.stat.freqItems(["event_type"], _FREQ_SUPPORT).first()[0])
    n = e.count()
    heavy = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") > _FREQ_SUPPORT * n)
    )
    return heavy.select(
        "event_type",
        "cnt",
        F.round(F.col("cnt") / F.lit(float(n)), 6).alias("share"),
        # the KSP guarantee: a true heavy hitter can never be absent
        F.col("event_type").isin(*fi).alias("in_freq_items")
        if fi
        else F.lit(False).alias("in_freq_items"),
    )


# --- parquet bloom-filter sink ---------------------------------------------------

_BLOOM_PROBE_SUPPKEY = 5

SINK_PARQUET_BLOOM_ORACLE = (
    f"SELECT CAST({_BLOOM_PROBE_SUPPKEY} AS BIGINT) AS l_suppkey, "
    "CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents "
    f"FROM lineitem WHERE l_suppkey = {_BLOOM_PROBE_SUPPKEY}"
)


def sink_parquet_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. Staging dir is keyed by (uid, source dir,
    row count) and reused when complete — the scan_binary_files / lsh
    census convention; the read-back point query must reproduce the
    original table's aggregate exactly (a wrong bloom can only ever skip
    too much, which the row count catches)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.round(F.col("l_extendedprice") * 100)).cast("long").alias("cents"),
    )
    n = li.count()
    # md5, not hash(): python str hashing is per-process randomized and
    # would defeat the staging reuse (the lsh-census tag convention)
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out_dir = os.path.join(
        tempfile.gettempdir(), f"pmrwc_bloom_sink_{os.getuid()}_{tag}_{n}"
    )
    table_dir = os.path.join(out_dir, "lineitem_bloom.parquet")
    if not os.path.isfile(os.path.join(table_dir, "_SUCCESS")):
        (
            li.write.option("parquet.bloom.filter.enabled#l_suppkey", "true")
            .option("parquet.bloom.filter.expected.ndv#l_suppkey", "100000")
            .mode("overwrite")
            .parquet(table_dir)
        )
    back = spark.read.parquet(table_dir).where(
        F.col("l_suppkey") == _BLOOM_PROBE_SUPPKEY
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("sum_cents"),
    ).select(
        F.lit(_BLOOM_PROBE_SUPPKEY).cast("long").alias("l_suppkey"),
        "n_rows",
        "sum_cents",
    )


# --- two-stage anneal mix ----------------------------------------------------------

_ANNEAL_FRAC = 0.1
_ANNEAL_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

_SW_LIST_SQL = ", ".join(f"'{w}'" for w in _ANNEAL_STOPWORDS)

PIPELINE_ANNEAL_MIX_ORACLE = (
    "WITH d AS ("
    "  SELECT source, len(string_split(lower(text), ' ')) AS toks, "
    "  len(list_filter(string_split(lower(text), ' '), "
    f"    w -> w IN ({_SW_LIST_SQL}))) AS sw "
    "  FROM documents"
    "), s AS ("
    "  SELECT source, CAST(sum(toks) AS BIGINT) AS src_tokens, "
    "  round(avg(sw / (1.0 * nullif(toks, 0))), 6) AS mean_quality "
    "  FROM d GROUP BY source"
    "), tot AS (SELECT sum(src_tokens) AS total FROM s), "
    "r AS ("
    "  SELECT source, src_tokens, mean_quality, "
    "  row_number() OVER (ORDER BY mean_quality DESC, source) AS rank, "
    "  sum(src_tokens) OVER (ORDER BY mean_quality DESC, source "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens "
    "  FROM s"
    ") SELECT source, CAST(rank AS INT) AS rank, mean_quality, src_tokens, "
    "CAST(cum_tokens AS BIGINT) AS cum_tokens, "
    f"cum_tokens - src_tokens < floor({_ANNEAL_FRAC} * tot.total) AS in_anneal "
    "FROM r CROSS JOIN tot"
)


def pipeline_anneal_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring. Greedy whole-source fill: a source enters the
    anneal stage iff the budget is not yet exhausted when its rank comes
    up (cum_before < floor(frac·total)); the crossing source ships whole.
    One token-stats shuffle by source, a broadcast 1-row total, and a
    |sources|-row window — nothing here scales with corpus size except
    the first aggregate."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), " ")
    sw = F.size(F.filter(words, lambda w: w.isin(*_ANNEAL_STOPWORDS)))
    per_doc = d.select(
        "source",
        F.size(words).cast("long").alias("toks"),
        sw.cast("long").alias("sw"),
    )
    s = per_doc.groupBy("source").agg(
        F.sum("toks").cast("long").alias("src_tokens"),
        F.round(
            F.avg(F.try_divide(F.col("sw"), F.nullif(F.col("toks"), F.lit(0)))), 6
        ).alias("mean_quality"),
    )
    tot = F.broadcast(s.agg(F.sum("src_tokens").alias("total")))
    w = Window.orderBy(F.col("mean_quality").desc(), "source")
    ranked = s.select(
        "source",
        "src_tokens",
        "mean_quality",
        F.row_number().over(w).cast("int").alias("rank"),
        F.sum("src_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum_tokens"),
    )
    return ranked.crossJoin(tot).select(
        "source",
        "rank",
        "mean_quality",
        "src_tokens",
        "cum_tokens",
        (
            F.col("cum_tokens") - F.col("src_tokens")
            < F.floor(_ANNEAL_FRAC * F.col("total"))
        ).alias("in_anneal"),
    )


DEV_CASES = [
    ("agg_approx_percentile", agg_approx_percentile, AGG_APPROX_PERCENTILE_ORACLE),
    ("agg_freq_items", agg_freq_items, AGG_FREQ_ITEMS_ORACLE),
    ("sink_parquet_bloom", sink_parquet_bloom, SINK_PARQUET_BLOOM_ORACLE),
    ("pipeline_anneal_mix", pipeline_anneal_mix, PIPELINE_ANNEAL_MIX_ORACLE),
]


# -- wave registration (appended by scripts/register_staged.py) --
from ..registry import B_PREFIXES as _B_PREFIXES
from ..registry import REGISTRY as _REGISTRY
from ..registry import register as _register

for _case in DEV_CASES:
    # defensive unpack: preflight_staged tolerates len(case) > 3 variance,
    # so the promoted block must too — a strict 3-tuple unpack would raise
    # ValueError at package import for any future 4-element entry
    _key, _fn, _oracle = _case[0], _case[1], (_case[2] if len(_case) > 2 else None)
    if _key not in _REGISTRY:  # idempotent under re-import / re-promotion
        _register(
            _key,
            oracle=_oracle,
            tier="B" if _key.startswith(_B_PREFIXES) else "C",
        )(_fn)
del _B_PREFIXES, _REGISTRY, _register
