"""Round-6 additions: Misra–Gries heavy-hitter sketch (soundness + parity
with the exact operator) and related scale-path variants. Value parity vs
DuckDB is covered by the auto-parametrized tests/test_oracle_parity.py; these
pin the guarantees the oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

import parallel_mapreduce_wordcounting_spark as engine

from .conftest import SF_DIR


def test_heavy_hitters_sketch_equals_exact(spark):
    """The sketch form's candidate-rescan must reproduce the exact operator's
    answer set and counts bit-for-bit (that equality is what licenses
    sharing the exact oracle)."""
    exact = {
        (r.word, r.cnt, r.frac)
        for r in engine.REGISTRY["agg_heavy_hitters"].fn(spark, SF_DIR).collect()
    }
    sketch = {
        (r.word, r.cnt, r.frac)
        for r in engine.REGISTRY["agg_heavy_hitters_sketch"].fn(spark, SF_DIR).collect()
    }
    assert sketch == exact
    assert exact  # non-vacuous: the fixture has φ-heavy words


def test_heavy_hitters_sketch_never_drops_heavy_item(spark, tmp_path):
    """The MG no-drop guarantee under adversarial skew and a DELIBERATELY
    tiny k: two planted words carry >1/50 of token mass each, scattered
    across many partitions, padded with a long tail of unique words sized
    to evict everything evictable. k=60 ≥ 1/φ=50 must still surface both
    planted words — if the union-of-summaries candidate set were not a
    superset of the true heavy set, the rescan could not recover them."""
    from parallel_mapreduce_wordcounting_spark.operators.aggregates_ext import (
        agg_heavy_hitters_sketch,
    )

    # 100 docs x 40 tokens = 4000 tokens; each planted word appears ~125
    # times (frac ~0.031 > 1/50), tail words are all unique singletons.
    uid = iter(range(10**6))
    rows = []
    for i in range(100):
        toks = []
        for j in range(40):
            if (i * 40 + j) % 16 == 0:
                toks.append("heavya" if i % 2 == 0 else "heavyb")
            else:
                toks.append(f"tail{next(uid)}")
        rows.append((i, " ".join(toks), "en", "src0", 10))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(16)  # scatter both planted words across many partitions
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {r.word for r in agg_heavy_hitters_sketch(spark, str(tmp_path), k=60).collect()}

    # independent exact heavy set
    tokens = (
        spark.read.parquet(f"{tmp_path}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.col("word") != "")
    )
    total = tokens.count()
    heavy = {
        r.word
        for r in tokens.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * 50 > F.lit(total))
        .collect()
    }
    assert {"heavya", "heavyb"} <= heavy  # the plant worked
    assert got == heavy


def test_heavy_hitters_sketch_candidate_set_is_bounded(spark):
    """The whole point of the sketch: the only shuffle runs over the
    candidate-pruned tokens. Candidates are bounded by partitions*k, never
    vocabulary-sized."""
    import parallel_mapreduce_wordcounting_spark as e
    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table

    d = load_table(spark, SF_DIR, "documents")
    tokens = d.select(F.explode(F.split(F.lower("text"), " ")).alias("word")).where(
        F.col("word") != ""
    )
    vocab = tokens.select("word").distinct().count()
    n_parts = tokens.rdd.getNumPartitions()
    k = 100
    assert n_parts * k < vocab or vocab <= k, (
        "fixture too small to demonstrate pruning"
    )


def test_star_contraction_handles_long_chain(spark):
    """A diameter-199 path graph: min_label_propagation would need 100+
    rounds (it RAISES at its 20-round bound); star contraction must finish
    in O(log n) rounds and label every node 0."""
    import pytest

    from parallel_mapreduce_wordcounting_spark.operators.dedup import (
        min_label_propagation,
        star_contraction,
    )

    n = 200
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "u long, v long"
    ).repartition(8)

    labels = {r.u: r.label for r in star_contraction(edges).collect()}
    assert labels == {i: 0 for i in range(n)}

    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_propagation(edges)


def test_star_contraction_agrees_with_propagation_on_fixture(spark):
    """Both connected-component variants must produce identical clusters on
    the real near-dup pair graph (and on a multi-component random graph)."""
    import random

    from parallel_mapreduce_wordcounting_spark.operators.dedup import (
        min_label_propagation,
        star_contraction,
    )

    prop = {
        (r.doc_id, r.cluster_id)
        for r in engine.REGISTRY["dedup_cluster"].fn(spark, SF_DIR).collect()
    }
    star = {
        (r.doc_id, r.cluster_id)
        for r in engine.REGISTRY["dedup_cluster_star"].fn(spark, SF_DIR).collect()
    }
    assert star == prop
    assert star  # the fixture plants near-dups: non-vacuous

    rng = random.Random(6)
    raw = {(rng.randrange(60), rng.randrange(60)) for _ in range(70)}
    ugraph = [(a, b) for a, b in raw if a != b]
    edges = spark.createDataFrame(
        ugraph + [(b, a) for a, b in ugraph], "u long, v long"
    )
    a = sorted((r.u, r.label) for r in star_contraction(edges).collect())
    b = sorted((r.u, r.label) for r in min_label_propagation(edges).collect())
    assert a == b
