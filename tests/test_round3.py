"""Round-3 regression guards: HALF_UP rounding in the numpy kernels,
the dedup_cluster convergence guard, and golden-value assertions for the
rows-only keys (dedup_simhash, udtf_python, agg_approx_distinct) that the
driver can only count rows for."""

from __future__ import annotations

import pytest

import parallel_mapreduce_wordcounting_spark as engine

from .conftest import SF_DIR
from parallel_mapreduce_wordcounting_spark.operators.dedup import (
    min_label_propagation,
)
from parallel_mapreduce_wordcounting_spark.operators.similarity import round_half_up

SF = "/root/testdata/sf0.001"


def test_round_half_up_matches_sql_semantics():
    """F.round / DuckDB round() are half-away-from-zero; np.round is
    half-to-even. 0.25 and 2.5 are exactly representable in binary, so the
    boundary behavior here is exact, not float noise."""
    import numpy as np

    assert round_half_up(0.25, 1) == 0.3
    assert round_half_up(-0.25, 1) == -0.3
    assert round_half_up(2.5, 0) == 3.0
    assert round_half_up(-2.5, 0) == -3.0
    # the divergence this guards against:
    assert np.round(0.25, 1) == 0.2
    out = round_half_up(np.array([[0.25, -2.5], [1.25, 0.125]]), 1)
    assert out.tolist() == [[0.3, -2.5], [1.3, 0.1]]


def _chain_edges(spark, n: int):
    """Path graph 0-1-...-(n-1), both orientations (the contract of
    min_label_propagation's edge list)."""
    rows = []
    for i in range(n - 1):
        rows.append((i, i + 1))
        rows.append((i + 1, i))
    return spark.createDataFrame(rows, "u long, v long")


def test_label_propagation_converges_on_chain(spark):
    labels = {
        r.u: r.label for r in min_label_propagation(_chain_edges(spark, 5)).collect()
    }
    assert labels == {i: 0 for i in range(5)}


def test_label_propagation_raises_instead_of_silent_wrong_labels(spark):
    """Past the round cap the old code returned partially-propagated (wrong)
    clusters; it must raise instead."""
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_propagation(_chain_edges(spark, 8), max_rounds=3)


def test_simhash_golden_values(spark):
    """Pinned fingerprints from the deterministic seed=42 corpus — catches
    any silent change to tokenization, the bit-vote expression, or the
    md5-derived 60-bit token hash (values re-pinned at the round-7
    xxhash64 -> md5 oracle upgrade; cross-engine equality is separately
    hash-verified by the driver oracle)."""
    rows = (
        engine.REGISTRY["dedup_simhash"].fn(spark, SF).orderBy("doc_id").limit(3).collect()
    )
    assert [(r.doc_id, r.simhash) for r in rows] == [
        (0, 517281522836383265),
        (1, 256306054299593313),
        (2, 255725409131244064),
    ]


def test_udtf_row_multiplicity(spark):
    """Each (lang, total) input row must expand to exactly deciles 0..9."""
    rows = engine.REGISTRY["udtf_python"].fn(spark, SF).collect()
    langs = {r.lang for r in rows}
    assert len(rows) == 10 * len(langs) == 50
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.decile)
    for lang, deciles in by_lang.items():
        assert sorted(deciles) == list(range(10)), lang
    # budget is constant across a lang's deciles (total // 10)
    budgets = {(r.lang, r.char_budget) for r in rows}
    assert len(budgets) == len(langs)


def test_approx_distinct_within_hll_error(spark):
    """approx_count_distinct's default rsd is 5%; assert every group's
    estimate is within 5% of the exact distinct count."""
    from pyspark.sql import functions as F

    approx = {
        r.l_returnflag: r.approx_parts
        for r in engine.REGISTRY["agg_approx_distinct"].fn(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r.l_returnflag: r.d
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        assert abs(est - exact[flag]) / exact[flag] <= 0.05, (flag, est, exact[flag])


def test_tpch_q20_matches_duckdb_directly(spark, duck):
    """Q20 is implemented but deliberately unregistered (the driver's
    50-slot verification window is full this round — COVERAGE.md). Compare
    it against its oracle SQL here so round 4's @register is a one-liner on
    already-verified code."""
    from parallel_mapreduce_wordcounting_spark.operators.tpch_full import (
        TPCH_Q20_ORACLE,
        tpch_q20,
    )

    got = sorted(map(tuple, tpch_q20(spark, SF).collect()))
    want = sorted(map(tuple, duck.execute(TPCH_Q20_ORACLE).fetchall()))
    assert len(got) > 0
    assert got == want


def test_bigram_pmi_survives_one_token_docs(spark, tmp_path):
    """Round-8 hazard sweep: a 1-token document used to crash the bigram
    branch (sequence(0, size-2) descends to [0,-1]; element_at(t, 0) and
    the out-of-bounds element_at(t, 2) both throw under ANSI). Short docs
    must contribute their UNIGRAM but no bigrams — verified value-for-value
    against the DuckDB oracle over the same modified table (so a
    regression that drops short docs from the unigram totals too would
    hash-mismatch, not just crash)."""
    import duckdb

    from pyspark.sql import functions as F

    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table

    from .conftest import compare_frames

    d = load_table(spark, SF_DIR, "documents")
    fn = engine.REGISTRY["text_bigram_pmi"].fn
    with_short = d.unionByName(
        spark.createDataFrame(
            [(20_000_001, "solo", "en", "srcY", 4)], d.schema
        )
    )
    with_short.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    res = con.execute(engine.REGISTRY["text_bigram_pmi"].oracle)
    cols = [c[0] for c in res.description]
    compare_frames(fn(spark, str(tmp_path)), res.fetchall(), cols)
