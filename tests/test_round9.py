"""Round-9 additions: degree-ordered (compact-forward) edge orientation in
graph_triangle_stats (r8 verdict item 7) and the upgraded full-oracle forms
of sink_parquet / mm_embed. Value parity vs DuckDB is covered by
tests/test_oracle_parity.py; these pin what the oracle can't express."""

from __future__ import annotations

import pyspark.sql.functions as F

from parallel_mapreduce_wordcounting_spark.operators import staged_r9

from .conftest import SF_DIR


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "da long, db long")


def _hub_wedge_graph():
    """A star with a MIDDLE-id hub (node 20, adjacent to 0..40 sans 20),
    plus one genuine triangle (41,42,43). Under id orientation the hub has
    20 in-edges and 20 out-edges, so the wedge join's e1.db==e2.da
    intermediate carries indeg·outdeg = 400 hub rows; the degree
    orientation points every hub edge INTO the hub (leaves have degree 1)
    and the hub contributes zero wedge rows."""
    pairs = [(min(i, 20), max(i, 20)) for i in range(41) if i != 20]
    pairs += [(41, 42), (41, 43), (42, 43)]
    return pairs


def _wedge_join_rows(e):
    """Input size of the triangle join's first stage: |e1 ⋈ e2 on db=da|
    (= Σ_b indeg(b)·outdeg(b) under the given orientation)."""
    return (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.db") == F.col("e2.da"))
        .count()
    )


def test_degree_orientation_bounds_hub_fanout(spark):
    """On the planted hub-wedge graph the degree orientation must shrink
    the wedge intermediate to just the genuine triangle's single wedge,
    where the id orientation routes indeg·outdeg = 20·20 = 400 wedge rows
    through the hub. This is the join-input reduction the compact-forward
    ordering buys on skewed graphs."""
    e_id = _edges(spark, _hub_wedge_graph())  # already low-id -> high-id
    e_deg = staged_r9.orient_by_degree(e_id)
    id_wedges = _wedge_join_rows(e_id)
    deg_wedges = _wedge_join_rows(e_deg)
    assert id_wedges >= 20 * 20  # the hub fan-out under id orientation
    assert deg_wedges == 1  # only 41->42 ⋈ 42->43 (the real triangle)


def test_degree_orientation_preserves_triangle_count(spark):
    """Triangle counts are orientation-invariant: the 3-join census over
    degree-oriented edges must equal the brute-force count on graphs with
    hubs, cliques, chains and ties (all degrees equal => pure id
    tiebreak)."""
    from itertools import combinations

    graphs = [
        _hub_wedge_graph(),
        # K4: every degree ties at 3 -> orientation falls back to ids
        list(combinations(range(4), 2)),
        # chain + pendant triangle
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (3, 5)],
    ]
    for pairs in graphs:
        adj = set(pairs) | {(b, a) for a, b in pairs}
        nodes = sorted({n for p in pairs for n in p})
        brute = sum(
            1
            for a, b, c in combinations(nodes, 3)
            if (a, b) in adj and (b, c) in adj and (a, c) in adj
        )
        eo = staged_r9.orient_by_degree(_edges(spark, pairs))
        got = (
            eo.alias("e1")
            .join(eo.alias("e2"), F.col("e1.db") == F.col("e2.da"))
            .join(
                eo.alias("e3"),
                (F.col("e1.da") == F.col("e3.da"))
                & (F.col("e2.db") == F.col("e3.db")),
            )
            .count()
        )
        assert got == brute, pairs


def test_degree_orientation_is_a_permutation_of_the_edge_set(spark):
    """orient_by_degree must re-orient, never drop/duplicate: the
    undirected edge multiset is preserved."""
    pairs = _hub_wedge_graph()
    eo = staged_r9.orient_by_degree(_edges(spark, pairs)).collect()
    assert sorted((min(r.da, r.db), max(r.da, r.db)) for r in eo) == sorted(pairs)


def _oracle_compare(spark, duck, fn, oracle_sql):
    from .conftest import compare_frames

    res = duck.execute(oracle_sql)
    cols = [c[0] for c in res.description]
    compare_frames(fn(spark, SF_DIR), res.fetchall(), cols)


def test_mm_binary_surface_matches_round10_oracle(spark, duck):
    """The round-10 oracle (registration deferred: the r9 window is full)
    must already replay the stub decode byte-exactly — width/height from
    octet_length and the first payload byte, md5 over the same utf-8
    bytes."""
    from parallel_mapreduce_wordcounting_spark.operators import multimodal

    _oracle_compare(
        spark, duck, multimodal.mm_binary_surface,
        multimodal.MM_BINARY_SURFACE_ORACLE,
    )


def test_mm_frame_sample_matches_round10_oracle(spark, duck):
    """DuckDB reconstructs each sampled 64-byte frame via
    unhex(substr(hex(payload))) and sha256 must agree with hashlib's."""
    from parallel_mapreduce_wordcounting_spark.operators import multimodal

    _oracle_compare(
        spark, duck, multimodal.mm_frame_sample,
        multimodal.MM_FRAME_SAMPLE_ORACLE,
    )


def test_udtf_python_matches_round10_oracle(spark, duck):
    """The UDTF demonstration's OUTPUT is plain relational algebra; the
    deferred oracle states it (10 decile rows per lang, floor budget)."""
    from parallel_mapreduce_wordcounting_spark.operators import udfs

    _oracle_compare(spark, duck, udfs.udtf_python, udfs.UDTF_PYTHON_ORACLE)


def test_triangle_stats_fixture_output_unchanged_by_orientation(spark, duck):
    """The registered census must stay value-identical to the oracle (which
    still orients by id): nodes/edges/wedges/triangles/clustering are all
    orientation-invariant, so the r9 re-verify hash attests the same
    numbers the r7 verdict did."""
    got = staged_r9.graph_triangle_stats(spark, SF_DIR).collect()[0]
    exp = duck.execute(staged_r9.GRAPH_TRIANGLE_STATS_ORACLE).fetchone()
    assert tuple(got) == tuple(exp)
