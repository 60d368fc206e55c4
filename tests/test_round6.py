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


# --- round-6b: chunking / block dedup / int8 quantization / z-order ----------


def test_text_chunk_reconstructs_documents(spark):
    """Stride-prefix concatenation invariant: taking the first STRIDE tokens
    of every chunk except the last, then the whole last chunk, must rebuild
    each document exactly — i.e. chunking loses no tokens and overlaps are
    exactly SIZE-STRIDE. (The oracle checks values; this pins the windowing
    geometry.)"""
    from parallel_mapreduce_wordcounting_spark.operators.chunking import (
        CHUNK_STRIDE,
        text_chunk,
    )

    docs = {
        r.doc_id: r.text
        for r in engine.load_table(spark, SF_DIR, "documents").collect()
    }
    chunks = {}
    for r in text_chunk(spark, SF_DIR).collect():
        chunks.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text
    assert set(chunks) == set(docs)
    for doc_id, by_id in chunks.items():
        parts = [by_id[i] for i in sorted(by_id)]
        toks = []
        for p in parts[:-1]:
            toks.extend(p.split(" ")[:CHUNK_STRIDE])
        toks.extend(parts[-1].split(" "))
        assert " ".join(toks) == docs[doc_id], doc_id


def test_dedup_lines_removes_exactly_corpus_heavy_blocks(spark):
    """Every surviving block occurs < LINE_DUP_MIN times corpus-wide, every
    removed block >= LINE_DUP_MIN; reconstruction preserves within-doc block
    order; and the rule actually fires on the fixture (non-vacuous)."""
    from parallel_mapreduce_wordcounting_spark.operators.chunking import (
        BLOCK,
        LINE_DUP_MIN,
        dedup_lines,
    )
    from collections import Counter

    docs = {
        r.doc_id: r.text.split(" ")
        for r in engine.load_table(spark, SF_DIR, "documents").collect()
    }
    freq = Counter()
    doc_blocks = {}
    for doc_id, toks in docs.items():
        blocks = [
            " ".join(toks[i : i + BLOCK]) for i in range(0, len(toks), BLOCK)
        ]
        doc_blocks[doc_id] = blocks
        freq.update(blocks)
    out = {r.doc_id: r for r in dedup_lines(spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    total_removed = 0
    for doc_id, blocks in doc_blocks.items():
        expect_kept = [b for b in blocks if freq[b] < LINE_DUP_MIN]
        r = out[doc_id]
        assert r.n_blocks == len(blocks)
        assert r.n_removed == len(blocks) - len(expect_kept)
        assert r.cleaned_text == " ".join(expect_kept)
        total_removed += r.n_removed
    assert total_removed > 0  # the C4 rule fires on this fixture


def test_quantize_int8_codes_bounded_and_tight(spark):
    """|q| <= 127 with the max-magnitude coordinate hitting exactly +-127,
    and the reconstruction MSE within the uniform-quantizer bound
    (scale/2)^2 — i.e. the codes actually use the full int8 range and the
    error is rounding error, not a scaling bug."""
    from parallel_mapreduce_wordcounting_spark.operators.similarity_ext import (
        sim_quantize_int8,
        sim_quantize_int8_vec,
    )

    rows = sim_quantize_int8_vec(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        amax_q = max(abs(v) for v in r.qvec)
        assert amax_q == 127  # scale = max|x|/127 maps the peak to the edge
        assert all(-127 <= v <= 127 for v in r.qvec)
        scale = r.scale_r
        assert r.mse_r <= (scale / 2) ** 2 + 1e-12
    # the registered (driver-verifiable) surface digests the same codes:
    # recompute sha256(join(qvec, ',')) from the library form's arrays
    import hashlib

    sha = {
        r.vec_id: hashlib.sha256(",".join(str(v) for v in r.qvec).encode()).hexdigest()
        for r in rows
    }
    reg = sim_quantize_int8(spark, SF_DIR).collect()
    assert {r.vec_id: r.qvec_sha for r in reg} == sha


def test_layout_zorder_narrows_partition_boxes(spark):
    """After repartitionByRange on the z-value, each partition's bounding
    box over (custkey, order-day) must be far smaller than the global box —
    the property that makes parquet min/max stats prune scans on EITHER
    dimension. A single-dimension sort (by custkey) leaves the day range
    per partition at ~100% of global; z-order shrinks the average box area
    by an order of magnitude."""
    from pyspark.sql import functions as F

    z = engine.REGISTRY["layout_zorder"].fn(spark, SF_DIR)
    o = engine.load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1970-01-01")).alias("day"),
    )
    with_pid = (
        z.withColumn("pid", F.spark_partition_id())
        .join(F.broadcast(o), "o_orderkey")
    )
    boxes = (
        with_pid.groupBy("pid")
        .agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("ck_range"),
            (F.max("day") - F.min("day")).alias("day_range"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(boxes) >= 4  # range partitioner actually spread the data
    glob = o.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        (F.max("day") - F.min("day")).alias("dy"),
    ).collect()[0]
    global_area = glob.ck * glob.dy
    weighted_area = sum(b.ck_range * b.day_range * b.n for b in boxes) / sum(
        b.n for b in boxes
    )
    assert weighted_area < 0.5 * global_area


def test_dedup_semantic_components_are_consistent(spark):
    """Every vector appears exactly once; representatives are fixpoints
    (rep of a rep is itself); every near-dup pair from dedup_embedding
    lands in the same component; keep <=> self-representative; and the
    fixture actually has multi-member components (non-vacuous)."""
    out = {r.vec_id: r for r in engine.REGISTRY["dedup_semantic"].fn(spark, SF_DIR).collect()}
    pairs = engine.REGISTRY["dedup_embedding"].fn(spark, SF_DIR).collect()
    n_vec = engine.load_table(spark, SF_DIR, "embeddings").count()
    assert len(out) == n_vec
    for r in out.values():
        assert out[r.rep_id].rep_id == r.rep_id  # fixpoint
        assert r.keep == (r.rep_id == r.vec_id)
        assert r.rep_id <= r.vec_id  # min-label convention
    for p in pairs:
        assert out[p.vec_id_a].rep_id == out[p.vec_id_b].rep_id, (
            p.vec_id_a,
            p.vec_id_b,
        )
    assert any(not r.keep for r in out.values())  # clusters exist at this SF


def test_sink_compact_collapses_file_count(spark, tmp_path):
    """The compaction rewrite must actually shrink the file population:
    64 fragment files in, <= 4 data files out, zero row loss."""
    import glob

    from parallel_mapreduce_wordcounting_spark.operators.relational import (
        sink_compact,
    )

    out = sink_compact(spark, SF_DIR)
    # the returned scan points at the compacted dir; pull it from the plan
    files = out.inputFiles()
    assert 1 <= len(files) <= 4
    assert out.count() == engine.load_table(spark, SF_DIR, "documents").count()


def test_kmeans_assignment_invariants(spark):
    """Every vector gets exactly one cluster in [0, K); Lloyd monotonicity:
    total inertia after the second assignment <= after the first (update
    then reassign can only improve the objective, up to the 6-dp centroid
    rounding both engines share)."""
    from parallel_mapreduce_wordcounting_spark.operators.similarity_ext import (
        KMEANS_K,
        sim_kmeans,
        _km_assign,
    )

    out = sim_kmeans(spark, SF_DIR).collect()
    n_vec = engine.load_table(spark, SF_DIR, "embeddings").count()
    assert len(out) == n_vec
    assert all(0 <= r.cluster < KMEANS_K and r.d2_r >= 0 for r in out)
    assert len({r.cluster for r in out}) > 1  # didn't collapse to one blob

    e = engine.load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    ev = e.select("vec_id", F.posexplode("v").alias("pos", "x"))
    from pyspark.sql import Window

    w = Window.orderBy("vec_id")
    seed = e.orderBy("vec_id").limit(KMEANS_K).withColumn(
        "cid", F.row_number().over(w) - 1
    )
    c0 = seed.select(
        "cid", F.posexplode(F.transform("v", lambda x: F.round(x, 6))).alias("pos", "c")
    )
    a1 = _km_assign(ev, c0)
    inertia1 = a1.agg(F.sum("m.d2")).collect()[0][0]
    inertia2 = sum(r.d2_r for r in out)
    assert inertia2 <= inertia1 + 1e-6
