"""Round-14 pins (optimization round 2): the Jaccard engine's dense-int32
dictionary + Arrow verify kernel must be output-identical to a string-array
verify (the r13 ADVICE consistency item), the verify kernel's exact
intersection counts, and the MaxSim kernel's bounded-memory chunking (the
r13 ADVICE memory item) must be score-identical to the unchunked fold."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from parallel_mapreduce_wordcounting_spark.operators import staged_r46
from parallel_mapreduce_wordcounting_spark.operators.dedup import (
    _pair_intersect_counts,
    _shingle_id_sets,
    ngram_jaccard_pairs_of,
)


def _sh_frame(spark, sets):
    return spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(sets)],
        "doc_id long, shingles array<string>",
    )


# --- Jaccard engine: dictionary verify ≡ string-array verify -----------------


def _string_verify_pairs(spark, sets, tau):
    """Reference: brute-force all-pairs with the verify on STRING arrays —
    the pre-r13 medium. Any divergence from the dictionary/Arrow engine
    means the dictionary stopped being a bijection or the kernel
    mis-counted."""
    sh = _sh_frame(spark, sets)
    a = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sb"))
    return {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in (
            a.join(b, F.col("doc_id_a") < F.col("doc_id_b"))
            .withColumn("c", F.size(F.array_intersect("sa", "sb")))
            .withColumn(
                "jaccard_raw",
                F.col("c").cast("double")
                / (F.size("sa") + F.size("sb") - F.col("c")),
            )
            .where(F.col("jaccard_raw") >= tau)
            .select(
                "doc_id_a", "doc_id_b", F.round("jaccard_raw", 6).alias("jaccard")
            )
            .collect()
        )
    }


def test_jaccard_dictionary_verify_matches_string_verify(spark):
    """Planted corpus with heavy overlap and boundary-τ pairs: the
    dense-dictionary + Arrow-kernel engine must return EXACTLY the
    string-array verify's pair set (values included)."""
    rng = random.Random(1404)
    pool = [f"tok{i}" for i in range(40)]
    sets = [rng.sample(pool, rng.randint(3, 12)) for _ in range(25)]
    sets += [sets[0][:], sets[1][:6] + ["zz1", "zz2"]]  # exact dup + near-dup
    got = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in ngram_jaccard_pairs_of(_sh_frame(spark, sets), 0.3).collect()
    }
    assert got == _string_verify_pairs(spark, sets, 0.3)


def test_shingle_id_sets_dense_sorted_int(spark):
    """The dictionary ids are exactly a permutation of 0..|vocab|−1 (the
    two-level packing is DENSE), each document's array is sorted (the
    Arrow kernel's precondition), and the column is int32 while the
    vocabulary fits."""
    sets = [[f"s{i}", f"s{i+1}", f"s{i+2}"] for i in range(20)]
    ids = _shingle_id_sets(_sh_frame(spark, sets))
    assert dict(ids.dtypes)["ids"] == "array<int>"
    rows = ids.collect()
    all_ids = sorted({i for r in rows for i in r.ids})
    vocab = len({s for ss in sets for s in ss})
    assert all_ids == list(range(vocab))
    for r in rows:
        assert list(r.ids) == sorted(set(r.ids)), "ids must be sorted+unique"


# --- Arrow verify kernel: exact intersection counts --------------------------


def _kernel_batch(pairs):
    """pairs: list of (ida, idb, sa, sb) with sa/sb sorted int lists."""
    return pa.record_batch(
        [
            pa.array([p[0] for p in pairs], pa.int64()),
            pa.array([p[1] for p in pairs], pa.int64()),
            pa.array([p[2] for p in pairs], pa.list_(pa.int32())),
            pa.array([p[3] for p in pairs], pa.list_(pa.int32())),
        ],
        names=["doc_id_a", "doc_id_b", "sa", "sb"],
    )


def test_pair_intersect_counts_exact():
    rng = random.Random(7)
    pairs = []
    for i in range(50):
        sa = sorted(rng.sample(range(200), rng.randint(1, 30)))
        sb = sorted(rng.sample(range(200), rng.randint(1, 30)))
        pairs.append((i, 1000 + i, sa, sb))
    (out,) = list(_pair_intersect_counts(iter([_kernel_batch(pairs)])))
    got = list(
        zip(
            out.column("doc_id_a").to_pylist(),
            out.column("na").to_pylist(),
            out.column("nb").to_pylist(),
            out.column("c").to_pylist(),
        )
    )
    for (ida, idb, sa, sb), (gida, na, nb, c) in zip(pairs, got):
        assert gida == ida
        assert (na, nb) == (len(sa), len(sb))
        assert c == len(set(sa) & set(sb))


def test_pair_intersect_counts_rejects_empty_set():
    """The fail-loud guard: an empty shingle set must raise, not
    mis-count (r13 ADVICE: silent empty-segment hazards)."""
    batch = _kernel_batch([(0, 1, [], [1, 2])])
    with pytest.raises(AssertionError, match="empty shingle set"):
        list(_pair_intersect_counts(iter([batch])))


# --- MaxSim kernel: bounded-memory chunking is score-identical ---------------


def _maxsim_batch(rng, n_docs, max_toks):
    qh = sorted(rng.sample(range(65536), 17))
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "hs": [
                sorted(rng.sample(range(65536), rng.randint(1, max_toks)))
                for _ in range(n_docs)
            ],
            "qid": np.zeros(n_docs, dtype=np.int64),
            "qh": [qh] * n_docs,
        }
    )


def test_maxsim_kernel_chunking_is_score_identical(monkeypatch):
    """Shrinking the block bound so every group needs many chunks must not
    change a single score — chunk cuts land on document boundaries."""
    rng = random.Random(99)
    pdf = _maxsim_batch(rng, n_docs=60, max_toks=40)
    (ref,) = list(staged_r46._maxsim_kernel(iter([pdf])))
    monkeypatch.setattr(staged_r46, "_MAXSIM_BLOCK_BYTES", 64)  # forces chunks
    (tiny,) = list(staged_r46._maxsim_kernel(iter([pdf])))
    pd.testing.assert_frame_equal(ref, tiny)


def test_maxsim_kernel_rejects_empty_token_set():
    rng = random.Random(3)
    pdf = _maxsim_batch(rng, n_docs=4, max_toks=5)
    pdf.at[2, "hs"] = []
    with pytest.raises(AssertionError, match="empty token set"):
        list(staged_r46._maxsim_kernel(iter([pdf])))
