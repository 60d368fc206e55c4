"""Round-7 additions: CDC changelog compaction, gaps-and-islands streaks,
TF-IDF keyword extraction, iterative exact quantiles, and df.observe
metrics. Value parity vs DuckDB is covered by the auto-parametrized
tests/test_oracle_parity.py; these pin the guarantees the oracle can't
express (preconditions, adversarial orderings, rank conventions)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import parallel_mapreduce_wordcounting_spark as engine
from parallel_mapreduce_wordcounting_spark.operators.similarity_ext import (
    sim_pq_search,
)

from .conftest import SF_DIR


# ---------------------------------------------------------------- quantiles


def test_cents_integerization_is_bijective(duck):
    """agg_percentile_iterative's exactness precondition: cents
    integerization collapses nothing and round-trips to the identical
    double (so the found element IS quantile_disc's element)."""
    n_x, n_c, n_bad = duck.execute(
        "SELECT count(DISTINCT l_extendedprice), "
        "count(DISTINCT CAST(round(l_extendedprice*100) AS BIGINT)), "
        "(SELECT count(*) FROM (SELECT DISTINCT l_extendedprice AS x FROM lineitem) "
        " WHERE CAST(round(x*100) AS BIGINT)/100.0 <> x) "
        "FROM lineitem"
    ).fetchone()
    assert n_x == n_c and n_bad == 0


def test_percentile_iterative_matches_bruteforce_rank(spark):
    """Element-exactness vs an in-memory sort at the max(1, ceil(q*n)) rank
    convention (probed from DuckDB's quantile_disc), including both
    degenerate quantiles 0.0 (min) and 1.0 (max)."""
    from parallel_mapreduce_wordcounting_spark.operators.aggregates_ext import (
        agg_percentile_iterative,
    )

    qs = (0.0, 0.1, 0.5, 0.999, 1.0)
    got = {
        r.p: r.value
        for r in agg_percentile_iterative(spark, SF_DIR, qs=qs).collect()
    }
    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table

    xs = sorted(
        r[0] for r in load_table(spark, SF_DIR, "lineitem").select("l_extendedprice").collect()
    )
    n = len(xs)
    for q in qs:
        assert got[q] == xs[max(1, math.ceil(q * n)) - 1], q


def test_percentile_iterative_small_bucket_count(spark):
    """Convergence is bucket-count independent (more iterations, same
    answer) — the B=8 path exercises many narrowing rounds and the
    empty-bucket walk."""
    from parallel_mapreduce_wordcounting_spark.operators.aggregates_ext import (
        agg_percentile_iterative,
    )

    a = sorted(
        map(tuple, agg_percentile_iterative(spark, SF_DIR, buckets=8, max_iters=12).collect())
    )
    b = sorted(map(tuple, engine.REGISTRY["agg_percentile_iterative"].fn(spark, SF_DIR).collect()))
    assert a == b


# ---------------------------------------------------------------------- CDC


def test_cdc_apply_tombstone_semantics(spark):
    """A key whose NEWEST change is a tombstone must vanish; a key with a
    mid-history tombstone but a newer upsert must survive with the newest
    value — verified against a brute-force driver-side replay."""
    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table, ts_us

    e = (
        load_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            ts_us("ts").alias("ts_us"),
            "event_id",
            "value",
            (F.col("event_type") == "error").alias("is_del"),
        )
        .collect()
    )
    latest = {}
    counts = {}
    for r in e:
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
        k = (r.ts_us, r.event_id)
        if r.user_id not in latest or k > latest[r.user_id][0]:
            latest[r.user_id] = (k, r.is_del, r.value)
    expect = {
        u: (round(v, 2), counts[u])
        for u, (_, is_del, v) in latest.items()
        if not is_del
    }
    got = {
        r.user_id: (r.last_value, r.n_changes)
        for r in engine.REGISTRY["cdc_apply"].fn(spark, SF_DIR).collect()
    }
    assert got == expect
    # non-vacuous both ways: some key must actually have been tombstoned
    assert len(expect) < len(counts)


# ------------------------------------------------------------------ streaks


def test_event_streaks_against_bruteforce(spark):
    """Island decomposition vs a pure-Python replay over the distinct
    (user, day) pairs: longest run, number of runs, total active days."""
    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table, ts_day

    du = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", ts_day("ts").alias("day"))
        .distinct()
        .collect()
    )
    days_by_user: dict[int, set[int]] = {}
    for r in du:
        days_by_user.setdefault(r.user_id, set()).add(r.day)
    expect = {}
    for u, days in days_by_user.items():
        runs, run = [], 1
        ds = sorted(days)
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                run += 1
            else:
                runs.append(run)
                run = 1
        runs.append(run)
        expect[u] = (max(runs), len(runs), len(ds))
    got = {
        r.user_id: (r.longest_streak, r.n_streaks, r.n_active_days)
        for r in engine.REGISTRY["event_streaks"].fn(spark, SF_DIR).collect()
    }
    assert got == expect
    assert any(v[0] > 1 for v in expect.values())  # real streaks exist


# ----------------------------------------------------------------- keywords


def test_text_keywords_rank_contract(spark):
    """Per doc: ranks are exactly 1..min(3, vocab), scores are
    non-increasing in rank, and ties on the 6-dp score break by word
    ascending (the cross-engine total order)."""
    rows = engine.REGISTRY["text_keywords"].fn(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (-a.tfidf, a.word) < (-b.tfidf, b.word), doc


# -------------------------------------------------------------- observation


def test_obs_metrics_match_direct_aggregates(spark):
    """The observed (piggybacked) metrics equal the same aggregates computed
    as an ordinary query."""
    from parallel_mapreduce_wordcounting_spark.sources.loader import load_table

    (got,) = engine.REGISTRY["obs_metrics"].fn(spark, SF_DIR).collect()
    (want,) = (
        load_table(spark, SF_DIR, "lineitem")
        .where(F.col("l_quantity") > 10.0)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_price_cents"
            ),
        )
        .collect()
    )
    assert tuple(got) == tuple(want)


# ----------------------------------------------------------------------- PQ


def test_sim_pq_recall_floor(spark):
    """PQ shortlist + exact re-rank must recover most of the true top-10
    (floors measured with margin on this near-uniform, ANN-adversarial
    corpus: 9/10 at sf0.001, 10/10 at sf0.01 with the m=8, ksub=32,
    shortlist=200 defaults)."""
    exact = {r.vec_id for r in engine.REGISTRY["sim_knn_query"].fn(spark, SF_DIR).collect()}
    pq_rows = sim_pq_search(spark, SF_DIR).collect()
    pq = {r.vec_id for r in pq_rows}
    assert len(pq & exact) >= 8
    # re-ranked scores are the TRUE cosines: every surfaced pair must agree
    # with the exact operator's score for the same neighbor
    exact_scores = {
        r.vec_id: r.cosine
        for r in engine.REGISTRY["sim_knn_query"].fn(spark, SF_DIR).collect()
    }
    for r in pq_rows:
        if r.vec_id in exact_scores:
            assert r.cosine == exact_scores[r.vec_id]


def test_sim_pq_deterministic_rerun(spark):
    """Hashed-sample codebook fit + first-occurrence argmin + fixed-order
    float sums: two independent runs produce identical rows."""
    a = [tuple(r) for r in sim_pq_search(spark, SF_DIR).collect()]
    b = [tuple(r) for r in sim_pq_search(spark, SF_DIR).collect()]
    assert a == b and len(a) == 10


def test_pq_codebook_shapes():
    """The quantizer factorizes the space exactly: m codebooks of ksub
    centroids over d/m dims, reproducible from the same sample."""
    import numpy as np

    from parallel_mapreduce_wordcounting_spark.operators.similarity_ext import (
        _fit_pq_codebooks,
    )

    rng = np.random.RandomState(7)
    sample = rng.rand(256, 64)
    books = _fit_pq_codebooks(sample, m=8, ksub=16)
    assert books.shape == (8, 16, 8)
    again = _fit_pq_codebooks(sample, m=8, ksub=16)
    assert np.array_equal(books, again)


def test_bucket_bound_inversion_property():
    """The narrowing step's integer algebra, property-tested: for any cent
    value c in [lo, hi] and any bucket count B, the bucket it hashes into
    under b = (c-lo)*B // width must invert to bounds that contain c —
    lo + ceil(b*W/B) <= c <= lo + ceil((b+1)*W/B) - 1 — and consecutive
    buckets' ranges must tile [lo, hi] without gap or overlap."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        lo=st.integers(-(10**7), 10**7),
        span=st.integers(0, 10**7),
        B=st.integers(2, 4096),
        frac=st.fractions(0, 1),
    )
    def check(lo, span, B, frac):
        hi = lo + span
        width = hi - lo + 1
        c = lo + int(frac * span)
        b = (c - lo) * B // width
        b_lo = lo + -(-(b * width) // B)
        b_hi = lo + -(-((b + 1) * width) // B) - 1
        assert b_lo <= c <= b_hi
        # tiling: next bucket starts exactly after this one ends
        assert lo + -(-((b + 1) * width) // B) == b_hi + 1

    check()
