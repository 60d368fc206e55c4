"""Round-11 staged operators (operators/staged_r11.py): full fn-vs-DuckDB
value compares — the same check the registry harness applies — run directly,
since the keys stay unregistered until driver-window slots free up
(COVERAGE.md verification budget; the round-7 window closed at 50/50 and
round 8's budget is earmarked for staged_r10). Cross-scale coverage: the
driver-shaped compare also ran at sf0.01 during development
(PMRWC_TEST_SF_DIR overrides conftest.SF_DIR for a full re-run)."""

from __future__ import annotations

import pytest

from parallel_mapreduce_wordcounting_spark.operators import staged_r11

from .conftest import SF_DIR, compare_frames

CASES = staged_r11.DEV_CASES


@pytest.mark.parametrize("name,fn,oracle", CASES, ids=[c[0] for c in CASES])
def test_staged_r11_oracle_parity(spark, duck, name, fn, oracle):
    res = duck.execute(oracle)
    cols = [d[0] for d in res.description]
    compare_frames(fn(spark, SF_DIR), res.fetchall(), cols)


def test_staged_r11_nonvacuous(duck):
    """Each staged op must return real rows on the fixture (a vacuously
    empty result would pass parity while testing nothing)."""
    for name, _, oracle in CASES:
        n = duck.execute(f"SELECT count(*) FROM ({oracle})").fetchone()[0]
        assert n > 0, name


def test_interpolate_masks_nontrivially(duck):
    """The dropout mask must hide BOTH interior days (linear blend path)
    and produce nonzero reconstruction error — otherwise the interpolation
    arm under test is dead code on the fixture."""
    rows = duck.execute(
        f"SELECT count(*), sum(CASE WHEN abs_err > 0 THEN 1 ELSE 0 END) "
        f"FROM ({staged_r11.EVENT_INTERPOLATE_ORACLE})"
    ).fetchone()
    assert rows[0] >= 5 and rows[1] >= 1


def test_reservoir_is_prefix_stable(duck):
    """Bottom-k composability: the bottom-(k/2) of the bottom-k equals the
    global bottom-(k/2) — the property that makes min-wise sampling
    mergeable across partitions/corpora."""
    k = staged_r11._RESERVOIR_K
    inner = staged_r11.SAMPLE_RESERVOIR_ORACLE
    a = duck.execute(
        f"SELECT o_orderkey FROM ({inner}) ORDER BY priority LIMIT {k // 2}"
    ).fetchall()
    b = duck.execute(
        "SELECT o_orderkey FROM (SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR))"
        f" AS priority FROM orders) ORDER BY priority LIMIT {k // 2}"
    ).fetchall()
    assert a == b
