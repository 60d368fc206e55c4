"""Round-13 pins: the driver-parseable bench final line (the r12 verdict's
one concrete defect — BENCH_r12.json landed ``parsed: null`` because the
evidence-laden single JSON line outgrew the driver's ~2000-char stdout tail
capture), and the Jaccard-engine reverify stamps that re-float the three
keys whose physical plans changed this round."""

from __future__ import annotations

import importlib.util
import json
import os

# The driver captures roughly this many chars of stdout tail; the compact
# final line must fit with generous headroom (its own JSON plus whatever
# partial previous line the window happens to include).
_DRIVER_TAIL_CHARS = 2000
_COMPACT_BUDGET = 1500


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_compact_line_fits_driver_tail():
    """The final-line dict bench.py prints, reconstructed with worst-case
    realistic values (4-digit seconds per query, max canary widths), stays
    far enough under the tail capture that the driver always sees the
    leading ``metric``/``value`` fields."""
    bench = _load_bench()
    compact = {
        "metric": "headline query latency, median of 5 (warm), collect() included",
        "value": 99999.999,
        "unit": "sec",
        "queries": {k: 9999.999 for k in bench.BENCH_KEYS},
        "sf": 0.1,
        "calib_inflation": 99.999,
        "max_interleaved_inflation": 99.999,
        "evidence": "BENCH_evidence.json",
    }
    line = json.dumps(compact)
    assert len(line) < _COMPACT_BUDGET, (
        f"compact bench line is {len(line)} chars; adding bench keys or "
        f"fields must keep it under {_COMPACT_BUDGET} so the driver's "
        f"{_DRIVER_TAIL_CHARS}-char tail capture never truncates the "
        "headline fields (the BENCH_r12 'parsed: null' regression)"
    )


def test_bench_evidence_not_on_final_line():
    """The per-query evidence and interleaved-probe lists — the fields that
    overflowed the r12 line — must never ride the compact final print.
    Source-level pin: the last print in bench.main emits a dict without
    'query_evidence'/'interleaved' keys."""
    src = open(
        os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")
    ).read()
    tail = src[src.rfind("print(") :]
    assert '"query_evidence"' not in tail
    assert '"interleaved":' not in tail  # the probe LIST (the scalar
    # "max_interleaved_inflation" summary is fine — it's one number)


def test_jaccard_engine_keys_reverify_stamped():
    """The three keys whose physical plans changed in round 13 re-present
    until a fresh driver verdict lands on the pinned plans. (Round 14
    advanced the same keys' stamps again — dense-int32 dictionary + Arrow
    verify kernel — so the invariant is ≥ 13, not == 13: a stamp may
    only move FORWARD with a newer change, never silently reset.)"""
    from parallel_mapreduce_wordcounting_spark.registry import REVERIFY_MIN_ROUNDS

    for key in ("dedup_ngram_jaccard", "dedup_eval_simhash", "pipeline_dedup_report"):
        assert REVERIFY_MIN_ROUNDS.get(key, 0) >= 13, key
