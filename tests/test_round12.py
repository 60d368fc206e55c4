"""Round-12 pins: the r11 ADVICE fixes on mm_binary_surface (malformed-P6
robustness + oracle-mirrored magic-byte dispatch) and the pre-materialized
binary-fixture machinery (sources/binfix.py — r11 verdict item 6)."""

from __future__ import annotations

import os

import duckdb
import pytest

from parallel_mapreduce_wordcounting_spark.operators.multimodal import (
    MM_BINARY_SURFACE_ORACLE,
    mm_binary_surface,
)
from parallel_mapreduce_wordcounting_spark.sources import binfix

from .conftest import compare_frames


def _px_text(w: int, h: int) -> str:
    """w*h*3 pixel bytes that stay < 0x80, so the payload round-trips
    utf-8 (the test_round11 trick)."""
    return bytes((i * 7) % 128 for i in range(w * h * 3)).decode("utf-8")


def _ppm_text(w: int, h: int) -> str:
    """A VALID canonical P6 raster as utf-8-round-trippable text."""
    return f"P6\n{w} {h}\n255\n" + _px_text(w, h)


# Malformed 'P6\n'-prefixed payloads — every one crashed the pre-r12 decode
# branch (unpack / int() ValueError) or must take the fallback under the
# strict grammar. All ≥100 bytes (clears the size filter) and valid utf-8.
_MALFORMED = [
    "P6\n" + "x" * 120,  # no further newlines: 4-way unpack failed
    "P6\n1 2 3\n255\n" + "y" * 110,  # 3 dim tokens: (w, h) unpack failed
    "P6\nab cd\n255\n" + "z" * 110,  # non-integer dims: int() failed
    "P6\n6 6\n255\n" + "w" * 140,  # well-formed header, wrong buffer length
    "P6\n1234567 1\n255\n" + "v" * 120,  # >6 digits: outside both grammars
    "P6\n06 6\n255\n" + _px_text(6, 6)[2:],  # leading-zero dims pass both
    # grammars (int('06') == CAST('06' AS INT) == 6) but the buffer is 2
    # pixel bytes short of 6*6*3, so both engines fall back
]


def _write_docs(spark, tmp_path, texts):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_malformed_p6_payloads_fall_back_instead_of_crashing(spark, tmp_path):
    """r11 ADVICE item 1: payload is arbitrary document text — a doc that
    merely STARTS with 'P6\\n' must take the byte-arithmetic fallback, not
    raise inside mapInPandas and kill the whole query."""
    sf = _write_docs(spark, tmp_path, _MALFORMED)
    rows = {r.doc_id: r for r in mm_binary_surface(spark, sf).collect()}
    assert len(rows) == len(_MALFORMED)
    for i, text in enumerate(_MALFORMED, start=1):
        n = len(text.encode("utf-8"))
        assert (rows[i].width, rows[i].height) == (n % 640 + 1, ord("P") + 1), (
            f"doc {i} did not take the fallback"
        )


def test_oracle_mirrors_p6_dispatch_on_planted_fixture(spark, tmp_path):
    """r11 ADVICE item 2: the DuckDB oracle must express the op's actual
    semantics — a fixture containing a VALID P6 raster (plus malformed
    near-misses and plain text) hash-matches instead of silently flipping
    the key at the next fixture refresh."""
    texts = [
        _ppm_text(6, 6),
        _ppm_text(11, 3),
        # leading-zero dims with a CORRECT buffer: decodes (6,6) on both
        # engines — int('06') == CAST('06' AS INT)
        "P6\n06 6\n255\n" + _px_text(6, 6),
        "plain " * 30,
        *_MALFORMED,
    ]
    sf = _write_docs(spark, tmp_path, texts)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS "  # Spark writes a parquet DIR
            f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
        )
        res = con.execute(MM_BINARY_SURFACE_ORACLE)
        cols = [c[0] for c in res.description]
        compare_frames(mm_binary_surface(spark, sf), res.fetchall(), cols)
    finally:
        con.close()
    # and the decode branch really fired (guards against a vacuous pass
    # where both engines fell back everywhere)
    rows = {r.doc_id: r for r in mm_binary_surface(spark, sf).collect()}
    assert (rows[1].width, rows[1].height) == (6, 6)
    assert (rows[2].width, rows[2].height) == (11, 3)


# --- sources/binfix.py: materialize once, reuse thereafter -------------------------


def test_ensure_blob_fixture_materializes_once(tmp_path):
    calls: list[str] = []

    def payload(name: str) -> bytes:
        calls.append(name)
        return name.encode()

    sf = str(tmp_path)  # stands in for sf_dir (only hashed)
    stage = binfix.ensure_blob_fixture("t12", sf, 1, ["a.bin", "b.bin"], payload)
    assert sorted(os.listdir(stage)) == ["_MANIFEST", "a.bin", "b.bin"]
    assert calls == ["a.bin", "b.bin"]
    mtimes = {n: os.path.getmtime(os.path.join(stage, n)) for n in calls}

    # second run: manifest matches -> NO synthesis (the r11 verdict item 6
    # contract: steady state is a manifest check + binaryFile scan)
    calls.clear()
    stage2 = binfix.ensure_blob_fixture("t12", sf, 1, ["a.bin", "b.bin"], payload)
    assert stage2 == stage and calls == []
    for n, t in mtimes.items():
        assert os.path.getmtime(os.path.join(stage, n)) == t

    # version bump or name-set change -> full re-synthesis incl. purge
    binfix.ensure_blob_fixture("t12", sf, 2, ["a.bin"], payload)
    assert calls == ["a.bin"]
    assert sorted(os.listdir(stage)) == ["_MANIFEST", "a.bin"]  # b.bin purged


def test_ensure_blob_fixture_recovers_from_missing_manifest(tmp_path):
    """A pre-r12 staging dir (files, no manifest) or a crashed half-write
    must re-synthesize, not serve a stale/partial fixture."""
    sf = str(tmp_path)
    stage = binfix.fixture_dir("t12b", sf)
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, "stale.bin"), "wb") as f:
        f.write(b"old")
    binfix.ensure_blob_fixture("t12b", sf, 1, ["x.bin"], lambda n: b"new")
    assert sorted(os.listdir(stage)) == ["_MANIFEST", "x.bin"]


@pytest.mark.parametrize(
    "builder,magic",
    [(binfix.pcm16_wav_payload, b"RIFF"), (binfix.ppm_p6_payload, b"P6\n")],
)
def test_payload_builders_are_pure(builder, magic):
    a, b = builder(123), builder(123)
    assert a == b and a.startswith(magic) and builder(124) != a


def test_mood_median_degenerate_corpus_yields_null_chi2(spark, tmp_path):
    """Round-12 degenerate-corpus sweep find: with every (day, type) count
    at-or-below the grand median, ta = 0 zeroes the global chi² denominator
    — a bare ANSI `/` aborted the whole job where DuckDB's x/0 yields NULL.
    try_divide must make the engines agree (chi2 NULL, query survives)."""
    from datetime import datetime

    from parallel_mapreduce_wordcounting_spark.operators.staged_r50 import (
        stat_mood_median,
    )

    rows = [  # one (day, type) cell -> the cell IS the median, nothing above
        (i, 1, "click", datetime(2024, 1, 1, 10, 0, i), 1.0) for i in range(3)
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = stat_mood_median(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k_groups == 1 and r.n_above == 0 and r.chi2 is None


def test_cardinality_drift_empty_orders_yields_null_jaccard(spark, tmp_path):
    """Round-12 degenerate sweep find #2: an empty orders table zeroes
    ndv_union — try_divide must yield NULL, not an ANSI abort."""
    from parallel_mapreduce_wordcounting_spark.operators.staged_r54 import (
        dq_cardinality_drift,
    )

    spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_totalprice double, o_orderdate timestamp_ntz",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    rows = dq_cardinality_drift(spark, str(tmp_path)).collect()
    assert rows, "census row(s) expected even on an empty table"
    assert all(r.value_jaccard is None for r in rows)


def test_cronbach_alpha_single_item_yields_null(spark, tmp_path):
    """Round-12 degenerate sweep find #3: one event type makes k-1 = 0
    (and a single day zeroes the total variance) — alpha must be NULL."""
    from datetime import datetime

    from parallel_mapreduce_wordcounting_spark.operators.staged_r58 import (
        stat_cronbach_alpha,
    )

    rows = [
        (i, 1, "click", datetime(2024, 1, 1 + i % 2, 10), 1.0) for i in range(4)
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = stat_cronbach_alpha(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].k_items == 1 and out[0].cronbach_alpha is None


def test_mm_fixture_ops_plan_is_binaryfile_scan_no_driver_loop(spark):
    """r11 verdict item 6 'Done' criterion: the mm/audio fixture ops show a
    binaryFile scan feeding the Arrow-batched kernel — the registered data
    path reads REAL files; synthesis is the one-time manifest-guarded
    materialization, not part of any run's plan."""
    from parallel_mapreduce_wordcounting_spark.operators.staged_r46 import (
        mm_wav_energy,
    )
    from parallel_mapreduce_wordcounting_spark.operators.staged_r49 import (
        mm_ppm_decode,
    )
    from parallel_mapreduce_wordcounting_spark.operators.staged_r51 import (
        mm_color_quantize,
    )
    from parallel_mapreduce_wordcounting_spark.operators.staged_r54 import (
        mm_stride_resample,
    )
    from parallel_mapreduce_wordcounting_spark.plans import explain_str

    from .conftest import SF_DIR

    for fn in (mm_wav_energy, mm_ppm_decode, mm_color_quantize, mm_stride_resample):
        p = explain_str(fn(spark, SF_DIR))
        assert "binaryFile" in p, f"{fn.__name__}: no binaryFile scan\n{p}"
        assert "MapInPandas" in p, f"{fn.__name__}: no Arrow kernel\n{p}"
