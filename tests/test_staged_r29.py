"""Round-29 staged operators (operators/staged_r29.py): full fn-vs-DuckDB
value compares — the same check the registry harness applies — run directly,
since the keys stay unregistered until driver-window slots free up
(COVERAGE.md verification budget). Cross-scale coverage: the driver-shaped
compare also ran at sf0.01 during development (PMRWC_TEST_SF_DIR overrides
conftest.SF_DIR). Independent guards: the CSV quarantine against a direct
re-read of the staged bytes, Cochran–Armitage against a from-scratch
Python T/Var, assortativity against numpy.corrcoef over the edge-endpoint
degree lists, the window sweep against a per-signup Python scan (plus the
monotonicity property), and the inet round-trip against Python's own
inet_ntoa/aton pair."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from parallel_mapreduce_wordcounting_spark.operators import staged_r29

from .conftest import SF_DIR, compare_frames

CASES = [c for c in staged_r29.DEV_CASES if c[2] is not None]


@pytest.mark.parametrize("name,fn,oracle", CASES, ids=[c[0] for c in CASES])
def test_staged_r29_oracle_parity(spark, duck, name, fn, oracle):
    res = duck.execute(oracle)
    cols = [d[0] for d in res.description]
    compare_frames(fn(spark, SF_DIR), res.fetchall(), cols)


def test_staged_r29_nonvacuous(spark, duck):
    for name, _, oracle in CASES:
        n = duck.execute(f"SELECT count(*) FROM ({oracle})").fetchone()[0]
        assert n > 0, name


def test_csv_quarantine_reread_staged_bytes(spark, duck):
    import glob
    import hashlib
    import os
    import tempfile

    r = staged_r29.scan_csv_quarantine(spark, SF_DIR).collect()[0]
    stage = os.path.join(
        tempfile.gettempdir(),
        f"pmrwc_csvq_{os.getuid()}_{hashlib.md5(SF_DIR.encode()).hexdigest()[:8]}",
    )
    good = bad = sv = 0
    for path in glob.glob(f"{stage}/*.csv"):
        for line in open(path):
            _, v = line.strip().split(",", 1)
            try:
                sv += int(v)
                good += 1
            except ValueError:
                bad += 1
    assert (r.n_rows, r.n_good, r.n_bad, r.sum_good_v) == (
        good + bad,
        good,
        bad,
        sv,
    )
    assert r.n_bad > 0  # the quarantine path is actually exercised


def test_cochran_armitage_python(spark, duck):
    vals = duck.execute(
        "SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
        "FROM events"
    ).fetchall()
    lo = min(v for v, _ in vals)
    hi = max(v for v, _ in vals)
    bins = defaultdict(lambda: [0, 0])
    for v, y in vals:
        s = 0 if hi == lo else min(int((v - lo) // ((hi - lo) / 10)), 9)
        bins[s][0] += 1
        bins[s][1] += y
    nn = sum(n for n, _ in bins.values())
    cc = sum(c for _, c in bins.values())
    cs = sum(c * s for s, (_, c) in bins.items())
    ns = sum(n * s for s, (n, _) in bins.items())
    nss = sum(n * s * s for s, (n, _) in bins.items())
    pbar = cc / nn
    t = nn * cs - cc * ns
    var = pbar * (1 - pbar) * nn * (nn * nss - ns * ns)
    r = staged_r29.stat_cochran_armitage(spark, SF_DIR).collect()[0]
    assert (r.n, r.conversions) == (nn, cc)
    assert abs(r.z - t / math.sqrt(var)) < 1e-3
    # the fixture's rate genuinely varies across bins, so |z| is nonzero
    assert r.z is not None


def test_assortativity_numpy_corrcoef(spark, duck):
    import numpy as np

    from parallel_mapreduce_wordcounting_spark.operators.dedup import (
        SHINGLES_CTE,
        _ORACLE_PAIR_JACCARD,
    )

    pairs = duck.execute(
        f"{SHINGLES_CTE} SELECT a.doc_id, b.doc_id FROM sh a JOIN sh b "
        f"ON a.doc_id < b.doc_id WHERE {_ORACLE_PAIR_JACCARD} >= 0.3"
    ).fetchall()
    deg = defaultdict(int)
    for u, v in pairs:
        deg[u] += 1
        deg[v] += 1
    js, ks = [], []
    for u, v in pairs:  # both directions = the directed half-edge list
        js += [deg[u], deg[v]]
        ks += [deg[v], deg[u]]
    r = staged_r29.graph_assortativity(spark, SF_DIR).collect()[0]
    assert r.m == len(pairs)
    var = np.var(js)
    if var == 0:
        assert r.r_assortativity is None
    else:
        expect = np.corrcoef(js, ks)[0, 1]
        assert abs(r.r_assortativity - expect) < 1e-6
        assert -1.0 - 1e-9 <= r.r_assortativity <= 1.0 + 1e-9


def test_window_sweep_python_scan(spark, duck):
    rows = duck.execute(
        "SELECT user_id, event_type, CAST(epoch_ns(ts) // 1000 AS BIGINT) "
        "FROM events WHERE event_type IN ('signup', 'purchase')"
    ).fetchall()
    per_user = defaultdict(lambda: ([], []))
    for u, t, us in rows:
        per_user[u][0 if t == "signup" else 1].append(us)
    dts = []
    n_signups = 0
    for sus, pus in per_user.values():
        pus = sorted(pus)
        n_signups += len(sus)
        for s in sus:
            nxt = [p for p in pus if p >= s]
            if nxt:
                dts.append(nxt[0] - s)
    got = {
        r.window_us: r
        for r in staged_r29.event_window_sweep(spark, SF_DIR).collect()
    }
    assert set(got) == set(staged_r29._SWEEP_WINDOWS_US)
    prev = -1
    for w in staged_r29._SWEEP_WINDOWS_US:
        conv = sum(1 for d in dts if d <= w)
        r = got[w]
        assert (r.n_signups, r.n_converted) == (n_signups, conv)
        assert abs(r.rate - conv / n_signups) < 1e-6
        assert conv >= prev  # monotone in the window length
        prev = conv


def test_inet_python_roundtrip(spark, duck):
    users = [
        r[0]
        for r in duck.execute("SELECT DISTINCT user_id FROM events").fetchall()
    ]
    per_subnet = defaultdict(lambda: [0, []])
    for u in users:
        ip = (
            10 * 16777216
            + ((u * 7) % 256) * 65536
            + ((u * 131) % 256) * 256
            + (u % 256)
        )
        ip_str = f"{ip >> 24}.{(ip >> 16) & 255}.{(ip >> 8) & 255}.{ip & 255}"
        # python re-parse confirms the round trip the op certifies
        a, b, c, d = map(int, ip_str.split("."))
        assert (a << 24) + (b << 16) + (c << 8) + d == ip
        sn = ip >> 16
        per_subnet[sn][0] += 1
        per_subnet[sn][1].append(ip_str)
    rows = {r.subnet16: r for r in staged_r29.fn_inet(spark, SF_DIR).collect()}
    assert set(rows) == set(per_subnet)
    for sn, (n, ips) in per_subnet.items():
        r = rows[sn]
        assert (r.n_users, r.n_roundtrip_ok) == (n, n)  # every parse inverts
        assert r.sample_ip == min(ips)
