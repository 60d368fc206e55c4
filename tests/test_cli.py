"""CLI smoke tests — the `python -m parallel_mapreduce_wordcounting_spark`
user surface, driven as real subprocesses from a foreign cwd (the same
worker-import conditions scripts/dress_rehearsal.py guards for the driver
contract)."""

from __future__ import annotations

import subprocess
import sys


def _run(args, cwd="/tmp"):
    return subprocess.run(
        [sys.executable, "-m", "parallel_mapreduce_wordcounting_spark", *args],
        capture_output=True,
        text=True,
        cwd=cwd,
        timeout=300,
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
    )


def test_cli_list_inventory():
    r = _run(["list"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    assert len(lines) >= 227
    assert any(line.startswith("wc_topk") and "sql-oracled" in line for line in lines)


def test_cli_wordcount_matches_golden(tmp_path):
    f = tmp_path / "a.txt"
    f.write_text("big fast fast scan scan scan\nscan big\n")
    r = _run(["--cpus", "2", "wordcount", str(f), "--top", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    top = [tuple(line.split("\t")) for line in r.stdout.strip().splitlines()]
    assert top == [("scan", "4"), ("big", "2")]


def test_cli_report_corpus_health():
    """`report` prints the one-row corpus KPI with the golden sf0.001
    values (pinned by the pipeline_corpus_report oracle tests)."""
    r = _run(["--cpus", "2", "report", "--sf-dir", "/root/testdata/sf0.001"])
    assert r.returncode == 0, r.stderr[-2000:]
    got = dict(
        line.strip().split(None, 1)
        for line in r.stdout.strip().splitlines()[1:]
    )
    assert got["n_docs"] == "500"
    assert got["source_entropy_bits"] == "4.321928"  # 20 equal sources = log2(20)


def test_cli_run_operator():
    r = _run(["--cpus", "2", "run", "wc_topk", "--sf-dir", "/root/testdata/sf0.001"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "scan" in r.stdout  # golden top word at sf0.001

    r2 = _run(["--cpus", "2", "run", "nope_not_a_key"])
    assert r2.returncode == 2 and "unknown key" in r2.stderr
