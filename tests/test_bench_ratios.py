"""Pinned normalized-cost ratios for the settled bench outliers.

Round 8's cross-round bench showed q_retrieval_eval 2.48x, q_token_count
2.18x and q_corpus_assembly 1.46x vs round 7. Bisected in round 9 by
running the ROUND-7 CODE in a worktree on the same host/session as the
round-9 code: r7 code measured 1.72s median for q_retrieval_eval vs
1.50-1.76s for r9 code — identical within noise, so the cross-round
moves were host drift, not regressions (PERF.md "Round-9 outlier
settlement" has the full numbers).

These tests pin the settled costs as NORMALIZED ratios so a future real
regression fails loudly while host drift does not:

    norm(q) = max(wall(q) - cal_sched, 0) / cal_scan

(cal_sched = a 32-task no-compute job's wall = per-job fixed overhead;
cal_scan = full-column scan+agg of the SF's largest table = the host's
data-path speed; same rule as bench.py / PERF.md "Calibration &
normalization".)

Round-12 structure (ADVICE fix): ALL pinned measurements run in ONE
fresh subprocess session (tests/bench_ratio_probe.py) instead of the
suite's long-lived session. Round 11 had to widen q_triangle_count's
ceiling 5.0 -> 9.0 because end-of-suite session pollution (accumulated
shuffle files / JVM state) inflated the multi-shuffle plan >5x at the
same commit that measured 1.3 in a fresh idle session — and at 9.0 a
genuine ~2.5-3x plan regression slid under the gate. The fresh-session
probe removes the pollution, so every ceiling sits at ~3x its measured
fresh-session idle norm again and a real multi-shuffle regression
fails both probe attempts (the probe keeps the single documented
GC-tail retry per query: re-measure once, keep the lower median).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

SF = "/root/testdata/sf0.01"

#: (query, normalized-cost ceiling) — ~3x the fresh-session idle norms
#: (r9: q_retrieval_eval 4.9, q_token_count ~0, q_corpus_assembly 15.9;
#: r10: q_triangle_count 1.30, q_crawl_to_corpus 22.3; r11: q_holt
#: 3.43, q_pagerank 14.38).
PINNED = [
    ("q_retrieval_eval", 15.0),
    ("q_token_count", 2.0),
    ("q_corpus_assembly", 48.0),
    # back at the pre-round-11 ceiling: the fresh-session probe removed
    # the end-of-suite pollution that forced 9.0
    ("q_triangle_count", 5.0),
    ("q_crawl_to_corpus", 65.0),
    ("q_holt", 10.0),
    ("q_pagerank", 45.0),
]


@pytest.fixture(scope="module")
def probe_results():
    """One fresh-session subprocess measures calibration + every pinned
    query; the per-query tests below only assert on the parsed JSON."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = {"sf": SF, "queries": {n: c for n, c in PINNED}}
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tests", "bench_ratio_probe.py"),
            json.dumps(spec),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.parametrize("name,ceiling", PINNED)
def test_pinned_normalized_ratio(probe_results, name, ceiling):
    r = probe_results
    norm, wall = r["norms"][name], r["walls"][name]
    assert norm <= ceiling, (
        f"{name}: normalized cost {norm:.2f} exceeds pinned ceiling "
        f"{ceiling} (wall {wall:.3f}s, cal_sched {r['cal_sched']:.3f}s, "
        f"cal_scan {r['cal_scan']:.3f}s) in a FRESH session — this is "
        "not suite pollution; likely a real plan regression (see "
        "PERF.md outlier settlements)"
    )
