"""The driver keeps only the last 2000 chars of stdout and parses the
final complete JSON line inside that buffer; BENCH_r08.json recorded
``"parsed": null`` because round 8's summary line outgrew it. These
tests pin bench.emit_summary's size contract without running Spark."""

from __future__ import annotations

import json

import pytest

from bench import MAX_SUMMARY_BYTES, emit_summary


def _payload(n_queries: int, extras: bool = True) -> dict:
    queries = {f"q_some_longish_query_name_{i:03d}": 1.234 for i in range(n_queries)}
    p = {
        "metric": "headline_queries_total_wall_seconds",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }
    if extras:
        p["cpu_calibration_sec"] = 0.123
        p["sched_calibration_sec"] = 0.045
        p["scan_calibration_sec"] = 0.678
        for r in range(3, 9):
            p[f"subtotal_r{r}_set"] = 12.345
            p[f"subtotal_r{r}_set_norm"] = 3.456
    return p


@pytest.mark.parametrize("n", [10, 63, 80, 120, 500])
def test_summary_fits_driver_buffer(n):
    line = emit_summary(_payload(n))
    assert len(line.encode()) <= MAX_SUMMARY_BYTES
    assert "\n" not in line
    parsed = json.loads(line)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed


def test_small_payload_keeps_everything():
    p = _payload(10)
    parsed = json.loads(emit_summary(p))
    assert parsed == json.loads(json.dumps(p))  # float-identical via json
    assert "subtotal_r8_set_norm" in parsed


def test_current_headline_set_fits_without_truncation():
    """The REAL headline set must fit without the LAST-resort
    slowest-first truncation — today and with five more queries of
    headroom. Past ~70 entries the structured-retirement rung may
    fold the OLDEST vintages' per-query detail into their subtotal
    fields (loudly, via queries_retired) — that is the designed
    behavior, not data loss; every recent-vintage query stays
    itemized."""
    from bench import HEADLINE, R8_SET, R9_SET

    p = _payload(0)
    p["queries"] = {n: 123.456 for n in HEADLINE}
    p["queries"].update(
        {f"q_future_round_query_{i:02d}": 9.876 for i in range(5)}
    )
    for r in range(3, 10):
        p[f"subtotal_r{r}_set"] = 12.345
    parsed = json.loads(emit_summary(p))
    assert "queries_truncated" not in parsed
    # the newest two vintages are NEVER retired
    for n in (*R8_SET, *R9_SET):
        if n in p["queries"]:
            assert n in parsed["queries"], n
    # anything retired is declared and keeps its subtotal
    for rv in parsed.get("queries_retired", []):
        assert f"subtotal_{rv}_set" in parsed


def test_recent_vintages_stay_itemized_at_2dp():
    """Round-14 ladder reorder (r13 verdict item 4): per-query seconds
    round to 2 decimals BEFORE any vintage is retired, so the full
    r6..r14 range — including every name in BENCH_r13.parsed.queries —
    stays itemized; only the oldest vintages fold into their subtotal
    fields, and each retired vintage keeps that subtotal."""
    from bench import (
        HEADLINE, R6_SET, R7_SET, R8_SET, R9_SET, R10_SET, R11_SET,
        R12_SET, R13_SET, R14_SET,
    )

    p = _payload(0)
    p["queries"] = {n: 1.234 for n in HEADLINE}
    p["queries"]["q_crawl_to_corpus"] = 14.958
    for k in (
        "cpu", "sched", "scan", "iter_sched", "iter_scan"
    ):
        p[f"{k}_calibration_sec"] = 0.123
    for r in range(3, 15):
        p[f"subtotal_r{r}_set"] = 12.345
        p[f"subtotal_r{r}_set_norm"] = 3.456
        p[f"sched_cal_r{r}_adj"] = 0.111  # per-family adjacent stamps
    line = emit_summary(p)
    assert len(line.encode()) <= MAX_SUMMARY_BYTES
    parsed = json.loads(line)
    recent = (
        R6_SET + R7_SET + R8_SET + R9_SET + R10_SET + R11_SET
        + R12_SET + R13_SET + R14_SET
    )
    for n in recent:
        assert n in parsed["queries"], n
    # 2dp rounding happened before retirement
    assert parsed["queries"]["q_crawl_to_corpus"] == 14.96
    assert set(parsed.get("queries_retired", [])) <= {"r3", "r4", "r5"}
    for rv in parsed.get("queries_retired", []):
        assert f"subtotal_{rv}_set" in parsed
    # the per-family stamps live in the stderr full payload only
    assert not any(k.startswith("sched_cal_") for k in parsed)
    # end-of-run calibrations survive for the judge's normalization
    assert "sched_calibration_sec" in parsed


def test_truncation_is_loud_and_total_preserved():
    p = _payload(500)
    parsed = json.loads(emit_summary(p))
    assert parsed.get("queries_truncated") is True
    assert parsed["value"] == p["value"]
    assert len(parsed["queries"]) < 500


def test_max_summary_bytes_under_driver_buffer():
    assert MAX_SUMMARY_BYTES <= 1900  # driver tail buffer is 2000
