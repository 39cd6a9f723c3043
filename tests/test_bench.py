"""bench.py harness units: headline filter edge shapes and the
worktree A/B drift adjudication (round-4 verdict #5)."""

from __future__ import annotations

import bench


def test_compact_headline_filter_shapes():
    out = {
        "metric": "m",
        "value": 1.0,
        "unit": "sec",
        "sf": "x",
        "n_queries": 4,
        "value_cold": 2.0,
        "failures": {},
        # q05 (no suffix) must be excluded, not crash (advisor finding:
        # n[3] raised IndexError on 3-char keys)
        "queries": {"q01_a": 1.0, "q05": 9.0, "q100_h": 3.0, "t01_x": 2.0},
    }
    head = bench._compact(out)["queries"]
    assert head == {"q01_a": 1.0}


def test_adjudicate_regressions_empty_short_circuit():
    assert bench._adjudicate_regressions({}, "/nonexistent") == {}


def test_adjudicate_regressions_worktree_ab(tmp_path):
    """Same code on both sides of the A/B (HEAD vs the baseline-commit
    worktree, re-timed back-to-back in fresh JVMs) must adjudicate a
    fake flagged regression as machine drift — and clean up its
    worktree. ~4 JVM startups (interleaved H,B,H,B), the price of trusting BENCH regression
    flags."""
    import subprocess

    regs = {"q01_pricing_summary": {"sec": 99.0, "baseline_sec": 0.1, "ratio": 990.0}}
    out = bench._adjudicate_regressions(regs, "/root/testdata/sf0.001")
    adj = out["q01_pricing_summary"]["adjudication"]
    assert adj["verdict"] == "drift", adj
    assert adj["head_sec"] > 0 and adj["baseline_code_sec"] > 0
    wt = subprocess.run(
        ["git", "worktree", "list"], capture_output=True, text=True, cwd="/root/repo"
    ).stdout
    assert "bench_ab_" not in wt


def test_ab_verdict_needs_relative_and_scaled_absolute_gap():
    # jitter shapes: big ratio on a small absolute delta, or big delta
    # at a small ratio — both drift
    assert bench._ab_verdict(0.5, 0.39) == "drift"      # q52 shape: delta 0.11
    assert bench._ab_verdict(0.72, 0.56) == "drift"     # s09 shape: delta 0.16 < 0.35*base
    assert bench._ab_verdict(10.0, 8.5) == "drift"      # ratio 1.18
    # sub-second: ratio must clear 1.5, not just 1.25
    assert bench._ab_verdict(0.7, 0.5) == "drift"       # ratio 1.4 < 1.5 at <1s
    # a real regression clears both bars
    assert bench._ab_verdict(2.0, 1.0) == "confirmed"
    assert bench._ab_verdict(0.9, 0.5) == "confirmed"   # ratio 1.8, delta 0.4
    assert bench._ab_verdict(13.0, 10.0) == "confirmed" # big query: bar capped at 0.5
