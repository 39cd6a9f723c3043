#!/usr/bin/env python
"""Cross-round near-miss drift tracker (round-6 verdict #6).

The per-round bench adjudicator marks a flagged query ``near_miss``
when its head-vs-baseline-code A/B ratio exceeds 1.3 but stays below
the confirm bars — sub-second drifts that are structurally
unconfirmable in this rig's ~2x identical-code spread (bench.py
``_ab_verdict``). A single near-miss is noise; the SAME query
near-missing in consecutive rounds is how slow creep on sub-second
queries would accumulate silently.

This script scans every ``BENCH_r*.json`` in round order, collects
each round's near-miss set, and reports any query that near-missed in
>= 2 CONSECUTIVE rounds. Exit code 1 on repeats (so it can gate), 0
otherwise. Repeats must either get an isolated re-time entry in
BASELINE.md or a fix; ``tests/test_bench_protocol.py`` enforces that
discipline.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def round_files(repo: str = REPO) -> list[tuple[int, str]]:
    """(round, path) for every driver-recorded bench file, round order."""
    out = []
    for path in glob.glob(os.path.join(repo, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(path))
        if m:
            out.append((int(m.group(1)), path))
    return sorted(out)


def near_misses(path: str) -> set[str] | None:
    """Names adjudicated ``near_miss`` in one bench file.

    Returns None (not an empty set) when the file predates the
    adjudicator or is unreadable, so a gap round neither breaks nor
    fakes a consecutive streak.
    """
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return None
    parsed = doc.get("parsed") if isinstance(doc, dict) else None
    if not isinstance(parsed, dict):
        return None
    baseline = parsed.get("baseline")
    if not isinstance(baseline, dict):
        return None
    regs = baseline.get("regressions")
    if not isinstance(regs, dict):
        return None
    return {
        name
        for name, rec in regs.items()
        if isinstance(rec, dict)
        and isinstance(rec.get("adjudication"), dict)
        and rec["adjudication"].get("near_miss")
    }


def consecutive_repeats(
    rounds: list[tuple[int, set[str] | None]],
) -> dict[str, list[int]]:
    """{query: sorted rounds belonging to any >=2-round consecutive
    near-miss streak}. Rounds with no adjudication data (None) break a
    streak conservatively — absence of evidence is not a repeat. A
    query with two disjoint streaks reports BOTH in full (e.g. rounds
    [5,6] and [8,9] -> [5,6,8,9])."""
    streaks: dict[str, list[int]] = {}  # current live streak per name
    repeats: dict[str, set[int]] = {}
    prev_round: int | None = None
    for rnd, names in rounds:
        if names is None:
            prev_round = None
            streaks.clear()
            continue
        contiguous = prev_round is not None and rnd == prev_round + 1
        streaks = {
            name: (streaks.get(name, []) if contiguous else []) + [rnd]
            for name in names
        }
        for name, runs in streaks.items():
            if len(runs) >= 2:
                repeats.setdefault(name, set()).update(runs)
        prev_round = rnd
    return {name: sorted(runs) for name, runs in repeats.items()}


def main() -> int:
    rounds = [(rnd, near_misses(path)) for rnd, path in round_files()]
    for rnd, names in rounds:
        shown = sorted(names) if names is not None else "(no adjudication data)"
        print(f"round {rnd}: {shown}")
    repeats = consecutive_repeats(rounds)
    if repeats:
        print("\nREPEATED near-misses (>=2 consecutive rounds) — escalate:")
        for name, rnds in sorted(repeats.items()):
            print(f"  {name}: rounds {rnds}")
        return 1
    print("\nno repeated near-misses")
    return 0


if __name__ == "__main__":
    sys.exit(main())
