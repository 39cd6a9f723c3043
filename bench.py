#!/usr/bin/env python
"""Benchmark harness: runs the headline query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timing is wall clock around a full action (count of the
result — forces complete execution without driver-side materialization
of wide results)."""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from xorbits_sql_spark.queries import load_all
    from xorbits_sql_spark.session import get_spark

    spark = get_spark("xorbits-sql-spark-bench")
    specs = load_all()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    # Warm up the JVM/IO path once (scan metadata, codegen) so q01 isn't
    # charged session startup.
    specs["q01_pricing_summary"].fn(spark, sf_dir).count()

    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001 - report, don't die
            failures[name] = f"{type(exc).__name__}: {exc}"

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "query_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_queries": len(timings),
        "failures": failures,
    }
    print(json.dumps(out))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
