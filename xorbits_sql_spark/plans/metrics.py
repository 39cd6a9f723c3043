"""Post-execution physical metrics: what a query ACTUALLY shuffled.

The plan-shape gates (explain.py) check intent — broadcast here, filter
pushed there. This module checks outcome: after an action has run, every
physical operator carries populated SQLMetrics (the numbers the Spark UI
shows), and reading them turns "this aggregation is map-side combinable"
from a design claim into a measured fact (e.g. TPC-H Q1 at sf0.01 scans
60,000 rows and shuffles THREE records).

Usage contract: call on the SAME DataFrame object AFTER an action that
executes the DataFrame's OWN QueryExecution — `collect()`, `toPandas()`,
or `write`. NOT `count()`: count builds a separate aggregated
QueryExecution, leaving this DataFrame's metrics unset. Calling before
any qualifying action returns zeros (metrics unset), not an error,
because the plan tree itself exists either way.

The traversal descends through AQE wrappers (AdaptiveSparkPlanExec ->
its final executed plan; *QueryStageExec -> the materialized stage
plan), so reused/cached stages are counted once per appearance in the
final plan, exactly as the UI renders them.

No equivalent exists in the reference (its executor is eager pandas with
no physical metrics layer; reference executor.py interprets plan steps
directly) — this is Spark-native observability surface.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame

def _walk(node, visit, depth: int = 0) -> None:
    """Pre-order traversal of the executed plan, descending through AQE
    wrappers; ``visit(node, name, depth)``. The single traversal both
    collect_metrics and metrics_tree share — descend-rule fixes apply
    to both."""
    name = node.getClass().getSimpleName()
    visit(node, name, depth)
    if name == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), visit, depth + 1)
        return
    if name.endswith("QueryStageExec"):
        _walk(node.plan(), visit, depth + 1)
        return
    children = node.children().iterator()
    while children.hasNext():
        _walk(children.next(), visit, depth + 1)


def _node_metrics(node) -> dict[str, int]:
    out: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def collect_metrics(df: DataFrame) -> dict[str, int]:
    """Aggregate executed-plan metrics across all physical nodes.

    Returns a dict with the scale-relevant totals::

        shuffle_records_written, shuffle_bytes_written, spill_bytes,
        scan_rows, scan_files, output_rows

    plus ``nodes`` (physical operator count). All zeros until an action
    has run on this DataFrame.

    ``output_rows`` is BEST-EFFORT: the topmost (pre-order first)
    operator that reports ``numOutputRows``, preferring real operators
    over scan-side decode/exchange plumbing (ColumnarToRow, Scan,
    Exchange). Plan roots like CollectLimit carry no row metric at all,
    so when nothing above the plumbing reports one, the plumbing count
    is returned — rows decoded, not rows returned.
    """
    totals: dict[str, int] = defaultdict(int)
    root_rows: list[int] = []
    plumbing_rows: list[int] = []

    def visit(node, name: str, depth: int) -> None:
        totals["nodes"] += 1
        m = _node_metrics(node)
        totals["shuffle_records_written"] += max(0, m.get("shuffleRecordsWritten", 0))
        totals["shuffle_bytes_written"] += max(0, m.get("shuffleBytesWritten", 0))
        totals["spill_bytes"] += max(0, m.get("spillSize", 0))
        if name.endswith("ScanExec"):
            totals["scan_rows"] += max(0, m.get("numOutputRows", 0))
            totals["scan_files"] += max(0, m.get("numFiles", 0))
        if "numOutputRows" in m:
            is_plumbing = name.endswith(
                ("ScanExec", "ExchangeExec", "ColumnarToRowExec", "InputAdapter")
            )
            bucket = plumbing_rows if is_plumbing else root_rows
            if not bucket:
                bucket.append(max(0, m["numOutputRows"]))

    _walk(df._jdf.queryExecution().executedPlan(), visit)
    totals["output_rows"] = (
        root_rows[0] if root_rows else (plumbing_rows[0] if plumbing_rows else 0)
    )
    return dict(totals)


def metrics_tree(df: DataFrame) -> str:
    """Indented per-operator report of non-zero metrics (UI-style)."""
    lines: list[str] = []

    def visit(node, name: str, depth: int) -> None:
        interesting = {
            k: v for k, v in _node_metrics(node).items() if v not in (0, -1)
        }
        lines.append("  " * depth + name + (f"  {interesting}" if interesting else ""))

    _walk(df._jdf.queryExecution().executedPlan(), visit)
    return "\n".join(lines)
