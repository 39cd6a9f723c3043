"""Plan inspection utilities.

The engine has no custom planner (Catalyst owns planning — SURVEY.md
§4.2 conclusion); this package exists to *check* plans: that filters
reach the parquet scan, small dimensions broadcast, and hot paths stay
in whole-stage codegen. Used by tests/test_plans.py as scale
regression gates.
"""

from .explain import (
    exchange_count,
    formatted_plan,
    partition_filters,
    pushed_filters,
    read_schemas,
    uses_broadcast_join,
)

__all__ = [
    "exchange_count",
    "formatted_plan",
    "partition_filters",
    "pushed_filters",
    "read_schemas",
    "uses_broadcast_join",
]

from .metrics import collect_metrics, metrics_tree  # noqa: E402

__all__ += ["collect_metrics", "metrics_tree"]
