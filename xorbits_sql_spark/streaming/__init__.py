"""Structured Streaming operators.

Entirely additive over the reference (SURVEY.md §2.9: the reference has
no streaming of any kind). Provides windowed aggregation with
watermarks and sessionization as streaming transformations, plus a
synchronous runner for testing (memory sink + processAllAvailable).
"""

from .stateful import running_totals
from .windows import run_to_memory, sessionized_counts, tumbling_counts

__all__ = ["tumbling_counts", "sessionized_counts", "run_to_memory", "running_totals"]
