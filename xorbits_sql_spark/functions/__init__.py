"""Scalar/column function library.

The reference's runtime function surface is 16 operators (reference
executor.py:163-182); everything else raises UnsupportedError there.
On Spark the full built-in function set is available, so this package
only adds what Spark lacks: text-analysis primitives for training-data
pipelines (``text``), vector math over embedding columns (``vectors``),
and the shared cross-engine statistical expression helpers (``stats``)
— all built from JVM-side built-ins (no Python UDFs in the hot path).
"""

from . import stats, text, udf, vectors
from .udf import register_pandas_udf, register_udf

__all__ = ["stats", "text", "vectors", "udf", "register_pandas_udf", "register_udf"]
