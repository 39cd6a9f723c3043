"""Scalar/column function library.

The reference's runtime function surface is 16 operators (reference
executor.py:163-182); everything else raises UnsupportedError there.
On Spark the full built-in function set is available, so this package
only adds what Spark lacks: text-analysis primitives for training-data
pipelines (``text``) and vector math over embedding columns
(``vectors``) — all built from JVM-side built-ins (no Python UDFs in
the hot path).
"""

from . import text, udf, vectors
from .udf import register_pandas_udf, register_udf

__all__ = ["text", "vectors", "udf", "register_pandas_udf", "register_udf"]
