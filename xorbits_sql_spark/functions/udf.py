"""User-defined function registration for the SQL surface.

The reference has NO UDF story at all (SURVEY.md §2.9) — its answer to
custom logic is "fetch the result and keep going in pandas". Spark has
one, so the engine exposes it: register a Python function once and call
it from any ``execute()`` SQL string or DataFrame expression.

Two tiers, in order of preference:

* :func:`register_pandas_udf` — Arrow-batched, vectorized (the function
  receives/returns ``pandas.Series``). One JVM↔Python crossing per
  batch; the only acceptable Python hot-path at 100 TB.
* :func:`register_udf` — row-at-a-time fallback for non-vectorizable
  logic. ~10-100x slower than the pandas tier; keep it off large scans.

Both register into the session's function catalog, so the name works in
``execute()``/``spark.sql`` text, exactly like a built-in.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType

from ..table import parse_type


def register_pandas_udf(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: str | DataType = "double",
):
    """Register ``fn`` (pandas.Series -> pandas.Series) as SQL function
    ``name``. Returns the udf object for DataFrame-API use."""
    rt = parse_type(return_type) if isinstance(return_type, str) else return_type
    udf = F.pandas_udf(fn, returnType=rt)
    spark.udf.register(name, udf)
    return udf


def register_udf(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: str | DataType = "string",
):
    """Register a row-at-a-time Python function as SQL function ``name``.

    Slow path — prefer :func:`register_pandas_udf`.
    """
    rt = parse_type(return_type) if isinstance(return_type, str) else return_type
    udf = F.udf(fn, returnType=rt)
    spark.udf.register(name, udf)
    return udf
