"""xorbits_sql_spark — a PySpark-native SQL-on-DataFrames engine.

A from-scratch rebuild of the capabilities of ``xorbitsai/xorbits_sql``
(reference: /root/reference/xorbits_sql/__init__.py:16 exposes a single
``execute`` entry point), re-expressed Spark-first:

* ``execute(sql, schema=None, dialect=None, tables=...)`` registers
  DataFrames (Spark, pandas, or lists of row-dicts) as temp views,
  normalizes the SQL dialect, and runs it through Spark SQL / Catalyst,
  returning a lazy :class:`pyspark.sql.DataFrame`.
* Catalyst + Tungsten replace the reference's SQLGlot-plan interpreter and
  Xorbits runtime (reference executor.py:210-252) — no custom plan walker
  is needed; the engine's job is API surface, dialect handling, sources,
  and the operator library layered on top.

Beyond reference parity the package ships large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal column
plumbing, structured-streaming variants) — see the ``operators``,
``functions``, ``streaming`` and ``multimodal`` subpackages.
"""

from .core import execute
from .errors import ExecuteError, TableNotFoundError, UnsupportedError
from .session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = [
    "execute",
    "get_spark",
    "stop_spark",
    "ExecuteError",
    "TableNotFoundError",
    "UnsupportedError",
    "__version__",
]
