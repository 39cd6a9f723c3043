"""Sources & sinks.

The reference supports only in-memory tables and a ``READ_CSV`` table
function (reference executor.py:254-308); everything else here is the
Spark-native superset: parquet/csv/jsonl readers with schema handling
and pushdown (orc via ``write_table(fmt="orc")`` + ``spark.read.orc``),
partitioned/bucketed sink writers. JDBC and other connectors are plain
``spark.read.format(...)`` — no shim needed.
"""

from .readers import load_tables, read_csv, read_jsonl, register_csv_reads
from .writers import write_bucketed_table, write_table

__all__ = [
    "load_tables",
    "read_csv",
    "read_jsonl",
    "register_csv_reads",
    "write_table",
    "write_bucketed_table",
]
