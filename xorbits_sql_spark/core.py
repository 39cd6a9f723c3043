"""The public entry point: ``execute``.

API-compatible with the reference's single public function
(reference core.py:50-55)::

    execute(sql, schema=None, dialect=None, tables={name: df}) -> DataFrame

but returning a lazy :class:`pyspark.sql.DataFrame`, whose laziness
contract matches the reference's lazy Xorbits result (``.fetch()`` there
≈ ``.toPandas()``/``.collect()`` here).

Query lifecycle (maps the reference's 8-step trace, SURVEY.md §3, onto
Spark): register temp views → rewrite READ_CSV table functions → dialect
transpile → ``spark.sql`` (Catalyst: parse/analyze/optimize/plan) →
return. Distributed execution happens when the caller runs an action —
the same boundary as the reference's ``xorbits.run``.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

from . import dialect as _dialect
from .errors import ExecuteError, TableNotFoundError
from .session import get_spark
from .sources.readers import register_csv_reads
from .table import register_tables

# dotted table references that must be rewritten to flattened view names
_IDENT = r"[A-Za-z_][\w]*"


def _rewrite_qualified_names(sql: str, registered: Mapping[tuple[str, ...], str]) -> str:
    """Rewrite ``catalog.db.table`` / ``db.table`` refs to flat view names.

    Spark temp views are un-namespaced, so nested registrations
    (reference core.py:62-65) are flattened by table.view_name and the SQL
    text updated to match. Plain single-part names need no rewrite.

    Substitution is literal-safe: a ``db.table`` spelling inside a string
    literal, quoted identifier, or comment is left untouched
    (dialect.sub_outside_literals lexes the SQL first).
    """
    multi = {q: v for q, v in registered.items() if len(q) > 1}
    if not multi:
        return sql
    # Longest-first so catalog.db.table wins over db.table prefixes.
    for qualified in sorted(multi, key=len, reverse=True):
        pattern = r"\b" + r"\s*\.\s*".join(re.escape(p) for p in qualified) + r"\b"
        sql = _dialect.sub_outside_literals(pattern, multi[qualified], sql)
    return sql


def execute(
    sql: str,
    schema: Mapping[str, Any] | None = None,
    dialect: str | None = None,
    tables: Mapping[str, Any] | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Run ``sql`` against registered ``tables`` and return a lazy DataFrame.

    Parameters mirror the reference (core.py:50-65):

    * ``sql`` — the query, in any supported dialect. Like the reference
      (``sql: str | Expression``), a parsed AST object is accepted too:
      anything with a callable ``.sql()`` renderer (e.g. a sqlglot
      Expression) is rendered in ``dialect`` first — duck-typed, so it
      works whether or not sqlglot is importable here.
    * ``schema`` — optional ``{table: {col: type-string}}`` (possibly nested
      ``{catalog: {db: {table: ...}}}``); used to type list/pandas inputs.
      Spark DataFrames carry their own schema and ignore it.
    * ``dialect`` — input dialect name; transpiled to Spark SQL.
    * ``tables`` — ``{name: DataFrame | pandas.DataFrame | [row dicts]}``,
      nested up to catalog.db.table.
    * ``spark`` — optional explicit session (defaults to the tuned
      process-wide session).
    """
    if not isinstance(sql, str):
        render = getattr(sql, "sql", None)
        if not callable(render):
            raise ExecuteError(
                f"sql must be a string or an AST with a .sql() renderer, got {type(sql).__name__}"
            )
        try:
            sql = render(dialect=dialect) if dialect else render()
        except TypeError:  # renderer without a dialect kwarg
            sql = render()

    spark = spark or get_spark()
    registered: dict[tuple[str, ...], str] = {}
    if tables:
        registered = register_tables(spark, tables, schema)

    text = _rewrite_qualified_names(sql, registered)
    text = register_csv_reads(spark, text, schema)
    text = _dialect.transpile(text, dialect)

    try:
        return spark.sql(text)
    except Exception as exc:
        msg = str(exc)
        if "TABLE_OR_VIEW_NOT_FOUND" in msg or "Table or view not found" in msg:
            raise TableNotFoundError(msg) from exc
        raise ExecuteError(f"failed to execute query: {msg}") from exc
