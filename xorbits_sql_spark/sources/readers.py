"""Readers: the READ_CSV table-function shim + generic loaders.

Reference parity: ``READ_CSV('path', 'delimiter', '|')`` appears in FROM
clauses (reference executor.py:290-308; usage tests/test_tpc_h.py:47-52).
The reference parses the vararg list as k/v pairs and honors only
``delimiter``; dtypes come from the declared schema. Here the same call
is rewritten out of the SQL text: each distinct READ_CSV(...) is
registered as a temp view backed by ``spark.read.csv`` (header=True to
match the reference's bundled CSVs, schema from the schema dict when one
covers it), and the FROM clause is pointed at the view. Spark's CSV
source then gives partitioned, pushdown-aware scanning for free.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

from ..errors import UnsupportedError

_READ_CSV = re.compile(
    r"READ_CSV\s*\(\s*(?P<args>'[^']*'(?:\s*,\s*'[^']*')*)\s*\)"
    r"(?P<alias>\s+(?:AS\s+)?(?P<alias_name>[A-Za-z_]\w*))?",
    re.IGNORECASE,
)


def _parse_args(arg_text: str) -> tuple[str, dict[str, str]]:
    parts = [p.strip()[1:-1] for p in re.findall(r"'[^']*'", arg_text)]
    if not parts:
        raise UnsupportedError("READ_CSV requires a path argument")
    path, rest = parts[0], parts[1:]
    if len(rest) % 2 != 0:
        raise UnsupportedError("READ_CSV options must be key/value pairs")
    # Reference executor.py:297-301: options parsed pairwise, only
    # `delimiter` honored; unknown keys are ignored there — we keep them
    # as Spark CSV options since Spark understands more (header, sep...).
    opts = {rest[i]: rest[i + 1] for i in range(0, len(rest), 2)}
    return path, opts


def _view_name_for(path: str, n: int) -> str:
    stem = re.sub(r"[^A-Za-z0-9]", "_", path.rsplit("/", 1)[-1].rsplit(".", 1)[0])
    return f"__read_csv_{stem}_{n}"


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    schema_dict: Mapping[str, str] | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """spark.read.csv with the reference's defaults (header row, '|' support)."""
    reader = spark.read.option("header", str(header).lower()).option("sep", delimiter)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema_dict:
        from ..table import schema_to_struct

        reader = reader.schema(schema_to_struct(schema_dict))
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def register_csv_reads(
    spark: SparkSession,
    sql: str,
    schema: Mapping[str, Any] | None = None,
    dialect: str | None = None,
) -> str:
    """Replace READ_CSV(...) table functions with temp views; return new SQL.

    When the READ_CSV call is aliased (``FROM READ_CSV(...) AS t`` or
    the bare ``FROM READ_CSV(...) t``) and the schema dict has an entry
    for the alias or the file stem, that schema types the scan
    (reference executor.py:303-306 behavior).

    ``dialect`` selects the lexing mode for the literal-span guard
    below — this rewrite runs PRE-transpile on raw dialect text, so it
    must lex strings the way the SOURCE dialect does (backslash escapes
    for the mysql/clickhouse/bigquery/snowflake/redshift families; the
    same pre/post-lexing discipline as core's qualified-name rewrite).
    """
    if not _READ_CSV.search(sql):
        return sql  # hot path: no READ_CSV — skip the lexing entirely
    counter = 0

    # Literal/comment spans: the regex must never fire inside a string
    # literal or comment ("SELECT 'docs: READ_CSV(''a.csv'')'" is a
    # legal query whose literal must survive — and the eager
    # spark.read.csv a match triggers would fail it loudly on the
    # nonexistent path). Spans come from the same lexer transpile uses.
    from .. import dialect as _dialect

    literal_spans: list[tuple[int, int]] = []
    pos = 0
    for kind, text in _dialect.tokenize_dialect(sql, dialect):
        end = pos + len(text)
        if kind in _dialect._LITERAL_KINDS:
            literal_spans.append((pos, end))
        pos = end

    def replace(m: re.Match[str]) -> str:
        nonlocal counter
        if any(a <= m.start() < b for a, b in literal_spans):
            return m.group(0)
        path, opts = _parse_args(m.group("args"))
        delimiter = opts.pop("delimiter", opts.pop("sep", ","))
        stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        alias = m.group("alias_name")
        alias_text = m.group("alias") or ""
        if (
            alias
            and "AS" not in alias_text.upper().split()
            and alias.upper() in _dialect.NON_ALIAS_WORDS
        ):
            # a bare word after the call that is a clause keyword
            # (WHERE/JOIN/...) is NOT an alias — don't key the schema
            # lookup on it (the text is re-emitted verbatim either way)
            alias = None
        # alias takes precedence over the file stem — the documented
        # (and reference executor.py:303-306) lookup order; previously
        # only the stem was consulted, so an aliased scan fell back to
        # inferSchema and silently dropped the declared types
        table_schema = None
        for key in (alias, stem):
            if key and schema and isinstance(schema.get(key), Mapping):
                table_schema = schema[key]
                break
        name = _view_name_for(path, counter)
        counter += 1
        df = read_csv(spark, path, delimiter=delimiter, schema_dict=table_schema, **opts)
        df.createOrReplaceTempView(name)
        # re-emit the alias the regex consumed so `t.col` refs resolve
        return name + (m.group("alias") or "")

    return _READ_CSV.sub(replace, sql)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema_dict: Mapping[str, str] | None = None,
    **options: str,
) -> DataFrame:
    """Read newline-delimited JSON (the interchange format of most
    web-scale document pipelines).

    Pass ``schema_dict`` in production: without it Spark runs an extra
    inference scan over the input — fine for tests, wasteful at 100 TB.
    """
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema_dict:
        from ..table import schema_to_struct

        reader = reader.schema(schema_to_struct(schema_dict))
    return reader.json(path)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events time column to a session-zone TIMESTAMP.

    The driver has shipped events.parquet in two physical encodings
    across rounds: TIMESTAMP(NANOS) (readable only as BIGINT nanos via
    ``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS)
    without UTC adjustment (read as TIMESTAMP_NTZ). Downstream
    operators use ``unix_micros``/watermarks, which require TIMESTAMP
    (ltz), so both forms fold to it here: nanos FLOOR-divide to micros
    (measured: DuckDB's TIMESTAMP_NS→TIMESTAMP floors, -1500 ns → -2 µs,
    while Spark's ``div`` truncates to -1 — a 1 µs cross-engine drift on
    pre-epoch rows that the hash-grade oracles would flag; pmod makes
    the division floored for either sign), and NTZ casts
    value-preserving under the UTC session zone the loaders pin.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(f"(({col} - pmod({col}, 1000)) div 1000)")
            ),
        )
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TPCH_TABLES,
    register: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver's parquet tables from ``sf_dir``; optionally register views.

    Parquet scans give Catalyst column pruning + predicate pushdown — at
    100 TB these scans are the dominant cost, so every query should show
    PushedFilters/ReadSchema narrowing in `.explain("formatted")`.
    """
    # Works on a vanilla session: events.parquet is TIMESTAMP(NANOS),
    # unreadable without this runtime-settable flag (read as BIGINT
    # nanos and converted to a microsecond timestamp below, matching
    # DuckDB's nanos->micros truncation).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # normalize_event_ts's NTZ->ltz cast is value-preserving only under
    # a UTC session zone; pin it here so a vanilla session on a
    # non-UTC machine matches the DuckDB oracle (get_spark() already
    # sets this, but load_tables must not depend on that).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = normalize_event_ts(df)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
