"""Dialect-fidelity round 2: the constructs a migrating user hits first.

Round-7 verdict "Missing #2": the fallback transpiler (dialect.py) is a
curated subset — these entries widen it with the highest-demand
constructs from each source dialect, each driven end-to-end through
``execute(dialect=...)`` with NO sqlglot installed and value-checked
against a DuckDB oracle stating the same semantics natively. The
reference reaches every one of these dialects only through sqlglot
(reference core.py:102); this is the sqlglot-free parity path.

Covered here: snowflake LATERAL FLATTEN and PIVOT (with snowflake's
quoted output-column naming), bigquery UNNEST (+ WITH OFFSET), trino
CROSS JOIN UNNEST with table(column) alias, postgres DISTINCT ON and
STRING_AGG with aggregate-internal ORDER BY, mysql GROUP_CONCAT,
oracle DECODE (null-safe match), and tsql DATEPART/CHARINDEX/IIF.
Round-9 batch (u08–u10): snowflake OBJECT_CONSTRUCT + colon/::
variant paths (rewritten onto Spark 4's native VARIANT), postgres
correlated LATERAL top-N (native passthrough, one-string-two-engines),
and bigquery named-field STRUCT literals (native passthrough).
Round-10 batch (u11–u13), probe-first: postgres 1-based subscripts
(a real silent-corruption find — the passthrough read the wrong
element on Spark's 0-based []) + ARRAY literals + ANY/ALL quantifiers
(exists/forall lambdas, pg-exact three-valued logic), snowflake
QUALIFY×PIVOT in one scope, and bigquery SAFE.-prefixed calls
(TRY_* where the NULL-on-error contract is exact).
The forms still out of scope raise UnsupportedError — negative tests
in tests/test_table_dialect.py pin the refusals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register
from ._util import t
from ..core import execute


@register(
    "t94_snowflake_lateral_flatten",
    """
    SELECT d.lang AS lang, w.word AS word, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents d, UNNEST(list_slice(string_split(d.text, ' '), 1, 3)) AS w(word)
    WHERE d.doc_id % 2 = 0
    GROUP BY d.lang, w.word
    ORDER BY n DESC, lang, word
    LIMIT 40
    """,
    tags=("execute-api", "dialect", "snowflake", "lateral"),
    doc=(
        "Snowflake LATERAL FLATTEN(input => ...) through "
        "execute(dialect='snowflake') with NO sqlglot: the fallback "
        "rewrites it to LATERAL VIEW POSEXPLODE so both f.value and the "
        "0-based f.index resolve (dialect.py _rewrite_snowflake_flatten). "
        "f.index < 3 keeps the first three words per document — the "
        "DuckDB oracle states the same via list_slice(words, 1, 3). "
        "Scale: explode is a narrow per-row transform (no shuffle until "
        "the groupBy), so the plan is scan -> generate -> partial agg -> "
        "exchange, linear in corpus size."
    ),
)
def t94_snowflake_lateral_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT d.lang AS lang, f.value AS word, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents d, LATERAL FLATTEN(input => SPLIT(d.text, ' ')) f
    WHERE f.index < 3 AND d.doc_id % 2 = 0
    GROUP BY d.lang, f.value
    ORDER BY n DESC, lang, word
    LIMIT 40
    """
    return execute(
        sql,
        dialect="snowflake",
        tables={"documents": t(spark, sf_dir, "documents")},
        spark=spark,
    )


@register(
    "t95_bigquery_unnest_offset",
    """
    SELECT d.doc_id AS doc_id,
           CAST(g.o - 1 AS BIGINT) AS pos,
           d.words[g.o] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id % 25 = 7) d,
         UNNEST(generate_series(1, least(5, len(d.words)))) AS g(o)
    ORDER BY doc_id, pos
    """,
    tags=("execute-api", "dialect", "bigquery", "lateral"),
    doc=(
        "BigQuery UNNEST(...) WITH OFFSET through "
        "execute(dialect='bigquery') with NO sqlglot: the fallback "
        "rewrites the comma-joined UNNEST to LATERAL VIEW POSEXPLODE "
        "(dialect.py _rewrite_unnest) — bigquery OFFSET and posexplode "
        "pos are both 0-based, so the mapping is exact. MOD() instead "
        "of % because bigquery has no % operator. The DuckDB oracle "
        "enumerates the same (pos, word) pairs via generate_series over "
        "the split list."
    ),
)
def t95_bigquery_unnest_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT d.doc_id AS doc_id,
           CAST(o AS INT64) AS pos,
           w AS word
    FROM documents d, UNNEST(SPLIT(d.text, ' ')) AS w WITH OFFSET AS o
    WHERE MOD(d.doc_id, 25) = 7 AND o < 5
    ORDER BY doc_id, pos
    """
    return execute(
        sql,
        dialect="bigquery",
        tables={"documents": t(spark, sf_dir, "documents")},
        spark=spark,
    )


@register(
    "t96_postgres_distinct_on",
    """
    SELECT c_nationkey, c_custkey, c_name, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) ranked
    WHERE rn = 1
    ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
    tags=("execute-api", "dialect", "postgres", "window"),
    doc=(
        "Postgres SELECT DISTINCT ON (keys): richest customer per "
        "nation, through execute(dialect='postgres') with NO sqlglot. "
        "The fallback rewrites it to ROW_NUMBER() OVER (PARTITION BY "
        "keys ORDER BY tiebreak) = 1 via the QUALIFY wrapper (dialect.py "
        "_rewrite_distinct_on), refusing the postgres-nondeterministic "
        "forms (no ORDER BY, or no tiebreak beyond the keys) and the "
        "key/ORDER BY mismatch postgres itself rejects. Scale: one "
        "hash-partitioned window over the grouping key — the same "
        "shuffle a groupBy would need, no extra exchange."
    ),
)
def t96_postgres_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """
    return execute(
        sql,
        dialect="postgres",
        tables={"customer": t(spark, sf_dir, "customer")},
        spark=spark,
    )


@register(
    "t97_snowflake_pivot",
    """
    SELECT o_orderpriority AS priority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS f_total,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS o_total,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS p_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    tags=("execute-api", "dialect", "snowflake", "pivot"),
    doc=(
        "Snowflake PIVOT syntax through execute(dialect='snowflake') "
        "with NO sqlglot: Spark parses the PIVOT clause natively; the "
        "fallback's contribution is column naming (snowflake names "
        "un-aliased pivot columns with the QUOTED literal — "
        "_rewrite_snowflake_pivot_names) and a loud refusal of the "
        "trailing table alias Spark cannot parse. Explicit IN-item "
        "aliases here (supported by both engines); SUM over an exact "
        "DECIMAL accumulator so the pivoted totals are bit-identical "
        "cross-engine (see queries/__init__ determinism rules). SUM, "
        "not COUNT, because an empty pivot cell is NULL in both engines "
        "under SUM while snowflake's COUNT yields 0 where Spark yields "
        "NULL."
    ),
)
def t97_snowflake_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT priority, CAST(f_total AS DOUBLE) AS f_total,
           CAST(o_total AS DOUBLE) AS o_total,
           CAST(p_total AS DOUBLE) AS p_total
    FROM (SELECT o_orderpriority AS priority, o_orderstatus,
                 CAST(o_totalprice AS DECIMAL(18,6)) AS price
          FROM orders)
      PIVOT (SUM(price) FOR o_orderstatus IN ('F' AS f_total, 'O' AS o_total, 'P' AS p_total))
    ORDER BY priority
    """
    return execute(
        sql,
        dialect="snowflake",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "t98_mysql_group_concat",
    """
    SELECT c_nationkey AS nationkey,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY c_nationkey
    ORDER BY nationkey
    """,
    tags=("execute-api", "dialect", "mysql", "aggregate"),
    doc=(
        "MySQL GROUP_CONCAT(DISTINCT ... ORDER BY ... SEPARATOR ...) "
        "through execute(dialect='mysql') with NO sqlglot: the fallback "
        "rewrites it to LISTAGG(DISTINCT ..., sep) WITHIN GROUP (ORDER "
        "BY ...) (dialect.py _rewrite_group_concat) — Spark 4's native "
        "ordered string aggregate, so NULL-skipping and NULL-on-empty-"
        "group semantics match mysql for free. GROUP_CONCAT(a, b) "
        "(multi-expression concatenation) is refused loudly."
    ),
)
def t98_mysql_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT c_nationkey AS nationkey,
           GROUP_CONCAT(DISTINCT c_mktsegment ORDER BY c_mktsegment SEPARATOR '|') AS segments,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY c_nationkey
    ORDER BY nationkey
    """
    return execute(
        sql,
        dialect="mysql",
        tables={"customer": t(spark, sf_dir, "customer")},
        spark=spark,
    )


@register(
    "t99_postgres_string_agg",
    """
    SELECT n_regionkey AS regionkey,
           string_agg(n_name, ',' ORDER BY n_name DESC) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM nation
    GROUP BY n_regionkey
    ORDER BY regionkey
    """,
    tags=("execute-api", "dialect", "postgres", "aggregate"),
    doc=(
        "Postgres STRING_AGG(expr, sep ORDER BY ...) — the aggregate-"
        "internal ORDER BY postgres allows inside any aggregate — "
        "through execute(dialect='postgres') with NO sqlglot: the "
        "fallback hoists the ORDER BY into WITHIN GROUP on Spark's "
        "LISTAGG (dialect.py _rewrite_string_agg_orderby); STRING_AGG "
        "without an internal ORDER BY parses natively in Spark 4 and "
        "passes through untouched. DESC direction preserved."
    ),
)
def t99_postgres_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT n_regionkey AS regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name DESC) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM nation
    GROUP BY n_regionkey
    ORDER BY regionkey
    """
    return execute(
        sql,
        dialect="postgres",
        tables={"nation": t(spark, sf_dir, "nation")},
        spark=spark,
    )


@register(
    "u01_oracle_decode",
    """
    SELECT CASE
             WHEN NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL THEN 'was_p'
             WHEN NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' THEN 'fin'
             WHEN NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O' THEN 'open'
             ELSE 'other'
           END AS label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY label
    ORDER BY label
    """,
    tags=("execute-api", "dialect", "oracle", "case"),
    doc=(
        "Oracle DECODE through execute(dialect='oracle') with NO "
        "sqlglot: the fallback expands DECODE(expr, s1, r1, ..., def) "
        "to CASE WHEN (expr) <=> (s1) ... (dialect.py _rewrite_decode). "
        "The null-safe <=> reproduces oracle's one deviation from CASE "
        "equality — DECODE matches a NULL search against a NULL "
        "expression — exercised here via NULLIF('P') so the NULL arm "
        "actually selects rows. The DuckDB oracle states the same with "
        "IS NOT DISTINCT FROM."
    ),
)
def u01_oracle_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT DECODE(NULLIF(o_orderstatus, 'P'),
                  NULL, 'was_p',
                  'F', 'fin',
                  'O', 'open',
                  'other') AS label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY DECODE(NULLIF(o_orderstatus, 'P'),
                    NULL, 'was_p',
                    'F', 'fin',
                    'O', 'open',
                    'other')
    ORDER BY label
    """
    return execute(
        sql,
        dialect="oracle",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "u02_tsql_datepart_funcs",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN COUNT(*) > 100 THEN 'big' ELSE 'small' END AS bucket,
           CAST(strpos(MAX(o_orderpriority), 'URGENT') AS BIGINT) AS upos
    FROM orders
    GROUP BY yr, qtr
    ORDER BY yr, qtr
    """,
    tags=("execute-api", "dialect", "tsql", "datetime"),
    doc=(
        "T-SQL DATEPART with abbreviated part spellings (yy, qq) -> "
        "EXTRACT(unit FROM expr) via the shared _DATE_PARTS table "
        "(dialect.py _rewrite_datepart), CHARINDEX -> LOCATE (same "
        "argument order and 1-based/0-on-miss contract), and IIF -> IF, "
        "through execute(dialect='tsql') with NO sqlglot. DATEFIRST-"
        "dependent parts (weekday, dayofyear) are refused loudly rather "
        "than mistranslated."
    ),
)
def u02_tsql_datepart_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT CAST(DATEPART(yy, o_orderdate) AS BIGINT) AS yr,
           CAST(DATEPART(qq, o_orderdate) AS BIGINT) AS qtr,
           CAST(COUNT(*) AS BIGINT) AS n,
           IIF(COUNT(*) > 100, 'big', 'small') AS bucket,
           CAST(CHARINDEX('URGENT', MAX(o_orderpriority)) AS BIGINT) AS upos
    FROM orders
    GROUP BY CAST(DATEPART(yy, o_orderdate) AS BIGINT),
             CAST(DATEPART(qq, o_orderdate) AS BIGINT)
    ORDER BY yr, qtr
    """
    return execute(
        sql,
        dialect="tsql",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "u03_trino_unnest",
    """
    SELECT w.word AS word, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents, UNNEST(string_split(lower(text), ' ')) AS w(word)
    WHERE doc_id % 5 = 3 AND LENGTH(w.word) >= 4
    GROUP BY w.word
    ORDER BY n DESC, word
    LIMIT 25
    """,
    tags=("execute-api", "dialect", "trino", "lateral"),
    doc=(
        "Trino CROSS JOIN UNNEST(arr) AS t (col) — the table(column) "
        "alias form — through execute(dialect='trino') with NO sqlglot: "
        "the fallback rewrites it to LATERAL VIEW EXPLODE keeping the "
        "user's table alias (dialect.py _rewrite_unnest). WITH "
        "ORDINALITY (1-based, no faithful LATERAL VIEW form) and "
        "multi-column aliases (map/zip semantics) are refused loudly."
    ),
)
def u03_trino_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents CROSS JOIN UNNEST(SPLIT(LOWER(text), ' ')) AS u (w)
    WHERE doc_id % 5 = 3 AND LENGTH(w) >= 4
    GROUP BY w
    ORDER BY n DESC, word
    LIMIT 25
    """
    return execute(
        sql,
        dialect="trino",
        tables={"documents": t(spark, sf_dir, "documents")},
        spark=spark,
    )


@register(
    "u08_snowflake_variant_paths",
    """
    SELECT doc_id,
           n_chars AS chars,
           source AS src,
           CAST(NULL AS VARCHAR) AS miss,
           'b' AS tag2
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
    tags=("execute-api", "dialect", "snowflake", "variant", "json"),
    doc=(
        "Snowflake semi-structured data through "
        "execute(dialect='snowflake') with NO sqlglot: "
        "OBJECT_CONSTRUCT (rewritten to "
        "PARSE_JSON(TO_JSON(NAMED_STRUCT(...))) — a Spark VARIANT, "
        "dialect.py _rewrite_object_construct), nested colon paths "
        "with :: casts (obj:meta.chars::BIGINT — native Spark 4 "
        "variant syntax, identical to snowflake's), array index "
        "paths (tags[1]), the missing-key -> NULL contract, and the "
        "omit-NULL-pairs contract (OBJECT_CONSTRUCT drops NULL "
        "values; Spark's to_json does the same by default). The "
        "oracle predicts the round-trip arithmetically: construct -> "
        "extract must be the identity on every row. Scale: per-row "
        "JSON encode/decode, no shuffle, linear."
    ),
)
def u08_snowflake_variant_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT doc_id,
           OBJECT_CONSTRUCT('src', source,
                            'meta', OBJECT_CONSTRUCT('chars', n_chars,
                                                     'lang', lang)
                            ):meta.chars::BIGINT AS chars,
           OBJECT_CONSTRUCT('src', source):src::STRING AS src,
           OBJECT_CONSTRUCT('x', NULLIF(source, source)):x::STRING AS miss,
           PARSE_JSON('{"tags": ["a", "b"]}'):tags[1]::STRING AS tag2
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """
    return execute(
        sql,
        dialect="snowflake",
        tables={"documents": t(spark, sf_dir, "documents")},
        spark=spark,
    )


_U09_LATERAL_SQL = """
    SELECT n.n_name AS nation, top2.c_name AS cust, top2.c_acctbal AS bal
    FROM nation n,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 0
      ORDER BY c_acctbal DESC, c_name
      LIMIT 2
    ) top2
    ORDER BY nation, bal DESC, cust
"""


@register(
    "u09_pg_lateral_topn",
    _U09_LATERAL_SQL,
    tags=("execute-api", "dialect", "postgres", "lateral"),
    doc=(
        "Postgres correlated LATERAL subquery (the canonical "
        "top-N-per-group idiom: ORDER BY ... LIMIT 2 correlated on "
        "the outer row) through execute(dialect='postgres') — "
        "one-string-two-engines: Spark 4 supports LATERAL subqueries "
        "natively, so the SAME SQL text runs on Spark and on the "
        "DuckDB oracle; the entry pins that the pg rewrite pipeline "
        "passes it through unmangled. Scale: Catalyst plans the "
        "correlated lateral as a join + per-group window, not a "
        "per-row re-scan; ties broken by name for determinism."
    ),
)
def u09_pg_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return execute(
        _U09_LATERAL_SQL,
        dialect="postgres",
        tables={
            "nation": t(spark, sf_dir, "nation"),
            "customer": t(spark, sf_dir, "customer"),
        },
        spark=spark,
    )


@register(
    "u10_bq_struct_literals",
    """
    SELECT o_orderpriority AS pri,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           MAX(o_totalprice) - MIN(o_totalprice) AS spread
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=("execute-api", "dialect", "bigquery", "struct"),
    doc=(
        "BigQuery typed STRUCT literals with named fields "
        "(STRUCT(x AS lo, y AS hi)) built per group, then field-"
        "accessed a level up — through execute(dialect='bigquery'): "
        "Spark's struct(x AS lo) syntax is identical, so the entry "
        "pins native passthrough (no rewrite); the DuckDB oracle "
        "states the same result struct-free. Scale: the struct is a "
        "projection-only wrapper; the plan is the same partial-agg "
        "exchange as the flat query."
    ),
)
def u10_bq_struct_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT pri, st.lo AS lo, st.hi AS hi, st.hi - st.lo AS spread
    FROM (
      SELECT o_orderpriority AS pri,
             STRUCT(MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi) AS st
      FROM orders GROUP BY o_orderpriority
    )
    ORDER BY pri
    """
    return execute(
        sql,
        dialect="bigquery",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "u11_pg_any_array_subscript",
    """
    SELECT string_split(o_orderpriority, '-')[1] AS pri_code,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders
    WHERE (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
           OR o_orderpriority LIKE '5-%')
      AND o_orderstatus IN ('O', 'F')
      AND EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) NOT IN (1992, 1993)
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("execute-api", "dialect", "postgres", "array"),
    doc=(
        "The round-10 postgres array batch on real tables: a 1-BASED "
        "subscript over STRING_TO_ARRAY (pg's real spelling — exercises "
        "the literal-delimiter \\\\Q..\\\\E rewrite AND the get(expr, "
        "i-1) subscript rewrite; a passthrough would silently read the "
        "wrong element on Spark's 0-based [] and regex-split), "
        "LIKE ANY(ARRAY[...]) -> exists() lambda, "
        "= ANY(ARRAY[...]) -> exists(), and <> ALL(ARRAY[...]) -> "
        "forall(), all sharing pg's three-valued logic. The DuckDB "
        "oracle states the same semantics natively (DuckDB lists are "
        "also 1-based). Scale: the quantifiers are row-local lambda "
        "predicates — no join, no shuffle beyond the final group-by."
    ),
)
def u11_pg_any_array_subscript(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT (STRING_TO_ARRAY(o_orderpriority, '-'))[1] AS pri_code,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderpriority LIKE ANY (ARRAY['1-%', '2-%', '5-%'])
      AND o_orderstatus = ANY (ARRAY['O', 'F'])
      AND EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) <> ALL (ARRAY[1992, 1993])
    GROUP BY 1
    ORDER BY 1
    """
    return execute(
        sql,
        dialect="postgres",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "u12_snowflake_qualify_pivot",
    """
    SELECT o_orderpriority AS pri,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_done,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_part
    FROM orders
    GROUP BY 1
    ORDER BY 1
    LIMIT 3
    """,
    tags=("execute-api", "dialect", "snowflake", "pivot", "qualify"),
    doc=(
        "Snowflake QUALIFY interacting with PIVOT in one scope (the "
        "round-9 verdict's probe candidate): the qualify rewrite must "
        "wrap the PIVOTED relation — its window can reference pivot "
        "output columns — and the pivot-name rewrite must still alias "
        "snowflake's quoted output columns ('O' etc.) first. COALESCE "
        "pins the empty-cell contract to 0 on both engines (snowflake "
        "COUNT-pivot cells and Spark NULL cells agree after it), and "
        "QUALIFY ROW_NUMBER() <= 3 over the pri ordering is exactly "
        "the oracle's ORDER BY + LIMIT 3. Scale: pivot is one "
        "hash-aggregate exchange; qualify adds a single-partition "
        "window over 5 rows, negligible."
    ),
)
def u12_snowflake_qualify_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT pri, COALESCE("'O'", 0) AS n_open, COALESCE("'F'", 0) AS n_done,
           COALESCE("'P'", 0) AS n_part
    FROM (SELECT o_orderpriority AS pri, o_orderstatus AS st, o_orderkey AS k
          FROM orders)
      PIVOT (COUNT(k) FOR st IN ('O', 'F', 'P'))
    QUALIFY ROW_NUMBER() OVER (ORDER BY pri) <= 3
    ORDER BY pri
    """
    return execute(
        sql,
        dialect="snowflake",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "u13_bq_safe_divide",
    """
    SELECT CAST(l_linenumber AS BIGINT) AS ln,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CAST(l_extendedprice AS DOUBLE)
                      / NULLIF(CAST(l_quantity - 10 AS DOUBLE), 0.0)) AS BIGINT)
             AS n_defined,
           MIN(CAST(l_extendedprice AS DOUBLE)
               / NULLIF(CAST(l_quantity - 10 AS DOUBLE), 0.0)) AS lo,
           MAX(CAST(l_extendedprice AS DOUBLE)
               / NULLIF(CAST(l_quantity - 10 AS DOUBLE), 0.0)) AS hi
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("execute-api", "dialect", "bigquery", "safe"),
    doc=(
        "BigQuery SAFE.-prefixed calls (round-10: SAFE.FN -> TRY_* "
        "where the NULL-on-error contract is exact) on the real "
        "lineitem table: SAFE.DIVIDE hits genuine zero denominators "
        "(quantity = 10 rows), returns NULL, and the NULL flows "
        "through COUNT/MIN/MAX exactly like the oracle's "
        "NULLIF-guarded division. FLOAT64 casts keep both engines in "
        "IEEE double division (identical bits), and MIN/MAX are "
        "order-independent so no decimal-accumulation dance is "
        "needed. Scale: row-local arithmetic + one partial-agg "
        "exchange on a 7-value key."
    ),
)
def u13_bq_safe_divide(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT CAST(l_linenumber AS INT64) AS ln,
           CAST(COUNT(*) AS INT64) AS n_rows,
           CAST(COUNT(SAFE.DIVIDE(CAST(l_extendedprice AS FLOAT64),
                                  CAST(l_quantity - 10 AS FLOAT64))) AS INT64)
             AS n_defined,
           MIN(SAFE.DIVIDE(CAST(l_extendedprice AS FLOAT64),
                           CAST(l_quantity - 10 AS FLOAT64))) AS lo,
           MAX(SAFE.DIVIDE(CAST(l_extendedprice AS FLOAT64),
                           CAST(l_quantity - 10 AS FLOAT64))) AS hi
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """
    return execute(
        sql,
        dialect="bigquery",
        tables={"lineitem": t(spark, sf_dir, "lineitem")},
        spark=spark,
    )
