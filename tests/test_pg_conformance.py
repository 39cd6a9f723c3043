"""Postgres-dialect conformance: ONE query string, TWO engines.

Each case runs VERBATIM through ``execute(sql, dialect="postgres")``
on Spark AND through DuckDB (whose SQL dialect is postgres-compatible
for everything used here), compared with the same type-strict harness
as the registry parity suite. This is the strongest statement the
fallback transpiler can make: a migrating user's actual pg SQL
produces identical values on both engines — no per-case hand-written
oracle to get subtly wrong on the same side as the implementation.

Constructs deliberately exercised: ILIKE, POSIX regex (~ / !~),
DISTINCT ON, STRING_AGG with internal ORDER BY, EXTRACT
DOW/ISODOW/EPOCH (the Sunday-numbering fix), generate_series,
FILTER (WHERE), PERCENTILE_CONT WITHIN GROUP, ``::`` casts,
SUBSTRING FROM/FOR + POSITION, named WINDOW clauses, BOOL_AND/OR,
IS DISTINCT FROM, INTERVAL arithmetic, NULL sort position under
LIMIT. Known divergences NOT in scope (documented refusals or typed
differences): int/int division on COLUMN operands (pg truncates,
Spark divides — untranslatable without types; the statically
type-known subset — integer literals and COUNT(...) — IS translated
by _rewrite_int_literal_division, value-tested in
test_table_dialect.py, but can't be conformance-cased here because
DuckDB's own ``/`` is float division, not pg-faithful), TO_CHAR
(absent in DuckDB; covered by the strftime-mapped staged entry
u06)."""

from __future__ import annotations

import pytest

from xorbits_sql_spark import execute

from .conftest import SF_ORACLE
from .oracle import compare, exact_match

# Every query: deterministic total ORDER BY, aggregates decimal-cast
# per the registry's cross-engine rules, identical aliases (positional
# sort keys allowed — both engines resolve them identically).
CASES = {
    "ilike_regex_filters": """
        SELECT o_orderkey, o_orderpriority
        FROM orders
        WHERE o_orderpriority ILIKE '%urgent%' AND o_orderstatus ~ '^[OF]'
          AND o_orderkey < 300
        ORDER BY o_orderkey
    """,
    "distinct_on_latest_order": """
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey < 40
        ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
    "string_agg_ordered": """
        SELECT r_regionkey,
               (SELECT STRING_AGG(n_name, ',' ORDER BY n_name)
                FROM nation WHERE n_regionkey = r_regionkey) AS members
        FROM region
        ORDER BY r_regionkey
    """,
    "dow_isodow_epoch": """
        SELECT CAST(EXTRACT(DOW FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
               CAST(EXTRACT(ISODOW FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS isodow,
               COUNT(*) AS n,
               CAST(MIN(EXTRACT(EPOCH FROM o_orderdate)) AS DOUBLE) AS first_epoch
        FROM orders
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "generate_series_spine": """
        SELECT g.n AS bucket,
               COUNT(o_orderkey) AS n_orders
        FROM generate_series(0, 9) AS g(n)
        LEFT JOIN orders
          ON CAST(o_orderkey % 10 AS BIGINT) = g.n AND o_orderkey < 500
        GROUP BY g.n
        ORDER BY g.n
    """,
    "filter_and_percentile": """
        SELECT o_orderstatus,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               CAST(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                    AS DOUBLE) AS median_price
        FROM orders
        WHERE o_orderkey < 2000
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "cast_shorthand_strings": """
        SELECT c_custkey,
               SUBSTRING(c_name FROM 1 FOR 8) AS prefix,
               POSITION('#' IN c_name) AS hash_at,
               (c_custkey * 2)::BIGINT AS doubled
        FROM customer
        WHERE c_custkey <= 25
        ORDER BY c_custkey
    """,
    "named_window": """
        SELECT o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 AS running,
               RANK() OVER w AS rnk
        FROM orders
        WHERE o_orderkey < 200
        WINDOW w AS (ORDER BY o_orderkey)
        ORDER BY o_orderkey
    """,
    "bool_aggs_distinct_from": """
        SELECT n_regionkey,
               BOOL_AND(n_nationkey >= 0) AS all_nonneg,
               BOOL_OR(n_name ~ '^A') AS any_a,
               COUNT(*) FILTER (WHERE n_name IS DISTINCT FROM 'FRANCE') AS non_france
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
    """,
    "interval_arithmetic": """
        SELECT o_orderkey,
               CAST((CAST(o_orderdate AS DATE) + INTERVAL '30 days')::DATE
                    AS VARCHAR(10)) AS due
        FROM orders
        WHERE o_orderkey < 100
        ORDER BY o_orderkey
    """,
    "not_regex_and_nulls_last_limit": """
        SELECT n_name,
               NULLIF(n_regionkey, 0) AS nullable_region
        FROM nation
        WHERE n_name !~ 'IA$'
        ORDER BY nullable_region, n_name
        LIMIT 8
    """,
    "correlated_exists": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        ) AND c_custkey < 200
        ORDER BY c_custkey
    """,
    "cte_chain": """
        WITH big AS (
            SELECT o_custkey, COUNT(*) AS n
            FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8
        ),
        named AS (
            SELECT b.o_custkey, b.n, c.c_name
            FROM big b JOIN customer c ON c.c_custkey = b.o_custkey
        )
        SELECT * FROM named ORDER BY n DESC, o_custkey LIMIT 10
    """,
    "grouping_sets": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               COUNT(*) AS n
        FROM orders
        WHERE o_orderkey < 5000
        GROUP BY GROUPING SETS ((o_orderstatus,
                                 EXTRACT(YEAR FROM o_orderdate)), ())
        ORDER BY status, yr NULLS FIRST
    """,
    "set_ops": """
        SELECT n_name FROM nation WHERE n_regionkey = 0
        UNION
        SELECT n_name FROM nation WHERE n_name ~ '^A'
        EXCEPT
        SELECT n_name FROM nation WHERE n_name ILIKE '%algeria%'
        ORDER BY n_name
    """,
    "any_all_and_subscripts": """
        SELECT n_name,
               (ARRAY[n_name, 'X'])[1] AS first_piece,
               (ARRAY[n_regionkey, n_nationkey])[5] AS oob_null,
               n_regionkey = ANY (ARRAY[0, 2]) AS in_02,
               n_nationkey <> ALL (SELECT n_regionkey FROM nation) AS above_regions
        FROM nation
        WHERE n_nationkey < 12
        ORDER BY n_name
    """,
    "caret_power_and_log10": """
        SELECT n_nationkey,
               CAST(2 ^ (n_nationkey % 4) AS DOUBLE) AS pow2,
               CAST(ROUND(LOG(n_nationkey * 10 + 10), 6) AS DOUBLE) AS l10,
               CAST(LOG(2, 8) AS DOUBLE) AS l2
        FROM nation
        WHERE n_nationkey < 8
        ORDER BY n_nationkey
    """,
    "left_join_coalesce": """
        SELECT r_name,
               COALESCE(x.cnt, 0) AS n_nations
        FROM region
        LEFT JOIN (
            SELECT n_regionkey, COUNT(*) AS cnt
            FROM nation WHERE n_nationkey > 10 GROUP BY n_regionkey
        ) x ON x.n_regionkey = r_regionkey
        ORDER BY r_name
    """,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_pg_conformance(name, spark, duck):
    sql = CASES[name]
    tables = {
        t: spark.read.parquet(f"{SF_ORACLE}/{t}.parquet")
        for t in ("orders", "customer", "nation", "region")
    }
    sdf = execute(sql, tables=tables, dialect="postgres", spark=spark).toPandas()
    ddf = duck.execute(sql).fetchdf()
    assert len(sdf) > 0, f"{name}: empty result proves nothing"
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
    assert exact_match(sdf, ddf), f"{name}: values differ below tolerance"


# duckdb dialect: DuckDB is its own perfect oracle. Exercises the
# duckdb-specific spellings (list functions, arg_max/min) plus the
# duckdb NULL default (NULLS LAST in BOTH directions — unlike pg).
DUCKDB_CASES = {
    "string_split_literal": """
        SELECT n_name,
               string_split(n_name, 'A') AS parts,
               string_split(n_name, 'A')[1] AS head
        FROM nation
        WHERE n_nationkey < 6
        ORDER BY n_name
    """,
    "list_functions": """
        SELECT n_regionkey,
               list_contains(array_agg(n_nationkey), 3) AS has_3,
               arg_max(n_name, n_nationkey) AS max_key_name,
               arg_min(n_name, n_nationkey) AS min_key_name
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
    """,
    "duckdb_nulls_last_desc_limit": """
        SELECT n_name, NULLIF(n_regionkey, 4) AS r
        FROM nation
        ORDER BY r DESC, n_name
        LIMIT 6
    """,
    "duckdb_distinct_on": """
        SELECT DISTINCT ON (o_orderstatus) o_orderstatus, o_orderkey
        FROM orders
        WHERE o_orderkey < 1000
        ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey
    """,
    # round-11 sweep spellings, verbatim on both engines
    "duckdb_intdiv_trim_substr0": """
        SELECT n_nationkey,
               n_nationkey // 4 AS quarter,
               (0 - n_nationkey) // 4 AS neg_quarter,
               TRIM(n_name, 'AEIOU') AS trimmed,
               LTRIM(n_name, 'AEIOU') AS ltrimmed,
               SUBSTR(n_name, 0, 4) AS virt0
        FROM nation
        WHERE n_nationkey < 10
        ORDER BY n_nationkey
    """,
    "duckdb_bare_array_literals": """
        SELECT n_nationkey,
               [n_nationkey, n_regionkey, 7] AS triple,
               [n_nationkey, n_regionkey, 7][1] AS first_elem,
               [n_nationkey, n_regionkey, 7][-1] AS last_elem
        FROM nation
        WHERE n_nationkey < 6
        ORDER BY n_nationkey
    """,
    "duckdb_json_arrows": """
        SELECT n_nationkey,
               ('{"k": "' || n_name || '", "n": {"r": ' || n_regionkey
                || '}}') ->> 'k' AS name_out,
               ('{"k": "' || n_name || '", "n": {"r": ' || n_regionkey
                || '}}') -> 'n' ->> 'r' AS region_out
        FROM nation
        WHERE n_nationkey < 8
        ORDER BY n_nationkey
    """,
}


@pytest.mark.parametrize("name", sorted(DUCKDB_CASES))
def test_duckdb_conformance(name, spark, duck):
    sql = DUCKDB_CASES[name]
    tables = {
        t: spark.read.parquet(f"{SF_ORACLE}/{t}.parquet")
        for t in ("orders", "nation")
    }
    sdf = execute(sql, tables=tables, dialect="duckdb", spark=spark).toPandas()
    ddf = duck.execute(sql).fetchdf()
    assert len(sdf) > 0, name
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
    assert exact_match(sdf, ddf), name
