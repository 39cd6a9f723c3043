"""Relational operator coverage beyond the TPC-H shapes.

Covers every remaining SURVEY.md §2 inventory row the reference parses
but cannot execute (set ops §2.8, window functions §2.6, grouping
sets/cube/rollup §2.5, IN/CASE/EXTRACT/SUBSTRING §2.3, mixed NULLS
FIRST/LAST sort §2.7) — all native Spark, each hash-checked against
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from ._util import copurchase_edges, dsum, sql_dsum, t
from ..core import execute


@register(
    "q23_execute_top_nested",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal
    FROM (SELECT c_mktsegment, c_acctbal FROM customer
          ORDER BY c_acctbal DESC, c_custkey LIMIT 50) s
    GROUP BY c_mktsegment
    ORDER BY n DESC, c_mktsegment
    LIMIT 5
    """,
    tags=("execute-api", "dialect", "tsql"),
    doc=(
        "Nested TOP (round-3 verdict #4): tsql TOP in a subquery AND the "
        "outer query, through execute(dialect='tsql'). The fallback "
        "transpiler (dialect.py _for_each_scope + _rewrite_top) rewrites "
        "each TOP within its own paren scope to a scope-final LIMIT — "
        "the placement the reference gets from sqlglot "
        "(reference core.py:102). Deterministic inner order via the "
        "(acctbal DESC, custkey) tiebreak."
    ),
)
def q23_execute_top_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT TOP 5 [c_mktsegment],
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS bal
    FROM (SELECT TOP 50 c_mktsegment, c_acctbal FROM customer
          ORDER BY c_acctbal DESC, c_custkey) s
    GROUP BY c_mktsegment
    ORDER BY n DESC, c_mktsegment
    """
    return execute(
        sql,
        dialect="tsql",
        tables={"customer": t(spark, sf_dir, "customer")},
        spark=spark,
    )


@register(
    "q24_execute_qualify_cte",
    """
    WITH ranked AS (
      SELECT o_custkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS top_order_value
    FROM ranked WHERE rn = 1
    """,
    tags=("execute-api", "dialect", "snowflake", "window"),
    doc=(
        "QUALIFY inside a CTE body (round-3 verdict #4): snowflake's "
        "top-order-per-customer idiom through "
        "execute(dialect='snowflake'). The scoped QUALIFY rewrite "
        "(dialect.py _for_each_scope + _rewrite_qualify) hoists the "
        "window predicate into a wrapped projection inside the CTE's own "
        "scope — the most common remaining UnsupportedError a snowflake "
        "user hit per the round-3 verdict."
    ),
)
def q24_execute_qualify_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    WITH ranked AS (
      SELECT o_custkey, o_totalprice
      FROM orders
      QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS top_order_value
    FROM ranked
    """
    return execute(
        sql,
        dialect="snowflake",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "q25_execute_qualify_distinct",
    """
    SELECT DISTINCT o_orderstatus FROM (
      SELECT o_orderstatus,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) f
    WHERE rn = 1
    ORDER BY o_orderstatus
    """,
    tags=("execute-api", "dialect", "duckdb", "window"),
    doc=(
        "QUALIFY with SELECT DISTINCT (round-3 verdict #4): the distinct "
        "statuses of each customer's FIRST order, through "
        "execute(dialect='duckdb'). QUALIFY evaluates before DISTINCT in "
        "the source dialects, so the rewrite filters inside the wrapper "
        "and hoists DISTINCT to the outer select over the original "
        "columns only (the __qualify helper column is excluded)."
    ),
)
def q25_execute_qualify_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT DISTINCT o_orderstatus
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) = 1
    ORDER BY o_orderstatus
    """
    return execute(
        sql,
        dialect="duckdb",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "q26_execute_top_ties_percent",
    """
    WITH top_q AS (
      SELECT l_quantity FROM lineitem
      QUALIFY RANK() OVER (ORDER BY l_quantity DESC) <= 20
    ),
    top_p AS (
      SELECT o_totalprice FROM orders
      QUALIFY ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                <= CEIL(COUNT(*) OVER () * 2 / 100.0)
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM top_q) AS n_ties,
      (SELECT CAST(MIN(l_quantity) AS DOUBLE) FROM top_q) AS min_qty,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM top_p) AS n_pct,
      (SELECT CAST(MIN(o_totalprice) AS DOUBLE) FROM top_p) AS min_price
    """,
    tags=("execute-api", "dialect", "tsql", "window"),
    doc=(
        "tsql TOP n WITH TIES and TOP n PERCENT through "
        "execute(dialect='tsql'). Both rewrite onto the QUALIFY "
        "machinery (dialect.py _top_variant_to_qualify): WITH TIES is "
        "RANK() <= n (provably the same set as first-n-plus-ties), "
        "PERCENT is ROW_NUMBER() <= CEILING(COUNT(*) OVER () * n / "
        "100.0) — tsql's ceil-of-percent row count. The reference gets "
        "these through sqlglot (reference core.py:102); l_quantity's "
        "~50 distinct values make the TIES extension load-bearing "
        "(hundreds of rows beyond the nominal 20)."
    ),
)
def q26_execute_top_ties_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    WITH top_q AS (
      SELECT TOP 20 WITH TIES l_quantity
      FROM lineitem ORDER BY l_quantity DESC
    ),
    top_p AS (
      SELECT TOP 2 PERCENT o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM top_q) AS n_ties,
      (SELECT CAST(MIN(l_quantity) AS DOUBLE) FROM top_q) AS min_qty,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM top_p) AS n_pct,
      (SELECT CAST(MIN(o_totalprice) AS DOUBLE) FROM top_p) AS min_price
    """
    return execute(
        sql,
        dialect="tsql",
        tables={
            "lineitem": t(spark, sf_dir, "lineitem"),
            "orders": t(spark, sf_dir, "orders"),
        },
        spark=spark,
    )


@register(
    "q27_execute_qualify_set_op",
    """
    SELECT o_custkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) = 1
    INTERSECT
    SELECT o_custkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) = 1
    ORDER BY o_custkey
    LIMIT 50
    """,
    tags=("execute-api", "dialect", "snowflake", "window", "set-op"),
    doc=(
        "QUALIFY feeding a set operation (the last form the round-3 "
        "verdict listed as raising): customers whose highest-value "
        "order is also their first order, via INTERSECT of two "
        "per-arm QUALIFY filters through execute(dialect='snowflake'). "
        "The rewrite (dialect.py _rewrite_qualify) splits each scope "
        "into set-op arms at depth-0 UNION/INTERSECT/EXCEPT — "
        "distinguished from select-list `* EXCEPT (col)` by lookahead "
        "— and rewrites each arm's QUALIFY independently; the trailing "
        "ORDER BY/LIMIT stays bound to the whole set operation. DuckDB "
        "runs the identical QUALIFY + INTERSECT natively as the oracle."
    ),
)
def q27_execute_qualify_set_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT o_custkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) = 1
    INTERSECT
    SELECT o_custkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) = 1
    ORDER BY o_custkey
    LIMIT 50
    """
    return execute(
        sql,
        dialect="snowflake",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "q30_distinct",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer ORDER BY c_mktsegment, c_nationkey",
    tags=("distinct",),
)
def q30_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


@register(
    "q31_count_distinct",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("aggregate", "count-distinct"),
)
def q31_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q32_in_subquery",
    """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("semi-join", "in-subquery"),
)
def q32_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select("c_custkey")
    orders = t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(rich), orders.o_custkey == rich.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


@register(
    "q33_window_topk_per_group",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             ) AS rn
      FROM lineitem
    ) ranked
    WHERE rn <= 3
    ORDER BY l_suppkey, rn
    """,
    tags=("window", "topk"),
)
def q33_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("l_suppkey", "rn")
    )


@register(
    "q34_window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def q34_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "q35_window_lag_gap",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
             LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
    tags=("window", "lag"),
)
def q35_window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("bigint").alias("days_since_prev"),
    )


@register(
    "q36_union_all",
    """
    SELECT o_custkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_custkey, 'high' AS src FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    tags=("set-op",),
)
def q36_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey", F.lit("urgent").alias("src")
    )
    b = orders.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_custkey", F.lit("high").alias("src")
    )
    return a.unionAll(b)


@register(
    "q37_union_distinct",
    """
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    tags=("set-op",),
)
def q37_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    return a.union(b).distinct()


@register(
    "q38_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    tags=("set-op",),
)
def q38_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return a.intersect(b)


@register(
    "q39_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    tags=("set-op", "anti-join"),
)
def q39_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey")
        .subtract(t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey")))
    )


@register(
    "q40_rollup",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {dsum}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """.format(dsum=sql_dsum("l_quantity", "sum_qty")),
    tags=("rollup",),
)
def q40_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "q41_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("cube",),
)
def q41_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "q42_cross_join",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
    tags=("cross-join",),
)
def q42_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "region")
        .select("r_name")
        .crossJoin(t(spark, sf_dir, "nation").select("n_name"))
        .orderBy("r_name", "n_name")
    )


@register(
    "q43_substring_extract",
    """
    SELECT substring(c_name, 1, 9) AS name_prefix,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           COUNT(*) AS n
    FROM customer JOIN orders ON c_custkey = o_custkey
    WHERE c_custkey < 100
    GROUP BY name_prefix, o_year, o_month
    ORDER BY o_year, o_month, name_prefix
    """,
    tags=("string", "extract"),
)
def q43_substring_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return (
        cust.join(t(spark, sf_dir, "orders"), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.substring("c_name", 1, 9).alias("name_prefix"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.month("o_orderdate").cast("bigint").alias("o_month"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_year", "o_month", "name_prefix")
    )


@register(
    "q48_pagination_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    tags=("sort", "limit", "offset"),
    doc=(
        "Keyset-free pagination: ORDER BY + LIMIT/OFFSET (no OFFSET "
        "exists anywhere in the reference, SURVEY §2.2). Note OFFSET "
        "still sorts the full prefix — deep pagination at 100 TB should "
        "use keyset predicates (WHERE sortkey < last_seen) instead."
    ),
)
def q48_pagination_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(40)
        .limit(20)
    )


@register(
    "q59_date_arithmetic",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)) AS BIGINT)
             AS total_wait_days,
           CAST(SUM(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS shipped_fast
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("date-arithmetic", "aggregate"),
    doc="datediff/date_add coverage: order-to-ship wait days and a fast-ship flag.",
)
def q59_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.datediff("l_shipdate", "o_orderdate").cast("bigint"))
            .cast("bigint")
            .alias("total_wait_days"),
            # timestamp-preserving +60 days (not F.date_add, which
            # truncates the TIMESTAMP to DATE first): the oracle's
            # `+ INTERVAL 60 DAY` keeps the time-of-day component, and
            # the columns are timestamp[us] — equal only by accident of
            # midnight-aligned testdata otherwise.
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("shipped_fast"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q44_sort_mixed_nulls",
    """
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_np, o_totalprice
    FROM orders
    ORDER BY status_np NULLS FIRST, o_totalprice DESC NULLS LAST, o_orderkey
    LIMIT 50
    """,
    tags=("sort", "nulls"),
    doc="Mixed per-key NULLS FIRST/LAST — reference raises on this (executor.py:499-502).",
)
def q44_sort_mixed_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_np").asc_nulls_first(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc(),
        )
        .limit(50)
    )


@register(
    "q45_execute_api_sql",
    """
    SELECT c_mktsegment, COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'O'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("execute-api",),
    doc=(
        "Runs through the engine's execute() entry point (reference "
        "core.py:50 parity path): same SQL text as the oracle, duckdb "
        "dialect, tables registered from parquet."
    ),
)
def q45_execute_api_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT c_mktsegment, COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'O'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """
    return execute(
        sql,
        dialect="duckdb",
        tables={
            "orders": t(spark, sf_dir, "orders"),
            "customer": t(spark, sf_dir, "customer"),
        },
        spark=spark,
    )


_Q49_SQL = """
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
      FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    ORDER BY c_custkey
    LIMIT 100
"""


@register(
    "q49_correlated_subquery",
    _Q49_SQL,
    tags=("execute-api", "scalar-subquery", "correlated"),
    doc=(
        "Correlated scalar subquery through the engine's execute() SQL "
        "path — Catalyst decorrelates it into an aggregate + join (the "
        "rewrite the reference delegates to SQLGlot, SURVEY §4.1). "
        "Identical SQL text runs on both engines; exact decimal "
        "arithmetic keeps the > comparison boundary bit-stable."
    ),
)
def q49_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return execute(
        _Q49_SQL,
        dialect="duckdb",
        tables={
            "customer": t(spark, sf_dir, "customer"),
            "orders": t(spark, sf_dir, "orders"),
        },
        spark=spark,
    )


@register(
    "q46_grouping_sets",
    """
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
    tags=("grouping-sets",),
)
def q46_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
        """
    )


@register(
    "q86_window_frames",
    """
    SELECT c_custkey, c_mktsegment,
           first_value(c_acctbal) OVER w AS seg_lo_bal,
           last_value(c_acctbal) OVER w AS seg_hi_bal,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY c_mktsegment, c_acctbal, c_custkey
    """,
    tags=("window", "frames"),
    doc=(
        "Explicit window frames: first_value/last_value over an unbounded "
        "ROWS frame plus percent_rank/cume_dist, totally ordered inside "
        "each segment by (acctbal, custkey) so every output is "
        "deterministic. The reference has no window support at all "
        "(SURVEY §2.6). Single shuffle on the partition key."
    ),
)
def q86_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.first("c_acctbal").over(w).alias("seg_lo_bal"),
            F.last("c_acctbal").over(w).alias("seg_hi_bal"),
            F.percent_rank().over(
                W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
            ).alias("pr"),
            F.cume_dist().over(
                W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
            ).alias("cd"),
        )
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
    )


@register(
    "q87_conditional_funcs",
    f"""
    SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_class,
           COUNT(*) AS n,
           {sql_dsum("LEAST(GREATEST(o_totalprice, 1000.0), 200000.0)", "capped_total")}
    FROM orders
    GROUP BY status_class
    ORDER BY status_class
    """,
    tags=("scalar", "conditional"),
    doc=(
        "Conditional scalar functions — COALESCE / NULLIF / GREATEST / "
        "LEAST — all of which raise UnsupportedError in the reference's "
        "16-operator expression runtime (SURVEY §2.3). Pure map-side "
        "expressions inside whole-stage codegen."
    ),
)
def q87_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    capped = F.least(F.greatest(F.col("o_totalprice"), F.lit(1000.0)), F.lit(200000.0))
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN"))
    return (
        t(spark, sf_dir, "orders")
        .select(status.alias("status_class"), capped.alias("capped"))
        .groupBy("status_class")
        .agg(F.count(F.lit(1)).alias("n"), dsum("capped", "capped_total"))
        .orderBy("status_class")
    )


@register(
    "q94_not_in_null_semantics",
    """
    SELECT 'has_null_probe' AS label, COUNT(*) AS n
    FROM orders
    WHERE o_custkey NOT IN (
      SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END
      FROM customer
    )
    UNION ALL
    SELECT 'null_free_probe' AS label, COUNT(*) AS n
    FROM orders
    WHERE o_custkey NOT IN (
      SELECT c_custkey FROM customer WHERE c_acctbal >= 0
    )
    ORDER BY label
    """,
    tags=("anti-join", "null-semantics"),
    doc=(
        "ANSI NOT IN three-valued logic, both branches oracle-checked: a "
        "NULL anywhere in the subquery makes NOT IN never-true (0 rows); "
        "the null-free probe behaves as an anti join. The reference's "
        "LEFT JOIN + IS NULL rewrite (SURVEY §8, tpc-h.sql:935-958) gets "
        "the first branch wrong — this engine deliberately follows "
        "ANSI/Catalyst (NullAwareAntiJoin)."
    ),
)
def q94_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT 'has_null_probe' AS label, COUNT(*) AS n
        FROM orders
        WHERE o_custkey NOT IN (
          SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END
          FROM customer
        )
        UNION ALL
        SELECT 'null_free_probe' AS label, COUNT(*) AS n
        FROM orders
        WHERE o_custkey NOT IN (
          SELECT c_custkey FROM customer WHERE c_acctbal >= 0
        )
        ORDER BY label
        """
    )


@register(
    "q95_like_anchored",
    """
    SELECT
      CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS pfx,
      CAST(SUM(CASE WHEN o_orderpriority LIKE '%URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS sfx,
      CAST(SUM(CASE WHEN o_orderpriority LIKE 'URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS exact_only,
      CAST(SUM(CASE WHEN o_orderpriority LIKE '_-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS underscore,
      CAST(SUM(CASE WHEN NULLIF(o_orderstatus, o_orderstatus) LIKE '%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS null_in
    FROM orders
    """,
    tags=("scalar", "like", "null-semantics"),
    doc=(
        "ANSI LIKE semantics, oracle-checked: patterns are anchored "
        "('URGENT' matches only the exact string, not substrings), '_' "
        "is single-char, and a NULL input propagates NULL (counted as 0) "
        "— each the opposite of the reference's unanchored "
        "str.contains(na=True) implementation (SURVEY §8, reference "
        "executor.py:198-201)."
    ),
)
def q95_like_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = F.col("o_orderpriority")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return t(spark, sf_dir, "orders").agg(
        flag(pr.like("1%")).alias("pfx"),
        flag(pr.like("%URGENT")).alias("sfx"),
        flag(pr.like("URGENT")).alias("exact_only"),
        flag(pr.like("_-URGENT")).alias("underscore"),
        flag(F.nullif(F.col("o_orderstatus"), F.col("o_orderstatus")).like("%")).alias("null_in"),
    )


@register(
    "q100_histogram",
    """
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 500000.0 THEN 11
                ELSE CAST(FLOOR((o_totalprice - 0.0) / ((500000.0 - 0.0) / 10)) AS BIGINT) + 1
           END AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("aggregate", "histogram", "profiling"),
    doc=(
        "Equal-width histogram via width_bucket — the single-pass "
        "data-profiling aggregate. DuckDB has no width_bucket, so the "
        "oracle spells out Spark's exact formula "
        "(floor((x-lo)/((hi-lo)/n))+1, clamped to 0 / n+1 outside the "
        "range) — same IEEE ops, so counts and per-bucket min/max are "
        "exact. Map-side partial counts; one tiny shuffle of <= "
        "n_buckets rows per partition regardless of table size."
    ),
)
def q100_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(10)).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "r46_execute_pg_dialect",
    """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST(epoch(MAX(CAST(o_orderdate AS TIMESTAMP))) AS DOUBLE) AS max_epoch
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    tags=("execute-api", "dialect", "postgres"),
    doc=(
        "The reference's headline multi-dialect feature, driver-checked: "
        "postgres-flavored SQL (double-quoted identifiers, :: casts, "
        "EXTRACT(EPOCH FROM ...)) through execute(dialect='postgres') — "
        "the token-stream transpiler (dialect.py) rewrites each "
        "construct to Spark SQL without touching literals; the oracle "
        "states the same semantics in DuckDB's own dialect."
    ),
)
def r46_execute_pg_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = '''
    SELECT "o_orderpriority" AS priority,
           COUNT(*) AS n,
           EXTRACT(EPOCH FROM MAX(o_orderdate::timestamp)) AS max_epoch
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY "o_orderpriority"
    ORDER BY priority
    '''
    return execute(
        sql,
        dialect="postgres",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "r47_execute_tsql_dialect",
    """
    SELECT c_custkey, c_name, CAST(length(c_mktsegment) AS BIGINT) AS seg_len
    FROM customer
    ORDER BY c_custkey
    LIMIT 10
    """,
    tags=("execute-api", "dialect", "tsql"),
    doc=(
        "tsql-flavored SQL ([bracket] identifiers, TOP n, LEN()) through "
        "execute(dialect='tsql'): the fallback transpiler turns TOP 10 "
        "into a trailing LIMIT (the silent-row-drop bug class the round-1 "
        "advice flagged, now driver-checked), brackets into backticks, "
        "LEN into LENGTH."
    ),
)
def r47_execute_tsql_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT TOP 10 [c_custkey], [c_name], CAST(LEN([c_mktsegment]) AS BIGINT) AS seg_len
    FROM customer
    ORDER BY [c_custkey]
    """
    return execute(
        sql,
        dialect="tsql",
        tables={"customer": t(spark, sf_dir, "customer")},
        spark=spark,
    )


@register(
    "r81_execute_mysql_dialect",
    """
    SELECT c_custkey AS k, c_name, c_acctbal AS bal
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
    ORDER BY k
    LIMIT 10 OFFSET 5
    """,
    tags=("execute-api", "dialect", "mysql"),
    doc=(
        "mysql-flavored SQL (backtick identifiers, IFNULL, the "
        "comma-form `LIMIT offset, count`) through "
        "execute(dialect='mysql'): the fallback transpiler rewrites the "
        "comma LIMIT to LIMIT count OFFSET offset; backticks and IFNULL "
        "are Spark-native and pass through. Completes driver-checked "
        "coverage of the three fallback dialect families (pg r46, tsql "
        "r47, mysql here)."
    ),
)
def r81_execute_mysql_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT `c_custkey` AS k, `c_name` AS c_name, IFNULL(`c_acctbal`, 0.0) AS bal
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
    ORDER BY k
    LIMIT 5, 10
    """
    return execute(
        sql,
        dialect="mysql",
        tables={"customer": t(spark, sf_dir, "customer")},
        spark=spark,
    )


@register(
    "s32_execute_snowflake_dialect",
    """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST((YEAR(MAX(o_orderdate)) * 12 + MONTH(MAX(o_orderdate)))
              - (YEAR(MIN(o_orderdate)) * 12 + MONTH(MIN(o_orderdate))) AS BIGINT) AS span_months,
           CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                          CAST(MAX(o_orderdate) AS DATE)) AS BIGINT) AS span_days,
           CASE WHEN COUNT(*) > 100 THEN 'big' ELSE 'small' END AS bucket,
           CAST(round(MAX(o_totalprice), 2) AS DECIMAL(18,2)) AS max_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    tags=("execute-api", "dialect", "snowflake"),
    doc=(
        "Snowflake-flavored SQL through execute(dialect='snowflake') "
        "with NO sqlglot installed: double-quoted identifiers, IFF, "
        "DATEDIFF(month|day, a, b) with snowflake's boundary-crossing "
        "semantics (NOT elapsed complete units — the fallback rewrites "
        "each unit to exact calendar-index/truncated-date arithmetic), "
        "and TO_NUMBER(x, p, s) as a DECIMAL cast. The reference gets "
        "snowflake via sqlglot (reference core.py:102); this is the "
        "sqlglot-free parity path, driver-value-checked against a "
        "DuckDB oracle stating the same semantics natively."
    ),
)
def s32_execute_snowflake_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = '''
    SELECT "o_orderpriority" AS priority,
           COUNT(*) AS n,
           CAST(DATEDIFF(month, MIN(o_orderdate), MAX(o_orderdate)) AS BIGINT) AS span_months,
           CAST(DATEDIFF(dd, MIN(o_orderdate), MAX(o_orderdate)) AS BIGINT) AS span_days,
           IFF(COUNT(*) > 100, 'big', 'small') AS bucket,
           TO_NUMBER(ROUND(MAX(o_totalprice), 2), 18, 2) AS max_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY "o_orderpriority"
    ORDER BY priority
    '''
    return execute(
        sql,
        dialect="snowflake",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "s33_execute_bigquery_dialect",
    """
    SELECT l_returnflag AS flag,
           COUNT(*) AS n,
           TRY_CAST(l_returnflag AS BIGINT) AS flag_as_int,
           CAST(100.0 AS DOUBLE) / COUNT(*) AS inv_rate,
           CAST(NULL AS DOUBLE) AS div0
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY flag
    """,
    tags=("execute-api", "dialect", "bigquery"),
    doc=(
        "BigQuery-flavored SQL through execute(dialect='bigquery') with "
        "NO sqlglot installed: SAFE_CAST -> TRY_CAST (NULL on bad "
        "input, never an error), SAFE_DIVIDE -> TRY_DIVIDE (NULL on "
        "division by zero), INT64/FLOAT64 type keywords -> Spark "
        "BIGINT/DOUBLE. Division inputs are exact integers so the "
        "double quotient is bit-identical cross-engine; the DuckDB "
        "oracle states the same semantics natively (TRY_CAST, NULL)."
    ),
)
def s33_execute_bigquery_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT l_returnflag AS flag,
           COUNT(*) AS n,
           SAFE_CAST(l_returnflag AS INT64) AS flag_as_int,
           SAFE_DIVIDE(100.0, CAST(COUNT(*) AS FLOAT64)) AS inv_rate,
           SAFE_DIVIDE(CAST(COUNT(*) AS FLOAT64), 0) AS div0
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY flag
    """
    return execute(
        sql,
        dialect="bigquery",
        tables={"lineitem": t(spark, sf_dir, "lineitem")},
        spark=spark,
    )


@register(
    "s35_apply_changeset",
    """
    WITH snap AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    changes AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0 AS o_totalprice, 'U' AS op
      FROM snap WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice, 'D' FROM snap WHERE o_orderkey % 10 = 1
      UNION ALL
      SELECT -o_orderkey, 'N', o_totalprice, 'I' FROM snap WHERE o_orderkey % 10 = 2
    ),
    kept AS (
      SELECT s.* FROM snap s
      WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = s.o_orderkey)
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM kept
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM changes WHERE op IN ('I', 'U')
    ORDER BY o_orderkey
    """,
    tags=("cdc", "merge", "upsert"),
    doc=(
        "MERGE-style changeset apply (operators/temporal.apply_changeset): "
        "a CDC batch of updates/deletes/inserts folds into a snapshot as "
        "keep (anti join) + apply (union) — the batch equivalent of MERGE "
        "INTO without a table format that supports it. The changeset side "
        "is the only thing shuffled; the snapshot sees one broadcastable "
        "anti join, so a daily batch against a 100 TB table never "
        "shuffles the table. Changes are derived deterministically from "
        "orders (key % 10: 0=update +1.0, 1=delete, 2=insert negated "
        "key), so the DuckDB oracle replays the same merge relationally."
    ),
)
def s35_apply_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import apply_changeset

    snap = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    changes = (
        snap.filter(k % 10 == 0)
        .select(k.alias("o_orderkey"), "o_orderstatus",
                (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
                F.lit("U").alias("op"))
        .unionByName(
            snap.filter(k % 10 == 1).select(
                "o_orderkey", "o_orderstatus", "o_totalprice", F.lit("D").alias("op")
            )
        )
        .unionByName(
            snap.filter(k % 10 == 2).select(
                (-k).alias("o_orderkey"), F.lit("N").alias("o_orderstatus"),
                "o_totalprice", F.lit("I").alias("op"),
            )
        )
    )
    return apply_changeset(
        snap, changes, ["o_orderkey"], broadcast_changes=True
    ).orderBy("o_orderkey")


@register(
    "r48_dq_checks",
    """
    WITH report AS (
      SELECT 'enum_orderstatus' AS check_name,
             (SELECT COUNT(*) FROM orders
              WHERE NOT COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE)) AS n_violations
      UNION ALL
      SELECT 'fk_lineitem_orderkey',
             (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))
      UNION ALL
      SELECT 'null_custkey',
             (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
      UNION ALL
      SELECT 'pk_orders_unique',
             (SELECT COUNT(*) FROM (
                SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
      UNION ALL
      SELECT 'range_totalprice_positive',
             (SELECT COUNT(*) FROM orders WHERE NOT COALESCE(o_totalprice > 0, FALSE))
    )
    SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
    FROM report
    ORDER BY check_name
    """,
    tags=("quality", "dq", "anti-join"),
    doc=(
        "Declarative data-quality audit (operators/quality.dq_report): "
        "PK uniqueness (dup-key aggregation), FK integrity "
        "(lineitem->orders anti-join, no pair explosion), null check, "
        "value-range and enum-domain predicates (NULL counts as a "
        "violation, ANSI-safe) — rolled into one |checks|-row report. "
        "Each check is an independent pushed-down scan+aggregate; the "
        "publish-gate every production table pipeline runs."
    ),
)
def r48_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import dq_report, duplicate_keys, failing, null_rows, orphans

    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    return dq_report(
        {
            "pk_orders_unique": duplicate_keys(orders, ["o_orderkey"]),
            "fk_lineitem_orderkey": orphans(lineitem, orders, "l_orderkey", "o_orderkey"),
            "null_custkey": null_rows(orders, "o_custkey"),
            "range_totalprice_positive": failing(orders, F.col("o_totalprice") > 0),
            "enum_orderstatus": failing(orders, F.col("o_orderstatus").isin("O", "F", "P")),
        }
    )


@register(
    "r49_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < DATE '1997-01-01'
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
    ),
    diff AS (
      SELECT CASE
               WHEN o.o_orderkey IS NULL THEN 'inserted'
               WHEN n.o_orderkey IS NULL THEN 'deleted'
               WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
               ELSE 'unchanged'
             END AS change_type
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT change_type, COUNT(*) AS n
    FROM diff
    GROUP BY change_type
    ORDER BY change_type
    """,
    tags=("cdc", "snapshot-diff", "full-outer"),
    doc=(
        "Snapshot diff / CDC derivation: two versions of a table "
        "(date-sliced here) compared by primary key with one full-outer "
        "join — inserted / deleted / changed / unchanged classification "
        "with NULL-safe column comparison (IS DISTINCT FROM == "
        "eqNullSafe). The standard way to derive a changelog between "
        "warehouse snapshots when the source has none; one key-hashed "
        "Exchange per side, AQE handles size asymmetry."
    ),
)
def r49_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("date")).select(
        F.col("o_orderkey").alias("k_old"),
        F.col("o_orderstatus").alias("s_old"),
        F.col("o_totalprice").alias("p_old"),
    )
    new = orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")).select(
        F.col("o_orderkey").alias("k_new"),
        F.col("o_orderstatus").alias("s_new"),
        F.col("o_totalprice").alias("p_new"),
    )
    joined = old.join(new, F.col("k_old") == F.col("k_new"), "full_outer")
    change = (
        F.when(F.col("k_old").isNull(), "inserted")
        .when(F.col("k_new").isNull(), "deleted")
        .when(
            ~F.col("s_old").eqNullSafe(F.col("s_new"))
            | ~F.col("p_old").eqNullSafe(F.col("p_new")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        joined.select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change_type")
    )


def _pagerank_oracle(n_iter: int = 2, damping: float = 0.85) -> str:
    # constants spelled as exact double literals (repr) with explicit
    # DOUBLE casts — DuckDB would otherwise parse 0.85 as DECIMAL and
    # diverge from Spark's float arithmetic in the last bits.
    d = f"CAST({damping!r} AS DOUBLE)"
    one_minus_d = f"CAST({(1.0 - damping)!r} AS DOUBLE)"
    parts = [
        """base AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )""",
        # integer node ids on the hot path (even = customer 2k,
        # odd = supplier 2k+1) — int shuffles hash/compare far cheaper
        # than strings; names materialize only for the final 20 rows
        """edges AS (
      SELECT 2 * c AS src, 2 * s + 1 AS dst FROM base
      UNION ALL
      SELECT 2 * s + 1, 2 * c FROM base
    )""",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM deg)",
        "pr0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM deg CROSS JOIN nn)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"""pr{i} AS (
      SELECT e.dst AS id,
             {one_minus_d} / MAX(x.n) + {d} * (CAST(SUM(CAST(floor(p.pr / dg.deg * 1e18) AS HUGEINT)) AS DOUBLE) / 1e18) AS pr
      FROM edges e
      JOIN pr{i-1} p ON p.id = e.src
      JOIN deg dg ON dg.src = e.src
      CROSS JOIN nn x
      GROUP BY e.dst
    )"""
        )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT CASE WHEN id % 2 = 0 THEN 'c' || (id // 2)
                ELSE 's' || ((id - 1) // 2) END AS id,
           pr
    FROM pr{n_iter}
    ORDER BY pr DESC, id
    LIMIT 20
    """


@register(
    "r74_pagerank",
    _pagerank_oracle(n_iter=2, damping=0.85),
    tags=("graph", "pagerank", "iterative"),
    doc=(
        "PageRank (operators/graph.pagerank) over the symmetric "
        "customer-supplier bipartite graph derived from lineitem x "
        "orders: fixed 2-iteration dataflow, rank tables persisted per "
        "iteration, node count via one-row broadcast (no driver "
        "count()), contributions floor-quantized to 1e-18 grains and "
        "summed as exact integers so ranks are partition-order-"
        "independent (floor, unlike double->decimal casts, rounds "
        "identically in every engine). The oracle "
        "replays both iterations CTE-by-CTE with the same exact-decimal "
        "rule — top-20 ranked nodes bit-match. With connected "
        "components and k-means this completes the iterative-algorithm "
        "family (graph centrality / clustering / training) as pure "
        "relational dataflow."
    ),
)
def r74_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    base = (
        t(spark, sf_dir, "lineitem")
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (2 * F.col("o_custkey")).alias("cnode"),
            (2 * F.col("l_suppkey") + 1).alias("snode"),
        )
        .distinct()
    )
    # symmetrize with one explode, not a self-union — a union would scan
    # (and re-run the join+distinct of) `base` once per direction
    edges = base.select(
        F.explode(
            F.array(
                F.struct(F.col("cnode").alias("src"), F.col("snode").alias("dst")),
                F.struct(F.col("snode").alias("src"), F.col("cnode").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    name = F.when(
        F.col("id") % 2 == 0, F.concat(F.lit("c"), (F.col("id") / 2).cast("bigint"))
    ).otherwise(F.concat(F.lit("s"), ((F.col("id") - 1) / 2).cast("bigint")))
    return (
        pagerank(edges, n_iter=2, damping=0.85, symmetric=True)
        .select(name.alias("id"), "pr")
        .orderBy(F.desc("pr"), "id")
        .limit(20)
    )


@register(
    "s12_revenue_pareto",
    """
    WITH rev AS (
      SELECT c.c_nationkey, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS r
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
      SELECT c_nationkey, r,
             SUM(r) OVER (PARTITION BY c_nationkey ORDER BY r DESC, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(r) OVER (PARTITION BY c_nationkey) AS total,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      FROM rev
    )
    SELECT c_nationkey,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(CAST(MAX(total) AS DECIMAL(18,6)) AS DOUBLE) AS total_revenue,
           CAST(SUM(CASE WHEN 5 * (cum - r) < 4 * total THEN 1 ELSE 0 END) AS BIGINT)
             AS head80_customers
    FROM ranked
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("relational", "pareto", "concentration"),
    doc=(
        "Pareto concentration audit per nation: how many top customers "
        "cover 80% of revenue (min k with 5*cumsum(k) >= 4*total, "
        "counted as ranks whose preceding cumulative is under the "
        "threshold — the r95 head-mass rule on money). All "
        "comparisons are exact-decimal integer-scaled, so the head "
        "count is bit-stable at any partition order. The two windows "
        "share one nation-hash Exchange and sort only per-nation "
        "customer aggregates, never raw orders; the same shape answers "
        "'how concentrated is token mass over sources' in a corpus."
    ),
)
def s12_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("r"))
    )
    w_cum = (
        W.partitionBy("c_nationkey")
        .orderBy(F.desc("r"), "o_custkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = rev.select(
        "c_nationkey",
        "r",
        F.sum("r").over(w_cum).alias("cum"),
        F.sum("r").over(W.partitionBy("c_nationkey")).alias("total"),
        F.count(F.lit(1)).over(W.partitionBy("c_nationkey")).alias("n"),
    )
    return (
        ranked.groupBy("c_nationkey")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.max("total").cast("decimal(18,6)").cast("double").alias("total_revenue"),
            F.sum(
                F.when(5 * (F.col("cum") - F.col("r")) < 4 * F.col("total"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("head80_customers"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "s13_join_key_skew_audit",
    """
    WITH k AS (
      SELECT 'orders.o_custkey' AS key_col, o_custkey AS key FROM orders
      UNION ALL
      SELECT 'lineitem.l_partkey', l_partkey FROM lineitem
    ),
    counts AS (
      SELECT key_col, key, COUNT(*) AS n FROM k GROUP BY key_col, key
    ),
    ranked AS (
      SELECT key_col, n,
             ROW_NUMBER() OVER (PARTITION BY key_col ORDER BY n, key) AS rnk,
             COUNT(*) OVER (PARTITION BY key_col) AS nd,
             SUM(n) OVER (PARTITION BY key_col) AS total
      FROM counts
    )
    SELECT key_col,
           CAST(MAX(total) AS BIGINT) AS n_rows,
           CAST(MAX(nd) AS BIGINT) AS n_distinct,
           CAST(MAX(n) AS BIGINT) AS max_per_key,
           CAST(MAX(CASE WHEN rnk = CAST(ceil(0.99 * nd) AS BIGINT) THEN n END) AS BIGINT)
             AS p99_per_key,
           CAST(MAX(n) AS DOUBLE) / MAX(total) AS top_key_share
    FROM ranked
    GROUP BY key_col
    ORDER BY key_col
    """,
    tags=("relational", "skew", "diagnostics"),
    doc=(
        "Pre-join skew diagnosis — the audit run BEFORE shuffling 100 TB "
        "on a key: per join column, total rows, distinct keys, the "
        "hottest key's row count, the discrete p99 per-key count (rank-"
        "based, interpolation-free), and the hottest key's share of all "
        "rows. Reads feed the decision between a plain shuffle join, "
        "operators/skew.salted_join, or a broadcast. One keyed count "
        "per column (map-side combined), then windows over the "
        "key-cardinality table only — the fact tables are scanned once "
        "with a single projected column each."
    ),
)
def s13_join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = (
        t(spark, sf_dir, "orders")
        .select(F.lit("orders.o_custkey").alias("key_col"), F.col("o_custkey").alias("key"))
        .unionByName(
            t(spark, sf_dir, "lineitem").select(
                F.lit("lineitem.l_partkey").alias("key_col"),
                F.col("l_partkey").alias("key"),
            )
        )
    )
    counts = k.groupBy("key_col", "key").agg(F.count(F.lit(1)).alias("n"))
    ranked = counts.select(
        "key_col",
        "n",
        F.row_number().over(W.partitionBy("key_col").orderBy("n", "key")).alias("rnk"),
        F.count(F.lit(1)).over(W.partitionBy("key_col")).alias("nd"),
        F.sum("n").over(W.partitionBy("key_col")).alias("total"),
    )
    return (
        ranked.groupBy("key_col")
        .agg(
            F.max("total").cast("bigint").alias("n_rows"),
            F.max("nd").cast("bigint").alias("n_distinct"),
            F.max("n").cast("bigint").alias("max_per_key"),
            F.max(
                F.when(
                    F.col("rnk") == F.ceil(F.lit(0.99) * F.col("nd")).cast("bigint"),
                    F.col("n"),
                )
            )
            .cast("bigint")
            .alias("p99_per_key"),
            (F.max("n").cast("double") / F.max("total")).alias("top_key_share"),
        )
        .orderBy("key_col")
    )


@register(
    "s14_set_ops_all",
    """
    WITH w1 AS (
      SELECT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
    ),
    w2 AS (
      SELECT user_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
    ),
    both_halves AS (SELECT * FROM w1 INTERSECT ALL SELECT * FROM w2),
    only_first AS (SELECT * FROM w1 EXCEPT ALL SELECT * FROM w2)
    SELECT 'intersect_all' AS op, event_type, COUNT(*) AS n
    FROM both_halves GROUP BY event_type
    UNION ALL
    SELECT 'except_all', event_type, COUNT(*) FROM only_first GROUP BY event_type
    ORDER BY op, event_type
    """,
    tags=("relational", "set-ops", "multiset"),
    doc=(
        "Multiset set operations — INTERSECT ALL keeps min(m1, m2) "
        "copies per row, EXCEPT ALL keeps m1 - m2 — comparing the "
        "(user, event_type) bags of the month's two halves. The ALL "
        "variants are real operators, not DISTINCT shortcuts: Spark "
        "plans them as a single aggregation computing per-row "
        "multiplicities on both sides (one shuffle on the full row "
        "key), exactly the multiset algebra a dedup-aware diff needs. "
        "Complements q38/q39's DISTINCT set ops."
    ),
)
def s14_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    w1 = ev.filter(F.col("ts") < cutoff).select("user_id", "event_type")
    w2 = ev.filter(F.col("ts") >= cutoff).select("user_id", "event_type")
    inter = (
        w1.intersectAll(w2)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "event_type", "n")
    )
    exc = (
        w1.exceptAll(w2)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "event_type", "n")
    )
    return inter.unionByName(exc).orderBy("op", "event_type")


@register(
    "s15_range_frame_window",
    """
    WITH priced AS (
      SELECT event_id, event_type, epoch_us(ts) AS tus, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS trailing_n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS trailing_avg
    FROM priced
    WINDOW w AS (PARTITION BY event_type ORDER BY tus
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tags=("relational", "window", "range-frame"),
    doc=(
        "Value-based RANGE window frame: each purchase's trailing-hour "
        "same-type average, where the frame is defined by the TIME "
        "DISTANCE (microsecond epoch within 3.6e9) rather than a row "
        "count — the semantics ROWS frames cannot express when events "
        "arrive irregularly. RANGE includes all time-peers of the "
        "current row symmetrically in both engines, so ties need no "
        "breaking; frame sums accumulate in exact decimal (the r56 "
        "discipline) making each frame's average partition-order-"
        "independent. The window partitions by event_type — sorts "
        "spread across the cluster, no global single-partition window."
    ),
)
def s15_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    priced = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("tus"),
            "value",
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("tus")
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return priced.select(
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("trailing_n"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("trailing_avg"),
    ).orderBy("event_id")


@register(
    "s16_execute_qualify_dialect",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    QUALIFY rn <= 2
    ORDER BY o_orderpriority, rn
    """,
    tags=("execute-api", "dialect", "qualify"),
    doc=(
        "duckdb/snowflake QUALIFY through execute(dialect='duckdb'): "
        "Spark has no QUALIFY clause, so the token-stream transpiler "
        "hoists the post-window predicate into the projection and "
        "filters one level up (SELECT * EXCEPT(__qualify) FROM (...) "
        "WHERE __qualify) — semantics pinned by DuckDB executing the "
        "IDENTICAL QUALIFY text natively as the oracle. Top-2 orders "
        "per priority: the window partitions by priority, and Catalyst "
        "collapses the wrapper projection, so the rewritten plan equals "
        "the hand-written subquery form."
    ),
)
def s16_execute_qualify_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    QUALIFY rn <= 2
    ORDER BY o_orderpriority, rn
    """
    return execute(
        sql,
        dialect="duckdb",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "s17_grouping_flags",
    f"""
    SELECT CAST(GROUPING(event_type) AS BIGINT) AS g_type,
           CAST(GROUPING(hr) AS BIGINT) AS g_hr,
           event_type,
           hr,
           COUNT(*) AS n,
           {sql_dsum('value', 'total_value')}
    FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, value FROM events)
    GROUP BY GROUPING SETS ((event_type, hr), (event_type), (hr), ())
    ORDER BY g_type, g_hr, event_type NULLS FIRST, hr NULLS FIRST
    """,
    tags=("relational", "grouping-sets", "grouping-id"),
    doc=(
        "GROUPING() flags over four grouping sets — the bit that "
        "distinguishes 'aggregated over this column' from 'column is "
        "genuinely NULL', which q40/q41's plain rollups cannot express "
        "and every OLAP cube consumer needs. Spark evaluates all sets "
        "in one Expand + single hash aggregation (rows amplified 4x "
        "map-side, partials combined before the one shuffle); flags "
        "cast to BIGINT for cross-engine hashing."
    ),
)
def s17_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("bigint").alias("hr"), "value"
    )
    base.createOrReplaceTempView("s17_base")
    return spark.sql(
        """
        SELECT CAST(GROUPING(event_type) AS BIGINT) AS g_type,
               CAST(GROUPING(hr) AS BIGINT) AS g_hr,
               event_type,
               hr,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM s17_base
        GROUP BY GROUPING SETS ((event_type, hr), (event_type), (hr), ())
        ORDER BY g_type, g_hr, event_type NULLS FIRST, hr NULLS FIRST
        """
    )


@register(
    "s26_revenue_hhi",
    """
    WITH rev AS (
      SELECT c.c_nationkey, o.o_custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS r
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ),
    tot AS (
      SELECT c_nationkey, CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM rev GROUP BY c_nationkey
    )
    SELECT rev.c_nationkey,
           CAST(MAX(tot.n) AS BIGINT) AS n_customers,
           CAST(SUM(CAST((rev.r / tot.total) * (rev.r / tot.total)
                         AS DECIMAL(28,12))) AS DOUBLE) AS hhi
    FROM rev JOIN tot ON tot.c_nationkey = rev.c_nationkey
    GROUP BY rev.c_nationkey
    ORDER BY rev.c_nationkey
    """,
    tags=("relational", "concentration", "hhi"),
    doc=(
        "Herfindahl-Hirschman concentration index per nation: the sum "
        "of squared customer revenue shares — 1/n for perfectly even "
        "revenue, 1.0 for a single-customer nation — the continuous "
        "complement of s12's head-count Pareto rule (and, over corpus "
        "sources, the mixture-diversity number a data-curation review "
        "quotes). Shares divide two identically-derived exact-decimal "
        "doubles, each squared share is rounded to DECIMAL(28,12) "
        "before summation (r59 discipline) so the index is partition-"
        "order-independent; per-nation totals broadcast back onto the "
        "per-customer aggregate, which reuses the same nation-keyed "
        "Exchange."
    ),
)
def s26_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("r"))
    )
    tot = rev.groupBy("c_nationkey").agg(
        F.sum(F.col("r").cast("decimal(18,6)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    share = F.col("r") / F.col("total")
    return (
        rev.join(F.broadcast(tot), "c_nationkey")
        .groupBy("c_nationkey")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.sum((share * share).cast("decimal(28,12)")).cast("double").alias("hhi"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "s27_join_size_estimate",
    """
    WITH oa AS (
      SELECT d, bucket, COUNT(*) AS cnt FROM (
        SELECT u.d,
               ('0x' || substring(md5(u.d::VARCHAR || '#' || o_custkey::VARCHAR), 1, 8))::BIGINT
                 % 512 AS bucket
        FROM orders, UNNEST([0, 1, 2, 3]) AS u(d)
      ) GROUP BY d, bucket
    ),
    cb AS (
      SELECT d, bucket, COUNT(*) AS cnt FROM (
        SELECT u.d,
               ('0x' || substring(md5(u.d::VARCHAR || '#' || c_custkey::VARCHAR), 1, 8))::BIGINT
                 % 512 AS bucket
        FROM customer, UNNEST([0, 1, 2, 3]) AS u(d)
      ) GROUP BY d, bucket
    ),
    est AS (
      SELECT MIN(dot) AS est_rows FROM (
        SELECT oa.d, CAST(SUM(oa.cnt * cb.cnt) AS BIGINT) AS dot
        FROM oa JOIN cb ON cb.d = oa.d AND cb.bucket = oa.bucket
        GROUP BY oa.d
      )
    ),
    exact AS (
      SELECT COUNT(*) AS true_rows
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT CAST(est.est_rows AS BIGINT) AS est_rows,
           CAST(exact.true_rows AS BIGINT) AS true_rows
    FROM est CROSS JOIN exact
    """,
    tags=("relational", "sketches", "cardinality-estimation"),
    doc=(
        "Join-size estimation from count-min sketches: the inner "
        "product of the two key-frequency sketches (per depth, sum of "
        "bucket-count products; min over depths) upper-bounds "
        "|orders JOIN customer| — the statistic a cost-based planner "
        "wants BEFORE committing to a join strategy, computed from two "
        "depth x width summaries instead of the tables themselves. "
        "Both sketches are md5-portable (operators/sketches grid "
        "arithmetic, replicated exactly by the oracle), the estimate "
        "is integer-exact, and the exact join count rides along so the "
        "oracle also pins the overcount-only property end-to-end. At "
        "100 TB the sketches are built incrementally (they merge by "
        "cnt addition) and the estimate costs a 512x4-row join."
    ),
)
def s27_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import countmin_sketch

    oa = countmin_sketch(
        t(spark, sf_dir, "orders").select(F.col("o_custkey").cast("string").alias("k")),
        "k",
        depth=4,
        width=512,
    )
    cb = countmin_sketch(
        t(spark, sf_dir, "customer").select(F.col("c_custkey").cast("string").alias("k")),
        "k",
        depth=4,
        width=512,
    )
    dots = (
        oa.alias("a")
        .join(cb.alias("b"), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("bigint").alias("dot"))
    )
    est = dots.agg(F.min("dot").cast("bigint").alias("est_rows"))
    exact = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_rows"))
    )
    return est.crossJoin(exact)


@register(
    "s29_null_safe_join",
    """
    WITH keyed AS (
      SELECT NULLIF(event_type, 'error') AS k, value FROM events
    ),
    dim AS (
      SELECT DISTINCT NULLIF(event_type, 'error') AS k,
             COALESCE(NULLIF(event_type, 'error'), 'quarantine') AS label
      FROM events
    )
    SELECT d.label, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM keyed e JOIN dim d ON e.k IS NOT DISTINCT FROM d.k
    GROUP BY d.label
    ORDER BY d.label
    """,
    tags=("relational", "join", "null-semantics"),
    doc=(
        "Null-safe equi-join: Spark's <=> (eqNullSafe) against DuckDB's "
        "IS NOT DISTINCT FROM — the NULL key group joins its NULL "
        "dimension row instead of silently dropping, the semantics a "
        "quarantine/unknown-bucket routing join needs (an ordinary "
        "equi-join loses every NULL-keyed fact row). Catalyst still "
        "plans a hash join (null-safe equality is a valid hash key "
        "via coalesce-tagging), so this costs one keyed shuffle, not "
        "a nested loop."
    ),
)
def s29_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error"))
    keyed = ev.select(k.alias("k"), "value")
    dim = (
        ev.select(k.alias("k"))
        .distinct()
        .select("k", F.coalesce("k", F.lit("quarantine")).alias("label"))
    )
    return (
        keyed.join(F.broadcast(dim), keyed["k"].eqNullSafe(dim["k"]))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("label")
    )


@register(
    "s37_execute_trino_dialect",
    """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS BIGINT) AS span_days,
           CAST((YEAR(MAX(o_orderdate)) * 12 + MONTH(MAX(o_orderdate)))
              - (YEAR(MIN(o_orderdate)) * 12 + MONTH(MIN(o_orderdate)))
              - CASE WHEN DAY(MAX(o_orderdate)) < DAY(MIN(o_orderdate)) THEN 1 ELSE 0 END
             AS BIGINT) AS span_months,
           MAX(o_orderdate) + INTERVAL 30 DAY AS due_date,
           CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dash_pos
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    tags=("execute-api", "dialect", "trino"),
    doc=(
        "Trino/Presto-flavored SQL through execute(dialect='trino') with "
        "NO sqlglot installed: approx-free deterministic subset — "
        "strpos -> INSTR, unit-first date_add('day', n, x) -> "
        "TIMESTAMPADD, and date_diff('unit', a, b) -> TIMESTAMPDIFF "
        "(presto counts elapsed COMPLETE units, which is exactly "
        "TIMESTAMPDIFF — unlike snowflake/tsql boundary counting). The "
        "reference gets trino via sqlglot (reference core.py:102); the "
        "DuckDB oracle states the complete-unit month arithmetic "
        "explicitly (calendar index minus a day-of-month borrow)."
    ),
)
def s37_execute_trino_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS BIGINT) AS span_days,
           CAST(date_diff('month', MIN(o_orderdate), MAX(o_orderdate)) AS BIGINT) AS span_months,
           date_add('day', 30, MAX(o_orderdate)) AS due_date,
           CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dash_pos
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """
    return execute(
        sql,
        dialect="trino",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "s38_execute_oracle_dialect",
    """
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
           upper(strftime(MAX(o_orderdate), '%b')) AS last_mon,
           COALESCE(MAX(CASE WHEN o_orderpriority = '1-URGENT'
                             THEN o_totalprice END), 0) AS max_urgent
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    tags=("execute-api", "dialect", "oracle"),
    doc=(
        "Oracle-flavored SQL through execute(dialect='oracle') with NO "
        "sqlglot installed: TO_CHAR(ts, 'YYYY-MM-DD'/'MON') with the "
        "Oracle datetime format model translated element-wise to Spark "
        "patterns, and NVL (native in Spark). ROWNUM/FROM dual are "
        "covered by unit tests (faithful subset only — ROWNUM with "
        "ORDER BY raises because Oracle filters before sorting). The "
        "reference gets oracle via sqlglot (reference core.py:102)."
    ),
)
def s38_execute_oracle_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           TO_CHAR(MIN(o_orderdate), 'YYYY-MM-DD') AS first_day,
           TO_CHAR(MAX(o_orderdate), 'MON') AS last_mon,
           NVL(MAX(CASE WHEN o_orderpriority = '1-URGENT'
                        THEN o_totalprice END), 0) AS max_urgent
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """
    return execute(
        sql,
        dialect="oracle",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "s39_execute_clickhouse_dialect",
    """
    SELECT l_returnflag AS flag,
           COUNT(DISTINCT l_orderkey) AS orders,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS big_n,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS big_qty,
           CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR) AS first_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY flag
    """,
    tags=("execute-api", "dialect", "clickhouse"),
    doc=(
        "ClickHouse-flavored SQL through execute(dialect='clickhouse') "
        "with NO sqlglot installed: uniqExact -> COUNT(DISTINCT), "
        "countIf -> COUNT_IF, sumIf(x, cond) -> SUM(IF(cond, x, NULL)) "
        "(identical NULL-skipping aggregate), and the toInt64/toDate "
        "conversion family -> CASTs. The deterministic exact subset "
        "only (uniq -> APPROX_COUNT_DISTINCT exists but sketches "
        "differ cross-engine, so the driver query avoids it). The "
        "reference gets clickhouse via sqlglot (reference core.py:102)."
    ),
)
def s39_execute_clickhouse_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT l_returnflag AS flag,
           uniqExact(l_orderkey) AS orders,
           countIf(l_quantity > 25) AS big_n,
           sumIf(toInt64(l_quantity), l_quantity > 25) AS big_qty,
           toString(toDate(MIN(l_shipdate))) AS first_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY flag
    """
    return execute(
        sql,
        dialect="clickhouse",
        tables={"lineitem": t(spark, sf_dir, "lineitem")},
        spark=spark,
    )


@register(
    "s40_execute_sqlite_dialect",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           COUNT(*) AS n,
           COALESCE(MAX(CASE WHEN o_orderstatus = 'F'
                             THEN o_totalprice END), 0.0) AS max_f
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
    ORDER BY ym
    """,
    tags=("execute-api", "dialect", "sqlite"),
    doc=(
        "SQLite-flavored SQL through execute(dialect='sqlite') with NO "
        "sqlglot installed: strftime(fmt, x) -> DATE_FORMAT(x, fmt') "
        "with %-codes mapped to Spark patterns (unsupported codes like "
        "%s raise), IFNULL native. The reference gets sqlite via "
        "sqlglot (reference core.py:102)."
    ),
)
def s40_execute_sqlite_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT strftime('%Y-%m', o_orderdate) AS ym,
           COUNT(*) AS n,
           IFNULL(MAX(CASE WHEN o_orderstatus = 'F'
                           THEN o_totalprice END), 0.0) AS max_f
    FROM orders
    GROUP BY strftime('%Y-%m', o_orderdate)
    ORDER BY ym
    """
    return execute(
        sql,
        dialect="sqlite",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "s41_execute_redshift_dialect",
    """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST(datediff('day', date_trunc('week', MIN(o_orderdate)),
                         date_trunc('week', MAX(o_orderdate))) // 7 AS BIGINT) AS span_weeks,
           MAX(o_orderdate) + INTERVAL 7 DAY AS ship_by
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    tags=("execute-api", "dialect", "redshift"),
    doc=(
        "Redshift-flavored SQL through execute(dialect='redshift') with "
        "NO sqlglot installed: GETDATE, and the tsql-family DATEADD/"
        "DATEDIFF with boundary-crossing semantics (redshift counts "
        "unit-boundary crossings like tsql/snowflake, NOT elapsed "
        "units; WEEK rewrites to truncated-to-Monday day counts DIV 7, "
        "which the DuckDB oracle states explicitly). The reference "
        "gets redshift via sqlglot (reference core.py:102)."
    ),
)
def s41_execute_redshift_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           CAST(DATEDIFF(week, MIN(o_orderdate), MAX(o_orderdate)) AS BIGINT) AS span_weeks,
           DATEADD(day, 7, MAX(o_orderdate)) AS ship_by
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """
    return execute(
        sql,
        dialect="redshift",
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "s42_execute_teradata_dialect",
    """
    SELECT seg, cust, bal FROM (
      SELECT c_mktsegment AS seg, c_custkey AS cust, c_acctbal AS bal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) ranked
    WHERE rn <= 3
    ORDER BY seg, cust
    """,
    tags=("execute-api", "dialect", "teradata"),
    doc=(
        "Teradata-flavored SQL through execute(dialect='teradata') with "
        "NO sqlglot installed: QUALIFY (Teradata's hallmark post-window "
        "filter, rewritten to a hoisted-projection subquery), "
        "double-quoted identifiers -> backticks, TOP covered by unit "
        "tests. The reference gets teradata via sqlglot (reference "
        "core.py:102); deterministic because the window order key "
        "(c_acctbal DESC, c_custkey) is a total order."
    ),
)
def s42_execute_teradata_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = '''
    SELECT "c_mktsegment" AS seg, "c_custkey" AS cust, c_acctbal AS bal
    FROM customer
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) <= 3
    ORDER BY seg, cust
    '''
    return execute(
        sql,
        dialect="teradata",
        tables={"customer": t(spark, sf_dir, "customer")},
        spark=spark,
    )


@register(
    "s48_window_rank_family",
    """
    SELECT c_custkey AS cust,
           c_mktsegment AS seg,
           c_acctbal AS bal,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           first_value(c_custkey) OVER w AS first_cust,
           nth_value(c_custkey, 2) OVER w AS second_cust,
           last_value(c_custkey) OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal, c_custkey
                                       ROWS BETWEEN CURRENT ROW
                                       AND UNBOUNDED FOLLOWING) AS last_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY seg, bal, cust
    """,
    tags=("window", "rank-family"),
    doc=(
        "SURVEY.md §2.6 breadth: the remaining rank-family window "
        "functions (percent_rank, cume_dist, nth_value, first_value, "
        "last_value-with-forward-frame) in one pass. The reference has "
        "no window functions at all (its executor covers only the five "
        "sqlglot step types); Spark evaluates all five over a single "
        "sort within each segment partition. Deterministic because the "
        "order key (c_acctbal, c_custkey) is a total order; "
        "percent_rank/cume_dist are exact small-integer ratios, "
        "bit-identical cross-engine."
    ),
)
def s48_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    fwd = w.rowsBetween(W.currentRow, W.unboundedFollowing)
    dflt = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        t(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("cust"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_acctbal").alias("bal"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.first("c_custkey").over(dflt).alias("first_cust"),
            F.nth_value("c_custkey", 2).over(dflt).alias("second_cust"),
            F.last("c_custkey").over(fwd).alias("last_cust"),
        )
        .orderBy("seg", "bal", "cust")
    )


@register(
    "s49_triangle_count",
    """
    WITH basket AS (
      -- per-key cap mirroring copurchase_edges(cap=64): bounds the
      -- wedge self-join at 64^2 rows/order on power-law data (TPC-H
      -- baskets <= 13, results unchanged)
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_partkey, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 64
    ),
    edges AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT p, COUNT(*) AS d FROM (
        SELECT p1 AS p FROM edges UNION ALL SELECT p2 FROM edges
      ) GROUP BY p
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.p1 = e1.p2
      JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT MAX(d) FROM deg) AS BIGINT) AS max_degree,
           CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           CAST(3.0 * n_triangles
                / (SELECT SUM(d * (d - 1) / 2) FROM deg) AS DOUBLE) AS clustering
    FROM tri
    """,
    tags=("graph", "triangles", "market-basket"),
    doc=(
        "Triangle counting / global clustering coefficient over the "
        "part co-purchase graph: parts co-ordered in >= 2 orders form "
        "an edge (support threshold = the classic market-basket prune "
        "that keeps the graph signal-bearing); triangles counted by "
        "the oriented wedge join (p1 < p2 ordering means each triangle "
        "is produced exactly once). Scale shape: the pair-generation "
        "join is keyed on orderkey and bounded by order size squared "
        "(TPC-H ~4 lines/order -> <=6 pairs); the support threshold "
        "collapses the edge set before any graph join; the triangle "
        "join is edges-with-edges on the oriented endpoints — at real "
        "scale the orientation key switches from id to (degree, id), "
        "the standard trick that bounds every wedge list by sqrt(|E|). "
        "All-integer counts, exact ratio for the coefficient."
    ),
)
def s49_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _persist

    edges = _persist(copurchase_edges(spark, sf_dir))  # released via release_caches(), same contract
    # as the dedup pair generators (README "operator caches")
    deg = (
        edges.select(F.col("p1").alias("p"))
        .unionAll(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.p1") == F.col("e1.p2"))
        .join(
            e3,
            (F.col("e3.p1") == F.col("e1.p1")) & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    stats = deg.agg(
        F.max("d").alias("max_degree"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    out = (
        n_edges.crossJoin(stats)
        .crossJoin(tri)
        .select(
            "n_edges",
            F.col("max_degree").cast("bigint"),
            "n_wedges",
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            (3.0 * F.col("n_triangles") / F.col("n_wedges"))
            .cast("double")
            .alias("clustering"),
        )
    )
    return out


@register(
    "s53_lateral_topn_join",
    """
    SELECT n.n_name AS nation, c.cust, c.bal
    FROM nation n,
    LATERAL (
      SELECT c_custkey AS cust, c_acctbal AS bal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) c
    ORDER BY nation, bal DESC, cust
    """,
    tags=("join", "lateral", "execute-api"),
    doc=(
        "LATERAL correlated-subquery join (SURVEY.md §2.4 breadth): "
        "top-2 customers per nation via a per-row correlated subquery, "
        "run through execute() as SQL so Catalyst's lateral-join "
        "decorrelation handles it (Spark rewrites to a "
        "window/aggregate under the hood — the user writes the "
        "per-row form, the engine runs the set-based plan, which is "
        "the scale-correct outcome). The reference parses LATERAL via "
        "sqlglot but its executor has no step type for it. "
        "Deterministic: (c_acctbal DESC, c_custkey) total order."
    ),
)
def s53_lateral_topn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT n.n_name AS nation, c.cust, c.bal
    FROM nation n,
    LATERAL (
      SELECT c_custkey AS cust, c_acctbal AS bal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) c
    ORDER BY nation, bal DESC, cust
    """
    return execute(
        sql,
        tables={
            "nation": t(spark, sf_dir, "nation"),
            "customer": t(spark, sf_dir, "customer"),
        },
        spark=spark,
    )


_CORR_COLS = (
    ("qty", "l_quantity"),
    ("price", "l_extendedprice"),
    ("disc", "l_discount"),
    ("tax", "l_tax"),
)


def _corr_sql() -> str:
    ints = ",\n      ".join(
        f"CAST(round({src} * 100) AS BIGINT) AS {name}"
        for name, src in _CORR_COLS
    )
    sums = ["COUNT(*) AS n"]
    for name, _ in _CORR_COLS:
        sums.append(f"SUM(CAST({name} AS DECIMAL(38,0))) AS s_{name}")
        sums.append(f"SUM(CAST({name} * {name} AS DECIMAL(38,0))) AS ss_{name}")
    pairs = [
        (a, b)
        for i, (a, _) in enumerate(_CORR_COLS)
        for b, _ in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        sums.append(f"SUM(CAST({a} * {b} AS DECIMAL(38,0))) AS sp_{a}_{b}")
    rows = "\n    UNION ALL\n    ".join(
        # round(corr, 9): the DECIMAL(38,0) squared/cross moments pass
        # 2^53 at sf0.1 (sum(y*y) ~ 6e17), so their DOUBLE casts carry
        # an engine-dependent last ulp (determinism class #3); the
        # resulting ~1e-15 wobble in corr is rounded out with a 1e6x
        # margin. Caught by the full sf0.1 parity sweep, not sf0.01.
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
        round((CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)
         - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)
                - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)
                  - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 9)
          AS corr
    FROM moments"""
        for a, b in pairs
    )
    return f"""
    WITH ints AS (
      SELECT {ints}
      FROM lineitem
    ),
    moments AS (
      SELECT {", ".join(sums)} FROM ints
    )
    SELECT col_a, col_b, corr FROM (
    {rows}
    ) all_pairs
    ORDER BY col_a, col_b
    """


@register(
    "s54_correlation_matrix",
    _corr_sql(),
    tags=("stats", "correlation"),
    doc=(
        "Pairwise Pearson correlation matrix over the lineitem numeric "
        "columns in ONE aggregation pass: every value is scaled to an "
        "exact integer (2-decimal money/rate columns x100), all 15 "
        "moments (count, sums, squares, cross-products) accumulate as "
        "exact DECIMAL(38,0) — order-independent, so any cluster size "
        "gives bit-identical moments — and the textbook correlation "
        "formula evaluates in IEEE doubles spelled identically on both "
        "engines, rounded to 9 digits (the squared moments exceed "
        "2^53 at sf0.1, so their double casts carry an engine-"
        "dependent last ulp - determinism class #3). The single-pass moment-matrix shape is how a 100 TB "
        "correlation screen runs: one map-side-combinable aggregate, "
        "6 output rows, no per-pair rescans."
    ),
)
def s54_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The SQL is engine-portable ANSI; run it through execute() so Spark
    # and DuckDB evaluate the very same statement text.
    return execute(
        _corr_sql(),
        tables={"lineitem": t(spark, sf_dir, "lineitem")},
        spark=spark,
    )


def _ols_sql() -> str:
    # 3x3 normal equations solved by Cramer's rule; every determinant is
    # spelled once here so Spark and DuckDB evaluate identical text.
    def det(m: list[list[str]]) -> str:
        (a, b, c), (d, e, f), (g, h, i) = m
        return (
            f"({a} * ({e} * {i} - {f} * {h}) "
            f"- {b} * ({d} * {i} - {f} * {g}) "
            f"+ {c} * ({d} * {h} - {e} * {g}))"
        )

    xtx = [["dn", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    xty = ["sy", "s1y", "s2y"]
    d0 = det(xtx)
    b = [
        det([[xty[r] if c == k else xtx[r][c] for c in range(3)] for r in range(3)])
        for k in range(3)
    ]
    return f"""
    WITH ints AS (
      SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x1,
             CAST(round(l_discount * 100) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x1 AS DECIMAL(38,0))) AS i1,
             SUM(CAST(x2 AS DECIMAL(38,0))) AS i2,
             SUM(CAST(y AS DECIMAL(38,0))) AS iy,
             SUM(CAST(x1 * x1 AS DECIMAL(38,0))) AS i11,
             SUM(CAST(x1 * x2 AS DECIMAL(38,0))) AS i12,
             SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS i22,
             SUM(CAST(x1 * y AS DECIMAL(38,0))) AS i1y,
             SUM(CAST(x2 * y AS DECIMAL(38,0))) AS i2y,
             SUM(CAST(y * y AS DECIMAL(38,0))) AS iyy
      FROM ints
    ),
    d AS (
      SELECT CAST(n AS DOUBLE) AS dn,
             CAST(i1 AS DOUBLE) AS s1, CAST(i2 AS DOUBLE) AS s2,
             CAST(iy AS DOUBLE) AS sy,
             CAST(i11 AS DOUBLE) AS s11, CAST(i12 AS DOUBLE) AS s12,
             CAST(i22 AS DOUBLE) AS s22,
             CAST(i1y AS DOUBLE) AS s1y, CAST(i2y AS DOUBLE) AS s2y,
             CAST(iyy AS DOUBLE) AS syy,
             n
      FROM m
    ),
    solved AS (
      SELECT n,
             {b[0]} / {d0} AS b0s,
             {b[1]} / {d0} AS b1s,
             {b[2]} / {d0} AS b2s,
             dn, s1, s2, sy, s11, s12, s22, s1y, s2y, syy
      FROM d
    )
    SELECT CAST(n AS BIGINT) AS n,
           b0s / 100.0 AS intercept,
           b1s AS beta_quantity,
           b2s AS beta_discount,
           1.0 - (syy - b0s * sy - b1s * s1y - b2s * s2y)
               / (syy - sy * sy / dn) AS r2
    FROM solved
    """


@register(
    "s55_ols_normal_equations",
    _ols_sql(),
    tags=("stats", "regression"),
    doc=(
        "Multi-feature OLS (extendedprice ~ quantity + discount) solved "
        "in closed form from the normal equations: one aggregation pass "
        "accumulates all ten moments as exact DECIMAL(38,0) over "
        "integer-scaled values (order-independent, cluster-size-proof), "
        "then Cramer's rule evaluates the 3x3 solve in IEEE doubles "
        "spelled identically on both engines — coefficients, intercept "
        "and R-squared, bit-reproducible. The moment-matrix collapse is "
        "the canonical way to fit small linear models on 100 TB: the "
        "data is touched once, the solve is O(1). Extends r57's "
        "single-feature trend fit to the matrix form."
    ),
)
def s55_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return execute(
        _ols_sql(),
        tables={"lineitem": t(spark, sf_dir, "lineitem")},
        spark=spark,
    )


@register(
    "s66_aggregate_filter_clause",
    """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_f,
           CAST(MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS max_open
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    tags=("aggregate", "filter-clause", "execute-api"),
    doc=(
        "ANSI aggregate FILTER clause (SURVEY.md §2.5 breadth) through "
        "execute(): per-aggregate predicates evaluated in ONE pass over "
        "the fact table — the idiom that replaces N filtered subquery "
        "scans with one grouped aggregate, which at 100 TB is the "
        "difference between one shuffle and N. Identical syntax on "
        "Spark and DuckDB; exact decimal sum for the filtered total."
    ),
)
def s66_aggregate_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = """
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_f,
           CAST(MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS max_open
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """
    return execute(
        sql,
        tables={"orders": t(spark, sf_dir, "orders")},
        spark=spark,
    )


@register(
    "t39_keyset_pagination",
    """
    WITH anchor AS (
      SELECT o_totalprice AS ap, o_orderkey AS ak
      FROM orders ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 1 OFFSET 19
    )
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o CROSS JOIN anchor a
    WHERE o.o_totalprice < a.ap
       OR (o.o_totalprice = a.ap AND o.o_orderkey > a.ak)
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    tags=("relational", "pagination", "operator"),
    doc=(
        "Keyset (seek-method) pagination: fetch page 2 of orders by "
        "most-expensive-first using the LAST ROW OF PAGE 1 as an "
        "anchor predicate - (price < ap) OR (price = ap AND key > "
        "ak) - instead of OFFSET (q48). The scale story is the whole "
        "point: OFFSET n must order-and-discard n rows EVERY page "
        "(page 10^6 of a 100 TB table sorts a million rows to throw "
        "them away), while the keyset predicate is a plain filter "
        "that reaches the scan and feeds a constant TakeOrdered(20) "
        "- per-page cost independent of page depth, and stable under "
        "concurrent inserts. The anchor here is derived in-query for "
        "self-containment (min of page 1, no second offset on the "
        "Spark side); in production it is the client's cursor. The "
        "(price, key) total order makes pages deterministic on both "
        "engines despite duplicate prices."
    ),
)
def t39_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    page1 = orders.orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    ).limit(20)
    anchor = (
        page1.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").desc())
        .limit(1)
        .select(
            F.col("o_totalprice").alias("ap"),
            F.col("o_orderkey").alias("ak"),
        )
    )
    return (
        orders.crossJoin(F.broadcast(anchor))
        .filter(
            (F.col("o_totalprice") < F.col("ap"))
            | (
                (F.col("o_totalprice") == F.col("ap"))
                & (F.col("o_orderkey") > F.col("ak"))
            )
        )
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "t63_mode_statistic",
    """
    WITH counts AS (
      SELECT l_returnflag AS flag, l_quantity AS v, COUNT(*) AS c
      FROM lineitem GROUP BY flag, v
    ),
    ranked AS (
      SELECT flag, v, c,
             ROW_NUMBER() OVER (PARTITION BY flag
                                ORDER BY c DESC, v) AS rk,
             SUM(c) OVER (PARTITION BY flag) AS n
      FROM counts
    )
    SELECT flag,
           CAST(v AS DOUBLE) AS mode_quantity,
           CAST(c AS BIGINT) AS mode_count,
           CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS mode_share
    FROM ranked WHERE rk = 1 ORDER BY flag
    """,
    tags=("tpch", "statistics", "aggregate"),
    doc=(
        "Statistical mode per group: the most frequent quantity per "
        "return flag with its share - the aggregate SQL engines "
        "chronically lack (Spark has no mode(); the two-phase "
        "count-then-rank re-expression here IS the scalable "
        "implementation, and is exactly how a mode() aggregate "
        "decomposes on a cluster: per-value partial counts combine "
        "map-side, then one rank per group). Ties break on the "
        "smaller value (stated); all counts exact integers. "
        "Completes the central-tendency set: mean (q01), exact "
        "median (s80), weighted median (t03), mode (here)."
    ),
)
def t63_mode_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("v"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wflag = W.partitionBy("flag")
    ranked = counts.select(
        "flag",
        "v",
        "c",
        F.row_number()
        .over(wflag.orderBy(F.col("c").desc(), "v"))
        .alias("rk"),
        F.sum("c").over(wflag).alias("n"),
    )
    return (
        ranked.filter(F.col("rk") == 1)
        .select(
            "flag",
            F.col("v").cast("double").alias("mode_quantity"),
            F.col("c").cast("bigint").alias("mode_count"),
            (F.col("c").cast("double") / F.col("n").cast("double")).alias(
                "mode_share"
            ),
        )
        .orderBy("flag")
    )


@register(
    "t64_referential_integrity",
    """
    SELECT 'lineitem_orphan_orders' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem l
                 LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
                 WHERE o.o_orderkey IS NULL) AS BIGINT) AS violations
    UNION ALL
    SELECT 'order_orphan_customers',
           CAST((SELECT COUNT(*) FROM orders o
                 LEFT JOIN customer c ON c.c_custkey = o.o_custkey
                 WHERE c.c_custkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'customer_orphan_nations',
           CAST((SELECT COUNT(*) FROM customer c
                 LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
                 WHERE n.n_nationkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'duplicate_orderkeys',
           CAST((SELECT COALESCE(SUM(c - 1), 0) FROM (
                   SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
                 ) g WHERE c > 1) AS BIGINT)
    UNION ALL
    SELECT 'duplicate_custkeys',
           CAST((SELECT COALESCE(SUM(c - 1), 0) FROM (
                   SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey
                 ) g WHERE c > 1) AS BIGINT)
    ORDER BY check_name
    """,
    tags=("relational", "data-quality", "audit"),
    doc=(
        "Referential-integrity audit across the star schema: orphan "
        "foreign keys (lineitems without orders, orders without "
        "customers, customers without nations) and primary-key "
        "duplicate counts - the constraint checks a lakehouse cannot "
        "delegate to the storage layer (parquet enforces nothing), "
        "extending r48's column-level DQ checks to CROSS-TABLE "
        "contracts. Each orphan check is a left-anti-join count "
        "(broadcast for dimension-sized right sides, shuffle "
        "hash-join for fact-fact - Catalyst picks per AQE stats); "
        "duplicate counts are sum(multiplicity - 1). All-integer "
        "single-row-per-check output."
    ),
)
def t64_referential_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")

    def row(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("bigint").alias("violations"),
        )

    orphan_li = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("violations"))
    orphan_o = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("violations"))
    orphan_c = cust.join(
        nation,
        cust["c_nationkey"] == nation["n_nationkey"],
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("violations"))
    dup_o = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias(
                "violations"
            )
        )
    )
    dup_c = (
        cust.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias(
                "violations"
            )
        )
    )
    return (
        row("lineitem_orphan_orders", orphan_li)
        .unionAll(row("order_orphan_customers", orphan_o))
        .unionAll(row("customer_orphan_nations", orphan_c))
        .unionAll(row("duplicate_orderkeys", dup_o))
        .unionAll(row("duplicate_custkeys", dup_c))
        .orderBy("check_name")
    )


@register(
    "t75_order_cycle_time",
    """
    WITH cyc AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(MAX(l.l_shipdate) AS DATE)) AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    ),
    ranked AS (
      SELECT priority, days,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY days) AS rn,
             COUNT(*) OVER (PARTITION BY priority) AS n
      FROM cyc
    )
    SELECT priority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN days END)
                AS BIGINT) AS median_days,
           CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN days END)
                AS BIGINT) AS p90_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM ranked GROUP BY priority ORDER BY priority
    """,
    tags=("tpch", "operations", "latency"),
    doc=(
        "Order fulfillment cycle time: days from order date to the "
        "LAST line shipment, summarized per order priority as median "
        "/ p90 / max - the operations SLA view that validates whether "
        "'1-URGENT' actually ships faster, and the TPC-H-side "
        "counterpart to t65's behavioral latency curve. Cycle times "
        "are exact integer day differences; percentiles are s80's "
        "positional selection ((n+1)//2 and ceil(0.9n) positions, "
        "integer arithmetic). One fact-dimension equi-join, one "
        "per-order collapse, one ranked pass per priority."
    ),
)
def t75_order_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cyc = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(
                F.to_date(F.max("l_shipdate")),
                F.to_date(F.col("o_orderdate")),
            ).alias("days")
        )
        .select(F.col("o_orderpriority").alias("priority"), "days")
    )
    wp = W.partitionBy("priority")
    ranked = cyc.select(
        "priority",
        "days",
        F.row_number().over(wp.orderBy("days")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    med_pos = F.floor((F.col("n") + 1) / 2)
    p90_pos = F.floor((9 * F.col("n") + 9) / 10)
    return (
        ranked.groupBy("priority")
        .agg(
            F.max("n").cast("bigint").alias("n_orders"),
            F.min(F.when(F.col("rn") == med_pos, F.col("days")))
            .cast("bigint")
            .alias("median_days"),
            F.min(F.when(F.col("rn") == p90_pos, F.col("days")))
            .cast("bigint")
            .alias("p90_days"),
            F.max("days").cast("bigint").alias("max_days"),
        )
        .orderBy("priority")
    )


@register(
    "t76_abc_xyz_matrix",
    """
    WITH monthly AS (
      SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                  AS DECIMAL(18,6)) AS q
      FROM lineitem GROUP BY l_partkey, m
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN COUNT(*) < 2 THEN 'Z'
                  WHEN sqrt((CAST(COUNT(*) AS DOUBLE)
                             * CAST(SUM(CAST(round(q * 100) AS BIGINT)
                                        * CAST(round(q * 100) AS BIGINT))
                                    AS DOUBLE)
                             - CAST(SUM(CAST(round(q * 100) AS BIGINT))
                                    AS DOUBLE)
                               * CAST(SUM(CAST(round(q * 100) AS BIGINT))
                                      AS DOUBLE))
                            / (CAST(COUNT(*) AS DOUBLE)
                               * CAST(COUNT(*) - 1 AS DOUBLE)))
                       / (CAST(SUM(CAST(round(q * 100) AS BIGINT))
                               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                       < 0.5 THEN 'X'
                  WHEN sqrt((CAST(COUNT(*) AS DOUBLE)
                             * CAST(SUM(CAST(round(q * 100) AS BIGINT)
                                        * CAST(round(q * 100) AS BIGINT))
                                    AS DOUBLE)
                             - CAST(SUM(CAST(round(q * 100) AS BIGINT))
                                    AS DOUBLE)
                               * CAST(SUM(CAST(round(q * 100) AS BIGINT))
                                      AS DOUBLE))
                            / (CAST(COUNT(*) AS DOUBLE)
                               * CAST(COUNT(*) - 1 AS DOUBLE)))
                       / (CAST(SUM(CAST(round(q * 100) AS BIGINT))
                               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                       < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM monthly GROUP BY l_partkey
    ),
    rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,6))) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    walk AS (
      SELECT l_partkey,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(revenue) OVER () AS total
      FROM rev
    ),
    abc AS (
      SELECT l_partkey,
             CASE WHEN 5 * cum <= 4 * total THEN 'A'
                  WHEN 20 * cum <= 19 * total THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM walk
    )
    SELECT a.abc_class, x.xyz_class, COUNT(*) AS n_parts
    FROM abc a JOIN xyz x ON x.l_partkey = a.l_partkey
    GROUP BY a.abc_class, x.xyz_class
    ORDER BY a.abc_class, x.xyz_class
    """,
    tags=("tpch", "inventory", "planning"),
    doc=(
        "ABC-XYZ planning matrix: cross the revenue classes (t27's "
        "decimal-exact cumulative ABC walk) with demand-variability "
        "classes from the monthly quantity coefficient of variation "
        "(X: CV < 0.5 steady, Y: < 1.0, Z: erratic or single-month) "
        "- the 9-cell grid that drives stocking policy (AX = "
        "automate, CZ = make-to-order) and, in a data pipeline, "
        "which sources deserve incremental maintenance vs full "
        "refresh. Monthly quantities quantize to integer centi-units "
        "so the CV comes from exact moments; the boundary "
        "comparisons are IEEE on identical inputs. Two part-level "
        "collapses and one equi-join."
    ),
)
def t76_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("q")
    )
    qi = F.round(F.col("q") * 100).cast("bigint")
    mom = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(qi).alias("s"),
        F.sum(qi * qi).alias("ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    sd = F.sqrt(
        (d("k") * d("ss") - d("s") * d("s"))
        / (d("k") * (F.col("k") - 1).cast("double"))
    )
    cv = sd / (d("s") / d("k"))
    xyz = mom.select(
        "l_partkey",
        F.when(F.col("k") < 2, "Z")
        .when(cv < 0.5, "X")
        .when(cv < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("revenue")
    )
    wwalk = W.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        W.unboundedPreceding, 0
    )
    walk = rev.select(
        "l_partkey",
        F.sum("revenue").over(wwalk).alias("cum"),
        F.sum("revenue").over(W.partitionBy()).alias("total"),
    )
    # integer-scaled boundaries (the t27 form): a Python float literal
    # (0.80 * total) coerces the DECIMAL to DOUBLE on the Spark side
    # while DuckDB keeps exact DECIMAL, so a part within one double ulp
    # of the boundary could classify differently across engines.
    abc = walk.select(
        "l_partkey",
        F.when(5 * F.col("cum") <= 4 * F.col("total"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("abc_class", "xyz_class")
    )


@register(
    "t77_return_rate_by_discount",
    """
    WITH bands AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS band,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem
    ),
    tot AS (
      SELECT CAST(SUM(ret) AS BIGINT) AS r_all, COUNT(*) AS n_all
      FROM bands
    )
    SELECT CAST(b.band AS INT) AS discount_pct,
           COUNT(*) AS n_lines,
           CAST(SUM(b.ret) AS BIGINT) AS n_returned,
           CAST(SUM(b.ret) AS DOUBLE) / COUNT(*) AS return_rate,
           (CAST(SUM(b.ret) AS DOUBLE) / COUNT(*))
           / (CAST(t.r_all AS DOUBLE) / CAST(t.n_all AS DOUBLE))
             AS lift_vs_overall
    FROM bands b CROSS JOIN tot t
    GROUP BY b.band, t.r_all, t.n_all
    ORDER BY discount_pct
    """,
    tags=("tpch", "risk", "diagnostics"),
    doc=(
        "Return rate by discount band with lift against the overall "
        "rate: do discounted lines come back more often? - the "
        "margin-risk diagnostic behind markdown policy, and a "
        "ready-made input for r59's chi-square if the lift pattern "
        "looks non-flat. Discount bands are exact integer points "
        "(round(x*100)); rates and lifts are IEEE divisions of exact "
        "integer counts against a 1-row overall broadcast. One "
        "map-side-combinable aggregation."
    ),
)
def t77_return_rate_by_discount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    bands = li.select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("band"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    tot = bands.agg(
        F.sum("ret").cast("bigint").alias("r_all"),
        F.count(F.lit(1)).alias("n_all"),
    )
    rate = F.sum("ret").cast("double") / F.count(F.lit(1))
    overall = F.col("r_all").cast("double") / F.col("n_all").cast("double")
    return (
        bands.crossJoin(F.broadcast(tot))
        .groupBy("band", "r_all", "n_all")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("ret").cast("bigint").alias("n_returned"),
            rate.alias("return_rate"),
            (rate / overall).alias("lift_vs_overall"),
        )
        .select(
            F.col("band").cast("int").alias("discount_pct"),
            "n_lines",
            "n_returned",
            "return_rate",
            "lift_vs_overall",
        )
        .orderBy("discount_pct")
    )


@register(
    "t78_sole_source_risk",
    """
    WITH ps AS (
      SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CASE WHEN n_suppliers = 1 THEN '1_sole_source'
                WHEN n_suppliers = 2 THEN '2_dual_source'
                ELSE '3_multi_source' END AS sourcing_class,
           COUNT(*) AS n_parts,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN n_suppliers = 1 THEN n_lines ELSE 0 END)
                AS BIGINT) AS sole_sourced_lines
    FROM ps
    GROUP BY sourcing_class ORDER BY sourcing_class
    """,
    tags=("tpch", "risk", "supply-chain"),
    doc=(
        "Sole-source supply risk census: parts served by exactly one "
        "supplier (a single point of failure), two, or more - the "
        "supply-chain resilience audit procurement runs before any "
        "disruption scenario, and structurally the same "
        "single-provider-dependency check a data platform runs over "
        "its source feeds. One grouped COUNT(DISTINCT) (two-phase "
        "shuffle) and a 3-row census; all exact integers."
    ),
)
def t78_sole_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    cls = (
        F.when(F.col("n_suppliers") == 1, "1_sole_source")
        .when(F.col("n_suppliers") == 2, "2_dual_source")
        .otherwise("3_multi_source")
    )
    return (
        ps.groupBy(cls.alias("sourcing_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
            F.sum(
                F.when(
                    F.col("n_suppliers") == 1, F.col("n_lines")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("sole_sourced_lines"),
        )
        .orderBy("sourcing_class")
    )


@register(
    "t79_nzv_feature_screen",
    """
    WITH cols AS (
      SELECT 'l_quantity' AS col, CAST(l_quantity AS DOUBLE) AS v
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE)
      FROM lineitem
    ),
    per_val AS (
      SELECT col, v, COUNT(*) AS c FROM cols GROUP BY col, v
    ),
    ranked AS (
      SELECT col, c,
             ROW_NUMBER() OVER (PARTITION BY col
                                ORDER BY c DESC, v) AS rk,
             SUM(c) OVER (PARTITION BY col) AS n,
             COUNT(*) OVER (PARTITION BY col) AS n_distinct
      FROM per_val
    ),
    top2 AS (
      SELECT col,
             MAX(n) AS n, MAX(n_distinct) AS n_distinct,
             MAX(CASE WHEN rk = 1 THEN c END) AS c1,
             MAX(CASE WHEN rk = 2 THEN c END) AS c2
      FROM ranked GROUP BY col
    )
    SELECT col AS feature,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(c1 AS DOUBLE) / CAST(COALESCE(c2, 1) AS DOUBLE)
             AS freq_ratio,
           100.0 * CAST(n_distinct AS DOUBLE) / CAST(n AS DOUBLE)
             AS pct_unique,
           CASE WHEN CAST(c1 AS DOUBLE) / CAST(COALESCE(c2, 1) AS DOUBLE)
                     > 19.0
                 AND 100.0 * CAST(n_distinct AS DOUBLE)
                     / CAST(n AS DOUBLE) < 10.0
                THEN 1 ELSE 0 END AS near_zero_variance
    FROM top2 ORDER BY feature
    """,
    tags=("tpch", "feature-engineering", "diagnostics"),
    doc=(
        "Near-zero-variance feature screen (the caret nzv rule): per "
        "numeric column, the frequency ratio of the two most common "
        "values and the percent-unique - a feature is flagged when "
        "the top value dominates (ratio > 19) AND distinct values "
        "are scarce (< 10% unique), the standard pre-model screen "
        "that drops degenerate features before they destabilize "
        "cross-validation (and, in a pipeline, catches columns a "
        "broken upstream filled with a constant). Long-format "
        "UNION ALL over columns -> one count-rank pass per feature "
        "(t63's mode machinery); all counts exact."
    ),
)
def t79_nzv_feature_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cols = None
    for c in ["l_quantity", "l_discount", "l_tax", "l_extendedprice"]:
        part = li.select(
            F.lit(c).alias("col"), F.col(c).cast("double").alias("v")
        )
        cols = part if cols is None else cols.unionAll(part)
    per_val = cols.groupBy("col", "v").agg(F.count(F.lit(1)).alias("c"))
    wcol = W.partitionBy("col")
    ranked = per_val.select(
        "col",
        "c",
        F.row_number()
        .over(wcol.orderBy(F.col("c").desc(), "v"))
        .alias("rk"),
        F.sum("c").over(wcol).alias("n"),
        F.count(F.lit(1)).over(wcol).alias("n_distinct"),
    )
    top2 = ranked.groupBy("col").agg(
        F.max("n").alias("n"),
        F.max("n_distinct").alias("n_distinct"),
        F.max(F.when(F.col("rk") == 1, F.col("c"))).alias("c1"),
        F.max(F.when(F.col("rk") == 2, F.col("c"))).alias("c2"),
    )
    ratio = F.col("c1").cast("double") / F.coalesce(
        F.col("c2"), F.lit(1)
    ).cast("double")
    pct_u = (
        100.0 * F.col("n_distinct").cast("double") / F.col("n").cast("double")
    )
    return top2.select(
        F.col("col").alias("feature"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        ratio.alias("freq_ratio"),
        pct_u.alias("pct_unique"),
        F.when((ratio > 19.0) & (pct_u < 10.0), 1)
        .otherwise(0)
        .alias("near_zero_variance"),
    ).orderBy("feature")
