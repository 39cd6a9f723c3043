"""Reference unit-test parity: the four operator shapes from
/root/reference/xorbits_sql/tests/test_execute.py:48-116 (same seeded
frames, seed 123, 100 rows) run through execute() and checked against a
hand-written pandas oracle — the reference's own test strategy
(SURVEY.md §5 layer 1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from xorbits_sql_spark import execute


@pytest.fixture(scope="module")
def frames():
    rs = np.random.RandomState(123)
    t1 = pd.DataFrame(
        {
            "a": [f"t_{i}" for i in rs.randint(0, 1000, 100)],
            "b": rs.rand(100),
            "c": rs.randint(0, 100, 100),
        }
    )
    t2 = pd.DataFrame(
        {
            "a": [f"t_{i}" for i in rs.randint(0, 1000, 100)],
            "b": rs.rand(100),
        }
    )
    return {"t1": t1, "t2": t2}


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_project_filter(spark, frames):
    got = execute(
        "SELECT a, b FROM t1 WHERE c > 50", tables=frames, spark=spark
    ).toPandas()
    exp = frames["t1"][frames["t1"].c > 50][["a", "b"]]
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))


def test_groupby_agg_limit(spark, frames):
    got = execute(
        "SELECT c, COUNT(a) AS cnt, AVG(b / 2) AS avg_half FROM t1 GROUP BY c ORDER BY c LIMIT 30",
        tables=frames,
        spark=spark,
    ).toPandas()
    exp = (
        frames["t1"]
        .assign(half=frames["t1"].b / 2)
        .groupby("c", as_index=False)
        .agg(cnt=("a", "count"), avg_half=("half", "mean"))
        .sort_values("c")
        .head(30)
        .reset_index(drop=True)
    )
    exp["cnt"] = exp["cnt"].astype("int64")
    pd.testing.assert_frame_equal(got, exp, check_exact=False, rtol=1e-12)


def test_equi_join_projection(spark, frames):
    got = execute(
        "SELECT t1.a AS a, t1.b AS b1, t2.b AS b2 FROM t1 JOIN t2 ON t1.a = t2.a",
        tables=frames,
        spark=spark,
    ).toPandas()
    exp = frames["t1"].merge(frames["t2"], on="a", suffixes=("1", "2"))[["a", "b1", "b2"]]
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))


def test_sort_desc_limit(spark, frames):
    got = execute(
        "SELECT a, b FROM t1 ORDER BY b DESC, a LIMIT 10", tables=frames, spark=spark
    ).toPandas()
    exp = (
        frames["t1"][["a", "b"]]
        .sort_values(["b", "a"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_execute_accepts_ast_expression(spark):
    """Reference parity: execute(sql: str | Expression). Any AST object
    with a .sql() renderer (sqlglot Expression shape) is accepted,
    independent of whether sqlglot itself is importable."""
    import pandas as pd

    from xorbits_sql_spark import execute

    class FakeExpression:
        def sql(self, dialect=None):
            assert dialect == "duckdb"
            return "SELECT k, SUM(v) AS s FROM t GROUP BY k ORDER BY k"

    pdf = pd.DataFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]})
    got = execute(FakeExpression(), dialect="duckdb", tables={"t": pdf}, spark=spark).collect()
    assert [(r["k"], r["s"]) for r in got] == [("a", 4), ("b", 2)]


def test_ctas_insert_roundtrip(spark, tmp_path):
    """DDL/DML pass through execute() to Spark's catalog: CTAS writes a
    parquet table (sink surface via SQL, no writer API needed), INSERT
    INTO appends, and a follow-up execute() query reads it back."""
    import pandas as pd

    from xorbits_sql_spark import execute

    src = pd.DataFrame({"k": ["a", "b"], "v": [1.0, 2.0]})
    try:
        execute(
            f"CREATE TABLE ctas_t USING PARQUET LOCATION '{tmp_path}/ctas_t' "
            "AS SELECT k, v FROM src",
            tables={"src": src},
            spark=spark,
        ).collect()
        execute("INSERT INTO ctas_t VALUES ('c', 3.0)", spark=spark).collect()
        got = execute(
            "SELECT k, SUM(v) AS s FROM ctas_t GROUP BY k ORDER BY k", spark=spark
        ).collect()
        assert [(r["k"], r["s"]) for r in got] == [("a", 1.0), ("b", 2.0), ("c", 3.0)]
    finally:
        spark.sql("DROP TABLE IF EXISTS ctas_t")
