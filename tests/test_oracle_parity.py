"""DuckDB-oracle parity for every registered query (the driver's gate,
run locally at sf0.01). Each query must match on row count, column
names, and values; exact (hash-grade) equality is asserted too since
the inventory is engineered for cross-engine bit-equality."""

from __future__ import annotations

import pytest

from xorbits_sql_spark.queries import load_all

from .conftest import SF_ORACLE
from .oracle import compare, exact_match

SPECS = load_all()
ORACLE_CASES = [name for name, s in sorted(SPECS.items()) if s.oracle is not None]
ROWS_ONLY_CASES = [name for name, s in sorted(SPECS.items()) if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_ORACLE).toPandas()
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)
    assert exact_match(sdf, ddf), f"{name}: values differ below tolerance (hash would mismatch)"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only(name, spark):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
