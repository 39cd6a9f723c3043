"""Units for the tests/oracle comparison harness itself — specifically
the type-strict canonicalization (round-5 verdict #1b): the driver's
value hash stringifies 376237 and 376237.0 differently, so the local
``exact_match`` must treat int-vs-float as a MISMATCH even when Python
``==`` would coerce them equal. s39 passed locally for two rounds while
failing the driver's hash precisely because this check was missing."""

from __future__ import annotations

import datetime
from decimal import Decimal

import numpy as np
import pandas as pd

from .oracle import compare, exact_match


def _df(**cols):
    return pd.DataFrame(cols)


def test_int_vs_float_is_a_mismatch():
    # the exact s39 shape: Spark int64 vs DuckDB HUGEINT->float64
    spark = _df(big_qty=pd.array([376237], dtype="int64"))
    duck = _df(big_qty=pd.array([376237.0], dtype="float64"))
    assert not exact_match(spark, duck)
    assert compare(spark, duck)  # compare() is driver-grade too


def test_same_numeric_class_matches():
    assert exact_match(_df(a=[1, 2]), _df(a=[1, 2]))
    assert exact_match(_df(a=[1.5]), _df(a=[1.5]))
    # int32 vs int64 is the SAME numeric class (the driver stringifies
    # both to the same text), so width alone must not flag
    assert exact_match(
        _df(a=pd.array([7], dtype="int32")), _df(a=pd.array([7], dtype="int64"))
    )


def test_decimal_collapses_to_float_class():
    # engineered decimal-exact sums: Spark DECIMAL vs DuckDB DECIMAL
    # both canonicalize to the float class and compare bit-equal
    assert exact_match(_df(a=[Decimal("1.50")]), _df(a=[1.5]))
    # ...but a decimal against an INT stays a mismatch
    assert not exact_match(_df(a=[Decimal("2")]), _df(a=pd.array([2], dtype="int64")))


def test_bool_vs_int_is_a_mismatch():
    assert not exact_match(_df(a=[True]), _df(a=pd.array([1], dtype="int64")))
    assert exact_match(_df(a=[True, False]), _df(a=[True, False]))


def test_null_handling_unchanged():
    assert exact_match(_df(a=[None, 1.0]), _df(a=[np.nan, 1.0]))


def test_timestamp_and_date_classes():
    ts = datetime.datetime(2020, 1, 2, 3, 4, 5)
    d = datetime.date(2020, 1, 2)
    # pandas Timestamp and python datetime are the same class
    assert exact_match(_df(a=[pd.Timestamp(ts)]), _df(a=[ts]))
    # a date is NOT a datetime (midnight coercion differs per engine)
    assert not exact_match(_df(a=[d]), _df(a=[datetime.datetime(2020, 1, 2)]))
    assert exact_match(_df(a=[d]), _df(a=[d]))


def test_arrays_recurse_with_classes():
    assert exact_match(_df(a=[[1, 2]]), _df(a=[np.array([1, 2], dtype=np.int64)]))
    assert not exact_match(_df(a=[[1, 2]]), _df(a=[[1.0, 2.0]]))


def test_column_order_insensitive_row_order_insensitive():
    s = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    d = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    assert exact_match(s, d)
    assert not compare(s, d)


def test_near_equal_floats_pair_correctly():
    """Row sorting must order numerics NUMERICALLY: a str() sort could
    place near-equal floats (within rtol) at different positions on the
    two sides, mispairing rows into phantom mismatches (round-7 harness
    review)."""
    import pandas as pd

    from .oracle import compare

    spark_df = pd.DataFrame({"v": [10.0, 9.0]})
    duck_df = pd.DataFrame({"v": [9.999999999999999, 9.0]})
    assert compare(spark_df, duck_df) == []  # pairwise within rtol


def test_pd_na_cells_compare_as_null():
    """pd.NA from nullable dtypes must normalize to None, not raise
    'boolean value of NA is ambiguous' inside the comparator."""
    import pandas as pd

    from .oracle import compare, exact_match

    a = pd.DataFrame({"v": pd.array([1, None], dtype="Int64")})
    b = pd.DataFrame({"v": [1.0, None]})
    # int vs float is a type-strict mismatch on the 1-row, but the NA
    # row must compare as None == None without raising
    problems = compare(a, b)
    assert any("row" in p for p in problems)
    same = pd.DataFrame({"v": pd.array([1, None], dtype="Int64")})
    assert exact_match(a, same)


def test_signed_zero_is_a_mismatch():
    # the exact t66 shape (round-8 red cell, determinism class #4):
    # Spark rounds a -epsilon residual to 0.0, DuckDB to -0.0; Python
    # == says equal, the driver's stringifying hash says "-0.0" !=
    # "0.0". Local parity must fail exactly where the driver fails.
    spark = _df(gap=[0.0])
    duck = _df(gap=[-0.0])
    assert not exact_match(spark, duck)
    assert compare(spark, duck)  # compare() is driver-grade too
    # matched signs on both sides stay green, either sign
    assert exact_match(_df(gap=[-0.0]), _df(gap=[-0.0]))
    assert exact_match(_df(gap=[0.0]), _df(gap=[0.0]))
    # Decimal(-0) routes through the same canonicalization as float
    assert exact_match(_df(gap=[Decimal("-0")]), _df(gap=[-0.0]))
    assert not exact_match(_df(gap=[Decimal("-0")]), _df(gap=[0.0]))
    # signed zero inside arrays recurses
    assert not exact_match(_df(a=[[0.0, 1.0]]), _df(a=[[-0.0, 1.0]]))
