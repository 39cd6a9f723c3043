"""Vector math over embedding columns (``array<float>``).

Everything is expressed with Spark's higher-order array functions
(``zip_with``/``aggregate``), not Python UDFs: dot products over a
100 TB embedding table must not cross the Python boundary per row.
HOF lambdas are JVM-side but *interpreted* (outside whole-stage
codegen), so the pair-heavy operators precompute per-vector norms once
and token/shingle pipelines use explode→groupBy relational plans
instead of per-row array passes (see operators/dedup.py). Elements
are cast to DOUBLE before arithmetic and
accumulated sequentially, which matches DuckDB's ``list_dot_product``
over ``DOUBLE[]`` bit-for-bit (validated in tests/test_oracle_parity).

The reference has no vector/array runtime at all (SURVEY.md §1.2: no
array values at runtime); this module is part of the pipeline-operator
extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-accumulation double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm.

    ``try_divide`` instead of ``/``: under ANSI mode (this engine's
    default session) a plain division aborts the whole job with
    DIVIDE_BY_ZERO on the first zero-norm embedding — the same guard
    operators/similarity._pair_cosine carries. The fused accumulator
    below computes (dot, |a|^2, |b|^2) in ONE zip_with + aggregate pass
    instead of three (dot + two norms re-walking the arrays): same
    element order, so every partial sum is the identical IEEE sequence
    and results stay bit-equal to the unfused spelling — at a third of
    the interpreted-HOF cost on per-row callers (s64 hybrid search, s10
    centroids).
    """
    acc = F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: F.struct(x.alias("x"), y.alias("y"))),
        F.struct(
            F.lit(0.0).alias("d"), F.lit(0.0).alias("na"), F.lit(0.0).alias("nb")
        ),
        lambda s, v: F.struct(
            (s["d"] + v["x"] * v["y"]).alias("d"),
            (s["na"] + v["x"] * v["x"]).alias("na"),
            (s["nb"] + v["y"] * v["y"]).alias("nb"),
        ),
    )
    return F.try_divide(acc["d"], F.sqrt(acc["na"]) * F.sqrt(acc["nb"]))


def sign_bucket(a: Column, bits: int = 8) -> Column:
    """Axis-aligned random-hyperplane LSH bucket: sign bits of the first
    ``bits`` dimensions, as a string key like ``'10110010'``.

    This is the cheapest useful LSH family for normalized embeddings:
    bucketing on it turns an O(n^2) all-pairs cosine search into a
    per-bucket search, and the bucket key is a plain string column so a
    100 TB table can be hash-partitioned on it (no shuffle for repeated
    probes). Recall is tunable via ``bits`` and multi-probe unions.
    """
    # try_element_at: under ANSI, element_at past the end aborts the
    # job — a truncated embedding must bucket via the documented
    # pad-with-'0' fallback instead (NULL >= 0 is NULL -> otherwise '0')
    return F.concat(
        *[
            F.when(F.try_element_at(a, F.lit(i + 1)) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(bits)
        ]
    )
