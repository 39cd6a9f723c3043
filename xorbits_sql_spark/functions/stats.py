"""Shared statistical expression helpers for the query inventory.

Hoisted from the query registry modules (round-3 verdict #7) where the
same three patterns had been re-implemented per query: the fixed-point
integer-ln guard, positional (exact) medians, and fixed-point OLS/
Pearson moment aggregation.  Each helper preserves the exact arithmetic
spelling the DuckDB oracles mirror, so adopting one at a call site
cannot perturb a hash-grade comparison.

Cross-engine determinism contract (see queries/__init__.py): libm
functions (ln) differ across engines in the last ulp, so transcendental
results are pinned to 1e-6 fixed point BEFORE any summation; sums run
over exact integers/decimals; the final statistic is one
identically-spelled IEEE-double expression on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_DEC38 = "decimal(38,0)"


def iln6(col: Column) -> Column:
    """ln of a positive integer expression, pinned to 1e-6 fixed point.

    ``round(ln(x) * 1e6)`` as BIGINT: the one safe way to aggregate
    logarithms across engines — Spark's and DuckDB's libm agree on well
    over the first 6 decimal places, so the rounded integer is
    bit-identical on both sides and the downstream SUM is exact.
    SQL mirror: ``sql_iln6``.
    """
    return F.round(F.log(col.cast("double")) * 1e6).cast("bigint")


def sql_iln6(expr: str) -> str:
    """DuckDB spelling of ``iln6`` for oracle strings."""
    return f"CAST(round(ln(CAST({expr} AS DOUBLE)) * 1e6) AS BIGINT)"


def exp9(col: Column, shift: float = 0.0) -> Column:
    """``round(exp(col) + shift, 9)`` — re-pin after exponentiation.

    The inverse guard to ``iln6``: once fixed-point log terms have been
    summed exactly, the final ``exp`` re-amplifies the 1e-6 pin, so the
    result is rounded to 9 decimal places to land on the same IEEE
    double in every engine.  ``shift`` folds an additive constant inside
    the rounding (e.g. ``-1`` for growth rates: ``exp(x) - 1`` and
    ``exp(x) + (-1)`` are the same IEEE operation).
    SQL mirror: ``round(exp(...) [+ shift], 9)``.
    """
    e = F.exp(col)
    return F.round(e + shift if shift else e, 9)


def with_cum_before(
    df: DataFrame, order_col: str, count: Column, alias: str = "cum_before"
) -> DataFrame:
    """Running count of items strictly below each distinct value.

    Input is a per-distinct-value collapse (one row per value with an
    integer multiplicity ``count``); output appends ``alias`` =
    ``SUM(count) OVER (ORDER BY order_col ROWS UNBOUNDED PRECEDING) -
    count``.  This is the shared first step of every tie-averaged rank
    statistic in the inventory (Mann-Whitney s71, Wilcoxon t58): with it,
    ``2 * avg_rank`` of a tie block is the INTEGER ``2*cum_before +
    count + 1``, so rank sums accumulate exactly (see
    ``midrank_twice``).

    Scale shape: the global ORDER BY window runs on the collapsed
    distinct-value table (bounded by the value domain, not the row
    count) — the same single-partition-on-purpose shape as the KS test.
    """
    wv = W.orderBy(order_col).rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn(alias, F.sum(count).over(wv) - count)


def midrank_twice(
    weight: Column, count: Column, cum_before: str = "cum_before"
) -> Column:
    """Doubled tie-averaged rank-sum term: ``weight * (2*cum_before +
    count + 1)`` — all-integer, so ``SUM`` of it is exact and
    order-independent; divide by 2 only in the final double expression.
    ``cum_before`` names the column from ``with_cum_before`` (pass the
    same value as that helper's ``alias``).
    SQL mirror: ``SUM(w * (2 * cum_before + c + 1))``.
    """
    return weight * (2 * F.col(cum_before) + count + 1)


def positional_median(
    df: DataFrame,
    value: str,
    part_cols: tuple[str, ...] = (),
    alias: str = "median",
    tiebreak: tuple[str, ...] = (),
    n_alias: str | None = None,
) -> DataFrame:
    """EXACT (per-group) median via positional selection.

    Ranks rows within each group by ``(value, *tiebreak)`` — pass a
    unique tiebreak for a deterministic total order — and averages the
    one/two middle elements: rows ``floor((n+1)/2)`` and
    ``floor(n/2)+1`` (equal when n is odd).  SQL mirror::

        ROW_NUMBER() OVER (... ORDER BY value) AS rn,
        COUNT(*) OVER (...) AS n
        ... WHERE rn IN ((n+1)//2, (n+2)//2) → AVG / (MIN+MIN)/2

    (sum-of-middles / count is IEEE-identical to ``(a+b)/2`` — division
    by 2 is exact — so either oracle spelling matches.)

    Scale shape: one window shuffle on ``part_cols`` + per-group sort —
    the unavoidable cost of an exact median; no driver-side collection.
    A global median (``part_cols=()``) moves all rows through a single
    partition: fine for already-collapsed series (daily aggregates,
    bootstrap replicates), wrong for raw event volumes — pre-aggregate
    first, as every adopter in the inventory does.
    """
    w = W.partitionBy(*part_cols)
    order = [value, *tiebreak]
    ranked = df.select(
        *part_cols,
        value,
        F.row_number().over(w.orderBy(*order)).alias("__rn"),
        F.count(F.lit(1)).over(w).alias("__n"),
    )
    lo = F.floor((F.col("__n") + 1) / 2.0).cast("bigint")
    hi = F.floor(F.col("__n") / 2.0).cast("bigint") + 1
    mid = ranked.filter((F.col("__rn") == lo) | (F.col("__rn") == hi))
    aggs = []
    if n_alias:
        aggs.append(F.max("__n").cast("bigint").alias(n_alias))
    aggs.append((F.sum(value) / F.count(F.lit(1))).alias(alias))
    return mid.groupBy(*part_cols).agg(*aggs) if part_cols else mid.agg(*aggs)


def moments_xy(
    df: DataFrame,
    part_cols: tuple[str, ...] = (),
    with_syy: bool = False,
) -> DataFrame:
    """Exact fixed-point moment sums for OLS / Pearson statistics.

    Aggregates integer columns ``x``/``y`` into ``k, sx, sy, sxy, sxx``
    (plus ``syy`` when requested) accumulated in DECIMAL(38,0) — exact
    and order-independent at any cluster size.  Combine with
    ``ols_slope`` / ``pearson_r`` for the final IEEE expression.  SQL
    mirror: ``SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy`` etc.

    Operands are cast to DECIMAL *before* the product: ``x * y`` in
    the source BIGINT can exceed 2^63 (ANSI: ARITHMETIC_OVERFLOW
    mid-job) long before the post-product cast would have protected
    it; the decimal-first product is identical for in-range values.
    """
    xd, yd = F.col("x").cast(_DEC38), F.col("y").cast(_DEC38)
    aggs = [
        F.count(F.lit(1)).alias("k"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum((xd * yd).cast(_DEC38)).alias("sxy"),
        F.sum((xd * xd).cast(_DEC38)).alias("sxx"),
    ]
    if with_syy:
        aggs.append(F.sum((yd * yd).cast(_DEC38)).alias("syy"))
    return df.groupBy(*part_cols).agg(*aggs) if part_cols else df.agg(*aggs)


def ols_slope(kd: Column, sx: Column, sy: Column, sxy: Column, sxx: Column) -> Column:
    """OLS slope from (already-scaled) moment columns:
    ``(k*Sxy - Sx*Sy) / (k*Sxx - Sx^2)`` — the exact spelling every
    oracle mirrors; pass pre-divided Columns to keep scaling identical."""
    return (kd * sxy - sx * sy) / (kd * sxx - sx * sx)


def hash_cohort(col: Column, buckets: int = 2) -> Column:
    """Deterministic hash-split cohort assignment: md5-prefix of the
    (string-cast) id modulo ``buckets`` — the workhorse randomization
    unit of every experimentation query (A/B arms, CV folds). Engine-
    portable: DuckDB mirrors it as
    ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::UBIGINT
    AS BIGINT) % buckets`` (same '0x'||substr(md5..) == conv(..,16,10)
    equivalence used repo-wide).

    Hoisted from 9 experimentation queries that respelled it inline
    (round-6 registry review, deferred cleanup #1).
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def ses_terms(
    origin: Column,
    hist_i: Column,
    value: Column,
    alpha: float = 0.3,
    beta: float = 0.7,
    ndigits: int = 9,
) -> tuple[Column, Column]:
    """Closed-form simple-exponential-smoothing summands.

    The serial recurrence ``l_t = a*x_t + (1-a)*l_(t-1)`` (seeded with
    the first observation) unrolls to ``l_n = sum_i a*(1-a)^(n-i)*x_i
    + (1-a)^n * x_1`` — the re-expression that turns an inherently
    sequential update into ONE parallel aggregate. Returns the pair
    ``(w_term, init_term)``; the forecast is ``SUM(w_term) +
    SUM(init_term)`` grouped by series (cast the summands to DECIMAL
    first when the oracle does).

    ``origin`` is the forecast origin's index (the series length ``n``
    for a terminal forecast, or the outer row's ``o.i`` in a
    rolling-origin pair join) and ``hist_i`` the history row's index.
    Terms round to ``ndigits``=9, not 12: terms reach ~1e4, so a 1-ulp
    pow divergence (~1e-12 absolute) could flip a 12th-digit rounding;
    at 9 digits the margin is 500x the error. ``beta`` is passed
    explicitly (not computed as 1-alpha) so the decay base is the
    exact IEEE literal the oracles spell.

    Hoisted from the 4 forecasting queries that unrolled it inline
    (round-6 registry review, deferred cleanup #2). SQL mirror:
    ``round(a * pow(b, CAST(origin - i AS BIGINT)) * x, 9)`` /
    ``CASE WHEN i = 1 THEN round(pow(b, CAST(origin AS BIGINT)) * x, 9)
    ELSE 0 END``.
    """
    w_term = F.round(
        alpha * F.pow(F.lit(beta), (origin - hist_i).cast("bigint")) * value,
        ndigits,
    )
    init_term = F.when(
        hist_i == 1,
        F.round(F.pow(F.lit(beta), origin.cast("bigint")) * value, ndigits),
    ).otherwise(0.0)
    return w_term, init_term


def pearson_r(
    kd: Column, sx: Column, sy: Column, sxy: Column, sxx: Column, syy: Column
) -> Column:
    """Pearson correlation from moment columns:
    ``(k*Sxy - Sx*Sy) / (sqrt(k*Sxx - Sx^2) * sqrt(k*Syy - Sy^2))``."""
    return (kd * sxy - sx * sy) / (
        F.sqrt(kd * sxx - sx * sx) * F.sqrt(kd * syy - sy * sy)
    )
