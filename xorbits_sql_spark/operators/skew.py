"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session defaults) handles most
skew at runtime by splitting oversized shuffle partitions — prefer it.
Explicit salting remains the tool when AQE can't apply: streaming
joins, skewed keys *inside* one partition after a non-shuffle stage, or
engines/strategies AQE won't re-plan (broadcast-ineligible hot keys in
a shuffled hash join).

Mechanics: the probe side gets a uniform salt in [0, salt); the build
side is replicated once per salt value; the join key becomes
(key, salt). A key carrying 1B rows then spreads over ``salt`` tasks
instead of one. Cost: build side is materialized ``salt`` times — pick
the smallest salt that flattens the skew.

The reference always does a plain pandas merge (reference
executor.py:431-471) with no skew strategy at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted.

    Semantically identical to ``left.join(right, on, how)`` for
    ``inner``/``left`` joins — every left row keeps exactly its
    original matches; the salt only spreads identical keys across
    ``salt`` shuffle partitions. The salt is independent of the key
    (uniform per row), which is the point: key-derived "salts" would
    send the hot key to one partition again.
    """
    if how not in {"inner", "left", "left_outer"}:
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn(_SALT, (F.rand(42) * salt).cast("int"))
    salted_right = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_left.join(salted_right, keys + [_SALT], how).drop(_SALT)


def approx_tiles(
    df: DataFrame,
    col: str,
    n: int = 4,
    accuracy: int = 10000,
    out: str = "tile",
) -> DataFrame:
    """Scalable NTILE: assign quantile tiles via approx-percentile cutoffs.

    Exact ``NTILE(n) OVER (ORDER BY col)`` funnels every row through a
    single window task (global total order). This replaces it with the
    two-step sketch plan that distributes: (1) one pass computing n-1
    approximate percentile cutoffs (t-digest style partial aggregation;
    the only driver-side data is the n-1 cutoff scalars — the same
    footprint as a broadcast threshold), then (2) a map-side WHEN chain
    assigning each row its tile. No shuffle, no global sort; tile
    populations deviate from exact NTILE only within the sketch's rank
    error (1/accuracy).

    Ties land in one tile (exact NTILE splits equal values across tile
    boundaries by row position), which is usually the *preferred*
    semantics for cohorting. A NULL measurement gets a NULL tile: the
    sketch never saw it (percentile_approx skips NULLs), and without
    the explicit guard the WHEN chain's NULL comparisons would fall
    through to ``otherwise(n)`` — silently cohorting no-data rows into
    the TOP tile.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    cuts = df.select(
        F.percentile_approx(col, [i / n for i in range(1, n)], accuracy).alias("c")
    ).first()["c"]
    tile = F.when(F.col(col).isNull(), F.lit(None)).when(
        F.col(col) <= cuts[0], 1
    )
    for i in range(1, n - 1):
        tile = tile.when(F.col(col) <= cuts[i], i + 1)
    return df.withColumn(out, tile.otherwise(n))
