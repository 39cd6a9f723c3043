"""Mergeable frequency sketches (count-min) as relational tables.

A count-min sketch is the classic sub-linear answer to "how often does
item X occur in a 100 TB stream" — a depth x width counter grid where
each row hashes the item independently and the estimate is the MIN over
rows (over-count only, never under). Represented here as a plain
(d, bucket, cnt) DataFrame:

* building is one explode (depth rows per item) + one keyed aggregation
  with map-side partial combine, so the exchange carries at most
  depth*width rows per partition regardless of input size;
* two sketches merge by unioning and re-summing (cnt is additive) —
  the property that makes the sketch work across partitions, days, or
  clusters;
* lookups broadcast the (tiny) sketch to the probe side.

Hashing is md5-prefix arithmetic (``conv(substr(md5(d#item),1,8))``)
— engine-portable, so a DuckDB oracle can rebuild the identical grid
(same equivalence already used by the dedup/split operators:
queries/pipeline.py notes '0x'||substr(md5..) == conv(..,16,10)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(item: Column, d: Column, width: int) -> Column:
    key = F.concat(d.cast("string"), F.lit("#"), item)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % width


def countmin_sketch(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build a (d, bucket, cnt) count-min grid over the item instances."""
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    pairs = items.select(F.col(item_col).alias("__item"), d)
    return (
        pairs.select("d", _bucket(F.col("__item"), F.col("d"), width).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    assume_distinct: bool = False,
) -> DataFrame:
    """Estimate each probe item's frequency: probes + an ``est`` column.

    Strictly row-preserving: the estimate is a pure function of the
    ITEM VALUE, so it is computed once per DISTINCT item (the same
    explode → broadcast-join → min plan as before, whose grouping key
    is now the item) and joined back onto the probes — duplicate probe
    rows stay duplicated (the earlier groupBy-on-all-probe-columns
    silently collapsed them), at the cost of one extra equi-join that
    AQE broadcasts when the distinct-item table is small. A bucket
    missing from the sketch means zero occupancy, i.e. estimate 0
    (coalesce).

    ``assume_distinct=True`` is the caller's assertion that probe rows
    are already unique per item (e.g. the output of a groupBy) — it
    skips the join-back and groups the exploded rows by the probe
    columns directly, saving one join on small-query paths (measured
    ~2x on the r68 bench entry).

    NULL-item probes get ``est = 0`` on both paths: a NULL item hashes
    to a NULL bucket (concat/md5 are null-rejecting) and misses every
    sketch cell, and the join-back matches NULL items null-safely so
    the 0 survives instead of degrading to a NULL est.
    """
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    if assume_distinct:
        keyed = probes.withColumn("__d", d).withColumn(
            "bucket", _bucket(F.col(item_col), F.col("__d"), width)
        )
        joined = keyed.join(
            F.broadcast(sketch),
            (keyed["__d"] == sketch["d"]) & (keyed["bucket"] == sketch["bucket"]),
            "left",
        )
        return joined.groupBy(*[probes[c] for c in probes.columns]).agg(
            F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est")
        )
    keyed = (
        probes.select(F.col(item_col).alias("__probe_item"))
        .distinct()
        .withColumn("__d", d)
        .withColumn("bucket", _bucket(F.col("__probe_item"), F.col("__d"), width))
    )
    joined = keyed.join(
        F.broadcast(sketch),
        (keyed["__d"] == sketch["d"]) & (keyed["bucket"] == sketch["bucket"]),
        "left",
    )
    est_by_item = joined.groupBy("__probe_item").agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est")
    )
    # Null-safe join-back: a NULL probe item hashes to a NULL bucket and
    # misses every sketch cell, so its estimate is 0 like any unseen
    # item — a plain equi-join would drop the match and leave est NULL
    # for NULL-item rows, breaking the row-preserving contract's "est is
    # always populated" reading (round-6 ADVICE).
    return probes.join(
        est_by_item, probes[item_col].eqNullSafe(est_by_item["__probe_item"]), "left"
    ).select(*[probes[c] for c in probes.columns], "est")


def _bloom_pos(key: Column, i: Column, m: int) -> Column:
    """Engine-portable bit position: md5('key:i') prefix mod m."""
    h = F.md5(F.concat(key.cast("string"), F.lit(":"), i.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % m


def bloom_build(keys: DataFrame, key_col: str, m: int = 8192, k: int = 3) -> DataFrame:
    """Build a Bloom filter over the keys as its distinct set-bit positions.

    The relational form of the classic bitmap: one (pos) row per set bit,
    at most ``m`` rows total regardless of build-side size, produced by a
    map-side explode (k rows per key) + one distinct. Two filters merge
    by union+distinct — the mergeability that lets each ingest batch or
    partition build its own filter. md5-prefix hashing keeps the filter
    engine-portable (a DuckDB/Trino job can build or probe the identical
    bit set: '0x'||substr(md5(..),1,8) == conv(..,16,10), the repo-wide
    hash equivalence).
    """
    i = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("i")
    pairs = keys.select(F.col(key_col).alias("__key"), i)
    return pairs.select(_bloom_pos(F.col("__key"), F.col("i"), m).alias("pos")).distinct()


def bloom_probe(
    probes: DataFrame,
    key_col: str,
    bits: DataFrame,
    m: int = 8192,
    k: int = 3,
    out: str = "bloom_pass",
) -> DataFrame:
    """Append a boolean ``out`` column: could the key be in the built set?

    A key passes iff ALL of its k positions are set (no false negatives;
    false-positive rate ~(1-e^{-kn/m})^k). The filter is a tiny broadcast
    — the 100 TB use is pruning a huge probe scan down to candidate rows
    BEFORE an expensive exact join or shuffle, the same role as Spark's
    runtime row-group filters but as an explicit, persistable operator.
    Distinct (key, pos) pairs are probed so a key whose hashes collide
    into fewer than k distinct positions is still judged on exactly the
    positions it owns. A NULL probe key gets ``False`` (it hashes to no
    positions, so it cannot be a member): the verdict join is null-safe
    and the output column is coalesced, never NULL.
    """
    i = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("i")
    pairs = (
        probes.select(F.col(key_col).alias("__key"), i)
        .select("__key", _bloom_pos(F.col("__key"), F.col("i"), m).alias("pos"))
        .distinct()
    )
    hit = pairs.join(
        F.broadcast(bits.withColumn("__hit", F.lit(1))), "pos", "left"
    )
    verdict = hit.groupBy("__key").agg(
        (F.min(F.coalesce("__hit", F.lit(0))) == 1).alias(out)
    )
    return (
        probes.join(verdict, probes[key_col].eqNullSafe(verdict["__key"]), "left")
        .drop("__key")
        .withColumn(out, F.coalesce(F.col(out), F.lit(False)))
    )
