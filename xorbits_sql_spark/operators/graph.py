"""Iterative graph algorithms as pure dataflow.

Companion to operators/dedup.connected_components (min-label
propagation): PageRank with a FIXED iteration count, expressed entirely
as joins + keyed aggregations so an SQL oracle can replay it
iteration-by-iteration. No vertex-centric framework, no driver-side
loop state — the "loop" is Python building a deeper lazy plan, and the
per-iteration rank tables are persisted (they are one row per node) so
consumers execute the chain once, not once per reference.

Scale shape per iteration: one join of the rank table onto the edge
list keyed by source (both sides hash-partitioned on the node id — the
Exchange is reused across iterations since the key never changes), one
aggregation keyed by destination. Contributions are FLOOR-quantized to
1e-18 grains and summed as exact integers (DECIMAL(38,0)), which makes
every iteration's ranks independent of partition/merge order —
reproducible on any cluster and bit-equal to the DuckDB replay. floor()
rather than a double->DECIMAL cast because the engines' cast rounding
modes differ (half-up vs half-even) while floor is mode-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _persist


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list; returns (id, pr).

    Feed symmetric edges for an undirected graph. Every node must
    appear as a source (true for symmetric input), so there are no
    dangling-mass corrections. The node count enters the formula via a
    one-row broadcast aggregate, never a driver-side ``count()``.
    """
    # The caller's edge lineage is often expensive (a join + distinct);
    # without this persist both `deg` and `ed` below would re-derive it.
    edges = _persist(edges)
    deg = _persist(edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg")))
    n1 = deg.agg(F.count(F.lit(1)).alias("__n"))
    ranks = _persist(
        deg.crossJoin(F.broadcast(n1)).select(
            F.col(src).alias("id"), (F.lit(1.0) / F.col("__n")).alias("pr")
        )
    )
    ed = _persist(edges.join(deg, src).select(src, dst, "deg"))
    for _ in range(n_iter):
        contribs = (
            ed.join(ranks, ed[src] == ranks["id"])
            .select(F.col(dst).alias("id"), (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(
                (
                    F.sum(F.floor(F.col("c") * F.lit(1e18)).cast("decimal(38,0)")).cast("double")
                    / F.lit(1e18)
                ).alias("s")
            )
        )
        ranks = _persist(
            contribs.crossJoin(F.broadcast(n1)).select(
                "id",
                ((1.0 - damping) / F.col("__n") + damping * F.col("s")).alias("pr"),
            )
        )
    return ranks
