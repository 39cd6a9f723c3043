"""Byte-pair-encoding merge learning as a distributed Spark loop.

Learns the top-k BPE merges (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units") over a document
corpus. The reference engine has no tokenizer training at all
(reference executor.py covers only relational steps); this is part of
the training-data-pipeline extension surface.

Scale shape — the standard BPE corpus loop re-expressed shuffle-native:

* The corpus collapses to the distinct-word frequency table first
  (one token-keyed count aggregation with map-side combine); every
  subsequent iteration works on the *vocabulary*, whose size grows
  sublinearly with corpus bytes, never on the corpus itself.
* Each iteration is one adjacent-pair count over the vocabulary's
  symbol arrays (narrow transform + explode + count) followed by a
  single-row argmax collect — a driver-side scalar per iteration, the
  same deliberately-bounded pattern as connected-components'
  convergence check (operators/graph.py), not a data collect.
* The merge is applied with a codegen'd array fold (no Python UDF);
  the symbol table is localCheckpoint'ed per iteration, so both the
  execution lineage AND the logical plan stay O(1) across k (a plain
  persist left the plan k-deep and driver-side analysis superlinear).

k is small (a real tokenizer trains 30-50k merges; this operator is
the corpus-scale pair-statistics engine — the same loop at k=30000
would batch argmax selection, noted in ``learn_bpe_merges``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.text import norm_ws

MERGE_SCHEMA = StructType(
    [
        StructField("rank", LongType(), False),
        StructField("left", StringType(), False),
        StructField("right", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, wc) distinct-word frequency table for the corpus."""
    return (
        docs.select(F.explode(F.split(norm_ws(F.col(text_col)), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _adjacent_pairs(syms_col: str) -> F.Column:
    # (syms[i], syms[i+1]) for every adjacent position, 0-based lambdas
    return F.expr(
        f"transform(slice({syms_col}, 1, size({syms_col}) - 1), "
        f"(x, i) -> struct(x AS l, {syms_col}[i + 1] AS r))"
    )


def _apply_merge(a: str, b: str) -> F.Column:
    """Fold the symbol array, fusing every leftmost non-overlapping
    (a, b) adjacency into the merged symbol — equivalent to the classic
    greedy left-to-right scan, but whole-stage-codegen'd."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Learn the top-``k`` BPE merges over ``docs[text_col]``.

    Returns a k-row DataFrame (rank, left, right, merged, pair_count).
    Deterministic: argmax ties break on (count DESC, left ASC, right
    ASC), so the learned merge table is reproducible at any
    parallelism. Iteration stops early when no pair reaches
    ``min_count``.

    At production merge counts (30-50k), selecting one merge per
    Spark job round-trips too often; the batching refinement is to take
    the top-N non-interacting pairs (no shared symbol) per iteration,
    which this loop's argmax step generalizes to. k here is the
    per-call budget, not an algorithmic limit.
    """
    spark = docs.sparkSession
    vocab = word_frequencies(docs, text_col)
    # localCheckpoint (eager), not persist: a persist keeps EXECUTION
    # lineage O(1) but the LOGICAL plan still nests one _apply_merge
    # aggregate-lambda per iteration, so Catalyst re-analyzes a k-deep
    # expression tree every round — measured ~4.5 s of driver-side
    # planning gaps for k=8 at sf0.1 (round-11 profile; guide §7.3:
    # very large plans spend their time in the optimizer; §3.3:
    # localCheckpoint truncates the plan). The checkpoint runs the
    # merge application as its own job — the same one execution per
    # iteration the old argmax-materializes-the-cache flow did — and
    # each round's plan stays two operators deep. Checkpoint blocks are
    # freed by the ContextCleaner as previous iterations go out of
    # scope; no unpersist bookkeeping.
    syms = vocab.select(
        "wc", F.expr("filter(split(w, ''), x -> x <> '')").alias("syms")
    ).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    # Vocab rows are wide (a symbol array per word) and the per-round
    # pair explode multiplies them ~|word| times, so size the loop's
    # shuffles at 100k vocab rows per partition (guide §2 via
    # loop_shuffle_partitions: sf0.1's ~30k-word vocab runs each
    # argmax as one task instead of 100+ near-empty ones; a 100M-word
    # web-corpus vocab still gets ~1000 partitions). The count is one
    # partial-agg scan of the just-checkpointed table.
    from .dedup import loop_shuffle_partitions

    with loop_shuffle_partitions(spark, syms.count(), 100_000):
        for rank in range(1, k + 1):
            best = (
                syms.select("wc", F.explode(_adjacent_pairs("syms")).alias("p"))
                .groupBy("p.l", "p.r")
                .agg(F.sum("wc").alias("c"))
                .filter(F.col("c") >= min_count)
                .orderBy(F.desc("c"), "l", "r")
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
            merges.append((rank, a, b, a + b, c))
            syms = syms.select(
                "wc", _apply_merge(a, b).alias("syms")
            ).localCheckpoint()
    return spark.createDataFrame(merges, MERGE_SCHEMA)
