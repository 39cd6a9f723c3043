"""Sequence packing: assign documents to fixed-length training sequences.

GPT-style pretraining concatenates the token stream of a shard in a
deterministic order and cuts it into fixed-length sequences; a document
whose tokens straddle a cut belongs to two (or more) sequences. That
assignment is pure window arithmetic — no Python, no per-row UDF:

* order docs within each shard by an engine-portable hash (md5 of the
  id, like the per-group sampler) so the packing is identical across
  runs, engines, and cluster sizes;
* running token total per shard via a rows-unbounded-preceding window
  (one shuffle on the shard key — each shard packs independently, which
  is exactly how a 100 TB corpus is packed in practice: per output
  shard, never globally);
* a doc's first/last sequence index is integer division of the running
  total before/after it by the sequence length.

The reference engine has no notion of training-sample preparation; this
is part of the pipeline-extension surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str,
    shard_col: str,
    seq_len: int = 512,
) -> DataFrame:
    """Per-document packing assignment.

    Input: one row per document with a token count (``token_col``),
    stable id, and shard key. Zero-token docs are dropped (they occupy
    no positions in the stream). Output adds:

    * ``cum_tokens``  — running token total within the shard, inclusive;
    * ``first_seq``   — index of the sequence this doc starts in;
    * ``last_seq``    — index of the sequence this doc ends in;
    * ``n_straddles`` — how many sequence boundaries the doc crosses
      (``last_seq - first_seq``).

    Sequence indices are 0-based per shard. The shard's sequence count
    is ``floor((max(cum_tokens) - 1) / seq_len) + 1``.
    """
    w = (
        W.partitionBy(shard_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    toks = F.col(token_col).cast("bigint")
    out = df.filter(toks > 0).withColumn("cum_tokens", F.sum(toks).over(w))
    # integer `div`, not `/`: double division would lose exactness past
    # 2^53 cumulative tokens — a real corpus gets there.
    first = F.expr(f"(cum_tokens - CAST({token_col} AS BIGINT)) div {seq_len}")
    last = F.expr(f"(cum_tokens - 1) div {seq_len}")
    return (
        out.withColumn("first_seq", first)
        .withColumn("last_seq", last)
        .withColumn("n_straddles", (last - first).cast("bigint"))
    )
