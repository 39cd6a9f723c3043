"""Similarity search over embedding columns.

Two strategies:

* ``brute_topk`` — exact cosine top-k: broadcast the (small) query set
  against the corpus, score with codegen'd array math, take top-k per
  query with a window. The corpus is only scanned once and never
  shuffled — the right baseline even at 100 TB when the query set fits
  in a broadcast.
* ``lsh_topk`` — approximate: bucket corpus and queries by
  sign-bit LSH (functions.vectors.sign_bucket), score only within
  matching buckets. Turns the scan into a hash-join on the bucket key;
  recall traded via ``bits``.

No Python UDFs anywhere — scoring is zip_with/aggregate (JVM).
The reference has no similarity surface (extension per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.vectors import cosine, norm, sign_bucket


def _scored(queries: DataFrame, corpus: DataFrame, qid: str, cid: str, vec: str) -> DataFrame:
    q = queries.select(F.col(qid).alias("qid"), F.col(vec).alias("qvec"))
    c = corpus.select(F.col(cid).alias("cid"), F.col(vec).alias("cvec"))
    return q.crossJoin(c).select(
        "qid", "cid", cosine(F.col("qvec"), F.col("cvec")).alias("cosine")
    )


def brute_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid: str = "vec_id",
    cid: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Returns (qid, cid, cosine, rank)."""
    scored = _scored(F.broadcast(queries), corpus, qid, cid, vec)
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 4,
    qid: str = "vec_id",
    cid: str = "vec_id",
    vec: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the sign-bit LSH bucket.

    Returns (qid, cid, cosine, rank) — rank within the bucket's
    candidates. Recall < 1; raise ``bits``→smaller buckets/faster,
    lower ``bits``→better recall. ``exclude_self`` drops qid == cid
    candidates before ranking (for corpus ⊇ queries self-search).
    """
    q = queries.select(
        F.col(qid).alias("qid"),
        F.col(vec).alias("qvec"),
        sign_bucket(F.col(vec), bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(cid).alias("cid"),
        F.col(vec).alias("cvec"),
        sign_bucket(F.col(vec), bits).alias("bucket"),
    )
    scored = q.join(c, "bucket")
    if exclude_self:
        scored = scored.filter(F.col("qid") != F.col("cid"))
    scored = scored.select(
        "qid", "cid", cosine(F.col("qvec"), F.col("cvec")).alias("cosine")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec: str = "embedding",
    bits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets.

    Exact within buckets; pairs whose cosine exceeds ``threshold``.
    Sign-LSH buckets can miss boundary pairs (vectors straddling a
    hyperplane); for guaranteed recall run with bits=0 (full scan).
    Returns (id_a, id_b, cosine).
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec).alias("va"),
        *([sign_bucket(F.col(vec), bits).alias("bucket")] if bits else []),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec).alias("vb"),
        *([sign_bucket(F.col(vec), bits).alias("bucket")] if bits else []),
    )
    joined = a.join(b, "bucket") if bits else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") > threshold)
    )
