"""Embedding similarity-search queries over the ``embeddings`` table.

Exercises operators/similarity.py. Oracle uses DuckDB list functions
over ``DOUBLE[]`` casts; both engines accumulate dot products
sequentially in double, which is bit-identical (validated in
tests/test_oracle_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import t
from ..functions.vectors import norm
from ..operators.similarity import brute_topk, embedding_dup_pairs, lsh_topk

_COS = (
    "list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))"
)


@register(
    "q70_knn_brute_force",
    f"""
    SELECT qid, cid, cosine, CAST(rank AS INT) AS rank
    FROM (
      SELECT q.vec_id AS qid, c.vec_id AS cid, {_COS} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {_COS} DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id >= 10
      WHERE q.vec_id < 10
    ) ranked
    WHERE rank <= 5
    ORDER BY qid, rank
    """,
    tags=("vectors", "knn"),
)
def q70_knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    return (
        brute_topk(queries, corpus, k=5)
        .select("qid", "cid", "cosine", F.col("rank").cast("int").alias("rank"))
        .orderBy("qid", "rank")
    )


@register(
    "q71_ann_sign_lsh",
    f"""
    WITH coded AS (
      SELECT vec_id, embedding,
             concat(
               CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END
             ) AS bucket
      FROM embeddings
    )
    SELECT qid, cid, cosine, CAST(rank AS INT) AS rank
    FROM (
      SELECT q.vec_id AS qid, c.vec_id AS cid, {_COS} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {_COS} DESC, c.vec_id) AS rank
      FROM coded q JOIN coded c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
    ) ranked
    WHERE rank <= 3
    ORDER BY qid, rank
    """,
    tags=("vectors", "ann", "lsh"),
)
def q71_ann_sign_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return (
        lsh_topk(queries, emb, k=3, bits=4, exclude_self=True)
        .select("qid", "cid", "cosine", F.col("rank").cast("int").alias("rank"))
        .orderBy("qid", "rank")
    )


@register(
    "q72_embedding_norms",
    """
    SELECT label,
           COUNT(*) AS n,
           CAST(SUM(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[]))) AS DECIMAL(18,6))) AS DOUBLE) AS total_norm
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
    tags=("vectors", "aggregate"),
)
def q72_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(norm(F.col("embedding")).cast("decimal(18,6)")).cast("double").alias("total_norm"),
        )
        .orderBy("label")
    )
