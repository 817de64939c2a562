"""Iterative clustering over embeddings (q102–q103): Lloyd's k-means as a
DataFrame fixpoint loop — the canonical iterative algorithm on Spark.

Pattern: each iteration is one broadcast join (centroids are always tiny)
plus one aggregation; the corpus never shuffles. The driver loop holds
only k×dim floats. At 100 TB you add a sampled init (k-means||) and stop
on movement < ε; the per-iteration plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import dot, dot_sql
from ..io import table
from ..registry import query

_K = 8


def assign_to_centroids(em: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (cosine, unit-norm ⇒ dot): broadcast
    the centroid set, rank per vector, keep the argmax — deterministic
    (cent_id tiebreak)."""
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    return (
        em.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "embedding",
            "cent_id",
            dot(F.col("embedding"), F.col("cent_emb")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cent_id")
    )


def recompute_centroids(assigned: DataFrame) -> DataFrame:
    """Element-wise mean of member vectors per cluster: posexplode to
    (cluster, dim, value), decimal-sum per cell, reassemble ordered arrays.
    Exact and order-independent — the same discipline as every other
    aggregate in this engine."""
    cells = assigned.select(
        "cent_id", F.posexplode("embedding").alias("dim", "v")
    )
    means = cells.groupBy("cent_id", "dim").agg(
        (F.sum(F.col("v").cast("decimal(28,12)")).cast("double") / F.count("v")).alias(
            "m"
        )
    )
    return (
        means.groupBy("cent_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "m"))
            ).alias("cells")
        )
        .select(
            "cent_id",
            F.expr("transform(cells, c -> CAST(c.m AS FLOAT))").alias("cent_emb"),
        )
    )


def kmeans(spark, sf_dir, k: int = _K, iterations: int = 3) -> DataFrame:
    """Lloyd iterations with deterministic init (first k vectors). Returns
    the final assignment."""
    em = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = em.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb")
    )
    assigned = assign_to_centroids(em, centroids)
    for _ in range(iterations - 1):
        centroids = recompute_centroids(assigned)
        assigned = assign_to_centroids(em, centroids)
    return assigned


@query(
    "q102_dedup_hash",
    oracle="""
    SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper
    FROM documents GROUP BY md5(text)
    """,
)
def q102_dedup_hash(spark, sf_dir) -> DataFrame:
    """Exact dedup on a content HASH instead of raw text — at 100 TB the
    shuffle carries 16-byte digests, not documents; collision risk at
    md5 width is negligible and a keeper re-read confirms if needed."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper")
    )


@query(
    "q103_kmeans_assign",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb FROM embeddings
        WHERE vec_id < {_K}
    )
    SELECT vec_id, cent_id FROM (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {dot_sql('e.embedding', 'c.cent_emb')} DESC, c.cent_id
               ) AS rn
        FROM embeddings e CROSS JOIN centroids c
    ) WHERE rn = 1
    """,
)
def q103_kmeans_assign(spark, sf_dir) -> DataFrame:
    """One k-means assignment step (the oracle-checkable kernel of the
    iterative loop; full Lloyd iterations exercised in tests — float means
    across engines drift, so the fixpoint itself is rows-only territory)."""
    em = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = em.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb")
    )
    return assign_to_centroids(em, centroids).select("vec_id", "cent_id")
