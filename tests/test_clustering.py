"""Iterative k-means: convergence behavior on the fixture embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from eclypsium_etl_spark.io import table
from eclypsium_etl_spark.llm.clustering import kmeans

from .conftest import SF_SMOKE


def test_kmeans_iterations_improve_objective(spark):
    """More Lloyd iterations must not decrease mean within-cluster cosine
    (the objective k-means on unit vectors maximizes)."""
    from eclypsium_etl_spark.functions import dot
    from eclypsium_etl_spark.llm.clustering import recompute_centroids

    def objective(assigned):
        cents = recompute_centroids(assigned)
        joined = assigned.join(cents, "cent_id")
        return (
            joined.select(
                dot(
                    F.col("embedding"), F.col("cent_emb")
                ).alias("sim")
            )
            .agg(F.avg("sim"))
            .collect()[0][0]
        )

    one = objective(kmeans(spark, SF_SMOKE, iterations=1))
    three = objective(kmeans(spark, SF_SMOKE, iterations=3))
    assert three >= one - 1e-9, (one, three)


def test_kmeans_assignment_complete_and_stable(spark):
    """Every vector assigned to exactly one cluster; rerun is identical
    (deterministic init + tiebreaks)."""
    a = kmeans(spark, SF_SMOKE, iterations=2)
    n_vecs = table(spark, SF_SMOKE, "embeddings").count()
    assert a.count() == n_vecs
    m1 = {r.vec_id: r.cent_id for r in a.collect()}
    m2 = {r.vec_id: r.cent_id for r in kmeans(spark, SF_SMOKE, iterations=2).collect()}
    assert m1 == m2
