"""Set operations — SURVEY.md §2.7 (q38–q41).

q38 is the reference's accumulation loop (``PRODUCTS += ...``,
mercadolibre_pipeline_dag.py:44-45) as a lazy plan node; the rest are
absent from the reference. Spark `union` == UNION ALL (SURVEY §5.2.3) —
distinct unions must say `.distinct()` explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..io import table
from ..registry import query


def _slices(spark, sf_dir) -> tuple[DataFrame, DataFrame]:
    """Two deliberately-overlapping order slices (finished orders / urgent
    orders) so ALL-vs-DISTINCT semantics are actually distinguishable."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    return (
        o.filter(F.col("o_orderstatus") == "F"),
        o.filter(F.col("o_orderpriority") == "1-URGENT"),
    )


@query(
    "q38_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q38_union_all(spark, sf_dir) -> DataFrame:
    """UNION ALL — metadata-only plan composition, no shuffle, duplicates
    preserved (rows in both slices appear twice)."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b)


@query(
    "q39_union_distinct",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q39_union_distinct(spark, sf_dir) -> DataFrame:
    """UNION (distinct) — union-all plus a hash aggregate on all columns
    (one shuffle)."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b).distinct()


@query(
    "q40_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q40_intersect(spark, sf_dir) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q41_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q41_except(spark, sf_dir) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers.
    (exceptAll exists for multiset semantics; distinct here to match the
    ANSI default.)"""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)
