"""Sorts / limits / top-k — SURVEY.md §2.6 (q35–q37).

Scale notes: a global ORDER BY is a range-partitioned sort (sampling pass
+ full shuffle) — acceptable for final small outputs only. ORDER BY +
LIMIT never does that: Catalyst plans TakeOrderedAndProject (per-partition
top-n, then merge of n-sized heaps — no global sort, no full shuffle).
Per-group top-k (q37) is the 100 TB workhorse: one shuffle on the group
key, heap per group, nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..io import table
from ..registry import query


@query(
    "q35_orderby",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q35_orderby(spark, sf_dir) -> DataFrame:
    """Global total-order sort (range partition + sort). The o_orderkey
    tiebreak makes the order total — required for deterministic comparison
    and good practice anyway."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


@query(
    "q36_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q36_limit(spark, sf_dir) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject: per-partition heaps, no
    global sort. Plan shape asserted in tests."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q37_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def q37_topk_per_group(spark, sf_dir) -> DataFrame:
    """Top-k per group via row_number window + filter. At 100 TB this beats
    any global-sort formulation: shuffle once on the group key, rank within
    partitions (AQE keeps partitions balanced), emit k rows per group."""
    from .. import ops

    c = table(spark, sf_dir, "customer")
    return ops.topk_per_group(
        c, ["c_nationkey"], [F.desc("c_acctbal"), F.asc("c_custkey")], 3
    ).select("c_nationkey", "c_custkey", "c_acctbal")
