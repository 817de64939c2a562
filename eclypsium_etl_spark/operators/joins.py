"""Joins — SURVEY.md §2.3 (q11–q19).

All absent from the reference (its data model is one flat table,
mercadolibre_pipeline_dag.py:50-65); required by the project north-star.

Scale notes baked into each query:
- Equi joins on big tables shuffle both sides on the key — at 100 TB the
  win is co-partitioning (bucketing) or AQE skew splitting; locally we let
  Catalyst pick SMJ/SHJ and verify the plan shape in tests.
- Dimension joins must broadcast (q12): an explicit ``F.broadcast`` hint
  pins the strategy rather than trusting the size estimate.
- Non-equi ranges (q17) must be anchored by at least one equi key or they
  degenerate to BroadcastNestedLoopJoin — anchored here on user_id.
- As-of joins (q18) have no native Spark operator: the union-tag + running
  ``last(ignorenulls)`` window is one shuffle (by key) and no join at all —
  the 100 TB-friendly formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import dsum, dsum_sql
from ..io import table
from ..registry import query


@query(
    "q11_join_inner_hash",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q11_join_inner_hash(spark, sf_dir) -> DataFrame:
    """Equi inner join; Catalyst picks the physical strategy (SMJ/SHJ),
    AQE may demote to broadcast at runtime when the build side is small."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q12_join_broadcast",
    oracle=f"""
    SELECT p.p_brand, COUNT(*) AS n_items,
           {dsum_sql('l.l_extendedprice')} AS brand_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q12_join_broadcast(spark, sf_dir) -> DataFrame:
    """Broadcast hash join: part is a dimension (20k rows at sf0.1) — ship
    it to every executor, no shuffle of the 600k/100 TB fact side."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("brand_revenue"),
        )
    )


@query(
    "q13_join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q13_join_left_outer(spark, sf_dir) -> DataFrame:
    """Left outer join keeping customers with no orders (n_orders = 0;
    COUNT over the nullable side counts only matches)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


_HIGH_VALUE = 400_000.0


@query(
    "q14_join_semi",
    oracle=f"""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {_HIGH_VALUE})
    """,
)
def q14_join_semi(spark, sf_dir) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one high-value order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _HIGH_VALUE)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q15_join_anti",
    oracle=f"""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {_HIGH_VALUE})
    """,
)
def q15_join_anti(spark, sf_dir) -> DataFrame:
    """Left anti join (NOT EXISTS): complement of q14."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _HIGH_VALUE)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q16_join_multiway",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n    ON n.n_regionkey = r.r_regionkey
    JOIN customer c  ON c.c_nationkey = n.n_nationkey
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q16_join_multiway(spark, sf_dir) -> DataFrame:
    """Snowflake join, TPC-H Q5 shape: region→nation→customer→orders→
    lineitem→supplier with the local-supplier constraint. region/nation/
    supplier broadcast; the orders date filter pushes to the scan; only
    the orders⋈lineitem join shuffles big data."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


@query(
    "q17_join_theta_range",
    oracle="""
    SELECT a.event_id AS eid_a, b.event_id AS eid_b, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    """,
)
def q17_join_theta_range(spark, sf_dir) -> DataFrame:
    """Range (theta) join anchored on an equi key: pairs of events by the
    same user within (0, 10 min]. The user_id anchor keeps this a shuffled
    equi join with a residual range filter — never a nested-loop join."""
    e = table(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            F.col("a.event_id").alias("eid_a"),
            F.col("b.event_id").alias("eid_b"),
            F.col("a.user_id").alias("user_id"),
        )
    )


@query(
    "q18_join_asof",
    oracle="""
    SELECT e.event_id, e.ts,
           (SELECT max(p.ts) FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts <= e.ts) AS last_purchase_ts
    FROM events e WHERE e.event_type = 'click'
    """,
)
def q18_join_asof(spark, sf_dir) -> DataFrame:
    """As-of join (latest purchase at-or-before each click, per user).

    No native as-of in Spark SQL — the scalable pattern is union-tag +
    running ``last(ignorenulls)`` window: one shuffle on user_id, no join,
    no per-row subquery. Purchases sort before clicks at equal ts
    (event_type desc) so a same-instant purchase is visible to the click,
    matching the oracle's ``p.ts <= e.ts``.
    """
    from .. import ops

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    return ops.asof_join(clicks, purchases, "user_id", value_cols=[]).select(
        "event_id", "ts", F.col("ts_asof").alias("last_purchase_ts")
    )


@query(
    "q19_join_selfdedup",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           substring(a.text, 1, 40) AS shared_prefix
    FROM documents a JOIN documents b
      ON substring(a.text, 1, 40) = substring(b.text, 1, 40)
     AND a.doc_id < b.doc_id
    """,
)
def q19_join_selfdedup(spark, sf_dir) -> DataFrame:
    """Self-join on a computed key (shared 40-char prefix) — the groundwork
    for near-dup candidate generation (q63): compute the key once, shuffle
    on it, emit ordered pairs (a<b) so each pair appears exactly once."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("prefix")
    )
    a = d.alias("a")
    b = d.alias("b")
    return a.join(
        b,
        (F.col("a.prefix") == F.col("b.prefix"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.prefix").alias("shared_prefix"),
    )
