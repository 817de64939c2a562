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


@query(
    "q174_setops_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    UNION ALL
    SELECT -1 - nationkey AS nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def q174_setops_all(spark, sf_dir) -> DataFrame:
    """Multiset set operations (INTERSECT ALL / EXCEPT ALL) — bag
    semantics where q40/q41 are the ANSI-distinct forms: each nation key
    survives min(c_count, s_count) times in the intersection and
    c_count − s_count times in the difference. Spark plans both without
    materializing duplicates row-by-row (internally a counted aggregate
    + generate), so the shuffle carries (key, count), not the bag — the
    rollup here makes the multiplicities the checked value. The EXCEPT
    ALL branch is key-shifted (−1−k) so both branches coexist in one
    result without column games."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    inter = (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
    )
    diff = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .select((F.lit(-1) - F.col("nationkey")).alias("nationkey"), "n")
    )
    return inter.unionByName(diff)


@query(
    "q175_limit_offset",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20 OFFSET 40
    """,
)
def q175_limit_offset(spark, sf_dir) -> DataFrame:
    """LIMIT + OFFSET pagination over a total order. Offset pagination
    executes as a top-(offset+limit) followed by a skip — cost grows
    with page depth, which is why deep pagination at scale uses keyset
    continuation (WHERE key > last_seen ORDER BY key LIMIT n, i.e. the
    q36 shape with a pushed filter) instead; the total order (tiebreak
    on c_custkey) is what makes either form deterministic."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 20 OFFSET 40
        """
    )


@query(
    "q280_union_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_orderpriority, CAST(NULL AS VARCHAR) AS o_channel
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority, 'web' AS o_channel
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def q280_union_schema_evolution(spark, sf_dir) -> DataFrame:
    """Schema-evolution union — unionByName(allowMissingColumns=True),
    the operator every multi-vintage data lake needs: an old extract
    (has o_orderpriority, predates o_channel) unions with a new one
    (dropped o_orderpriority, added o_channel), columns align BY NAME,
    and each side's missing columns fill with typed NULLs. Positional
    UNION would silently zip mismatched columns — the classic silent-
    corruption bug this operator exists to prevent (and the reason
    unionByName is the only union spelled out in this repo's USAGE
    guidance for heterogeneous sources). The oracle states the aligned
    result with explicit NULL casts. Pure scan-stage, no shuffle."""
    o = table(spark, sf_dir, "orders")
    old_vintage = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    new_vintage = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", F.lit("web").alias("o_channel")
    )
    return old_vintage.unionByName(new_vintage, allowMissingColumns=True)


@query(
    "q346_keyset_pagination",
    oracle="""
    WITH tok AS (
        SELECT c_acctbal AS last_bal, c_custkey AS last_key
        FROM customer
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 1 OFFSET 39
    )
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c, tok
    WHERE c.c_acctbal < tok.last_bal
       OR (c.c_acctbal = tok.last_bal AND c.c_custkey > tok.last_key)
    ORDER BY c.c_acctbal DESC, c.c_custkey
    LIMIT 20
    """,
)
def q346_keyset_pagination(spark, sf_dir) -> DataFrame:
    """KEYSET-CONTINUATION PAGINATION — q175's named-but-unregistered
    scale path (VERDICT r9 #5c): page N+1 is fetched as
    "strictly after the last row of page N under the total order"
    (WHERE (bal, key) < (last_bal, last_key) lexicographically,
    ORDER BY, LIMIT page), NOT as LIMIT page OFFSET N*page. Offset
    pagination is a top-(offset+limit): every page re-sorts and skips
    everything before it, so page depth multiplies work — at 100 TB,
    page 10^6 of an offset scan is a full-table top-20M. The keyset
    predicate instead PUSHES to the scan (parquet min/max skips whole
    row groups once the data is sorted/z-ordered by the pagination
    key) and every page is the same cheap TakeOrderedAndProject of the
    surviving suffix.

    The continuation token here is derived in-plan (the 40th row under
    the total order, i.e. the tail of page 2) purely so the query is
    self-contained and oracled in closed form; a real pager carries the
    token client-side from the previous page's last row. The token join
    is a broadcast of ONE row (the audited 1-row crossJoin family).
    Rows tie on c_acctbal, which is exactly why the key tiebreak is in
    the token and in the predicate: keyset pagination without a total
    order silently drops or repeats tied rows at page boundaries.
    Result is row-identical to q175 (OFFSET 40 LIMIT 20) by
    construction — the equivalence IS the demonstration. DataFrame
    .offset() mirrors the oracle's OFFSET in all cardinalities
    (including fixtures with <40 rows, where both come up empty)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    token = (
        cust.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .offset(39)
        .limit(1)
        .select(
            F.col("c_acctbal").alias("last_bal"),
            F.col("c_custkey").alias("last_key"),
        )
    )
    after_token = (F.col("c_acctbal") < F.col("last_bal")) | (
        (F.col("c_acctbal") == F.col("last_bal"))
        & (F.col("c_custkey") > F.col("last_key"))
    )
    return (
        cust.join(F.broadcast(token), after_token)
        .select("c_custkey", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
