"""Aggregations — SURVEY.md §2.4 (q20–q28).

The reference's only aggregates are degenerate (len() and an empty-check,
mercadolibre_pipeline_dag.py:49,84). Here: the full hash-aggregation
surface. Catalyst plans every groupBy as partial (map-side) → final
HashAggregate automatically — the shape that scales: the shuffle carries
pre-combined partials, not raw rows. Sums of doubles go through the
decimal trick (functions.dsum) so results are order-independent —
correctness at any partition count, not just oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import davg, davg_sql, dsum, dsum_sql
from ..io import spread, table
from ..registry import query


@query(
    "q20_agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           {davg_sql('l_extendedprice')} AS avg_price
    FROM lineitem
    """,
)
def q20_agg_global(spark, sf_dir) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg("l_extendedprice").alias("avg_price"),
    )


@query(
    "q21_agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q21_agg_groupby(spark, sf_dir) -> DataFrame:
    """TPC-H Q1 shape: the canonical two-phase hash aggregate.

    Filter first (so the shipdate predicate stays pushed at the scan),
    project to the 5 needed columns, then spread (io.spread, guide §2.5):
    the single-row-group fixture scan would otherwise run the six-fold
    decimal partial aggregate in ONE task. Keyed on l_extendedprice
    (high-cardinality) rather than round-robin — keyless repartition
    pays a sort-before-repartition inside the single scan task
    (SPARK-23207), measured 1.4-2.1 s round-robin vs 0.8 s hashed. No-op
    on multi-row-group layouts; all downstream aggregates are
    order-independent (decimal sums / count)."""
    li = spread(
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ),
        f"{sf_dir}/lineitem.parquet",
        "l_extendedprice",
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.count("*").alias("count_order"),
    )


@query(
    "q22_agg_distinct",
    oracle="""
    SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_segments,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
)
def q22_agg_distinct(spark, sf_dir) -> DataFrame:
    """DISTINCT aggregation — Catalyst expands count-distinct into a
    two-level aggregate (distinct keys first, then count)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.count("*").alias("n_customers"),
    )


@query(
    "q23_agg_approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT event_id) AS n_events,
           TRUE AS users_within_tol,
           TRUE AS events_within_tol
    FROM events
    """,
)
def q23_agg_approx_distinct(spark, sf_dir) -> DataFrame:
    """HyperLogLog++ count-distinct — the 100 TB substitute for exact
    count-distinct (no shuffle of distinct keys, fixed-size sketch).

    Bounds-checking oracle: sketch values differ across engines by design,
    so the emitted columns are the EXACT counts plus booleans asserting the
    HLL estimate landed within 3·rsd (15%) of them — the oracle states the
    exact counts and TRUE. A broken sketch flips a boolean and fails the
    value hash, so the approximate operator gets a full differential check
    instead of a rows-only row. The tolerance is three STANDARD ERRORS, not
    one: rsd is a σ, and a 1σ bound fails ~32% of (fixture, seed) draws —
    it did at sf0.1 (1500 users, estimate 5.6% off) while passing sf0.01. (The exact countDistinct alongside the
    sketch is the in-query verification, affordable at check scale; at
    100 TB you'd ship only the sketch.)"""
    e = table(spark, sf_dir, "events")
    agg = e.agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
        F.approx_count_distinct("event_id", rsd=0.05).alias("approx_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_id").alias("n_events"),
    )
    # n = 0 (an empty slice — the "empty day" every pipeline meets) is a
    # guarded branch, not a division: a sketch of nothing estimating 0 is
    # exactly right (ANSI division by zero otherwise kills the job — the
    # empty-input walk's finding)
    within = lambda a, n: F.when(  # noqa: E731
        F.col(n) == 0, F.col(a) == 0
    ).otherwise(
        F.abs(F.col(a).cast("double") - F.col(n)) / F.col(n) <= 0.15
    )
    return agg.select(
        "n_users",
        "n_events",
        within("approx_users", "n_users").alias("users_within_tol"),
        within("approx_events", "n_events").alias("events_within_tol"),
    )


@query(
    "q24_agg_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_sql('o_totalprice')} AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0
    """,
)
def q24_agg_rollup(spark, sf_dir) -> DataFrame:
    """Hierarchical subtotals. EMPTY-INPUT PIN (q24/q25/q26/q322): the
    SQL standard (and DuckDB) emit the grand-total grouping-set row even
    over zero input rows (a lone COUNT(*)=0 row); Spark's rollup/cube/
    grouping-sets emit NOTHING — inconsistent with Spark's own global
    aggregate, but engine-defined. The engine keeps Spark's behavior and
    every family oracle states it as HAVING COUNT(*) > 0 (a no-op on any
    non-empty input, where each grouping-set row aggregates >= 1 rows)."""
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )


@query(
    "q25_agg_cube",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
           {davg_sql('c_acctbal')} AS avg_bal
    FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
    HAVING COUNT(*) > 0
    """,
)
def q25_agg_cube(spark, sf_dir) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.cube("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("n"), davg("c_acctbal").alias("avg_bal")
    )


@query(
    "q26_agg_groupingsets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    HAVING COUNT(*) > 0
    """,
)
def q26_agg_groupingsets(spark, sf_dir) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               {dsum_sql("o_totalprice")} AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q27_agg_having",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS n, {dsum_sql('c_acctbal')} AS bal
    FROM customer GROUP BY c_nationkey
    HAVING COUNT(*) > 50 AND {dsum_sql('c_acctbal')} > 0
    """,
)
def q27_agg_having(spark, sf_dir) -> DataFrame:
    """Post-aggregation filter (HAVING) — just a filter above the aggregate
    in the logical plan; Catalyst can still prune/push the rest."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count("*").alias("n"), dsum("c_acctbal").alias("bal"))
        .filter((F.col("n") > 50) & (F.col("bal") > 0))
    )


@query(
    "q28_agg_collect",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS order_keys,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM (SELECT * FROM orders WHERE o_totalprice > 450000)
    GROUP BY o_custkey
    """,
)
def q28_agg_collect(spark, sf_dir) -> DataFrame:
    """collect_list / collect_set — the reference's row-accumulation into a
    JSON array (reference :76-87) as a distributed aggregate. sort_array +
    join to a string for deterministic cross-engine comparison."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450_000)
    # sort numerically BEFORE casting to string — string sort would put
    # "10" before "9" while the oracle's ORDER BY o_orderkey is numeric
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("o_orderkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("order_keys"),
        F.size(F.collect_set("o_orderstatus")).cast("long").alias("n_statuses"),
    )


@query(
    "q222_hll_sketch_union",
    oracle="""
    SELECT COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           TRUE AS union_within_tol
    FROM documents
    """,
)
def q222_hll_sketch_union(spark, sf_dir) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, hll_sketch_agg /
    hll_union_agg) — the 100 TB upgrade over q23's approx_count_distinct:
    the sketch itself is a first-class VALUE, so per-shard / per-day
    sketches can be stored and re-merged later without touching raw data
    (approx_count_distinct only yields a number; re-aggregation needs a
    full rescan). This query proves the merge law: per-source sketches,
    unioned, must estimate the GLOBAL distinct count.

    Bounds-checking oracle (the q23 discipline): sketch bytes are
    engine-specific, so the emitted columns are exact counts plus a
    boolean asserting the unioned estimate lands within 15% (≫ 3σ for
    lgConfigK=12) of the exact global distinct — a broken sketch or
    broken merge flips the boolean and fails the value hash."""
    d = table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.hll_sketch_agg("doc_id").alias("sk")
    )
    merged = per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_docs"),
        F.count("*").alias("n_sources"),
    )
    exact = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    return exact.crossJoin(merged).select(
        "n_docs",
        "n_sources",
        # empty corpus: no sketches to union (NULL estimate) and an exact
        # count of 0 — the merge law holds vacuously; the guard replaces
        # the ANSI-fatal 0-division (empty-input walk)
        F.when(
            F.col("n_docs") == 0,
            F.coalesce(F.col("est_docs"), F.lit(0.0)) == 0,
        )
        .otherwise(
            F.abs(F.col("est_docs").cast("double") - F.col("n_docs"))
            / F.col("n_docs")
            <= 0.15
        )
        .alias("union_within_tol"),
    )


@query(
    "q240_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def q240_bitmap_distinct(spark, sf_dir) -> DataFrame:
    """EXACT distinct counting via bitmap algebra (bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count): each 32k-key
    bucket's members become bits, buckets OR together, population count =
    distinct count — exact like COUNT(DISTINCT), but the partial state is
    a fixed-size bitmap instead of a growing key set, it merges by OR
    (associative, re-aggregatable like q222's HLL but with zero error),
    and it never expands into Catalyst's two-level distinct rewrite. The
    warehouse use: persist per-(partition, bucket) bitmaps once, answer
    distinct questions over any partition combination by OR-ing bitmaps
    THAT SHARE A BUCKET NUMBER and summing the per-bucket popcounts.
    bitmap_bit_position is (key - 1) mod 32768, so bit positions are only
    meaningful relative to their bucket: OR across different buckets
    collides distinct keys onto the same bit and undercounts. The merge
    algebra is therefore (priority, bkt) -> OR -> bitmap_count, then
    SUM counts per priority — buckets partition the key space, so the
    per-bucket distinct counts add exactly. The oracle is the plain
    COUNT(DISTINCT) the bitmaps must reproduce bit-for-bit. Keys shift
    to 1-based first: key 0 (present in the fixture) would otherwise
    alias into the previous bucket and undercount by one."""
    o = table(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderpriority",
        F.expr("bitmap_bucket_number(o_custkey + 1)").alias("bkt"),
    ).agg(
        # bitmap_construct_agg is the partial state; a re-aggregation layer
        # (e.g. merging persisted per-partition bitmaps) would bitmap_or_agg
        # within the same (priority, bkt) before counting.
        F.expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(o_custkey + 1)))").alias("bucket_distinct"),
        F.count("*").alias("n"),
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum("bucket_distinct").cast("long").alias("n_customers"),
        F.sum("n").alias("n_orders"),
    )
