"""Window functions — SURVEY.md §2.5 (q29–q34).

No OVER clause anywhere in the reference; required by the north-star.
Determinism discipline (SURVEY §5.2.1): every ORDER BY inside a window
carries a unique tiebreaker so rank/ntile/lag results are identical across
engines. Running sums use the decimal trick *inside the frame* — DuckDB
evaluates moving windows with segment trees (different summation order),
so float sums would drift; decimal sums cannot.

Scale: a window = one shuffle on partitionBy + a per-partition sort. The
partition key must be high-cardinality (per-customer, per-user — never a
global window) or one executor gets the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..io import table
from ..registry import query


@query(
    "q29_win_rownumber",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC NULLS LAST,
                                       o_orderkey) AS rn
    FROM orders
    """,
)
def q29_win_rownumber(spark, sf_dir) -> DataFrame:
    """row_number per customer by price. NULL ordering is PINNED to the
    engine's (Spark's) defaults — DESC places NULLs last, which DuckDB's
    nulls_last default happens to share; the oracle states it explicitly
    so the null-injection sweep (test_null_injection.py) is exact."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("long").alias("rn")
    )


@query(
    "q30_win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderstatus,
           rank()       OVER (PARTITION BY o_custkey
                              ORDER BY o_orderstatus NULLS FIRST) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderstatus NULLS FIRST) AS drnk
    FROM orders
    """,
)
def q30_win_rank(spark, sf_dir) -> DataFrame:
    """rank/dense_rank over a *tied* ordering (orderstatus has 3 values) —
    tie semantics themselves are what's exercised; the output is
    deterministic because ranks are equal for equal keys. ASC NULL
    ordering is engine-defined and DIVERGES (Spark: NULLS FIRST,
    DuckDB: NULLS LAST) — the engine keeps Spark's default and the
    oracle pins NULLS FIRST explicitly (null-injection sweep)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "q31_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           lag(ts)  OVER w AS prev_ts,
           lead(ts) OVER w AS next_ts,
           CAST(COALESCE(
               CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT),
               -1) AS BIGINT) AS gap_sec
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q31_win_lag_lead(spark, sf_dir) -> DataFrame:
    """lag/lead for session-gap detection — the building block for
    sessionization (q55's batch oracle uses exactly this).

    gap_sec is FLOOR-of-epoch on both engines (the q33 discipline):
    Spark's timestamp->long cast is a floorDiv of microseconds, while
    DuckDB's date_diff('second') truncates toward zero — they disagree
    by 1 exactly when one endpoint is pre-epoch with a fractional
    second (time-boundary battery finding: a 1 microsecond gap straddling
    1970-01-01 read as 1 s vs 0 s). Floor semantics also keep the gap
    monotone in the timestamps, which truncation does not."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        prev.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.coalesce(
            F.col("ts").cast("long") - prev.cast("long"), F.lit(-1)
        ).alias("gap_sec"),
    )


@query(
    "q32_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def q32_win_running(spark, sf_dir) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "q33_win_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d
    FROM events
    """,
)
def q33_win_range_frame(spark, sf_dir) -> DataFrame:
    """RANGE frame: 7-day trailing sum per user. Spark's rangeBetween needs
    a numeric ordering column → epoch seconds (floor), and the oracle uses
    the identical integer-second boundary so frames agree exactly."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(28,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d"),
    )


@query(
    "q34_win_ntile_pct",
    oracle="""
    SELECT c_custkey, c_acctbal,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cum_dist
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal NULLS FIRST, c_custkey)
    """,
)
def q34_win_ntile_pct(spark, sf_dir) -> DataFrame:
    """Distribution functions over a total order (c_custkey tiebreak makes
    ntile assignment deterministic). Note: a global (unpartitioned) window
    is a single-reducer sort — fine for a 15k-row dimension, a deliberate
    anti-pattern for fact tables (use q37's per-group top-k instead).
    ASC NULL ordering pinned to Spark's NULLS FIRST in the oracle — see
    q30 / test_null_injection.py."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@query(
    "q188_pct_change",
    oracle="""
    WITH m AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total
        FROM events GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT user_id, day, total,
           CASE WHEN abs((total - lag(total) OVER w)
                         / abs(NULLIF(lag(total) OVER w, 0))) >= 1e7
                THEN (total - lag(total) OVER w)
                     / abs(NULLIF(lag(total) OVER w, 0))
                ELSE round((total - lag(total) OVER w)
                           / abs(NULLIF(lag(total) OVER w, 0)), 6) + 0.0 END
               AS pct_change
    FROM m WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY day)
    """,
)
def q188_pct_change(spark, sf_dir) -> DataFrame:
    """Period-over-period percent change (day-over-day spend per user) —
    the BI delta every dashboard computes: aggregate to the period grain,
    lag one period, normalize by the prior absolute value. Aggregate and
    window share the user_id key family (one exchange then a co-
    partitioned sort); the first period's change is honestly NULL, never
    zero-filled. abs() in the denominator keeps the sign meaning 'grew'
    even off a negative base; a ZERO base yields NULL (NULLIF guard on
    both engines — without it Spark-4 ANSI fails the whole job, the
    extremes battery's first-pass finding here)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    m = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("total"))
    w = Window.partitionBy("user_id").orderBy("day")
    prev = F.lag("total").over(w)
    # zero base -> NULL (a pct change off zero is undefined; under
    # Spark-4 ANSI an unguarded /0 FAILS THE JOB — extremes battery),
    # and above 1e7 the 6dp quantum is sub-ulp so round() is bypassed
    pct = (F.col("total") - prev) / F.abs(F.nullif(prev, F.lit(0.0)))
    return m.select(
        "user_id",
        "day",
        "total",
        F.when(F.abs(pct) >= 1e7, pct)
        .otherwise(F.round(pct, 6) + 0.0)
        .alias("pct_change"),
    )


@query(
    "q189_win_first_last_nth",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING) AS last_type,
           nth_value(event_type, 2) OVER w AS second_type
    FROM events WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q189_win_first_last_nth(spark, sf_dir) -> DataFrame:
    """first_value / last_value / nth_value — the positional window trio
    q31's lag/lead doesn't cover, with THE frame trap spelled out:
    last_value over the default frame (UNBOUNDED PRECEDING..CURRENT ROW)
    is just the current row; an unbounded-following frame is required
    for the actual last element. All three ride one user_id exchange;
    the total order (ts, event_id) makes every position deterministic."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@query(
    "q350_global_rank_ranged",
    oracle="""
    SELECT c_custkey, c_acctbal,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cum_dist
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal NULLS FIRST, c_custkey)
    """,
)
def q350_global_rank_ranged(spark, sf_dir) -> DataFrame:
    """RANGE-PARTITIONED GLOBAL DISTRIBUTION FUNCTIONS — the scale
    spelling of the q34/q180/q185/q262 single-reducer window family
    (VERDICT r10 #2, the last named-but-unregistered scale path).
    q34's direct spelling (`Window.orderBy` with no partition) moves
    EVERY row to one task — fine for a 15k-row dimension, fatal for a
    fact table. This query computes the identical ntile/percent_rank/
    cume_dist triple with NO unpartitioned WindowExec anywhere in the
    plan (pinned in tests/test_plan_shapes.py):

    1. global row_number via ops.global_running_sum of a literal 1 —
       repartitionByRange on the total order, per-partition running
       count (a partitioned window), one tiny row per partition to the
       driver for base offsets, broadcast back. The corpus never
       converges on one task.
    2. the distribution functions in closed form from (rn, N): the
       window's ORDER BY carries the unique c_custkey tiebreak, so the
       peer class of every row is just itself and rank == row_number —
       percent_rank = (rn-1)/(N-1) (0.0 when N=1, Spark's own
       convention), cume_dist = rn/N, and ntile(k) by its size formula
       (the first N mod k buckets get floor(N/k)+1 rows), which
       reproduces engine ntile exactly because rn is the same total
       order. (For a value-only ordering, rank/cume_dist instead come
       from a tie-group window partitioned by the order VALUE —
       min(rn)/max(rn) over peers — whose per-task concentration is
       bounded by value multiplicity, not corpus size.)

    Result is ROW-IDENTICAL to q34 by construction (same oracle text —
    the equivalence IS the demonstration, the q345/q346 pattern). N
    arrives via a broadcast 1-row crossJoin (the audited family), never
    a driver collect of data rows. NULL acctbals sort first on both
    engines (pinned NULLS FIRST) and form one peer group, exactly as a
    global window treats them."""
    from .. import ops

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    staged = c.withColumn("__one", F.lit(1).cast("long"))
    rn_df = ops.global_running_sum(
        staged, ["c_acctbal", "c_custkey"], "__one", "rn"
    ).drop("__one")
    total = rn_df.agg(F.count("*").alias("__n"))
    j = rn_df.crossJoin(F.broadcast(total))

    n = F.col("__n")
    i = F.col("rn")  # == rank == count_le: the total order has no peers
    tile = ops.ntile_from_rn(i, n, 4)
    pct_rank = F.when(n > 1, (i - 1) / (n - 1)).otherwise(F.lit(0.0))
    return j.select(
        "c_custkey",
        "c_acctbal",
        tile.cast("long").alias("quartile"),
        pct_rank.cast("double").alias("pct_rank"),
        (i / n).cast("double").alias("cum_dist"),
    )
