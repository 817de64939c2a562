"""Expression-surface completions (q107–q110): null-safe equality,
filtered/conditional aggregates, string padding/trimming, greatest/least —
small primitives every migration trips over if they're missing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..io import table
from ..registry import query


@query(
    "q107_null_safe_eq",
    oracle="""
    SELECT e.event_id,
           (NULLIF(e.event_type, 'error') IS NOT DISTINCT FROM 'click') AS is_click_ns,
           (NULLIF(e.event_type, 'error') IS NOT DISTINCT FROM NULL) AS is_null_ns
    FROM events e
    """,
)
def q107_null_safe_eq(spark, sf_dir) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM): comparisons that
    treat NULL as a comparable value instead of propagating it — required
    for join keys and change detection over nullable columns (q105's CDC
    diff would silently miss NULL↔value transitions with plain =)."""
    e = table(spark, sf_dir, "events")
    nullable = F.nullif(F.col("event_type"), F.lit("error"))
    return e.select(
        "event_id",
        nullable.eqNullSafe(F.lit("click")).alias("is_click_ns"),
        nullable.eqNullSafe(F.lit(None).cast("string")).alias("is_null_ns"),
    )


@query(
    "q108_conditional_agg",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           COUNT(*) FILTER (WHERE value > 100) AS n_big,
           bool_or(event_type = 'error') AS any_error,
           bool_and(value >= 0) AS all_nonneg
    FROM events GROUP BY user_id
    """,
)
def q108_conditional_agg(spark, sf_dir) -> DataFrame:
    """Filtered/boolean aggregates (count_if, bool_or/bool_and) — the
    one-pass alternative to N filtered subqueries; partial-aggregable so
    they merge map-side like any sum."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.bool_or(F.col("event_type") == "error").alias("any_error"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
    )


@query(
    "q109_pad_trim",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
           rpad(p_brand, 12, '.') AS brand_padded,
           trim('  ' || p_name || '  ') AS name_trimmed,
           ltrim(p_type, 'ELP') AS type_ltrimmed
    FROM part
    """,
)
def q109_pad_trim(spark, sf_dir) -> DataFrame:
    """Padding/trimming — fixed-width key formatting and cleanup ops.
    (Spark ltrim(col, trim) trims a character SET, same as DuckDB's
    two-argument ltrim.)"""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        # two-arg ltrim: Spark SQL's argument order is (trimStr, str) —
        # opposite of DuckDB's (string, characters); expr() keeps it explicit
        F.expr("ltrim('ELP', p_type)").alias("type_ltrimmed"),
    )


@query(
    "q110_greatest_least",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, l_discount * 100, 10.0) AS g,
           least(l_extendedprice, 50000.0) AS capped,
           greatest(l_returnflag, l_linestatus) AS flag_max
    FROM lineitem
    """,
)
def q110_greatest_least(spark, sf_dir) -> DataFrame:
    """greatest/least over numerics and strings — row-wise min/max without
    a CASE ladder; null-propagation semantics match across engines for
    non-null inputs."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(
            F.col("l_quantity"), F.col("l_discount") * 100, F.lit(10.0)
        ).alias("g"),
        F.least(F.col("l_extendedprice"), F.lit(50000.0)).alias("capped"),
        F.greatest("l_returnflag", "l_linestatus").alias("flag_max"),
    )


@query(
    "q168_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           json(props)::VARCHAR AS canon
    FROM events
    """,
)
def q168_variant_json(spark, sf_dir) -> DataFrame:
    """VARIANT ingestion (Spark 4 semi-structured type): props parsed
    once into the binary variant encoding, fields extracted with typed
    paths, and the value re-serialized canonically. Versus q02/q46's
    per-access string re-parse, variant parses ONCE at ingestion and
    every later path access is a binary traversal — the difference
    between O(accesses) and O(1) parses per row at 100 TB. Canonical
    re-serialization (minified, key-order preserving) matches DuckDB's
    json() normalization on these single-key payloads."""
    e = table(spark, sf_dir, "events")
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
        F.to_json("v").alias("canon"),
    )
