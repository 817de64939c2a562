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
           lpad(CAST(p_partkey AS STRING), 10, '0') AS key_padded,
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


@query(
    "q173_sql_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                          AS DECIMAL(28,8)) AS STRING) AS DOUBLE) AS charged
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q173_sql_udf(spark, sf_dir) -> DataFrame:
    """SQL-defined scalar function (CREATE FUNCTION … RETURN expr) — the
    zero-cost UDF: the body is inlined into the plan at analysis time and
    runs inside whole-stage codegen, unlike ANY Python UDF (q59's
    pandas_udf is the fast Python path and still pays Arrow transfer).
    This is the right tool for shared business expressions (the
    reference's charged-amount formula) — define once in the catalog,
    optimizer sees straight through it. The oracle states the inlined
    expression, proving the function boundary adds nothing. (Output is
    cast to DECIMAL at scale 8 — the scale where these products are
    mathematically EXACT for any ≤4dp price × ≤2dp discount × ≤2dp tax
    (scale 6 was exact only for 2dp prices; the extremes battery's 4dp
    price made legitimate scale-6 ties and the engines' tie modes
    differ), so the double→decimal conversion never rounds. Casting or round()ing a
    double at a scale with legitimate ties is the one operation the
    engines disagree on: Spark half-ups the shortest decimal repr,
    DuckDB rounds the scaled binary value — pick a lossless scale
    instead. The decimal→double publish routes through VARCHAR per the
    functions.py publish rule: above 2^53 scaled-integer mass DuckDB's
    direct cast double-rounds.)"""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_amount("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE "
        "RETURN p * (1.0 - d) * (1.0 + t)"
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(CAST(charged_amount(l_extendedprice, l_discount,
                                             l_tax)
                              AS DECIMAL(28,8)) AS STRING) AS DOUBLE)
                   AS charged
        FROM lineitem WHERE l_returnflag = 'R'
        """
    )


@query(
    "q176_values_join",
    oracle="""
    WITH rates(status, fee_rate) AS (
        VALUES ('F', 0.01), ('O', 0.015), ('P', 0.02)
    )
    SELECT o.o_orderstatus AS status,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o.o_totalprice * CAST(r.fee_rate AS DOUBLE)
                             AS DECIMAL(28,8))) AS STRING) AS DOUBLE) AS fees
    FROM orders o JOIN rates r ON r.status = o.o_orderstatus
    GROUP BY o.o_orderstatus
    """,
)
def q176_values_join(spark, sf_dir) -> DataFrame:
    """Inline VALUES table joined against a fact — the config-as-data
    pattern (rate cards, thresholds, enum decodes) without a file or
    catalog table. An inline table is a LocalRelation: it broadcasts by
    construction and constant-folds where possible, so the join adds no
    shuffle on the fact side; at scale the same shape holds for any
    driver-known dimension up to the broadcast threshold. (Bare decimal
    literals type as DECIMAL in BOTH engines but with different
    precision rules, so the rate is cast to DOUBLE before the multiply —
    otherwise the per-row products differ in the last ulp and the sums
    drift visibly apart. The per-term decimal cast uses scale 8, where
    a ≤4dp price × 3dp rate product is exact — scale 6 tied on the
    extremes battery's 4dp price; see q173's note.)"""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH rates AS (
            SELECT * FROM VALUES ('F', 0.01), ('O', 0.015), ('P', 0.02)
                AS rates(status, fee_rate)
        )
        SELECT o.o_orderstatus AS status,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o.o_totalprice * CAST(r.fee_rate AS DOUBLE)
                                  AS DECIMAL(28,8))) AS STRING) AS DOUBLE)
                   AS fees
        FROM orders o JOIN rates r ON r.status = o.o_orderstatus
        GROUP BY o.o_orderstatus
        """
    )


@query(
    "q177_null_ordering",
    oracle="""
    SELECT event_id, user_id, value,
           row_number() OVER (ORDER BY value DESC NULLS LAST, event_id)
               AS rn_nl,
           row_number() OVER (ORDER BY value ASC NULLS FIRST, event_id)
               AS rn_nf
    FROM events WHERE user_id < 5
    """,
)
def q177_null_ordering(spark, sf_dir) -> DataFrame:
    """Explicit NULL ordering (NULLS FIRST/LAST) — the cross-engine trap
    spelled out: Spark's defaults are NULLS FIRST for ASC but NULLS LAST
    for DESC, PostgreSQL's are the opposite for DESC, so any ranking
    over a nullable column MUST state null placement or results silently
    differ between engines. Both rankings here pin it explicitly (and
    tiebreak on event_id), making the orders identical by construction."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    from pyspark.sql import Window

    w_nl = Window.orderBy(F.col("value").desc_nulls_last(), F.col("event_id"))
    w_nf = Window.orderBy(F.col("value").asc_nulls_first(), F.col("event_id"))
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(w_nl).alias("rn_nl"),
        F.row_number().over(w_nf).alias("rn_nf"),
    )
