"""Scalar functions — SURVEY.md §2.8 (q42–q51).

String/date/math/array/map/JSON expression surface. Everything here is a
built-in ``pyspark.sql.functions`` expression — JVM-side, inside
WholeStageCodegen, never a Python UDF. Cross-engine gotchas each query
encodes (SURVEY §5.2.3):

- Spark date_format patterns are case-sensitive Java letters; the DuckDB
  twin is strftime with C codes (q42).
- Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday (q43).
- Spark cast(double→int) truncates; DuckDB CAST rounds — use explicit
  floor (q51).
- Round modes differ (HALF_UP vs half-even) but can never disagree on
  doubles at scale ≥ 1 (exact ties aren't binary-representable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..io import table
from ..registry import query
from ..schemas import EVENT_PROPS


@query(
    "q42_date_format",
    oracle="""
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%d-%m-%Y') AS ship_str
    FROM lineitem
    """,
)
def q42_date_format(spark, sf_dir) -> DataFrame:
    """Date → string (the reference's TO_CHAR(created_date,'dd-mm-yyyy'),
    mercadolibre_pipeline_dag.py:75)."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "dd-MM-yyyy").alias("ship_str"),
    )


@query(
    "q43_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_2002,
           o_orderdate + INTERVAL 90 DAY AS due_date
    FROM orders
    """,
)
def q43_date_parts(spark, sf_dir) -> DataFrame:
    """Date extraction / truncation / arithmetic. DuckDB dayofweek is
    0=Sunday vs Spark 1=Sunday — the oracle shifts by one."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
    )


@query(
    "q44_math_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 + l_tax) AS gross,
           CASE WHEN abs(l_extendedprice * (1 - l_discount)) >= 1e7
                THEN l_extendedprice * (1 - l_discount)
                ELSE round(l_extendedprice * (1 - l_discount), 6) + 0.0
           END AS net_rounded,
           abs(l_quantity - 25) AS qty_dev,
           CASE WHEN l_quantity >= 0 THEN sqrt(l_quantity) END AS qty_sqrt,
           CASE WHEN l_extendedprice > 0
                THEN round(ln(l_extendedprice), 6) END AS log_price
    FROM lineitem
    """,
)
def q44_math_expr(spark, sf_dir) -> DataFrame:
    """Arithmetic expressions (the reference's price*sold_quantity, :75,
    widened). Products/abs/sqrt are IEEE-exact cross-engine; ln() can
    differ by 1 ulp → rounded to 6 dp on both sides. Domain edges are
    GUARDED identically on both engines (extremes-battery finding:
    DuckDB raises on sqrt of a negative / ln of a non-positive where
    Spark yields NaN/NULL — an unguarded domain edge is a job-semantics
    divergence, not a float nit), and net_rounded is normalized +0.0
    because a negative price times a planted 100% discount reaches
    IEEE -0.0 on one engine and 0.0 on the other. Above |x| >= 1e7,
    round(x, 6) is bypassed on BOTH engines — the q188-precedent guard
    against HALF_UP (Spark) vs half-even (DuckDB) divergence on
    representational ties, which densify as the 6dp quantum nears
    ulp(x) (round(x, 6) only becomes a true identity above ~4.5e9,
    where ulp exceeds the 1e-6 quantum — NOT at 1e7). The output
    contract is deliberate and documented: net_rounded publishes
    UNROUNDED for |x| >= 1e7; both engines take the same branch, so
    the differential holds (ADVICE r11 correction)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 + F.col("l_tax"))).alias("gross"),
        # round scale 6 > the value's intrinsic 4 decimals (2dp price × 2dp
        # discount): exact ties are impossible, so HALF_UP (Spark) and
        # half-even (DuckDB) agree. round(x, 2) here WOULD mismatch.
        F.when(
            F.abs(F.col("l_extendedprice") * (1 - F.col("l_discount"))) >= 1e7,
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        )
        .otherwise(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
            + 0.0
        )
        .alias("net_rounded"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        # domain guards spelled on BOTH engines: DuckDB hard-errors on
        # sqrt(<0) / ln(<=0) where Spark yields NaN/NULL (extremes battery)
        F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")).alias("qty_sqrt"),
        F.when(
            F.col("l_extendedprice") > 0,
            F.round(F.log(F.col("l_extendedprice")), 6),
        ).alias("log_price"),
    )


@query(
    "q45_string_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 5) AS name_head,
           CAST(length(p_name) AS INTEGER) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
           (p_name LIKE '%widget%') AS is_widget,
           CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words
    FROM part
    """,
)
def q45_string_fns(spark, sf_dir) -> DataFrame:
    """String functions (the reference's URL building / interpolation,
    :30, :111-121, generalized)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.col("p_name").like("%widget%").alias("is_widget"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@query(
    "q46_json_get",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent
    FROM events
    """,
)
def q46_json_get(spark, sf_dir) -> DataFrame:
    """JSON field extraction from a stringified-JSON column (the
    reference's dict_response["results"] / entry["id"], :23, :33)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", EVENT_PROPS).getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


@query(
    "q47_json_serialize",
    oracle="""
    SELECT event_id,
           '{"event_id":' || event_id || ',"event_type":"'
           || COALESCE(event_type, '') || '","user_id":' || user_id
           || '}' AS payload
    FROM events
    """,
)
def q47_json_serialize(spark, sf_dir) -> DataFrame:
    """Row → JSON serialization (the reference's json.dumps({"data": ...}),
    :87). Oracle builds the identical compact rendering by concatenation —
    engine-native JSON printers differ in whitespace, the values don't.
    event_type is nullable: to_json DROPS null fields while string concat
    NULL-poisons the payload, so both sides coalesce to '' and stay
    aligned whatever the data does."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_json(
            F.struct(
                "event_id",
                F.coalesce("event_type", F.lit("")).alias("event_type"),
                "user_id",
            )
        ).alias("payload"),
    )


@query(
    "q48_array_fns",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS head_val,
           round(list_sum(list_transform(embedding[1:8],
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sumsq_8,
           CAST(list_contains(list_transform(embedding, x -> x > 0.5), true) AS BOOLEAN) AS any_big
    FROM embeddings
    """,
)
def q48_array_fns(spark, sf_dir) -> DataFrame:
    """Array functions over the embedding column: size, element_at, slice,
    transform, aggregate (left fold accumulating in double), exists."""
    em = table(spark, sf_dir, "embeddings")
    sq = F.transform(
        F.slice("embedding", 1, 8), lambda x: x.cast("double") * x.cast("double")
    )
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("head_val"),
        F.round(
            F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v), 6
        ).alias("sumsq_8"),
        F.exists("embedding", lambda x: x > F.lit(0.5)).alias("any_big"),
    )


@query(
    "q49_map_fns",
    oracle="""
    SELECT event_id,
           event_type AS type_val,
           CAST(2 AS INTEGER) AS n_keys,
           CAST(user_id AS VARCHAR) AS uid_val
    FROM events
    """,
)
def q49_map_fns(spark, sf_dir) -> DataFrame:
    """Map functions: build a map from columns, read it back via
    element_at/map_keys. The oracle states the expected *values* directly
    (map construction + extraction is the identity on them) — engine map
    types don't hash-compare across engines, scalars do."""
    e = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "uid").alias("uid_val"),
    )


@query(
    "q50_case_when",
    oracle="""
    SELECT event_id, value,
           CASE WHEN value > 100 THEN 'high'
                WHEN value > 10  THEN 'mid'
                ELSE 'low' END AS bucket,
           CASE WHEN event_type = 'purchase' THEN value ELSE 0 END AS purchase_value
    FROM events
    """,
)
def q50_case_when(spark, sf_dir) -> DataFrame:
    """Conditional expressions (the reference's if/else branching,
    :84-87, :135-138, as data — not control flow)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "value",
        F.when(F.col("value") > 100, "high")
        .when(F.col("value") > 10, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .otherwise(F.lit(0.0))
        .alias("purchase_value"),
    )


@query(
    "q51_cast_coalesce",
    oracle="""
    SELECT event_id,
           CAST(floor(value) AS BIGINT) AS value_floor,
           CAST(event_id AS VARCHAR) AS id_str,
           COALESCE(NULLIF(event_type, 'error'), 'n/a') AS type_or_na,
           (NULLIF(event_type, 'error') IS NULL) AS was_error
    FROM events
    """,
)
def q51_cast_coalesce(spark, sf_dir) -> DataFrame:
    """Casting & null handling. Explicit floor before the int cast: Spark
    cast(double→int) truncates while DuckDB rounds — never rely on the
    implicit behavior."""
    e = table(spark, sf_dir, "events")
    nullified = F.nullif(F.col("event_type"), F.lit("error"))
    return e.select(
        "event_id",
        F.floor("value").cast("long").alias("value_floor"),
        F.col("event_id").cast("string").alias("id_str"),
        F.coalesce(nullified, F.lit("n/a")).alias("type_or_na"),
        nullified.isNull().alias("was_error"),
    )


@query(
    "q209_nested_output",
    oracle="""
    WITH s AS (
        SELECT o_orderstatus,
               {lo: MIN(o_totalprice), hi: MAX(o_totalprice),
                avg: CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
                     / COUNT(*)} AS price_stats,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, price_stats.lo AS lo, price_stats.hi AS hi,
           round(price_stats.avg, 6) AS avg, n
    FROM s
    """,
)
def q209_nested_output(spark, sf_dir) -> DataFrame:
    """Nested STRUCT round trip in the RESULT path: min/max/decimal-exact
    mean packed into a named struct per group (the API-response /
    document-sink shape), then the fields projected back OUT for the
    differential compare — proving construction and field access both
    work. The compared output is deliberately flat: a raw struct CELL's
    collected representation is harness-dependent (tuple without Arrow,
    dict with it / in DuckDB), which is a property of result transport,
    not of the query; serialized nested OUTPUT is covered by q47 and the
    struct-typed transport by q210's explode."""
    o = table(spark, sf_dir, "orders")
    s = o.groupBy("o_orderstatus").agg(
        F.struct(
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(28,4)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("avg"),
        ).alias("price_stats"),
        F.count("*").alias("n"),
    )
    return s.select(
        "o_orderstatus",
        F.col("price_stats.lo").alias("lo"),
        F.col("price_stats.hi").alias("hi"),
        F.round(F.col("price_stats.avg"), 6).alias("avg"),
        "n",
    )


@query(
    "q210_struct_array_explode",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, least(3, len(string_split(text, ' ')))),
                   i -> {pos: i, tok: string_split(text, ' ')[i]}) AS head
        FROM documents
    )
    SELECT doc_id, u.pos, u.tok
    FROM t, UNNEST(head) AS x(u)
    """,
)
def q210_struct_array_explode(spark, sf_dir) -> DataFrame:
    """Array-of-structs: build typed records per row (the first three
    (position, token) pairs), then explode and project the fields — the
    full nested round-trip (construct → collect → flatten) that
    log-event and API-payload pipelines live in. All codegen expression
    work: transform builds the structs, explode is the only
    row-multiplier, field access prunes to the projected members."""
    d = table(spark, sf_dir, "documents")
    head = F.expr(
        "transform(sequence(1, least(3, size(split(text, ' ')))),"
        " i -> struct(i AS pos, element_at(split(text, ' '), i) AS tok))"
    )
    return (
        d.select("doc_id", F.explode(head).alias("u"))
        .select("doc_id", F.col("u.pos").alias("pos"), F.col("u.tok").alias("tok"))
    )


@query(
    "q211_try_expressions",
    oracle="""
    SELECT event_id,
           COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER),
                    -1) AS k_or_default,
           CASE WHEN value = 0 THEN NULL
                WHEN abs(100.0 / value) >= 1e7 THEN 100.0 / value
                ELSE round(100.0 / value, 6) + 0.0 END
               AS inv_value,
           TRY_CAST(event_type AS INTEGER) AS type_as_int
    FROM events
    """,
)
def q211_try_expressions(spark, sf_dir) -> DataFrame:
    """Error-safe expressions (try_cast / try_divide) — load-bearing
    under Spark 4's ANSI-by-default mode, where a bad cast or a zero
    divisor FAILS THE JOB instead of yielding NULL (q183 hit exactly
    this). The try_ family restores per-row NULL semantics only where
    the pipeline explicitly tolerates dirty data, keeping ANSI's
    fail-fast everywhere else — strictly better than globally disabling
    ANSI. DuckDB's TRY_CAST + a guarded division state the same
    semantics."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(
            F.expr(
                "try_cast(get_json_object(props, '$.k') AS INT)"
            ),
            F.lit(-1),
        ).alias("k_or_default"),
        # -0.0 normalization (+0.0) and a round-bypass above 1e7, where a
        # 6dp quantum is sub-ulp and double round() is engine-divergent:
        # both found by the extremes battery (value=-1e9 -> -0.0 vs 0.0;
        # value=1e-9 -> inverse 1e11 in the fuzzy-round zone)
        F.expr(
            "CASE WHEN abs(try_divide(100.0, value)) >= 1e7 "
            "THEN try_divide(100.0, value) "
            "ELSE round(try_divide(100.0, value), 6) + 0.0 END"
        ).alias("inv_value"),
        F.expr("try_cast(event_type AS INT)").alias("type_as_int"),
    )


@query(
    "q241_timezone_convert",
    oracle="""
    SELECT event_id,
           timezone('America/New_York', timezone('UTC', ts)) AS ny_time,
           timezone('Asia/Tokyo', timezone('UTC', ts)) AS tokyo_time,
           (hour(timezone('America/New_York', timezone('UTC', ts)))
                BETWEEN 9 AND 16) AS ny_business_hours
    FROM events
    """,
)
def q241_timezone_convert(spark, sf_dir) -> DataFrame:
    """Timezone conversion (convert_timezone, Spark 3.5+): storage time is
    UTC by contract; LOCAL wall-clock views (user-facing reports,
    business-hours flags) are derived at query time through the IANA tz
    database — DST transitions included, which no hour-offset arithmetic
    gets right twice a year. The oracle's DuckDB spelling composes
    timezone() twice (interpret-as-UTC, then render-local) so it is
    independent of the oracle session's host timezone — a deliberate
    hardening, since a naive ::TIMESTAMPTZ cast would silently bind to
    whatever TZ the harness host runs in. Pure scan-stage expression
    work: zero shuffle at any scale."""
    e = table(spark, sf_dir, "events")
    ny = F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), F.col("ts"))
    tokyo = F.convert_timezone(F.lit("UTC"), F.lit("Asia/Tokyo"), F.col("ts"))
    return e.select(
        "event_id",
        ny.alias("ny_time"),
        tokyo.alias("tokyo_time"),
        F.hour(ny).between(9, 16).alias("ny_business_hours"),
    )


@query(
    "q242_calendar_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(last_day(o_orderdate) AS DATE) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP)
               AS plus_quarter,
           CAST(CAST(o_orderdate + INTERVAL (CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0
                THEN 7 ELSE (8 - isodow(o_orderdate)) % 7 END) DAY AS DATE) AS TIMESTAMP)
               AS next_monday,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)
               AS days_to_cutoff
    FROM orders
    """,
)
def q242_calendar_arithmetic(spark, sf_dir) -> DataFrame:
    """Business-calendar arithmetic: month-end (billing cycle close),
    add_months with end-of-month clamping (Jan 31 + 1 month = Feb 29 in
    both engines — the clamp IS the semantic, not a rounding accident),
    next-Monday (SLA start-of-week; the oracle derives it from isodow
    since DuckDB lacks next_day), and day counts to a fixed cutoff. All
    scan-stage expression work over the date column — the building
    blocks q199's calendar dimension materializes, used inline."""
    o = table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.add_months(d, 3).cast("timestamp").alias("plus_quarter"),
        F.next_day(d, "Mon").cast("timestamp").alias("next_monday"),
        F.datediff(F.lit("2002-01-01").cast("date"), d)
        .cast("long")
        .alias("days_to_cutoff"),
    )


@query(
    "q256_from_csv_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
)
def q256_from_csv_expr(spark, sf_dir) -> DataFrame:
    """Expression-level CSV parsing (from_csv) — CSV embedded IN a column,
    as opposed to CSV files (q93): log lines, legacy message payloads,
    and denormalized export columns all carry delimiter-packed records
    that must parse per-row inside the plan, schema-checked, without a
    detour through the file system. The packed column is built from the
    source columns and parsed straight back, so the oracle is the plain
    projection — any asymmetry between the packer and from_csv's parser
    (quoting, type coercion, field order) breaks the hash. Scan-stage
    expression work; zero shuffle.

    NULL discipline: every field is coalesced to '' BEFORE concat_ws —
    concat_ws SKIPS null arguments, so a bare pack of a null field
    SHIFTS every later column one slot left (the null-injection walk
    caught l_quantity landing in l_returnflag's slot); empty fields
    keep positions and from_csv's default nullValue='' parses them
    back to NULL symmetrically."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    packed = li.select(
        F.concat_ws(
            ",",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(""))
                for c in (
                    "l_orderkey",
                    "l_linenumber",
                    "l_returnflag",
                    "l_quantity",
                )
            ],
        ).alias("rec")
    )
    parsed = packed.select(
        F.from_csv(
            "rec",
            F.lit(
                "l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING, l_quantity DOUBLE"
            ),
        ).alias("p")
    )
    return parsed.select("p.*")


@query(
    "q257_xpath_functions",
    oracle="""
    SELECT n_nationkey, n_name AS name_from_xml,
           n_regionkey AS region_from_xml,
           2 AS n_tags
    FROM nation
    """,
)
def q257_xpath_functions(spark, sf_dir) -> DataFrame:
    """XPath scalar functions (xpath_string / xpath_int / xpath) over XML
    embedded in a column — the per-row XML companion to q167's XML file
    source and q46's JSON extraction: SOAP payloads, config fragments,
    and feed items live inside string columns and are queried in place.
    The document is assembled from the source columns and the XPath
    extraction must invert it exactly (the array-returning xpath()
    counts the tag list), so the oracle is the plain projection. Like
    all parser expressions: scan-stage, zero shuffle, codegen-adjacent
    (the XPath itself evaluates in the JVM, no Python)."""
    n = table(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<nation><name>"),
        F.col("n_name"),
        F.lit("</name><region>"),
        F.col("n_regionkey"),
        F.lit("</region><tags><t>a</t><t>b</t></tags></nation>"),
    )
    d = n.select("n_nationkey", xml.alias("xml"))
    return d.select(
        "n_nationkey",
        F.expr("xpath_string(xml, '/nation/name/text()')").alias("name_from_xml"),
        F.expr("xpath_int(xml, '/nation/region/text()')").alias("region_from_xml"),
        F.size(F.expr("xpath(xml, '/nation/tags/t/text()')")).alias("n_tags"),
    )


@query(
    "q258_hash_functions",
    oracle="""
    SELECT n_nationkey,
           sha256(n_name) AS sha_256,
           md5(n_name) AS md5_hex,
           CAST(strlen(sha256(n_name)) AS INT) AS sha_len
    FROM nation
    """,
)
def q258_hash_functions(spark, sf_dir) -> DataFrame:
    """Cryptographic hash expression family: sha2-256 and md5 computed
    JVM-side, hex-identical across engines — the content-addressing
    primitives the dedup pipelines build on (md5 keys q62/q71/q120;
    sha-256 is the collision-resistant upgrade for content IDs exposed
    outside the pipeline, where md5's broken collision resistance
    matters). Spark additionally ships crc32/xxhash64/murmur (faster,
    engine-specific — used for salting and bucketing, never for
    identity); they have no cross-engine twin, which is precisely why
    every ORACLE-CHECKED hash in this repo is md5/sha (the q71 portability
    principle)."""
    n = table(spark, sf_dir, "nation")
    sha = F.sha2(F.col("n_name"), 256)
    return n.select(
        "n_nationkey",
        sha.alias("sha_256"),
        F.md5(F.col("n_name")).alias("md5_hex"),
        F.length(sha).cast("int").alias("sha_len"),
    )
