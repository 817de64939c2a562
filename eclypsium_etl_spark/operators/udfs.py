"""UDF / UDAF / UDTF surface — SURVEY.md §2.11 (q59–q61).

The reference's entire compute surface is arbitrary Python (Airflow
PythonOperator tasks, mercadolibre_pipeline_dag.py:151-169). Spark-first
discipline inverts that: built-ins for everything expressible, and when
Python is genuinely needed it runs vectorized over Arrow batches
(pandas_udf / applyInPandas), never row-at-a-time in the hot path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..io import table
from ..registry import query


def discounted_price_udf():
    """Vectorized scalar UDF: whole Arrow batches in, numpy math, batch out.
    (Expressible as a built-in — kept as the canonical pandas_udf example;
    the parity oracle proves it computes exactly what the SQL does.)
    Built lazily: pandas_udf resolves its return type against the active
    session, so it can't be a module-level decorator."""

    @F.pandas_udf("double")
    def _discounted_price(extended: pd.Series, discount: pd.Series) -> pd.Series:
        return extended * (1.0 - discount)

    return _discounted_price


@query(
    "q59_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def q59_udf_scalar(spark, sf_dir) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted_price_udf()("l_extendedprice", "l_discount").alias("disc_price"),
    )


def _flag_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped custom aggregation (UDAF via applyInPandas). Sums are done
    in integer ten-thousandths (exact, order-independent) to match the
    engine-side decimal(.,4) discipline bit-for-bit.

    NULL-correct like the SQL aggregates it mirrors: prices arrive as
    NaN for SQL NULL — dropna before the int64 cast skips them exactly
    like SUM (a bare astype RAISES on NaN, the crash the null-injection
    walk caught; dropna→int64 keeps plain-int speed where nullable
    Int64 masked ops measurably drag), COUNT(*) still counts the rows,
    and an all-null group yields NULL sums/maxes, not 0."""
    cents = (pdf["l_extendedprice"] * 10_000).round().dropna().astype("int64")
    sp = cents.sum() if len(cents) else None
    mx = pdf["l_extendedprice"].max()
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "n_items": [len(pdf)],
            "sum_price": [None if pd.isna(sp) else sp / 10_000.0],
            "max_price": [None if pd.isna(mx) else mx],
        }
    )


@query(
    "q60_udaf_grouped",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q60_udaf_grouped(spark, sf_dir) -> DataFrame:
    """applyInPandas: full shuffle on the group key, then one pandas frame
    per group. Right tool for algorithms SQL can't express (here it
    recomputes a SQL-expressible aggregate so the oracle can check the
    plumbing exactly)."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return li.groupBy("l_returnflag").applyInPandas(
        _flag_stats,
        schema="l_returnflag string, n_items long, sum_price double, max_price double",
    )


@query(
    "q61_udtf",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, tok[i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
         UNNEST(generate_series(1, least(5, len(tok)))) AS u(i)
    """,
)
def q61_udtf(spark, sf_dir) -> DataFrame:
    """Table function (1 row → N rows): posexplode of the first 5 tokens —
    the reference's category→products fan-out (:27-33, :44-45) as a lateral
    expansion. posexplode is the built-in UDTF; a user-defined Python UDTF
    would plug into the same lateral-join plan shape (Spark ≥3.5)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias("pos", "token")
    )


@query(
    "q88_python_udtf",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, tok[i] AS token,
           CAST(length(tok[i]) AS INTEGER) AS tok_len
    FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
         UNNEST(generate_series(1, least(3, len(tok)))) AS u(i)
    """,
)
def q88_python_udtf(spark, sf_dir) -> DataFrame:
    """User-defined table function (Python UDTF, Spark ≥3.5): arbitrary
    1-row → N-rows Python expansion, consumed via SQL LATERAL join — the
    generative fan-out case posexplode can't express (here it also derives
    a computed column per emitted row). Row-at-a-time Python: keep off the
    hot path; this exists to exercise the extension point."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, tok_len int")
    class HeadTokens:
        def eval(self, text: str):
            for pos, tok in enumerate(text.split(" ")[:3]):
                yield pos, tok, len(tok)

    spark.udtf.register("head_tokens", HeadTokens)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.tok_len
        FROM documents d, LATERAL head_tokens(d.text) t
        """
    )


def _minmax_scale_arrow(t):
    """Arrow-native grouped transform: per-group min-max scaling. Min/max
    are comparison-only (exact, order-independent); each scaled value is
    then ONE subtract + ONE divide on doubles — the identical two-op IEEE
    sequence the oracle's window expression performs, so results are
    bit-equal across engines with no rounding discipline needed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    x = t.column("o_totalprice")
    mn = pc.min(x).as_py()
    mx = pc.max(x).as_py()
    if mn is None or mx == mn:
        scaled = pa.nulls(t.num_rows, pa.float64())
    else:
        scaled = pc.divide(pc.subtract(x, mn), mx - mn)
    return pa.table(
        {
            "o_orderkey": t.column("o_orderkey"),
            "o_orderpriority": t.column("o_orderpriority"),
            "o_totalprice": x,
            "scaled": scaled,
        }
    )


@query(
    "q215_apply_in_arrow",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CASE WHEN mx = mn THEN NULL
                ELSE (o_totalprice - mn) / (mx - mn) END AS scaled
    FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               MIN(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mn,
               MAX(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mx
        FROM orders
    )
    """,
)
def q215_apply_in_arrow(spark, sf_dir) -> DataFrame:
    """Grouped-map over raw Arrow record batches (applyInArrow) — the
    zero-copy sibling of q60's applyInPandas, completing the Python batch
    API family (q59 pandas_udf, q60 applyInPandas, q88 arrow-optimized
    Python UDTF, q92 cogroup, q169 mapInArrow): no pandas materialization,
    the group arrives as a pyarrow.Table and compute runs through Arrow's
    C++ kernels.

    Plan: ONE shuffle on the group key (the same exchange any grouped
    aggregate pays), then embarrassingly parallel per-group work. The
    demo kernel (per-group min-max normalization) is chosen because it's
    verifiable bit-for-bit against a SQL window oracle — in production
    this slot holds the genuinely non-relational per-group logic (model
    scoring, library calls) that built-ins can't express. Skew caveat at
    100 TB: one group = one task, so a dominant key serializes — salt or
    pre-aggregate before reaching for grouped-map APIs."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return o.groupBy("o_orderpriority").applyInArrow(
        _minmax_scale_arrow,
        "o_orderkey long, o_orderpriority string, o_totalprice double, scaled double",
    )


def length_score_iter_udf():
    """Iterator-form pandas UDF (Iterator[pd.Series] → Iterator[pd.Series]):
    the per-partition warm-up pattern — expensive setup (model load,
    connection, tokenizer build) runs ONCE per partition, then every Arrow
    batch streams through it; the scalar form would re-enter Python with
    no way to hoist shared state. Here the 'model' is a deterministic
    affine map so the oracle stays exact."""

    @F.pandas_udf("double")
    def _score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        weight, bias = 0.5, 7.0  # stand-in for the once-per-partition load
        for s in batches:
            yield s * weight + bias

    return _score


@query(
    "q223_udf_iterator",
    oracle="""
    SELECT doc_id, n_chars, n_chars * 0.5 + 7.0 AS score
    FROM documents
    """,
)
def q223_udf_iterator(spark, sf_dir) -> DataFrame:
    """Iterator-of-series pandas UDF over the documents table — the third
    member of the scalar-Python family (q59 series-form pandas_udf, q215
    applyInArrow, q169 mapInArrow). Same vectorized Arrow transport as
    q59; the iterator signature only changes WHERE per-partition state
    can live. Zero shuffle: pure scan-stage projection work."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "n_chars",
        length_score_iter_udf()(F.col("n_chars").cast("double")).alias("score"),
    )


@query(
    "q224_udtf_table_arg",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def q224_udtf_table_arg(spark, sf_dir) -> DataFrame:
    """Python UDTF consuming a TABLE argument with PARTITION BY — the SQL
    route to custom per-group aggregation (the UDTF twin of q60's
    applyInPandas): the planner shuffles the input on the PARTITION BY
    key, instantiates the UDTF once per key, streams the rows through
    eval(), and terminate() emits the group's result. Counts and integer
    sums are order-independent, so the custom aggregate is exactly
    differential-testable. At scale the same caveat as every grouped-map:
    one key = one instance — pre-aggregate or salt dominant keys."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, n_docs bigint, total_chars bigint")
    class LangRollup:
        def __init__(self):
            self._lang = None
            self._n = 0
            self._chars = 0

        def eval(self, row):
            self._lang = row["lang"]
            self._n += 1
            self._chars += int(row["n_chars"])

        def terminate(self):
            if self._n:
                yield (self._lang, self._n, self._chars)

    spark.udtf.register("q224_lang_rollup", LangRollup)
    table(spark, sf_dir, "documents").createOrReplaceTempView("docs_q224")
    return spark.sql(
        "SELECT * FROM q224_lang_rollup(TABLE(docs_q224) PARTITION BY lang)"
    )


@query(
    "q228_script_transform",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, source
    FROM documents
    """,
)
def q228_script_transform(spark, sf_dir) -> DataFrame:
    """Hive script transform (TRANSFORM ... USING): rows stream through an
    external process over stdin/stdout, tab-separated — the oldest
    "arbitrary code over rows" escape hatch in the warehouse world, kept
    for parity with legacy HiveQL workloads (`cat` as the identity script
    makes the round trip exactly checkable; every output column is a
    string, per TRANSFORM's contract without a ROW FORMAT). One forked
    process per task, pipe-buffered — at 100 TB this is strictly worse
    than Arrow-batched Python (q59/q215: no fork, no text serialization),
    which is the migration this engine recommends; the surface exists so
    such workloads can land before being rewritten."""
    table(spark, sf_dir, "documents").createOrReplaceTempView("docs_q228")
    return spark.sql(
        """
        SELECT TRANSFORM(doc_id, lang, source)
        USING 'cat' AS (doc_id STRING, lang STRING, source STRING)
        FROM docs_q228
        """
    )


@query(
    "q233_udf_arrow_optimized",
    oracle="""
    SELECT event_id,
           CAST(event_type || ':' || CAST(user_id % 100 AS VARCHAR) AS VARCHAR)
               AS route_key
    FROM events
    """,
)
def q233_udf_arrow_optimized(spark, sf_dir) -> DataFrame:
    """Arrow-optimized row UDF (`F.udf(..., useArrow=True)`): the classic
    per-row Python UDF signature, but batched over Arrow instead of
    pickled row-by-row — the drop-in accelerator for the long tail of
    existing row UDFs that nobody rewrites. The family ladder this engine
    recommends, fastest first: built-in expression (no Python at all) >
    pandas_udf / applyInArrow (vectorized compute) > THIS (Arrow
    transport, scalar Python compute) > legacy pickle UDF (never in a hot
    path). The kernel is string routing logic — trivially expressible as
    an expression, chosen so the oracle checks the transport exactly.

    NULL discipline for row UDFs: SQL NULL arrives as Python None, and
    an f-string happily renders it as the 6-char literal 'None:…' — a
    phantom value no SQL expression would produce (null-injection walk
    finding). Row UDFs must check None explicitly; NULL-in → NULL-out
    here, matching the oracle's || propagation."""
    route = F.udf(
        lambda et, uid: None if et is None else f"{et}:{uid % 100}",
        "string",
        useArrow=True,
    )
    e = table(spark, sf_dir, "events")
    return e.select("event_id", route("event_type", "user_id").alias("route_key"))
