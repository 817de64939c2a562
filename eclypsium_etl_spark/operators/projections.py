"""Projections / filters / predicates — SURVEY.md §2.2 (q07–q10).

q08 is the reference's flagship semantics — the one declarative query in
the whole repo (``WHERE price * sold_quantity >= 7000000``,
mercadolibre_pipeline_dag.py:75) — transplanted onto the lineitem fixture.
Expressed declaratively the predicate stays inside WholeStageCodegen and
the projection prunes the Parquet scan to 4 of 11 columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..io import table
from ..pipeline import FLAGSHIP_THRESHOLD  # single source: q08 IS the flagship predicate
from ..registry import query


@query(
    "q07_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate FROM lineitem
    """,
)
def q07_project(spark, sf_dir) -> DataFrame:
    """Column projection — prunes the scan to the selected columns
    (verify: ReadSchema in .explain shows only these four)."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"
    )


@query(
    "q08_filter_arith",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * l_quantity AS revenue
    FROM lineitem
    WHERE l_extendedprice * l_quantity >= {FLAGSHIP_THRESHOLD}
    """,
)
def q08_filter_arith(spark, sf_dir) -> DataFrame:
    """The flagship theta filter (reference :75). The computed predicate
    is not sargable (no pushdown of the product), but projection pruning
    still reaches the scan; the multiply is exact double arithmetic so the
    value hashes match bit-for-bit."""
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * F.col("l_quantity")
    return (
        li.filter(revenue >= FLAGSHIP_THRESHOLD)
        .select("l_orderkey", "l_linenumber", revenue.alias("revenue"))
    )


@query(
    "q09_filter_compound",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
    WHERE (c_acctbal < 0 OR c_mktsegment IN ('BUILDING', 'MACHINERY'))
      AND c_name IS NOT NULL
    """,
)
def q09_filter_compound(spark, sf_dir) -> DataFrame:
    """Compound / null / in-set predicates (reference's null-sentinel and
    empty-list checks, :84, :135, generalized)."""
    c = table(spark, sf_dir, "customer")
    return c.filter(
        (
            (F.col("c_acctbal") < 0)
            | F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        )
        & F.col("c_name").isNotNull()
    ).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")


@query(
    "q10_constant_col",
    oracle="""
    SELECT o_orderkey, TIMESTAMP '2026-01-01 00:00:00' AS created_date
    FROM orders
    """,
)
def q10_constant_col(spark, sf_dir) -> DataFrame:
    """Constant/derived column append (reference stamps every row with
    ``datetime.now()``, :57). Checked queries use a literal timestamp for
    determinism (SURVEY §5.2.1); production code would use
    current_timestamp()."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("created_date"),
    )
