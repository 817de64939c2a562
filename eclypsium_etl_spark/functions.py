"""Shared expression helpers — mostly cross-engine float discipline.

The driver's correctness gate hashes values exactly, so any aggregate of
doubles must be *bit-identical* between Spark and DuckDB regardless of
partitioning / summation order. The trick used everywhere:

    SUM(CAST(x AS DECIMAL(28,4)))  →  cast back to DOUBLE

Decimal addition is exact and associative, so the sum is order-independent;
the double→decimal rounding at scale ≥ 1 can never hit an exact tie (x.5·10⁻⁴
is not binary-representable), so both engines round identically. The same
decimal goes back to the same double. This also happens to be the *correct*
way to sum money at 100 TB — float sums drift, decimal sums don't.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(28,4)"


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,4))) AS DOUBLE)"


def davg(c: Column | str) -> Column:
    """Exact-sum average: decimal sum ÷ count, both engines do the same
    double division on identical operands."""
    c = F.col(c) if isinstance(c, str) else c
    return dsum(c) / F.count(c)


def davg_sql(expr: str) -> str:
    return f"{dsum_sql(expr)} / COUNT({expr})"


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float> columns, accumulated in double with a
    left fold — DuckDB's list_sum folds the same way, so results match
    bit-for-bit on identical inputs (float×float widened to double is exact).

    PRECONDITION: equal-length, non-NULL-element arrays. On a length
    mismatch the engines DIVERGE silently (Spark's zip_with pads with NULL
    and the fold NULL-poisons to NULL; DuckDB sums the common prefix) —
    validate corpus dimensions upstream (e.g. assert one distinct
    size(embedding)) before trusting cross-engine scores.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` (list_zip yields unnamed structs —
    fields must be addressed by numeric index)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))"
    )
