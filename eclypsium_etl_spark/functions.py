"""Shared expression helpers — mostly cross-engine float discipline.

The driver's correctness gate hashes values exactly, so any aggregate of
doubles must be *bit-identical* between Spark and DuckDB regardless of
partitioning / summation order. The trick used everywhere:

    SUM(CAST(x AS DECIMAL(28,4)))  →  cast back to DOUBLE

Decimal addition is exact and associative, so the sum is order-independent.
The same decimal goes back to the same double. This also happens to be the
*correct* way to sum money at 100 TB — float sums drift, decimal sums don't.

THE SCALE RULE (learned the hard way in q173/q176): the double→decimal
cast is only engine-portable when the cast scale is LOSSLESS for the
value — i.e. the value is mathematically exact at that scale (a 2dp
price × 2dp discount is exact at 4dp; × another 2dp factor needs 6dp).
At a lossy scale the engines round DIFFERENT things: Spark half-ups the
shortest decimal representation of the double (BigDecimal.valueOf),
DuckDB rounds the scaled binary value — and when the shortest repr ends
in 5 at the rounding digit they disagree by one ulp of the scale. The
same applies to round(double, n). So: cast fixture money at scale 4
(2dp×2dp products), three-factor products at scale 6, and never
round/cast a derived double at a scale where legitimate ties occur.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(28,4)"


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum of a double column, returned as double.

    The publish cast routes through STRING (decimal → string → double):
    both engines' string→double parses are correctly rounded (Java
    parseDouble / DuckDB fast_float), whereas DuckDB's direct
    decimal→double cast double-rounds (int128→double, then ÷10^scale)
    and drifts one ulp from Spark's single-rounded cast as soon as the
    scaled integer exceeds 2^53 — found by the extremes battery (1e9
    measures pushed group sums past 16 significant digits). For sums
    within 2^53 quanta both paths give the identical double, so this is
    a strict hardening, not a behavior change on benign data."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("string").cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum` (same text-bridge publish)."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(28,4))) AS STRING) AS DOUBLE)"


def dsum_str(c: Column | str) -> Column:
    """:func:`dsum` with the INPUT cast bridged through string as well.

    For addends that are LOSSY at scale 4 by construction (q90's
    deviation products span 1e-4..1e18): above 2^53 scaled-integer mass
    the engines' direct double→decimal casts round different things
    (Spark the shortest decimal repr via BigDecimal.valueOf, DuckDB the
    exact scaled binary). Bridging the input through a string makes BOTH
    round the shortest repr, and their string→decimal tie modes agree
    (half-away == Spark HALF_UP — probed: '2.00005'→2.0001, '-2.5'→-3 on
    both). The bridge is taken per-row ONLY above 1e11 (the scale-4
    crisp ceiling is 2^53·1e-4 ≈ 9e11; below it both engines' direct
    casts already round the same expansion), so benign-magnitude data
    pays no per-row string cost — the branch condition is the same
    double on both engines, hence the same branch (found by the bench
    vigil: the unconditional bridge tripled q90's sf0.1 wall). Use it
    only where the addend is lossy at the cast scale by construction;
    plain dsum elsewhere."""
    c = F.col(c) if isinstance(c, str) else c
    bridged = F.when(F.abs(c) < 1e11, c.cast(DEC)).otherwise(
        c.cast("string").cast(DEC)
    )
    return F.sum(bridged).cast("string").cast("double")


def dsum_str_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum_str`."""
    return (
        f"CAST(CAST(SUM(CASE WHEN abs({expr}) < 1e11 "
        f"THEN CAST({expr} AS DECIMAL(28,4)) "
        f"ELSE CAST(CAST({expr} AS STRING) AS DECIMAL(28,4)) END) "
        f"AS STRING) AS DOUBLE)"
    )


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
