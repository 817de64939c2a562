"""Static lint of every oracle: DuckDB must be able to PLAN it against the
registered views (catches SQL syntax/binder errors in seconds, without
touching Spark), and oracles must reference only the pre-registered view
names — never file paths."""

from __future__ import annotations

import pytest

from eclypsium_etl_spark import registry

from .conftest import SF_CHECK, make_duck

_, ORACLE = registry.load_all()


@pytest.fixture(scope="module")
def duck():
    return make_duck(SF_CHECK)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_plans_cleanly(name, duck):
    sql = ORACLE[name]
    assert "read_parquet" not in sql, "oracles must use the registered views"
    assert "/root/" not in sql, "oracles must not hardcode paths"
    duck.execute(f"EXPLAIN {sql}")  # binder+planner; raises on any error


def test_ordered_queries_is_a_permutation():
    """The harness-facing ordering must expose exactly the registry — a
    query added without an order entry still appears (appended), and a
    stale order entry must not shadow or drop anything."""
    q, _ = registry.load_all()
    ordered = registry.ordered_queries()
    assert list(sorted(ordered)) == list(sorted(q))
    assert len(registry._CHEAP_FIRST) == len(set(registry._CHEAP_FIRST))
    # a typo'd/stale order entry would be silently skipped and the query
    # appended last, breaking the baked-in constraints (e.g. q63 before
    # q71) with everything green — so every entry must resolve
    stale = set(registry._CHEAP_FIRST) - set(q)
    assert not stale, f"stale _CHEAP_FIRST entries: {stale}"
    order = list(ordered)
    assert order.index("q63_dedup_near") < order.index("q71_dedup_minhash_lsh")


def test_oracled_results_are_driver_hashable(spark):
    """Every ORACLED query must return only scalar top-level columns.

    Root cause of the one red driver row in four rounds (q275,
    CORRECTNESS_r04): the driver's canonicalizer sorts raw result cells
    and crashes on unhashable list/dict values, while the local harness
    stringifies them (tests/parity.py) — so local green did not imply
    driver green. This lint closes the gap: any array/map/struct-typed
    top-level column in an oracled result is a failure here, BEFORE the
    driver ever sees it. Queries that logically produce collections must
    serialize them (array_join / to_json, mirrored in the oracle) the
    way q159/q178/q194/q121/q275 now do. Plan construction only — no
    execution — so this covers all ~315 oracled queries in about a
    minute. No exceptions are whitelisted on purpose."""
    from pyspark.sql import types as T

    queries, oracle = registry.load_all()
    sf = "/root/testdata/sf0.001"
    offenders = []
    for name in sorted(oracle):
        df = queries[name](spark, sf)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            offenders.append((name, complex_cols))
        # duplicate names break any sort-columns-by-name canonicalizer
        if len(set(df.columns)) != len(df.columns):
            offenders.append((name, f"duplicate columns: {df.columns}"))
    assert not offenders, (
        "oracled queries returning non-scalar top-level columns (driver "
        f"canonicalizer would crash on these): {offenders}"
    )


def test_hashability_lint_detects_offenders(spark):
    """Meta-test of the gate itself: the lint's detection predicate must
    flag array / map / struct top-level columns and duplicate column
    names on a constructed frame — q275 was fixed before the lint
    landed, so without this the lint has never been SEEN red and a
    silently-weakened predicate would pass everything."""
    from pyspark.sql import functions as F, types as T

    df = spark.range(1).select(
        F.array(F.lit("a")).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("mp"),
        F.struct(F.lit(1).alias("x")).alias("st"),
        F.lit(1).alias("ok"),
    )
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert complex_cols == ["arr", "mp", "st"]
    dup = spark.range(1).select(F.lit(1).alias("a"), F.lit(2).alias("a"))
    assert len(set(dup.columns)) != len(dup.columns)


def test_evidence_adaptive_ordering(tmp_path):
    """ordered_queries() self-adapts to the driver's CORRECTNESS files:
    red ids first, never-sampled second, green last, _CHEAP_FIRST
    relative order preserved within each class. Pinned on synthetic
    evidence (so the test survives future rounds changing the real
    files) and on the live repo state (no green id may precede a
    never-sampled one — the evidence-conversion contract)."""
    import json

    # synthetic: parse outcomes, latest round wins
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": None, "spark_rows": 1},
        "b": {"rows_match": True, "schema_match": True, "hash_match": False,
              "err": None, "spark_rows": 1},
        "c": {"rows_match": None, "schema_match": None, "hash_match": None,
              "err": "no_oracle", "spark_rows": 2},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "b": {"rows_match": True, "schema_match": True, "hash_match": True,
              "err": None, "spark_rows": 1},
        "d": {"rows_match": None, "schema_match": None, "hash_match": None,
              "err": "boom", "spark_rows": None},
    }))
    ev = registry._driver_evidence(root=str(tmp_path))
    assert ev == {"a": True, "b": True, "c": True, "d": False}

    # live repo: classes must be contiguous red -> never -> green
    live = registry._driver_evidence()
    order = list(registry.ordered_queries())
    classes = [
        0 if live.get(n) is False else (1 if n not in live else 2)
        for n in order
    ]
    assert classes == sorted(classes), "evidence classes out of order"
