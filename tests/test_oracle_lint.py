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
