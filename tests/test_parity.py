"""Oracle parity for every registered query — the local mirror of the
driver's CORRECTNESS gate, run at sf0.01 (same sf the driver uses)."""

from __future__ import annotations

import pytest

from eclypsium_etl_spark import registry

from .conftest import SF_CHECK
from .parity import compare

QUERIES, ORACLE = registry.load_all()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, duck_check):
    ok, detail = compare(QUERIES[name](spark, SF_CHECK), duck_check, ORACLE[name])
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_no_oracle_queries_run(name, spark):
    """Queries without an oracle still must run and return a stable schema."""
    df = QUERIES[name](spark, SF_CHECK)
    assert df.columns, f"{name}: empty schema"
    df.collect()  # must not raise
