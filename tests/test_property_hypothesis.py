"""Property-based tests (hypothesis) for the reusable kernels: algebraic
laws that must hold on ARBITRARY inputs, not just the fixture — the
complement to the fixed-seed brute-force tests in test_ops_properties.

Example counts are deliberately small (each example is a Spark round
trip); shrinking still gives a minimal counterexample on failure."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from eclypsium_etl_spark import ops

T0 = datetime(2024, 1, 1)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, minutes-offset) event rows; ids assigned by position
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)),
    min_size=1,
    max_size=40,
)


@given(rows=events_strategy, perm_seed=st.integers(0, 2**16))
@SETTINGS
def test_sessionize_is_permutation_invariant(spark, rows, perm_seed):
    """Session STRUCTURE (per-key multiset of session sizes) must not
    depend on input row order — the property that makes backfills
    rerun-stable regardless of file arrival order."""
    import random

    data = [
        (i, k, T0 + timedelta(minutes=m)) for i, (k, m) in enumerate(rows)
    ]
    shuffled = data[:]
    random.Random(perm_seed).shuffle(shuffled)

    def structure(raw):
        df = spark.createDataFrame(raw, "id long, k long, ts timestamp")
        s = ops.sessionize(df, "k", "ts", "INTERVAL 10 MINUTES", tiebreak="id")
        return sorted(
            (r.k, r.n)
            for r in s.groupBy("k", "session_id").agg(F.count("*").alias("n")).collect()
        )

    assert structure(data) == structure(shuffled)


@given(rows=events_strategy)
@SETTINGS
def test_salted_join_equals_plain_join(spark, rows):
    """Salting must be semantically invisible: identical result multiset
    to the unsalted equi join, for any data distribution (including the
    all-one-key worst case hypothesis likes to generate)."""
    fact = spark.createDataFrame(
        [(i, k, float(m)) for i, (k, m) in enumerate(rows)],
        "id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in {k for k, _ in rows}], "k long, label string"
    )
    plain = sorted(
        (r.id, r.k, r.label)
        for r in fact.join(dim, "k").select("id", "k", "label").collect()
    )
    salted = sorted(
        (r.id, r.k, r.label)
        for r in ops.salted_join(fact, dim, "k", salt_from="id", n_salts=4)
        .select("id", "k", "label")
        .collect()
    )
    assert plain == salted


@given(rows=events_strategy)
@SETTINGS
def test_dedup_keep_first_is_idempotent_and_minimal(spark, rows):
    """Applying keep-first twice changes nothing, survivors are one per
    key, and each survivor is the true minimum under the order."""
    df = spark.createDataFrame(
        [(i, k, m) for i, (k, m) in enumerate(rows)], "id long, k long, m long"
    )
    once = ops.dedup_keep_first(df, ["k"], [F.asc("m"), F.asc("id")])
    twice = ops.dedup_keep_first(once, ["k"], [F.asc("m"), F.asc("id")])
    got = sorted((r.k, r.m, r.id) for r in once.collect())
    assert got == sorted((r.k, r.m, r.id) for r in twice.collect())
    # exactly one survivor per distinct key, and it is the minimum
    expect = {}
    for i, (k, m) in enumerate(rows):
        if k not in expect or (m, i) < expect[k]:
            expect[k] = (m, i)
    assert got == sorted((k, m, i) for k, (m, i) in expect.items())


@given(rows=events_strategy)
@SETTINGS
def test_global_running_sum_matches_sequential(spark, rows):
    """The two-phase distributed prefix sum equals the sequential scan in
    the same total order, for any value distribution."""
    data = [(i, k, (m % 7) * 10) for i, (k, m) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, k long, cents long")
    out = ops.global_running_sum(
        df, order_cols=["id"], value_col="cents", out_col="run", partitions=3
    )
    got = {r.id: r.run for r in out.collect()}
    acc = 0
    for i, _, c in data:
        acc += c
        assert got[i] == acc
