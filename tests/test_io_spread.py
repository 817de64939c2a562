"""Pins for io.scan_units / io.spread — the layout-gated input-skew
guard (r13 optimization round, guide §2.5): a scan whose physical
layout offers fewer parallel read units (parquet row groups) than the
session has cores is redistributed before heavy per-row work; any
layout already at core width passes through UNTOUCHED (zero plan
change), so the guard can never pessimize a healthy production table.
"""

from __future__ import annotations

import pytest

from eclypsium_etl_spark.io import _LAYOUT_UNITS_CACHE, scan_units, spread, table

SF = "/root/testdata/sf0.001"


def test_scan_units_counts_rows_and_row_groups():
    rows, units = scan_units(f"{SF}/lineitem.parquet")
    assert units == 1  # the fixture is single-file, single-row-group
    assert rows > 0


def test_scan_units_memoizes(tmp_path):
    # second call must come from the cache (parquet layouts are
    # immutable: fixtures read-only, memos write-once)
    key = f"{SF}/orders.parquet"
    first = scan_units(key)
    assert _LAYOUT_UNITS_CACHE[key] == first
    _LAYOUT_UNITS_CACHE[key] = (-42, -42)  # poison: a re-read would differ
    try:
        assert scan_units(key) == (-42, -42)
    finally:
        _LAYOUT_UNITS_CACHE[key] = first


def test_spread_fans_a_single_row_group_scan(spark):
    df = table(spark, SF, "lineitem").select("l_orderkey")
    out = spread(df, f"{SF}/lineitem.parquet")
    cores = spark.sparkContext.defaultParallelism
    # the guard fired: an extra exchange redistributes to core width
    assert "Exchange" in out._jdf.queryExecution().executedPlan().toString() or (
        out.rdd.getNumPartitions() == cores
    )
    # result content is unchanged (same multiset of rows)
    assert out.count() == df.count()
    assert (
        out.agg({"l_orderkey": "sum"}).first()[0]
        == df.agg({"l_orderkey": "sum"}).first()[0]
    )


def test_spread_is_noop_below_row_floor(spark):
    # nation has far fewer rows than 4x cores: a shuffle cannot pay for
    # itself, so spread must return the input plan object unchanged
    df = table(spark, SF, "nation")
    rows, _ = scan_units(f"{SF}/nation.parquet")
    if rows >= 4 * spark.sparkContext.defaultParallelism:
        pytest.skip("fixture larger than the floor on this box")
    assert spread(df, f"{SF}/nation.parquet") is df


def test_spread_is_noop_on_wide_layouts(spark, tmp_path):
    # a layout already at >= core width passes through untouched
    cores = spark.sparkContext.defaultParallelism
    dest = str(tmp_path / "wide.parquet")
    table(spark, SF, "orders").repartition(cores).write.parquet(dest)
    df = spark.read.parquet(dest)
    assert spread(df, dest) is df


def test_scan_units_fails_open_on_remote_uri():
    # a remote URI can't be footer-walked locally: the guard must report
    # unknown-healthy (units >= any core count) instead of raising at
    # plan-build time — spread is an optimization, never a dependency
    rows, units = scan_units("s3://bucket/warehouse/assets.parquet")
    assert rows == -1 and units >= 1 << 20
    assert "s3://bucket/warehouse/assets.parquet" not in _LAYOUT_UNITS_CACHE


def test_spread_is_noop_on_remote_uri(spark):
    df = table(spark, SF, "lineitem").select("l_orderkey")
    out = spread(df, "hdfs://nn:8020/warehouse/lineitem", "l_orderkey")
    assert out is df


def test_scan_units_does_not_cache_empty_dir(tmp_path):
    # an empty (not-yet-written) memo dir is unknown NOW but may be
    # populated later: report unknown-healthy and never poison the cache
    d = tmp_path / "pending_memo"
    d.mkdir()
    rows, units = scan_units(str(d))
    assert rows == -1 and units >= 1 << 20
    assert str(d) not in _LAYOUT_UNITS_CACHE
    # once populated, a fresh call sees the real layout
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": list(range(10))}), str(d / "part-0.parquet"))
    rows2, units2 = scan_units(str(d))
    assert (rows2, units2) == (10, 1)


def test_scan_units_fails_open_on_corrupt_footer(tmp_path):
    bad = tmp_path / "corrupt.parquet"
    bad.write_bytes(b"not a parquet file")
    rows, units = scan_units(str(bad))
    assert rows == -1 and units >= 1 << 20
    assert str(bad) not in _LAYOUT_UNITS_CACHE


def test_spread_skips_unknown_rows(spark, tmp_path):
    # rows=-1 (the >=256-file fast path) with units < cores must NOT
    # shuffle: without a row count the min_rows floor can't be applied,
    # and 256+ read units suffice on any realistic box (ADVICE r13)
    df = table(spark, SF, "lineitem").select("l_orderkey")
    key = str(tmp_path / "fake_many_files")
    _LAYOUT_UNITS_CACHE[key] = (-1, 1)  # units below any core count
    try:
        assert spread(df, key, "l_orderkey") is df
    finally:
        del _LAYOUT_UNITS_CACHE[key]
