"""Flagship pipeline: smoke, gate polarity (reference README.md:57-61
style), report rendering, and plan-shape assertions (pushdown/pruning)."""

from __future__ import annotations

import tempfile

import __spark_entry__ as entrymod
from eclypsium_etl_spark.pipeline import flagship, render_report, run_gated_pipeline

from .conftest import SF_SMOKE


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert df.columns == ["l_orderkey", "l_linenumber", "revenue", "ship_str"]
    assert len(rows) > 0
    assert all(r.revenue >= 4_000_000 for r in rows)


def test_gate_polarity(spark):
    with tempfile.TemporaryDirectory() as d:
        closed = run_gated_pipeline(spark, SF_SMOKE, f"{d}/out", threshold=1e18)
        assert closed == {
            "gate_open": False, "rows_written": 0, "report": None, "receipt": None,
        }
        opened = run_gated_pipeline(spark, SF_SMOKE, f"{d}/out2")
        assert opened["gate_open"] and opened["rows_written"] > 0
        assert opened["report"].startswith("<html>") and "<tr><td>" in opened["report"]


def test_report_delivery_boundary(spark):
    """The delivery interface (reference's EmailOperator boundary): an open
    gate hands the rendered HTML to delivery.send and surfaces the receipt;
    a closed gate never delivers."""
    from eclypsium_etl_spark.pipeline import ReportDelivery

    with tempfile.TemporaryDirectory() as d:
        delivery = ReportDelivery(f"{d}/outbox")
        out = run_gated_pipeline(spark, SF_SMOKE, f"{d}/sink", delivery=delivery)
        assert out["receipt"] is not None and out["receipt"].endswith(".html")
        with open(out["receipt"], encoding="utf-8") as fh:
            assert fh.read() == out["report"]
        closed = run_gated_pipeline(
            spark, SF_SMOKE, f"{d}/sink2", threshold=1e18, delivery=delivery
        )
        assert closed["receipt"] is None


def test_report_bounded(spark):
    report = render_report(flagship(spark, SF_SMOKE), max_rows=5)
    assert report.count("<tr><td>") == 5


def test_extract_products_mirrors_reference(spark, tmp_path):
    """EP1 mirror: categories JSON + per-category search payloads →
    7-column products frame, only requested categories, constant load ts."""
    import json

    from eclypsium_etl_spark.pipeline import extract_products

    (tmp_path / "cats.json").write_text(
        "\n".join(json.dumps({"id": c}) for c in ["MLA1", "MLA2"])
    )
    def prod(i, cat):
        return {
            "id": f"{cat}-{i}", "site_id": "MLA", "title": f"item {i}",
            "price": 100.5 + i, "sold_quantity": i * 10,
            "thumbnail": f"http://img/{i}",
        }
    searches = [
        {"category_id": "MLA1", "results": [prod(1, "MLA1"), prod(2, "MLA1")]},
        {"category_id": "MLA2", "results": [prod(3, "MLA2")]},
        {"category_id": "MLA9", "results": [prod(4, "MLA9")]},  # not requested
    ]
    (tmp_path / "searches.json").write_text(
        "\n".join(json.dumps(s) for s in searches)
    )
    df = extract_products(
        spark, str(tmp_path / "cats.json"), str(tmp_path / "searches.json")
    )
    rows = df.collect()
    assert df.columns == [
        "id", "site_id", "title", "price", "sold_quantity", "thumbnail",
        "created_date",
    ]
    assert sorted(r.id for r in rows) == ["MLA1-1", "MLA1-2", "MLA2-3"]
    assert len({r.created_date for r in rows}) == 1


def test_jdbc_options_parallel_read():
    """The JDBC option map (pure — no DB needed): partition bounds expand
    to the four-option parallel-read contract, extras pass through."""
    import pytest

    from eclypsium_etl_spark.io import jdbc_options

    opts = jdbc_options(
        "jdbc:postgresql://db:5432/shop", "products",
        partition_column="id", lower_bound=0, upper_bound=100_000,
        num_partitions=16, fetch_size=5_000,
        properties={"user": "etl", "driver": "org.postgresql.Driver"},
    )
    assert opts == {
        "url": "jdbc:postgresql://db:5432/shop",
        "dbtable": "products",
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "100000",
        "numPartitions": "16",
        "fetchsize": "5000",
        "user": "etl",
        "driver": "org.postgresql.Driver",
    }
    # single-connection read: no partition options emitted
    assert "partitionColumn" not in jdbc_options("jdbc:h2:mem:x", "t")
    # partition column without bounds is a config error, caught eagerly
    with pytest.raises(ValueError):
        jdbc_options("jdbc:h2:mem:x", "t", partition_column="id")


def test_fetch_to_landing_feeds_extract(spark, tmp_path):
    """The EP1 fetch story end-to-end: fetch_to_landing stages payloads
    from (file://) URLs, extract_products reads the staged files."""
    import json

    from eclypsium_etl_spark.io import fetch_to_landing
    from eclypsium_etl_spark.pipeline import extract_products

    src = tmp_path / "remote"
    src.mkdir()
    (src / "cats").write_text(json.dumps({"id": "MLA1"}))
    (src / "search").write_text(
        json.dumps(
            {
                "category_id": "MLA1",
                "results": [
                    {
                        "id": "MLA1-9", "site_id": "MLA", "title": "x",
                        "price": 9.5, "sold_quantity": 3, "thumbnail": "t",
                    }
                ],
            }
        )
    )
    staged = fetch_to_landing(
        {"categories": f"file://{src}/cats", "searches": f"file://{src}/search"},
        str(tmp_path / "landing"),
        allowed_schemes=("file",),  # hermetic: no HTTP server in tests
    )
    assert set(staged) == {"categories", "searches"}
    df = extract_products(spark, staged["categories"], staged["searches"])
    rows = df.collect()
    assert [r.id for r in rows] == ["MLA1-9"]


def test_fetch_to_landing_rejects_unsafe_inputs(tmp_path):
    """Names become filenames and URLs are fetched driver-side, so both are
    validated (ADVICE r2): traversal-shaped names must not escape dest_dir
    and non-http(s) schemes are refused by default."""
    import pytest

    from eclypsium_etl_spark.io import fetch_to_landing

    dest = str(tmp_path / "landing")
    for bad_name in ("../x", "a/b", "", ".hidden"):
        with pytest.raises(ValueError, match="unsafe landing name"):
            fetch_to_landing({bad_name: "https://example.com/x"}, dest)
    for bad_url in ("file:///etc/passwd", "ftp://h/x", "gopher://h/x"):
        with pytest.raises(ValueError, match="unsupported URL scheme"):
            fetch_to_landing({"ok": bad_url}, dest)


def test_projection_prunes_scan(spark):
    """Column pruning must reach the parquet scan: the flagship reads 4 of
    11 lineitem columns."""
    plan = flagship(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_shipdate" in read_schema
    assert "l_discount" not in read_schema and "l_partkey" not in read_schema


def test_sargable_filter_pushed_down(spark):
    """A plain (sargable) predicate must reach PushedFilters."""
    from eclypsium_etl_spark.io import table
    from pyspark.sql import functions as F

    df = table(spark, SF_SMOKE, "lineitem").filter(
        F.col("l_quantity") > 45
    ).select("l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity" in plan


def test_scd2_merge_rerun_idempotent(spark):
    """q317's managed-table SCD2 merge must be rerun-safe (the q244
    pre-clear discipline + a deterministic merge): building the
    dimension twice yields byte-identical state — the property MERGE
    INTO provides transactionally and the emulation must provide by
    construction. Also pins the MERGE semantics the oracle checks from
    the other side: no-op updates spawn no versions (every version-2
    row really changed its tracked attribute)."""
    from eclypsium_etl_spark.operators.incremental import q317_scd2_merge_table
    from tests.parity import canonical_rows

    r1 = canonical_rows(q317_scd2_merge_table(spark, SF_SMOKE).toPandas())
    r2 = canonical_rows(q317_scd2_merge_table(spark, SF_SMOKE).toPandas())
    assert r1 == r2 and len(r1) > 0

    final = q317_scd2_merge_table(spark, SF_SMOKE).toPandas()
    v2 = final[final["version"] == 2]
    v1 = final[final["version"] == 1].set_index("k")
    assert len(v2) > 0
    # every successor's predecessor is closed and really changed
    for _, row in v2.iterrows():
        pred = v1.loc[row["k"]]
        assert not pred["is_current"]
        assert pred["seg"] != row["seg"]
    # no-op updates (BUILDING customers in the batch) never version
    building = final[(final["seg"] == "BUILDING") & (final["k"] % 5 == 0)]
    assert (building["version"] == 1).all() and building["is_current"].all()


def test_stream_scd2_matches_batch_chain_and_reruns(spark):
    """q329's core claim, pinned from the Spark side too (the oracle
    already states the closed form): the streaming runtime delivering
    one merge wave per micro-batch must land byte-identical dimension
    state to q324's batch chaining of the same two waves — and rerunning
    the stream (fresh source staging + checkpoint, q244 pre-clear)
    rebuilds the same state."""
    from eclypsium_etl_spark.operators.incremental import (
        q324_scd2_multiwave,
        q329_stream_scd2,
    )
    from tests.parity import canonical_rows

    batch = canonical_rows(q324_scd2_multiwave(spark, SF_SMOKE).toPandas())
    s1 = canonical_rows(q329_stream_scd2(spark, SF_SMOKE).toPandas())
    s2 = canonical_rows(q329_stream_scd2(spark, SF_SMOKE).toPandas())
    assert s1 == batch and len(s1) > 0
    assert s1 == s2


def test_stream_kmeans_rerun_deterministic(spark):
    """q332's streamed model must be exactly reproducible: fresh feed
    staging + checkpoint each call, decimal partial-sum state, pinned
    batch order — two runs, identical per-cluster summaries."""
    from eclypsium_etl_spark.llm.clustering import q332_stream_kmeans
    from tests.parity import canonical_rows

    r1 = canonical_rows(q332_stream_kmeans(spark, SF_SMOKE).toPandas())
    r2 = canonical_rows(q332_stream_kmeans(spark, SF_SMOKE).toPandas())
    assert r1 == r2 and len(r1) > 0


def test_scd2_multiattr_full_noop_spawns_nothing(spark):
    """q333's distinguishing semantics, pinned from the Spark side: a
    source row where EVERY tracked column equals the target (k%4
    BUILDING rows with k%6 != 0) must spawn no version; a row where
    only ONE tracked column changed still versions and the successor
    carries BOTH current values. Rebuild is rerun-idempotent."""
    from eclypsium_etl_spark.operators.incremental import q333_scd2_multiattr
    from tests.parity import canonical_rows

    r1 = canonical_rows(q333_scd2_multiattr(spark, SF_SMOKE).toPandas())
    r2 = canonical_rows(q333_scd2_multiattr(spark, SF_SMOKE).toPandas())
    assert r1 == r2 and len(r1) > 0

    df = q333_scd2_multiattr(spark, SF_SMOKE).toPandas()
    noop = df[
        (df["k"] % 4 == 0) & (df["k"] % 6 != 0) & (df["seg"] == "BUILDING")
    ]
    assert len(noop) > 0
    assert (noop["version"] == 1).all() and noop["is_current"].all()
    v2 = df[df["version"] == 2]
    assert len(v2) > 0
    v1 = df[df["version"] == 1].set_index("k")
    for _, row in v2.iterrows():
        pred = v1.loc[row["k"]]
        assert not pred["is_current"]
        # ANY tracked column changed — never a full-tracked-set no-op
        assert pred["seg"] != row["seg"] or pred["nat"] != row["nat"]


def test_scd2_out_of_order_wave_raises(spark):
    """scd2_merge must REJECT a wave dated before the current version's
    valid_from (VERDICT r8 #5: silent misordering is the only wrong
    answer) — the in-plan assert_true fires only for rows the wave
    actually changes, so in-order merges pay nothing."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.errors import PySparkException

    from eclypsium_etl_spark.operators.incremental import scd2_merge

    target = spark.createDataFrame(
        [(1, "a", "X", "2024-06-01", None, True, 1)],
        "k bigint, name string, seg string, valid_from string, "
        "valid_to string, is_current boolean, version int",
    ).select(
        "k", "name", "seg",
        F.to_date("valid_from").alias("valid_from"),
        F.to_date("valid_to").alias("valid_to"),
        "is_current", "version",
    )
    src = spark.createDataFrame([(1, "a", "Y")], "k bigint, name string, seg string")
    late = scd2_merge(target, src, key="k", attr="seg",
                      eff_date=F.to_date(F.lit("2024-03-01")))
    with pytest.raises(PySparkException, match="out-of-order"):
        late.collect()
    # a backdated wave that changes NOTHING is harmless (guard rides the
    # changed branch only)
    noop = scd2_merge(
        target,
        spark.createDataFrame([(1, "a", "X")], "k bigint, name string, seg string"),
        key="k", attr="seg", eff_date=F.to_date(F.lit("2024-03-01")),
    )
    assert noop.count() == 1


def test_scd2_retro_boundary_replaces_covering_slice(spark):
    """scd2_merge_retro at eff_date == the covering version's valid_from:
    the zero-length old slice drops and the retro value REPLACES it,
    versions stay dense, exactly one open version per key. Also pins the
    predates-all-history rejection."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.errors import PySparkException

    from eclypsium_etl_spark.operators.incremental import scd2_merge_retro

    target = spark.createDataFrame(
        [
            (1, "a", "X", "2024-01-01", "2024-06-01", False, 1),
            (1, "a", "Y", "2024-06-01", None, True, 2),
        ],
        "k bigint, name string, seg string, valid_from string, "
        "valid_to string, is_current boolean, version int",
    ).select(
        "k", "name", "seg",
        F.to_date("valid_from").alias("valid_from"),
        F.to_date("valid_to").alias("valid_to"),
        "is_current", "version",
    )
    src = spark.createDataFrame([(1, "a", "Z")], "k bigint, name string, seg string")
    out = scd2_merge_retro(
        target, src, key="k", attr="seg",
        eff_date=F.to_date(F.lit("2024-01-01")),
    ).orderBy("version").collect()
    assert [(r.seg, str(r.valid_from), str(r.valid_to), r.is_current, r.version)
            for r in out] == [
        ("Z", "2024-01-01", "2024-06-01", False, 1),
        ("Y", "2024-06-01", "None", True, 2),
    ]
    too_early = scd2_merge_retro(
        target, src, key="k", attr="seg",
        eff_date=F.to_date(F.lit("2023-01-01")),
    )
    with pytest.raises(PySparkException, match="predates"):
        too_early.collect()
