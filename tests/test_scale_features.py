"""Scale features with no oracle surface: bucketed co-located joins (no
shuffle) and multi-batch stateful accumulation."""

from __future__ import annotations

import os
import time
import uuid
from datetime import datetime

from pyspark.sql import functions as F

from eclypsium_etl_spark import plans
from eclypsium_etl_spark.io import table, write_bucketed

from .conftest import SF_SMOKE


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must join with ZERO exchanges —
    the co-location contract that saves the dominant shuffle at 100 TB."""
    orders = table(spark, SF_SMOKE, "orders")
    customer = table(spark, SF_SMOKE, "customer")
    write_bucketed(orders, "orders_b", "o_custkey", 8, sort_col="o_custkey")
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b",
        "o_custkey", 8, sort_col="o_custkey",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
        assert plans.shuffle_count(joined) == 0, plans.physical_plan(joined)
        # and it still computes the right thing
        expected = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_stateful_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    batch 2's running_total must include batch 1's spend."""
    from eclypsium_etl_spark.streaming.stateful import running_spend

    src = tmp_path / "src"
    src.mkdir()
    schema = "user_id long, value double, ts timestamp"

    def write_file(rows, name):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"_s{name}"))
        part = next(
            p for p in (tmp_path / f"_s{name}").iterdir() if p.name.endswith(".parquet")
        )
        os.rename(part, src / f"{name}.parquet")

    t0 = datetime.fromisoformat("2024-01-01 10:00:00")
    write_file([(7, 600.0, t0), (7, 300.0, t0)], "b1")
    time.sleep(1.1)
    write_file([(7, 200.0, t0)], "b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qname = f"spend_{uuid.uuid4().hex[:8]}"
    q = (
        running_spend(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        spark.table(qname).collect(), key=lambda r: r.running_total
    )
    assert [r.batch_total for r in rows] == [900.0, 200.0]
    assert [r.running_total for r in rows] == [900.0, 1100.0]
    assert [r.crossed for r in rows] == [False, True]  # crossed in batch 2


def test_stateful_cents_roundtrip_exact(spark, tmp_path):
    """Cents recovery must ROUND, not truncate: totals like 0.0003 don't
    round-trip exactly through the stored double (*10_000 gives
    2.9999999999999996 — truncation would drift a cent per batch)."""
    from eclypsium_etl_spark.streaming.stateful import running_spend

    src = tmp_path / "src"
    src.mkdir()
    schema = "user_id long, value double, ts timestamp"

    def write_file(rows, name):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"_s{name}"))
        part = next(
            p for p in (tmp_path / f"_s{name}").iterdir() if p.name.endswith(".parquet")
        )
        os.rename(part, src / f"{name}.parquet")

    t0 = datetime.fromisoformat("2024-01-01 10:00:00")
    write_file([(3, 0.0003, t0)], "b1")
    time.sleep(1.1)
    write_file([(3, 0.0001, t0)], "b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qname = f"spend_{uuid.uuid4().hex[:8]}"
    q = (
        running_spend(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    totals = sorted(r.running_total for r in spark.table(qname).collect())
    assert totals == [0.0003, 0.0004]  # truncation would give [0.0003, 0.0003]


def test_lsh_band_join_survives_mega_bucket(spark):
    """Skew degrade for q71's band join (VERDICT r2 #7): a corpus where
    every doc carries the SAME shingle set collapses into one LSH bucket
    per band — without the bucket cap that's N(N-1)/2 candidate pairs from
    a single key. The cap must exclude the mega-bucket (0 candidates from
    it) while a duplicate group below the cap still surfaces intact."""
    from eclypsium_etl_spark.llm.dedup import (
        _MAX_BAND_BUCKET,
        minhash_band_candidates,
    )

    n_big = _MAX_BAND_BUCKET * 5  # one signature shared by 500 docs
    rows = [(i, "boiler plate shingle") for i in range(n_big)]
    rows += [(10_000 + i, "small group shingle") for i in range(5)]
    sh = spark.createDataFrame(rows, "doc_id long, s string")
    cand = minhash_band_candidates(sh).collect()
    # only the small group's C(5,2) = 10 pairs; the mega-bucket yields none
    assert len(cand) == 10
    assert all(c.doc_a >= 10_000 and c.doc_b >= 10_000 for c in cand)
    # uncapped control on a small slice proves the cap is what prunes
    uncapped = minhash_band_candidates(sh, max_bucket=None)
    assert uncapped.count() == n_big * (n_big - 1) // 2 + 10


def test_exact_jaccard_df_cap_bounds_candidates(spark):
    """q63's blow-up control (VERDICT r2 #3): a stop-shingle present in
    every doc must not make the candidate self-join quadratic. Pairs
    sharing only the hot shingle never become candidates; a pair sharing a
    rare shingle is still found, and its jaccard is exact over the FULL
    shingle set (hot shingle included in the intersection)."""
    from eclypsium_etl_spark.llm.dedup import jaccard_pairs

    n = 400  # hot-shingle document frequency, far above the cap of 64
    rows = [(i, "the quick brown") for i in range(n)]
    rows += [(i, f"unique filler {i}") for i in range(n)]
    rows += [
        (9001, "the quick brown"), (9001, "shared rare shingle"),
        (9002, "the quick brown"), (9002, "shared rare shingle"),
    ]
    sh = spark.createDataFrame(rows, "doc_id long, s string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(sh, tau=0.0).collect()
    }
    # sole candidate pair: the one sharing a rare shingle — every other
    # pair overlaps only via the hot shingle and is pruned pre-join
    assert set(got) == {(9001, 9002)}
    # exact jaccard over full sets: {hot, rare} ∩ {hot, rare} = 2/2
    assert got[(9001, 9002)] == 1.0


def test_streaming_under_rocksdb_state_store(spark, tmp_path):
    """The 100 TB state backend: the same windowed aggregation runs and
    converges under RocksDBStateStoreProvider (the provider that spills
    state off-heap and scales past executor memory — the default HDFS-
    backed store keeps everything on-heap). Provider choice is frozen
    into the checkpoint at creation, so this exercises a full fresh
    stream under RocksDB, not a config toggle on an existing one."""
    from pyspark.sql import functions as F

    rows = [(k % 5, float(k)) for k in range(100)]
    df = spark.createDataFrame(rows, "grp long, value double")
    src = str(tmp_path / "src")
    df.write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema("grp long, value double").parquet(src)
        agg = stream.groupBy("grp").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("total"),
        )
        qname = f"rocks_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r.grp: (r.n, r.total) for r in spark.table(qname).collect()}
        expect = {
            g: (20, float(sum(k for k in range(100) if k % 5 == g)))
            for g in range(5)
        }
        assert got == expect
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_bitmap_distinct_exact_across_buckets(spark):
    """Regression for q240's merge algebra: keys spanning MULTIPLE 32k-key
    bitmap buckets must count exactly. bitmap_bit_position is
    (key-1) mod 32768 — OR-ing bitmaps across different bucket numbers
    collides distinct keys onto the same bit and undercounts (e.g. keys 1
    and 32769 share bit 0). The fix counts within each (group, bucket) and
    SUMs; this fixture puts the same group's keys in 3 different buckets,
    including a colliding pair, so the old cross-bucket OR would return 4
    where the truth is 6."""
    from pyspark.sql import functions as F

    rows = [
        ("A", 1), ("A", 2), ("A", 32769),          # 32769 collides with 1
        ("A", 40000), ("A", 70000), ("A", 70001),  # third bucket
        ("B", 5), ("B", 5), ("B", 32773),          # dup + collider with 5
    ]
    df = spark.createDataFrame(rows, "grp string, key long")
    per_bucket = df.groupBy(
        "grp", F.expr("bitmap_bucket_number(key)").alias("bkt")
    ).agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(bitmap_bit_position(key)))"
        ).alias("bucket_distinct")
    )
    got = {
        r.grp: r.nd
        for r in per_bucket.groupBy("grp")
        .agg(F.sum("bucket_distinct").alias("nd"))
        .collect()
    }
    assert got == {"A": 6, "B": 2}
    # and the collision is real: the old cross-bucket OR undercounts
    per_bucket_bm = df.groupBy(
        "grp", F.expr("bitmap_bucket_number(key)").alias("bkt")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(key))").alias("bm")
    )
    naive = {
        r.grp: r.nd
        for r in per_bucket_bm.groupBy("grp")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("nd"))
        .collect()
    }
    assert naive["A"] < 6, "collision fixture no longer collides"


def test_semdedup_giant_cluster_splits_bounded(spark):
    """q129's giant-cluster bound (VERDICT r3 #4): a corpus where EVERY
    vector lands in one cluster must not concentrate into a single GEMM
    task. With cap=16 a 100-row cluster splits into s=7 sub-blocks /
    s(s+1)/2 = 28 grid cells, no cell holding more than 2*cap rows —
    while pair coverage stays EXACT (identical to the brute-force
    all-pairs set, which a one-task plan would also produce)."""
    import itertools

    from pyspark.sql import functions as F

    from eclypsium_etl_spark.llm.clustering import cluster_scoped_pairs

    # 100 unit vectors in 8-d: i -> direction (i % 4), sign alternating by
    # (i // 4) % 2; cosine is ±1 or 0, so tau=0.5 selects same-direction
    # same-sign pairs — many true pairs spread across sub-blocks.
    def vec(i):
        v = [0.0] * 8
        v[i % 4] = 1.0 if (i // 4) % 2 == 0 else -1.0
        return v

    n, cap, tau = 100, 16, 0.5
    rows = [(i, vec(i), 0) for i in range(n)]
    asg = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cent_id long"
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in cluster_scoped_pairs(asg, tau, cap=cap).collect()
    }
    expect = {
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if vec(a) == vec(b)  # cosine 1.0 exactly
    }
    assert got == expect and len(expect) > 100
    # the split actually happened, and every grid-cell task is bounded:
    # replicate the explode's cell assignment and count rows per cell
    s = -(-n // cap)  # ceil
    cells: dict[tuple, int] = {}
    for i in range(n):
        p = i % s
        for cb in range(p, s):
            cells[(p * s + cb,)] = cells.get((p * s + cb,), 0) + 1
        for ra in range(0, p + 1):
            cells[(ra * s + p,)] = cells.get((ra * s + p,), 0) + 1
    assert len(cells) == s * (s + 1) // 2
    assert max(cells.values()) <= 2 * cap


def test_scale_proof_10x():
    """Re-run the empirical sub-quadratic proof (scripts/scale_proof.py,
    BASELINE.md round-4 table) — gated behind SPARK_GRAFT_SCALE_PROOF=1
    because it builds a 10x fixture and runs ~1.5 min of queries."""
    import subprocess
    import sys

    import pytest

    if not os.environ.get("SPARK_GRAFT_SCALE_PROOF"):
        pytest.skip("set SPARK_GRAFT_SCALE_PROOF=1 to run the 10x proof")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "scale_proof.py")],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]


import pytest


@pytest.mark.parametrize(
    "provider",
    [
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    ],
    ids=["hdfs", "rocksdb"],
)
def test_stream_dedup_state_identical_under_both_providers(
    spark, tmp_path, provider
):
    """q57's shape (dropDuplicatesWithinWatermark over a doubled stream)
    must produce IDENTICAL results under both state-store providers —
    RocksDB is the 100 TB state backend (off-heap, spillable), and
    provider choice must be an operational knob, never a semantic one.
    Fresh checkpoint per provider (the provider is frozen into the
    checkpoint at creation)."""
    from pyspark.sql import functions as F

    rows = [(i % 40, f"e{i % 40}", float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, tag string, value double")
    df = df.withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 10:00:00")) + F.make_interval(
            secs=F.col("event_id")
        )
    )
    src = str(tmp_path / "src")
    df.write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try:
        stream = spark.readStream.schema(
            "event_id long, tag string, value double, ts timestamp"
        ).parquet(src)
        doubled = stream.unionByName(stream)
        deduped = doubled.withWatermark(
            "ts", "10 minutes"
        ).dropDuplicatesWithinWatermark(["event_id"])
        qname = f"dedup_{provider.rsplit('.', 1)[1][:5].lower()}_{uuid.uuid4().hex[:6]}"
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r.event_id, r.tag) for r in spark.table(qname).collect()
        )
        assert got == sorted((i, f"e{i}") for i in range(40))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_ensure_bucketed_is_write_once_and_zero_exchange(spark):
    """io.ensure_bucketed: a second call (fresh process simulated by a
    catalog drop) must NOT rewrite the committed layout — the _SUCCESS
    marker gates the build (the materialize_once protocol applied to
    bucketed tables; write_bucketed's overwrite-in-place raced under
    concurrent walks and produced a doubled table). The re-registered
    external CLUSTERED BY table must keep the bucket spec."""
    import os

    from eclypsium_etl_spark.io import ensure_bucketed, table

    orders = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    ensure_bucketed(orders, "orders_once", "o_custkey", 8,
                    sort_col="o_custkey")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    warehouse = warehouse.removeprefix("file://").removeprefix("file:")
    loc = os.path.join(warehouse, "orders_once")
    files1 = sorted(os.listdir(loc))
    mtime1 = os.path.getmtime(loc)
    spark.sql("DROP TABLE IF EXISTS orders_once")  # simulate new process
    ensure_bucketed(orders, "orders_once", "o_custkey", 8,
                    sort_col="o_custkey")
    assert sorted(os.listdir(loc)) == files1
    assert os.path.getmtime(loc) == mtime1, "layout must not be rebuilt"
    buckets = spark.sql("DESCRIBE EXTENDED orders_once").collect()
    info = {r.col_name: r.data_type for r in buckets}
    assert info.get("Num Buckets") == "8"
    assert "o_custkey" in info.get("Bucket Columns", "")


def test_ensure_bucketed_spec_mismatch_raises(spark):
    """The skip decision must verify the PERSISTED bucket spec, not trust
    the caller's arguments: registering N-bucket metadata over data
    physically hashed mod M makes Spark assume HashPartitioning(key, N)
    it doesn't have and the zero-exchange join silently drops matches.
    A changed spec for an existing stamped layout is therefore an error
    (re-bucketing requires a new stamped name), and a layout missing its
    _BUCKET_SPEC manifest (pre-manifest build or torn write) is treated
    as incomplete and rebuilt rather than trusted."""
    import json
    import os

    import pytest

    from eclypsium_etl_spark.io import ensure_bucketed, table

    orders = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    ensure_bucketed(orders, "orders_spec_guard", "o_custkey", 8)
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    warehouse = warehouse.removeprefix("file://").removeprefix("file:")
    loc = os.path.join(warehouse, "orders_spec_guard")
    with open(os.path.join(loc, "_BUCKET_SPEC")) as fh:
        assert json.load(fh) == {
            "bucket_col": "o_custkey", "num_buckets": 8, "sort_col": None,
        }
    with pytest.raises(ValueError, match="write-once"):
        ensure_bucketed(orders, "orders_spec_guard", "o_custkey", 16)
    with pytest.raises(ValueError, match="write-once"):
        ensure_bucketed(orders, "orders_spec_guard", "o_orderkey", 8)
    # same spec still skips (mtime unchanged = no rebuild)
    mtime1 = os.path.getmtime(loc)
    spark.sql("DROP TABLE IF EXISTS orders_spec_guard")
    ensure_bucketed(orders, "orders_spec_guard", "o_custkey", 8)
    assert os.path.getmtime(loc) == mtime1
    # a manifest-less layout is unverifiable -> rebuilt in place
    os.remove(os.path.join(loc, "_BUCKET_SPEC"))
    spark.sql("DROP TABLE IF EXISTS orders_spec_guard")
    ensure_bucketed(orders, "orders_spec_guard", "o_custkey", 8)
    assert os.path.exists(os.path.join(loc, "_BUCKET_SPEC"))
    assert os.path.exists(os.path.join(loc, "_SUCCESS"))
    assert spark.table("orders_spec_guard").count() == orders.count()
