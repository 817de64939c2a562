"""SparkSession factory.

One place to encode the execution posture we want everywhere:

- AQE on (runtime re-plan at shuffle boundaries: partition coalescing,
  skew-join splitting, broadcast demotion) — the 100 TB knob that costs
  nothing locally.
- Shuffle partitions sized to the local core count; on a real cluster this
  is overridden (AQE coalescing makes the initial number less critical).
- Arrow enabled so any Pandas-UDF path is vectorized batch transfer.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive/UTC timestamps in the fixture parquet).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "eclypsium-etl-spark"


def cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state_store: bool = False,
) -> SparkSession:
    """Build (or fetch) the session with the engine's standard config.

    rocksdb_state_store: production posture for large streaming state —
    state spills to local RocksDB instead of the JVM heap (bounded memory,
    faster snapshots). Off by default locally; the fixture streams' state
    is tiny."""
    cores = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE sizes post-shuffle partitions by BYTES; self-joins/explodes on
        # small-but-compute-heavy data would coalesce to one core at the
        # 64MB default. Size to the deployment: a few MB for local bench
        # data, 64-128MB on a real cluster (env-overridable).
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "2MB"),
        )
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256KB")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Let the scan-split formula engage for small multi-file layouts
        # (memoized intermediates): maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes/defaultParallelism)). At the 4 MB
        # default the open-cost floor pins every sub-128 MB dataset to
        # ~bytes/4MB tasks regardless of core count; 512 KB keeps the
        # anti-fragmentation guard (tiny files still pack) while letting
        # input-size-adaptive splitting use the cores. Irrelevant at real
        # scale, where totalBytes/parallelism >> both floors (guide §6).
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", str(512 * 1024)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # fixture events.parquet stores TIMESTAMP(NANOS); Spark has no ns
        # timestamp — read as long and convert (io.table truncates to µs,
        # matching DuckDB's ns→µs truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # static conf: catalog tables (e.g. bucketed sinks) land in /tmp,
        # never in the repo working directory
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "eclypsium_warehouse"),
        )
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    if rocksdb_state_store:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
