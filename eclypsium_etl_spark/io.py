"""Sources and sinks.

The reference's IO surface (SURVEY.md §2.1): JSON-over-HTTP extraction,
a full-replace PostgreSQL sink, and an HTML report sink. Spark-first
equivalents: schema'd file sources with pushdown, idempotent
``mode("overwrite")`` writes, JDBC read/write wrappers, and a small-result
report renderer.

At 100 TB the scan is everything: always read Parquet through
``spark.read.parquet`` (vectorized reader, predicate pushdown, column
pruning), partition output by a low-cardinality key when the downstream
access pattern filters on it, and never infer schemas in production paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .schemas import TABLES


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (q01). Plain parquet scan: Catalyst handles
    predicate pushdown and column pruning for whatever is layered on top.

    Timestamp note: events.parquet stores TIMESTAMP(NANOS), which Spark's
    reader rejects. We read nanos as long (runtime conf, safe to set on any
    session) and truncate to microseconds — exactly what DuckDB does when it
    surfaces the same column as TIMESTAMP, so oracle parity holds.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    expected = TABLES.get(name)
    if expected is not None:
        actual = dict(df.dtypes)
        for field in expected.fields:
            if (
                isinstance(field.dataType, T.TimestampType)
                and actual.get(field.name) == "bigint"
            ):
                df = df.withColumn(
                    field.name,
                    F.timestamp_micros(F.expr(f"{field.name} div 1000")),
                )
    return df


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name, df in tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON document source (q02 analog of requests.get+json.loads,
    mercadolibre_pipeline_dag.py:20-33). Schema mandatory in spirit:
    pass one, or accept inference only in exploratory code."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def sink_overwrite(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Idempotent full-replace sink (q04) — the Spark equivalent of the
    reference's ``to_sql(..., if_exists="replace")``
    (mercadolibre_pipeline_dag.py:65). Overwrite mode gives the same
    rerun-safety contract; partitioning enables partition pruning for
    downstream readers at scale."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame, name: str, bucket_col: str, num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed table sink: co-locates rows by hash(bucket_col) at WRITE
    time so later joins/aggregations on that key skip the shuffle entirely
    — the biggest single lever for repeated 100 TB fact⋈fact joins.
    Registers `name` in the session catalog (parquet data source table).

    Self-cleaning: the in-memory catalog forgets tables across sessions but
    their warehouse directories persist — drop both before writing or
    saveAsTable fails with LOCATION_ALREADY_EXISTS."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(name)


def read_jdbc(
    spark: SparkSession,
    url: str,
    dbtable: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC source (q05; reference reads Postgres via SQLAlchemy,
    mercadolibre_pipeline_dag.py:71-75). Parallel reads require the
    partition bounds — a single-connection JDBC read is a driver bottleneck
    at any real scale, so callers must think about them."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, dbtable: str, mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink (q05 write side, reference :65)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", dbtable).mode(mode)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
