"""Small helper shared by batch-module queries that execute a streaming
plan (keeps streaming/queries.py the home of the core helpers)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.queries import run_available_now


def run_stream_to_memory(
    spark: SparkSession, stream_df: DataFrame, mode: str = "append"
) -> DataFrame:
    qname, _ = run_available_now(
        lambda name, ckpt: stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )
    return spark.table(qname)
