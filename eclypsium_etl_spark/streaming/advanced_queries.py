"""Checked queries for the custom stateful operator and related streaming
extensions (q87)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..registry import query
from .queries import run_available_now, stream_events

_ORACLE_Q87 = """
WITH totals AS (
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total
    FROM events GROUP BY user_id
)
SELECT user_id, total AS batch_total, total AS running_total,
       (total >= 1000.0) AS crossed
FROM totals
"""


@query("q87_stream_stateful", oracle=_ORACLE_Q87)
def q87_stream_stateful(spark, sf_dir) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-user spend with threshold alerts. On a single-batch availableNow
    replay the converged state equals a per-user batch aggregate, which is
    what the oracle states; multi-batch accumulation semantics are covered
    in tests/test_scale_features.py::test_stateful_accumulates_across_batches."""
    from .stateful import running_spend

    out = running_spend(stream_events(spark, sf_dir))
    qname, _ = run_available_now(
        lambda name, ckpt: out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )
    return spark.table(qname)
