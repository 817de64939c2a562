#!/usr/bin/env python
"""Emulate the grading driver end-to-end: run entry(), then every
queries() entry against its oracle_sql() on DuckDB at sf0.01, in harness
order, from whatever SparkSession config this process gets.

Usage:
    python scripts/verify_driver_contract.py            # engine defaults
    SPARK_GRAFT_PLAIN=1 python scripts/verify_driver_contract.py
        # fully DEFAULT SparkSession (shuffle=200, host timezone) — the
        # harshest approximation of an unknown driver config; the walk
        # must stay green there too (proven 2026-08-13, round 3).

Exit code 0 iff every query matches (or runs, for no-oracle entries).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    if os.environ.get("SPARK_GRAFT_PLAIN"):
        spark = (
            SparkSession.builder.master("local[*]")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from parity import compare

    df = entry_mod.entry(spark)
    print("entry rows:", df.count(), flush=True)

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    bad = []
    t0 = time.time()
    for name in queries:
        if name in oracles:
            ok, detail = compare(queries[name](spark, sf), con, oracles[name])
            if not ok:
                bad.append((name, detail[:200]))
                print(f"FAIL {name}: {detail[:200]}", flush=True)
        else:
            queries[name](spark, sf).count()
    print(f"walk seconds: {time.time() - t0:.1f}")
    if bad:
        print(f"FAILED: {len(bad)} of {len(queries)}")
        return 1
    print(f"ALL OK ({len(queries)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
