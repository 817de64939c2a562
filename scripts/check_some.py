#!/usr/bin/env python
"""Targeted differential: run only the named queries against their
oracles at sf0.01 (or $SPARK_GRAFT_SF_DIR) — the fast iteration loop
for new registrations, same compare as verify_driver_contract.py.

Usage: python scripts/check_some.py q350_global_rank_ranged q355_...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main(names: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

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
    bad = 0
    for name in names:
        if name not in queries:
            print(f"MISSING {name}")
            bad += 1
            continue
        t0 = time.time()
        if name in oracles:
            ok, detail = compare(queries[name](spark, sf), con, oracles[name])
            print(f"{'OK  ' if ok else 'FAIL'} {name} "
                  f"({time.time() - t0:.1f}s) {('' if ok else detail[:300])}",
                  flush=True)
            bad += 0 if ok else 1
        else:
            n = queries[name](spark, sf).count()
            print(f"OK   {name} (no-oracle, {n} rows, "
                  f"{time.time() - t0:.1f}s)", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
