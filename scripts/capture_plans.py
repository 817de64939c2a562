#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage:
    python scripts/capture_plans.py r13/_suffix q21_agg_groupby q63_dedup_near ...
    python scripts/capture_plans.py r13 --all          # every registered query

Writes plans/<tag>/<query><suffix>.txt. The suffix is everything after the
first '/': e.g. tag "r13/_before" writes plans/r13/q21_agg_groupby_before.txt.
Streaming queries whose function executes the stream eagerly still return a
batch DataFrame of results; its plan is what gets captured (documented in
each file header when the plan is a LocalTableScan / memory-sink read).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    tag = args[0]
    names = args[1:]
    parts = tag.split("/", 1)
    rdir = parts[0]
    suffix = parts[1] if len(parts) > 1 else ""
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rdir
    )
    os.makedirs(outdir, exist_ok=True)

    from eclypsium_etl_spark.registry import load_all
    from eclypsium_etl_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    queries, _ = load_all()
    if names == ["--all"]:
        names = list(queries)
    rc = 0
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            rc = 1
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure per query
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
            rc = 1
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {SF_DIR}\n{plan}")
        print(f"wrote {path}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
