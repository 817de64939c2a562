#!/usr/bin/env python
"""Time every registered query at sf0.01 the way the driver's correctness
check does (execute + collect), to find where the driver's per-query
budget goes. Prints JSON {name: sec} sorted desc."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from eclypsium_etl_spark.registry import load_all
    from eclypsium_etl_spark.session import get_spark

    spark = get_spark(app_name="profile")
    queries, _ = load_all()
    times: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).collect()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            times[name] = -1.0
            print(f"FAIL {name}: {exc}", file=sys.stderr)
    ordered = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    print(json.dumps(ordered, indent=1))
    print(f"TOTAL {sum(v for v in times.values() if v > 0):.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
