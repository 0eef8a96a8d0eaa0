"""Time every registered query's Spark side at a given SF dir.

Guide §1 measurement aid for the optimization rounds — NOT the driver
bench (bench.py is frozen).  Runs each queries()[name] with a noop
sink... actually with a plain collect via toPandas() (matching the
driver gate's consumption), prints one line per query and a JSON
summary sorted slowest-first.

Usage: python tools/time_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from __spark_entry__ import queries
    from rxtls_spark.session import get_spark

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, float] = {}
    for name, fn in queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            n = len(fn(spark, sf_dir).toPandas())
            dt = round(time.perf_counter() - t0, 3)
            out[name] = dt
            print(f"  {name}: {dt}s ({n} rows)", flush=True)
        except Exception as e:  # keep sweeping; report the failure
            out[name] = -1.0
            print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf_dir": sf_dir, "total": round(sum(v for v in out.values() if v > 0), 1), "slowest": ranked}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
