#!/usr/bin/env python
"""Time every declared query (queries()) at a given SF with the noop sink.

Guide §1 measurement aid: the driver's correctness pass runs every
declared query; any straggler here inflates that wall-clock and usually
marks a real plan defect (the r6 posexplode fixes were found this way).

Usage: python scripts/time_declared_queries.py [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       TIME_JSON_OUT=/path.json to archive {query: sec}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from geokitten_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    names = sys.argv[1:] or sorted(qs.keys())
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            out[name] = round(dt, 3)
            print(f"{name}: {dt:.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            out[name] = None
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
    ranked = sorted(
        ((v, k) for k, v in out.items() if v is not None), reverse=True
    )
    print("\nslowest:")
    for v, k in ranked[:15]:
        print(f"  {k}: {v:.2f}s")
    path = os.environ.get("TIME_JSON_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
