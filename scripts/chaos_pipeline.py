#!/usr/bin/env python
"""Three-stage mini pipeline for the kill-and-resume chaos test.

The snapshot contract (plans/snapshot.py) claims: data first, manifest
last via atomic rename — a crash mid-write leaves no manifest, so the
torn stage re-runs cleanly and the final output equals an uninterrupted
run. This script is the subject: the chaos pytest
(tests/test_chaos_resume.py) SIGKILLs the whole process group while
stage 2 is writing part files (``--slow`` widens that window with a
per-batch sleep), then re-runs and compares.

All stage outputs are integer/exact (no distributed float sums), so
"equal" means byte-equal row sets, not approximately-equal.

    python scripts/chaos_pipeline.py --sf-dir /root/testdata/sf0.001 \
        --store /tmp/chaos_store [--slow]

Prints one line ``CHAOS_RESULT {json}`` with per-stage resumed flags and
the final aggregate rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--slow", action="store_true",
                    help="sleep per Arrow batch in stage 2 so the test "
                         "can reliably SIGKILL mid-write")
    args = ap.parse_args()

    from geokitten_spark.plans import SnapshotStore
    from geokitten_spark.session import get_spark

    spark = get_spark(app_name="gk-chaos", master="local[4]",
                      shuffle_partitions=8)
    store = SnapshotStore(args.store)

    def build_docs(s):
        from geokitten_spark.fixtures import web_documents

        return web_documents(s, args.sf_dir).select(
            "doc_id", "lang", "lon", "lat"
        )

    docs = store.run_stage(
        spark, "cdocs", build_docs, config={"sf": args.sf_dir}
    )

    def build_scored(s):
        d = docs.df.repartition(48, "doc_id")
        # exact integer score — byte-equal across runs by construction
        score = (F.col("lon") * 1000000).cast("long")
        if args.slow:
            @F.pandas_udf("long")
            def slow_id(x: pd.Series) -> pd.Series:
                time.sleep(0.25)
                return x

            score = slow_id(score)
        return d.select("doc_id", "lang", score.alias("score"))

    scored = store.run_stage(
        spark, "cscored", build_scored, inputs=[docs], config={"v": 1}
    )

    def build_agg(s):
        return scored.df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score").cast("long").alias("sum_score"),
        )

    agg = store.run_stage(
        spark, "cagg", build_agg, inputs=[scored], config={"v": 1}
    )
    rows = sorted(
        (r["lang"], int(r["n"]), int(r["sum_score"]))
        for r in agg.df.collect()
    )
    print("CHAOS_RESULT " + json.dumps({
        "resumed": [docs.resumed, scored.resumed, agg.resumed],
        "rows": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
