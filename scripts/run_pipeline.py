#!/usr/bin/env python
"""Flagship pipeline as a resumable, stage-checkpointed spark-submit job.

    spark-submit --py-files geokitten_spark.zip scripts/run_pipeline.py \
        --sf-dir /root/testdata/sf0.1 --store /tmp/geokitten_snapshots \
        [--replicate 100] [--no-resume]

Stages (each a snapshot with per-partition lineage metrics; re-running
skips committed stages — kill it mid-way and run again to see resume):

  1. web_docs   — documents.parquet → Common-Crawl-shaped table
                  (url, warc_ts, html, text, lang, lon, lat)
  2. located    — cover-refine PIP join vs admin boundaries (+S2 cell),
                  range/hash partitioned on cell_id
  3. tiles      — per-(region, cell) aggregates at res 5/7 (rollup-ready)
  4. knn        — kRing kNN over a language slice

The same script runs unchanged on a real cluster: drop the --master
default, point --store at an object-store path, and the parquet+manifest
snapshots become Iceberg tables when the runtime jar is present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--store", default="/tmp/geokitten_snapshots")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from geokitten_spark.session import get_spark
    from geokitten_spark.plans import SnapshotStore
    from geokitten_spark.fixtures import bench_boundaries_pdf
    from geokitten_spark.operators.pip_join import PolygonCover
    from geokitten_spark.operators.knn import knn_join
    from geokitten_spark.functions.cells_udfs import grid_cell_col, s2_cell

    spark = get_spark(app_name="geokitten-pipeline", master=args.master)
    store = SnapshotStore(args.store)
    resume = not args.no_resume

    # -- stage 1: ingest / shape ---------------------------------------
    def build_docs(spark):
        if args.replicate > 1:
            from bench import bench_documents

            return bench_documents(spark, args.sf_dir, args.replicate)
        from geokitten_spark.fixtures import web_documents

        return web_documents(spark, args.sf_dir)

    docs = store.run_stage(
        spark, "web_docs", build_docs,
        config={"sf_dir": args.sf_dir, "replicate": args.replicate},
        resume=resume,
    )
    print(f"[web_docs] snap={docs.snapshot_id} resumed={docs.resumed} "
          f"rows={docs.manifest['row_count']}")

    # -- stage 2: extract + score (the compute-dense web-text stage) ----
    def build_scored(spark):
        from geokitten_spark.functions.text import (
            extract_text, quality_cols, lang_id_col,
        )

        d = docs.df.withColumn("etext", extract_text(F.col("html")))
        q = quality_cols(F.col("etext"))
        return d.select(
            "doc_id",
            "lang",
            "lon",
            "lat",
            lang_id_col(F.col("etext")).alias("pred_lang"),
            q["quality_score"].alias("quality_score"),
            q["n_tokens"].alias("n_tokens"),
        )

    scored = store.run_stage(
        spark, "scored", build_scored, inputs=[docs],
        config={"quality": "v1"}, resume=resume,
    )
    print(f"[scored  ] snap={scored.snapshot_id} resumed={scored.resumed} "
          f"rows={scored.manifest['row_count']}")

    # -- stage 3: locate (cover-refine PIP) -----------------------------
    def build_located(spark):
        cover = PolygonCover(
            spark, bench_boundaries_pdf(), id_col="region_key",
            wkt_col="geometry_wkt", res=10,
        )
        located = cover.join(scored.df)
        return located.withColumn(
            "cell_id", grid_cell_col(F.col("lon"), F.col("lat"), 7)
        ).withColumn("s2_cell", s2_cell(9)(F.col("lon"), F.col("lat")))

    # bucketed+sorted on the tiling key (DEPLOY.md): the ONE shuffle here
    # is amortized over every downstream read — the tile aggregate and the
    # kNN build side below both consume the layout exchange-free, across
    # resumes and new sessions (the store re-registers the bucketed table)
    located = store.run_stage(
        spark, "located", build_located, inputs=[scored],
        config={"boundaries": "bench_boundaries:200", "res": 10},
        bucket_by=("cell_id", 32),
        resume=resume,
    )
    print(f"[located ] snap={located.snapshot_id} resumed={located.resumed} "
          f"rows={located.manifest['row_count']}")

    # -- stage 4: tile aggregates ---------------------------------------
    def build_tiles(spark):
        return located.df.groupBy("region_key", "cell_id").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct("s2_cell").alias("n_s2_cells"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )

    tiles = store.run_stage(
        spark, "tiles", build_tiles, inputs=[located], config={"res": 7},
        resume=resume,
    )
    print(f"[tiles   ] snap={tiles.snapshot_id} resumed={tiles.resumed} "
          f"rows={tiles.manifest['row_count']}")

    # -- stage 5: kNN ----------------------------------------------------
    def build_knn(spark):
        # reuse the stage's stored cell_id (same res-7 grid) so the join's
        # build side inherits the bucketed distribution — no exchange on
        # the non-exploded side
        pts = located.df.filter(F.col("lang") == "de").select(
            "doc_id", "lon", "lat", "cell_id"
        )
        return knn_join(pts, id_col="doc_id", k=3, res=7, ring_k=1,
                        cell_col="cell_id")

    knn = store.run_stage(
        spark, "knn", build_knn, inputs=[located],
        config={"k": 3, "res": 7, "ring_k": 1}, resume=resume,
    )
    print(f"[knn     ] snap={knn.snapshot_id} resumed={knn.resumed} "
          f"rows={knn.manifest['row_count']}")

    print(json.dumps({
        "stages": [m["stage"] for m in store.lineage],
        "resumed": [docs.resumed, scored.resumed, located.resumed,
                    tiles.resumed, knn.resumed],
        "rows": {m["stage"]: m["row_count"] for m in store.lineage},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
