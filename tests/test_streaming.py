"""Structured Streaming tests: batch/stream duality on the events table.

The stream source is the sf0.001 events parquet split into 3 files so
availableNow processes multiple microbatches (maxFilesPerTrigger=1)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from geokitten_spark.streaming import (
    read_events_stream,
    hourly_counts_stream,
    stateful_user_counts,
    run_to_memory,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_src"))
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.repartition(3).write.mode("overwrite").parquet(d)
    return d


def test_hourly_stream_equals_batch(spark, events_stream_dir, tmp_path):
    stream = read_events_stream(spark, events_stream_dir)
    agg = hourly_counts_stream(stream)
    run_to_memory(agg, "hourly_stream", str(tmp_path / "ckpt1"), output_mode="complete")
    got = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("hourly_stream").collect()
    }
    batch = (
        spark.read.parquet(events_stream_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    want = {(r.hour, r.event_type): (r.n, r.v) for r in batch.collect()}
    assert got == want


def test_stateful_user_counts_final_state(spark, events_stream_dir, tmp_path):
    stream = read_events_stream(spark, events_stream_dir)
    counts = stateful_user_counts(stream)
    run_to_memory(counts, "user_counts", str(tmp_path / "ckpt2"), output_mode="update")
    # update mode emits one row per key per microbatch: the LAST row per
    # user carries the final running count
    import pandas as pd

    pdf = spark.table("user_counts").toPandas()
    final = pdf.groupby("user_id")["n_events"].max()
    batch = (
        spark.read.parquet(events_stream_dir).groupBy("user_id").count().toPandas()
    )
    want = dict(zip(batch["user_id"], batch["count"]))
    assert dict(final) == want


def test_stream_checkpoint_resume(spark, events_stream_dir, tmp_path):
    """Restarting from the same checkpoint reprocesses nothing (no new
    files) — the streaming face of the snapshot/resume contract."""
    ck = str(tmp_path / "ckpt3")
    stream = read_events_stream(spark, events_stream_dir)
    run_to_memory(hourly_counts_stream(stream), "resume1", ck, "complete")
    n1 = spark.table("resume1").count()
    # second run, same checkpoint: availableNow finds no new files
    stream2 = read_events_stream(spark, events_stream_dir)
    run_to_memory(hourly_counts_stream(stream2), "resume2", ck, "complete")
    n2 = spark.table("resume2").count()
    assert n1 > 0 and n2 == 0  # nothing new to emit


def test_streaming_spatial_enrichment(spark, tmp_path):
    """Cover-refine PIP join on a STREAM of docs (stateless: broadcast
    joins + mapInPandas compose with Structured Streaming) — result equals
    the batch join."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )
    from geokitten_spark.fixtures import web_documents, bench_boundaries_pdf
    from geokitten_spark.operators.pip_join import PolygonCover
    from geokitten_spark.streaming import run_to_memory

    src = str(tmp_path / "docs_src")
    docs = web_documents(spark, SF_SMOKE).select("doc_id", "lon", "lat")
    docs.repartition(3).write.mode("overwrite").parquet(src)

    cover = PolygonCover(
        spark, bench_boundaries_pdf(), id_col="region_key",
        wkt_col="geometry_wkt", res=9,
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lon", DoubleType()),
            StructField("lat", DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    enriched = cover.join(stream)
    run_to_memory(enriched, "stream_pip", str(tmp_path / "ck"), output_mode="append")
    got = {(r.doc_id, r.region_key) for r in spark.table("stream_pip").collect()}
    want = {(r.doc_id, r.region_key) for r in cover.join(docs).collect()}
    assert got == want and len(got) > 0
