"""Structured Streaming variant of the pipeline (SURVEY §2.9).

The reference is a bounded batch job with streaming-shaped machinery
(bounded queues, AIMD backpressure, periodic flush — all replaced by
Spark configs, SURVEY T1-T5).  This module is the genuine streaming
extension: the same parse→enrich→route stages as micro-batches over a
file source, with

- watermarked tumbling-window aggregates over ``warc_ts`` (late data
  handled by the watermark, T7),
- ``foreachBatch`` multi-sink routing (per-batch partitionBy write —
  the streaming analog of the per-log sink map, J3/S6),
- exactly-once via the streaming checkpoint (offset log + sink commit
  protocol — the upgrade over the reference's temp+rename, T6),
- ``maxFilesPerTrigger`` as the source rate cap (the T1 bounded-queue
  analog; no custom backpressure code).

Tested with ``trigger(availableNow=True)`` against the batch pipeline's
results (tests/test_streaming.py): the streaming and batch plans must
agree on every route count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rxtls_spark.datagen.pages import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = 4
) -> DataFrame:
    reader = (
        spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(input_dir)


def windowed_route_counts(pages_stream: DataFrame, log_operators: DataFrame,
                          watermark: str = "1 hour",
                          window: str = "1 hour") -> DataFrame:
    """Streaming per-(route, window) counts with late-data watermark."""
    from rxtls_spark.pipeline import enriched

    df = enriched(pages_stream.withWatermark("warc_ts", watermark), log_operators)
    return (
        df.groupBy("route", F.window("warc_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.size("all_domains")).alias("n_domains"),
        )
        .select(
            "route",
            F.unix_timestamp("w.start").cast("long").alias("window_start"),
            "n_pages",
            "n_domains",
        )
    )


def start_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    log_operators: DataFrame,
    available_now: bool = True,
    max_files_per_trigger: int | None = 4,
):
    """Windowed aggregate → parquet append sink, exactly-once via the
    streaming checkpoint."""
    counts = windowed_route_counts(
        read_pages_stream(spark, input_dir, max_files_per_trigger),
        log_operators,
    )
    writer = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "window_counts"))
        .option("checkpointLocation", os.path.join(out_dir, "checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_routed_sink(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    log_operators: DataFrame,
    available_now: bool = True,
):
    """foreachBatch multi-sink: each micro-batch runs the full
    parse→enrich→route pipeline and lands partitioned parquet — the
    single-pass fan-out write, per batch."""
    from rxtls_spark.pipeline import enriched

    stream = read_pages_stream(spark, input_dir)

    def route_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        routed = enriched(batch_df, log_operators).drop("extracted_text", "text")
        (
            routed.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("lang", "suffix_group")
            .parquet(os.path.join(out_dir, "routed"))
        )

    writer = (
        stream.writeStream.foreachBatch(route_batch)
        .option("checkpointLocation", os.path.join(out_dir, "checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
