"""Streaming count-min sketch — bounded-state heavy-hitter tracking
over micro-batches.

The batch `cms_heavy_hitters` query (queries_training.py) proves the
sketch semantics against the DuckDB oracle; this twin maintains the
SAME ``CMS_D × CMS_W`` grid incrementally.  Each micro-batch reduces
its own token stream to a ≤ D·W-cell partial sketch (map-side combine
does the heavy lifting) and overwrites the partition
``part_batch=<batch_id>`` — the near_dedup_stream exactly-once
convention: a retried batch recomputes the identical deterministic
partial and overwrites itself, so replays are idempotent and the
checkpoint offset log guarantees no batch is skipped.

CMS counters are LINEAR, so the merged sketch (cell-wise sum over
batch partitions) is exactly the batch sketch over the union corpus —
stream == batch is an identity, not an approximation, and the pytest
locks it cell-for-cell.

Scale notes: per-batch state is fixed (D·W cells); the merged read is
(n_batches × D·W) rows — metadata-scale at any real cadence.  If batch
count ever grows unbounded, the offline fold is the `compact_index`
pattern (ann_index_stream.py): stream stopped, sum committed
partitions into one, journal + footer-count check before deleting.
Estimation joins the candidate terms' D buckets against the broadcast
merged sketch — the batch plan verbatim.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rxtls_spark.queries_training import (
    CMS_D,
    CMS_W,
    _cms_bucket,
    _hex_digit_map,
    _lm_tokens,
)


def _buckets(tok: F.Column) -> F.Column:
    hexmap = _hex_digit_map()
    return F.array(*[_cms_bucket(tok, i, hexmap) for i in range(CMS_D)])


def batch_partial_sketch(docs: DataFrame) -> DataFrame:
    """(doc_id, text) micro-batch → its ≤ D·W-cell partial sketch
    (row_i, bucket, cnt).  Pure DataFrame function so batch==stream
    equality is testable without a stream."""
    toks = docs.where(F.trim("text") != "").select(
        F.explode(_lm_tokens()).alias("tok")
    )
    return (
        toks.select(F.posexplode(_buckets(F.col("tok"))).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def write_batch(batch_df: DataFrame, batch_id: int, out_dir: str) -> None:
    """One foreachBatch step: overwrite this batch's own partition with
    its deterministic partial sketch (idempotent under replay)."""
    if batch_df.isEmpty():
        return
    batch_partial_sketch(batch_df).write.mode("overwrite").parquet(
        os.path.join(out_dir, "sketch", f"part_batch={batch_id}")
    )


def merged_sketch(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Cell-wise sum over all committed batch partials, or None before
    the first batch.  Only a genuinely-absent sketch maps to None;
    real read failures propagate (the near_dedup_stream error rule)."""
    sketch_dir = os.path.join(out_dir, "sketch")
    if not os.path.isdir(sketch_dir):
        return None
    try:
        parts = spark.read.parquet(sketch_dir)
    except AnalysisException:
        return None
    return parts.groupBy("row_i", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def estimate_counts(
    spark: SparkSession, out_dir: str, terms: list[str]
) -> DataFrame:
    """Point-estimate the given terms' stream counts from the merged
    sketch: min over the term's D cells (the CMS estimator, broadcast
    join — the batch `cms_heavy_hitters` plan)."""
    merged = merged_sketch(spark, out_dir)
    if merged is None:
        raise ValueError(f"no sketch committed under {out_dir}")
    cand = spark.createDataFrame(
        [(t,) for t in terms], "tok string"
    ).select("tok", F.posexplode(_buckets(F.col("tok"))).alias("row_i", "bucket"))
    return (
        cand.join(F.broadcast(merged), ["row_i", "bucket"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_est"))
    )


def start_cms_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """documents stream (doc_id, text parquet files) → incrementally
    merged CMS under ``<out_dir>/sketch/part_batch=N/``."""
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        write_batch(batch_df, batch_id, out_dir)

    writer = stream.writeStream.foreachBatch(step).option(
        "checkpointLocation", os.path.join(out_dir, "checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
